"""Ulysses SP, SequenceContext, packing, chunked CE — on the 8-dev CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from internvideo_tpu.core.mesh import MeshConfig, create_mesh
from internvideo_tpu.data.packing import (
    attention_efficiency,
    hard_pack,
    soft_pack,
)
from internvideo_tpu.ops.attention_xla import xla_attention
from internvideo_tpu.parallel.sequence_context import SequenceContext
from internvideo_tpu.parallel.ulysses import ulysses_attention
from internvideo_tpu.train.chunked_ce import chunked_cross_entropy


def test_ulysses_matches_local_attention():
    mesh = create_mesh(MeshConfig(replica=1, fsdp=2, seq=4, tensor=1))
    b, s, h, d = 2, 64, 8, 16
    q = jax.random.normal(jax.random.key(0), (b, s, h, d))
    k = jax.random.normal(jax.random.key(1), (b, s, h, d))
    v = jax.random.normal(jax.random.key(2), (b, s, h, d))
    seg = jnp.concatenate(
        [jnp.zeros((b, 40), jnp.int32), jnp.ones((b, 24), jnp.int32)], axis=1
    )
    ref = xla_attention(q, k, v, causal=True, q_segment_ids=seg,
                        kv_segment_ids=seg)

    sharding = NamedSharding(mesh, P(None, "seq", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))
    segs = jax.device_put(seg, NamedSharding(mesh, P(None, "seq")))

    @jax.jit
    def run(q, k, v, seg):
        return ulysses_attention(
            q, k, v, mesh=mesh, axis="seq", causal=True,
            q_segment_ids=seg, kv_segment_ids=seg, impl="xla",
        )

    out = run(qs, ks, vs, segs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ulysses_grads_flow():
    mesh = create_mesh(MeshConfig(replica=1, fsdp=1, seq=4, tensor=2))
    b, s, h, d = 1, 32, 8, 8
    q = jax.random.normal(jax.random.key(0), (b, s, h, d))

    def loss_ref(q):
        return jnp.sum(jnp.square(xla_attention(q, q, q, causal=True)))

    def loss_sp(q):
        return jnp.sum(jnp.square(ulysses_attention(
            q, q, q, mesh=mesh, axis="seq", causal=True, impl="xla",
        )))

    g_ref = jax.grad(loss_ref)(q)
    g_sp = jax.jit(jax.grad(loss_sp))(
        jax.device_put(q, NamedSharding(mesh, P(None, "seq", None, None)))
    )
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_sequence_context():
    ctx = SequenceContext.from_segments(
        [(list(range(5)), None), (list(range(3)), [1, 2, 3])], pad_to=16
    )
    assert ctx.input_ids.shape == (1, 16)
    assert int(ctx.num_real_tokens()) == 8
    np.testing.assert_array_equal(
        np.asarray(ctx.segment_ids[0, :8]), [0] * 5 + [1] * 3
    )
    assert np.all(np.asarray(ctx.segment_ids[0, 8:]) == -1)
    np.testing.assert_array_equal(
        np.asarray(ctx.position_ids[0, :8]), [0, 1, 2, 3, 4, 0, 1, 2]
    )
    ctx2 = ctx.pad_to_multiple(12)
    assert ctx2.seq_len == 24
    sl = ctx2.shard_slice(1, 4)
    assert sl.seq_len == 6


def test_packing():
    lengths = [10, 20, 30, 25, 15, 35, 5]
    res = soft_pack(lengths, 40)
    assert not res.dropped
    for p in res.packs:
        assert sum(lengths[i] for i in p) <= 40
    assert res.efficiency > 0.75
    # over-long samples get dropped, not split
    res = soft_pack([50, 10], 40)
    assert res.dropped == [0]

    res = hard_pack([50, 30], 40)
    assert res.efficiency == 1.0
    # split bookkeeping: sample 0 spans packs 0-1, sample 1 finishes pack 1
    assert res.packs[0] == [(0, 0, 40)]
    assert res.packs[1] == [(0, 40, 50), (1, 0, 30)]

    # token-stream materialization
    import numpy as np
    from internvideo_tpu.data.packing import hard_pack_streams

    streams = [np.arange(50), 100 + np.arange(30)]
    tokens, segs, _ = hard_pack_streams(streams, 40)
    assert tokens.shape == (2, 40)
    np.testing.assert_array_equal(tokens[0], np.arange(40))
    np.testing.assert_array_equal(tokens[1, :10], 40 + np.arange(10))
    np.testing.assert_array_equal(tokens[1, 10:], 100 + np.arange(30))
    np.testing.assert_array_equal(segs[0], np.zeros(40))
    np.testing.assert_array_equal(
        segs[1], np.concatenate([np.zeros(10), np.ones(30)])
    )

    assert attention_efficiency([10, 10]) == 200 / 400


def test_chunked_ce_matches_dense():
    b, l, d, v = 2, 20, 16, 37
    hidden = jax.random.normal(jax.random.key(0), (b, l, d))
    kernel = jax.random.normal(jax.random.key(1), (d, v)) * 0.1
    labels = jax.random.randint(jax.random.key(2), (b, l), 0, v)
    labels = labels.at[:, -3:].set(-100)

    def dense(h, w):
        logits = (h @ w).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, -1)
        valid = labels != -100
        picked = jnp.take_along_axis(
            logp, jnp.maximum(labels, 0)[..., None], -1
        )[..., 0]
        return -jnp.sum(jnp.where(valid, picked, 0.0)) / jnp.sum(valid)

    ref = dense(hidden, kernel)
    out = chunked_cross_entropy(hidden, kernel, labels, chunk_size=8)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
    # grads too
    g_ref = jax.grad(dense)(hidden, kernel)
    g_chk = jax.grad(
        lambda h, w: chunked_cross_entropy(h, w, labels, chunk_size=8)
    )(hidden, kernel)
    np.testing.assert_allclose(
        np.asarray(g_chk), np.asarray(g_ref), atol=1e-5, rtol=1e-4
    )


def test_ring_attention_matches_local():
    from internvideo_tpu.parallel.ring import ring_attention

    mesh = create_mesh(MeshConfig(replica=1, fsdp=2, seq=4, tensor=1))
    b, s, h, d = 2, 64, 4, 16
    q = jax.random.normal(jax.random.key(0), (b, s, h, d))
    k = jax.random.normal(jax.random.key(1), (b, s, h, d))
    v = jax.random.normal(jax.random.key(2), (b, s, h, d))

    for causal in (False, True):
        ref = xla_attention(q, k, v, causal=causal)
        sharding = NamedSharding(mesh, P(("replica", "fsdp"), "seq", None, None))
        out = jax.jit(
            lambda q, k, v, c=causal: ring_attention(
                q, k, v, mesh=mesh, axis="seq", causal=c
            )
        )(
            jax.device_put(q, sharding),
            jax.device_put(k, sharding),
            jax.device_put(v, sharding),
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5,
            err_msg=f"causal={causal}",
        )


def test_ring_attention_grads():
    from internvideo_tpu.parallel.ring import ring_attention

    mesh = create_mesh(MeshConfig(replica=1, fsdp=2, seq=4, tensor=1))
    b, s, h, d = 2, 32, 2, 8
    q = jax.random.normal(jax.random.key(0), (b, s, h, d))

    g_ref = jax.grad(
        lambda q: jnp.sum(jnp.square(xla_attention(q, q, q, causal=True)))
    )(q)
    g_ring = jax.jit(jax.grad(
        lambda q: jnp.sum(jnp.square(ring_attention(
            q, q, q, mesh=mesh, axis="seq", causal=True
        )))
    ))(jax.device_put(
        q, NamedSharding(mesh, P(("replica", "fsdp"), "seq", None, None))
    ))
    np.testing.assert_allclose(
        np.asarray(g_ring), np.asarray(g_ref), atol=1e-4, rtol=1e-4
    )


def test_ulysses_with_pallas_ragged_kernel():
    """The Pallas kernel (interpret) inside the Ulysses shard_map, at a
    CLS-style global length that triggers the ragged-tail decomposition
    (1028 = 1024 + 4 after the head-swap reassembles the full sequence)."""
    mesh = create_mesh(MeshConfig(replica=1, fsdp=2, seq=4, tensor=1))
    b, s, h, d = 2, 1028, 4, 32
    q = jax.random.normal(jax.random.key(0), (b, s, h, d))
    k = jax.random.normal(jax.random.key(1), (b, s, h, d))
    v = jax.random.normal(jax.random.key(2), (b, s, h, d))
    ref = xla_attention(q, k, v)
    sh = NamedSharding(mesh, P("fsdp", "seq", None, None))
    out = jax.jit(lambda q, k, v: ulysses_attention(
        q, k, v, mesh=mesh, axis="seq", impl="pallas", interpret=True,
    ))(jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ulysses_head_padding_25_heads():
    """The 6B encoder has 25 heads — not divisible by sp=4. Ulysses pads
    with zero heads and drops their outputs (measured/argued alternative to
    the reference's inner-SP head_dim splitting, which replicates attention
    compute insp x per inner group — xtuner/parallel/sequence/
    attention.py:21-110; see PERF.md)."""
    mesh = create_mesh(MeshConfig(replica=1, fsdp=2, seq=4, tensor=1))
    b, s, h, d = 2, 64, 25, 8
    q = jax.random.normal(jax.random.key(10), (b, s, h, d))
    k = jax.random.normal(jax.random.key(11), (b, s, h, d))
    v = jax.random.normal(jax.random.key(12), (b, s, h, d))
    ref = xla_attention(q, k, v, causal=False)

    sharding = NamedSharding(mesh, P(None, "seq", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))

    @jax.jit
    def run(q, k, v):
        return ulysses_attention(
            q, k, v, mesh=mesh, axis="seq", impl="xla",
        )

    out = run(qs, ks, vs)
    assert out.shape == (b, s, h, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # grads flow through the pad/slice
    def loss(fn):
        return lambda q: jnp.sum(jnp.square(fn(q, ks, vs)))

    g = jax.jit(jax.grad(loss(lambda q, k, v: run(q, k, v))))(qs)
    g_ref = jax.grad(loss(lambda q, k, v: xla_attention(q, k, v)))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


def test_6b_shaped_tower_under_sp4():
    """A 25-head encoder tower (the 6B head count) runs under sp=4 via
    ulysses_context and matches the unsharded forward."""
    from internvideo_tpu.models.internvideo2 import (
        InternVideo2, InternVideo2Config,
    )
    from internvideo_tpu.ops import ulysses_context

    cfg = InternVideo2Config(
        embed_dim=400, depth=1, num_heads=25, mlp_ratio=2.0,
        patch_size=14, img_size=56, num_frames=4, tubelet_size=1,
        clip_embed_dim=64, num_classes=0, attn_impl="xla",
    )
    model = InternVideo2(cfg)
    video = jax.random.normal(jax.random.key(0), (2, 4, 56, 56, 3))
    params = model.init(jax.random.key(1), video)
    ref = model.apply(params, video).pooled

    mesh = create_mesh(MeshConfig(replica=1, fsdp=2, seq=4, tensor=1))
    with mesh:
        @jax.jit
        def run(p, v):
            with ulysses_context(mesh, "seq"):
                return model.apply(p, v).pooled

        out = run(params, video)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_attention_packed_segments():
    """Packed sequences under ring: kv segment ids rotate with K/V, so the
    inner mask sees true (q_seg, kv_seg) pairs on every shard."""
    from internvideo_tpu.parallel.ring import ring_attention

    mesh = create_mesh(MeshConfig(replica=1, fsdp=2, seq=4, tensor=1))
    b, s, h, d = 2, 64, 4, 16
    q = jax.random.normal(jax.random.key(0), (b, s, h, d))
    k = jax.random.normal(jax.random.key(1), (b, s, h, d))
    v = jax.random.normal(jax.random.key(2), (b, s, h, d))
    # three segments of irregular lengths crossing shard boundaries
    seg = jnp.asarray(
        np.concatenate([np.zeros(21), np.ones(30), np.full(13, 2)])[None]
        .repeat(b, 0).astype(np.int32)
    )
    sh = NamedSharding(mesh, P(("replica", "fsdp"), "seq", None, None))
    sh_seg = NamedSharding(mesh, P(("replica", "fsdp"), "seq"))
    for causal in (False, True):
        ref = xla_attention(q, k, v, causal=causal, q_segment_ids=seg,
                            kv_segment_ids=seg)
        out = jax.jit(
            lambda q, k, v, sg, c=causal: ring_attention(
                q, k, v, mesh=mesh, axis="seq", causal=c,
                q_segment_ids=sg, block_k=8,
            )
        )(jax.device_put(q, sh), jax.device_put(k, sh),
          jax.device_put(v, sh), jax.device_put(seg, sh_seg))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5,
            err_msg=f"causal={causal}",
        )
    # kv-only segment ids (q defaults to all-zero): must not crash and must
    # match the explicit all-zero-q-seg call (advisor r4 asymmetric-None fix)
    zq = jnp.zeros_like(seg)
    ref_kv = xla_attention(q, k, v, q_segment_ids=zq, kv_segment_ids=seg)
    out_kv = jax.jit(
        lambda q, k, v, sg: ring_attention(
            q, k, v, mesh=mesh, axis="seq", kv_segment_ids=sg, block_k=8,
        )
    )(jax.device_put(q, sh), jax.device_put(k, sh),
      jax.device_put(v, sh), jax.device_put(seg, sh_seg))
    np.testing.assert_allclose(
        np.asarray(out_kv), np.asarray(ref_kv), atol=2e-5, rtol=2e-5)


def test_ring_attention_gqa_blockwise():
    """GQA KV travel the ring thin; blockwise inner at block_k smaller than
    the shard exercises the online-softmax merge."""
    from internvideo_tpu.parallel.ring import ring_attention

    mesh = create_mesh(MeshConfig(replica=1, fsdp=2, seq=4, tensor=1))
    b, s, hq, hkv, d = 2, 64, 8, 2, 16
    q = jax.random.normal(jax.random.key(0), (b, s, hq, d))
    k = jax.random.normal(jax.random.key(1), (b, s, hkv, d))
    v = jax.random.normal(jax.random.key(2), (b, s, hkv, d))
    ref = xla_attention(q, k, v, causal=True)
    sh = NamedSharding(mesh, P(("replica", "fsdp"), "seq", None, None))
    out = jax.jit(
        lambda q, k, v: ring_attention(
            q, k, v, mesh=mesh, axis="seq", causal=True, block_k=4,
        )
    )(jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_ring_reachable_via_sequence_parallel_context():
    """dot_product_attention routes through ring under
    sequence_parallel_context(impl="ring") — the model-code injection point
    (same as Ulysses), so ring is a configurable capability, not a shelf
    component."""
    from internvideo_tpu.ops.attention import (
        dot_product_attention,
        sequence_parallel_context,
    )

    mesh = create_mesh(MeshConfig(replica=1, fsdp=2, seq=4, tensor=1))
    b, s, h, d = 2, 64, 4, 16
    q = jax.random.normal(jax.random.key(0), (b, s, h, d))
    k = jax.random.normal(jax.random.key(1), (b, s, h, d))
    v = jax.random.normal(jax.random.key(2), (b, s, h, d))
    ref = xla_attention(q, k, v, causal=True)
    sh = NamedSharding(mesh, P(("replica", "fsdp"), "seq", None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    with sequence_parallel_context(mesh, "seq", "ring"):
        out = jax.jit(
            lambda q, k, v: dot_product_attention(q, k, v, causal=True)
        )(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_sft_step_ring_matches_ulysses():
    """The SFT engine's sp_impl="ring" produces the same loss as Ulysses on
    the same packed batch (LLM-only model, seq axis sharded)."""
    import optax

    from internvideo_tpu.models.llm import LLMConfig
    from internvideo_tpu.models.mllm import MLLMConfig, VideoMLLM
    from internvideo_tpu.models.vision_tower import VisionTowerConfig
    from internvideo_tpu.nn.mla import MLAConfig
    from internvideo_tpu.train.engines.sft import SFTConfig, make_sft_step
    from internvideo_tpu.train.state import TrainState

    mesh = create_mesh(MeshConfig(replica=1, fsdp=2, seq=4, tensor=1))
    cfg = MLLMConfig(
        vision=VisionTowerConfig(
            hidden_size=16, num_layers=1, num_heads=4, intermediate_size=32,
            patch_size=8, temporal_patch_size=2, spatial_merge_size=2,
            pos_embed_grid=6, deepstack_indexes=(0,), text_hidden_size=32,
            attn_impl="xla",
        ),
        text=LLMConfig(
            vocab_size=64, hidden_size=32, num_layers=2,
            intermediate_size=64, mrope_section=None,
            mla=MLAConfig(hidden_size=32, num_heads=4, kv_lora_rank=16,
                          qk_rope_head_dim=8, qk_nope_head_dim=8,
                          v_head_dim=8),
            attn_impl="xla",
        ),
        image_token_id=60, video_token_id=61,
    )
    model = VideoMLLM(cfg)
    b, s = 2, 64
    ids = jnp.full((b, s), 7, jnp.int32)
    seg = jnp.asarray(
        np.concatenate([np.zeros(40), np.ones(24)])[None]
        .repeat(b, 0).astype(np.int32)
    )
    pos = jnp.asarray(
        np.concatenate([np.arange(40), np.arange(24)])[None]
        .repeat(b, 0).astype(np.int32)
    )
    batch = {
        "input_ids": ids, "segment_ids": seg, "position_ids": pos,
        "labels": jnp.full((b, s), 3, jnp.int32),
    }
    from flax import linen as fnn

    params = fnn.unbox(model.init(jax.random.key(0), ids)["params"])
    tx = optax.sgd(0.0)

    losses = {}
    for impl in ("ulysses", "ring"):
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
        )
        step = make_sft_step(
            model, SFTConfig(ce_chunk_size=16, sp_impl=impl), mesh=mesh
        )
        shardings = {
            k: NamedSharding(mesh, P(("replica", "fsdp"), "seq"))
            for k in batch
        }
        sharded = {k: jax.device_put(v, shardings[k])
                   for k, v in batch.items()}
        with mesh:
            _, metrics = jax.jit(step)(state, sharded, jax.random.key(1))
        losses[impl] = float(metrics["loss"])
    assert abs(losses["ring"] - losses["ulysses"]) < 1e-4, losses


def test_ring_pallas_inner_matches_blockwise():
    """ring_attention(inner="pallas") — the measured-fast inner (PERF.md
    "Ring vs Ulysses") — agrees with the blockwise inner and with dense XLA
    attention, forward and grads, packed segments rotating with KV."""
    from internvideo_tpu.parallel.ring import ring_attention

    mesh = create_mesh(MeshConfig(replica=1, fsdp=1, seq=4, tensor=1),
                       devices=jax.devices()[:4])
    b, s, h, d = 1, 256, 2, 16
    q = jax.random.normal(jax.random.key(0), (b, s, h, d))
    k = jax.random.normal(jax.random.key(1), (b, s, h, d))
    v = jax.random.normal(jax.random.key(2), (b, s, h, d))
    seg = jnp.asarray(
        np.repeat(np.arange(4), s // 4)[None].astype(np.int32))
    sh = NamedSharding(mesh, P(None, "seq", None, None))
    sh_seg = NamedSharding(mesh, P(None, "seq"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    segs = jax.device_put(seg, sh_seg)

    ref = xla_attention(q, k, v, causal=True, q_segment_ids=seg,
                        kv_segment_ids=seg)

    def run(inner):
        return jax.jit(lambda q, k, v, sg: ring_attention(
            q, k, v, mesh=mesh, axis="seq", causal=True,
            q_segment_ids=sg, inner=inner,
        ))(qs, ks, vs, segs)

    out_p = run("pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    out_b = run("blockwise")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_b),
                               atol=2e-5, rtol=2e-5)

    def loss(inner):
        return jax.jit(jax.grad(lambda q: jnp.sum(jnp.square(
            ring_attention(q, q, q, mesh=mesh, axis="seq", causal=True,
                           inner=inner)))))(qs)

    g_p, g_b = loss("pallas_interpret"), loss("blockwise")
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_b),
                               atol=1e-4, rtol=1e-4)
