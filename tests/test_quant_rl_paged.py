"""int8 quant path, GRPO loss, paged KV cache."""

import jax
import jax.numpy as jnp
import numpy as np

from internvideo_tpu.nn.mla import MLAConfig, MLAttention
from internvideo_tpu.nn.paged_cache import (
    PageAllocator,
    PagedCacheState,
    batched_paged_gather,
    paged_write,
    positions_to_slots,
)
from internvideo_tpu.nn.rope import rope_cos_sin
from internvideo_tpu.ops.quant import QuantDense, int8_matmul, quantize_int8
from internvideo_tpu.train.rl import (
    GRPOConfig,
    group_relative_advantages,
    grpo_policy_loss,
    token_logprobs,
)


def test_int8_quant_accuracy():
    x = jax.random.normal(jax.random.key(0), (16, 64))
    w = jax.random.normal(jax.random.key(1), (64, 32)) * 0.1
    ref = x @ w
    w_q, w_s = quantize_int8(w, axis=0)
    out = int8_matmul(x, w_q, w_s, dynamic_activations=True)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    out_wo = int8_matmul(x, w_q, w_s, dynamic_activations=False)
    rel = float(jnp.linalg.norm(out_wo - ref) / jnp.linalg.norm(ref))
    assert rel < 0.01, rel


def test_quant_dense_trains():
    model = QuantDense(8, dynamic_activations=True)
    x = jax.random.normal(jax.random.key(0), (4, 16))
    params = model.init(jax.random.key(1), x)
    y = jax.random.normal(jax.random.key(2), (4, 8))

    def loss(p):
        return jnp.mean(jnp.square(model.apply(p, x) - y))

    import optax
    tx = optax.adam(1e-2)
    st = tx.init(params)
    l0 = float(loss(params))
    for _ in range(20):
        g = jax.grad(loss)(params)
        up, st = tx.update(g, st, params)
        params = optax.apply_updates(params, up)
    assert float(loss(params)) < l0 * 0.5


def test_grpo():
    rewards = jnp.array([1.0, 0.0, 1.0, 0.0, 5.0, 5.0, 5.0, 5.0])
    adv = group_relative_advantages(rewards, group_size=4)
    # second group has zero variance -> ~0 advantage
    np.testing.assert_allclose(np.asarray(adv[4:]), 0.0, atol=1e-3)
    assert float(adv[0]) > 0 > float(adv[1])

    logits = jax.random.normal(jax.random.key(0), (8, 5, 11))
    tokens = jax.random.randint(jax.random.key(1), (8, 5), 0, 11)
    logp = token_logprobs(logits, tokens)
    assert logp.shape == (8, 5) and float(logp.max()) <= 0

    mask = jnp.ones((8, 5))
    cfg = GRPOConfig(kl_beta=0.1)
    loss, m = grpo_policy_loss(
        logp, logp - 0.1, adv, mask, cfg, logp_ref=logp + 0.05
    )
    assert np.isfinite(float(loss))
    assert float(m["kl"]) >= 0
    # gradient ascent direction: positive-advantage sequences push logp up
    g = jax.grad(
        lambda lp: grpo_policy_loss(lp, logp, adv, mask, GRPOConfig())[0]
    )(logp)
    assert float(g[0].sum()) < 0  # minimizing loss raises logp for adv>0


def test_page_allocator():
    alloc = PageAllocator(num_pages=8, page_size=4)
    t = alloc.ensure(0, 5)  # needs 2 pages
    assert len(t) == 2
    t2 = alloc.ensure(1, 4)
    assert len(t2) == 1 and not (set(t) & set(t2))
    alloc.release(0)
    t3 = alloc.ensure(2, 9)
    assert len(t3) == 3  # reuses freed pages
    assert len(set(t3) & set(t2)) == 0


def test_paged_decode_matches_dense():
    cfg = MLAConfig(
        hidden_size=32, num_heads=2, kv_lora_rank=16,
        qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8,
    )
    model = MLAttention(cfg, attn_impl="xla")
    b, prompt = 2, 6
    x = jax.random.normal(jax.random.key(0), (b, prompt, 32))
    cos, sin = rope_cos_sin(jnp.arange(prompt)[None], 8)
    cos = jnp.broadcast_to(cos, (b, prompt, 8))
    sin = jnp.broadcast_to(sin, (b, prompt, 8))
    params = model.init(jax.random.key(1), x, cos, sin)

    # dense path reference
    dense_cache = jnp.zeros((b, 16, cfg.cache_dim))
    _, dense_cache = model.apply(
        params, x, cos, sin, dense_cache, 0, method="prefill"
    )
    x_new = jax.random.normal(jax.random.key(2), (b, 1, 32))
    cos1, sin1 = rope_cos_sin(jnp.full((b, 1), prompt), 8)
    dense_out, _ = model.apply(
        params, x_new, cos1, sin1, dense_cache, jnp.int32(prompt),
        method="decode",
    )

    # paged path: write prompt entries + new entry into pages, then decode
    page_size = 4
    alloc = PageAllocator(num_pages=16, page_size=page_size)
    pool = PagedCacheState.create(16, page_size, cfg.cache_dim, jnp.float32)
    pages = pool.pages
    entries = model.apply(
        params, x, cos, sin, method="compute_cache_entry"
    )  # (B, prompt, C)
    new_entry = model.apply(
        params, x_new, cos1, sin1, method="compute_cache_entry"
    )
    tables = []
    for s in range(b):
        table = alloc.ensure(s, prompt + 1)
        pids, offs = positions_to_slots(0, prompt + 1, table, page_size)
        seq_entries = jnp.concatenate([entries[s], new_entry[s]], axis=0)
        pages = paged_write(pages, seq_entries, jnp.asarray(pids),
                            jnp.asarray(offs))
        tables.append(table + [0] * (4 - len(table)))  # pad table
    block_tables = jnp.asarray(tables, jnp.int32)
    paged_out = model.apply(
        params, x_new, cos1, sin1, pages, block_tables,
        jnp.full((b,), prompt + 1, jnp.int32),
        method="decode_paged",
    )
    np.testing.assert_allclose(
        np.asarray(paged_out), np.asarray(dense_out), atol=2e-5, rtol=1e-4
    )

    # Pallas paged-decode kernel (interpret mode): same numerics without
    # materializing the gathered cache.
    kernel_out = model.apply(
        params, x_new, cos1, sin1, pages, block_tables,
        jnp.full((b,), prompt + 1, jnp.int32),
        method="decode_paged", impl="pallas", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(kernel_out), np.asarray(dense_out), atol=2e-5, rtol=1e-4
    )


def test_paged_decode_kernel_ragged_lengths():
    """Kernel parity with per-sequence lengths (partial last page + clamped
    page walk) against the XLA gather formulation."""
    from internvideo_tpu.ops.paged_decode import paged_mla_decode

    rng = np.random.default_rng(0)
    b, h, r, p_dim, page_size, max_pages = 3, 4, 32, 16, 4, 5
    num_pages = b * max_pages
    seq_lens = np.array([3, 9, 17], np.int32)  # 1, 3, 5 pages
    q_lat = jnp.asarray(rng.standard_normal((b, h, r)), jnp.float32)
    q_pe = jnp.asarray(rng.standard_normal((b, h, p_dim)), jnp.float32)
    pages = jnp.asarray(
        rng.standard_normal((num_pages, page_size, r + p_dim)), jnp.float32
    )
    # each sequence owns a disjoint page range, padded with page 0
    tables = np.zeros((b, max_pages), np.int32)
    for s in range(b):
        n = -(-int(seq_lens[s]) // page_size)
        tables[s, :n] = np.arange(s * max_pages, s * max_pages + n)
    block_tables = jnp.asarray(tables)

    out = paged_mla_decode(
        q_lat, q_pe, pages, block_tables, jnp.asarray(seq_lens),
        softmax_scale=0.17, interpret=True,
    )

    # reference: dense gather + masked softmax
    gathered = np.asarray(pages)[tables].reshape(b, -1, r + p_dim)
    c, pe = gathered[..., :r], gathered[..., r:]
    s = (
        np.einsum("bhr,bsr->bhs", np.asarray(q_lat), c)
        + np.einsum("bhp,bsp->bhs", np.asarray(q_pe), pe)
    ) * 0.17
    mask = np.arange(gathered.shape[1])[None, None, :] < seq_lens[:, None, None]
    s = np.where(mask, s, -1e30)
    probs = np.exp(s - s.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("bhs,bsr->bhr", probs, c)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_int8_encoder_serving_accuracy():
    """Int8Dense serving encoder (quant="int8") vs the fp32 model: the
    quantize_params_like-converted tree runs the real int8 path and stays
    within ~0.1% relative of the dense outputs (with O(1) LayerScale, the
    trained-model regime)."""
    import dataclasses

    from flax import linen as nn

    from internvideo_tpu.models.internvideo2 import (
        InternVideo2, InternVideo2Config,
    )
    from internvideo_tpu.ops.quant import quantize_params_like

    cfg = InternVideo2Config(
        embed_dim=128, depth=2, num_heads=4, mlp_ratio=4.0, patch_size=14,
        img_size=56, num_frames=4, tubelet_size=1, clip_embed_dim=64,
        num_classes=0, attn_impl="xla")
    model = InternVideo2(cfg)
    video = jax.random.normal(jax.random.key(0), (2, 4, 56, 56, 3))
    params = nn.unbox(model.init(jax.random.key(1), video))["params"]
    for i in range(cfg.depth):
        for ls in ("ls1", "ls2"):
            params[f"blocks_{i}"][ls]["gamma"] = jnp.full_like(
                params[f"blocks_{i}"][ls]["gamma"], 0.5)
    ref = model.apply({"params": params}, video)

    qmodel = InternVideo2(dataclasses.replace(cfg, quant="int8"))
    abstract = nn.unbox(
        jax.eval_shape(qmodel.init, jax.random.key(1), video))["params"]
    qparams = quantize_params_like(abstract, params)
    assert qparams["blocks_0"]["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    out = qmodel.apply({"params": qparams}, video)

    for name in ("pooled", "tokens"):
        a, b = getattr(ref, name), getattr(out, name)
        rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
        assert rel < 5e-3, f"{name} rel={rel}"


def test_paged_decode_kernel_group_fuzz():
    """Multi-page grid steps (pages_per_block G > 1): fuzz sequence lengths
    against the masked-softmax reference for G that divides, doesn't divide,
    and exceeds max_pages — group boundaries, clamped tails, empty steps."""
    from internvideo_tpu.ops.paged_decode import paged_mla_decode

    rng = np.random.default_rng(7)
    b, h, r, p_dim, page_size, max_pages = 4, 4, 16, 8, 4, 11
    num_pages = b * max_pages
    pages = jnp.asarray(
        rng.standard_normal((num_pages, page_size, r + p_dim)), jnp.float32
    )
    q_lat = jnp.asarray(rng.standard_normal((b, h, r)), jnp.float32)
    q_pe = jnp.asarray(rng.standard_normal((b, h, p_dim)), jnp.float32)

    for trial in range(3):
        seq_lens = rng.integers(1, max_pages * page_size + 1, b).astype(
            np.int32
        )
        tables = np.zeros((b, max_pages), np.int32)
        for s in range(b):
            n = -(-int(seq_lens[s]) // page_size)
            # shuffled page ownership: the walk must follow the table
            own = rng.permutation(max_pages)[:n]
            tables[s, :n] = s * max_pages + own

        gathered = np.asarray(pages)[tables].reshape(b, -1, r + p_dim)
        c, pe = gathered[..., :r], gathered[..., r:]
        sc = (
            np.einsum("bhr,bsr->bhs", np.asarray(q_lat), c)
            + np.einsum("bhp,bsp->bhs", np.asarray(q_pe), pe)
        ) * 0.25
        mask = (
            np.arange(gathered.shape[1])[None, None, :]
            < seq_lens[:, None, None]
        )
        sc = np.where(mask, sc, -1e30)
        probs = np.exp(sc - sc.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        ref = np.einsum("bhs,bsr->bhr", probs, c)

        for g in (1, 3, 4, 16):
            out = paged_mla_decode(
                q_lat, q_pe, pages, jnp.asarray(tables),
                jnp.asarray(seq_lens), softmax_scale=0.25,
                pages_per_block=g, interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(out), ref, atol=1e-4, rtol=1e-4,
                err_msg=f"trial={trial} group={g} lens={seq_lens}",
            )


def test_int8_wo_decode_parity():
    """Weight-only int8 serving model (LLMConfig.quant='int8_wo'): params
    mapped by quantize_params_like; paged decode matches the bf16 model
    running the dequantized weights (weight-only => only weight rounding
    separates them)."""
    import dataclasses

    from internvideo_tpu.models.llm import (
        LLMConfig, MLATransformer, init_paged_cache,
    )
    from internvideo_tpu.nn.mla import MLAConfig
    from flax import linen as nn

    from internvideo_tpu.ops.quant import quantize_params_like

    cfg = LLMConfig(
        vocab_size=64, hidden_size=32, num_layers=2, intermediate_size=48,
        mrope_section=None,
        mla=MLAConfig(hidden_size=32, num_heads=2, kv_lora_rank=16,
                      qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8),
        attn_impl="xla",
    )
    model = MLATransformer(cfg)
    qmodel = MLATransformer(dataclasses.replace(cfg, quant="int8_wo"))
    b, s, page = 2, 12, 4
    ids = jnp.ones((b, s), jnp.int32)
    params = nn.unbox(model.init(jax.random.key(0), ids))
    qabstract = nn.unbox(jax.eval_shape(qmodel.init, jax.random.key(0), ids))
    qparams = quantize_params_like(qabstract, params)

    # dequantize the int8 tree back into a bf16-model tree so the reference
    # runs the SAME effective weights
    def deq(ab, src):
        if isinstance(ab, dict):
            out = {}
            for k2, sub in ab.items():
                if k2 == "kernel":
                    srcq = src  # same path in the quant tree
                    if "kernel_q" in srcq:
                        out[k2] = (
                            srcq["kernel_q"].astype(jnp.float32)
                            * srcq["scale"]
                        ).astype(jnp.float32)
                        continue
                out[k2] = deq(sub, src[k2] if k2 in src else src)
            return out
        return src

    deq_params = deq(params, qparams)

    pages, tables = init_paged_cache(cfg, b, 16, page, jnp.float32)
    qpages = jax.tree.map(lambda x: x.copy(), pages)
    seq = jnp.full((b,), 0, jnp.int32)
    tok = jnp.zeros((b, 1), jnp.int32)

    out_ref = model.apply(deq_params, tok, pages, tables, seq, page,
                          method="decode_step_paged")
    out_q = qmodel.apply(qparams, tok, qpages, tables, seq, page,
                         method="decode_step_paged")
    np.testing.assert_allclose(
        np.asarray(out_q.logits), np.asarray(out_ref.logits),
        atol=2e-2, rtol=2e-2,
    )


def test_int8_mix_prefill_and_decode():
    """int8_mix serving mode (LLMConfig.quant='int8_mix'): decode-sized
    dispatches (M < INT8_MIX_DYN_M) are BIT-identical to int8_wo (same
    weight-only math), while prefill-sized dispatches take the dynamic-int8
    path off the same params and stay within activation-rounding tolerance
    of int8_wo."""
    import dataclasses

    from flax import linen as nn

    from internvideo_tpu.models.llm import (
        LLMConfig, MLATransformer, init_paged_cache,
    )
    from internvideo_tpu.ops.quant import quantize_params_like

    cfg = LLMConfig(
        vocab_size=64, hidden_size=32, num_layers=2, intermediate_size=48,
        mrope_section=None,
        mla=MLAConfig(hidden_size=32, num_heads=2, kv_lora_rank=16,
                      qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8),
        attn_impl="xla",
    )
    model = MLATransformer(cfg)
    wo_model = MLATransformer(dataclasses.replace(cfg, quant="int8_wo"))
    mix_model = MLATransformer(dataclasses.replace(cfg, quant="int8_mix"))
    b, s = 2, 512  # M = 1024 = INT8_MIX_DYN_M -> prefill takes the dyn path
    ids = jax.random.randint(jax.random.key(1), (b, s), 0, 64)
    params = nn.unbox(model.init(jax.random.key(0), ids))
    qabstract = nn.unbox(
        jax.eval_shape(wo_model.init, jax.random.key(0), ids)
    )
    qparams = quantize_params_like(qabstract, params)

    # prefill-shaped forward: dynamic-int8 vs weight-only, same int8 params
    out_wo = wo_model.apply(qparams, ids)
    out_mix = mix_model.apply(qparams, ids)
    np.testing.assert_allclose(
        np.asarray(out_mix.logits, np.float32),
        np.asarray(out_wo.logits, np.float32),
        atol=0.15, rtol=0.15,  # activation absmax rounding only
    )
    # ranking survives the activation quant on most positions
    agree = np.mean(
        np.argmax(np.asarray(out_mix.logits, np.float32), -1)
        == np.argmax(np.asarray(out_wo.logits, np.float32), -1)
    )
    assert agree > 0.9, agree

    # decode-shaped dispatch: bit-identical to int8_wo
    pages, tables = init_paged_cache(cfg, b, 16, 4, jnp.float32)
    qpages = jax.tree.map(lambda x: x.copy(), pages)
    seq = jnp.zeros((b,), jnp.int32)
    tok = jnp.zeros((b, 1), jnp.int32)
    d_wo = wo_model.apply(qparams, tok, pages, tables, seq, 4,
                          method="decode_step_paged")
    d_mix = mix_model.apply(qparams, tok, qpages, tables, seq, 4,
                            method="decode_step_paged")
    np.testing.assert_array_equal(
        np.asarray(d_mix.logits), np.asarray(d_wo.logits)
    )


def test_int8_vision_tower_accuracy():
    """Serving-int8 vision tower (VisionTowerConfig.quant='int8'): int8
    block projections off quantize_params_like-converted params stay
    within the ~0.1%-relative band the int8 encoder budgets, and the
    deepstack taps keep their shapes."""
    import dataclasses

    from flax import linen as nn

    from internvideo_tpu.models.vision_tower import (
        VisionTower, VisionTowerConfig,
    )
    from internvideo_tpu.ops.quant import quantize_params_like

    cfg = VisionTowerConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        patch_size=8, pos_embed_grid=8, deepstack_indexes=(0,),
        text_hidden_size=48, attn_impl="xla",
    )
    model = VisionTower(cfg)
    qmodel = VisionTower(dataclasses.replace(cfg, quant="int8"))
    video = jax.random.normal(jax.random.key(0), (1, 4, 16, 16, 3))
    params = nn.unbox(model.init(jax.random.key(1), video))
    qabstract = nn.unbox(jax.eval_shape(qmodel.init, jax.random.key(1), video))
    qparams = quantize_params_like(qabstract, params)

    toks, taps = model.apply(params, video)
    qtoks, qtaps = qmodel.apply(qparams, video)
    assert qtoks.shape == toks.shape
    assert len(qtaps) == len(taps) and qtaps[0].shape == taps[0].shape
    rel = np.linalg.norm(np.asarray(qtoks - toks)) / np.linalg.norm(
        np.asarray(toks)
    )
    assert rel < 2e-2, rel
