"""MLA attention and the MLA decoder LLM: rope math, cache-vs-full parity."""

import jax
import jax.numpy as jnp
import numpy as np

from internvideo_tpu.nn.mla import MLAConfig, MLAttention
from internvideo_tpu.nn.rope import (
    apply_rope,
    mrope_cos_sin,
    rope_cos_sin,
    rotate_half,
)
from internvideo_tpu.models.llm import LLMConfig, MLATransformer

MLA_TINY = MLAConfig(
    hidden_size=64, num_heads=4, kv_lora_rank=32, q_lora_rank=None,
    qk_rope_head_dim=16, qk_nope_head_dim=16, v_head_dim=16,
)


def test_rope_properties():
    cos, sin = rope_cos_sin(jnp.arange(8), 16)
    assert cos.shape == (8, 16)
    # position 0: identity rotation
    np.testing.assert_allclose(cos[0], np.ones(16), atol=1e-6)
    np.testing.assert_allclose(sin[0], np.zeros(16), atol=1e-6)
    # norm preservation
    x = jax.random.normal(jax.random.key(0), (1, 8, 2, 16))
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        rtol=1e-5,
    )
    # relative property: <q_m, k_n> depends only on m-n
    q = jax.random.normal(jax.random.key(1), (1, 1, 1, 16))
    k = jax.random.normal(jax.random.key(2), (1, 1, 1, 16))
    def dot_at(m, n):
        cm, sm = rope_cos_sin(jnp.array([m]), 16)
        cn, sn = rope_cos_sin(jnp.array([n]), 16)
        qm = apply_rope(q, cm, sm)
        kn = apply_rope(k, cn, sn)
        return float(jnp.sum(qm * kn))
    np.testing.assert_allclose(dot_at(3, 1), dot_at(7, 5), rtol=1e-5)


def test_mrope_text_equals_rope():
    """Equal (t,h,w) position streams must reduce to plain 1D RoPE."""
    pos = jnp.arange(6)[None]  # (B=1, S)
    pos3 = jnp.broadcast_to(pos[None], (3, 1, 6))
    c1, s1 = rope_cos_sin(pos, 16)
    c3, s3 = mrope_cos_sin(pos3, 16, (3, 3, 2))
    np.testing.assert_allclose(c1, c3, atol=1e-6)
    np.testing.assert_allclose(s1, s3, atol=1e-6)


def test_mla_forward_shapes_and_causality():
    model = MLAttention(MLA_TINY, attn_impl="xla")
    x = jax.random.normal(jax.random.key(0), (2, 10, 64))
    cos, sin = rope_cos_sin(jnp.arange(10)[None], 16)
    cos = jnp.broadcast_to(cos, (2, 10, 16))
    sin = jnp.broadcast_to(sin, (2, 10, 16))
    params = model.init(jax.random.key(1), x, cos, sin)
    out = model.apply(params, x, cos, sin)
    assert out.shape == (2, 10, 64)
    # causality: perturbing a later token cannot change earlier outputs
    x2 = x.at[:, 7].set(0.0)
    out2 = model.apply(params, x2, cos, sin)
    np.testing.assert_allclose(out[:, :7], out2[:, :7], atol=1e-5)
    assert not np.allclose(out[:, 7:], out2[:, 7:], atol=1e-5)


LLM_TINY = LLMConfig(
    vocab_size=97, hidden_size=64, num_layers=2, intermediate_size=128,
    rope_theta=10000.0, mrope_section=(3, 3, 2), mla=MLA_TINY,
    attn_impl="xla",
)


def test_llm_cache_matches_full_forward():
    """Greedy decode with the latent cache == sliding full forward."""
    model = MLATransformer(LLM_TINY)
    ids = jax.random.randint(jax.random.key(0), (2, 6), 1, 90)
    params = model.init(jax.random.key(1), ids)

    full = model.apply(params, ids)
    assert full.logits.shape == (2, 6, 97)

    # prefill on first 4 tokens, decode tokens 4 and 5
    caches = model.apply(params, 2, 8, jnp.float32, method="init_cache")
    prefill = model.apply(
        params, model.apply(params, method=lambda m: m.embed_tokens)(ids[:, :4]),
        caches, method="prefill",
    )
    np.testing.assert_allclose(
        np.asarray(prefill.logits[:, 0]), np.asarray(full.logits[:, 3]),
        atol=2e-4, rtol=1e-3,
    )
    step1 = model.apply(
        params, ids[:, 4:5], prefill.caches, jnp.int32(4),
        method="decode_step",
    )
    np.testing.assert_allclose(
        np.asarray(step1.logits[:, 0]), np.asarray(full.logits[:, 4]),
        atol=2e-4, rtol=1e-3,
    )
    step2 = model.apply(
        params, ids[:, 5:6], step1.caches, jnp.int32(5),
        method="decode_step",
    )
    np.testing.assert_allclose(
        np.asarray(step2.logits[:, 0]), np.asarray(full.logits[:, 5]),
        atol=2e-4, rtol=1e-3,
    )


def test_llm_packed_segments():
    """Packed segments are independent: same tokens -> same logits."""
    model = MLATransformer(LLM_TINY)
    a = jax.random.randint(jax.random.key(0), (1, 4), 1, 90)
    b = jax.random.randint(jax.random.key(1), (1, 4), 1, 90)
    packed = jnp.concatenate([a, b], axis=1)
    seg = jnp.concatenate(
        [jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)], axis=1
    )
    pos = jnp.concatenate([jnp.arange(4), jnp.arange(4)])[None]
    params = model.init(jax.random.key(2), packed)
    out_packed = model.apply(
        params, packed, segment_ids=seg, position_ids=pos
    )
    out_b = model.apply(params, b)
    np.testing.assert_allclose(
        np.asarray(out_packed.logits[:, 4:]), np.asarray(out_b.logits),
        atol=1e-4, rtol=1e-3,
    )


def test_mla_chunked_prefill_matches_full():
    """Second-chunk prefill (cache_len > 0) must equal the full forward.
    Regression for ADVICE r1 finding #4 (prefill ignored the cache)."""
    model = MLAttention(MLA_TINY, attn_impl="xla")
    b, s, split = 2, 12, 5
    x = jax.random.normal(jax.random.key(3), (b, s, 64))
    from internvideo_tpu.nn.rope import rope_cos_sin
    cos, sin = rope_cos_sin(jnp.arange(s)[None], 16)
    cos = jnp.broadcast_to(cos, (b, s, 16))
    sin = jnp.broadcast_to(sin, (b, s, 16))
    params = model.init(jax.random.key(4), x, cos, sin)
    full = model.apply(params, x, cos, sin)

    cache = jnp.zeros((b, 16, MLA_TINY.cache_dim), jnp.float32)
    out1, cache = model.apply(
        params, x[:, :split], cos[:, :split], sin[:, :split], cache, 0,
        method="prefill",
    )
    out2, cache = model.apply(
        params, x[:, split:], cos[:, split:], sin[:, split:], cache, split,
        method="prefill",
    )
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(full[:, :split]), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(full[:, split:]), atol=1e-5, rtol=1e-4
    )


def test_moe_llm_forward_and_decode():
    """MoE feed-forward inside the MLA LLM (Qwen3-MoE/Intern-S1 class):
    forward emits aux losses via intermediates; cached decode matches the
    full forward."""
    from internvideo_tpu.models.llm import LLMConfig, MLATransformer, moe_aux_losses
    from internvideo_tpu.nn.mla import MLAConfig
    from internvideo_tpu.nn.moe import MoEConfig

    cfg = LLMConfig(
        vocab_size=64, hidden_size=32, num_layers=2, intermediate_size=48,
        mrope_section=None,
        mla=MLAConfig(
            hidden_size=32, num_heads=2, kv_lora_rank=16,
            qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8,
        ),
        moe=MoEConfig(num_experts=4, top_k=2, intermediate_size=24,
                      dispatch="dropless"),
        attn_impl="xla",
    )
    model = MLATransformer(cfg)
    ids = jnp.concatenate([
        jnp.arange(6, dtype=jnp.int32)[None],
        jnp.arange(6, dtype=jnp.int32)[None] + 3,
    ])
    params = model.init(jax.random.key(0), ids)
    out, inter = model.apply(
        params, ids, mutable=["intermediates"], capture_intermediates=True
    )
    assert out.logits.shape == (2, 6, 64)
    aux = moe_aux_losses(inter["intermediates"])
    assert np.isfinite(float(aux)) and float(aux) > 0

    # cached decode parity vs dense forward
    full = model.apply(params, ids).logits
    caches = model.apply(params, 2, 8, jnp.float32, method="init_cache")
    emb = model.apply(params, ids[:, :5],
                      method=lambda m, i: m.embed_tokens(i))
    pre = model.apply(params, emb, caches, method="prefill")
    np.testing.assert_allclose(
        np.asarray(pre.logits[:, -1]), np.asarray(full[:, 4]),
        atol=2e-4, rtol=2e-3,
    )
    step = model.apply(
        params, ids[:, 5:6], pre.caches, jnp.int32(5), method="decode_step"
    )
    np.testing.assert_allclose(
        np.asarray(step.logits[:, 0]), np.asarray(full[:, 5]),
        atol=2e-4, rtol=2e-3,
    )


def test_internvl_compose():
    """InternVL/Intern-S1 compose: InternViT patches → pixel shuffle →
    projector → scattered into the LLM at image placeholders."""
    from internvideo_tpu.models.internvl import (
        InternVLChat,
        InternVLConfig,
        pixel_shuffle,
    )
    from internvideo_tpu.models.internvideo2 import InternVideo2Config
    from internvideo_tpu.models.llm import LLMConfig
    from internvideo_tpu.nn.mla import MLAConfig

    # pixel shuffle restacks 2x2 spatial blocks into channels
    x = jnp.arange(1 * 4 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 4, 2)
    y = pixel_shuffle(x, 0.5)
    assert y.shape == (1, 2, 2, 8)
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0]), np.asarray(
            jnp.concatenate([x[0, 0, 0], x[0, 0, 1], x[0, 1, 0], x[0, 1, 1]])
        ),
    )

    cfg = InternVLConfig(
        vision=InternVideo2Config(
            embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0,
            patch_size=8, img_size=32, num_frames=1, tubelet_size=1,
            clip_embed_dim=16, num_classes=0, attn_impl="xla",
        ),
        text=LLMConfig(
            vocab_size=64, hidden_size=48, num_layers=1,
            intermediate_size=96, mrope_section=None,
            mla=MLAConfig(
                hidden_size=48, num_heads=2, kv_lora_rank=16,
                qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8,
            ),
            attn_impl="xla",
        ),
        image_token_id=60,
    )
    model = InternVLChat(cfg)
    # 4x4 patch grid -> pixel shuffle 0.5 -> 4 tokens per image
    ids = np.full((2, 10), 3, np.int32)
    ids[:, 2:6] = 60  # 4 placeholders
    images = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params = model.init(jax.random.key(1), jnp.asarray(ids), images)
    out = model.apply(params, jnp.asarray(ids), images)
    assert out.logits.shape == (2, 10, 64)

    # image content reaches the LM: different images change the logits at
    # placeholder-adjacent positions
    out2 = model.apply(params, jnp.asarray(ids), images + 1.0)
    assert float(jnp.max(jnp.abs(out.logits - out2.logits))) > 1e-4

    # the Intern-S1 presets build
    from internvideo_tpu.models.presets import intern_s1, intern_s1_mini

    assert intern_s1().text.moe is not None
    assert intern_s1_mini().vision.depth == 24


def test_paged_generate_matches_dense():
    """End-to-end paged generate (XLA gather path AND Pallas interpret
    kernel) produces token-identical output to the dense-cache generate."""
    from internvideo_tpu.models.generation import generate

    model = MLATransformer(LLM_TINY)
    ids = jax.random.randint(jax.random.key(3), (2, 5), 1, 90)
    params = model.init(jax.random.key(4), ids)

    dense = generate(model, params, ids, max_new_tokens=6)
    paged_xla = generate(
        model, params, ids, max_new_tokens=6,
        paged=True, page_size=4, decode_impl="xla",
    )
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(paged_xla))
    paged_kernel = generate(
        model, params, ids, max_new_tokens=6,
        paged=True, page_size=4, decode_impl="pallas", interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(dense), np.asarray(paged_kernel)
    )


def test_generate_topk_topp_sampling():
    from internvideo_tpu.models.generation import generate

    model = MLATransformer(LLM_TINY)
    ids = jax.random.randint(jax.random.key(5), (2, 4), 1, 90)
    params = model.init(jax.random.key(6), ids)

    # top_k=1 at any temperature == greedy
    greedy = generate(model, params, ids, max_new_tokens=5)
    k1 = generate(model, params, ids, max_new_tokens=5,
                  temperature=1.0, top_k=1, rng=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(k1))
    # tiny top_p keeps only the argmax token -> greedy as well
    p_small = generate(model, params, ids, max_new_tokens=5,
                       temperature=1.0, top_p=1e-6, rng=jax.random.key(8))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(p_small))
    # plain sampling stays in-vocab and runs
    samp = generate(model, params, ids, max_new_tokens=5,
                    temperature=1.0, top_k=10, top_p=0.9,
                    rng=jax.random.key(9))
    assert np.asarray(samp).shape == (2, 5)
    assert (np.asarray(samp) >= 0).all() and (np.asarray(samp) < 97).all()


def test_hf_mla_llm_roundtrip():
    """params -> HF-layout state dict -> params roundtrip preserves the
    tree and the forward logits (the Qwen3-VL-MLA checkpoint bridge)."""
    from internvideo_tpu.models.convert import (
        convert_hf_mla_llm,
        export_mla_llm_hf,
    )

    model = MLATransformer(LLM_TINY)
    ids = jax.random.randint(jax.random.key(0), (2, 6), 1, 90)
    params = model.init(jax.random.key(1), ids)

    sd = export_mla_llm_hf(params, LLM_TINY)
    assert "model.layers.0.self_attn.kv_b_proj.weight" in sd
    assert "model.layers.1.mlp.gate_proj.weight" in sd
    back = convert_hf_mla_llm(sd, LLM_TINY)

    ref = model.apply(params, ids).logits
    out = model.apply(back, ids).logits
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)

    # q-LoRA flavor exercises the q_a/q_b path
    import dataclasses

    cfg2 = dataclasses.replace(
        LLM_TINY, mla=dataclasses.replace(MLA_TINY, q_lora_rank=12)
    )
    model2 = MLATransformer(cfg2)
    params2 = model2.init(jax.random.key(2), ids)
    back2 = convert_hf_mla_llm(export_mla_llm_hf(params2, cfg2), cfg2)
    np.testing.assert_allclose(
        np.asarray(model2.apply(back2, ids).logits),
        np.asarray(model2.apply(params2, ids).logits),
        atol=1e-6, rtol=1e-6,
    )


def test_hf_mla_moe_llm_roundtrip():
    """MoE flavor (Intern-S1/Qwen3-MoE class): expert stacking roundtrips."""
    import dataclasses

    from internvideo_tpu.models.convert import (
        convert_hf_mla_llm,
        export_mla_llm_hf,
    )
    from internvideo_tpu.nn.moe import MoEConfig

    cfg = dataclasses.replace(
        LLM_TINY,
        moe=MoEConfig(num_experts=4, top_k=2, intermediate_size=32,
                      dispatch="dense"),
    )
    model = MLATransformer(cfg)
    ids = jax.random.randint(jax.random.key(0), (2, 6), 1, 90)
    params = model.init(jax.random.key(1), ids)

    sd = export_mla_llm_hf(params, cfg)
    assert "model.layers.0.mlp.experts.3.down_proj.weight" in sd
    assert "model.layers.0.mlp.gate.weight" in sd
    back = convert_hf_mla_llm(sd, cfg)

    ref = model.apply(params, ids).logits
    out = model.apply(back, ids).logits
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
