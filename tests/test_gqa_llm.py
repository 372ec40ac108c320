"""Dense-GQA causal LM: cache parity, HF roundtrip, generate."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from internvideo_tpu.models.llm_gqa import GQAConfig, GQATransformer

CFG = GQAConfig(
    vocab_size=97, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, intermediate_size=128, qk_norm=True,
    attn_impl="xla",
)


def test_gqa_cache_matches_full_forward():
    model = GQATransformer(CFG)
    ids = jax.random.randint(jax.random.key(0), (2, 6), 1, 90)
    params = model.init(jax.random.key(1), ids)
    full = model.apply(params, ids)
    assert full.logits.shape == (2, 6, 97)

    caches = model.apply(params, 2, 8, jnp.float32, method="init_cache")
    embeds = model.apply(params, method=lambda m: m.embed_tokens)(ids[:, :4])
    pre = model.apply(params, embeds, caches, method="prefill")
    np.testing.assert_allclose(
        np.asarray(pre.logits[:, 0]), np.asarray(full.logits[:, 3]),
        atol=2e-4, rtol=1e-3,
    )
    step1 = model.apply(params, ids[:, 4:5], pre.caches, jnp.int32(4),
                        method="decode_step")
    np.testing.assert_allclose(
        np.asarray(step1.logits[:, 0]), np.asarray(full.logits[:, 4]),
        atol=2e-4, rtol=1e-3,
    )
    step2 = model.apply(params, ids[:, 5:6], step1.caches, jnp.int32(5),
                        method="decode_step")
    np.testing.assert_allclose(
        np.asarray(step2.logits[:, 0]), np.asarray(full.logits[:, 5]),
        atol=2e-4, rtol=1e-3,
    )


def test_gqa_packed_segments_independent():
    model = GQATransformer(CFG)
    ids = jax.random.randint(jax.random.key(2), (1, 8), 1, 90)
    params = model.init(jax.random.key(3), ids)
    segs = jnp.asarray([[0, 0, 0, 0, 1, 1, 1, 1]], jnp.int32)
    packed = model.apply(params, ids, segment_ids=segs)
    # second segment alone must produce identical logits
    solo = model.apply(params, ids[:, 4:])
    np.testing.assert_allclose(
        np.asarray(packed.logits[:, 4:]), np.asarray(solo.logits),
        atol=2e-4, rtol=1e-3,
    )


def test_gqa_hf_roundtrip_and_generate():
    from internvideo_tpu.models.convert import (
        convert_hf_gqa_llm,
        export_gqa_llm_hf,
    )
    from internvideo_tpu.models.generation import generate

    model = GQATransformer(CFG)
    ids = jax.random.randint(jax.random.key(4), (2, 5), 1, 90)
    params = model.init(jax.random.key(5), ids)
    sd = export_gqa_llm_hf(params, CFG)
    assert "model.layers.1.self_attn.k_norm.weight" in sd
    back = convert_hf_gqa_llm(sd, CFG)
    np.testing.assert_allclose(
        np.asarray(model.apply(back, ids).logits),
        np.asarray(model.apply(params, ids).logits),
        atol=1e-6, rtol=1e-6,
    )

    out = generate(model, params, ids, max_new_tokens=4)
    assert np.asarray(out).shape == (2, 4)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 97).all()

    # no-qk-norm flavor (LLaMA class) converts too
    cfg2 = dataclasses.replace(CFG, qk_norm=False)
    m2 = GQATransformer(cfg2)
    p2 = m2.init(jax.random.key(6), ids)
    back2 = convert_hf_gqa_llm(export_gqa_llm_hf(p2, cfg2), cfg2)
    np.testing.assert_allclose(
        np.asarray(m2.apply(back2, ids).logits),
        np.asarray(m2.apply(p2, ids).logits),
        atol=1e-6, rtol=1e-6,
    )


def test_mllm_with_gqa_text():
    """Qwen3-VL-dense compose: vision tower + dense-GQA text with mRoPE."""
    from internvideo_tpu.models.generation import generate
    from internvideo_tpu.models.mllm import MLLMConfig, VideoMLLM
    from internvideo_tpu.models.vision_tower import VisionTowerConfig

    cfg = MLLMConfig(
        vision=VisionTowerConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            patch_size=8, temporal_patch_size=2, spatial_merge_size=2,
            pos_embed_grid=6, deepstack_indexes=(0, 1), text_hidden_size=64,
            attn_impl="xla",
        ),
        text=dataclasses.replace(
            CFG, hidden_size=64, mrope_section=(4, 2, 2), head_dim=16,
        ),
        image_token_id=94, video_token_id=95,
    )
    model = VideoMLLM(cfg)
    video = jnp.zeros((2, 2, 16, 16, 3))
    ids = jnp.full((2, 12), 7, jnp.int32)
    ids = ids.at[:, 1:5].set(95)
    params = model.init(jax.random.key(0), ids, video)
    out = model.apply(params, ids, video)
    assert out.logits.shape == (2, 12, CFG.vocab_size)
    assert np.isfinite(np.asarray(out.logits)).all()

    gen = generate(model, params, ids, video=video, max_new_tokens=3)
    assert np.asarray(gen).shape == (2, 3)


def test_gqa_paged_generate_rejected_clearly():
    import pytest

    from internvideo_tpu.models.generation import generate

    model = GQATransformer(CFG)
    ids = jnp.ones((1, 3), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    with pytest.raises(ValueError, match="dense-GQA"):
        generate(model, params, ids, max_new_tokens=2, paged=True)


def test_gqa_sliding_window():
    """Model-level sliding window: train fwd matches an explicit banded
    mask, and cached decode matches the windowed full forward."""
    # banded-mask check needs ONE layer (with depth the window's receptive
    # field compounds, so a suffix run is not equivalent)
    cfg1 = dataclasses.replace(CFG, sliding_window=3, num_layers=1)
    model1 = GQATransformer(cfg1)
    ids = jax.random.randint(jax.random.key(7), (1, 7), 1, 90)
    params1 = model1.init(jax.random.key(8), ids)
    out1 = model1.apply(params1, ids)
    ref1 = GQATransformer(dataclasses.replace(cfg1, sliding_window=None))
    for t in (4, 6):
        lo = max(0, t - 2)  # window=3: positions {t-2, t-1, t}
        pos = jnp.arange(lo, t + 1)[None]
        sub = ref1.apply(params1, ids[:, lo:t + 1], position_ids=pos)
        np.testing.assert_allclose(
            np.asarray(out1.logits[:, t]), np.asarray(sub.logits[:, -1]),
            atol=2e-4, rtol=1e-3, err_msg=f"t={t}",
        )

    # decode parity under the window (2-layer model)
    cfg = dataclasses.replace(CFG, sliding_window=3)
    model = GQATransformer(cfg)
    params = model.init(jax.random.key(8), ids)
    out = model.apply(params, ids)
    caches = model.apply(params, 1, 8, jnp.float32, method="init_cache")
    embeds = model.apply(params, method=lambda m: m.embed_tokens)(ids[:, :6])
    pre = model.apply(params, embeds, caches, method="prefill")
    step = model.apply(params, ids[:, 6:7], pre.caches, jnp.int32(6),
                       method="decode_step")
    np.testing.assert_allclose(
        np.asarray(step.logits[:, 0]), np.asarray(out.logits[:, 6]),
        atol=2e-4, rtol=1e-3,
    )
