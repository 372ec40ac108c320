"""InternVideo2 encoder: shapes, masking, pos-embed parity, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internvideo_tpu.models.internvideo2 import (
    InternVideo2,
    InternVideo2Config,
    make_config,
)
from internvideo_tpu.nn.embeds import (
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
    get_3d_sincos_pos_embed,
    interpolate_pos_embed,
)

TINY = InternVideo2Config(
    embed_dim=64, depth=2, num_heads=2, mlp_ratio=4.0,
    patch_size=14, img_size=56, num_frames=4, tubelet_size=1,
    clip_embed_dim=32, num_classes=10, attn_impl="xla",
)


def _video(b=2, cfg=TINY):
    key = jax.random.key(0)
    return jax.random.normal(
        key, (b, cfg.num_frames, cfg.img_size, cfg.img_size, 3), jnp.float32
    )


def test_forward_shapes():
    model = InternVideo2(TINY)
    video = _video()
    params = model.init(jax.random.key(1), video)
    out = model.apply(params, video)
    n = TINY.num_patches
    assert out.pooled.shape == (2, 32)
    assert out.logits.shape == (2, 10)
    assert out.tokens.shape == (2, 1 + n, 64)


def test_masked_forward():
    model = InternVideo2(TINY)
    video = _video()
    n = TINY.num_patches
    n_vis = n // 4
    keep = jnp.stack([
        jnp.arange(n_vis, dtype=jnp.int32),
        jnp.arange(n_vis, dtype=jnp.int32) * 2,
    ])
    params = model.init(jax.random.key(1), video)
    out = model.apply(params, video, keep_indices=keep)
    assert out.tokens.shape == (2, 1 + n_vis, 64)


def test_jit_and_determinism():
    model = InternVideo2(TINY)
    video = _video()
    params = model.init(jax.random.key(1), video)
    f = jax.jit(lambda p, v: model.apply(p, v).pooled)
    a, b = f(params, video), f(params, video)
    np.testing.assert_array_equal(a, b)


def test_size_registry():
    cfg = make_config("1B")
    assert cfg.embed_dim == 1408 and cfg.depth == 40
    assert abs(cfg.mlp_ratio - 48 / 11) < 1e-9
    cfg = make_config("6B")
    assert cfg.embed_dim == 3200 and cfg.depth == 48 and cfg.num_heads == 25


def test_pos_embed_matches_reference_formula():
    """Independently verify against the published MAE/MVD sincos recipe."""
    d, g, t = 64, 4, 2
    emb = get_3d_sincos_pos_embed(d, g, t, cls_token=True)
    assert emb.shape == (1 + t * g * g, d)
    np.testing.assert_array_equal(emb[0], np.zeros(d))
    # temporal part (first d//4 channels) identical across spatial positions
    grid = emb[1:].reshape(t, g * g, d)
    np.testing.assert_allclose(grid[:, 0, : d // 4], grid[:, -1, : d // 4])
    # spatial part identical across time
    np.testing.assert_allclose(grid[0, :, d // 4:], grid[-1, :, d // 4:])
    # first temporal channel at t, pos p: sin(t * 1.0) since omega[0]=1
    np.testing.assert_allclose(grid[1, 0, 0], np.sin(1.0), rtol=1e-6)
    # 1d/2d helpers agree with direct formula
    e1 = get_1d_sincos_pos_embed(16, 5)
    np.testing.assert_allclose(e1[3, 0], np.sin(3.0), rtol=1e-6)
    e2 = get_2d_sincos_pos_embed(32, 3)
    assert e2.shape == (9, 32)


def test_pos_embed_interpolation():
    d = 64
    src = jnp.asarray(get_3d_sincos_pos_embed(d, 4, 2, cls_token=True))
    dst = interpolate_pos_embed(src, (2, 4, 4), (4, 8, 8))
    assert dst.shape == (1 + 4 * 8 * 8, d)
    np.testing.assert_array_equal(dst[0], src[0])
