"""Patch embedding and sin-cos positional embeddings.

Positional math follows the standard MAE/MVD recipe the reference uses
(InternVideo2/single_modality/models/pos_embed.py): a 3D embedding is the
concatenation of a temporal 1D embedding on the first D/4 channels and a
spatial 2D embedding on the remaining 3D/4, laid out in [T, H, W] patch order
with an all-zero CLS slot in front.

The patch projection is TPU-first: a stride==kernel Conv3D is exactly a
block-reshape followed by one big GEMM, so we express it that way and let the
MXU see a single (B*T*H*W, t*p*p*3) x (t*p*p*3, D) matmul instead of a conv
(reference uses nn.Conv3d — internvideo2.py:300-330).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _sincos_1d(embed_dim: int, positions: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = 1.0 / 10000 ** (
        np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    )
    angles = np.outer(positions.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(angles), np.cos(angles)], axis=1)


def get_1d_sincos_pos_embed(embed_dim: int, length: int, cls_token: bool = False):
    emb = _sincos_1d(embed_dim, np.arange(length))
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False):
    assert embed_dim % 2 == 0
    # row-major (h, w) flattening; the *w* coordinate occupies the first half
    # of channels (matching the reference's xy-indexed meshgrid —
    # pos_embed.py:72-76, where its `emb_h` actually encodes w)
    hh, ww = np.meshgrid(
        np.arange(grid_size), np.arange(grid_size), indexing="ij"
    )
    emb = np.concatenate(
        [_sincos_1d(embed_dim // 2, ww), _sincos_1d(embed_dim // 2, hh)], axis=1
    )
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)


def get_3d_sincos_pos_embed(
    embed_dim: int, grid_size: int, t_size: int, cls_token: bool = False
):
    """[1 + T*H*W, D]: first D/4 channels temporal, last 3D/4 spatial."""
    assert embed_dim % 4 == 0
    dim_t, dim_s = embed_dim // 4, embed_dim // 4 * 3
    emb_t = _sincos_1d(dim_t, np.arange(t_size))  # (T, D/4)
    emb_s = get_2d_sincos_pos_embed(dim_s, grid_size)  # (H*W, 3D/4)
    n_s = grid_size * grid_size
    full = np.concatenate(
        [
            np.repeat(emb_t[:, None, :], n_s, axis=1),
            np.broadcast_to(emb_s[None, :, :], (t_size, n_s, dim_s)),
        ],
        axis=-1,
    ).reshape(t_size * n_s, embed_dim)
    if cls_token:
        full = np.concatenate([np.zeros((1, embed_dim)), full], axis=0)
    return full.astype(np.float32)


def interpolate_pos_embed(
    pos_embed: jax.Array,  # (1 + T0*H0*W0, D) with cls slot
    src_grid: Sequence[int],  # (T0, H0, W0)
    dst_grid: Sequence[int],  # (T1, H1, W1)
) -> jax.Array:
    """Trilinear resampling of a learned 3D pos embed (checkpoint surgery).

    Mirrors the capability of the reference's temporal/spatial interpolation
    (multi_modality/models/backbones/internvideo2/pos_embed.py:137-298) used
    whenever frame count or resolution changes between pretrain and finetune.
    """
    cls_tok, grid_part = pos_embed[:1], pos_embed[1:]
    t0, h0, w0 = src_grid
    t1, h1, w1 = dst_grid
    d = grid_part.shape[-1]
    vol = grid_part.reshape(t0, h0, w0, d)
    vol = jax.image.resize(vol, (t1, h1, w1, d), method="trilinear")
    return jnp.concatenate([cls_tok, vol.reshape(t1 * h1 * w1, d)], axis=0)


class PatchEmbed3D(nn.Module):
    """Tubelet patchify: (B, T, H, W, 3) -> (B, T', L, D).

    Equivalent to reference Conv3d(kernel=stride=(tubelet, p, p))
    (internvideo2.py:300-330) but as reshape + Dense so the projection is one
    MXU GEMM. Input is channels-last video.
    """

    embed_dim: int
    patch_size: int = 14
    tubelet_size: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        p, ts = self.patch_size, self.tubelet_size
        assert t % ts == 0 and h % p == 0 and w % p == 0, (x.shape, ts, p)
        gt, gh, gw = t // ts, h // p, w // p
        x = x.reshape(b, gt, ts, gh, p, gw, p, c)
        # -> (B, gt, gh, gw, ts, p, p, c): patch-content dims contiguous last
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, gt, gh * gw, ts * p * p * c)
        x = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), ("kernel_spatial", "embed")
            ),
            name="proj",
        )(x.astype(self.dtype))
        return x  # (B, T', H'*W', D)
