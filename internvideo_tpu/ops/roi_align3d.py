"""ROIAlign3D / ROIPool3D as pure-XLA gather-interpolate.

Replaces the alphaction CUDA kernels (InternVideo1/Downstream/
Spatial-Temporal-Action-Localization/alphaction/csrc/cuda/ROIAlign3d_cuda.cu,
ROIPool3d_cuda.cu) used for actor-feature extraction. The CUDA kernel's
per-bin sampling grid is a fixed pattern — on TPU that is one big batched
bilinear gather that XLA fuses and differentiates for free; no custom
kernel needed (the op is bandwidth-trivial next to the backbone).

Boxes follow the reference convention: (batch_idx, x1, y1, x2, y2) in input
spatial coordinates, applied identically to every frame of the clip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(feat, ys, xs):
    """feat: (T, H, W, C); ys/xs: (P,) float coords -> (T, P, C)."""
    t, h, w, c = feat.shape
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)

    def g(yi, xi):
        return feat[:, yi, xi, :]  # (T, P, C)

    top = g(y0, x0) * (1 - wx)[None, :, None] + g(y0, x1) * wx[None, :, None]
    bot = g(y1, x0) * (1 - wx)[None, :, None] + g(y1, x1) * wx[None, :, None]
    return top * (1 - wy)[None, :, None] + bot * wy[None, :, None]


def roi_align_3d(
    features: jax.Array,  # (B, T, H, W, C)
    boxes: jax.Array,  # (N, 5): (batch_idx, x1, y1, x2, y2)
    *,
    output_size: tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jax.Array:
    """(N, T, out_h, out_w, C) aligned per-ROI features."""
    out_h, out_w = output_size
    s = sampling_ratio

    def one_roi(box):
        b = box[0].astype(jnp.int32)
        x1, y1, x2, y2 = box[1:] * spatial_scale
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
        bin_w, bin_h = rw / out_w, rh / out_h
        # s x s sample points per bin
        gy = (jnp.arange(out_h * s) + 0.5) / s  # in bin-height units
        gx = (jnp.arange(out_w * s) + 0.5) / s
        ys = y1 + gy * bin_h
        xs = x1 + gx * bin_w
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")  # (out_h*s, out_w*s)
        sampled = _bilinear_sample(
            features[b], yy.reshape(-1), xx.reshape(-1)
        )  # (T, P, C)
        t, _, c = sampled.shape
        sampled = sampled.reshape(t, out_h, s, out_w, s, c)
        return sampled.mean(axis=(2, 4))  # (T, out_h, out_w, C)

    return jax.vmap(one_roi)(boxes)


def roi_pool_3d(
    features: jax.Array,
    boxes: jax.Array,
    *,
    output_size: tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
) -> jax.Array:
    """Max-pool variant (ROIPool3d_cuda.cu) via dense-grid sampling + max."""
    out_h, out_w = output_size
    s = 4  # dense sampling approximates exact max pooling

    def one_roi(box):
        b = box[0].astype(jnp.int32)
        x1, y1, x2, y2 = box[1:] * spatial_scale
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
        ys = y1 + (jnp.arange(out_h * s) + 0.5) / s * (rh / out_h)
        xs = x1 + (jnp.arange(out_w * s) + 0.5) / s * (rw / out_w)
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        sampled = _bilinear_sample(
            features[b], yy.reshape(-1), xx.reshape(-1)
        )
        t, _, c = sampled.shape
        sampled = sampled.reshape(t, out_h, s, out_w, s, c)
        return sampled.max(axis=(2, 4))

    return jax.vmap(one_roi)(boxes)
