"""Rotary position embeddings: 1D RoPE and 3D mRoPE.

mRoPE follows the Qwen3-VL scheme the reference uses for InternVideo3
(internvideo3_config.py:106 rope_scaling "qwen3_vl", mrope_section
[24, 20, 20]): the head_dim/2 frequency slots are split into (temporal,
height, width) sections, each driven by its own position stream, and text
tokens use the same position on all three streams (reducing to 1D RoPE).

Convention: rotate-half (HF/LLaMA style) — cos/sin have the half-frequencies
repeated twice, x is split in halves.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class YarnConfig:
    """YaRN long-context frequency rescaling (the DeepSeek-V3 recipe —
    reference model/moe/deepseek_v3.py:66-74 RopeScalingConfig(type="yarn",
    beta_fast=32, beta_slow=1, factor=40, original=4096))."""

    factor: float = 40.0
    original_max_position_embeddings: int = 4096
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    mscale: float = 1.0
    mscale_all_dim: float = 1.0


def _yarn_mscale(scale: float, mscale: float) -> float:
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def rope_freqs(
    dim: int, theta: float = 10000.0, yarn: Optional[YarnConfig] = None
) -> jax.Array:
    """(dim/2,) inverse frequencies; with `yarn`, NTK-by-parts rescaled:
    high-frequency slots (more than beta_fast rotations inside the original
    context) keep the base frequency (extrapolation), low-frequency slots
    (fewer than beta_slow rotations) are divided by `factor` (position
    interpolation), with a linear ramp between."""
    inv = 1.0 / (
        theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    if yarn is None:
        return inv

    def correction_dim(num_rotations: float) -> float:
        return (
            dim
            * math.log(
                yarn.original_max_position_embeddings
                / (num_rotations * 2 * math.pi)
            )
            / (2 * math.log(theta))
        )

    low = max(math.floor(correction_dim(yarn.beta_fast)), 0)
    high = min(math.ceil(correction_dim(yarn.beta_slow)), dim // 2 - 1)
    ramp = jnp.clip(
        (jnp.arange(dim // 2, dtype=jnp.float32) - low)
        / max(high - low, 1e-3),
        0.0,
        1.0,
    )
    extrapolation_factor = 1.0 - ramp  # 1 at high-freq slots, 0 at low-freq
    return (
        inv / yarn.factor * (1.0 - extrapolation_factor)
        + inv * extrapolation_factor
    )


def rope_cos_sin(
    positions: jax.Array,  # (..., S) int/float positions
    dim: int,
    theta: float = 10000.0,
    yarn: Optional[YarnConfig] = None,
):
    """cos/sin of shape (..., S, dim) — half-frequencies tiled twice."""
    inv = rope_freqs(dim, theta, yarn)
    angles = positions[..., None].astype(jnp.float32) * inv  # (..., S, dim/2)
    angles = jnp.concatenate([angles, angles], axis=-1)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    if yarn is not None:
        m = _yarn_mscale(yarn.factor, yarn.mscale) / _yarn_mscale(
            yarn.factor, yarn.mscale_all_dim
        )
        cos, sin = cos * m, sin * m
    return cos, sin


def mrope_cos_sin(
    positions: jax.Array,  # (3, ..., S): (t, h, w) position streams
    dim: int,
    sections: Sequence[int],  # e.g. (24, 20, 20); sum == dim/2
    theta: float = 10000.0,
):
    """Multi-axis RoPE: frequency slots are partitioned among 3 axes."""
    assert sum(sections) == dim // 2, (sections, dim)
    inv = rope_freqs(dim, theta)  # (dim/2,)
    angles = positions[..., None].astype(jnp.float32) * inv  # (3,...,S,dim/2)
    # slot i belongs to axis slot_axis[i]; select that axis's angle per slot
    slot_axis = jnp.repeat(
        jnp.arange(3), jnp.array(sections), total_repeat_length=dim // 2
    )
    onehot = jax.nn.one_hot(slot_axis, 3, dtype=jnp.float32)  # (dim/2, 3)
    picked = jnp.einsum("a...d,da->...d", angles, onehot)
    picked = jnp.concatenate([picked, picked], axis=-1)
    return jnp.cos(picked), jnp.sin(picked)


def rotate_half(x: jax.Array) -> jax.Array:
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def apply_rope(
    x: jax.Array,  # (B, S, H, D)
    cos: jax.Array,  # (B, S, D) or (S, D)
    sin: jax.Array,
) -> jax.Array:
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * cos + rotate_half(xf) * sin).astype(x.dtype)
