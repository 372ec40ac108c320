"""Masking for UMT/MAE-style pretraining — index-based, static shapes.

The reference builds boolean masks and does dynamic `x[~mask]` gathers
(single_modality/datasets/masking_generator.py:4-49 Tube/Random;
engines/engine_for_pretraining.py:106-118 attention-guided via
torch.multinomial). Dynamic shapes don't compile on TPU, so everything here
produces **keep_indices**: an int32 (B, n_vis) tensor of visible patch
positions (sorted ascending), with n_vis a static function of mask_ratio.
Models gather with take_along_axis; teachers gather targets with the same
indices. All generators run on-device inside jit.

Attention-guided masking replaces multinomial-without-replacement with the
Gumbel-top-k trick, which draws from exactly the same distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def num_visible(num_tokens: int, mask_ratio: float) -> int:
    """Static visible count: N - int(N * ratio) (reference engine :107)."""
    return num_tokens - int(num_tokens * mask_ratio)


def random_keep_indices(
    rng: jax.Array, batch: int, num_tokens: int, mask_ratio: float
) -> jax.Array:
    """Uniform random masking (RandomMaskingGenerator equivalent)."""
    n_vis = num_visible(num_tokens, mask_ratio)
    noise = jax.random.uniform(rng, (batch, num_tokens))
    keep = jnp.argsort(noise, axis=-1)[:, :n_vis]
    return jnp.sort(keep, axis=-1).astype(jnp.int32)


def tube_keep_indices(
    rng: jax.Array,
    batch: int,
    t_size: int,
    spatial_size: int,
    mask_ratio: float,
) -> jax.Array:
    """Tube masking: one spatial mask shared by all frames
    (TubeMaskingGenerator, masking_generator.py:4-27)."""
    n_vis_s = num_visible(spatial_size, mask_ratio)
    noise = jax.random.uniform(rng, (batch, spatial_size))
    keep_s = jnp.sort(jnp.argsort(noise, axis=-1)[:, :n_vis_s], axis=-1)
    # tile over time: token index = t * spatial + s
    offsets = (jnp.arange(t_size) * spatial_size)[None, :, None]
    keep = keep_s[:, None, :] + offsets  # (B, T, n_vis_s)
    return keep.reshape(batch, t_size * n_vis_s).astype(jnp.int32)


def attention_guided_keep_indices(
    rng: jax.Array,
    attn: jax.Array,  # (B*T or B, N) nonnegative importance (teacher attn)
    mask_ratio: float,
    *,
    batch: int | None = None,
) -> jax.Array:
    """Sample visible tokens ∝ teacher attention, without replacement.

    Gumbel-top-k over log(attn) == torch.multinomial(attn, N)[:, :n_vis]
    in distribution (engine_for_pretraining.py:106-118). `attn` may be
    per-frame (B*T, N_spatial); pass `batch` to fold frames back into the
    full token index space.
    """
    rows, n = attn.shape
    n_vis = num_visible(n, mask_ratio)
    gumbel = jax.random.gumbel(rng, attn.shape)
    scores = jnp.log(jnp.maximum(attn, 1e-10)) + gumbel
    keep = jax.lax.top_k(scores, n_vis)[1]  # (rows, n_vis)
    keep = jnp.sort(keep, axis=-1)
    if batch is not None and rows != batch:
        t = rows // batch
        keep = keep.reshape(batch, t, n_vis)
        keep = keep + (jnp.arange(t) * n)[None, :, None]
        keep = keep.reshape(batch, t * n_vis)
    return keep.astype(jnp.int32)


def indices_to_mask(keep_indices: jax.Array, num_tokens: int) -> jax.Array:
    """Boolean visible-mask (True = visible) from keep indices."""
    b = keep_indices.shape[0]
    mask = jnp.zeros((b, num_tokens), bool)
    return mask.at[jnp.arange(b)[:, None], keep_indices].set(True)
