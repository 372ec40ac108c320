"""Mixup / CutMix for video batches with soft-label targets.

Device-side, jit-friendly version of the reference's video Mixup adaption
(single_modality/datasets/mixup.py:316): per-batch mixup or cutmix (switch
probability), label smoothing folded into the soft targets. The permutation
partner is `roll by 1` (flip-style pairing works equally; roll keeps shapes
static and is what batch-mode timm mixup reduces to).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.1
    num_classes: int = 400


def _one_hot(labels, n, smoothing):
    off = smoothing / n
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, n) * (on - off) + off


def mixup_cutmix(
    rng: jax.Array,
    video: jax.Array,  # (B, T, H, W, C) float
    labels: jax.Array,  # (B,) int
    cfg: MixupConfig,
):
    """Returns (mixed_video, soft_labels)."""
    r_lam, r_switch, r_box = jax.random.split(rng, 3)
    b = video.shape[0]
    use_cutmix = jax.random.uniform(r_switch) < cfg.switch_prob

    lam_mix = jax.random.beta(r_lam, cfg.mixup_alpha, cfg.mixup_alpha)
    lam_cut = jax.random.beta(r_lam, cfg.cutmix_alpha, cfg.cutmix_alpha)

    partner_v = jnp.roll(video, 1, axis=0)
    y1 = _one_hot(labels, cfg.num_classes, cfg.label_smoothing)
    y2 = jnp.roll(y1, 1, axis=0)

    # mixup branch
    mixed_mix = lam_mix * video + (1 - lam_mix) * partner_v

    # cutmix branch: one box shared by the batch (batch-mode timm)
    h, w = video.shape[2], video.shape[3]
    cut = jnp.sqrt(1.0 - lam_cut)
    ch, cw = (h * cut).astype(jnp.int32), (w * cut).astype(jnp.int32)
    cy = jax.random.randint(r_box, (), 0, h)
    cx = jax.random.randint(jax.random.fold_in(r_box, 1), (), 0, w)
    y0 = jnp.clip(cy - ch // 2, 0, h)
    y1b = jnp.clip(cy + ch // 2, 0, h)
    x0 = jnp.clip(cx - cw // 2, 0, w)
    x1b = jnp.clip(cx + cw // 2, 0, w)
    yy = jnp.arange(h)[None, None, :, None, None]
    xx = jnp.arange(w)[None, None, None, :, None]
    in_box = (yy >= y0) & (yy < y1b) & (xx >= x0) & (xx < x1b)
    mixed_cut = jnp.where(in_box, partner_v, video)
    lam_cut_eff = 1.0 - ((y1b - y0) * (x1b - x0)) / (h * w)

    video_out = jnp.where(use_cutmix, mixed_cut, mixed_mix)
    lam = jnp.where(use_cutmix, lam_cut_eff, lam_mix)
    labels_out = lam * y1 + (1 - lam) * y2
    return video_out, labels_out
