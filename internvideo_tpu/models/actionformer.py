"""Temporal action localization — trainable ActionFormer-class model.

The reference's TAL *training* suite (InternVideo1/Downstream/
Temporal-Action-Localization/libs/modeling/meta_archs.py:167-750 —
PtTransformer over InternVideo features) rebuilt TPU-first:

  * conv embed → windowed-attention transformer levels with stride-2
    pooling between pyramid levels (the reference's strided MaskedMHCA —
    blocks.py:194-653 — downsamples the same way; our window attention
    rides the flash kernel's `window` path on TPU)
  * anchor-free point heads: shared 3-layer conv cls + reg heads with a
    per-level learnable scale (meta_archs.py:14-165), offsets predicted
    in stride units through a ReLU
  * point generator + label assignment: radius center sampling, per-level
    regression ranges, shortest-duration tie-break with the reference's
    1e-3 multi-match tolerance (meta_archs.py:432-520) — fully
    vectorized over (points × max_events) with validity masks instead of
    the reference's per-video python loop (static shapes for XLA)
  * losses: sigmoid focal (fvcore convention) + ctr-DIoU 1D
    (losses.py:5-170), normalized by the positive count
  * inference: per-level score thresholding → segments, consumed by
    eval/temporal_detection.py's soft-NMS + ANET mAP

Everything is fixed-shape: features arrive as (B, T, C) with a validity
mask, ground truth as (B, max_events, 2) + labels with an event mask.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from internvideo_tpu.ops import dot_product_attention


@dataclasses.dataclass(frozen=True)
class ActionFormerConfig:
    in_dim: int = 2048          # InternVideo feature dim
    embed_dim: int = 256
    num_heads: int = 4
    num_levels: int = 4         # pyramid levels (stride 2**l)
    num_blocks: int = 2         # transformer blocks in the stem
    window: int = 9             # local attention window (full if <= 0)
    head_layers: int = 3
    num_classes: int = 20
    max_seq_len: int = 256      # T at stride 1 (divisible by 2**levels)
    center_sample_radius: float = 1.5
    # per-level regression ranges in stride-1 frame units, CONTIGUOUS and
    # not stride-scaled (reference config.py:51 [(0,4),(4,8),(8,16),...];
    # meta_archs.py:503-507 compares the unnormalized max regress distance
    # against them, so gaps between levels would orphan medium-length
    # events — no point would ever label them positive)
    regression_ranges: Optional[tuple] = None
    dtype: str = "float32"

    def ranges(self) -> np.ndarray:
        if self.regression_ranges is not None:
            return np.asarray(self.regression_ranges, np.float32)
        r = [(0.0, 4.0)]
        for _ in range(1, self.num_levels):
            r.append((r[-1][1], r[-1][1] * 2))
        r[-1] = (r[-1][0], 1e8)
        return np.asarray(r, np.float32)


def generate_points(cfg: ActionFormerConfig):
    """(sum_l T/2^l, 4) rows of [t, range_lo, range_hi, stride] — the
    PointGenerator (loc_generators.py:28-85) materialized once."""
    rows = []
    ranges = cfg.ranges()
    for lvl in range(cfg.num_levels):
        stride = 2 ** lvl
        t = cfg.max_seq_len // stride
        coords = (np.arange(t, dtype=np.float32) + 0.5) * stride
        lo = np.full(t, ranges[lvl, 0], np.float32)
        hi = np.full(t, ranges[lvl, 1], np.float32)
        st = np.full(t, float(stride), np.float32)
        rows.append(np.stack([coords, lo, hi, st], axis=1))
    return np.concatenate(rows, axis=0)


class _ConvHead(nn.Module):
    """Shared 1D-conv tower + final conv (meta_archs.py:14-165)."""

    out_dim: int
    layers: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):  # (B, T, D)
        for i in range(self.layers):
            x = nn.Conv(x.shape[-1], (3,), padding="SAME", dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x))
        return nn.Conv(self.out_dim, (3,), padding="SAME", dtype=self.dtype,
                       name="out")(x)


class _Block(nn.Module):
    num_heads: int
    window: int
    dtype: jnp.dtype
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, mask):  # (B, T, D), (B, T)
        d = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype)(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // self.num_heads
        shp = (x.shape[0], x.shape[1], self.num_heads, hd)
        # padding tokens get segment -2 so nothing attends to them
        seg = jnp.where(mask, 0, -2).astype(jnp.int32)
        out = dot_product_attention(
            q.reshape(shp), k.reshape(shp), v.reshape(shp),
            q_segment_ids=seg, kv_segment_ids=seg,
            window=self.window if self.window > 0 else None,
            impl=self.attn_impl,
        ).reshape(x.shape)
        x = x + nn.Dense(d, dtype=self.dtype, name="proj")(out)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(4 * d, dtype=self.dtype, name="fc1")(h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(nn.gelu(h))
        return x + h


class ActionFormer(nn.Module):
    cfg: ActionFormerConfig

    @nn.compact
    def __call__(self, feats, mask):
        """feats (B, T, C) float, mask (B, T) bool ->
        (cls_logits (B, P, num_classes), offsets (B, P, 2) in stride
        units, point_mask (B, P))."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)

        # padding positions are re-zeroed after every position-mixing op
        # (the reference's MaskedConv1D contract) so conv/pool windows at
        # valid/pad boundaries never read garbage activations
        def _zero_pads(h, mm):
            return jnp.where(mm[..., None], h, jnp.zeros_like(h))

        x = _zero_pads(feats.astype(dt), mask)
        x = nn.Conv(cfg.embed_dim, (3,), padding="SAME", dtype=dt,
                    name="embed0")(x)
        x = nn.relu(x)
        x = nn.Conv(cfg.embed_dim, (3,), padding="SAME", dtype=dt,
                    name="embed1")(x)
        x = _zero_pads(x, mask)
        for i in range(cfg.num_blocks):
            x = _Block(cfg.num_heads, cfg.window, dt, name=f"stem{i}")(
                x, mask)
            x = _zero_pads(x, mask)

        cls_head = _ConvHead(cfg.num_classes, cfg.head_layers, dt,
                             name="cls_head")
        reg_head = _ConvHead(2, cfg.head_layers, dt, name="reg_head")

        logits, offsets, masks = [], [], []
        m = mask
        for lvl in range(cfg.num_levels):
            if lvl > 0:
                # masked max-pool: pads contribute -inf, so a window with
                # any valid input keeps its true (possibly negative) max
                x = nn.max_pool(
                    jnp.where(m[..., None], x, -jnp.inf),
                    (2,), strides=(2,), padding="SAME",
                )
                m = m[:, ::2]
                x = _zero_pads(x, m)  # fully-pad windows: -inf -> 0
                x = _Block(cfg.num_heads, cfg.window, dt,
                           name=f"level{lvl}")(x, m)
                x = _zero_pads(x, m)
            scale = self.param(f"scale_{lvl}", nn.initializers.ones, ())
            logits.append(cls_head(x))
            offsets.append(nn.relu(reg_head(x) * scale))
            masks.append(m)
        return (
            jnp.concatenate(logits, axis=1),
            jnp.concatenate(offsets, axis=1),
            jnp.concatenate(masks, axis=1),
        )


# ---------------------------------------------------------------------------
# Label assignment + losses (meta_archs.py:432-560, losses.py:5-170)
# ---------------------------------------------------------------------------


def label_points(
    points: jax.Array,     # (P, 4) [t, lo, hi, stride]
    segments: jax.Array,   # (B, N, 2) start/end in stride-1 units
    labels: jax.Array,     # (B, N) int in [0, C)
    event_mask: jax.Array,  # (B, N) bool
    *,
    num_classes: int,
    center_sample_radius: float = 1.5,
):
    """-> (cls_targets (B, P, C) multi-hot, reg_targets (B, P, 2) in
    stride units, pos_mask (B, P))."""
    t = points[None, :, 0, None]                     # (1, P, 1)
    stride = points[None, :, 3, None]
    lo, hi = points[None, :, 1, None], points[None, :, 2, None]
    seg = segments[:, None]                          # (B, 1, N, 2)
    left = t - seg[..., 0]                           # (B, P, N)
    right = seg[..., 1] - t
    lens = seg[..., 1] - seg[..., 0]

    center = 0.5 * (seg[..., 0] + seg[..., 1])
    t_min = jnp.maximum(center - stride * center_sample_radius, seg[..., 0])
    t_max = jnp.minimum(center + stride * center_sample_radius, seg[..., 1])
    inside = jnp.minimum(t - t_min, t_max - t) > 0

    max_dist = jnp.maximum(left, right)
    in_range = (max_dist >= lo) & (max_dist <= hi)
    valid = inside & in_range & event_mask[:, None]

    big = jnp.asarray(np.float32(np.inf))
    lens_m = jnp.where(valid, lens, big)
    min_len = jnp.min(lens_m, axis=-1, keepdims=True)   # (B, P, 1)
    # multi-match tolerance (meta_archs.py: min_len + 1e-3)
    match = (lens_m <= min_len + 1e-3) & valid          # (B, P, N)

    onehot = jax.nn.one_hot(labels, num_classes)        # (B, N, C)
    cls_targets = jnp.clip(
        jnp.einsum("bpn,bnc->bpc", match.astype(jnp.float32), onehot),
        0.0, 1.0)
    pos_mask = jnp.any(match, axis=-1)

    # regression target from the argmin-length matched event, normalized
    # by stride (the reference divides by stride before the loss)
    idx = jnp.argmin(jnp.where(match, lens_m, big), axis=-1)  # (B, P)
    gl = jnp.take_along_axis(left, idx[..., None], axis=-1)[..., 0]
    gr = jnp.take_along_axis(right, idx[..., None], axis=-1)[..., 0]
    reg_targets = jnp.stack([gl, gr], axis=-1) / points[None, :, 3, None]
    return cls_targets, reg_targets, pos_mask


def ctr_diou_loss_1d(pred, target, eps: float = 1e-8):
    """Per-row DIoU for center-offset 1D segments (losses.py:108-170)."""
    lp, rp = pred[..., 0], pred[..., 1]
    lg, rg = target[..., 0], target[..., 1]
    inter = jnp.minimum(lp, lg) + jnp.minimum(rp, rg)
    union = (lp + rp) + (lg + rg) - inter
    iou = inter / jnp.maximum(union, eps)
    # smallest enclosing box + center distance
    lc = jnp.maximum(lp, lg)
    rc = jnp.maximum(rp, rg)
    len_c = lc + rc
    rho = 0.5 * (rp - lp) - 0.5 * (rg - lg)
    return 1.0 - iou + jnp.square(rho) / jnp.maximum(jnp.square(len_c), eps)


def focal_multihot(logits, targets, *, gamma=2.0, alpha=0.25):
    """fvcore sigmoid_focal_loss (losses.py:5-52), multi-hot targets."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * loss


def actionformer_loss(model_out, points, batch, cfg: ActionFormerConfig,
                      *, loss_weight: float = 1.0):
    """Total = focal cls / num_pos + weight * DIoU over positives
    (meta_archs.py:560-640 `losses`)."""
    logits, offsets, point_mask = model_out
    cls_t, reg_t, pos = label_points(
        points, batch["segments"], batch["labels"], batch["event_mask"],
        num_classes=cfg.num_classes,
        center_sample_radius=cfg.center_sample_radius,
    )
    valid = point_mask
    num_pos = jnp.maximum(jnp.sum(pos & valid), 1.0)
    cls_loss = jnp.sum(
        focal_multihot(logits, cls_t) * valid[..., None]) / num_pos
    reg_loss = jnp.sum(
        ctr_diou_loss_1d(offsets, reg_t) * (pos & valid)) / num_pos
    return cls_loss + loss_weight * reg_loss, {
        "cls_loss": cls_loss, "reg_loss": reg_loss, "num_pos": num_pos,
    }


def decode_detections(
    logits: np.ndarray,    # (P, C)
    offsets: np.ndarray,   # (P, 2) stride units
    points: np.ndarray,    # (P, 4)
    *,
    score_threshold: float = 0.1,
    max_per_class: int = 100,
):
    """-> per-class list of (start, end, score) segment arrays, ready for
    eval/temporal_detection.nms_proposals (meta_archs.py:650-750
    inference path)."""
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64)))
    t = points[:, 0]
    stride = points[:, 3]
    starts = t - offsets[:, 0] * stride
    ends = t + offsets[:, 1] * stride
    out = {}
    for c in range(probs.shape[1]):
        keep = probs[:, c] >= score_threshold
        if not np.any(keep):
            out[c] = np.zeros((0, 3), np.float32)
            continue
        segs = np.stack(
            [starts[keep], ends[keep], probs[keep, c]], axis=1)
        order = np.argsort(-segs[:, 2])[:max_per_class]
        out[c] = segs[order].astype(np.float32)
    return out
