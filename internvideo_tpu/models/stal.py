"""Spatio-temporal action localization — trainable ROI action head.

The reference's STAL *training* suite (InternVideo1/Downstream/
Spatial-Temporal-Action-Localization/alphaction/modeling/roi_heads/
action_head/) rebuilt TPU-first:

  * ROIAlign3D person crops from the backbone feature volume
    (`ops/roi_align3d.py` — the JAX port of ROIAlign3d_cuda.cu) →
    temporal mean + spatial max pooling → 2-layer MLP feature extractor
    (roi_action_feature_extractor.py's base path without the optional IA
    structure — that memory/interaction module is an AVA-leaderboard
    add-on) → FC predictor with std=0.01 init
    (roi_action_predictors.py:5-32)
  * AVA-style three-group loss (loss.py:6-78): softmax focal over
    pose-movement classes + sigmoid focal over object-manipulation and
    person-interaction groups, all normalized by the average box count
  * `random_box_aug` — the proposal jitter random_aug(0.2, 0.1, 0.1,
    0.05) applied during box sampling (loss.py:24-38), functional rng
  * fixed shapes: boxes arrive padded (B, N, 4) with a validity mask;
    invalid boxes are masked out of every loss term

Inference scores feed `eval/spatiotemporal.py` (frame-mAP).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.ops.roi_align3d import roi_align_3d


@dataclasses.dataclass(frozen=True)
class STALConfig:
    in_dim: int = 2304          # SlowFast/encoder feature channels
    hidden_dim: int = 512
    num_pose: int = 14          # AVA person-movement classes (softmax)
    num_object: int = 49        # object-manipulation classes (sigmoid)
    num_person: int = 17        # person-interaction classes (sigmoid)
    roi_size: tuple = (7, 7)
    spatial_scale: float = 1.0  # feature-grid units per box unit
    dropout: float = 0.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25

    @property
    def num_classes(self) -> int:
        return self.num_pose + self.num_object + self.num_person


class ROIActionHead(nn.Module):
    cfg: STALConfig

    @nn.compact
    def __call__(self, features, boxes, box_mask, *,
                 deterministic: bool = True):
        """features (B, T, H, W, C); boxes (B, N, 4) xyxy in feature-grid
        units / spatial_scale; box_mask (B, N) -> logits (B, N, classes)."""
        cfg = self.cfg
        b, n = boxes.shape[:2]
        bidx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), n)[:, None]
        flat = jnp.concatenate([bidx, boxes.reshape(b * n, 4)], axis=1)
        roi = roi_align_3d(
            features, flat, output_size=cfg.roi_size,
            spatial_scale=cfg.spatial_scale,
        )  # (B*N, T, h, w, C)
        # temporal average + spatial max pooling (the reference's 3D head
        # pools the same way before the FC layers)
        x = roi.mean(axis=1)
        x = x.max(axis=(1, 2))  # (B*N, C)
        x = nn.relu(nn.Dense(cfg.hidden_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(cfg.hidden_dim, name="fc2")(x))
        if cfg.dropout > 0 and not deterministic:
            x = nn.Dropout(cfg.dropout, deterministic=False)(x)
        logits = nn.Dense(
            cfg.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )(x)
        return logits.reshape(b, n, cfg.num_classes)


def random_box_aug(boxes, key, *, ratio=0.2, shift_x=0.1, shift_y=0.1,
                   scale=0.05):
    """The reference's proposal jitter random_aug(0.2, 0.1, 0.1, 0.05):
    per-box aspect jitter + center shift + scale jitter, functional rng."""
    k1, k1b, k2, k3, k4 = jax.random.split(key, 5)
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    w, h = x2 - x1, y2 - y1
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    u = lambda k, s: jax.random.uniform(k, w.shape, minval=-s, maxval=s)
    # independent w/h draws — the reference jitters each edge separately
    # (bounding_box.py:238-241), so aspect ratio actually changes
    w = w * (1.0 + u(k1, ratio))
    h = h * (1.0 + u(k1b, ratio))
    cx = cx + w * u(k2, shift_x)
    cy = cy + h * u(k3, shift_y)
    s = 1.0 + u(k4, scale)
    w, h = w * s, h * s
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def _sigmoid_focal(logits, targets, gamma, alpha):
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ce * (1 - p_t) ** gamma


def _softmax_focal(logits, labels, gamma, alpha):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -alpha * (1 - jnp.exp(lp)) ** gamma * lp


def stal_loss(logits, labels, box_mask, cfg: STALConfig, *,
              pose_weight=1.2, object_weight=0.5, person_weight=0.5):
    """AVA three-group loss (loss.py:41-78): softmax focal over the pose
    block (argmax of the multi-hot slice, as the reference does) +
    per-group sigmoid focal means, each summed over boxes and divided by
    the average per-clip box count. Padded boxes contribute nothing."""
    np_, no, nper = cfg.num_pose, cfg.num_object, cfg.num_person
    valid = box_mask.astype(jnp.float32)
    avg_box_num = jnp.maximum(jnp.sum(valid) / logits.shape[0], 1.0)

    out = {}
    total = 0.0
    if np_ > 0:
        pose_label = jnp.argmax(labels[..., :np_], axis=-1)
        pose = _softmax_focal(
            logits[..., :np_], pose_label, cfg.focal_gamma, cfg.focal_alpha)
        out["loss_pose_action"] = jnp.sum(pose * valid) / avg_box_num
        total = total + pose_weight * out["loss_pose_action"]
    if no > 0:
        obj = _sigmoid_focal(
            logits[..., np_:np_ + no],
            labels[..., np_:np_ + no].astype(jnp.float32),
            cfg.focal_gamma, cfg.focal_alpha).mean(axis=-1)
        out["loss_object_interaction"] = jnp.sum(obj * valid) / avg_box_num
        total = total + object_weight * out["loss_object_interaction"]
    if nper > 0:
        per = _sigmoid_focal(
            logits[..., np_ + no:],
            labels[..., np_ + no:].astype(jnp.float32),
            cfg.focal_gamma, cfg.focal_alpha).mean(axis=-1)
        out["loss_person_interaction"] = jnp.sum(per * valid) / avg_box_num
        total = total + person_weight * out["loss_person_interaction"]
    return total, out
