"""Focal losses (sigmoid + softmax) — jnp, trivially XLA-fusible.

Replaces the alphaction CUDA focal-loss kernels
(SigmoidFocalLoss_cuda.cu, SoftmaxFocalLoss_cuda.cu) used by the
spatio-temporal action localization head: elementwise math fuses into the
surrounding graph on TPU, so no kernel is warranted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jax.Array,  # (N, C)
    targets: jax.Array,  # (N,) int class ids in [1, C]; 0 = background
    *,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jax.Array:
    """Per-element focal loss summed over classes, mean over N
    (matches the CUDA kernel's class-id convention: class c at column c-1)."""
    n, c = logits.shape
    cls = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1) + 1
    pos = cls == targets[:, None]
    neg = (~pos) & (targets[:, None] >= 0)
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    logp = jax.nn.log_sigmoid(logits.astype(jnp.float32))
    log1mp = jax.nn.log_sigmoid(-logits.astype(jnp.float32))
    loss_pos = -((1 - p) ** gamma) * logp * alpha
    loss_neg = -(p ** gamma) * log1mp * (1 - alpha)
    loss = jnp.where(pos, loss_pos, 0.0) + jnp.where(neg, loss_neg, 0.0)
    return jnp.sum(loss) / n


def softmax_focal_loss(
    logits: jax.Array,  # (N, C) — column 0 is background
    targets: jax.Array,  # (N,) int in [0, C)
    *,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.exp(logp)
    pt = jnp.take_along_axis(p, targets[:, None], axis=-1)[:, 0]
    logpt = jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    a = jnp.where(targets > 0, alpha, 1 - alpha)
    loss = -a * ((1 - pt) ** gamma) * logpt
    return jnp.mean(loss)
