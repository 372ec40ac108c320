"""GRPO reinforcement learning: group-relative policy optimization.

Counterpart of xtuner's RL stack core (xtuner/v1/rl/grpo/loss.py:20,
rl/base/worker.py, rollout_is.py): the policy loss with clipped importance
ratios, group-normalized advantages (responses to the same prompt form a
group), and a k3 KL penalty against a frozen reference policy. The
reference's ray/vLLM rollout infrastructure maps to this framework's own
compiled `models/generation.generate` loop — rollouts are just jit'd
sampling on the same mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GRPOConfig:
    clip_eps_low: float = 0.2
    clip_eps_high: float = 0.2
    kl_beta: float = 0.0  # 0 disables the reference-policy KL term
    group_size: int = 8  # responses per prompt
    adv_eps: float = 1e-4


def group_relative_advantages(
    rewards: jax.Array,  # (num_prompts * group_size,)
    group_size: int,
    eps: float = 1e-4,
) -> jax.Array:
    """A_i = (r_i - mean_group) / (std_group + eps), per prompt group."""
    g = rewards.reshape(-1, group_size)
    mean = jnp.mean(g, axis=1, keepdims=True)
    std = jnp.std(g, axis=1, keepdims=True)
    return ((g - mean) / (std + eps)).reshape(-1)


def token_logprobs(logits: jax.Array, tokens: jax.Array) -> jax.Array:
    """(B, L, V) logits, (B, L) sampled tokens -> (B, L) log-probs."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]


def grpo_policy_loss(
    logp: jax.Array,  # (B, L) current-policy log-probs of sampled tokens
    logp_old: jax.Array,  # (B, L) behavior-policy log-probs (rollout time)
    advantages: jax.Array,  # (B,) group-relative advantages
    mask: jax.Array,  # (B, L) 1 on response tokens
    cfg: GRPOConfig,
    logp_ref: Optional[jax.Array] = None,  # (B, L) frozen reference policy
):
    """Returns (loss, metrics). Token-mean normalization over the batch."""
    ratio = jnp.exp(logp - jax.lax.stop_gradient(logp_old))
    adv = advantages[:, None]
    unclipped = ratio * adv
    clipped = jnp.clip(
        ratio, 1.0 - cfg.clip_eps_low, 1.0 + cfg.clip_eps_high
    ) * adv
    obj = jnp.minimum(unclipped, clipped)

    kl = jnp.zeros_like(logp)
    if cfg.kl_beta > 0.0 and logp_ref is not None:
        # k3 estimator: unbiased, always >= 0
        d = jax.lax.stop_gradient(logp_ref) - logp
        kl = jnp.exp(d) - d - 1.0
        obj = obj - cfg.kl_beta * kl

    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = -jnp.sum(obj * mask) / denom
    metrics = {
        "ratio_mean": jnp.sum(ratio * mask) / denom,
        "clip_frac": jnp.sum(
            ((ratio < 1 - cfg.clip_eps_low) | (ratio > 1 + cfg.clip_eps_high))
            * mask
        ) / denom,
        "kl": jnp.sum(kl * mask) / denom,
    }
    return loss, metrics
