"""LoRA adapters for partial finetuning.

The reference's CLIP variant optionally opens the frozen LLaMA text tower
with LoRA (multi_modality/models/internvideo2_clip.py:34-49). `LoRADense`
is a drop-in Dense whose base kernel can be frozen (train/optim.py
trainable_patterns matching `lora_`) while the low-rank update trains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LoRADense(nn.Module):
    features: int
    rank: int = 8
    alpha: float = 16.0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), ("embed", "mlp")
            ),
            (d, self.features),
            self.param_dtype,
        )
        lora_a = self.param(
            "lora_a",
            nn.with_logical_partitioning(
                nn.initializers.normal(1.0 / self.rank), ("embed", None)
            ),
            (d, self.rank),
            self.param_dtype,
        )
        lora_b = self.param(
            "lora_b",
            nn.with_logical_partitioning(
                nn.initializers.zeros, (None, "mlp")
            ),
            (self.rank, self.features),
            self.param_dtype,
        )
        y = jnp.dot(
            x.astype(self.dtype), kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        scale = self.alpha / self.rank
        y = y + scale * jnp.dot(
            jnp.dot(x.astype(self.dtype), lora_a.astype(self.dtype)),
            lora_b.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            y = y + bias
        return y.astype(self.dtype)


def merge_lora(
    params: dict,
    *,
    alpha: float | None = None,
    rank: int | None = None,
    scale: float | None = None,
) -> dict:
    """Fold lora_a/lora_b (x alpha/rank) into kernels for serving export.

    The scale is module config, not a stored parameter, so the caller must
    supply it — either `scale` directly or `alpha` + `rank` (scale =
    alpha/rank). Raises if neither is given (a silently-wrong default would
    corrupt merged serving kernels for any non-default config).
    """
    if scale is None:
        if alpha is None or rank is None:
            raise ValueError(
                "merge_lora needs the adapter scale: pass scale= or both "
                "alpha= and rank= (scale = alpha / rank)."
            )
        scale = float(alpha) / float(rank)

    def rec(node):
        if not isinstance(node, dict):
            return node
        if "lora_a" in node and "lora_b" in node and "kernel" in node:
            out = dict(node)
            out["kernel"] = node["kernel"] + scale * (
                node["lora_a"] @ node["lora_b"]
            )
            out.pop("lora_a"), out.pop("lora_b")
            return out
        return {k: rec(v) for k, v in node.items()}

    return rec(params)
