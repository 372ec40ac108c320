"""Probing heads over frozen encoders: linear / attentive / concat (CAT).

Counterparts of run_linear_probing.py, internvideo2_ap.py (attentive-probing
variant: a fresh attention-pooling head + classifier over frozen features)
and internvideo2_cat.py (concat of K middle-layer features). The backbone is
frozen either by stop_gradient here or by optimizer freeze masks
(train/optim.py trainable_patterns) — both are provided.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.nn.norms import LayerNorm
from internvideo_tpu.nn.transformer import AttentionPoolingBlock


@dataclasses.dataclass(frozen=True)
class ProbeConfig:
    encoder: InternVideo2Config = dataclasses.field(
        default_factory=InternVideo2Config
    )
    num_classes: int = 400
    probe_type: str = "attentive"  # linear | attentive | cat
    cat_layers: tuple[int, ...] = ()  # for probe_type="cat"
    pool_heads: int = 16
    stop_gradient_backbone: bool = True


class ProbedClassifier(nn.Module):
    config: ProbeConfig

    @nn.compact
    def __call__(self, video: jax.Array, deterministic: bool = True):
        cfg = self.config
        enc_cfg = cfg.encoder
        dtype = jnp.dtype(enc_cfg.dtype)
        want = sorted(set(cfg.cat_layers)) if cfg.probe_type == "cat" else None
        out = InternVideo2(enc_cfg, name="backbone")(
            video, deterministic=deterministic,
            return_hidden_layers=want,
        )

        if cfg.probe_type == "linear":
            feats = out.pooled
        elif cfg.probe_type == "attentive":
            tokens = out.tokens
            if cfg.stop_gradient_backbone:
                tokens = jax.lax.stop_gradient(tokens)
            feats = AttentionPoolingBlock(
                num_heads=cfg.pool_heads, out_dim=enc_cfg.embed_dim,
                dtype=dtype, attn_impl="xla", name="probe_pool",
            )(tokens)
        elif cfg.probe_type == "cat":
            hidden = dict(zip(want, out.hidden_states))
            pooled = [hidden[i].mean(axis=1) for i in cfg.cat_layers]
            feats = jnp.concatenate(pooled, axis=-1)
        else:
            raise ValueError(cfg.probe_type)

        if cfg.stop_gradient_backbone and cfg.probe_type != "attentive":
            feats = jax.lax.stop_gradient(feats)
        feats = LayerNorm(dtype=dtype, name="probe_norm")(feats)
        logits = nn.Dense(
            cfg.num_classes, dtype=dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.01), ("embed", "vocab")
            ),
            name="probe_head",
        )(feats)
        return logits
