"""ViCLIP and the InternVideo2-CLIP flavor — dual-encoder contrastive models.

ViCLIP (Data/InternVid/viclip/viclip.py:17-255): CLIP-style video ViT
(LayerNorm blocks, no QK-norm — here the InternVideo2 encoder class with
norm_type="layernorm") + GPT-2-style text tower; learnable logit scale;
supports masked-token training (keep_indices) like the reference's
masked ViT. `viclip_config("l"/"b")` is the checkpoint-faithful released
recipe (ln_pre, quick-gelu, cls+proj pooling, temp=1/100) — load real
checkpoints via `convert.convert_viclip` + `data/clip_bpe.py`
tokenization (torch parity: tests/test_viclip_parity.py).

InternVideo2CLIP (multi_modality/models/internvideo2_clip.py:16-257):
the stage-2 vision tower with a CLIP projector + a LLaMA causal text
encoder with text_projection; VTC only.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.models.text_encoders import (
    CLIPTextConfig,
    CLIPTextEncoder,
    LLaMATextConfig,
    LLaMATextEncoder,
)


@struct.dataclass
class DualEncoderOutput:
    video_proj: jax.Array  # (B, E) un-normalized projections
    text_proj: jax.Array
    logit_scale: jax.Array  # ()


def _l2(x):
    return x / jnp.linalg.norm(
        x.astype(jnp.float32), axis=-1, keepdims=True
    ).astype(x.dtype)


def clip_contrastive_loss(video_proj, text_proj, logit_scale):
    """Symmetric InfoNCE on the (global) batch."""
    v, t = _l2(video_proj), _l2(text_proj)
    logits = (v @ t.T) * logit_scale
    n = logits.shape[0]
    labels = jnp.arange(n)
    l_v = -jnp.mean(jax.nn.log_softmax(logits, 1)[labels, labels])
    l_t = -jnp.mean(jax.nn.log_softmax(logits.T, 1)[labels, labels])
    return (l_v + l_t) / 2


def viclip_vision_config(size: str = "l", **overrides) -> InternVideo2Config:
    """Checkpoint-faithful ViCLIP vision towers (viclip_vision.py:246-294):
    CLIP ViTs with ln_pre, quick-gelu MLPs, biased qkv, no LayerScale,
    torch-default layernorm eps, and cls+proj pooling."""
    dims = {
        "l": dict(embed_dim=1024, depth=24, num_heads=16, patch_size=14,
                  clip_embed_dim=768),
        "b": dict(embed_dim=768, depth=12, num_heads=12, patch_size=16,
                  clip_embed_dim=512),
    }[size.lower()]
    return InternVideo2Config(
        mlp_ratio=4.0, qkv_bias=True, qk_normalization=False,
        init_values=0.0, norm_type="layernorm", norm_eps=1e-5,
        mlp_act="quick_gelu", ln_pre=True, pool_type="cls_proj",
        **{**dims, **overrides},
    )


def viclip_text_config(size: str = "l", **overrides) -> CLIPTextConfig:
    """viclip_text.py:227 (l14) / :186 (b16) defaults."""
    dims = {
        "l": dict(width=768, num_heads=12, embed_dim=768),
        "b": dict(width=512, num_heads=8, embed_dim=512),
    }[size.lower()]
    return CLIPTextConfig(
        **{**dict(num_layers=12, act="quick_gelu"), **dims, **overrides}
    )


@dataclasses.dataclass(frozen=True)
class ViCLIPConfig:
    vision: InternVideo2Config = dataclasses.field(
        default_factory=lambda: InternVideo2Config(
            embed_dim=1024, depth=24, num_heads=16, mlp_ratio=4.0,
            patch_size=14, qk_normalization=False, init_values=0.0,
            norm_type="layernorm", clip_embed_dim=768,
        )
    )
    text: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)
    embed_dim: int = 768
    logit_scale_init: float = 2.6593  # ln(1/0.07)
    # the reference tower projects to embed_dim internally (cls_proj pool);
    # False drops the extra vision_proj so converted checkpoints are exact
    use_vision_proj: bool = True


def viclip_config(size: str = "l", **overrides) -> ViCLIPConfig:
    """The released ViCLIP-L/B recipe (viclip.py:17-70): in-tower vision
    projection, temp=1/100 -> logit_scale ln(100)."""
    base = dict(
        vision=viclip_vision_config(size),
        text=viclip_text_config(size),
        embed_dim={"l": 768, "b": 512}[size.lower()],
        logit_scale_init=math.log(100.0),
        use_vision_proj=False,
    )
    return ViCLIPConfig(**{**base, **overrides})


class ViCLIP(nn.Module):
    config: ViCLIPConfig

    def setup(self):
        cfg = self.config
        self.vision_encoder = InternVideo2(cfg.vision)
        self.text_encoder = CLIPTextEncoder(
            dataclasses.replace(cfg.text, embed_dim=cfg.embed_dim)
        )
        if cfg.use_vision_proj:
            self.vision_proj = nn.Dense(
                cfg.embed_dim, use_bias=False,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), ("embed", "mlp")
                ),
            )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(cfg.logit_scale_init), (),
        )

    def encode_video(self, video, keep_indices=None, deterministic=True):
        out = self.vision_encoder(
            video, keep_indices=keep_indices, deterministic=deterministic
        )
        if self.config.use_vision_proj:
            return self.vision_proj(out.pooled)
        return out.pooled

    def encode_text(self, input_ids, deterministic=True):
        _, proj = self.text_encoder(input_ids, deterministic=deterministic)
        return proj

    def __call__(
        self, video, input_ids, keep_indices=None, deterministic=True
    ) -> DualEncoderOutput:
        return DualEncoderOutput(
            video_proj=self.encode_video(video, keep_indices, deterministic),
            text_proj=self.encode_text(input_ids, deterministic),
            logit_scale=jnp.exp(
                jnp.clip(self.logit_scale, max=jnp.log(100.0))
            ),
        )


@dataclasses.dataclass(frozen=True)
class InternVideo2CLIPConfig:
    vision: InternVideo2Config = dataclasses.field(
        default_factory=InternVideo2Config
    )
    text: LLaMATextConfig = dataclasses.field(default_factory=LLaMATextConfig)
    embed_dim: int = 768
    logit_scale_init: float = 2.6593


class InternVideo2CLIP(nn.Module):
    config: InternVideo2CLIPConfig

    def setup(self):
        cfg = self.config
        self.vision_encoder = InternVideo2(cfg.vision)
        self.text_encoder = LLaMATextEncoder(
            dataclasses.replace(cfg.text, embed_dim=cfg.embed_dim)
        )
        self.vision_proj = nn.Dense(
            cfg.embed_dim, use_bias=False,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("embed", "mlp")
            ),
        )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(cfg.logit_scale_init), (),
        )

    def encode_video(self, video, deterministic=True):
        out = self.vision_encoder(video, deterministic=deterministic)
        return self.vision_proj(out.pooled)

    def encode_text(self, input_ids, attention_mask=None, deterministic=True):
        _, proj = self.text_encoder(
            input_ids, attention_mask, deterministic=deterministic
        )
        return proj

    def __call__(
        self, video, input_ids, attention_mask=None, deterministic=True
    ) -> DualEncoderOutput:
        return DualEncoderOutput(
            video_proj=self.encode_video(video, deterministic),
            text_proj=self.encode_text(
                input_ids, attention_mask, deterministic
            ),
            logit_scale=jnp.exp(
                jnp.clip(self.logit_scale, max=jnp.log(100.0))
            ),
        )
