"""VideoCLIP stage-2 model: vision tower + BERT text/fusion tower.

Parity with InternVideo2_Stage2_visual
(multi_modality/models/internvideo2_stage2_visual.py:17-361):

  * vision tower: InternVideo2 encoder (optionally masked for the UTA branch,
    mask shared with the teacher), returns token embeds + pooled
  * text tower: fusion BERT (models/bert.py)
  * vision_proj / text_proj into a shared `embed_dim` space + learnable
    temperature (clamped at 1/100 like clip_contrastive_temperature)
  * itm_head for video-text matching

The loss wiring (VTC/VTM/MLM/UTA with global-batch contrastive) lives in
train/engines/clip.py — under pjit the "differentiable all-gather" of the
reference (models/utils.py:193 allgather_wgrad) is simply computing the loss
on globally-sharded arrays and letting GSPMD insert the collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from internvideo_tpu.models.bert import BertConfig, BertModel
from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.models.pretrain import PretrainConfig, PretrainInternVideo2


@dataclasses.dataclass(frozen=True)
class VideoCLIPConfig:
    vision: InternVideo2Config = dataclasses.field(
        default_factory=InternVideo2Config
    )
    text: BertConfig = dataclasses.field(default_factory=BertConfig)
    embed_dim: int = 512
    temp_init: float = 0.07
    temp_min: float = 1 / 100.0
    # Stage-2 pretraining: when set, the vision tower is the masked pretrain
    # student (CLIP-align decoders included) so the train step can distill
    # from the frozen teacher inside the contrastive step — the reference's
    # `pretrain_internvideo2_1b_patch14_224` tower
    # (internvideo2_stage2_visual.py:302-308). `pretrain.encoder` must equal
    # `vision`.
    pretrain: Optional[PretrainConfig] = None


@struct.dataclass
class VideoCLIPOutput:
    vision_embeds: jax.Array  # (B, 1+N, Dv) token embeddings
    pooled_vision: jax.Array  # (B, clip_embed_dim)
    text_embeds: jax.Array  # (B, L, Dt)
    pooled_text: jax.Array  # (B, Dt)
    vision_proj: jax.Array  # (B, embed_dim)
    text_proj: jax.Array  # (B, embed_dim)
    temp: jax.Array  # ()
    # UTA branch (masked stage-2 forward only): student CLIP-align outputs
    clip_middle: Optional[jax.Array] = None  # (K, B, 1+n_vis, C_t), l2-normed
    clip_final: Optional[jax.Array] = None  # (B, C_proj)


class VideoCLIP(nn.Module):
    config: VideoCLIPConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.vision.dtype)
        if cfg.pretrain is not None:
            self.vision_encoder = PretrainInternVideo2(cfg.pretrain)
        else:
            self.vision_encoder = InternVideo2(cfg.vision)
        self.text_encoder = BertModel(cfg.text)
        self.vision_proj = nn.Dense(
            cfg.embed_dim, dtype=dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", "mlp")
            ),
        )
        self.text_proj = nn.Dense(
            cfg.embed_dim, dtype=dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", "mlp")
            ),
        )
        self.itm_head = nn.Dense(
            2, dtype=dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", None)
            ),
        )
        self.temp = self.param(
            "temp", nn.initializers.constant(cfg.temp_init), ()
        )

    def clamped_temp(self):
        # reference clamps temp to >= 1/100 every step
        return jnp.maximum(self.temp, self.config.temp_min)

    def encode_vision(
        self, video, keep_indices=None, deterministic=True, return_align=None
    ):
        """Returns (tokens, pooled, clip_middle, clip_final); the align pair
        is None for the plain tower or unmasked forwards."""
        if self.config.pretrain is not None:
            out = self.vision_encoder(
                video, keep_indices, deterministic=deterministic,
                return_align=return_align,
            )
            return out.tokens, out.pooled, out.clip_middle, out.clip_final
        out = self.vision_encoder(
            video, keep_indices=keep_indices, deterministic=deterministic
        )
        return out.tokens, out.pooled, None, None

    def encode_text(self, input_ids, attention_mask, deterministic=True):
        out = self.text_encoder(
            input_ids, attention_mask, mode="text",
            deterministic=deterministic,
        )
        return out.last_hidden_state, out.pooled

    def fusion(
        self,
        text_embeds,
        text_mask,
        vision_embeds,
        vision_mask=None,
        deterministic=True,
        with_mlm_logits=False,
    ):
        return self.text_encoder(
            encoder_embeds=text_embeds,
            attention_mask=text_mask,
            vision_embeds=vision_embeds,
            vision_mask=vision_mask,
            mode="fusion",
            deterministic=deterministic,
            with_mlm_logits=with_mlm_logits,
        )

    def text_multimodal(
        self, input_ids, attention_mask, vision_embeds,
        deterministic=True, with_mlm_logits=True,
    ):
        """Full text+fusion pass with cross-attn (the reference's MLM path
        = mode 'text' then 'fusion'; one 'multimodal' call is equivalent)."""
        return self.text_encoder(
            input_ids, attention_mask,
            vision_embeds=vision_embeds,
            mode="multimodal",
            deterministic=deterministic,
            with_mlm_logits=with_mlm_logits,
        )

    def itm_logits(self, fusion_cls):
        return self.itm_head(fusion_cls)

    def __call__(
        self,
        video,
        input_ids,
        attention_mask,
        keep_indices=None,
        deterministic=True,
        init_all_branches=False,
    ) -> VideoCLIPOutput:
        vision_embeds, pooled_vision, clip_middle, clip_final = (
            self.encode_vision(
                video, keep_indices, deterministic,
                # init must trace the UTA decoders even unmasked so every
                # parameter exists after one init pass
                return_align=(True if init_all_branches
                              and self.config.pretrain is not None else None),
            )
        )
        text_embeds, pooled_text = self.encode_text(
            input_ids, attention_mask, deterministic
        )
        if init_all_branches:
            # touch the fusion / MLM / ITM branches so model.init creates
            # every parameter in one pass
            mm = self.text_multimodal(
                input_ids, attention_mask, vision_embeds,
                deterministic=deterministic, with_mlm_logits=True,
            )
            self.itm_logits(mm.pooled)
        return VideoCLIPOutput(
            vision_embeds=vision_embeds,
            pooled_vision=pooled_vision,
            text_embeds=text_embeds,
            pooled_text=pooled_text,
            vision_proj=self.vision_proj(pooled_vision),
            text_proj=self.text_proj(pooled_text),
            temp=self.clamped_temp(),
            clip_middle=clip_middle,
            clip_final=clip_final,
        )
