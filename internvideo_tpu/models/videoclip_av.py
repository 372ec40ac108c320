"""Audio-visual VideoCLIP: stage-2 with a BEATs-style audio tower.

Parity target: InternVideo2_Stage2_audiovisual
(multi_modality/models/internvideo2_stage2_audiovisual.py:18-844) —
per-media encoders with shared text/fusion tower:

  media_type "video":        vision tokens cross-attended by the BERT
  media_type "audio":        audio tokens
  media_type "audio_video":  audio+video tokens concatenated (av fusion)

Each modality gets its own projection into the contrastive space; the
VTC/VTM/MLM criterion wiring reuses train/engines/clip.py with the media
branch chosen per batch (the reference's MetaLoader emits one media type
per step, so the jitted step specializes per media type — one compiled
program each).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.models.audio import AudioEncoder, AudioEncoderConfig
from internvideo_tpu.models.bert import BertConfig, BertModel
from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.models.videoclip import VideoCLIPOutput


@dataclasses.dataclass(frozen=True)
class VideoCLIPAVConfig:
    vision: InternVideo2Config = dataclasses.field(
        default_factory=InternVideo2Config
    )
    audio: AudioEncoderConfig = dataclasses.field(
        default_factory=AudioEncoderConfig
    )
    # "simple" = models/audio.AudioEncoder (from-scratch tower);
    # "beats" = models/beats.BEATsEncoder, checkpoint-faithful to the
    # reference's frozen BEATs (load via convert_beats) — the stage-2 AV
    # recipe initializes the audio side from a released BEATs checkpoint
    # (internvideo2_stage2_audiovisual.py:831-837).
    audio_tower: str = "simple"
    beats: object = None  # BEATsConfig when audio_tower == "beats"
    text: BertConfig = dataclasses.field(default_factory=BertConfig)
    embed_dim: int = 512
    temp_init: float = 0.07
    temp_min: float = 1 / 100.0


class VideoCLIPAV(nn.Module):
    config: VideoCLIPAVConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.vision.dtype)

        def proj(name):
            return nn.Dense(
                cfg.embed_dim, dtype=dtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), ("embed", "mlp")
                ),
                name=name,
            )

        self.vision_encoder = InternVideo2(cfg.vision)
        if cfg.audio_tower == "beats":
            from internvideo_tpu.models.beats import BEATsConfig, BEATsEncoder

            self.audio_encoder = BEATsEncoder(cfg.beats or BEATsConfig())
        else:
            self.audio_encoder = AudioEncoder(cfg.audio)
        self.text_encoder = BertModel(cfg.text)
        self.vision_proj = proj("vision_proj")
        self.audio_proj = proj("audio_proj")
        self.av_proj = proj("av_proj")
        self.text_proj = proj("text_proj")
        self.itm_head = nn.Dense(2, dtype=dtype, name="itm_head")
        # audio tokens enter the fusion tower at text width
        self.audio_to_fusion = nn.Dense(
            cfg.vision.embed_dim, dtype=dtype, name="audio_to_fusion"
        )
        self.temp = self.param(
            "temp", nn.initializers.constant(cfg.temp_init), ()
        )

    def clamped_temp(self):
        return jnp.maximum(self.temp, self.config.temp_min)

    def encode_media(
        self,
        media_type: str,
        video: Optional[jax.Array] = None,
        audio: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        """-> (fusion_tokens (B,L,Dv), pooled_proj (B,E))."""
        if media_type == "video":
            out = self.vision_encoder(video, deterministic=deterministic)
            return out.tokens, self.vision_proj(out.pooled)
        if media_type == "audio":
            tokens, pooled = self._encode_audio(audio, deterministic)
            return self.audio_to_fusion(tokens), self.audio_proj(pooled)
        if media_type == "audio_video":
            v = self.vision_encoder(video, deterministic=deterministic)
            a_tokens, a_pooled = self._encode_audio(audio, deterministic)
            tokens = jnp.concatenate(
                [self.audio_to_fusion(a_tokens), v.tokens], axis=1
            )
            pooled = self.av_proj(
                jnp.concatenate([a_pooled, v.pooled], axis=-1)
            )
            return tokens, pooled
        raise ValueError(media_type)

    def _encode_audio(self, audio, deterministic):
        if self.config.audio_tower == "beats":
            return self.audio_encoder(audio)  # no dropout paths
        return self.audio_encoder(audio, deterministic=deterministic)

    def fusion(
        self,
        text_embeds,
        text_mask,
        media_tokens,  # fusion-width tokens from encode_media
        deterministic=True,
        with_mlm_logits=False,
    ):
        return self.text_encoder(
            encoder_embeds=text_embeds,
            attention_mask=text_mask,
            vision_embeds=media_tokens,
            mode="fusion",
            deterministic=deterministic,
            with_mlm_logits=with_mlm_logits,
        )

    def text_multimodal(
        self, input_ids, attention_mask, media_tokens,
        deterministic=True, with_mlm_logits=True,
    ):
        return self.text_encoder(
            input_ids, attention_mask,
            vision_embeds=media_tokens,
            mode="multimodal",
            deterministic=deterministic,
            with_mlm_logits=with_mlm_logits,
        )

    def itm_logits(self, fusion_cls):
        return self.itm_head(fusion_cls)

    def encode_text(self, input_ids, attention_mask, deterministic=True):
        out = self.text_encoder(
            input_ids, attention_mask, mode="text",
            deterministic=deterministic,
        )
        return out.last_hidden_state, self.text_proj(out.pooled)

    def __call__(
        self,
        input_ids,
        attention_mask,
        video=None,
        audio=None,
        media_type: str = "video",
        deterministic: bool = True,
        init_all_branches: bool = False,
    ) -> VideoCLIPOutput:
        if init_all_branches:
            # touch every media branch so one init creates all params
            assert video is not None and audio is not None
            self.encode_media("video", video, None, deterministic)
            self.encode_media("audio", None, audio, deterministic)
        media_tokens, media_proj = self.encode_media(
            media_type, video, audio, deterministic
        )
        text_embeds, text_proj = self.encode_text(
            input_ids, attention_mask, deterministic
        )
        if init_all_branches:
            # touch the fusion / MLM / ITM branches too so model.init
            # creates every parameter in one pass
            mm = self.text_multimodal(
                input_ids, attention_mask, media_tokens,
                deterministic=deterministic, with_mlm_logits=True,
            )
            self.itm_logits(mm.pooled)
        return VideoCLIPOutput(
            vision_embeds=media_tokens,
            pooled_vision=media_proj,  # already projected for AV variants
            text_embeds=text_embeds,
            pooled_text=text_proj,
            vision_proj=media_proj,
            text_proj=text_proj,
            temp=self.clamped_temp(),
        )
