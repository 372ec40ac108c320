"""InternVideo2-Chat: vision encoder → QFormer bridge → LLM.

BASELINE config #4 ("1B ViT → QFormer → 7B LLM video QA inference with KV
cache"). The in-repo reference only hosts the demo wrapper (the chat model
lives on HF model cards); the architecture is the standard BLIP-2/VideoChat
bridge: a set of learnable query tokens runs through BERT-style layers that
self-attend among queries and cross-attend to frozen vision tokens; the
query outputs are projected into the LLM's embedding space and prefixed to
the prompt.

The LLM is this framework's cached decoder (models/llm.MLATransformer) — the
latent-cache generation path doubles as the chat KV cache.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.models.bert import BertConfig, BertModel
from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.models.llm import LLMConfig, MLATransformer


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    num_queries: int = 32
    bert: BertConfig = dataclasses.field(
        default_factory=lambda: BertConfig(
            hidden_size=768, num_layers=12, num_heads=12,
            intermediate_size=3072, fusion_layer=0,  # cross-attn everywhere
        )
    )


class QFormer(nn.Module):
    cfg: QFormerConfig

    @nn.compact
    def __call__(self, vision_tokens: jax.Array, deterministic: bool = True):
        """vision_tokens (B, N, Dv) -> (B, num_queries, hidden)."""
        b = vision_tokens.shape[0]
        h = self.cfg.bert.hidden_size
        queries = self.param(
            "query_tokens",
            nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), (None, None, "embed")
            ),
            (1, self.cfg.num_queries, h),
            jnp.float32,
        )
        vis = nn.Dense(
            h,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", "mlp")
            ),
            name="vision_in",
        )(vision_tokens)
        out = BertModel(self.cfg.bert, name="bert")(
            encoder_embeds=jnp.broadcast_to(
                queries.astype(vis.dtype), (b,) + queries.shape[1:]
            ),
            vision_embeds=vis,
            mode="fusion",
            deterministic=deterministic,
        )
        return out.last_hidden_state


@dataclasses.dataclass(frozen=True)
class VideoChatConfig:
    vision: InternVideo2Config = dataclasses.field(
        default_factory=InternVideo2Config
    )
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    llm: LLMConfig = dataclasses.field(default_factory=LLMConfig)


class VideoChat(nn.Module):
    config: VideoChatConfig

    def setup(self):
        cfg = self.config
        self.vision_encoder = InternVideo2(cfg.vision)
        self.qformer = QFormer(cfg.qformer)
        self.llm_proj = nn.Dense(
            cfg.llm.hidden_size,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", "mlp")
            ),
        )
        self.language_model = MLATransformer(cfg.llm)

    def encode_video_queries(self, video, deterministic=True):
        out = self.vision_encoder(video, deterministic=deterministic)
        q = self.qformer(out.tokens, deterministic=deterministic)
        return self.llm_proj(q)  # (B, num_queries, D_llm)

    def __call__(
        self, input_ids, video, deterministic: bool = True,
        with_logits: bool = True,
    ):
        """Training/teacher-forcing forward: [video queries | prompt]."""
        vis = self.encode_video_queries(video, deterministic)
        txt = self.language_model.embed_tokens(input_ids)
        embeds = jnp.concatenate([vis.astype(txt.dtype), txt], axis=1)
        return self.language_model(
            input_embeds=embeds, with_logits=with_logits
        )

    # --- generation -------------------------------------------------------

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        return self.language_model.init_cache(batch, max_len, dtype)

    def prefill(self, input_ids, video, caches):
        vis = self.encode_video_queries(video)
        txt = self.language_model.embed_tokens(input_ids)
        embeds = jnp.concatenate([vis.astype(txt.dtype), txt], axis=1)
        return self.language_model.prefill(embeds, caches)

    def decode_step(self, token_ids, caches, cache_len, **kw):
        return self.language_model.decode_step(
            token_ids, caches, cache_len, **kw
        )
