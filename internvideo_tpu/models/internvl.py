"""InternVL / Intern-S1 compose: InternViT encoder → pixel-shuffle
projector → (MoE) LLM.

Counterpart of xtuner's compose models (InternVideo3_sft/xtuner/v1/model/
compose/intern_s1/ + compose/internvl/): the vision side is the InternViT
image encoder — architecturally the InternVideo2 encoder at T=1 (same
QK-norm/LayerScale block stack; InternS1VisionConfig hidden 3200/45L for
S1, 1024/24L for S1-mini) — followed by the InternVL projector: drop cls,
pixel-shuffle downsample (ratio 0.5 → 2×2 spatial→channel stack), LayerNorm
+ 2-layer GELU MLP into the text space (modeling_projector.py). Image
placeholder tokens in the prompt are replaced by the projected patches
(same scatter as the VideoMLLM). The text model is MLATransformer — dense
(Intern-S1-mini / InternVL) or MoE (Intern-S1, LLMConfig.moe) — i.e. the
M²LA-converted flavor this framework is built around; `models/mla_convert`
bridges dense-GQA checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.models.llm import LLMConfig, LLMOutput, MLATransformer
from internvideo_tpu.models.mllm import scatter_visual
from internvideo_tpu.nn.norms import LayerNorm


@dataclasses.dataclass(frozen=True)
class InternVLConfig:
    vision: InternVideo2Config = dataclasses.field(
        default_factory=lambda: InternVideo2Config(
            num_frames=1, tubelet_size=1, num_classes=0
        )
    )
    text: LLMConfig = dataclasses.field(default_factory=LLMConfig)
    downsample_ratio: float = 0.5  # pixel-shuffle factor (0.5 → 2×2 stack)
    image_token_id: int = 152957


def pixel_shuffle(x: jax.Array, ratio: float) -> jax.Array:
    """(B, H, W, C) -> (B, H·r, W·r, C/r²) spatial→channel restack
    (modeling_intern_s1 pixel_shuffle; r = downsample_ratio)."""
    b, h, w, c = x.shape
    s = int(round(1.0 / ratio))
    x = x.reshape(b, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // s, w // s, c * s * s)


class InternVLChat(nn.Module):
    config: InternVLConfig

    def setup(self):
        cfg = self.config
        self.vision_tower = InternVideo2(cfg.vision, name="vision_tower")
        dtype = jnp.dtype(cfg.text.dtype)
        self.mlp1_norm = LayerNorm(dtype=dtype, name="mlp1_norm")
        self.mlp1_fc1 = nn.Dense(
            cfg.text.hidden_size, dtype=dtype,
            param_dtype=jnp.dtype(cfg.text.param_dtype),
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", "mlp")
            ),
            name="mlp1_fc1",
        )
        self.mlp1_fc2 = nn.Dense(
            cfg.text.hidden_size, dtype=dtype,
            param_dtype=jnp.dtype(cfg.text.param_dtype),
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("mlp", "embed")
            ),
            name="mlp1_fc2",
        )
        self.language_model = MLATransformer(cfg.text, name="language_model")

    def encode_images(self, images: jax.Array) -> jax.Array:
        """(B, H, W, 3) -> (B, n_tokens, text_hidden): InternViT patches →
        pixel shuffle → LN + MLP projector."""
        cfg = self.config
        out = self.vision_tower(images[:, None])  # T=1 video
        patches = out.tokens[:, 1:]  # drop cls
        b, n, c = patches.shape
        g = int(round(n ** 0.5))
        x = pixel_shuffle(
            patches.reshape(b, g, g, c), cfg.downsample_ratio
        )
        x = x.reshape(b, -1, x.shape[-1])
        x = self.mlp1_norm(x)
        x = self.mlp1_fc2(nn.gelu(self.mlp1_fc1(x), approximate=False))
        return x

    def __call__(
        self,
        input_ids: jax.Array,  # (B, L) with image placeholder tokens
        images: Optional[jax.Array] = None,  # (B, H, W, 3)
        *,
        position_ids: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        with_logits: bool = True,
    ) -> LLMOutput:
        cfg = self.config
        embeds = self.language_model.embed(input_ids)
        if images is not None:
            vis = self.encode_images(images)  # (B, n_tok, D)
            mask = input_ids == cfg.image_token_id
            embeds = scatter_visual(embeds, vis, mask)
        return self.language_model(
            input_embeds=embeds,
            position_ids=position_ids,
            segment_ids=segment_ids,
            with_logits=with_logits,
        )
