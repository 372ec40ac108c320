"""Causal text encoders for contrastive video-text models.

  * CLIPTextEncoder — GPT-2-style tower used by ViCLIP
    (Data/InternVid/viclip/viclip_text.py): token + learned positional
    embeddings, pre-LN causal blocks with quick-gelu MLP, final LN, features
    taken at the EOT token (argmax of ids), linear text projection.
    With act="gelu" this is also the MobileCLIP-B text tower
    (multi_modality/models/backbones/internvideo2/mobileclip/
    text_encoder.py:18-231, the CLIP-small family's text side —
    internvideo2_clip_small.py:196); `mobileclip_text_config` builds the
    matching config from the reference's json text_cfg.
  * LLaMATextEncoder — the CLIP-variant's LLaMA-7B text tower
    (multi_modality/models/backbones/internvideo2_clip_text.py:14-67):
    RMSNorm + RoPE + (G)QA + SwiGLU causal decoder; the last-token hidden
    state goes through `text_projection`.

Both return (sequence_features, projected_pooled).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.nn.norms import LayerNorm, RMSNorm
from internvideo_tpu.nn.rope import apply_rope, rope_cos_sin
from internvideo_tpu.ops import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 512
    num_layers: int = 12
    num_heads: int = 8
    context_length: int = 77
    embed_dim: int = 512  # projection output
    mlp_ratio: float = 4.0
    act: str = "quick_gelu"  # "quick_gelu" (CLIP/ViCLIP) | "gelu" (MobileCLIP)
    causal: bool = True
    dtype: str = "float32"
    param_dtype: str = "float32"
    attn_impl: str = "auto"


def mobileclip_text_config(
    text_cfg: dict, projection_dim: int = 512, **overrides
) -> "CLIPTextConfig":
    """Build a CLIPTextConfig from a mobileclip json `text_cfg` block
    (configs/mobileclip_b.json). Only the shipped "base" variant is
    meaningful — the reference raises NotImplementedError for "mct"."""
    if text_cfg.get("model_name", "base") != "base":
        raise NotImplementedError(
            "only the 'base' MobileCLIP text variant is implemented "
            "(the reference's 'mct' path is itself NotImplementedError)"
        )
    return CLIPTextConfig(
        vocab_size=text_cfg["vocab_size"],
        width=text_cfg["dim"],
        num_layers=text_cfg["n_transformer_layers"],
        num_heads=text_cfg["n_heads_per_layer"],
        context_length=text_cfg["context_length"],
        embed_dim=projection_dim,
        mlp_ratio=text_cfg.get("ffn_multiplier_per_layer", 4.0),
        act="gelu",
        causal=text_cfg.get("causal_masking", True),
        **overrides,
    )


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, deterministic: bool = True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        b, l = input_ids.shape

        x = nn.Embed(
            cfg.vocab_size, cfg.width, dtype=dtype, param_dtype=pdtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vocab", "embed")
            ),
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "positional_embedding",
            nn.with_logical_partitioning(
                nn.initializers.normal(0.01), (None, "embed")
            ),
            (cfg.context_length, cfg.width),
            pdtype,
        )
        x = x + pos[:l].astype(dtype)

        for i in range(cfg.num_layers):
            h = LayerNorm(eps=1e-5, dtype=dtype, name=f"ln_1_{i}")(x)
            qkv = nn.DenseGeneral(
                (3, cfg.width), dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), ("embed", "qkv3", "heads")
                ),
                name=f"attn_qkv_{i}",
            )(h)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            hd = cfg.width // cfg.num_heads
            q = q.reshape(b, l, cfg.num_heads, hd)
            k = k.reshape(b, l, cfg.num_heads, hd)
            v = v.reshape(b, l, cfg.num_heads, hd)
            attn = dot_product_attention(
                q, k, v, causal=cfg.causal, impl=cfg.attn_impl
            ).reshape(b, l, cfg.width)
            attn = nn.Dense(
                cfg.width, dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), ("heads", "embed")
                ),
                name=f"attn_proj_{i}",
            )(attn)
            x = x + attn
            h = LayerNorm(eps=1e-5, dtype=dtype, name=f"ln_2_{i}")(x)
            # MobileCLIP rounds the FFN width up to a multiple of 16
            ffn = int(-(-cfg.width * cfg.mlp_ratio // 16) * 16)
            h = nn.Dense(
                ffn, dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), ("embed", "mlp")
                ),
                name=f"mlp_fc_{i}",
            )(h)
            if cfg.act == "quick_gelu":
                h = h * jax.nn.sigmoid(1.702 * h)  # quick-gelu (CLIP)
            else:
                h = nn.gelu(h, approximate=False)
            h = nn.Dense(
                cfg.width, dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), ("mlp", "embed")
                ),
                name=f"mlp_proj_{i}",
            )(h)
            x = x + h

        x = LayerNorm(eps=1e-5, dtype=dtype, name="ln_final")(x)
        eot = jnp.argmax(input_ids, axis=-1)  # EOT has the largest id (CLIP)
        pooled = x[jnp.arange(b), eot]
        proj = self.param(
            "text_projection",
            nn.with_logical_partitioning(
                nn.initializers.normal(cfg.width ** -0.5), ("embed", "mlp")
            ),
            (cfg.width, cfg.embed_dim),
            pdtype,
        )
        return x, pooled @ proj.astype(dtype)


@dataclasses.dataclass(frozen=True)
class LLaMATextConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 11008
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    embed_dim: int = 768  # projection output
    dtype: str = "float32"
    param_dtype: str = "float32"
    attn_impl: str = "auto"


class LLaMATextEncoder(nn.Module):
    cfg: LLaMATextConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,  # (B, L) 1 = real
        deterministic: bool = True,
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        b, l = input_ids.shape
        hd = cfg.hidden_size // cfg.num_heads

        def dense(feats, name, logical):
            return nn.Dense(
                feats, use_bias=False, dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), logical
                ),
                name=name,
            )

        x = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=dtype, param_dtype=pdtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vocab", "embed")
            ),
            name="embed_tokens",
        )(input_ids)
        cos, sin = rope_cos_sin(jnp.arange(l)[None], hd, cfg.rope_theta)

        seg = None
        if attention_mask is not None:
            seg = jnp.where(attention_mask > 0, 0, -1).astype(jnp.int32)

        for i in range(cfg.num_layers):
            h = RMSNorm(eps=cfg.rms_eps, dtype=dtype, name=f"input_ln_{i}")(x)
            q = dense(cfg.num_heads * hd, f"q_proj_{i}", ("embed", "heads"))(h)
            k = dense(cfg.num_kv_heads * hd, f"k_proj_{i}", ("embed", "kv_heads"))(h)
            v = dense(cfg.num_kv_heads * hd, f"v_proj_{i}", ("embed", "kv_heads"))(h)
            q = apply_rope(q.reshape(b, l, cfg.num_heads, hd), cos, sin)
            k = apply_rope(k.reshape(b, l, cfg.num_kv_heads, hd), cos, sin)
            v = v.reshape(b, l, cfg.num_kv_heads, hd)
            attn = dot_product_attention(
                q, k, v, causal=True,
                q_segment_ids=seg, kv_segment_ids=seg,
                impl=cfg.attn_impl,
            ).reshape(b, l, -1)
            x = x + dense(cfg.hidden_size, f"o_proj_{i}", ("heads", "embed"))(attn)
            h = RMSNorm(eps=cfg.rms_eps, dtype=dtype, name=f"post_ln_{i}")(x)
            gate = dense(cfg.intermediate_size, f"gate_proj_{i}", ("embed", "mlp"))(h)
            up = dense(cfg.intermediate_size, f"up_proj_{i}", ("embed", "mlp"))(h)
            x = x + dense(cfg.hidden_size, f"down_proj_{i}", ("mlp", "embed"))(
                nn.silu(gate) * up
            )

        x = RMSNorm(eps=cfg.rms_eps, dtype=dtype, name="norm")(x)
        if attention_mask is not None:
            last = jnp.maximum(jnp.sum(attention_mask, axis=-1) - 1, 0)
        else:
            last = jnp.full((b,), l - 1)
        pooled = x[jnp.arange(b), last]
        proj = self.param(
            "text_projection",
            nn.with_logical_partitioning(
                nn.initializers.normal(cfg.hidden_size ** -0.5),
                ("embed", "mlp"),
            ),
            (cfg.hidden_size, cfg.embed_dim),
            pdtype,
        )
        return x, pooled @ proj.astype(dtype)
