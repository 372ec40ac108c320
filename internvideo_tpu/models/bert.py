"""BERT text/fusion tower for VideoCLIP stage-2.

Capability parity with the reference's modified HF-BERT
(multi_modality/models/backbones/bert/xbert.py:599-1013, med.py:455-466):

  * `fusion_layer`: encoder layers < fusion_layer are text-only; layers
    >= fusion_layer additionally cross-attend to vision tokens
  * three run modes
      - "text":       all layers, self-attention only
      - "fusion":     precomputed token embeds enter at layer fusion_layer
                      and run the remaining layers with cross-attention
      - "multimodal": all layers, cross-attention from fusion_layer up
  * MLM head (dense → gelu → LayerNorm → decoder to vocab)

The attention mask is additive (0 keep / -inf drop) built from the padding
mask; attention itself routes through ops.dot_product_attention.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from internvideo_tpu.nn.norms import LayerNorm
from internvideo_tpu.ops.attention_xla import NEG_INF
from internvideo_tpu.ops import dot_product_attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    fusion_layer: int = 9
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1
    dtype: str = "float32"
    param_dtype: str = "float32"
    attn_impl: str = "auto"


@struct.dataclass
class BertOutput:
    last_hidden_state: jax.Array  # (B, L, H)
    pooled: jax.Array  # (B, H) — cls token
    mlm_logits: Optional[jax.Array] = None  # (B, L, vocab)


class _BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, kv, attn_bias, deterministic):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        h, d = cfg.num_heads, cfg.hidden_size
        hd = d // h

        def dense(name, logical=("embed", "heads")):
            return nn.Dense(
                d, dtype=dtype, param_dtype=jnp.dtype(cfg.param_dtype),
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), logical
                ),
                name=name,
            )

        b, lq, _ = x.shape
        lk = kv.shape[1]
        q = dense("query")(x).reshape(b, lq, h, hd)
        k = dense("key")(kv).reshape(b, lk, h, hd)
        v = dense("value")(kv).reshape(b, lk, h, hd)
        if attn_bias is not None:
            # additive padding bias — fall back to XLA attention with bias
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (hd ** -0.5)
            logits = logits + attn_bias
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            # attention-probability dropout (HF BertSelfAttention's
            # attention_probs_dropout_prob; xbert.py keeps it too)
            probs = nn.Dropout(cfg.dropout)(
                probs, deterministic=deterministic
            )
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", probs, v,
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        else:
            out = dot_product_attention(q, k, v, impl=cfg.attn_impl)
            if cfg.dropout and not deterministic:
                # flash path has no prob hook — approximate with dropout
                # on the attention output before the projection
                out = nn.Dropout(cfg.dropout)(out, deterministic=False)
        out = out.reshape(b, lq, d)
        out = dense("proj", logical=("heads", "embed"))(out)
        out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
        return out


class _BertLayer(nn.Module):
    cfg: BertConfig
    has_cross: bool

    @nn.compact
    def __call__(
        self, x, self_bias, vision, vision_bias, deterministic
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        attn = _BertSelfAttention(cfg, name="attention")(
            x, x, self_bias, deterministic
        )
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=dtype, name="attention_norm")(
            x + attn
        )
        if self.has_cross and vision is not None:
            cross = _BertSelfAttention(cfg, name="crossattention")(
                x, vision, vision_bias, deterministic
            )
            x = LayerNorm(
                eps=cfg.layer_norm_eps, dtype=dtype, name="crossattention_norm"
            )(x + cross)
        ff = nn.Dense(
            cfg.intermediate_size, dtype=dtype,
            param_dtype=jnp.dtype(cfg.param_dtype),
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", "mlp")
            ),
            name="intermediate",
        )(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(
            cfg.hidden_size, dtype=dtype,
            param_dtype=jnp.dtype(cfg.param_dtype),
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("mlp", "embed")
            ),
            name="output",
        )(ff)
        ff = nn.Dropout(cfg.dropout)(ff, deterministic=deterministic)
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=dtype, name="output_norm")(
            x + ff
        )
        return x


def _padding_bias(attention_mask: Optional[jax.Array]) -> Optional[jax.Array]:
    """(B, L) 1/0 mask -> (B, 1, 1, L) additive bias."""
    if attention_mask is None:
        return None
    return jnp.where(
        attention_mask[:, None, None, :] > 0, 0.0, NEG_INF
    ).astype(jnp.float32)


class BertModel(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,  # (B, L)
        attention_mask: Optional[jax.Array] = None,  # (B, L) 1=keep
        *,
        encoder_embeds: Optional[jax.Array] = None,  # fusion-mode input
        vision_embeds: Optional[jax.Array] = None,  # (B, Lv, H)
        vision_mask: Optional[jax.Array] = None,
        mode: str = "text",  # text | fusion | multimodal
        deterministic: bool = True,
        with_mlm_logits: bool = False,
    ) -> BertOutput:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)

        if mode == "fusion":
            assert encoder_embeds is not None
            x = encoder_embeds
            layer_range = range(cfg.fusion_layer, cfg.num_layers)
        else:
            emb = nn.Embed(
                cfg.vocab_size, cfg.hidden_size, dtype=dtype,
                param_dtype=pdtype,
                embedding_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), ("vocab", "embed")
                ),
                name="word_embeddings",
            )(input_ids)
            pos_ids = jnp.arange(input_ids.shape[1])[None]
            pos = nn.Embed(
                cfg.max_position_embeddings, cfg.hidden_size, dtype=dtype,
                param_dtype=pdtype,
                embedding_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), (None, "embed")
                ),
                name="position_embeddings",
            )(pos_ids)
            tok_type = nn.Embed(
                cfg.type_vocab_size, cfg.hidden_size, dtype=dtype,
                param_dtype=pdtype,
                embedding_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), (None, "embed")
                ),
                name="token_type_embeddings",
            )(jnp.zeros_like(input_ids))
            x = emb + pos + tok_type
            x = LayerNorm(
                eps=cfg.layer_norm_eps, dtype=dtype, name="embeddings_norm"
            )(x)
            x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
            # xbert.py:722-733: text = [0, fusion), multimodal = all layers
            if mode == "text":
                layer_range = range(0, cfg.fusion_layer)
            elif mode == "multimodal":
                layer_range = range(0, cfg.num_layers)
            else:
                raise ValueError(mode)

        self_bias = _padding_bias(attention_mask)
        vision_bias = _padding_bias(vision_mask)

        for i in layer_range:
            x = _BertLayer(
                cfg,
                has_cross=i >= cfg.fusion_layer,
                name=f"layer_{i}",
            )(
                x, self_bias,
                vision_embeds if mode != "text" else None,
                vision_bias, deterministic,
            )

        mlm_logits = None
        if with_mlm_logits:
            t = nn.Dense(
                cfg.hidden_size, dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), ("embed", "mlp")
                ),
                name="mlm_transform",
            )(x)
            t = nn.gelu(t, approximate=False)
            t = LayerNorm(
                eps=cfg.layer_norm_eps, dtype=dtype, name="mlm_norm"
            )(t)
            mlm_logits = nn.Dense(
                cfg.vocab_size, dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), ("embed", "vocab")
                ),
                name="mlm_decoder",
            )(t)

        return BertOutput(
            last_hidden_state=x, pooled=x[:, 0], mlm_logits=mlm_logits
        )
