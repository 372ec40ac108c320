"""Dense-GQA causal LM (stock Qwen3 / LLaMA class).

The reference's xtuner trains both MLA-converted AND plain dense models
(xtuner/v1/model/dense/qwen3.py: grouped-query attention, optional
per-head q/k RMSNorm, SwiGLU, RoPE). `models/llm.MLATransformer` covers
the M²LA flavor; this is the sibling for raw GQA checkpoints — same
method surface (init_cache / prefill / decode_step) so
`models/generation.generate` drives it unchanged, and packed-segment
training matches MLATransformer's.

KV cache: per-layer (B, max_len, Hkv, D) K and V arrays (GQA keeps the
kv-head count small, so the dense cache is the memory-honest layout; the
paged-latent machinery is the MLA flavor's specialty).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.models.llm import LLMOutput, SwiGLU
from internvideo_tpu.nn.norms import RMSNorm
from internvideo_tpu.nn.rope import apply_rope, mrope_cos_sin, rope_cos_sin
from internvideo_tpu.ops import dot_product_attention


@dataclasses.dataclass(frozen=True)
class GQAConfig:
    vocab_size: int = 151936
    hidden_size: int = 4096
    num_layers: int = 36
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: Optional[int] = None  # default hidden/num_heads
    intermediate_size: int = 12288
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    # 3D mRoPE sections for the Qwen3-VL-dense compose (None = plain 1D)
    mrope_section: Optional[tuple[int, int, int]] = None
    # sliding-window attention (xtuner mha.py window_size; gpt-oss-class
    # models): each token attends to the last `sliding_window` positions
    sliding_window: Optional[int] = None
    qk_norm: bool = True  # Qwen3 per-head q/k RMSNorm
    qkv_bias: bool = False
    tie_word_embeddings: bool = False
    dtype: str = "float32"
    param_dtype: str = "float32"
    attn_impl: str = "auto"
    remat: bool = False

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads


class GQAAttention(nn.Module):
    cfg: GQAConfig

    def setup(self):
        cfg = self.cfg
        dt, pdt = jnp.dtype(cfg.dtype), jnp.dtype(cfg.param_dtype)

        def dense(feats, name, logical):
            return nn.Dense(
                feats, use_bias=cfg.qkv_bias and name != "o_proj",
                dtype=dt, param_dtype=pdt,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), logical
                ),
                name=name,
            )

        hd = cfg.hd
        self.q_proj = dense(cfg.num_heads * hd, "q_proj", ("embed", "heads"))
        self.k_proj = dense(
            cfg.num_kv_heads * hd, "k_proj", ("embed", "kv_heads")
        )
        self.v_proj = dense(
            cfg.num_kv_heads * hd, "v_proj", ("embed", "kv_heads")
        )
        self.o_proj = dense(cfg.hidden_size, "o_proj", ("heads", "embed"))
        if cfg.qk_norm:
            # per-head-dim RMSNorm (Qwen3 q_norm/k_norm)
            self.q_norm = RMSNorm(eps=cfg.rms_norm_eps, dtype=dt,
                                  name="q_norm")
            self.k_norm = RMSNorm(eps=cfg.rms_norm_eps, dtype=dt,
                                  name="k_norm")

    def _qkv(self, x, cos, sin):
        cfg = self.cfg
        b, s, _ = x.shape
        hd = cfg.hd
        q = self.q_proj(x).reshape(b, s, cfg.num_heads, hd)
        k = self.k_proj(x).reshape(b, s, cfg.num_kv_heads, hd)
        v = self.v_proj(x).reshape(b, s, cfg.num_kv_heads, hd)
        if cfg.qk_norm:
            q, k = self.q_norm(q), self.k_norm(k)
        return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v

    def __call__(self, x, cos, sin, segment_ids=None):
        q, k, v = self._qkv(x, cos, sin)
        out = dot_product_attention(
            q, k, v, causal=True,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            window=self.cfg.sliding_window,
            impl=self.cfg.attn_impl,
        )
        b, s, _, _ = out.shape
        return self.o_proj(out.reshape(b, s, -1))

    def prefill(self, x, cos, sin, cache, cache_len: int = 0):
        """cache: (k (B,L,Hkv,D), v (B,L,Hkv,D)); prompt fills [0, S).
        `cache_len` exists for MLAttention call-compat; only 0 (fresh
        prompt) is supported here."""
        del cache_len  # prompt always starts the cache
        q, k, v = self._qkv(x, cos, sin)
        ck, cv = cache
        s = x.shape[1]
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                          (0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                          (0, 0, 0, 0))
        out = dot_product_attention(
            q, k, v, causal=True, window=self.cfg.sliding_window,
            impl=self.cfg.attn_impl,
        )
        b = x.shape[0]
        return self.o_proj(out.reshape(b, s, -1)), (ck, cv)

    def decode(self, x, cos, sin, cache, cache_len):
        """One token: write entry at cache_len, attend over [0, len]."""
        q, k, v = self._qkv(x, cos, sin)
        ck, cv = cache
        b = x.shape[0]
        ck = jax.lax.dynamic_update_slice(
            ck, k.astype(ck.dtype), (0, cache_len, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, v.astype(cv.dtype), (0, cache_len, 0, 0)
        )
        # mask out not-yet-written tail positions with segment ids (and,
        # with a sliding window, positions older than the window)
        max_len = ck.shape[1]
        pos = jnp.arange(max_len)[None]
        visible = pos <= cache_len
        if self.cfg.sliding_window is not None:
            visible &= pos > cache_len - self.cfg.sliding_window
        kv_seg = jnp.where(visible, 0, -2).astype(jnp.int32)
        kv_seg = jnp.broadcast_to(kv_seg, (b, max_len))
        q_seg = jnp.zeros((b, 1), jnp.int32)
        out = dot_product_attention(
            q, ck.astype(q.dtype), cv.astype(q.dtype),
            q_segment_ids=q_seg, kv_segment_ids=kv_seg, impl="xla",
        )
        return self.o_proj(out.reshape(b, 1, -1)), (ck, cv)


class _GQALayer(nn.Module):
    cfg: GQAConfig

    def setup(self):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        self.input_layernorm = RMSNorm(eps=cfg.rms_norm_eps, dtype=dt)
        self.self_attn = GQAAttention(cfg)
        self.post_attention_layernorm = RMSNorm(
            eps=cfg.rms_norm_eps, dtype=dt
        )
        self.mlp = SwiGLU(
            cfg.intermediate_size, dtype=dt,
            param_dtype=jnp.dtype(cfg.param_dtype),
        )

    def __call__(self, x, cos, sin, segment_ids=None):
        x = x + self.self_attn(self.input_layernorm(x), cos, sin,
                               segment_ids)
        return x + self.mlp(self.post_attention_layernorm(x))

    def prefill(self, x, cos, sin, cache):
        h, cache = self.self_attn.prefill(
            self.input_layernorm(x), cos, sin, cache
        )
        x = x + h
        return x + self.mlp(self.post_attention_layernorm(x)), cache

    def decode(self, x, cos, sin, cache, cache_len):
        h, cache = self.self_attn.decode(
            self.input_layernorm(x), cos, sin, cache, cache_len
        )
        x = x + h
        return x + self.mlp(self.post_attention_layernorm(x)), cache


class GQATransformer(nn.Module):
    cfg: GQAConfig

    def setup(self):
        cfg = self.cfg
        dt, pdt = jnp.dtype(cfg.dtype), jnp.dtype(cfg.param_dtype)
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=dt, param_dtype=pdt,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("vocab", "embed")
            ),
        )
        layer_cls = nn.remat(_GQALayer) if cfg.remat else _GQALayer
        self.layers = [
            layer_cls(cfg, name=f"layers_{i}") for i in range(cfg.num_layers)
        ]
        self.norm = RMSNorm(eps=cfg.rms_norm_eps, dtype=dt)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=dt, param_dtype=pdt,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02),
                    ("embed", "vocab"),
                ),
            )

    def _rope(self, position_ids):
        cfg = self.cfg
        if position_ids.ndim == 3 and cfg.mrope_section:
            return mrope_cos_sin(
                position_ids, cfg.hd, cfg.mrope_section, cfg.rope_theta
            )
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        return rope_cos_sin(position_ids, cfg.hd, cfg.rope_theta)

    def _head(self, h):
        if self.cfg.tie_word_embeddings:
            return self.embed_tokens.attend(h)
        return self.lm_head(h)

    def embed(self, input_ids: jax.Array) -> jax.Array:
        """Sharding-aware token lookup (see MLATransformer.embed: avoids
        GSPMD involuntary full remat on the embed-dim-sharded table)."""
        from internvideo_tpu.core.mesh import constrain

        table = constrain(self.embed_tokens.embedding, ("vocab", None))
        out = jnp.take(table, input_ids, axis=0)
        return constrain(
            out.astype(jnp.dtype(self.cfg.dtype)), ("batch", "seq_act", None)
        )

    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,
        *,
        input_embeds: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        with_logits: bool = True,
    ) -> LLMOutput:
        x = input_embeds if input_embeds is not None else self.embed(
            input_ids
        )
        b, s, _ = x.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = self._rope(position_ids)
        for layer in self.layers:
            x = layer(x, cos, sin, segment_ids)
        x = self.norm(x)
        return LLMOutput(
            logits=self._head(x) if with_logits else None, hidden=x
        )

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16):
        cfg = self.cfg
        shape = (batch, max_len, cfg.num_kv_heads, cfg.hd)
        return [
            (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(cfg.num_layers)
        ]

    def prefill(self, input_embeds, caches, *, position_ids=None):
        b, s, _ = input_embeds.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = self._rope(position_ids)
        x = input_embeds
        new = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer.prefill(x, cos, sin, cache)
            new.append(cache)
        x = self.norm(x)
        return LLMOutput(logits=self._head(x[:, -1:]), hidden=x, caches=new)

    def decode_step(self, token_ids, caches, cache_len, *,
                    position_ids=None):
        x = self.embed_tokens(token_ids)
        b = x.shape[0]
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                cache_len[None, None], (b, 1)
            ).astype(jnp.int32)
        cos, sin = self._rope(position_ids)
        new = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer.decode(x, cos, sin, cache, cache_len)
            new.append(cache)
        x = self.norm(x)
        return LLMOutput(logits=self._head(x), hidden=x, caches=new)
