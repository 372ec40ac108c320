"""Decoder-only language model (Qwen3-MLA style) for the MLLM path.

Mirrors the text tower of InternVideo3-8B (Qwen3Dense8BMLAConfig,
xtuner/v1/model/dense/qwen3.py:377-407: 36 layers, hidden 4096,
intermediate 12288 SwiGLU, MLA attention with kv_lora_rank 896 and
128/128/128 rope/nope/v dims, rope_theta 5e6, mRoPE sections [24,20,20]).

Layer = RMSNorm -> MLA -> residual; RMSNorm -> SwiGLU -> residual.
Supports packed segment ids for training and a latent KV cache
(prefill/decode) for generation; position ids may be 1D or 3D (mRoPE).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from internvideo_tpu.nn.mla import MLAConfig, MLAttention
from internvideo_tpu.nn.paged_cache import paged_write
from internvideo_tpu.nn.norms import RMSNorm
from internvideo_tpu.nn.rope import YarnConfig, mrope_cos_sin, rope_cos_sin


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 151936
    hidden_size: int = 4096
    num_layers: int = 36
    intermediate_size: int = 12288
    rms_norm_eps: float = 1e-6
    rope_theta: float = 5_000_000.0
    mrope_section: Optional[tuple[int, int, int]] = (24, 20, 20)
    # YaRN long-context rescaling (DeepSeek-V3); applies to 1-D RoPE only
    rope_scaling: Optional[YarnConfig] = None
    mla: MLAConfig = dataclasses.field(default_factory=MLAConfig)
    # MoE feed-forward (Qwen3-MoE / DeepSeek-V3 / Intern-S1 class): when
    # set, every layer's MLP is a routed MoEMlp; the per-layer aux loss is
    # sown into the "intermediates" collection (moe_aux_losses() sums it)
    moe: "object | None" = None  # nn/moe.py MoEConfig
    # DeepSeek-V3 first_k_dense_replace (deepseek_v3.py:59): the first k
    # layers keep a dense SwiGLU (intermediate_size) instead of the MoE
    moe_first_k_dense: int = 0
    tie_word_embeddings: bool = False
    # fp8 feed-forward GEMMs (reference float8_handler.py:38-230): "fwd"
    # = e4m3 forward only, "full" = fp8 backward too (e5m2 gradients)
    fp8: Optional[str] = None  # None | "fwd" | "full"
    # serving-time weight quantization: "int8_wo" stores MLP/attention/
    # lm_head kernels as int8 + per-out-channel scales (ops/quant.py
    # Int8WoDense) — decode is weight-stream bound, so int8 bytes ≈ halve
    # the step; populate params via ops.quant.quantize_params_like.
    # "int8_mix" = the same params, but compute-bound dispatches (prefill:
    # M >= INT8_MIX_DYN_M rows) take the fused dynamic-int8 Pallas GEMM
    # (int8 MXU at ~2x bf16 rate) while decode keeps exact weight-only math
    quant: Optional[str] = None  # None | "int8_wo" | "int8_mix"
    dtype: str = "float32"
    param_dtype: str = "float32"
    attn_impl: str = "auto"
    remat: bool = False


@struct.dataclass
class LLMOutput:
    logits: Optional[jax.Array]
    hidden: jax.Array
    caches: Optional[list] = None


class SwiGLU(nn.Module):
    intermediate: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    fp8: Optional[str] = None  # None | "fwd" | "full" (e5m2 backward)
    quant: Optional[str] = None  # None | "int8_wo" (serving weight-only)

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]

        def dense(feats, name, logical):
            if self.quant in ("int8_wo", "int8_mix"):
                from internvideo_tpu.ops.quant import (
                    INT8_MIX_DYN_M,
                    Int8WoDense,
                )

                return Int8WoDense(
                    feats, use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, logical=logical,
                    name=name,
                    dyn_m_threshold=(
                        INT8_MIX_DYN_M if self.quant == "int8_mix" else None
                    ),
                )
            if self.fp8 is not None:
                from internvideo_tpu.ops.fp8 import Fp8Dense

                return Fp8Dense(
                    feats, use_bias=False,
                    backward="fp8" if self.fp8 == "full" else "precise",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=name,
                )
            return nn.Dense(
                feats, use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), logical
                ),
                name=name,
            )

        gate = dense(self.intermediate, "gate_proj", ("embed", "mlp"))(x)
        up = dense(self.intermediate, "up_proj", ("embed", "mlp"))(x)
        return dense(d, "down_proj", ("mlp", "embed"))(nn.silu(gate) * up)


class _DecoderLayer(nn.Module):
    cfg: LLMConfig
    dense_mlp: bool = False  # first_k_dense layers of a MoE model

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.input_layernorm = RMSNorm(eps=cfg.rms_norm_eps, dtype=dtype)
        self.self_attn = MLAttention(
            cfg.mla, dtype=dtype, param_dtype=jnp.dtype(cfg.param_dtype),
            attn_impl=cfg.attn_impl, quant=cfg.quant,
        )
        self.post_attention_layernorm = RMSNorm(
            eps=cfg.rms_norm_eps, dtype=dtype
        )
        if cfg.moe is not None and not self.dense_mlp:
            from internvideo_tpu.nn.moe import MoEMlp

            self.mlp_moe = MoEMlp(
                cfg.moe, dtype=dtype,
                param_dtype=jnp.dtype(cfg.param_dtype), name="mlp",
            )
        else:
            self.mlp = SwiGLU(
                cfg.intermediate_size, dtype=dtype,
                param_dtype=jnp.dtype(cfg.param_dtype),
                fp8=cfg.fp8, quant=cfg.quant,
            )

    def _mlp(self, x):
        if self.cfg.moe is None or self.dense_mlp:
            return self.mlp(x)
        out = self.mlp_moe(x)
        # surface the load-balancing loss without changing call signatures
        # (readable via capture_intermediates / mutable=["intermediates"])
        self.sow("intermediates", "moe_aux_loss", out.aux_loss)
        return out.output

    def __call__(self, x, cos, sin, segment_ids=None):
        h = self.self_attn(
            self.input_layernorm(x), cos, sin,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            causal=True,
        )
        x = x + h
        x = x + self._mlp(self.post_attention_layernorm(x))
        return x

    def decode(self, x, cos, sin, cache, cache_len):
        h, cache = self.self_attn.decode(
            self.input_layernorm(x), cos, sin, cache, cache_len
        )
        x = x + h
        x = x + self._mlp(self.post_attention_layernorm(x))
        return x, cache


class MLATransformer(nn.Module):
    cfg: LLMConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=dtype, param_dtype=pdtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("vocab", "embed")
            ),
        )
        layer_cls = _DecoderLayer
        if cfg.remat:
            layer_cls = nn.remat(_DecoderLayer)
        self.layers = [
            layer_cls(
                cfg, dense_mlp=(i < cfg.moe_first_k_dense),
                name=f"layers_{i}",
            )
            for i in range(cfg.num_layers)
        ]
        self.norm = RMSNorm(eps=cfg.rms_norm_eps, dtype=dtype)
        if not cfg.tie_word_embeddings:
            if cfg.quant in ("int8_wo", "int8_mix"):
                from internvideo_tpu.ops.quant import Int8WoDense

                # lm_head stays weight-only even under int8_mix: prefill
                # only scores the final position (tiny M), and N=vocab is
                # far past the fused kernel's full-N VMEM budget
                self.lm_head = Int8WoDense(
                    cfg.vocab_size, use_bias=False, dtype=dtype,
                    param_dtype=pdtype, logical=("embed", "vocab"),
                )
            else:
                self.lm_head = nn.Dense(
                    cfg.vocab_size, use_bias=False, dtype=dtype,
                    param_dtype=pdtype,
                    kernel_init=nn.with_logical_partitioning(
                        nn.initializers.truncated_normal(0.02),
                        ("embed", "vocab"),
                    ),
                )

    def _rope(self, position_ids):
        cfg = self.cfg
        rope_dim = cfg.mla.qk_rope_head_dim
        if position_ids.ndim == 3 and cfg.mrope_section:
            return mrope_cos_sin(
                position_ids, rope_dim, cfg.mrope_section, cfg.rope_theta
            )
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        return rope_cos_sin(
            position_ids, rope_dim, cfg.rope_theta, cfg.rope_scaling
        )

    def _head(self, h):
        if self.cfg.tie_word_embeddings:
            return self.embed_tokens.attend(h)
        return self.lm_head(h)

    def embed(self, input_ids: jax.Array) -> jax.Array:
        """Token lookup for the sharded training path. The table's embed dim
        is constrained replicated at the lookup: its parameter sharding
        ("vocab", "embed"→fsdp) conflicts with batch-over-fsdp activations,
        and GSPMD's fallback for that batched gather is an involuntary full
        rematerialization of the (B, S, D) output every step. With the table
        ("vocab", None) the partitioner keeps the vocab-sharded mask+psum
        gather and emits the output directly in (batch, seq) layout. No-op
        outside a mesh context."""
        from internvideo_tpu.core.mesh import constrain

        table = constrain(self.embed_tokens.embedding, ("vocab", None))
        out = jnp.take(table, input_ids, axis=0)
        return constrain(
            out.astype(jnp.dtype(self.cfg.dtype)), ("batch", "seq_act", None)
        )

    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,  # (B, S)
        *,
        input_embeds: Optional[jax.Array] = None,  # (B, S, D)
        position_ids: Optional[jax.Array] = None,  # (B,S) or (3,B,S)
        segment_ids: Optional[jax.Array] = None,  # (B, S) packed; <0 = pad
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
        logits = self._head(x) if with_logits else None
        return LLMOutput(logits=logits, hidden=x)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16):
        cfg = self.cfg
        return [
            jnp.zeros((batch, max_len, cfg.mla.cache_dim), dtype)
            for _ in range(cfg.num_layers)
        ]

    def prefill(
        self,
        input_embeds: jax.Array,  # (B, S, D)
        caches: list,
        *,
        position_ids: Optional[jax.Array] = None,
    ) -> LLMOutput:
        """Run the prompt, fill latent caches, return last-position logits."""
        b, s, _ = input_embeds.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = self._rope(position_ids)
        x = input_embeds
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            h, cache = layer.self_attn.prefill(
                layer.input_layernorm(x), cos, sin, cache, 0
            )
            x = x + h
            x = x + layer._mlp(layer.post_attention_layernorm(x))
            new_caches.append(cache)
        x = self.norm(x)
        logits = self._head(x[:, -1:])
        return LLMOutput(logits=logits, hidden=x, caches=new_caches)

    def decode_step(
        self,
        token_ids: jax.Array,  # (B, 1)
        caches: list,
        cache_len: jax.Array,  # () tokens already in cache
        *,
        position_ids: Optional[jax.Array] = None,
    ) -> LLMOutput:
        x = self.embed_tokens(token_ids)
        b = x.shape[0]
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                cache_len[None, None], (b, 1)
            ).astype(jnp.int32)
        cos, sin = self._rope(position_ids)
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer.decode(x, cos, sin, cache, cache_len)
            new_caches.append(cache)
        x = self.norm(x)
        return LLMOutput(
            logits=self._head(x), hidden=x, caches=new_caches
        )

    def prefill_paged(
        self,
        input_ids: Optional[jax.Array],  # (B, S)
        pages: list,  # per-layer (P, page_size, C) pools
        block_tables: jax.Array,  # (B, max_pages)
        page_size: int,
        *,
        input_embeds: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
    ) -> LLMOutput:
        """Prompt pass writing latent entries into the page pools.

        Attention itself runs as plain causal self-attention (the cache is
        empty before the prompt); only the entry writes differ from
        `prefill`."""
        input_embeds = (
            input_embeds if input_embeds is not None
            else self.embed_tokens(input_ids)
        )
        b, s, _ = input_embeds.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = self._rope(position_ids)
        x = input_embeds
        new_pages = []
        for layer, pool in zip(self.layers, pages):
            xn = layer.input_layernorm(x)
            entries = layer.self_attn.compute_cache_entry(xn, cos, sin)
            new_pages.append(_write_positions(
                pool, entries, block_tables, position_ids, page_size
            ))
            x = x + layer.self_attn(xn, cos, sin, causal=True)
            x = x + layer._mlp(layer.post_attention_layernorm(x))
        x = self.norm(x)
        return LLMOutput(
            logits=self._head(x[:, -1:]), hidden=x, caches=new_pages
        )

    def decode_step_paged(
        self,
        token_ids: jax.Array,  # (B, 1)
        pages: list,
        block_tables: jax.Array,
        seq_lens: jax.Array,  # (B,) tokens already cached (ragged OK)
        page_size: int,
        *,
        impl: Optional[str] = None,
        interpret: bool = False,
    ) -> LLMOutput:
        """One decode step over the paged pools (Pallas kernel on TPU):
        write this token's latent entry, then absorbed paged attention.
        O(seq_len) HBM traffic per sequence; memory O(pool)."""
        x = self.embed_tokens(token_ids)
        positions = seq_lens[:, None].astype(jnp.int32)  # (B, 1)
        cos, sin = self._rope(positions)
        new_pages = []
        for layer, pool in zip(self.layers, pages):
            xn = layer.input_layernorm(x)
            entry = layer.self_attn.compute_cache_entry(xn, cos, sin)
            pool = _write_positions(
                pool, entry, block_tables, positions, page_size
            )
            new_pages.append(pool)
            h = layer.self_attn.decode_paged(
                xn, cos, sin, pool, block_tables, seq_lens + 1,
                impl=impl, interpret=interpret,
            )
            x = x + h
            x = x + layer._mlp(layer.post_attention_layernorm(x))
        x = self.norm(x)
        return LLMOutput(
            logits=self._head(x), hidden=x, caches=new_pages
        )


# ---------------------------------------------------------------------------
# Paged decode path (serving): latent entries live in a shared page pool
# walked by the Pallas paged-decode kernel — end-to-end counterpart of the
# reference's paged prefill/decode (xtuner mha.py:195-303, kv_cache.py:5-47)
# ---------------------------------------------------------------------------


def init_paged_cache(
    cfg, batch: int, max_len: int, page_size: int = 64, dtype=jnp.bfloat16
):
    """Contiguously-allocated page pool + block tables for a fixed batch.

    Returns (pages_per_layer, block_tables): layer l's pool is
    pages[l] (P, page_size, cache_dim); block_tables (B, max_pages) maps
    sequence b's page j to pool page b*max_pages + j. For dynamic serving
    with sequence join/leave, drive nn/paged_cache.PageAllocator instead.
    """
    pages_per_seq = -(-max_len // page_size)
    n_pages = batch * pages_per_seq
    pages = [
        jnp.zeros((n_pages, page_size, cfg.mla.cache_dim), dtype)
        for _ in range(cfg.num_layers)
    ]
    tables = jnp.arange(n_pages, dtype=jnp.int32).reshape(
        batch, pages_per_seq
    )
    return pages, tables


def _write_positions(pages, entries, tables, positions, page_size):
    """Scatter (B, S, C) entries at token `positions` (B, S) into the pool."""
    b, s, c = entries.shape
    pids = jnp.take_along_axis(
        tables, positions // page_size, axis=1
    ).reshape(-1)
    offs = (positions % page_size).reshape(-1)
    return paged_write(pages, entries.reshape(-1, c), pids, offs)


def moe_aux_losses(intermediates) -> jax.Array:
    """Sum the per-layer MoE load-balancing losses sown by _DecoderLayer
    (pass `mutable=["intermediates"]` / `capture_intermediates=True` to
    apply). Returns 0.0 when the model has no MoE layers."""
    total = jnp.zeros(())
    for leaf in jax.tree.leaves(intermediates):
        total = total + jnp.sum(jnp.asarray(leaf))
    return total
