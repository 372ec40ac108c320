"""Multi-head Latent Attention (MLA / M²LA) — training and decode paths.

Parity target: xtuner's MLA (InternVideo3_sft/xtuner/v1/module/attention/
mla.py:177-731), the attention that gives InternVideo3 its compressed
KV cache for long video:

  * K/V are compressed into a `kv_lora_rank` latent per token plus one
    shared `qk_rope_head_dim` rotary key (kv_a_proj_with_mqa :247);
    per-head K-nope/V are decompressed by kv_b_proj (:255)
  * queries: full q_proj, or LoRA q_a/q_b with RMSNorm when q_lora_rank set
  * softmax scale = (qk_nope + qk_rope dim)^-0.5 (:268)

Training forward (:281-351): decompress K/V, run causal flash attention at
q_head_dim (V padded up, sliced after).

Decode (:453-560 absorbed path): instead of decompressing the cache, absorb
kv_b into the query/output:
    q_latent = q_nope @ W_uk        -> (H, kv_lora_rank)
    scores   = q_latent · cache_ckv + q_pe · cache_kpe   (MQA over latents)
    out      = (probs · cache_ckv) @ W_uv
so the per-token cache is just (kv_lora_rank + rope_dim) floats — the M²LA
memory win. Cache layout here is a dense (B, max_len, R+P) array updated
with dynamic_update_slice; a Pallas paged-decode kernel can swap in later.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.nn.norms import RMSNorm
from internvideo_tpu.nn.rope import apply_rope
from internvideo_tpu.ops import dot_product_attention


@dataclasses.dataclass(frozen=True)
class MLAConfig:
    hidden_size: int = 4096
    num_heads: int = 32
    kv_lora_rank: int = 896
    q_lora_rank: Optional[int] = None
    qk_rope_head_dim: int = 128
    qk_nope_head_dim: int = 128
    v_head_dim: int = 128
    qkv_bias: bool = True
    o_bias: bool = False
    # full-q projection bias: mla.py:232 builds q_proj with bias=True,
    # mla_raw.py:225 with bias=False — both variants exist in the reference
    q_bias: bool = True
    # sliding-window size for "sliding_attention" layer types
    # (xtuner mla.py:278 window_size); None = full attention
    window: Optional[int] = None
    # RMSNorm on the compressed-KV latent. The M²LA variant the reference
    # trains (mla.py:377 comments it out) runs WITHOUT it — default False;
    # True matches classic DeepSeek MLA (mla_raw.py:249,299 kv_a_layernorm),
    # needed to load DeepSeek-style checkpoints.
    kv_norm: bool = False

    @property
    def q_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def cache_dim(self) -> int:
        return self.kv_lora_rank + self.qk_rope_head_dim


class MLAttention(nn.Module):
    cfg: MLAConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # serving weight quantization for the projection GEMVs ("int8_wo"):
    # q/kv_a/o kernels live as int8 + scales; kv_b stays a raw bf16 param
    # (it feeds the absorbed-decode einsums and is ~13% of attn bytes)
    quant: Optional[str] = None

    def setup(self):
        cfg = self.cfg

        def dense(feats, name, use_bias, logical):
            if self.quant in ("int8_wo", "int8_mix"):
                from internvideo_tpu.ops.quant import (
                    INT8_MIX_DYN_M,
                    Int8WoDense,
                )

                return Int8WoDense(
                    feats, use_bias=use_bias, dtype=self.dtype,
                    param_dtype=self.param_dtype, logical=logical,
                    name=name,
                    dyn_m_threshold=(
                        INT8_MIX_DYN_M if self.quant == "int8_mix" else None
                    ),
                )
            return nn.Dense(
                feats, use_bias=use_bias, dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), logical
                ),
                name=name,
            )

        if cfg.q_lora_rank is None:
            self.q_proj = dense(
                cfg.num_heads * cfg.q_head_dim, "q_proj", cfg.q_bias,
                ("embed", "heads"),
            )
        else:
            self.q_a_proj = dense(
                cfg.q_lora_rank, "q_a_proj", cfg.qkv_bias, ("embed", None)
            )
            self.q_a_layernorm = RMSNorm(dtype=self.dtype, name="q_a_layernorm")
            self.q_b_proj = dense(
                cfg.num_heads * cfg.q_head_dim, "q_b_proj", False,
                (None, "heads"),
            )
        self.kv_a_proj_with_mqa = dense(
            cfg.cache_dim, "kv_a_proj_with_mqa", cfg.qkv_bias, ("embed", None)
        )
        if cfg.kv_norm:
            self.kv_a_layernorm = RMSNorm(
                dtype=self.dtype, name="kv_a_layernorm"
            )
        self.kv_b_kernel = self.param(
            "kv_b_proj_kernel",
            nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), (None, "heads", None)
            ),
            (cfg.kv_lora_rank, cfg.num_heads,
             cfg.qk_nope_head_dim + cfg.v_head_dim),
            self.param_dtype,
        )
        self.o_proj = dense(
            cfg.hidden_size, "o_proj", cfg.o_bias, ("heads", "embed")
        )

    def _project_q(self, x):
        cfg = self.cfg
        b, s, _ = x.shape
        if cfg.q_lora_rank is None:
            q = self.q_proj(x)
        else:
            q = self.q_b_proj(self.q_a_layernorm(self.q_a_proj(x)))
        q = q.reshape(b, s, cfg.num_heads, cfg.q_head_dim)
        return (
            q[..., : cfg.qk_nope_head_dim],
            q[..., cfg.qk_nope_head_dim:],
        )

    def _compress_kv(self, x):
        cfg = self.cfg
        ckv = self.kv_a_proj_with_mqa(x)
        lat = ckv[..., : cfg.kv_lora_rank]  # (B,S,R) latent
        if cfg.kv_norm:
            # mla_raw.py:371,484: the cache stores the NORMED latent, so
            # norming here keeps train/prefill/decode consistent.
            lat = self.kv_a_layernorm(lat)
        return lat, ckv[..., cfg.kv_lora_rank:]  # latent, shared rope key

    def __call__(
        self,
        x: jax.Array,  # (B, S, D)
        cos: jax.Array,  # (B, S, P) rope tables for the rope dims
        sin: jax.Array,
        *,
        q_segment_ids: Optional[jax.Array] = None,
        kv_segment_ids: Optional[jax.Array] = None,
        causal: bool = True,
    ) -> jax.Array:
        """Training / prefill forward with decompressed KV."""
        cfg = self.cfg
        b, s, _ = x.shape
        q_nope, q_pe = self._project_q(x)
        ckv, k_pe = self._compress_kv(x)

        # Decompress straight into kernel-ready layouts: pad the WEIGHT
        # slices (tiny) instead of the activations, so k arrives with room
        # for the rope tail and v arrives already at q_head_dim — this
        # replaces two strided (B,S,H,·) activation slices of the fused
        # expansion, the (B,S,H,P) rope broadcast+concat, and the v pad
        # pass (4 full-tensor HBM round-trips per layer at prefill shapes)
        # with two einsums and one fused broadcast add.
        kv_b = self.kv_b_kernel.astype(self.dtype)  # (R, H, nope+v)
        w_k = kv_b[..., : cfg.qk_nope_head_dim]
        w_v = kv_b[..., cfg.qk_nope_head_dim:]
        rope_pad = cfg.q_head_dim - cfg.qk_nope_head_dim
        w_k_padded = jnp.pad(w_k, ((0, 0), (0, 0), (0, rope_pad)))

        # Kernel-native (B,H,S,D) layout when the flash kernel consumes it
        # directly (TPU, no sequence parallelism): the decompression
        # einsums emit bhsd and the rope/concat elementwise chain runs in
        # that layout, so the wrapper's four transpose copies disappear
        # (+5%/layer at the 2B prefill shape, tools_r5/prefill_native.py).
        from internvideo_tpu.ops.attention import native_attention_layout

        layout = native_attention_layout(self.attn_impl)
        if layout == "bhsd":
            k = jnp.einsum("bsr,rhd->bhsd", ckv, w_k_padded)
            k_pe = apply_rope(k_pe[:, :, None, :], cos, sin)  # (B,S,1,P)
            k = k + jnp.pad(
                jnp.swapaxes(k_pe, 1, 2).astype(k.dtype),  # (B,1,S,P)
                ((0, 0), (0, 0), (0, 0), (cfg.qk_nope_head_dim, 0)),
            )
            v = jnp.einsum("bsr,rhd->bhsd", ckv, w_v)
            q_pe = apply_rope(q_pe, cos, sin)
            q = jnp.swapaxes(
                jnp.concatenate([q_nope, q_pe], axis=-1), 1, 2
            )
            out = dot_product_attention(
                q, k, v,
                causal=causal,
                q_segment_ids=q_segment_ids,
                kv_segment_ids=kv_segment_ids,
                softmax_scale=cfg.q_head_dim ** -0.5,
                impl=self.attn_impl,
                window=cfg.window,
                layout="bhsd",
            )
            out = jnp.swapaxes(out, 1, 2).reshape(
                b, s, cfg.num_heads * cfg.v_head_dim
            )
            return self.o_proj(out)

        k = jnp.einsum("bsr,rhd->bshd", ckv, w_k_padded)
        k_pe = apply_rope(k_pe[:, :, None, :], cos, sin)  # (B,S,1,P)
        k = k + jnp.pad(
            k_pe.astype(k.dtype),
            ((0, 0), (0, 0), (0, 0), (cfg.qk_nope_head_dim, 0)),
        )
        # v stays at v_head_dim: the flash kernels carry separate q/k and
        # v/o lane widths, so the 128->192 pad (and its 1.5x pV FLOPs) the
        # reference's CUDA flash-attn forces is not paid here.
        v = jnp.einsum("bsr,rhd->bshd", ckv, w_v)

        q_pe = apply_rope(q_pe, cos, sin)
        q = jnp.concatenate([q_nope, q_pe], axis=-1)
        out = dot_product_attention(
            q, k, v,
            causal=causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            softmax_scale=cfg.q_head_dim ** -0.5,
            impl=self.attn_impl,
            window=cfg.window,
        )
        out = out.reshape(b, s, cfg.num_heads * cfg.v_head_dim)
        return self.o_proj(out)

    def prefill(self, x, cos, sin, cache, cache_len: int, *, causal=True):
        """Forward + write latent cache. cache: (B, max_len, R+P).

        Supports chunked prefill: `cache_len` must be a static Python int
        (chunk schedules are host-driven), and when > 0 the chunk attends
        over all previously cached latents plus itself, with the causal mask
        offset by cache_len. cos/sin are the rope tables for THIS chunk's
        absolute positions.
        """
        cfg = self.cfg
        if not isinstance(cache_len, int):
            raise TypeError(
                "prefill cache_len must be a static int (got a traced "
                "value); chunk boundaries are host-driven"
            )
        b, s, _ = x.shape
        ckv, k_pe_raw = self._compress_kv(x)
        k_pe_new = apply_rope(k_pe_raw[:, :, None, :], cos, sin)[:, :, 0, :]
        new_entries = jnp.concatenate([ckv, k_pe_new], axis=-1)
        cache = jax.lax.dynamic_update_slice(
            cache, new_entries.astype(cache.dtype), (0, cache_len, 0)
        )
        if cache_len == 0:
            return self.__call__(x, cos, sin, causal=causal), cache

        # Second+ chunk: decompress the gathered cache (old + new latents)
        # and attend with the query rows offset by cache_len.
        q_nope, q_pe = self._project_q(x)
        q_pe = apply_rope(q_pe, cos, sin)
        q = jnp.concatenate([q_nope, q_pe], axis=-1)

        total = cache_len + s
        c_all = cache[:, :total, : cfg.kv_lora_rank].astype(self.dtype)
        p_all = cache[:, :total, cfg.kv_lora_rank:].astype(self.dtype)
        kv_b = self.kv_b_kernel.astype(self.dtype)  # (R, H, nope+v)
        kv = jnp.einsum("bsr,rhd->bshd", c_all, kv_b)
        k_nope = kv[..., : cfg.qk_nope_head_dim]
        v = kv[..., cfg.qk_nope_head_dim:]
        k = jnp.concatenate(
            [
                k_nope,
                jnp.broadcast_to(
                    p_all[:, :, None, :],
                    k_nope.shape[:-1] + (cfg.qk_rope_head_dim,),
                ),
            ],
            axis=-1,
        )
        # v rides at v_head_dim — the flash kernels carry separate q/k and
        # v/o lane widths (see __call__).
        out = dot_product_attention(
            q, k, v,
            causal=causal,
            softmax_scale=cfg.q_head_dim ** -0.5,
            impl=self.attn_impl,
            window=cfg.window,
            q_position_offset=cache_len,
        )
        out = out.reshape(b, s, cfg.num_heads * cfg.v_head_dim)
        return self.o_proj(out), cache

    def decode(
        self,
        x: jax.Array,  # (B, 1, D)
        cos: jax.Array,  # (B, 1, P)
        sin: jax.Array,
        cache: jax.Array,  # (B, max_len, R+P) latent+rope cache
        cache_len: jax.Array,  # () tokens already cached
    ):
        """Absorbed-weight single-token decode (mla.py:453-560)."""
        cfg = self.cfg
        b = x.shape[0]
        q_nope, q_pe = self._project_q(x)  # (B,1,H,*)
        q_pe = apply_rope(q_pe, cos, sin)

        ckv, k_pe_raw = self._compress_kv(x)
        k_pe = apply_rope(k_pe_raw[:, :, None, :], cos, sin)[:, :, 0, :]
        entry = jnp.concatenate([ckv, k_pe], axis=-1)  # (B,1,R+P)
        cache = jax.lax.dynamic_update_slice(
            cache, entry.astype(cache.dtype), (0, cache_len, 0)
        )

        kv_b = self.kv_b_kernel.astype(self.dtype)  # (R, H, nope+v)
        w_uk = kv_b[..., : cfg.qk_nope_head_dim]  # (R, H, nope)
        w_uv = kv_b[..., cfg.qk_nope_head_dim:]  # (R, H, v)

        # absorb: query into latent space
        q_lat = jnp.einsum("bqhd,rhd->bqhr", q_nope, w_uk)  # (B,1,H,R)
        c = cache[:, :, : cfg.kv_lora_rank].astype(self.dtype)
        p = cache[:, :, cfg.kv_lora_rank:].astype(self.dtype)
        scores = (
            jnp.einsum("bqhr,bsr->bhqs", q_lat, c)
            + jnp.einsum("bqhd,bsd->bhqs", q_pe, p)
        ) * (cfg.q_head_dim ** -0.5)
        # mask beyond current length (cache_len old tokens + the new one)
        valid = (
            jnp.arange(cache.shape[1])[None, None, None, :] <= cache_len
        )
        scores = jnp.where(valid, scores, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        ctx_lat = jnp.einsum("bhqs,bsr->bqhr", probs, c)  # (B,1,H,R)
        out = jnp.einsum("bqhr,rhd->bqhd", ctx_lat, w_uv)  # (B,1,H,v)
        out = out.reshape(b, 1, cfg.num_heads * cfg.v_head_dim)
        return self.o_proj(out), cache

    def decode_paged(
        self,
        x: jax.Array,  # (B, 1, D)
        cos: jax.Array,
        sin: jax.Array,
        pages: jax.Array,  # (P, page_size, R+Prope) shared page pool
        block_tables: jax.Array,  # (B, max_pages) page ids per sequence
        seq_lens: jax.Array,  # (B,) tokens already cached (incl. this one
        #                         after the caller's paged_write)
        impl: Optional[str] = None,  # auto | pallas | xla (None = module's)
        interpret: bool = False,
    ):
        """Absorbed decode over a paged cache (kv_cache.py:5-47 equivalent).

        The caller writes the new token's latent entry into the page pool
        first (compute_cache_entry + paged_write), then calls this.

        `impl="pallas"` runs the paged-decode Pallas kernel
        (ops/paged_decode.py): HBM traffic O(seq_len) pages per sequence,
        no (B, max_len, C) gather is materialized — the counterpart of the
        reference's flash_mla_decoding (mla.py:86-127). The XLA path keeps
        the gather formulation as the CPU-testable fallback.
        """
        cfg = self.cfg
        b = x.shape[0]
        q_nope, q_pe = self._project_q(x)
        q_pe = apply_rope(q_pe, cos, sin)

        kv_b = self.kv_b_kernel.astype(self.dtype)
        w_uk = kv_b[..., : cfg.qk_nope_head_dim]
        w_uv = kv_b[..., cfg.qk_nope_head_dim:]
        q_lat = jnp.einsum("bqhd,rhd->bqhr", q_nope, w_uk)

        impl = impl or self.attn_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            from internvideo_tpu.ops.attention import head_parallel_active
            from internvideo_tpu.ops.paged_decode import paged_mla_decode

            kernel_args = (
                q_lat[:, 0].astype(self.dtype),
                q_pe[:, 0].astype(self.dtype),
                pages, block_tables, seq_lens,
            )
            headpar = head_parallel_active()
            if headpar is not None:
                # tensor-sharded decode: q heads split over the mesh, the
                # latent page pool replicated — each device's kernel walks
                # the same pages for its H/tp heads, zero collectives
                # (serve/engine.py mesh serving)
                from jax.sharding import PartitionSpec as _P

                hp_mesh, hp_axis = headpar
                if cfg.num_heads % hp_mesh.shape[hp_axis]:
                    raise ValueError(
                        f"num_heads {cfg.num_heads} must divide tensor "
                        f"axis {hp_mesh.shape[hp_axis]}"
                    )
                hspec = _P(None, hp_axis, None)
                rep2, rep3 = _P(None, None), _P(None, None, None)
                ctx_lat = jax.shard_map(
                    lambda ql, qp, pg, bt, sl: paged_mla_decode(
                        ql, qp, pg, bt, sl,
                        softmax_scale=cfg.q_head_dim ** -0.5,
                        interpret=interpret,
                    ),
                    mesh=hp_mesh,
                    in_specs=(hspec, hspec, rep3, rep2, _P(None)),
                    out_specs=hspec,
                    check_vma=False,
                )(*kernel_args)[:, None]
            else:
                ctx_lat = paged_mla_decode(
                    *kernel_args,
                    softmax_scale=cfg.q_head_dim ** -0.5,
                    interpret=interpret,
                )[:, None]  # (B, 1, H, R)
        else:
            from internvideo_tpu.nn.paged_cache import batched_paged_gather

            cache = batched_paged_gather(pages, block_tables)  # (B, L, R+P)
            c = cache[:, :, : cfg.kv_lora_rank].astype(self.dtype)
            p = cache[:, :, cfg.kv_lora_rank:].astype(self.dtype)
            scores = (
                jnp.einsum("bqhr,bsr->bhqs", q_lat, c)
                + jnp.einsum("bqhd,bsd->bhqs", q_pe, p)
            ) * (cfg.q_head_dim ** -0.5)
            valid = (
                jnp.arange(cache.shape[1])[None, None, None, :]
                < seq_lens[:, None, None, None]
            )
            scores = jnp.where(valid, scores, -1e30)
            probs = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(self.dtype)
            ctx_lat = jnp.einsum("bhqs,bsr->bqhr", probs, c)
        out = jnp.einsum("bqhr,rhd->bqhd", ctx_lat, w_uv)
        out = out.reshape(b, 1, cfg.num_heads * cfg.v_head_dim)
        return self.o_proj(out)

    def compute_cache_entry(self, x, cos, sin):
        """(B, 1, D) -> (B, 1, R+Prope) latent entry for the paged pool."""
        ckv, k_pe_raw = self._compress_kv(x)
        k_pe = apply_rope(k_pe_raw[:, :, None, :], cos, sin)[:, :, 0, :]
        return jnp.concatenate([ckv, k_pe], axis=-1)
