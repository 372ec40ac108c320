"""Transformer building blocks for the InternVideo2 encoder family.

Capability map to the reference (InternVideo2/single_modality/models/
internvideo2.py — cited per class): QK-normalized attention (:150-220),
LayerScale with forced-fp32 gamma (:133-148), pre-norm RMSNorm blocks with
stochastic depth (:247-297), mean-query cross-attention pooling (:18-117).

All attention goes through ops.dot_product_attention (Pallas flash kernel on
TPU). QK normalization is applied over the *flattened* head dims — one
(D,)-weight RMSNorm across all heads, exactly as the reference does
(internvideo2.py:171-172 q_norm/k_norm over `dim`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from flax import linen as nn

from internvideo_tpu.nn.norms import LayerNorm, RMSNorm
from internvideo_tpu.ops import dot_product_attention, fused_qkv_attention_or_none

Initializer = Callable[..., jax.Array]


def _dense(feats, name, dtype, param_dtype, use_bias=True, logical=("embed", "mlp"),
           kernel_init=None, quant=None):
    if quant == "int8":  # serving mode: int8 weights + dynamic activations
        from internvideo_tpu.ops.quant import Int8Dense

        return Int8Dense(
            feats, use_bias=use_bias, dtype=dtype, param_dtype=param_dtype,
            logical=tuple(logical), name=name,
        )
    assert quant is None, quant
    return nn.Dense(
        feats,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=param_dtype,
        kernel_init=nn.with_logical_partitioning(
            kernel_init or nn.initializers.truncated_normal(0.02), logical
        ),
        name=name,
    )


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class LayerScale(nn.Module):
    """gamma * x with fp32 math (reference forces fp32: internvideo2.py:139-148)."""

    init_value: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma",
            nn.with_logical_partitioning(
                nn.initializers.constant(self.init_value), ("norm",)
            ),
            (x.shape[-1],),
            jnp.float32,
        )
        return (x.astype(jnp.float32) * gamma).astype(self.dtype)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # "gelu" = exact erf (reference eval path); "gelu_tanh" = the tanh
    # approximation the reference's production FusedMLP uses (≈2× cheaper
    # on the VPU at bf16); "quick_gelu" = x·σ(1.702x) (CLIP/ViCLIP towers)
    act: str = "gelu"
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_dim = self.out_dim or x.shape[-1]
        x = _dense(self.hidden_dim, "fc1", self.dtype, self.param_dtype,
                   logical=("embed", "mlp"), quant=self.quant)(x)
        if self.act == "quick_gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = nn.gelu(x, approximate=(self.act == "gelu_tanh"))
        # named for selective-remat policies: the post-gelu activation is
        # the single biggest tensor (B,S,mlp_ratio*D); saving or
        # offloading it removes the fc1 GEMM + gelu from the bwd replay
        x = checkpoint_name(x, "mlp_hidden")
        x = _dense(out_dim, "fc2", self.dtype, self.param_dtype,
                   logical=("mlp", "embed"), quant=self.quant)(x)
        return x


def _make_norm(norm_type: str, dtype, name: str, eps: Optional[float] = None):
    if norm_type == "rmsnorm":
        return RMSNorm(dtype=dtype, name=name)
    if norm_type == "layernorm":
        # 1e-6 = timm/VideoMAE convention; CLIP-lineage towers (ViCLIP)
        # use torch's 1e-5 default — pass eps for checkpoint parity.
        return LayerNorm(eps=1e-6 if eps is None else eps, dtype=dtype,
                         name=name)
    raise ValueError(norm_type)


class Attention(nn.Module):
    """Self-attention with optional whole-dim QK RMSNorm."""

    num_heads: int
    qkv_bias: bool = False
    qk_normalization: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    norm_type: str = "rmsnorm"
    norm_eps: Optional[float] = None
    quant: Optional[str] = None  # "int8" = Int8Dense serving projections

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, s, d = x.shape
        head_dim = d // self.num_heads
        # Flat (D, 3D) projection with lane-aligned [..., i*D:(i+1)*D] slices:
        # measured ~1.4 ms/layer faster at 1B shapes than DenseGeneral's
        # (B, S, 3, D) output, whose middle-axis slices force strided copies.
        qkv = _dense(
            3 * d, "qkv", self.dtype, self.param_dtype,
            use_bias=self.qkv_bias, logical=("embed", "heads"),
            quant=self.quant,
        )(x)
        if self.qk_normalization and self.norm_type == "rmsnorm":
            # Fused qkv-slice + whole-dim QK-RMSNorm + attention: the kernel
            # reads the projection output directly (three block-aligned
            # views), eliminating the normalized-q/k and v materializations
            # XLA otherwise emits between the GEMM and the kernel. Falls
            # back to the unfused path off-TPU / under Ulysses / at large S.
            q_norm = _make_norm(self.norm_type, self.dtype, "q_norm")
            k_norm = _make_norm(self.norm_type, self.dtype, "k_norm")
            qw = q_norm(qkv[..., :d], weight_only=True)
            kw = k_norm(qkv[..., d:2 * d], weight_only=True)
            fused = fused_qkv_attention_or_none(
                qkv, qw, kw, num_heads=self.num_heads, impl=self.attn_impl,
            )
            if fused is not None:
                return _dense(d, "proj", self.dtype, self.param_dtype,
                              logical=("heads", "embed"),
                              quant=self.quant)(fused)
            q = q_norm(qkv[..., :d])
            k = k_norm(qkv[..., d:2 * d])
            v = qkv[..., 2 * d:]
        else:
            q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
            if self.qk_normalization:
                q = _make_norm(self.norm_type, self.dtype, "q_norm",
                               self.norm_eps)(q)
                k = _make_norm(self.norm_type, self.dtype, "k_norm",
                               self.norm_eps)(k)
        q = q.reshape(b, s, self.num_heads, head_dim)
        k = k.reshape(b, s, self.num_heads, head_dim)
        v = v.reshape(b, s, self.num_heads, head_dim)
        out = dot_product_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, s, d)
        return _dense(d, "proj", self.dtype, self.param_dtype,
                      logical=("heads", "embed"), quant=self.quant)(out)


class Block(nn.Module):
    """Pre-norm transformer block: RMSNorm → attn → LS → DropPath, then MLP."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_normalization: bool = True
    init_values: Optional[float] = 1e-5
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    norm_type: str = "rmsnorm"  # "layernorm" for VideoMAE-style teachers
    norm_eps: Optional[float] = None  # layernorm eps override (CLIP: 1e-5)
    mlp_act: str = "gelu"  # "gelu_tanh" = reference FusedMLP approx
    quant: Optional[str] = None  # "int8" serving projections (eval only)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        d = x.shape[-1]
        h = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_normalization=self.qk_normalization,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            norm_type=self.norm_type,
            norm_eps=self.norm_eps,
            quant=self.quant,
            name="attn",
        )(
            _make_norm(self.norm_type, self.dtype, "norm1", self.norm_eps)(x),
        )
        # named for selective-remat policies (save_only_these_names):
        # saving the attention output skips the whole attention fwd in the
        # backward replay at (B,S,D)-bf16 cost per layer
        h = checkpoint_name(h, "attn_out")
        # NOTE: a Pallas-fused LayerScale+add+RMSNorm for this residual
        # chain was built and MEASURED SLOWER in-context (97.2 -> 101.3
        # ms/masked-batch, 2 reps each way): XLA already fuses the chain
        # into the adjacent GEMMs' epilogues, and a standalone elementwise
        # kernel breaks those fusions. The op is kept in ops/rmsnorm.py
        # (`_fused_ls_add_rms_norm`) with its parity test; see PERF.md.
        if self.init_values:
            h = LayerScale(self.init_values, dtype=self.dtype, name="ls1")(h)
        x = x + DropPath(self.drop_path, name="droppath1")(h, deterministic)
        h = Mlp(
            hidden_dim=int(d * self.mlp_ratio),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            act=self.mlp_act,
            quant=self.quant,
            name="mlp",
        )(_make_norm(self.norm_type, self.dtype, "norm2", self.norm_eps)(x))
        if self.init_values:
            h = LayerScale(self.init_values, dtype=self.dtype, name="ls2")(h)
        x = x + DropPath(self.drop_path, name="droppath2")(h, deterministic)
        return x


class CrossAttention(nn.Module):
    """Q from one stream, K/V from another (reference internvideo2.py:18-81).

    With `return_attn=True` the head-averaged attention probabilities are
    also returned (teacher pooling exposes them for attention-guided
    masking — internvl_clip_vision.py:55-86).
    """

    num_heads: int
    out_dim: Optional[int] = None
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self, x_q: jax.Array, x_k: jax.Array, x_v: jax.Array,
        return_attn: bool = False,
    ):
        b, nq, d = x_q.shape
        out_dim = self.out_dim or d
        head_dim = d // self.num_heads
        q = _dense(d, "q", self.dtype, self.param_dtype, use_bias=self.qkv_bias,
                   logical=("embed", "heads"))(x_q)
        k = _dense(d, "k", self.dtype, self.param_dtype, use_bias=self.qkv_bias,
                   logical=("embed", "heads"))(x_k)
        v = _dense(d, "v", self.dtype, self.param_dtype, use_bias=self.qkv_bias,
                   logical=("embed", "heads"))(x_v)
        q = q.reshape(b, nq, self.num_heads, head_dim)
        k = k.reshape(b, -1, self.num_heads, head_dim)
        v = v.reshape(b, -1, self.num_heads, head_dim)
        attn = None
        if return_attn:
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (head_dim ** -0.5)
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            attn = jnp.mean(probs, axis=1)  # (B, nq, nk)
        else:
            out = dot_product_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, nq, d)
        out = _dense(out_dim, "proj", self.dtype, self.param_dtype,
                     logical=("heads", "embed"))(out)
        return (out, attn) if return_attn else out


class AttentionPoolingBlock(nn.Module):
    """Mean-query attention pooling head (reference internvideo2.py:84-117).

    The query is the sequence mean; q/k/v go through separate LayerNorms
    (eps 1e-5), then one cross-attention produces a single pooled vector.
    """

    num_heads: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, return_attn: bool = False):
        x_q = jnp.mean(x, axis=1, keepdims=True)
        x_q = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm1_q")(x_q)
        x_k = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm1_k")(x)
        x_v = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm1_v")(x)
        out = CrossAttention(
            num_heads=self.num_heads,
            out_dim=self.out_dim,
            qkv_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            name="cross_attn",
        )(x_q, x_k, x_v, return_attn=return_attn)
        if return_attn:
            out, attn = out
            return out[:, 0], attn[:, 0]  # (B, out_dim), (B, nk)
        return out[:, 0]
