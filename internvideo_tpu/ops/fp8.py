"""float8 (e4m3) quantized matmuls with tensor- and tile-wise scaling.

Counterpart of the reference's float8 stack (InternVideo3_sft/xtuner/v1/
float8/: float8_handler.py:38-230 FSDP all-gather hooks with precomputed
dynamic scales, tensor-wise + tile-wise Triton GEMMs). TPU restructuring:

  * XLA's native fp8 dot (`preferred_element_type=f32`) replaces the Triton
    kernels; on fp8-MXU TPUs (v6e+) this hits the doubled-rate path, on
    older chips XLA falls back to bf16 compute with the same numerics —
    so the module is a portable drop-in
  * the reference's FSDP all-gather hook exists because IT gathers fp8
    shards by hand; under GSPMD the gather is compiler-inserted, so the
    equivalent is simply quantizing inside the jitted step (scales are
    recomputed per step — "dynamic scaling")
  * backward stays bf16/f32 (the e5m2-gradient variant is a numerics
    trade the reference gates behind a flag; correctness first here)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

E4M3_MAX = 448.0


def quantize_fp8(
    x: jax.Array, *, axis: Optional[int] = None, tile: Optional[int] = None
):
    """-> (q: e4m3, scale: f32). Modes:
    axis=None, tile=None : tensor-wise scale
    axis=k               : per-slice scale along axis k (rowwise/colwise)
    tile=t (with axis)   : tile-wise — scale per contiguous t-chunk of axis
    """
    xf = x.astype(jnp.float32)
    if axis is None:
        amax = jnp.max(jnp.abs(xf))
        scale = jnp.maximum(amax, 1e-12) / E4M3_MAX
        q = (xf / scale).astype(jnp.float8_e4m3fn)
        return q, scale
    axis = axis % x.ndim
    if tile is None:
        amax = jnp.max(
            jnp.abs(xf), axis=tuple(i for i in range(x.ndim) if i != axis),
            keepdims=True,
        )
        scale = jnp.maximum(amax, 1e-12) / E4M3_MAX
        return (xf / scale).astype(jnp.float8_e4m3fn), scale
    # tile-wise along `axis` (float8 tile GEMM equivalent)
    n = x.shape[axis]
    assert n % tile == 0, f"axis {axis} size {n} not divisible by tile {tile}"
    shape = list(x.shape)
    shape[axis : axis + 1] = [n // tile, tile]
    xt = xf.reshape(shape)
    red = tuple(
        i for i in range(xt.ndim) if i != axis  # keep the tile-count dim
    )
    amax = jnp.max(jnp.abs(xt), axis=red, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / E4M3_MAX
    q = (xt / scale).astype(jnp.float8_e4m3fn).reshape(x.shape)
    return q, scale  # scale keeps the tiled layout for dequant


def fp8_matmul(
    x: jax.Array,  # (..., K)
    w_q: jax.Array,  # (K, N) e4m3
    w_scale: jax.Array,  # () or (1, N) f32
) -> jax.Array:
    """Quantize activations ROW-wise, fp8×fp8 dot, rescale to f32.

    Per-row activation scales (the reference Triton recipe): one outlier
    token must not collapse every other row's quantization range the way
    a tensor-wise amax would."""
    x2 = x.reshape(-1, x.shape[-1])
    xq, xs = quantize_fp8(x2, axis=0)  # (M, 1) scales
    out = jax.lax.dot_general(
        xq, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out * xs * jnp.reshape(w_scale, (1, -1) if w_scale.ndim else ())
    return out.reshape(x.shape[:-1] + (w_q.shape[-1],))


@jax.custom_vjp
def _fp8_dense_op(x, w):
    xq, xs = quantize_fp8(x.reshape(-1, x.shape[-1]), axis=0)  # rowwise
    wq, ws = quantize_fp8(w, axis=1)  # colwise weight scales
    out = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * xs * ws.reshape(1, -1)
    return out.reshape(x.shape[:-1] + (w.shape[-1],))


def _fp8_dense_fwd(x, w):
    return _fp8_dense_op(x, w), (x, w)


def _fp8_dense_bwd(res, g):
    x, w = res
    gf = g.astype(jnp.float32)
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    g2 = gf.reshape(-1, gf.shape[-1])
    dx = (g2 @ w.astype(jnp.float32).T).reshape(x.shape).astype(x.dtype)
    dw = (x2.T @ g2).astype(w.dtype)
    return dx, dw


_fp8_dense_op.defvjp(_fp8_dense_fwd, _fp8_dense_bwd)


class Fp8Dense(nn.Module):
    """Dense layer running its forward GEMM in e4m3 with dynamic scaling.

    backward="precise" keeps the backward GEMMs in full precision;
    backward="fp8" runs them in fp8 too (e5m2 gradients x e4m3
    weights/activations) — the reference's full-fp8 training mode
    (float8_handler.py:38-230). Master weights stay in param_dtype — the
    GSPMD analogue of the reference's fp8 FSDP parameters whose scales
    are recomputed before every all-gather."""

    features: int
    use_bias: bool = True
    backward: str = "precise"  # "precise" | "fp8"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "kernel",
            nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", "mlp")
            ),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        op = _fp8_dense_op if self.backward == "precise" else \
            _fp8_dense_op_full
        y = op(x, w).astype(self.dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, ("mlp",)
                ),
                (self.features,),
                self.param_dtype,
            )
            y = y + b.astype(self.dtype)
        return y


# ---------------------------------------------------------------------------
# fp8-bytes FSDP gather (float8_handler.py:38-230 analog)
# ---------------------------------------------------------------------------
#
# The reference's float8 handler precomputes dynamic scales so FSDP
# all-gathers move fp8 bytes instead of bf16 — a comm-bytes halving that
# applies even on hardware without an fp8 MXU (v5e). GSPMD analog: the
# master weight stays bf16/f32 sharded over fsdp; inside the step it is
# quantized SHARDED (per-output-column scales with a tiny cross-shard amax
# all-reduce), the fp8 tensor is explicitly constrained replicated — so the
# compiler-inserted all-gather moves 1 byte/element — and the dequant to
# compute dtype runs post-gather. The gradient is straight-through to the
# master weight (the reference semantics: the optimizer sees full-precision
# grads; quantization is a forward-only projection).
# tests/test_fp8.py::test_fp8_fsdp_gather_moves_fp8_bytes pins the lowered
# HLO: the all-gather operand dtype is f8e4m3.


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _fp8_roundtrip_replicated(w, logical):
    """w (sharded over fsdp) -> dequantized w, replicated, with the
    all-gather carrying e4m3 bytes. Straight-through gradient.

    `logical`: the weight's logical axes — the fp8 tensor is first PINNED
    to the same (sharded) layout and only then constrained replicated, so
    the reshard (the all-gather) lands exactly on the 1-byte tensor. With
    only the replicated constraint, the partitioner propagates replication
    backward through the elementwise quantize and gathers the f32 master
    weight instead (observed on the 8-dev lowering)."""
    from internvideo_tpu.core.mesh import constrain

    wf = w.astype(jnp.float32)
    # per-output-column scale: amax over the (fsdp-sharded) input axis is a
    # partial reduce — GSPMD inserts a (1, N) f32 all-reduce, negligible
    # next to the gather it shrinks
    amax = jnp.max(jnp.abs(wf), axis=tuple(range(w.ndim - 1)),
                   keepdims=True)
    scale = jax.lax.stop_gradient(jnp.maximum(amax, 1e-12) / E4M3_MAX)
    q = (wf / scale).astype(jnp.float8_e4m3fn)
    # bitcast to u8 around the reshard: backends without fp8 collectives
    # (XLA:CPU promotes an f8 all-gather to f16, observed on the 8-dev
    # lowering) still gather exactly 1 byte/element this way
    qb = jax.lax.bitcast_convert_type(q, jnp.uint8)
    qb = constrain(qb, tuple(logical))  # quantize runs sharded
    qb = constrain(qb, tuple(None for _ in range(w.ndim)))  # 1-byte gather
    q = jax.lax.bitcast_convert_type(qb, jnp.float8_e4m3fn)
    return q.astype(jnp.float32) * scale


def _fp8_rt_fwd(w, logical):
    return _fp8_roundtrip_replicated(w, logical), None


def _fp8_rt_bwd(logical, _, g):
    return (g,)  # straight-through: master weight takes the full gradient


_fp8_roundtrip_replicated.defvjp(_fp8_rt_fwd, _fp8_rt_bwd)


def fp8_gathered_param(
    w: jax.Array, dtype=jnp.bfloat16, logical=("embed", "mlp")
) -> jax.Array:
    """FSDP-sharded master weight -> replicated compute weight where the
    gather moved fp8 bytes. Use in place of a raw kernel read inside
    fsdp-sharded layers; no-op semantics outside a mesh."""
    return _fp8_roundtrip_replicated(w, tuple(logical)).astype(dtype)


class Fp8GatherDense(nn.Module):
    """Dense whose fsdp-sharded kernel is all-gathered as fp8+scale and
    dequantized to bf16 post-gather (compute stays bf16 — the right
    datapath on chips without fp8 MXU; the win is the halved collective).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    logical: tuple = ("embed", "mlp")

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "kernel",
            nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), self.logical
            ),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        y = x.astype(self.dtype) @ fp8_gathered_param(w, self.dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, (self.logical[-1],)
                ),
                (self.features,),
                self.param_dtype,
            )
            y = y + b.astype(self.dtype)
        return y


# ---------------------------------------------------------------------------
# fp8 backward (e5m2 gradients) — full fp8 training
# ---------------------------------------------------------------------------
#
# The reference's float8 stack trains fwd AND bwd in fp8
# (float8_handler.py:38-230); the standard recipe keeps weights/activations
# in e4m3 (more mantissa) and gradients in e5m2 (more range). Both backward
# GEMMs (dgrad = g @ W^T, wgrad = x^T @ g) run with dynamically scaled fp8
# operands; scale math stays f32.

E5M2_MAX = 57344.0


def quantize_fp8_e5m2(x: jax.Array):
    """Tensor-wise e5m2 quantization -> (q, scale). Gradients only."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(amax, 1e-12) / E5M2_MAX
    return (xf / scale).astype(jnp.float8_e5m2), scale


@jax.custom_vjp
def _fp8_dense_op_full(x, w):
    return _fp8_dense_op(x, w)


def _fp8_full_fwd(x, w):
    return _fp8_dense_op(x, w), (x, w)


def _fp8_full_bwd(res, g):
    x, w = res
    k = x.shape[-1]
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, k)
    # tensor-wise scales in the backward on purpose: wgrad contracts over
    # the row axis, so per-row scales would not commute out of the dot
    # (they'd need to multiply INSIDE the contraction)
    gq, gs = quantize_fp8_e5m2(g2)
    wq, ws = quantize_fp8(w)          # tensor-wise e4m3
    xq, xs = quantize_fp8(x2)
    # dgrad: (M, N) @ (N, K) — contract over out-features
    dx = (jax.lax.dot_general(
        gq, wq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (gs * ws)).reshape(x.shape).astype(x.dtype)
    # wgrad: (K, M) @ (M, N) — contract over rows
    dw = (jax.lax.dot_general(
        xq, gq, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (xs * gs)).astype(w.dtype)
    return dx, dw


_fp8_dense_op_full.defvjp(_fp8_full_fwd, _fp8_full_bwd)
