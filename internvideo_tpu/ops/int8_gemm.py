"""Fused dynamic-int8 GEMM: activation quantization INSIDE the kernel (r5).

Closes the PERF.md "Quantized GEMM" future-work item. The XLA dynamic-int8
path (`ops/quant.int8_matmul`) pays a separate quantization pass per GEMM —
an absmax read of the bf16 activations, an int8 write, and an int8 re-read
by the dot — ~1 GB/layer of extra activation traffic on the dense encoder,
which almost exactly cancelled the int8 MXU win there (+3% end to end,
PERF.md "Quantized GEMM"). This kernel quantizes in VMEM instead: each
(bm, K) activation block is absmax-scaled to int8 ONCE per m-row of the
grid (n is the inner dimension, so the int8 block and its scales persist in
scratch across all n-steps), the only HBM traffic is the bf16 activations a
plain dense GEMM would read anyway, and the dot rides the int8 MXU
(394 TOPs measured-peak-class vs ~197 bf16 on v5e).

Numerics match `ops/quant.quantize_int8` exactly: per-row absmax over the
FULL K axis (K is not blocked), round-to-nearest-even, clip to ±127, f32
rescale by x_scale * w_scale after the int32 accumulation. The backward is
the same straight-through gradient the unfused path induces:
dx = (g * w_scale) @ dequant(w_q).T; the int8 weights take no gradient.

Block policy (measured, tools_r5/int8_fused_bench.py + PERF.md "Quantized
GEMM" r5 update): **bn must be the FULL N** whenever the blocks fit VMEM —
Mosaic does NOT elide re-fetching the (bm, K) activation block across
n-steps whose m index is unchanged, so any bn < N re-pays the activation
HBM traffic per n-step and hands the win back (down-proj 65552x5632x1408:
3.26 ms at bn=N vs 4.78 ms at bn=512 vs 5.41 ms unfused-XLA vs 5.34 ms
bf16). With full-N blocks the kernel runs 317-371 TF-equivalent on the
dense 1B encoder GEMM shapes — 80-94% of the 394 TOPs int8 peak, 1.6-1.9x
the bf16 GEMM, and 1.15-1.65x the unfused XLA int8 path. Blocked-N shapes
are only worth dispatching at large K (>= 4096), where the unfused quant
pass costs more than the re-fetches.

Counterpart of the reference's tile-wise fp8 GEMM epilogues
(InternVideo3_sft/xtuner/v1/float8/float8_handler.py:38-230) on hardware
whose quantized matrix unit is int8, not fp8 (see PERF.md "fp8: the
measured story on this hardware").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One (bm, K) bf16 block double-buffered + its int8 scratch + (K, bn) int8
# weight block double-buffered + f32 out block: ~20 MB at K=5632 — over the
# 16 MB scoped-vmem default, which is a compiler default and not a hardware
# limit (v5e has 128 MB; same pattern as the small-S attention kernels).
# 100 MB measured-safe across the 2B prefill shapes incl. the ~96 MB
# gateup 512x8192 full-N config (tools_r5/int8_prefill_bench.py).
_VMEM_LIMIT = 100 * 1024 * 1024


def _params(vmem_limit: int) -> pltpu.CompilerParams:
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=vmem_limit,
    )
# beyond this K the activation block + scratch stops fitting the budget;
# callers fall back to the unfused path (encoder K is 1408/5632)
_MAX_K = 8192


def _kernel(x_ref, wq_ref, ws_ref, out_ref, xq_ref, xs_ref, *, m_total, bm):
    # Quantize this m-block once; scratch persists across the inner n-steps
    # (TPU grids run sequentially) and Mosaic skips re-fetching x_ref while
    # its block index is unchanged. program_id is read OUTSIDE pl.when —
    # inside the cond body it has no interpret-mode binding.
    pid_m = pl.program_id(0)

    @pl.when(pl.program_id(1) == 0)
    def _quantize():
        xf = x_ref[:].astype(jnp.float32)
        if m_total % bm:
            # the last m-block reads past the end of x: zero the overhang
            # rows so a garbage amax (worst case NaN) can't poison the
            # whole block's scales — the overhang's outputs are dropped by
            # the masked store anyway
            rows = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0)
            xf = jnp.where(rows + pid_m * bm < m_total, xf, 0.0)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        xq_ref[:] = jnp.clip(jnp.round(xf / scale), -127, 127).astype(
            jnp.int8
        )
        xs_ref[:] = scale

    acc = jax.lax.dot_general(
        xq_ref[:],
        wq_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(
        out_ref.dtype
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def int8_matmul_fused(
    x: jax.Array,  # (..., K) bf16/f32 activations
    w_q: jax.Array,  # (K, N) int8 weights
    w_scale: jax.Array,  # (1, N) or (N,) f32 per-out-channel scales
    out_dtype=jnp.float32,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = False,
    vmem_limit: int = _VMEM_LIMIT,
):
    return _int8_matmul_fused(
        x, w_q, w_scale, out_dtype, block_m, block_n, interpret, vmem_limit
    )


def _int8_matmul_fused(
    x, w_q, w_scale, out_dtype, block_m, block_n, interpret,
    vmem_limit=_VMEM_LIMIT,
):
    k, n = w_q.shape
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k)
    ws = w_scale.reshape(1, n).astype(jnp.float32)
    # clamp the block to M but keep it sublane-aligned (16 for bf16): the
    # kernel's overhang masking covers bm > m
    bm = min(block_m, max(16, ((m + 15) // 16) * 16))
    grid = (pl.cdiv(m, bm), pl.cdiv(n, block_n))
    out = pl.pallas_call(
        functools.partial(_kernel, m_total=m, bm=bm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        compiler_params=_params(vmem_limit),
        interpret=interpret,
    )(x2, w_q, ws)
    return out.reshape(*lead, n)


def _fused_fwd(
    x, w_q, w_scale, out_dtype, block_m, block_n, interpret, vmem_limit
):
    out = _int8_matmul_fused(
        x, w_q, w_scale, out_dtype, block_m, block_n, interpret, vmem_limit
    )
    return out, (jnp.zeros((0,), x.dtype), w_q, w_scale)


def _fused_bwd(out_dtype, block_m, block_n, interpret, vmem_limit, res, g):
    del out_dtype, block_m, block_n, interpret, vmem_limit
    x_proto, w_q, w_scale = res
    x_dtype = x_proto.dtype
    # straight-through wrt x (same gradient the unfused int8_matmul's
    # dequant-composition induces); int8 weights take float0 cotangents
    gs = (g.astype(jnp.float32) * w_scale.reshape(1, -1)).astype(
        jnp.bfloat16
    )
    dx = jnp.dot(
        gs, w_q.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    ).astype(x_dtype)
    return (
        dx,
        np.zeros(w_q.shape, dtype=jax.dtypes.float0),
        jnp.zeros_like(w_scale),
    )


int8_matmul_fused.defvjp(_fused_fwd, _fused_bwd)


def _vmem_block_bytes(bm: int, k: int, bn: int) -> int:
    # double-buffered bf16 x block + int8 scratch + double-buffered int8
    # w block + double-buffered f32 out block (scale blocks are noise)
    return (2 * bm * k * 2) + bm * k + (2 * k * bn) + (2 * bm * bn * 4)


# 90 MB keeps headroom under the 100 MB scoped-vmem request: the estimate
# above measured accurate to ~±15% (1024x512 at K=5632, est. 56 MB, OOMed
# under the old 64 MB request; every 2B-prefill full-N config up to est.
# ~96 MB ran at the 100 MB request — tools_r5/int8_prefill_bench.py)
_VMEM_BUDGET = 90 * 1024 * 1024


def pick_blocks(m: int, k: int, n: int):
    """Measured block policy; returns (bm, bn) or None for 'use XLA'.

    Full-N blocks whenever they fit (see module docstring: bn < N re-pays
    the activation fetch per n-step); bm=512 measured best-or-tied across
    the encoder shapes (354/358/317 TF vs 334-371 for 256/768). Blocked-N
    fallback only at K >= 4096 where it still beat the unfused path
    (down-proj 4.78 vs 5.41 ms).
    """
    for bm in (512, 256, 128):
        if bm > max(8, m):
            continue
        if _vmem_block_bytes(min(bm, m), k, n) <= _VMEM_BUDGET:
            return bm, n
    if k >= 4096 and _vmem_block_bytes(512, k, 512) <= _VMEM_BUDGET:
        return 512, 512
    return None


def fused_eligible(x: jax.Array, w_q: jax.Array) -> bool:
    """Shapes the fused kernel handles well (falls back to XLA otherwise).

    K must be lane-aligned (a non-multiple-of-128 K block would read
    Mosaic's lane padding into the absmax) and small enough that the
    (bm, K) bf16 + int8 blocks fit the VMEM budget; tiny-M dispatches
    aren't worth a custom kernel launch over XLA's fused path.
    """
    k, n = w_q.shape
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    return (
        k % 128 == 0
        and k <= _MAX_K
        and m >= 256
        and x.dtype in (jnp.bfloat16, jnp.float32)
        and pick_blocks(m, k, n) is not None
    )
