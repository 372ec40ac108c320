"""RMSNorm — fused Pallas kernel + pure-XLA reference.

Replaces the reference's flash-attn `DropoutAddRMSNorm` (residual-add fused
into the norm, InternVideo2/single_modality/models/internvideo2.py:15,378) and
the vendored Triton RMSNorm (InternVideo3_sft/xtuner/v1/ops/rms_norm/gpu.py).

On TPU, XLA already fuses `x * rsqrt(mean(x^2))` chains into surrounding ops
well, so the pure-jnp path is the default; the Pallas kernel exists for the
residual-fused variant on the hot encoder path and is benchmarked against the
XLA path (see bench.py) before being enabled.

All variance math is fp32 regardless of input dtype, matching the reference
(internvideo2.py:125-130 casts to float32 before pow/mean).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rms_norm(
    x: jax.Array,
    weight: jax.Array,
    *,
    eps: float = 1e-6,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """Pure-XLA RMSNorm; optionally adds `residual` into x first (prenorm).

    Returns normalized output (and relies on the caller to keep the
    pre-norm sum if it needs the residual stream).
    """
    if residual is not None:
        x = x + residual
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (weight * normed.astype(x.dtype)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas fused add + RMSNorm returning both the norm and the updated residual
# ---------------------------------------------------------------------------


def _fused_kernel(x_ref, res_ref, w_ref, y_ref, newres_ref, *, eps: float):
    xs = x_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    var = jnp.mean(jnp.square(xs), axis=-1, keepdims=True)
    normed = xs * jax.lax.rsqrt(var + eps)
    y_ref[:] = (normed * w_ref[:].astype(jnp.float32)).astype(y_ref.dtype)
    newres_ref[:] = xs.astype(newres_ref.dtype)


def fused_add_rms_norm(
    x: jax.Array,  # (..., D)
    residual: jax.Array,  # (..., D)
    weight: jax.Array,  # (D,)
    *,
    eps: float = 1e-6,
    block_rows: int = 512,
    interpret: bool = False,
):
    """Fused (x + residual) -> RMSNorm, returning (normed, x + residual).

    The residual stream is carried in fp32 by the caller (the reference keeps
    a prenorm fp32 residual the same way via DropoutAddRMSNorm(prenorm=True)).
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    r2 = residual.reshape(rows, d)
    block_rows = min(block_rows, rows)
    grid = (pl.cdiv(rows, block_rows),)

    y, newres = pl.pallas_call(
        functools.partial(_fused_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((rows, d), residual.dtype),
        ],
        interpret=interpret,
    )(x2, r2, weight)
    return y.reshape(orig_shape), newres.reshape(orig_shape)


# ---------------------------------------------------------------------------
# Fused LayerScale + residual-add + RMSNorm (the encoder block's elementwise
# chain between attention/MLP and the next norm)
# ---------------------------------------------------------------------------
#
# Built to replace the XLA chain `x + (h_f32 * gamma).astype(bf16)` ->
# rms_norm, whose removal the in-context ablation priced at ~5 ms per
# masked-pretrain batch (tools_r3/masked_ablate.py "norms+ls"). MEASURED
# REJECTION: wiring this kernel into the encoder Block ran 97.2 -> 101.3
# ms/masked-batch (2 reps each way, same process) — XLA already fuses the
# chain into the adjacent GEMM epilogues, and a standalone elementwise
# pass breaks those fusions, costing more than the passes it saves. Kept
# (with its parity test) as a measured artifact and for potential future
# block-level fusion where it can absorb a GEMM. The kernel writes the
# same cast chain the Block composes (fp32 LayerScale -> bf16 add -> fp32 variance -> bf16 normed ->
# fp32 weight mult -> bf16); bitwise parity with the unfused path is not
# attainable at bf16 because XLA's excess-precision elision skips
# intermediate bf16 roundings when it fuses the unfused chain — measured
# divergence is 1-2 bf16 ulps in the forward, ~1.5% relative in grads
# (f32 parity is ~1e-7). Backward VJPs the unfused composition.


def _fused_ls_kernel(h_ref, res_ref, g_ref, w_ref, y_ref, newres_ref,
                     *, eps: float):
    ls = (h_ref[:].astype(jnp.float32) * g_ref[:].astype(jnp.float32)
          ).astype(h_ref.dtype)
    xs = res_ref[:] + ls
    xf = xs.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(xs.dtype)
    y_ref[:] = (w_ref[:].astype(jnp.float32) * normed.astype(jnp.float32)
                ).astype(y_ref.dtype)
    newres_ref[:] = xs


def _ls_add_norm_ref(h, residual, gamma, weight, eps):
    ls = (h.astype(jnp.float32) * gamma.astype(jnp.float32)).astype(h.dtype)
    xs = residual + ls
    return rms_norm(xs, weight, eps=eps), xs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_ls_add_rms_norm(h, residual, gamma, weight, eps, interpret):
    orig_shape = h.shape
    d = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    h2 = h.reshape(rows, d)
    r2 = residual.reshape(rows, d)
    block_rows = min(512, rows)
    y, newres = pl.pallas_call(
        functools.partial(_fused_ls_kernel, eps=eps),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), h.dtype),
            jax.ShapeDtypeStruct((rows, d), residual.dtype),
        ],
        interpret=interpret,
    )(h2, r2, gamma.reshape(1, d), weight.reshape(1, d))
    return y.reshape(orig_shape), newres.reshape(orig_shape)


def _fused_ls_fwd(h, residual, gamma, weight, eps, interpret):
    out = _fused_ls_add_rms_norm(h, residual, gamma, weight, eps, interpret)
    return out, (h, residual, gamma, weight)


def _fused_ls_bwd(eps, interpret, res, g):
    h, residual, gamma, weight = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: _ls_add_norm_ref(a, b, c, d, eps),
        h, residual, gamma, weight,
    )
    return vjp(g)


_fused_ls_add_rms_norm.defvjp(_fused_ls_fwd, _fused_ls_bwd)
