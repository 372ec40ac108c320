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
