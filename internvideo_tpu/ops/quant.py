"""Low-precision matmuls: int8 (TPU-native) quantized linear layers.

Counterpart of the reference's float8 stack (xtuner/v1/float8/ — tensor-wise
and tile-wise fp8 GEMMs with dynamic scales, float8_handler.py:38-230).
TPU v5e/v5p MXUs accelerate int8×int8→int32, not fp8, so the TPU-native
"float8-class" path is dynamic int8: per-channel absmax weight scales +
per-row dynamic activation scales, both folded back after an int32
accumulation (exactly the reference's dynamic tensor-wise recipe, with int8
in place of e4m3).

`QuantDense` is a drop-in flax Dense: weights are stored in the param dtype
(master copy) and fake/real-quantized per call — weight-only mode keeps
activations in bf16, dynamic mode quantizes both sides.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quantize_int8(x: jax.Array, axis: int):
    """absmax int8 quantization along `axis`; returns (q, scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(
    x: jax.Array,  # (..., K) activations
    w_q: jax.Array,  # (K, N) int8 weights
    w_scale: jax.Array,  # (1, N) fp32 per-out-channel scales
    *,
    dynamic_activations: bool = True,
    out_dtype=jnp.float32,
    fused: str = "auto",  # "auto" | "pallas" | "xla" | "pallas_interpret"
) -> jax.Array:
    if dynamic_activations:
        from internvideo_tpu.ops import int8_gemm

        # "auto" routes to XLA, NOT the Pallas kernel: in-model, XLA
        # producer-fuses quantize_int8 into whatever computes x (gelu,
        # norms, rescales), so the "separate quant pass" only exists for
        # cold HBM inputs — measured on the bias+gelu+residual MLP stack
        # at encoder shapes: xla-i8 6.97 ms/layer vs pallas 7.50 vs dense
        # 8.46 (tools_r5/int8_fused_bench.py, PERF.md "Quantized GEMM" r5).
        # The kernel wins 1.6-1.9x isolated (cold x) — reach it with
        # fused="pallas" when the input has no fusable producer.
        if fused in ("pallas", "pallas_interpret"):
            # in-kernel activation quantization: no separate quant pass
            # over HBM (PERF.md "Quantized GEMM", the fused epilogue);
            # blocks from the measured policy (full-N whenever it fits)
            m = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
            blocks = int8_gemm.pick_blocks(m, *w_q.shape) or (512, 512)
            return int8_gemm.int8_matmul_fused(
                x, w_q, w_scale, out_dtype, *blocks,
                fused == "pallas_interpret",
            )
        x_q, x_scale = quantize_int8(x, axis=-1)
        acc = jax.lax.dot_general(
            x_q, w_q,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)
    # weight-only: dequantized weights ride the bf16 MXU
    w = (w_q.astype(jnp.float32) * w_scale).astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(out_dtype)


class QuantDense(nn.Module):
    features: int
    use_bias: bool = True
    dynamic_activations: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(self.kernel_init, ("embed", "mlp")),
            (k, self.features),
            self.param_dtype,
        )
        w_q, w_scale = quantize_int8(kernel, axis=0)
        # straight-through estimator: forward uses quantized weights,
        # gradient flows to the master copy
        w_deq = w_q.astype(jnp.float32) * w_scale
        kernel_ste = kernel + jax.lax.stop_gradient(
            w_deq.astype(kernel.dtype) - kernel
        )
        if self.dynamic_activations:
            x_q, x_scale = quantize_int8(x, axis=-1)
            x_deq = (x_q.astype(jnp.float32) * x_scale).astype(x.dtype)
            x_ste = x + jax.lax.stop_gradient(x_deq - x)
        else:
            x_ste = x
        y = jnp.dot(
            x_ste.astype(self.dtype), kernel_ste.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(nn.initializers.zeros, ("mlp",)),
                (self.features,),
                self.param_dtype,
            )
            y = y + bias
        return y.astype(self.dtype)

    def inference_weights(self, kernel):
        """Export path: real int8 weights + scales for serving."""
        return quantize_int8(kernel, axis=0)


class Int8Dense(nn.Module):
    """Serving-mode int8 linear: weights LIVE as int8 params + fp32 scales.

    The deploy counterpart of QuantDense (which fake-quantizes a bf16
    master copy for QAT): params are `kernel_q` (K, N) int8 and `scale`
    (1, N) fp32, produced from a trained checkpoint by
    `quantize_params_like`. Activations are dynamically quantized per row
    and the int8×int8→int32 product rides the MXU at 2× bf16 throughput
    (measured 1.54× end-to-end incl. quantize/rescale — PERF.md).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32  # bias dtype
    logical: tuple = ("embed", "mlp")

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            nn.with_logical_partitioning(
                nn.initializers.zeros_init(), self.logical
            ),
            (k, self.features),
            jnp.int8,
        )
        scale = self.param(
            "scale",
            # rank must match the (1, N) shape: dim 0 is the broadcast
            # singleton (unsharded), dim 1 follows the kernel's out axis
            nn.with_logical_partitioning(
                nn.initializers.ones_init(), (None, self.logical[1])
            ),
            (1, self.features),
            jnp.float32,
        )
        # out_dtype = compute dtype: the kernel's epilogue rescales in f32
        # and stores the narrow dtype directly — a f32 (M, N) output would
        # cost 2x the HBM temp footprint per projection (at B=16 encoder
        # shapes the f32 temps OOM'd 30 GB of HBM; the rescale math is f32
        # either way, only the store narrows)
        y = int8_matmul(
            x, kernel_q, scale, dynamic_activations=True,
            out_dtype=self.dtype,
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, (self.logical[1],)
                ),
                (self.features,),
                self.param_dtype,
            )
            y = y + bias
        return y.astype(self.dtype)


def quantize_params_like(abstract_int8_params, params):
    """Map a trained (bf16/fp32) param tree onto an int8 model's tree.

    For each `{kernel_q, scale}` pair in the int8 model's abstract tree,
    quantizes the source tree's `kernel` at the same path (per-out-channel
    absmax); all other leaves are copied (cast to the abstract dtype).
    """

    def walk(abstract, source):
        if isinstance(abstract, dict):
            out = {}
            qs = None  # quantize each kernel once for (kernel_q, scale)
            for key, sub in abstract.items():
                if key == "kernel_q" or (
                    key == "scale" and "kernel_q" in abstract
                ):
                    if qs is None:
                        qs = quantize_int8(
                            jnp.asarray(source["kernel"]), axis=0
                        )
                    out[key] = qs[0] if key == "kernel_q" else qs[1]
                else:
                    src = source[key]
                    out[key] = walk(sub, src)
            return out
        return jnp.asarray(source, dtype=abstract.dtype)

    return walk(abstract_int8_params, params)


# "int8_mix" serving mode: rows at/above this take the dynamic-int8 fused
# GEMM (prefill dispatches are >= 2048 tokens; decode batches are << this)
INT8_MIX_DYN_M = 1024


class Int8WoDense(nn.Module):
    """Weight-only int8 serving linear (decode path).

    Decode GEMVs are weight-stream bound: at batch≈8 the MXU is idle and
    the step time is params-bytes / HBM-bandwidth, so halving the bytes
    halves the step (measured 864 GB/s of int8 vs 732 GB/s of bf16 on the
    2B MLP stack — tools_r4/decode_profile2.py, PERF.md "Serving").
    Unlike Int8Dense (dynamic activation quant for int8×int8 MXU compute),
    activations stay bf16: the int8→bf16 convert fuses into the dot as an
    operand, and the per-out-channel scale is applied AFTER the GEMM so the
    weight never materializes in bf16.

    `dyn_m_threshold` (the "int8_mix" serving mode): at or above this many
    flattened rows the call switches to the dynamic-int8 fused GEMM — the
    SAME int8 params, but the activations absmax-quantize in VMEM and the
    dot rides the int8 MXU (394 TOPs vs ~197 bf16 on v5e). jit specializes
    on shapes, so prefill (M = B*S, compute-bound) takes the dynamic path
    while decode (M = B, weight-stream bound) keeps the exact weight-only
    math above — no phase flag reaches the module.
    """

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32  # bias dtype
    logical: tuple = ("embed", "mlp")
    dyn_m_threshold: Optional[int] = None  # None = always weight-only

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            nn.with_logical_partitioning(
                nn.initializers.zeros_init(), self.logical
            ),
            (k, self.features),
            jnp.int8,
        )
        scale = self.param(
            "scale",
            # rank must match the (1, N) shape: dim 0 is the broadcast
            # singleton (unsharded), dim 1 follows the kernel's out axis
            nn.with_logical_partitioning(
                nn.initializers.ones_init(), (None, self.logical[1])
            ),
            (1, self.features),
            jnp.float32,
        )
        m = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        if self.dyn_m_threshold is not None and m >= self.dyn_m_threshold:
            # narrow store (see Int8Dense): the kernel rescales in f32
            # internally; f32 (M, N) temps around un-remat-able custom
            # calls are what OOM'd the B=16 encoder
            y = int8_matmul(
                x, kernel_q, scale, dynamic_activations=True,
                out_dtype=self.dtype,
            )
        else:
            y = jnp.dot(
                x.astype(self.dtype), kernel_q.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ) * scale
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, (self.logical[1],)
                ),
                (self.features,),
                self.param_dtype,
            )
            y = y + bias
        return y.astype(self.dtype)
