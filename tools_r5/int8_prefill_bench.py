"""On-chip A/B for fused dynamic-int8 GEMMs at 2B-preset PREFILL shapes.

Prefill is compute-bound (67% MFU, PERF.md "Serving roofline closed"), so
unlike decode (weight-stream bound, int8_wo), the int8 lever here is MXU
rate: 394 TOPs int8 vs ~197 TF bf16. Shapes are the qwen3_2b_mla per-layer
GEMMs at one 16,384-token prefill dispatch (B=8 x S=2048):

  q_proj 2560->3840, kv_b 512->5120, out 2560->2560,
  gate/up 2560->8192, down 8192->2560

The big MLP GEMMs need full-N blocks past the 64 MB scoped-vmem request
(w dbuf alone is 42 MB) — this sweep probes a raised 100 MB limit (v5e has
128 MB physical) vs the blocked-N fallback.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from internvideo_tpu.ops import int8_gemm
from internvideo_tpu.ops.quant import int8_matmul, quantize_int8

M = 8 * 2048
SHAPES = (
    ("q_proj", 2560, 3840),
    ("kv_b", 512, 5120),
    ("out", 2560, 2560),
    ("gateup", 2560, 8192),
    ("down", 8192, 2560),
)
HI = 100 * 1024 * 1024


def _sync(x):
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def timeit(fn, *args, n=30):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    _sync(fn(*args))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0 - base) / (n - 1) * 1e3


def main():
    for name, k, n in SHAPES:
        x = jax.random.normal(jax.random.key(1), (M, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(2), (k, n), jnp.float32) * 0.05
        w_q, w_s = quantize_int8(w, axis=0)
        w_bf = (w_q.astype(jnp.float32) * w_s).astype(jnp.bfloat16)
        flops = 2 * M * k * n

        bf16 = jax.jit(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
        )
        t = timeit(bf16, x, w_bf)
        print(f"{name:7s} K={k} N={n}  bf16     {t:6.2f} ms "
              f"{flops/t/1e9:6.0f} TF", flush=True)

        xla = jax.jit(lambda a, w_q=w_q, w_s=w_s: int8_matmul(
            a, w_q, w_s, fused="xla"))
        t = timeit(xla, x)
        print(f"{name:7s} K={k} N={n}  xla-i8   {t:6.2f} ms "
              f"{flops/t/1e9:6.0f} TF", flush=True)

        cfgs = [(bm, n, HI) for bm in (128, 256, 512)]
        if k >= 4096:
            cfgs.append((512, 512, 64 * 1024 * 1024))
        for bm, bn, lim in cfgs:
            fused = jax.jit(
                lambda a, bm=bm, bn=bn, lim=lim, w_q=w_q, w_s=w_s:
                int8_gemm.int8_matmul_fused(
                    a, w_q, w_s, jnp.bfloat16, bm, bn, False, lim
                )
            )
            try:
                t = timeit(fused, x)
            except Exception as e:  # noqa: BLE001 — sweep survives OOM
                print(f"{name:7s} K={k} N={n}  pallas {bm}x{bn}  "
                      f"FAILED {type(e).__name__}", flush=True)
                continue
            print(f"{name:7s} K={k} N={n}  pallas {bm}x{bn}@{lim>>20}M "
                  f"{t:6.2f} ms {flops/t/1e9:6.0f} TF", flush=True)


if __name__ == "__main__":
    main()
