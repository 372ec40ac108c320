"""On-chip A/B for the fused dynamic-int8 GEMM (ops/int8_gemm.py).

Shapes are the dense 1B encoder's (B=16, S=4097 → M=65552; hidden 1408):
qkv (K=1408, N=4224), MLP up (1408→5632), MLP down (5632→1408) — the three
GEMMs whose separate activation-quant passes cancelled the int8 MXU win in
the unfused path (PERF.md "Quantized GEMM": encoder int8 measured +3%).

Variants per shape:
  bf16    — plain jnp.dot (the dense baseline XLA runs at ~95% of peak)
  xla-i8  — ops/quant.int8_matmul fused="xla" (separate quant pass)
  pallas  — ops/int8_gemm.int8_matmul_fused (in-kernel quantization)
plus a block sweep on the pallas variant.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from internvideo_tpu.ops import int8_gemm
from internvideo_tpu.ops.quant import int8_matmul, quantize_int8

M = 16 * 4097
SHAPES = (("qkv", 1408, 4224), ("up", 1408, 5632), ("down", 5632, 1408))


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
        print(f"{name:5s} K={k} N={n}  bf16    {t:6.2f} ms "
              f"{flops/t/1e9:6.0f} TF", flush=True)

        xla = jax.jit(lambda a: int8_matmul(a, w_q, w_s, fused="xla"))
        t = timeit(xla, x)
        print(f"{name:5s} K={k} N={n}  xla-i8  {t:6.2f} ms "
              f"{flops/t/1e9:6.0f} TF", flush=True)

        # full-N blocks first (the winning policy — see int8_gemm.pick_blocks)
        for bm, bn in ((256, n), (512, n), (768, n), (1024, n),
                       (512, 512), (256, 512), (1024, 512)):
            fused = jax.jit(
                lambda a, bm=bm, bn=bn: int8_gemm.int8_matmul_fused(
                    a, w_q, w_s, jnp.float32, bm, bn, False
                )
            )
            try:
                t = timeit(fused, x)
            except Exception as e:  # noqa: BLE001 — sweep survives OOM
                print(f"{name:5s} K={k} N={n}  pallas {bm}x{bn}  "
                      f"FAILED {type(e).__name__}", flush=True)
                continue
            print(f"{name:5s} K={k} N={n}  pallas {bm}x{bn}  {t:6.2f} ms "
                  f"{flops/t/1e9:6.0f} TF", flush=True)


if __name__ == "__main__":
    main()
