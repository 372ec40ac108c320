"""Encoder-backward second pass (VERDICT r4 item 10).

The dq/dkv kernels inherit the forward's block choice (1024x1024 at the
encoder shape). This sweeps bwd-ONLY block shapes and unroll caps at the
1B encoder attention shape (B=8, H=16, d=88, S=4096 — the ragged main
region of 4097) to find headroom the forward pass's tuning didn't give
the backward. Also re-times fwd for the session baseline.
"""

import itertools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from internvideo_tpu.ops import flash_attention as fa

B, S, H, D = 8, 4096, 16, 88
DT = jnp.bfloat16


def _sync(x):
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def timeit(fn, *args, n=10):
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    _sync(fn(*args)[0] if isinstance(out, tuple) else fn(*args))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0 - base) / (n - 1) * 1e3


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    scale = D ** -0.5
    # kernel-native layout (B,H,S,D)
    q = jax.random.normal(ks[0], (B, H, S, D), DT)
    k = jax.random.normal(ks[1], (B, H, S, D), DT)
    v = jax.random.normal(ks[2], (B, H, S, D), DT)
    do = jax.random.normal(ks[3], (B, H, S, D), DT)

    fwd = jax.jit(lambda q, k, v: fa._fwd(
        q, k, v, None, None, scale=scale, causal=False,
        block_q=1024, block_k=1024, interpret=False))
    t_f = timeit(fwd, q, k, v)
    out, lse = fwd(q, k, v)
    print(f"fwd 1024x1024: {t_f:.2f} ms")

    results = {}
    for bq, bk in itertools.product((512, 1024, 2048), (512, 1024, 2048)):
        if bq > S or bk > S:
            continue

        def bwd(q, k, v, out, lse, do, bq=bq, bk=bk):
            return fa._bwd(
                q, k, v, out, lse, do, None, None,
                scale=scale, causal=False, block_q=bq, block_k=bk,
                interpret=False)

        try:
            t = timeit(jax.jit(bwd), q, k, v, out, lse, do, n=6)
            results[(bq, bk)] = t
            print(f"bwd {bq}x{bk}: {t:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bwd {bq}x{bk}: FAIL {type(e).__name__} {str(e)[:90]}",
                  flush=True)

    best = min(results, key=results.get)
    print(f"best {best}: {results[best]:.2f} ms "
          f"(vs 1024x1024 {results.get((1024, 1024), float('nan')):.2f})")


if __name__ == "__main__":
    main()
