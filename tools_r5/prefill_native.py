"""Prefill layout experiment (VERDICT r4 item 6): kill the 4 transposes.

PERF.md "Serving roofline closed" names the remaining prefill-MFU gap as
the 4 (B,S,H,D)<->(B,H,S,D) layout transposes around the flash kernel at
d=192 (the r3 (B,S,H,D)-native KERNEL was measured-rejected at encoder
d=88; this instead keeps the kernel in (B,H,S,D) and asks XLA to PRODUCE
that layout directly: the q/k/v projections emit "...->bhsd" einsums and
the o-consumer contracts "bhsd,hde->bse", so the transposes fold into the
GEMMs' output/input layouts instead of standalone copy passes).

Variants at the 2B MLA prefill shape (B=8, S=2048, H=20, d_qk=192,
d_v=128, causal):
  A: current — bshd einsums + flash_attention wrapper (4 transposes)
  B: native  — bhsd einsums + _flash_attention direct (0 transposes)
Both include rope-like elementwise on the rope slice and the o-proj.
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from internvideo_tpu.ops.flash_attention import _flash_attention, flash_attention

B, S, H, E = 8, 2048, 20, 2560
DQK, DV, R = 192, 128, 512  # MLA latent rank 512 (2B preset)
DT = jnp.bfloat16


def _sync(x):
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def timeit(fn, *args, n=20):
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
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, S, E), DT)
    lat = jax.random.normal(ks[1], (B, S, R), DT)  # decompression input
    wq = jax.random.normal(ks[2], (E, H, DQK), DT) * 0.02
    wk = jax.random.normal(ks[3], (R, H, DQK), DT) * 0.02
    wv = jax.random.normal(ks[4], (R, H, DV), DT) * 0.02
    wo = jax.random.normal(ks[5], (H, DV, E), DT) * 0.02
    cos = jax.random.normal(ks[6], (S, 64), jnp.float32)
    scale = DQK ** -0.5

    @jax.jit
    def variant_a(x, lat):
        q = jnp.einsum("bse,ehd->bshd", x, wq)
        k = jnp.einsum("bsr,rhd->bshd", lat, wk)
        v = jnp.einsum("bsr,rhd->bshd", lat, wv)
        # rope-like elementwise on the trailing 64 lanes (cost parity)
        rope = jnp.concatenate(
            [jnp.ones((S, DQK - 64)), cos], -1
        ).astype(DT)[None, :, None, :]
        q = q * rope
        k = k * rope
        out = flash_attention(q, k, v, causal=True, softmax_scale=scale)
        return jnp.einsum("bshd,hde->bse", out, wo)

    @jax.jit
    def variant_b(x, lat):
        q = jnp.einsum("bse,ehd->bhsd", x, wq)
        k = jnp.einsum("bsr,rhd->bhsd", lat, wk)
        v = jnp.einsum("bsr,rhd->bhsd", lat, wv)
        rope = jnp.concatenate(
            [jnp.ones((S, DQK - 64)), cos], -1
        ).astype(DT)[None, None, :, :]
        q = q * rope
        k = k * rope
        out = _flash_attention(
            q, k, v, None, None, scale, True, 1024, 512, False, 0,
            None, 1, 0,
        )
        return jnp.einsum("bhsd,hde->bse", out, wo)

    a = timeit(variant_a, x, lat)
    b = timeit(variant_b, x, lat)
    print(f"A (bshd + wrapper transposes): {a:.2f} ms/layer")
    print(f"B (bhsd native einsums):       {b:.2f} ms/layer")
    print(f"delta: {a - b:+.2f} ms/layer ({(a - b) / a * 100:+.1f}%)")
    import numpy as np

    oa = jax.device_get(variant_a(x, lat)).astype(np.float32)
    ob = jax.device_get(variant_b(x, lat)).astype(np.float32)
    print("max abs diff:", float(abs(oa - ob).max()))


if __name__ == "__main__":
    main()
