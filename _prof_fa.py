import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from internvideo_tpu.ops import dot_product_attention

B, S, D, H = 8, 4097, 1408, 16
DH = D // H
key = jax.random.key(0)
q = jax.random.normal(key, (B, S, H, DH), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (B, S, H, DH), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (B, S, H, DH), jnp.bfloat16)


def _sync(out):
    jax.device_get(jnp.sum(out.reshape(-1)[:1]))


f = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, impl="pallas"))
_sync(f(q, k, v))
for trial in range(3):
    n = 20
    t0 = time.perf_counter()
    out = f(q, k, v)
    _sync(out)
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(q, k, v)
    _sync(out)
    dt = (time.perf_counter() - t0 - base) / (n - 1) * 1e3
    print(f"trial {trial}: {dt:.2f} ms")
