import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from internvideo_tpu.ops.flash_attention import flash_attention

def sync(x): return float(jax.device_get(jnp.sum(x.reshape(-1)[:1])))
def timeit(fn, *args, iters=10):
    out = fn(*args); sync(out)
    t0 = time.perf_counter(); out = fn(*args); sync(out); base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters + 1): out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0 - base) / iters

B, S, H, D = 8, 4097, 16, 88
q = jnp.zeros((B, S, H, D), jnp.bfloat16); k = jnp.zeros((B, S, H, D), jnp.bfloat16); v = jnp.zeros((B, S, H, D), jnp.bfloat16)
f = jax.jit(lambda q,k,v: flash_attention(q,k,v))
t = timeit(f, q, k, v)
print(f"flash default blocks: {t*1e3:.2f} ms")
f = jax.jit(lambda q,k,v: flash_attention(q,k,v,block_q=2048,block_k=1024))
t = timeit(f, q, k, v)
print(f"flash 2048/1024: {t*1e3:.2f} ms")
