import time, functools
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl

def sync(x):
    if isinstance(x, (tuple, list)): x = x[0]
    return float(jax.device_get(jnp.sum(x.reshape(-1)[:1])))
def timeit(fn, *args, iters=8):
    out = fn(*args); sync(out)
    t0 = time.perf_counter(); out = fn(*args); sync(out); base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters + 1): out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0 - base) / iters

from internvideo_tpu.nn.transformer import Attention, Block, Mlp
B, S, D = 8, 4097, 1408
x = jnp.zeros((B, S, D), jnp.bfloat16)

blk = Block(num_heads=16, mlp_ratio=48/11, qk_normalization=True, init_values=1e-5,
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, attn_impl="pallas")
p = jax.jit(blk.init)(jax.random.key(0), x)
t = timeit(jax.jit(lambda p, x: blk.apply(p, x, True)), p, x, iters=5)
print(f"Block now: {t*1e3:.2f} ms (x40 = {t*40*1e3:.0f})")

# XLA rmsnorm at qk shape vs pallas fused (norm cost probe)
w = jnp.ones((D,), jnp.float32)
from internvideo_tpu.ops.rmsnorm import rms_norm, fused_add_rms_norm
f1 = jax.jit(lambda x: rms_norm(x, w))
t = timeit(f1, x); print(f"xla rmsnorm (B,S,D): {t*1e3:.2f} ms")
zero = jnp.zeros_like(x)
f2 = jax.jit(lambda x: fused_add_rms_norm(x, zero, w)[0])
t = timeit(f2, x); print(f"pallas fused rmsnorm: {t*1e3:.2f} ms")

# gelu variants at mlp hidden shape
h = jnp.zeros((B, S, 6144), jnp.bfloat16)
t = timeit(jax.jit(lambda h: jax.nn.gelu(h, approximate=False)), h); print(f"gelu erf: {t*1e3:.2f} ms")
t = timeit(jax.jit(lambda h: jax.nn.gelu(h, approximate=True)), h); print(f"gelu tanh: {t*1e3:.2f} ms")
