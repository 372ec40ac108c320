"""Where does the fused-int8 e2e win go? MLP-stack diagnostic at B=12.

Chain per 'layer': x -> fc1(+bias) -> gelu_tanh -> fc2(+bias) -> +x.
8 chained layers to amortize dispatch; variants: dense bf16, int8 XLA
(unfused quant), int8 pallas (fused quant, bf16 out).
"""
import functools, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from internvideo_tpu.ops import int8_gemm
from internvideo_tpu.ops.quant import int8_matmul, quantize_int8

M = 12 * 4097
D, H = 1408, 6144
L = 8

def _sync(x):
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))

def timeit(fn, *args, n=20):
    out = fn(*args); _sync(out)
    t0 = time.perf_counter(); _sync(fn(*args))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0 - base) / (n - 1) * 1e3

x = jax.random.normal(jax.random.key(0), (M, D), jnp.bfloat16)
w1 = jax.random.normal(jax.random.key(1), (D, H), jnp.float32) * 0.05
w2 = jax.random.normal(jax.random.key(2), (H, D), jnp.float32) * 0.05
b1 = jnp.zeros((H,), jnp.bfloat16)
b2 = jnp.zeros((D,), jnp.bfloat16)
w1q, w1s = quantize_int8(w1, axis=0)
w2q, w2s = quantize_int8(w2, axis=0)
w1b = (w1q.astype(jnp.float32) * w1s).astype(jnp.bfloat16)
w2b = (w2q.astype(jnp.float32) * w2s).astype(jnp.bfloat16)

def gelu(v):
    return jax.nn.gelu(v, approximate=True)

@jax.jit
def dense_stack(x):
    for _ in range(L):
        h = gelu(jnp.dot(x, w1b, preferred_element_type=jnp.float32).astype(jnp.bfloat16) + b1)
        x = x + (jnp.dot(h, w2b, preferred_element_type=jnp.float32).astype(jnp.bfloat16) + b2)
    return x

@jax.jit
def xla_stack(x):
    for _ in range(L):
        h = gelu(int8_matmul(x, w1q, w1s, fused="xla", out_dtype=jnp.bfloat16) + b1)
        x = x + (int8_matmul(h, w2q, w2s, fused="xla", out_dtype=jnp.bfloat16) + b2)
    return x

@jax.jit
def pallas_stack(x):
    for _ in range(L):
        h = gelu(int8_gemm.int8_matmul_fused(x, w1q, w1s, jnp.bfloat16, 512, H, False) + b1)
        x = x + (int8_gemm.int8_matmul_fused(h, w2q, w2s, jnp.bfloat16, 512, D, False) + b2)
    return x

for name, fn in (("dense", dense_stack), ("xla-i8", xla_stack),
                 ("pallas", pallas_stack)):
    t = timeit(fn, x)
    fl = 2 * M * D * H * 2 * L
    print(f"{name:7s} {t:7.2f} ms  {t/L:6.2f} ms/layer  {fl/t/1e9:6.0f} TF",
          flush=True)
