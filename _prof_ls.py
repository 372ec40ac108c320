import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from internvideo_tpu.nn.transformer import Block

B, S, D, H = 8, 4097, 1408, 16
DT = jnp.bfloat16
x = jax.random.normal(jax.random.key(0), (B, S, D), DT)


def _sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    jax.device_get(jnp.sum(leaf.reshape(-1)[:1]))


def bench(name, blk):
    p = jax.jit(blk.init)(jax.random.key(1), x)
    f = jax.jit(lambda p, x: blk.apply(p, x))
    _sync(f(p, x))
    n = 20
    t0 = time.perf_counter(); _sync(f(p, x)); base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(p, x)
    _sync(out)
    print(f"{name:42s} {(time.perf_counter()-t0-base)/(n-1)*1e3:7.2f} ms")


kw = dict(num_heads=H, qkv_bias=True, dtype=DT, param_dtype=DT,
          attn_impl="pallas", mlp_act="gelu_tanh")
bench("block (full)", Block(**kw))
bench("block no LayerScale", Block(init_values=None, **kw))
bench("block no qk-norm", Block(qk_normalization=False, **kw))
bench("block neither", Block(init_values=None, qk_normalization=False, **kw))
