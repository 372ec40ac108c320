"""Sweep pages_per_block for the paged-decode kernel at the 2B serve shapes."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from internvideo_tpu.models.llm import init_paged_cache
from internvideo_tpu.models.presets import qwen3_2b_mla
from internvideo_tpu.ops.paged_decode import paged_mla_decode

def _sync(x):
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))

def timeit(fn, n=24):
    _sync(fn()); _sync(fn())
    t0 = time.perf_counter(); _sync(fn()); base = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0 - base) / (n - 1)

cfg = qwen3_2b_mla()
lb, lctx, lpage = 8, 2048, 64
L = cfg.num_layers
H, R, P = cfg.mla.num_heads, cfg.mla.kv_lora_rank, cfg.mla.qk_rope_head_dim
key = jax.random.key(0)
pages, tables = init_paged_cache(cfg, lb, lctx + 64, lpage, jnp.bfloat16)
q_lat = jax.random.normal(key, (lb, H, R), jnp.bfloat16)
q_pe = jax.random.normal(key, (lb, H, P), jnp.bfloat16)
seq = jnp.full((lb,), lctx, jnp.int32)
kv_bytes = lb * lctx * (R + P) * 2

for g in (11, 33, 4):
    @jax.jit
    def kern24(q_lat, q_pe, pages, tables, seq, g=g):
        return jnp.stack([
            paged_mla_decode(q_lat, q_pe, pages[i], tables, seq,
                             softmax_scale=cfg.mla.q_head_dim ** -0.5,
                             pages_per_block=g)
            for i in range(L)])
    t = timeit(lambda: kern24(q_lat, q_pe, pages, tables, seq))
    print(f"G={g:2d}  {t*1e3:7.3f} ms/24L  ({t/L*1e6:5.1f} us/layer, "
          f"{kv_bytes*L/t/1e9:4.0f} GB/s)", flush=True)
