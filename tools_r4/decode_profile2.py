"""Layer-level decomposition of the 2B decode step (follow-up to
decode_profile.py: the ~2.3 ms gap is inside the 24 layers; price the MLP
GEMV streaming, the MLA projections, and the Pallas paged kernel alone)."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from internvideo_tpu.models.llm import MLATransformer, init_paged_cache  # noqa: E402
from internvideo_tpu.models.presets import qwen3_2b_mla  # noqa: E402
from internvideo_tpu.ops.paged_decode import paged_mla_decode  # noqa: E402


def _sync(x):
    x = jax.tree.leaves(x)[0]
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def timeit(fn, n=24):
    _sync(fn()); _sync(fn())
    t0 = time.perf_counter(); _sync(fn())
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0 - base) / (n - 1)


def main():
    cfg = qwen3_2b_mla()
    lb, lctx, lpage = 8, 2048, 64
    key = jax.random.key(0)
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    # (a) 24 stacked SwiGLU MLPs on an (8, D) activation: pure weight
    # streaming of 3.02 GB — what do XLA GEMVs actually achieve?
    wg = jax.random.normal(key, (L, D, F), jnp.bfloat16) * 0.02
    wu = jax.random.normal(key, (L, D, F), jnp.bfloat16) * 0.02
    wd = jax.random.normal(key, (L, F, D), jnp.bfloat16) * 0.02
    x = jnp.ones((lb, D), jnp.bfloat16)

    @jax.jit
    def mlp24(x, wg, wu, wd):
        def body(x, w):
            g, u, d = w
            return (x + (jax.nn.silu(x @ g) * (x @ u)) @ d), None
        x, _ = jax.lax.scan(body, x, (wg, wu, wd))
        return x

    nbytes = wg.nbytes + wu.nbytes + wd.nbytes
    t = timeit(lambda: mlp24(x, wg, wu, wd))
    print(f"mlp24 scan   {t*1e3:7.3f} ms  {nbytes/t/1e9:6.0f} GB/s "
          f"({nbytes/t/820e9*100:.0f}% of 820)")

    # (a2) unrolled (no scan) — does scan cost anything here?
    @jax.jit
    def mlp24u(x, wg, wu, wd):
        for i in range(L):
            x = x + (jax.nn.silu(x @ wg[i]) * (x @ wu[i])) @ wd[i]
        return x

    t = timeit(lambda: mlp24u(x, wg, wu, wd))
    print(f"mlp24 unroll {t*1e3:7.3f} ms  {nbytes/t/1e9:6.0f} GB/s")

    # (b) the Pallas paged kernel alone at the serve shapes, x24
    H, R, P = cfg.mla.num_heads, cfg.mla.kv_lora_rank, cfg.mla.qk_rope_head_dim
    pages, tables = init_paged_cache(cfg, lb, lctx + 64, lpage, jnp.bfloat16)
    q_lat = jax.random.normal(key, (lb, H, R), jnp.bfloat16)
    q_pe = jax.random.normal(key, (lb, H, P), jnp.bfloat16)
    seq = jnp.full((lb,), lctx, jnp.int32)
    kv_bytes = lb * lctx * (R + P) * 2

    @jax.jit
    def kern24(q_lat, q_pe, pages, tables, seq):
        outs = []
        for i in range(L):
            outs.append(paged_mla_decode(
                q_lat, q_pe, pages[i], tables, seq,
                softmax_scale=cfg.mla.q_head_dim ** -0.5))
        return jnp.stack(outs)

    t = timeit(lambda: kern24(q_lat, q_pe, pages, tables, seq))
    print(f"kern24       {t*1e3:7.3f} ms  ({t/L*1e6:.0f} us/layer, "
          f"{kv_bytes*L/t/1e9:.0f} GB/s vs kv-read bound "
          f"{kv_bytes*L/820e9*1e3:.3f} ms)")

    # (d) int8 weight-only GEMV: what the quantized MLP stream achieves
    wg8 = (wg * 127).astype(jnp.int8)
    wu8 = (wu * 127).astype(jnp.int8)
    wd8 = (wd * 127).astype(jnp.int8)
    sg = jnp.ones((L, F), jnp.bfloat16)
    su = jnp.ones((L, F), jnp.bfloat16)
    sd = jnp.ones((L, D), jnp.bfloat16)

    @jax.jit
    def mlp24q(x, wg8, wu8, wd8, sg, su, sd):
        def body(x, w):
            g8, u8, d8, sgi, sui, sdi = w
            g = (x @ g8.astype(jnp.bfloat16)) * sgi
            u = (x @ u8.astype(jnp.bfloat16)) * sui
            return x + ((jax.nn.silu(g) * u) @ d8.astype(jnp.bfloat16)) * sdi, None
        x, _ = jax.lax.scan(body, x, (wg8, wu8, wd8, sg, su, sd))
        return x

    q_bytes = wg8.nbytes + wu8.nbytes + wd8.nbytes
    t = timeit(lambda: mlp24q(x, wg8, wu8, wd8, sg, su, sd))
    print(f"mlp24 int8   {t*1e3:7.3f} ms  {q_bytes/t/1e9:6.0f} GB/s of int8 "
          f"({(wg.nbytes*3)/t/1e9:.0f} GB/s bf16-equivalent)")


if __name__ == "__main__":
    main()
