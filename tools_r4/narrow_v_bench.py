"""On-chip: d_v != d_qk kernel plumbing + packed-segment block skipping.

A. flash causal @ MLA prefill shape, v padded (192) vs native (128)
B. full 2B prefill MFU (same accounting as prefill_profile.py)
C. regression gate: dense 1B encoder shape S=4097 D=88
D. packed-segment skip: causal+8 segments vs plain causal (fwd, fwd+bwd)
"""
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from internvideo_tpu.models.llm import (  # noqa: E402
    MLATransformer, init_paged_cache,
)
from internvideo_tpu.models.presets import qwen3_2b_mla  # noqa: E402
from internvideo_tpu.ops.flash_attention import flash_attention  # noqa: E402


def _sync(x):
    x = jax.tree.leaves(x)[0]
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def timeit(fn, n=12):
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
    key = jax.random.key(0)

    # --- A: kernel at the MLA prefill shape, padded vs native v ---
    b, s, h, d = 8, 2048, 20, 192
    q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    for dv in (192, 128):
        v = jax.random.normal(key, (b, s, h, dv), jnp.bfloat16)
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
        t = timeit(lambda: f(q, k, v))
        # payload flops: QK at d + PV at dv, causal half
        fl = 2 * b * h * s * s * (d + dv) * 0.5
        print(f"A flash causal d=192 dv={dv}: {t*1e3:6.2f} ms "
              f"({fl/t/1e12:.0f} TF payload)", flush=True)

    # --- B: full 2B prefill ---
    cfg = qwen3_2b_mla()
    model = MLATransformer(cfg)
    lb, lctx, lpage, lsteps = 8, 2048, 64, 64
    lids = jnp.zeros((lb, lctx), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), lids)
    pages, tables = init_paged_cache(cfg, lb, lctx + lsteps, lpage,
                                     jnp.bfloat16)
    tok_count = lb * lctx
    flops = 2 * 2.33e9 * tok_count

    @partial(jax.jit, donate_argnums=(2,))
    def prefill(p, ids, pages):
        out = model.apply(p, ids, pages, tables, lpage,
                          method="prefill_paged")
        return out.logits[:, -1].argmax(-1).astype(jnp.int32), out.caches

    state = {"pages": pages}

    def run():
        tok, state["pages"] = prefill(params, lids, state["pages"])
        return tok

    t = timeit(run, n=6)
    print(f"B prefill full   {t*1e3:7.1f} ms  {tok_count/t:7,.0f} tok/s  "
          f"{flops/t/1e12:5.0f} TF ({flops/t/197e12*100:.0f}% MFU)",
          flush=True)

    # --- C: regression gate, dense encoder shape ---
    b2, s2, h2, d2 = 8, 4097, 16, 88
    q2 = jax.random.normal(key, (b2, s2, h2, d2), jnp.bfloat16)
    k2 = jax.random.normal(key, (b2, s2, h2, d2), jnp.bfloat16)
    v2 = jax.random.normal(key, (b2, s2, h2, d2), jnp.bfloat16)
    f2 = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    t = timeit(lambda: f2(q2, k2, v2))
    fl = 4 * b2 * h2 * s2 * s2 * d2
    print(f"C dense S=4097 D=88: {t*1e3:6.2f} ms ({fl/t/1e12:.0f} TF)",
          flush=True)

    # --- D: packed-segment whole-block skipping ---
    b3, s3, h3, d3 = 1, 16384, 20, 128
    nseg = 8
    q3 = jax.random.normal(key, (b3, s3, h3, d3), jnp.bfloat16)
    k3 = jax.random.normal(key, (b3, s3, h3, d3), jnp.bfloat16)
    v3 = jax.random.normal(key, (b3, s3, h3, d3), jnp.bfloat16)
    seg = jnp.repeat(jnp.arange(nseg, dtype=jnp.int32), s3 // nseg)[None]

    f_causal = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
    f_seg = jax.jit(lambda q, k, v, s: flash_attention(
        q, k, v, causal=True, q_segment_ids=s, kv_segment_ids=s))
    t_c = timeit(lambda: f_causal(q3, k3, v3))
    t_s = timeit(lambda: f_seg(q3, k3, v3, seg))
    print(f"D fwd  causal {t_c*1e3:7.2f} ms | packed x{nseg} "
          f"{t_s*1e3:7.2f} ms ({t_c/t_s:.2f}x, ideal ~{nseg}x)", flush=True)

    def loss_c(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True)
                       .astype(jnp.float32))

    def loss_s(q, k, v, s):
        return jnp.sum(flash_attention(
            q, k, v, causal=True, q_segment_ids=s, kv_segment_ids=s,
        ).astype(jnp.float32))

    g_c = jax.jit(jax.grad(loss_c, argnums=(0, 1, 2)))
    g_s = jax.jit(jax.grad(loss_s, argnums=(0, 1, 2)))
    t_cg = timeit(lambda: g_c(q3, k3, v3), n=6)
    t_sg = timeit(lambda: g_s(q3, k3, v3, seg), n=6)
    print(f"D bwd  causal {t_cg*1e3:7.2f} ms | packed x{nseg} "
          f"{t_sg*1e3:7.2f} ms ({t_cg/t_sg:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
