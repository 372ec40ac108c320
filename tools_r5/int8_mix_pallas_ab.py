"""In-model A/B at the 2B prefill shape: int8_mix dyn path XLA vs Pallas.

Isolated, the fused kernel beats xla-i8 on all five per-layer GEMMs at
M=16,384 (tools_r5/int8_prefill_bench.py: q 0.86 vs 1.02 ms, kv_b 0.16
vs 0.63, out 0.56 vs 0.73, gateup 1.87 vs 2.09, down 2.07 vs 2.88). The
encoder measured the opposite in-model (custom call breaks XLA epilogue
fusions — PERF.md "Quantized GEMM" r5). This decides which story the 2B
prefill follows: full prefill_paged program, B=8 x S=2048, stock
int8_mix (dyn GEMMs on XLA) vs the same with quant.int8_matmul forced
to fused="pallas".
"""
import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

import internvideo_tpu.ops.quant as quant
from internvideo_tpu.models.llm import MLATransformer, init_paged_cache
from internvideo_tpu.models.presets import qwen3_2b_mla


def _sync(x):
    x = jax.tree.leaves(x)[0]
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def timeit(fn, n=8):
    _sync(fn()); _sync(fn())
    t0 = time.perf_counter(); _sync(fn())
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0 - base) / (n - 1)


def measure(tag):
    lb, lctx, lpage = 8, 2048, 64
    cfg = qwen3_2b_mla(quant="int8_mix")
    model = MLATransformer(cfg)
    lids = jnp.zeros((lb, lctx), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), lids)
    pages0, tables = init_paged_cache(cfg, lb, lctx + lpage, lpage,
                                      jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def prefill(p, ids, pages):
        out = model.apply(p, ids, pages, tables, lpage,
                          method="prefill_paged")
        return out.logits[:, -1].argmax(-1).astype(jnp.int32), out.caches

    state = {"pages": pages0}

    def run():
        tok, state["pages"] = prefill(params, lids, state["pages"])
        return tok

    t = timeit(run)
    toks = lb * lctx
    mfu = 2 * 2.33e9 * toks / t / 197e12 * 100
    print(f"{tag:10s} {t*1e3:7.1f} ms  {toks/t:8,.0f} tok/s  "
          f"eff-MFU {mfu:4.1f}%", flush=True)


def main():
    measure("xla-dyn")
    orig = quant.int8_matmul
    quant.int8_matmul = functools.partial(orig, fused="pallas")
    try:
        measure("pallas-dyn")
    finally:
        quant.int8_matmul = orig


if __name__ == "__main__":
    main()
