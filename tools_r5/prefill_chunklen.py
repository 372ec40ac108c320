"""Prefill chunk-length sweep: execute the named >67%-MFU lever (r5).

PERF.md "Serving roofline closed" (r5 note) pins the prefill remainder on
causal-grid amortization at S=2048 chunks (each q block sees only 1-2 k
blocks; the flash kernel alone runs 43-46 TF effective while the MLP side
runs 91% of peak) and names the fix: serve long prompts with chunked
prefill at the largest chunk that fits. This measures that claim end to
end: the full 2B paged prefill program at a CONSTANT 16,384 tokens per
dispatch, re-shaped (B=8,S=2048) / (B=4,S=4096) / (B=2,S=8192).

MFU convention matches the existing prefill numbers: param FLOPs only
(2 * 2.33e9 per token) against the measured 197 TF bf16 peak — attention
FLOPs (which GROW quadratically with chunk length: +6.8% of param FLOPs
at S=2048, +27% at S=8192) are reported separately so the causal-grid
win isn't conflated with doing more work.
"""
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

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


def run_shape(cfg, model, lb, lctx, tag=""):
    lpage = 64
    lids = jnp.zeros((lb, lctx), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), lids)
    pages0, tables = init_paged_cache(cfg, lb, lctx + lpage, lpage,
                                      jnp.bfloat16)

    @partial(jax.jit, donate_argnums=(2,))
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
    pflops = 2 * 2.33e9 * toks           # param FLOPs (the MFU convention)
    h = cfg.mla.num_heads
    dqk = cfg.mla.qk_rope_head_dim + cfg.mla.qk_nope_head_dim
    dv, nl = cfg.mla.v_head_dim, cfg.num_layers
    aflops = lb * lctx * (lctx / 2) * h * 2 * (dqk + dv) * nl  # causal attn
    mfu = pflops / t / 197e12 * 100
    print(
        f"{tag:9s} B={lb:2d} S={lctx:5d}  {t*1e3:7.1f} ms  "
        f"{toks/t:8,.0f} tok/s  "
        f"param-MFU {mfu:4.1f}%  (attn extra = {aflops/pflops*100:4.1f}% "
        f"of param FLOPs; hw-MFU {(pflops+aflops)/t/197e12*100:4.1f}%)",
        flush=True,
    )
    return t, mfu


def main():
    import dataclasses

    # bf16 chunk-length sweep (the named >67% lever), then the int8_mix
    # serving mode (fused dynamic-int8 prefill GEMMs off int8_wo params)
    # at the same shapes — both on zero-init params (timing is
    # data-independent; see bench.py's int8 note)
    for quant in (None, "int8_mix"):
        cfg = qwen3_2b_mla(quant=quant)
        model = MLATransformer(cfg)
        for lb, lctx in ((8, 2048), (4, 4096), (2, 8192)):
            run_shape(cfg, model, lb, lctx, tag=quant or "bf16")


if __name__ == "__main__":
    main()
