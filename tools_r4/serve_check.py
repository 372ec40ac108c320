"""End-to-end 2B decode step after the kernel fix: bf16 vs int8_wo."""
import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from internvideo_tpu.models.llm import MLATransformer, init_paged_cache  # noqa: E402
from internvideo_tpu.models.presets import qwen3_2b_mla  # noqa: E402


def _sync(x):
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def run(tag, model, params, cfg, bound_ms):
    lb, lctx, lpage, lsteps = 8, 2048, 64, 64
    pages, tables = init_paged_cache(cfg, lb, lctx + lsteps, lpage,
                                     jnp.bfloat16)

    @partial(jax.jit, donate_argnums=(2,))
    def dec(p, token, pages, seq_lens):
        out = model.apply(p, token[:, None], pages, tables, seq_lens, lpage,
                          method="decode_step_paged")
        return out.logits[:, -1].argmax(-1).astype(jnp.int32), out.caches

    tok = jnp.zeros((lb,), jnp.int32)
    lseq = jnp.full((lb,), lctx, jnp.int32)
    tok, pages = dec(params, tok, pages, lseq)
    _sync(tok)
    tok, pages = dec(params, tok, pages, lseq + 1)
    _sync(tok)
    t0 = time.perf_counter()
    tok, pages = dec(params, tok, pages, lseq + 2)
    _sync(tok)
    base = time.perf_counter() - t0
    n = 60
    t0 = time.perf_counter()
    for i in range(n):
        tok, pages = dec(params, tok, pages, lseq + 3 + i)
    _sync(tok)
    dt = (time.perf_counter() - t0 - base) / (n - 1)
    print(f"{tag}: {dt*1e3:.2f} ms/step  {lb/dt:,.0f} tok/s  "
          f"({bound_ms/dt/1e3*100:.0f}% of its {bound_ms:.2f} ms bound)",
          flush=True)
    del pages


def main():
    cfg = qwen3_2b_mla()
    model = MLATransformer(cfg)
    lids = jnp.zeros((8, 8), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), lids)
    # bf16 bound: layers 4.00 GB + lm_head 0.78 GB + kv 0.45 GB at 820 GB/s
    run("bf16   ", model, params, cfg, 6.38)
    del params

    qcfg = dataclasses.replace(cfg, quant="int8_wo")
    qmodel = MLATransformer(qcfg)
    qparams = jax.jit(qmodel.init)(jax.random.key(0), lids)
    # int8 bound: (4.00+0.78)/2 + kv 0.45 = 2.84 GB -> 3.46 ms
    run("int8_wo", qmodel, qparams, qcfg, 3.46)


if __name__ == "__main__":
    main()
