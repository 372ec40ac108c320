"""End-to-end LLM serving throughput on the real chip.

The bench.py extra `mla_paged_decode_tokens_per_sec` measures one layer's
decode-attention kernel; this measures the FULL model serve path — prefill
(one jitted pass over the prompt) and steady-state decode (jitted
single-token step through every layer incl. the paged Pallas kernel, the
SwiGLU MLPs, and the lm_head) — the numbers a serving deployment actually
sees.

Model: presets.qwen3_2b_mla — the Qwen3-8B-MLA architecture scaled to a
2B-class config that fits the 16 GB v5e alongside its page pools
(bf16 8B params alone are 16 GB). Same module code, same kernels.

Usage: python -u tools_r3/serve_bench.py [--ctx 2048] [--batch 8]
"""

import argparse
import json
import os
import time
from functools import partial

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from internvideo_tpu.models.llm import MLATransformer, init_paged_cache
from internvideo_tpu.models.presets import qwen3_2b_mla


def sync(x):
    return float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decode_steps", type=int, default=64)
    ap.add_argument("--page", type=int, default=64)
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print(json.dumps({"error": "not on tpu"}))
        return

    cfg = qwen3_2b_mla()
    model = MLATransformer(cfg)
    b, ctx = args.batch, args.ctx
    max_len = ctx + args.decode_steps
    ids = jnp.zeros((b, ctx), jnp.int32)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.key(0), ids)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e9:.2f}B  init {time.perf_counter()-t0:.1f}s",
          flush=True)

    pages, tables = init_paged_cache(cfg, b, max_len, args.page, jnp.bfloat16)

    # pages are donated: page pools update in place — without donation
    # every step copies the whole pool (num_layers x (P, page, C))
    @partial(jax.jit, donate_argnums=(2,))
    def prefill(params, ids, pages):
        out = model.apply(params, ids, pages, tables, args.page,
                          method="prefill_paged")
        return out.logits[:, -1].argmax(-1).astype(jnp.int32), out.caches

    @partial(jax.jit, donate_argnums=(2,))
    def decode(params, token, pages, seq_lens):
        out = model.apply(params, token[:, None], pages, tables, seq_lens,
                          args.page, method="decode_step_paged")
        return out.logits[:, -1].argmax(-1).astype(jnp.int32), out.caches

    # --- prefill timing ---
    tok, pages = prefill(params, ids, pages)
    sync(tok)  # compile+warm
    tok, pages = prefill(params, ids, pages)
    sync(tok)
    t0 = time.perf_counter()
    tok, pages = prefill(params, ids, pages)
    sync(tok)
    base = time.perf_counter() - t0
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        tok, pages = prefill(params, ids, pages)
    sync(tok)
    dt = max(time.perf_counter() - t0 - base, 1e-9)
    prefill_tps = b * ctx * (n - 1) / dt
    print(f"prefill: {prefill_tps:,.0f} tok/s "
          f"({dt/(n-1)*1e3:.1f} ms per {b}x{ctx})", flush=True)

    # --- steady-state decode timing ---
    seq_lens = jnp.full((b,), ctx, jnp.int32)
    tok2, pages = decode(params, tok, pages, seq_lens)
    sync(tok2)  # compile+warm
    tok2, pages = decode(params, tok2, pages, seq_lens + 1)
    sync(tok2)
    t0 = time.perf_counter()
    tok2, pages = decode(params, tok2, pages, seq_lens + 2)
    sync(tok2)
    base = time.perf_counter() - t0
    n = args.decode_steps - 4
    t0 = time.perf_counter()
    for i in range(n):
        tok2, pages = decode(params, tok2, pages, seq_lens + 3 + i)
    sync(tok2)
    dt = max(time.perf_counter() - t0 - base, 1e-9)
    decode_tps = b * (n - 1) / dt
    print(f"decode: {decode_tps:,.0f} tok/s steady-state "
          f"(B={b}, {dt/(n-1)*1e3:.2f} ms/step)", flush=True)

    # roofline context: decode reads all params + the valid cache per step
    param_bytes = n_params * 2
    cache_bytes = b * ctx * cfg.mla.cache_dim * cfg.num_layers * 2
    hbm = 820e9
    sol_ms = (param_bytes + cache_bytes) / hbm * 1e3
    print(f"decode HBM roofline: {sol_ms:.2f} ms/step "
          f"(params {param_bytes/1e9:.1f} GB + cache "
          f"{cache_bytes/1e9:.2f} GB @ 820 GB/s) -> "
          f"{b/(sol_ms/1e3):,.0f} tok/s SOL", flush=True)
    print(json.dumps({
        "llm_prefill_tokens_per_sec": round(prefill_tps),
        "llm_decode_tokens_per_sec": round(decode_tps),
        "decode_sol_tokens_per_sec": round(b / (sol_ms / 1e3)),
    }))


if __name__ == "__main__":
    main()
