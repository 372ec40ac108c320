"""Decompose the 2B-preset paged-decode step (VERDICT r3 item 1).

BENCH_r03 measured llm_decode_tokens_per_sec=847 (9.4 ms/step at B=8) vs a
~6.4 ms weight+cache streaming bound (≈60-67%). This script prices the
candidate gap terms separately, on the exact bench shapes (compile-cache
hits against bench.py / tools_r3/serve_bench.py):

  full      — the bench's per-dispatch decode step
  scan8     — 8 steps inside ONE jit (lax.scan): isolates per-step dispatch
  nohead    — decode step without the lm_head GEMM
  nowrite   — decode step without the per-layer paged_write scatter
  write24   — the 24 paged_write scatters alone
  lmhead    — the (8,2560)x(2560,151936) GEMM alone
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from internvideo_tpu.models.llm import (  # noqa: E402
    MLATransformer,
    _write_positions,
    init_paged_cache,
)
from internvideo_tpu.models.presets import qwen3_2b_mla  # noqa: E402


def _sync(x):
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def timeit(fn, *args, n=24):
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    dt = time.perf_counter() - t0 - base
    return dt / (n - 1)


def main():
    cfg = qwen3_2b_mla()
    model = MLATransformer(cfg)
    lb, lctx, lpage, lsteps = 8, 2048, 64, 64
    lids = jnp.zeros((lb, lctx), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), lids)

    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    layer_b = sum(
        x.nbytes for k, x in jax.tree.flatten_with_path(params)[0]
        if "layers_" in jax.tree_util.keystr(k)
    )
    head_b = sum(
        x.nbytes for k, x in jax.tree.flatten_with_path(params)[0]
        if "lm_head" in jax.tree_util.keystr(k)
    )
    cache_b = lb * lctx * cfg.mla.cache_dim * 2 * cfg.num_layers
    print(f"params {nbytes/1e9:.2f} GB  layers {layer_b/1e9:.2f} GB  "
          f"lm_head {head_b/1e9:.2f} GB  kv-read {cache_b/1e9:.2f} GB")
    bound = (layer_b + head_b + cache_b) / 820e9
    print(f"decode stream bound ~{bound*1e3:.2f} ms/step "
          f"-> {lb/bound:.0f} tok/s ceiling")

    pages, tables = init_paged_cache(cfg, lb, lctx + lsteps, lpage,
                                     jnp.bfloat16)
    tok = jnp.zeros((lb,), jnp.int32)
    lseq = jnp.full((lb,), lctx, jnp.int32)

    # --- full: identical to bench.py's _serve_decode ---
    @partial(jax.jit, donate_argnums=(2,))
    def _full(p, token, pages, seq_lens):
        out = model.apply(p, token[:, None], pages, tables, seq_lens, lpage,
                          method="decode_step_paged")
        return out.logits[:, -1].argmax(-1).astype(jnp.int32), out.caches

    def run_full(p, token, pgs, sl):
        token, pgs = _full(p, token, pgs, sl)
        return token, pgs

    # stateful timing: pages are donated, so re-thread them
    state = {"pages": pages}

    def full_step():
        tok2, state["pages"] = _full(params, tok, state["pages"], lseq)
        return tok2

    t_full = timeit(lambda: full_step())
    print(f"full        {t_full*1e3:7.2f} ms/step  "
          f"{lb/t_full:6.0f} tok/s  ({lb/t_full/(lb/bound)*100:.0f}% of bound)")

    # --- scan8: 8 decode steps inside one jit ---
    K = 8

    @partial(jax.jit, donate_argnums=(2,))
    def _scan(p, token, pages, seq_lens):
        def body(carry, _):
            token, pages, sl = carry
            out = model.apply(p, token[:, None], pages, tables, sl, lpage,
                              method="decode_step_paged")
            nt = out.logits[:, -1].argmax(-1).astype(jnp.int32)
            return (nt, out.caches, sl + 1), nt

        (token, pages, _), toks = jax.lax.scan(
            body, (token, pages, seq_lens), None, length=K
        )
        return token, pages

    def scan_step():
        tok2, state["pages"] = _scan(params, tok, state["pages"], lseq)
        return tok2

    t_scan = timeit(lambda: scan_step(), n=8)
    print(f"scan{K}       {t_scan/K*1e3:7.2f} ms/step  "
          f"{lb*K/t_scan:6.0f} tok/s  "
          f"({lb*K/t_scan/(lb/bound)*100:.0f}% of bound)")

    # --- nohead: skip the lm_head ---
    def _method_nohead(mdl, token_ids, pages, block_tables, seq_lens,
                       page_size):
        x = mdl.embed_tokens(token_ids)
        positions = seq_lens[:, None].astype(jnp.int32)
        cos, sin = mdl._rope(positions)
        new_pages = []
        for layer, pool in zip(mdl.layers, pages):
            xn = layer.input_layernorm(x)
            entry = layer.self_attn.compute_cache_entry(xn, cos, sin)
            pool = _write_positions(pool, entry, block_tables, positions,
                                    page_size)
            new_pages.append(pool)
            x = x + layer.self_attn.decode_paged(
                xn, cos, sin, pool, block_tables, seq_lens + 1)
            x = x + layer._mlp(layer.post_attention_layernorm(x))
        return mdl.norm(x), new_pages

    @partial(jax.jit, donate_argnums=(2,))
    def _nohead(p, token, pages, seq_lens):
        h, pgs = model.apply(p, token[:, None], pages, tables, seq_lens,
                             lpage, method=_method_nohead)
        return h, pgs

    def nohead_step():
        h, state["pages"] = _nohead(params, tok, state["pages"], lseq)
        return h

    t_nohead = timeit(lambda: nohead_step())
    print(f"nohead      {t_nohead*1e3:7.2f} ms/step  "
          f"(lm_head in situ = {(t_full-t_nohead)*1e3:.2f} ms)")

    # --- nowrite: skip the paged_write scatters (reads stale pool; fine) ---
    def _method_nowrite(mdl, token_ids, pages, block_tables, seq_lens,
                        page_size):
        x = mdl.embed_tokens(token_ids)
        positions = seq_lens[:, None].astype(jnp.int32)
        cos, sin = mdl._rope(positions)
        for layer, pool in zip(mdl.layers, pages):
            xn = layer.input_layernorm(x)
            x = x + layer.self_attn.decode_paged(
                xn, cos, sin, pool, block_tables, seq_lens + 1)
            x = x + layer._mlp(layer.post_attention_layernorm(x))
        x = mdl.norm(x)
        return mdl._head(x)

    @jax.jit
    def _nowrite(p, token, pages, seq_lens):
        return model.apply(p, token[:, None], pages, tables, seq_lens,
                           lpage, method=_method_nowrite)

    t_nowrite = timeit(lambda: _nowrite(params, tok, state["pages"], lseq))
    print(f"nowrite     {t_nowrite*1e3:7.2f} ms/step  "
          f"(24x paged_write in situ = {(t_full-t_nowrite)*1e3:.2f} ms)")

    # --- write24: the scatters alone ---
    entry = jnp.zeros((lb, cfg.mla.cache_dim), jnp.bfloat16)
    pid = tables[:, -1]
    off = jnp.zeros((lb,), jnp.int32)

    @partial(jax.jit, donate_argnums=(0,))
    def _w24(pgs, e, pid, off):
        from internvideo_tpu.nn.paged_cache import paged_write
        return [paged_write(p, e, pid, off) for p in pgs]

    def w24_step():
        state["pages"] = _w24(state["pages"], entry, pid, off)
        return state["pages"][0]

    t_w = timeit(lambda: w24_step())
    print(f"write24     {t_w*1e3:7.2f} ms/step (standalone)")

    # --- lmhead: the GEMM alone ---
    w = params["params"]["lm_head"]["kernel"].astype(jnp.bfloat16)
    h = jnp.zeros((lb, cfg.hidden_size), jnp.bfloat16)
    f = jax.jit(lambda h, w: (h @ w).argmax(-1))
    t_h = timeit(lambda: f(h, w))
    print(f"lmhead      {t_h*1e3:7.2f} ms/step (standalone, "
          f"{head_b/t_h/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
