"""Decompose the 2B prefill (B=8, S=2048): where does 39% of MFU go?"""
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from internvideo_tpu.models.llm import (  # noqa: E402
    MLATransformer, init_paged_cache,
)
from internvideo_tpu.models.presets import qwen3_2b_mla  # noqa: E402


def _sync(x):
    x = jax.tree.leaves(x)[0]
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def timeit(fn, n=6):
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
    model = MLATransformer(cfg)
    lb, lctx, lpage, lsteps = 8, 2048, 64, 64
    lids = jnp.zeros((lb, lctx), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), lids)
    pages, tables = init_paged_cache(cfg, lb, lctx + lsteps, lpage,
                                     jnp.bfloat16)
    tok_count = lb * lctx
    # non-embed params participating per token + lm_head on last pos only
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

    t = timeit(run)
    print(f"prefill full     {t*1e3:7.1f} ms  {tok_count/t:7,.0f} tok/s  "
          f"{flops/t/1e12:5.0f} TF ({flops/t/197e12*100:.0f}% MFU)")

    # plain forward (no cache writes, no paged pools): the pure model fwd
    @jax.jit
    def fwd(p, ids):
        out = model.apply(p, ids, with_logits=False)
        return out.hidden

    t2 = timeit(lambda: fwd(params, lids))
    print(f"fwd no-cache     {t2*1e3:7.1f} ms  "
          f"(cache-entry+write overhead = {(t-t2)*1e3:.1f} ms)")

    # forward without attention (MLP+norms only): isolates the attention
    def _method_nomix(mdl, input_ids):
        x = mdl.embed_tokens(input_ids)
        for layer in mdl.layers:
            x = x + layer._mlp(layer.post_attention_layernorm(x))
        return mdl.norm(x)

    @jax.jit
    def nomix(p, ids):
        return model.apply(p, ids, method=_method_nomix)

    t3 = timeit(lambda: nomix(params, lids))
    print(f"fwd mlp-only     {t3*1e3:7.1f} ms  "
          f"(attention in situ = {(t2-t3)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
