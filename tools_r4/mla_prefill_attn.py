"""Standalone: where do 14.5 ms/layer of MLA prefill attention go?"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from internvideo_tpu.models.presets import qwen3_2b_mla  # noqa: E402
from internvideo_tpu.nn.mla import MLAttention  # noqa: E402
from internvideo_tpu.nn.rope import rope_cos_sin  # noqa: E402
from internvideo_tpu.ops.flash_attention import flash_attention  # noqa: E402


def _sync(x):
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
    b, s, h = 8, 2048, 20
    key = jax.random.key(0)

    # flash kernel alone at the MLA prefill shape (d 192, v padded to 192)
    for d in (192, 128):
        q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
        t = timeit(lambda: f(q, k, v))
        fl = 2 * 2 * b * h * s * s * d * 0.5
        print(f"flash d={d} causal: {t*1e3:6.2f} ms "
              f"({fl/t/1e12:.0f} TF eff)", flush=True)

    # the full MLA layer forward (projections + expansion + concat + attn)
    cfg = qwen3_2b_mla().mla
    attn = MLAttention(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    x = jax.random.normal(key, (b, s, cfg.hidden_size), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    cos, sin = rope_cos_sin(pos, cfg.qk_rope_head_dim, 5e6)
    params = jax.jit(attn.init)(key, x, cos, sin)
    g = jax.jit(lambda p, x: attn.apply(p, x, cos, sin, causal=True))
    t = timeit(lambda: g(params, x))
    print(f"MLA layer fwd     : {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
