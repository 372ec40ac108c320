"""On-chip: (a) causal flash block-size A/B at the MLA prefill shape,
(b) the new blocked-K fused qkv kernel vs the unfused dense-encoder path
at S=4097 (B=8, H=16, D=88 — the 1B encoder shape)."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from internvideo_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention,
    fused_qkv_rmsnorm_attention,
)
from internvideo_tpu.ops.rmsnorm import rms_norm  # noqa: E402


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
    key = jax.random.key(0)

    # (a) causal blocks at MLA prefill shape
    b, s, h, d = 8, 2048, 20, 192
    q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    for bq, bk in ((2048, 512),):
        f = jax.jit(lambda q, bq=bq, bk=bk: flash_attention(
            q, q, q, causal=True, block_q=bq, block_k=bk))
        t = timeit(lambda: f(q))
        print(f"causal mla {bq}x{bk}: {t*1e3:6.2f} ms", flush=True)

    # (b) encoder S=4097: fused blocked-K vs unfused chain
    b, s, h, d = 8, 4097, 16, 88
    w = h * d
    qkv = jax.random.normal(key, (b, s, 3 * w), jnp.bfloat16)
    qw = jnp.ones((w,), jnp.float32)
    kw = jnp.ones((w,), jnp.float32)

    fused = jax.jit(lambda qkv: fused_qkv_rmsnorm_attention(
        qkv, qw, kw, num_heads=h))
    t = timeit(lambda: fused(qkv))
    print(f"encoder fused blocked-K @4097: {t*1e3:6.2f} ms/layer-batch",
          flush=True)

    def unfused(qkv):
        q = rms_norm(qkv[..., :w], qw).reshape(b, s, h, d)
        k = rms_norm(qkv[..., w:2 * w], kw).reshape(b, s, h, d)
        v = qkv[..., 2 * w:].reshape(b, s, h, d)
        return flash_attention(q, k, v).reshape(b, s, w)

    uf = jax.jit(unfused)
    t = timeit(lambda: uf(qkv))
    print(f"encoder unfused        @4097: {t*1e3:6.2f} ms/layer-batch",
          flush=True)


if __name__ == "__main__":
    main()
