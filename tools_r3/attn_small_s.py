"""Attention-variant shootout at the masked-pretrain shape (B=8, S=820).

Ablation showed attention costs 53 ms of the 123 ms masked forward
(1.34 ms/layer vs a ~0.2 ms FLOP bound). Measures each variant as a
40-iteration scan so tunnel dispatch noise (±1 ms) is amortized 40x.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools_r3/attn_small_s.py
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

B, S, H, D = 8, 820, 16, 88
LAYERS = 40
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.sum(leaf.reshape(-1)[:1]))


def timeit(f, *args, n=8):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    _sync(f(*args))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0 - base) / (n - 1) * 1e3


def bench(name, attn_fn, q, k, v):
    """Scan `attn_fn` LAYERS times: out feeds a cheap mix into the next q."""

    def step(carry, _):
        o = attn_fn(carry, k, v)
        return o.astype(DT), ()

    f = jax.jit(lambda q: jax.lax.scan(step, q, None, length=LAYERS)[0])
    try:
        t = timeit(f, q)
        print(f"{name:42s} {t / LAYERS:7.3f} ms/layer   "
              f"({t:7.1f} ms/{LAYERS})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:42s} FAILED {type(e).__name__}: {e}", flush=True)


def main():
    from internvideo_tpu.ops import dot_product_attention
    from internvideo_tpu.ops.flash_attention import flash_attention

    key = jax.random.key(0)
    q = jax.random.normal(key, (B, S, H, D), DT)
    k = jax.random.normal(jax.random.key(1), (B, S, H, D), DT)
    v = jax.random.normal(jax.random.key(2), (B, S, H, D), DT)

    bench("pallas default (current model path)",
          lambda q, k, v: dot_product_attention(q, k, v, impl="pallas"),
          q, k, v)
    bench("xla einsum",
          lambda q, k, v: dot_product_attention(q, k, v, impl="xla"),
          q, k, v)
    for bq, bk in ((512, 512), (256, 256), (128, 896), (896, 128),
                   (256, 896), (896, 256), (128, 128)):
        bench(f"pallas block {bq}x{bk}",
              functools.partial(flash_attention, block_q=bq, block_k=bk),
              q, k, v)

    # heads folded into batch (grid shape identical, sanity check)
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, S, 1, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, S, 1, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, S, 1, D)
    bench("pallas heads-in-batch",
          lambda q, k, v: flash_attention(q, k, v), qf, kf, vf)

    # D padded to 128 (MXU-native K)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 40)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 40)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 40)))
    bench("pallas D=128 padded",
          lambda q, k, v: flash_attention(q, k, v), qp, kp, vp)


if __name__ == "__main__":
    main()
