"""On-chip profiling harness for the 1B encoder (the PERF.md workflows).

    python -m internvideo_tpu.tools.profile_encoder --mode block
    python -m internvideo_tpu.tools.profile_encoder --mode attention
    python -m internvideo_tpu.tools.profile_encoder --mode model --batches 8,16

Timing notes (see CLAUDE.md): on the tunneled TPU block_until_ready() does
not synchronize — every measurement fetches a 4-byte scalar and subtracts
a one-iteration baseline.
"""

from __future__ import annotations

import argparse
import time

import jax


def _setup():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(out):
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.sum(leaf.reshape(-1)[:1]))


def timeit(f, *args, n=20):
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


def profile_attention():
    import jax.numpy as jnp

    from internvideo_tpu.ops import dot_product_attention

    B, S, H, DH = 8, 4097, 16, 88
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, S, H, DH), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, S, H, DH), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, S, H, DH), jnp.bfloat16)
    fwd = jax.jit(lambda q, k, v: dot_product_attention(
        q, k, v, impl="pallas"))
    print(f"flash fwd S={S}: {timeit(fwd, q, k, v):.2f} ms")

    def loss(q, k, v):
        return jnp.sum(dot_product_attention(
            q, k, v, impl="pallas").astype(jnp.float32))

    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    print(f"flash fwd+bwd: {timeit(bwd, q, k, v, n=10):.2f} ms")


def profile_block():
    import jax.numpy as jnp

    from internvideo_tpu.nn.transformer import Attention, Block, Mlp

    B, S, D, H = 8, 4097, 1408, 16
    DT = jnp.bfloat16
    x = jax.random.normal(jax.random.key(0), (B, S, D), DT)
    kw = dict(num_heads=H, qkv_bias=True, dtype=DT, param_dtype=DT,
              attn_impl="pallas")
    for name, mod in (
        ("block", Block(mlp_act="gelu_tanh", **kw)),
        ("attention module", Attention(**kw)),
        ("mlp", Mlp(hidden_dim=4 * D, dtype=DT, param_dtype=DT,
                    act="gelu_tanh")),
    ):
        p = jax.jit(mod.init)(jax.random.key(1), x)
        f = jax.jit(lambda p, x, m=mod: m.apply(p, x))
        print(f"{name:20s} {timeit(f, p, x):7.2f} ms")


def profile_model(batches):
    import jax.numpy as jnp

    from internvideo_tpu.models.internvideo2 import InternVideo2, make_config

    cfg = make_config("1B", num_frames=16, img_size=224, num_classes=0,
                      dtype="bfloat16", param_dtype="bfloat16",
                      attn_impl="pallas", mlp_act="gelu_tanh")
    model = InternVideo2(cfg)
    for B in batches:
        video = jnp.zeros((B, 16, 224, 224, 3), jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.key(0), video)
        f = jax.jit(lambda p, v: model.apply(p, v).pooled)
        ms = timeit(f, params, video, n=8)
        print(f"B={B}: {ms:.1f} ms -> {B / ms * 1e3:.2f} clips/s")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("attention", "block", "model"),
                    default="attention")
    ap.add_argument("--batches", default="8,16")
    args = ap.parse_args(argv)
    _setup()
    if args.mode == "attention":
        profile_attention()
    elif args.mode == "block":
        profile_block()
    else:
        profile_model([int(b) for b in args.batches.split(",")])
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
