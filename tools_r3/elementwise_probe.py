"""On-chip probe: where does the ~1 ms/layer of elementwise go at S=820?

Masked-pretrain shapes (B=8, S=820, D=1408, bf16). Times each piece of the
block in isolation plus fused candidates. Run on the TPU:

    python -u tools_r3/elementwise_probe.py > /tmp/ew_probe.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

B, S, D, H = 8, 820, 1408, 16
DH = D // H
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.sum(leaf.reshape(-1)[:1]))


def timeit(f, *args, n=30):
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


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, S, D), DT)
    h = jax.random.normal(jax.random.key(1), (B, S, D), DT)
    w = jnp.ones((D,), jnp.float32)
    gamma = jnp.full((D,), 1e-5, jnp.float32)
    qkv = jax.random.normal(jax.random.key(2), (B, S, 3 * D), DT)

    from internvideo_tpu.nn.transformer import Attention, Block, Mlp
    from internvideo_tpu.ops.rmsnorm import fused_add_rms_norm, rms_norm

    kw = dict(num_heads=H, qkv_bias=False, dtype=DT, param_dtype=DT,
              attn_impl="pallas")

    # 1. whole block
    blk = Block(mlp_act="gelu_tanh", mlp_ratio=48 / 11, **kw)
    pb = jax.jit(blk.init)(key, x)
    f = jax.jit(lambda p, x: blk.apply(p, x))
    print(f"block total:        {timeit(f, pb, x):8.3f} ms", flush=True)

    # 2. attention module (incl. qkv/proj GEMMs + qk-norm + kernel)
    att = Attention(**kw)
    pa = jax.jit(att.init)(key, x)
    f = jax.jit(lambda p, x: att.apply(p, x))
    print(f"attention module:   {timeit(f, pa, x):8.3f} ms", flush=True)

    # 3. mlp
    mlp = Mlp(hidden_dim=int(D * 48 / 11), dtype=DT, param_dtype=DT,
              act="gelu_tanh")
    pm = jax.jit(mlp.init)(key, x)
    f = jax.jit(lambda p, x: mlp.apply(p, x))
    print(f"mlp:                {timeit(f, pm, x):8.3f} ms", flush=True)

    # 4. isolated elementwise pieces
    f = jax.jit(lambda x, w: rms_norm(x, w))
    print(f"rmsnorm (XLA):      {timeit(f, x, w):8.3f} ms", flush=True)

    f = jax.jit(
        lambda x, h, g: x + (h.astype(jnp.float32) * g).astype(DT))
    print(f"ls+add (XLA):       {timeit(f, x, h, gamma):8.3f} ms", flush=True)

    def chain(x, h, g, w):
        xs = x + (h.astype(jnp.float32) * g).astype(DT)
        return rms_norm(xs, w), xs

    f = jax.jit(chain)
    print(f"ls+add+norm (XLA):  {timeit(f, x, h, gamma, w):8.3f} ms",
          flush=True)

    # 5. existing Pallas fused add+norm (no LS)
    f = jax.jit(lambda h, x, w: fused_add_rms_norm(h, x, w))
    print(f"fused add+norm (P): {timeit(f, h, x, w):8.3f} ms", flush=True)

    # 6. qk-norm pair over slices of qkv (as Attention does)
    def qknorm(qkv, w):
        q = rms_norm(qkv[..., :D], w)
        k = rms_norm(qkv[..., D:2 * D], w)
        return q, k

    f = jax.jit(qknorm)
    print(f"qk-norm pair (XLA): {timeit(f, qkv, w):8.3f} ms", flush=True)

    # 7. slices+reshape to (B,S,H,DH) x3 (layout cost after qkv GEMM)
    def shape3(qkv):
        q = qkv[..., :D].reshape(B, S, H, DH)
        k = qkv[..., D:2 * D].reshape(B, S, H, DH)
        v = qkv[..., 2 * D:].reshape(B, S, H, DH)
        return q, k, v

    f = jax.jit(shape3)
    print(f"qkv slice/reshape:  {timeit(f, qkv):8.3f} ms", flush=True)

    # 8. qkv GEMM alone
    wq = jax.random.normal(jax.random.key(3), (D, 3 * D), DT)
    f = jax.jit(lambda x, w: x @ w)
    print(f"qkv GEMM:           {timeit(f, x, wq):8.3f} ms", flush=True)

    # 9. full-batch sweep of block at B=16 for the B anomaly
    x16 = jax.random.normal(key, (16, S, D), DT)
    f = jax.jit(lambda p, x: blk.apply(p, x))
    t16 = timeit(f, pb, x16)
    print(f"block total B=16:   {t16:8.3f} ms ({t16 / 2:.3f}/8clips)",
          flush=True)


if __name__ == "__main__":
    main()
