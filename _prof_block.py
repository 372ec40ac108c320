"""Per-component timing of the 1B encoder block on the real chip."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.nn.transformer import Block, Attention, Mlp
from internvideo_tpu.nn.norms import RMSNorm
from internvideo_tpu.ops import dot_product_attention

B, S, D, H = 8, 4097, 1408, 16
DH = D // H
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.sum(leaf.reshape(-1)[:1]))


def timeit(f, *args, n=10):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    out = f(*args)
    _sync(out)
    base = time.perf_counter() - t0  # includes one sync round-trip
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0 - base) / (n - 1) * 1e3


key = jax.random.key(0)
x = jax.random.normal(key, (B, S, D), DT)
q = jax.random.normal(key, (B, S, H, DH), DT)
k = jax.random.normal(key, (B, S, H, DH), DT)
v = jax.random.normal(key, (B, S, H, DH), DT)

# full block
blk = Block(num_heads=H, qkv_bias=True, dtype=DT, param_dtype=DT,
            attn_impl="pallas", mlp_act="gelu_tanh")
p_blk = jax.jit(blk.init)(key, x)
f_blk = jax.jit(lambda p, x: blk.apply(p, x))
print(f"block            {timeit(f_blk, p_blk, x):8.2f} ms")

# attention module (norm1 excluded)
att = Attention(num_heads=H, qkv_bias=True, dtype=DT, param_dtype=DT,
                attn_impl="pallas")
p_att = jax.jit(att.init)(key, x)
f_att = jax.jit(lambda p, x: att.apply(p, x))
print(f"attn module      {timeit(f_att, p_att, x):8.2f} ms")

# flash kernel alone
f_fa = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, impl="pallas"))
print(f"flash kernel     {timeit(f_fa, q, k, v):8.2f} ms")

# qkv GEMM alone (DenseGeneral (3,D))
dg = nn.DenseGeneral((3, D), use_bias=True, dtype=DT, param_dtype=DT)
p_dg = jax.jit(dg.init)(key, x)
f_dg = jax.jit(lambda p, x: dg.apply(p, x))
print(f"qkv GEMM         {timeit(f_dg, p_dg, x):8.2f} ms")

# proj GEMM
dn = nn.Dense(D, dtype=DT, param_dtype=DT)
p_dn = jax.jit(dn.init)(key, x)
f_dn = jax.jit(lambda p, x: dn.apply(p, x))
print(f"proj GEMM        {timeit(f_dn, p_dn, x):8.2f} ms")

# mlp module
mlp = Mlp(hidden_dim=4 * D, dtype=DT, param_dtype=DT, act="gelu_tanh")
p_mlp = jax.jit(mlp.init)(key, x)
f_mlp = jax.jit(lambda p, x: mlp.apply(p, x))
print(f"mlp module       {timeit(f_mlp, p_mlp, x):8.2f} ms")

# rmsnorm alone
rn = RMSNorm(dtype=DT)
p_rn = jax.jit(rn.init)(key, x)
f_rn = jax.jit(lambda p, x: rn.apply(p, x))
print(f"rmsnorm          {timeit(f_rn, p_rn, x):8.2f} ms")

# qkv GEMM + 2x rmsnorm + reshape (the pre-attention chain)
def pre(p_dg, p_rn, x):
    qkv = dg.apply(p_dg, x)
    q, k, v2 = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = rn.apply(p_rn, q)
    k = rn.apply(p_rn, k)
    return (q.reshape(B, S, H, DH), k.reshape(B, S, H, DH),
            v2.reshape(B, S, H, DH))
f_pre = jax.jit(pre)
print(f"pre-attn chain   {timeit(f_pre, p_dg, p_rn, x):8.2f} ms")

# layerscale + residual fused shape
g = jnp.full((D,), 1e-5, jnp.float32)
f_ls = jax.jit(lambda x, h, g: x + (h.astype(jnp.float32) * g).astype(DT))
print(f"ls+residual      {timeit(f_ls, x, x, g):8.2f} ms")
