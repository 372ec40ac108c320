import time, functools
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def sync(x): return float(jax.device_get(jnp.sum(x.reshape(-1)[:1])))
def timeit(fn, *args, iters=10):
    out = fn(*args); sync(out)
    t0 = time.perf_counter(); out = fn(*args); sync(out); base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters + 1): out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0 - base) / iters

def make_kernel(variant):
    def kern(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale):
        ik = pl.program_id(3)
        nk = pl.num_programs(3)
        @pl.when(ik == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        m_prev = m_ref[:, 0]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        if variant == "exp":
            p = jnp.exp(s - m_cur[:, None])
        elif variant == "exp2":
            p = jnp.exp2((s - m_cur[:, None]) * 1.4426950408889634)
        elif variant == "noexp":
            p = s - m_cur[:, None]
        elif variant == "bf16exp":
            p = jnp.exp((s - m_cur[:, None]).astype(jnp.bfloat16)).astype(jnp.float32)
        alpha = jnp.exp(m_prev - m_cur)
        alpha = jnp.where(jnp.isfinite(m_prev), alpha, 0.0)
        l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
        m_ref[:, 0] = m_cur
        acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot(p.astype(v.dtype), v.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        @pl.when(ik == nk - 1)
        def _():
            l = l_ref[:, 0]
            ls = jnp.where(l == 0., 1., l)
            o_ref[0, 0] = (acc_ref[:] / ls[:, None]).astype(o_ref.dtype)
    return kern

def run(variant, bq, bk, B=8, Sp=5120, H=16, D=88):
    q = jnp.zeros((B, H, Sp, D), jnp.bfloat16); k = jnp.zeros((B, H, Sp, D), jnp.bfloat16); v = jnp.zeros((B, H, Sp, D), jnp.bfloat16)
    grid = (B, H, Sp // bq, Sp // bk)
    f = pl.pallas_call(
        functools.partial(make_kernel(variant), scale=0.107),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,1,bq,D), lambda b,h,iq,ik: (b,h,iq,0)),
            pl.BlockSpec((1,1,bk,D), lambda b,h,iq,ik: (b,h,ik,0)),
            pl.BlockSpec((1,1,bk,D), lambda b,h,iq,ik: (b,h,ik,0)),
        ],
        out_specs=pl.BlockSpec((1,1,bq,D), lambda b,h,iq,ik: (b,h,iq,0)),
        out_shape=jax.ShapeDtypeStruct((B,H,Sp,D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bq,D), jnp.float32), pltpu.VMEM((bq,128), jnp.float32), pltpu.VMEM((bq,128), jnp.float32)],
    )
    jf = jax.jit(lambda q,k,v: f(q,k,v))
    t = timeit(jf, q, k, v)
    print(f"{variant} bq={bq} bk={bk}: {t*1e3:.2f} ms")

for variant in ["exp", "exp2", "noexp", "bf16exp"]:
    run(variant, 1024, 1024)
