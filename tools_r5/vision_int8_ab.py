"""On-chip A/B: the InternVideo3-8B vision tower dense-bf16 vs int8.

After the batched-frame attention fix the tower is GEMM-dominated and
compute-bound at ~82% of bf16 peak (PERF.md "r5 follow-up: the named
TTFT lever") — exactly the regime where dynamic int8 wins (the xla-i8
MLP-stack diagnostic measured 1.21x on gelu-residual chains). This
measures the tower forward at the 128-frame pipeline shape with
VisionTowerConfig.quant=None vs "int8" (same timing recipe as
tools_r5/mllm_video128.py's vision stage).
"""
import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.models.vision_tower import VisionTower, VisionTowerConfig
from internvideo_tpu.ops.quant import quantize_params_like


def _sync(x):
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def timeit(fn, *args, n=8):
    _sync(fn(*args)); _sync(fn(*args))
    t0 = time.perf_counter(); _sync(fn(*args))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0 - base) / (n - 1) * 1e3


def main():
    cfg = VisionTowerConfig(dtype="bfloat16", param_dtype="bfloat16")
    video = jnp.zeros((1, 128, 224, 224, 3), jnp.bfloat16)
    model = VisionTower(cfg)
    params = jax.jit(model.init)(jax.random.key(0), video)

    @jax.jit
    def fwd(p, v):
        return model.apply(p, v)[0]

    t = timeit(fwd, params, video)
    print(f"dense bf16  {t:7.1f} ms", flush=True)

    qmodel = VisionTower(dataclasses.replace(cfg, quant="int8"))
    qabstract = nn.unbox(
        jax.eval_shape(qmodel.init, jax.random.key(0), video)
    )
    qparams = quantize_params_like(qabstract, nn.unbox(params))
    del params

    @jax.jit
    def qfwd(p, v):
        return qmodel.apply(p, v)[0]

    t_q = timeit(qfwd, qparams, video)
    print(f"int8        {t_q:7.1f} ms  ({t/t_q:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
