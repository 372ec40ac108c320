import dataclasses, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from flax import linen as nn_linen
from internvideo_tpu.models.internvideo2 import InternVideo2, make_config
from internvideo_tpu.ops.quant import quantize_params_like

def _timer(fn, args, batch, iters, scalar):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(jax.device_get(scalar(out)))
        return time.perf_counter() - t0
    run(1); run(1)
    base = run(1)
    total = run(iters + 1)
    return batch * iters / max(total - base, 1e-9)

batch = int(sys.argv[1])
frames, img, iters = 16, 224, 10
cfg = make_config("1B", num_frames=frames, img_size=img, num_classes=0,
                  dtype="bfloat16", param_dtype="bfloat16",
                  attn_impl="pallas", mlp_act="gelu_tanh")
video = jnp.zeros((batch, frames, img, img, 3), jnp.bfloat16)
model = InternVideo2(cfg)
params = jax.jit(model.init)(jax.random.key(0), video)

@jax.jit
def _scalar(x):
    return jnp.sum(x.reshape(-1)[:1])

@jax.jit
def fwd(p, v):
    return model.apply(p, v).pooled

dense = _timer(fwd, (params, video), batch, iters, _scalar)
print(f"B={batch} dense {dense:.2f} clips/s", flush=True)

qmodel = InternVideo2(dataclasses.replace(cfg, quant="int8"))
qabstract = nn_linen.unbox(jax.eval_shape(qmodel.init, jax.random.key(0), video))["params"]
qparams = {"params": quantize_params_like(qabstract, nn_linen.unbox(params)["params"])}
del params

@jax.jit
def int8_fwd(p, v):
    return qmodel.apply(p, v).pooled

q = _timer(int8_fwd, (qparams, video), batch, iters, _scalar)
print(f"B={batch} int8-fused {q:.2f} clips/s  ({q/dense:+.1%} vs dense)", flush=True)
