import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from internvideo_tpu.models.internvideo2 import InternVideo2, make_config

def sync(x): return float(jax.device_get(jnp.sum(x.reshape(-1)[:1])))
cfg = make_config("1B", num_frames=16, img_size=224, num_classes=0,
                  dtype="bfloat16", param_dtype="bfloat16",
                  attn_impl="pallas", mlp_act="gelu_tanh")
model = InternVideo2(cfg)
for B in (16,):
    video = jnp.zeros((B, 16, 224, 224, 3), jnp.bfloat16)
    try:
        params = jax.jit(model.init)(jax.random.key(0), video)
        f = jax.jit(lambda p, v: model.apply(p, v).pooled)
        out = f(params, video); sync(out)
        t0 = time.perf_counter(); out = f(params, video); sync(out); base = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(6): out = f(params, video)
        sync(out)
        dt = time.perf_counter() - t0 - base
        print(f"B={B}: {B*5/dt:.2f} clips/s")
    except Exception as e:
        print(f"B={B}: FAIL {type(e).__name__} {str(e)[:80]}")
