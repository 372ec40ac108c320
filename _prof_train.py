"""Finetune train-step config sweep on the real chip."""
import time
import dataclasses
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import optax

from internvideo_tpu.models.internvideo2 import InternVideo2, make_config
from internvideo_tpu.train.engines.finetune import FinetuneConfig, make_finetune_step
from internvideo_tpu.train.state import TrainState

base = make_config(
    "1B", num_frames=16, img_size=224, num_classes=400,
    dtype="bfloat16", param_dtype="bfloat16", attn_impl="pallas",
    mlp_act="gelu_tanh",
)

for tb, remat in ((4, True), (4, False), (8, True)):
    cfg = dataclasses.replace(base, remat=remat)
    model = InternVideo2(cfg)
    video = jnp.zeros((tb, 16, 224, 224, 3), jnp.bfloat16)
    labels = jnp.zeros((tb,), jnp.int32)
    try:
        params = jax.jit(model.init)(jax.random.key(0), video)["params"]
        tx = optax.sgd(1e-4)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params), tx=tx,
                           apply_fn=model.apply)
        step = jax.jit(make_finetune_step(
            model, FinetuneConfig(mixup=None, num_classes=400)),
            donate_argnums=(0,))

        def run(n, state):
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, {"video": video, "label": labels},
                                jax.random.key(1))
            float(jax.device_get(m["loss"]))
            return time.perf_counter() - t0, state

        _, state = run(1, state)
        _, state = run(1, state)
        base_t, state = run(1, state)
        tot, state = run(7, state)
        print(f"b={tb} remat={remat}: {tb*6/max(tot-base_t,1e-9):.2f} clips/s")
    except Exception as e:
        print(f"b={tb} remat={remat}: FAIL {type(e).__name__} {str(e)[:100]}")
