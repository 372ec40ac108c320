"""Remat-policy sweep for the finetune train step."""
import time
import dataclasses
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import optax
from flax import linen as nn

import internvideo_tpu.models.internvideo2 as iv2
from internvideo_tpu.models.internvideo2 import InternVideo2, make_config
from internvideo_tpu.train.engines.finetune import FinetuneConfig, make_finetune_step
from internvideo_tpu.train.state import TrainState
from internvideo_tpu.nn.transformer import Block

POLICIES = {
    "full": None,
    "dots_nobatch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    "checkpoint_dots": jax.checkpoint_policies.checkpoint_dots,
}


def run(policy_name, tb):
    policy = POLICIES[policy_name]
    orig = nn.remat
    # monkeypatch the remat call inside the model to use the policy
    def remat_with_policy(cls, **kw):
        if policy is not None:
            kw["policy"] = policy
        return orig(cls, **kw)
    iv2.nn.remat = remat_with_policy
    try:
        cfg = make_config("1B", num_frames=16, img_size=224, num_classes=400,
                          dtype="bfloat16", param_dtype="bfloat16",
                          attn_impl="pallas", mlp_act="gelu_tanh", remat=True)
        model = InternVideo2(cfg)
        video = jnp.zeros((tb, 16, 224, 224, 3), jnp.bfloat16)
        labels = jnp.zeros((tb,), jnp.int32)
        params = jax.jit(model.init)(jax.random.key(0), video)["params"]
        tx = optax.sgd(1e-4)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params), tx=tx,
                           apply_fn=model.apply)
        step = jax.jit(make_finetune_step(
            model, FinetuneConfig(mixup=None, num_classes=400)),
            donate_argnums=(0,))

        def loop(n, state):
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, {"video": video, "label": labels},
                                jax.random.key(1))
            float(jax.device_get(m["loss"]))
            return time.perf_counter() - t0, state

        _, state = loop(1, state)
        _, state = loop(1, state)
        base, state = loop(1, state)
        tot, state = loop(7, state)
        print(f"{policy_name} b={tb}: {tb*6/max(tot-base,1e-9):.2f} clips/s")
    except Exception as e:
        print(f"{policy_name} b={tb}: FAIL {type(e).__name__} {str(e)[:90]}")
    finally:
        iv2.nn.remat = orig


for name in ("dots_nobatch", "checkpoint_dots", "full"):
    run(name, 4)
