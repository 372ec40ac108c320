"""64k packed-causal step with adafactor (adamw f32 moments OOM at 64k;
factored second moments are the standard long-context recipe)."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import optax
from flax import linen as nn
from internvideo_tpu.train.engines.sft import SFTConfig, make_sft_step
from internvideo_tpu.train.state import TrainState
from tools_r4.longctx_bench import _SFTWrap, build_model, packed_batch

cfg, inner = build_model()
model = _SFTWrap(inner)
rng = np.random.default_rng(0)
params = jax.jit(inner.init)(jax.random.key(0), jnp.zeros((1, 256), jnp.int32))
params = {"language_model": nn.unbox(params)["params"]}
tx = optax.adafactor(1e-4)
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx, apply_fn=model.apply)
step = jax.jit(make_sft_step(model, SFTConfig(ce_chunk_size=2048)))
seq_len = 65536
batch = packed_batch(seq_len, 8192, rng)
state, metrics = step(state, batch, jax.random.key(1))
print("first step loss", float(metrics["loss"]), flush=True)
t0 = time.perf_counter()
state, metrics = step(state, batch, jax.random.key(2))
float(metrics["loss"])
base = time.perf_counter() - t0
n = 4
t0 = time.perf_counter()
for i in range(n):
    state, metrics = step(state, batch, jax.random.key(i))
float(metrics["loss"])
dt = (time.perf_counter() - t0 - base) / (n - 1)
print(f"S={seq_len}: {seq_len/dt:,.0f} tokens/s ({dt*1e3:.0f} ms/step, "
      f"loss {float(metrics['loss']):.3f})")
try:
    stats = jax.devices()[0].memory_stats()
    if stats:
        print(f"hbm in use {stats.get('bytes_in_use',0)/1e9:.2f} GB / "
              f"limit {stats.get('bytes_limit',0)/1e9:.2f} GB")
except Exception:
    pass
