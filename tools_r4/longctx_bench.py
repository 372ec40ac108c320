"""Single-chip packed long-context SFT step, executed on the real TPU.

VERDICT r3 item 6: the 262k sp=4 recipe existed only as trace+SPMD-lower;
this anchors it with measured single-chip executions at 32k/64k packed
causal tokens (reference production recipe
configs/internvideo3_sft_long.py:64-66,180 runs pack_max_length=262144 at
sp=4 across hosts — per-chip share 65,536 tokens, exactly the 64k point).

Model: a ~0.6B MLA LLM (16 layers, hidden 1536, SwiGLU 4096, 16 heads,
kv_lora 512) with remat — big enough that the step is GEMM/flash-bound,
small enough that params+adam states leave HBM for 64k activations.
Full train step: packed segment-id flash attention -> chunked CE ->
adamw. Prints tokens/s per point + device memory stats when available.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from flax import linen as nn  # noqa: E402

from internvideo_tpu.models.llm import LLMConfig, MLATransformer  # noqa: E402
from internvideo_tpu.nn.mla import MLAConfig  # noqa: E402
from internvideo_tpu.train.engines.sft import SFTConfig, make_sft_step  # noqa: E402
from internvideo_tpu.train.optim import OptimizerConfig, build_optimizer  # noqa: E402
from internvideo_tpu.train.state import TrainState  # noqa: E402


def build_model():
    cfg = LLMConfig(
        vocab_size=32768, hidden_size=1536, num_layers=16,
        intermediate_size=4096, mrope_section=None, rope_theta=5e6,
        mla=MLAConfig(
            hidden_size=1536, num_heads=16, kv_lora_rank=512,
            qk_rope_head_dim=64, qk_nope_head_dim=64, v_head_dim=64,
            qkv_bias=False, q_bias=False,
        ),
        dtype="bfloat16", param_dtype="bfloat16", remat=True,
    )
    return cfg, MLATransformer(cfg)


class _SFTWrap(nn.Module):
    """Adapts MLATransformer to the (input_ids, video, ...) SFT contract
    (the engine reads params["language_model"]["lm_head"] for chunked CE)."""
    language_model: MLATransformer

    def __call__(self, input_ids, video=None, *, position_ids=None,
                 segment_ids=None, with_logits=False):
        return self.language_model(
            input_ids, position_ids=position_ids, segment_ids=segment_ids,
            with_logits=with_logits,
        )


def packed_batch(seq_len: int, seg_len: int, rng):
    n = seq_len // seg_len
    segs = np.repeat(np.arange(n, dtype=np.int32), seg_len)
    pos = np.tile(np.arange(seg_len, dtype=np.int32), n)
    ids = rng.integers(0, 32000, (1, seq_len)).astype(np.int32)
    labels = rng.integers(0, 32000, (1, seq_len)).astype(np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "segment_ids": jnp.asarray(segs)[None],
        "position_ids": jnp.asarray(pos)[None],
        "labels": jnp.asarray(labels),
    }


def main():
    cfg, inner = build_model()
    model = _SFTWrap(inner)
    rng = np.random.default_rng(0)
    ids0 = jnp.zeros((1, 256), jnp.int32)
    abstract = jax.eval_shape(inner.init, jax.random.key(0), ids0)
    nparams = sum(
        int(np.prod(a.shape)) for a in jax.tree.leaves(abstract)
    )
    print(f"params {nparams/1e9:.2f} B ({nparams*2/1e9:.1f} GB bf16)")

    params = jax.jit(inner.init)(jax.random.key(0), ids0)
    params = {"language_model": nn.unbox(params)["params"]}

    opt_cfg = OptimizerConfig(lr=1e-4, warmup_steps=2, total_steps=100)
    tx, _ = build_optimizer(opt_cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )
    step = jax.jit(make_sft_step(model, SFTConfig(ce_chunk_size=2048)))

    for seq_len, seg_len in ((32768, 8192), (65536, 8192)):
        try:
            batch = packed_batch(seq_len, seg_len, rng)
            t_state = state
            t_state, metrics = step(t_state, batch, jax.random.key(1))
            float(metrics["loss"])  # sync
            t0 = time.perf_counter()
            t_state, metrics = step(t_state, batch, jax.random.key(2))
            float(metrics["loss"])
            base = time.perf_counter() - t0
            n = 6
            t0 = time.perf_counter()
            for i in range(n):
                t_state, metrics = step(t_state, batch, jax.random.key(i))
            float(metrics["loss"])
            dt = (time.perf_counter() - t0 - base) / (n - 1)
            print(f"S={seq_len}: {seq_len/dt:,.0f} tokens/s "
                  f"({dt*1e3:.0f} ms/step, loss {float(metrics['loss']):.3f})")
            del t_state
        except Exception as e:  # noqa: BLE001
            print(f"S={seq_len}: failed {type(e).__name__}: {str(e)[:160]}")
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                print(f"  hbm in use {stats.get('bytes_in_use', 0)/1e9:.2f} GB"
                      f" / limit {stats.get('bytes_limit', 0)/1e9:.2f} GB")
        except Exception:  # noqa: BLE001
            pass


if __name__ == "__main__":
    main()
