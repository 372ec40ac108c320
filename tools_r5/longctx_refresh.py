"""Refresh the long-context anchors (VERDICT r4 item 4b).

The r4 32k/64k numbers (PERF.md "Packed causal training") predate the
packed-segment block skipping + DMA elision kernels; this re-measures the
same 0.51B recipe (tools_r4/longctx_bench.py model: 16L/1536h MLA, remat,
chunked CE, 8192-token packed segments, full train step, single chip) and
adds the missing MFU / speed-of-light accounting.

FLOPs model (per step, printed alongside tokens/s):
  GEMMs: 6 * N_matmul * T       (fwd 2NT + bwd 4NT; the remat re-forward
                                 is real work the chip does but is NOT
                                 credited — MFU here is model-FLOPs MFU,
                                 the convention BASELINE.json uses)
  attn : per layer, n_seg * (S_seg^2/2) * H * (2*d_qk + 2*d_v) * 3
         (QK^T + PV, causal-halved, fwd=1 bwd=2)
Peak = 197 TFLOPs bf16 (measured, CLAUDE.md). A second column credits the
remat re-forward (+2NT + attn refwd) as "hw util" for the decomposition.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import optax  # noqa: E402
from flax import linen as nn  # noqa: E402

sys.path.insert(0, "/root/repo")
from internvideo_tpu.train.engines.sft import SFTConfig, make_sft_step  # noqa: E402
from internvideo_tpu.train.optim import OptimizerConfig, build_optimizer  # noqa: E402
from internvideo_tpu.train.state import TrainState  # noqa: E402
from tools_r4.longctx_bench import _SFTWrap, build_model, packed_batch  # noqa: E402

PEAK = 197e12


def step_flops(cfg, n_matmul, seq_len, seg_len):
    l, h = cfg.num_layers, cfg.mla.num_heads
    dqk = cfg.mla.qk_rope_head_dim + cfg.mla.qk_nope_head_dim
    dv = cfg.mla.v_head_dim
    n_seg = seq_len // seg_len
    attn_fwd = l * n_seg * (seg_len**2 / 2) * h * 2 * (dqk + dv)
    gemm_fwd = 2 * n_matmul * seq_len
    model = 3 * (gemm_fwd + attn_fwd)          # fwd + 2x bwd
    hw = model + (gemm_fwd + attn_fwd)         # + remat re-forward
    return model, hw


def main():
    cfg, inner = build_model()
    model = _SFTWrap(inner)
    rng = np.random.default_rng(0)
    ids0 = jnp.zeros((1, 256), jnp.int32)
    abstract = jax.eval_shape(inner.init, jax.random.key(0), ids0)
    flat = jax.tree_util.tree_leaves_with_path(abstract)
    n_matmul = sum(
        int(np.prod(a.shape)) for p, a in flat
        if a.ndim >= 2 and "embed" not in jax.tree_util.keystr(p).lower()
    )
    ntot = sum(int(np.prod(a.shape)) for _, a in flat)
    print(f"params {ntot/1e9:.2f} B (matmul {n_matmul/1e9:.2f} B)")

    params = jax.jit(inner.init)(jax.random.key(0), ids0)
    params = {"language_model": nn.unbox(params)["params"]}

    for seq_len, opt_name in ((32768, "adamw"), (65536, "adafactor")):
        if opt_name == "adamw":
            tx, _ = build_optimizer(
                OptimizerConfig(lr=1e-4, warmup_steps=2, total_steps=100),
                params)
        else:
            tx = optax.adafactor(1e-4)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
        )
        step = jax.jit(make_sft_step(model, SFTConfig(ce_chunk_size=2048)))
        batch = packed_batch(seq_len, 8192, rng)
        state, metrics = step(state, batch, jax.random.key(1))
        float(metrics["loss"])  # sync
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.key(2))
        float(metrics["loss"])
        base = time.perf_counter() - t0
        n = 6
        t0 = time.perf_counter()
        for i in range(n):
            state, metrics = step(state, batch, jax.random.key(i))
        float(metrics["loss"])
        dt = (time.perf_counter() - t0 - base) / (n - 1)
        mf, hf = step_flops(cfg, n_matmul, seq_len, 8192)
        print(
            f"S={seq_len} {opt_name}: {seq_len/dt:,.0f} tok/s "
            f"({dt*1e3:.0f} ms/step) model-MFU {mf/dt/PEAK*100:.1f}% "
            f"hw-util {hf/dt/PEAK*100:.1f}% "
            f"(attn share of model FLOPs "
            f"{(mf - 6*n_matmul*seq_len)/mf*100:.0f}%)",
            flush=True,
        )
        del state, step
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                print(f"  hbm in use {stats.get('bytes_in_use', 0)/1e9:.2f} "
                      f"GB / limit {stats.get('bytes_limit', 0)/1e9:.2f} GB")
        except Exception:  # noqa: BLE001
            pass


if __name__ == "__main__":
    main()
