"""ServingEngine (continuous batching) throughput on the real chip.

Staggered workload: more requests than decode slots, mixed prompt lengths,
so the engine must admit/recycle mid-stream — the scenario continuous
batching exists for. Reports aggregate generated tok/s for the same
2B-class M²LA model as tools_r3/serve_bench.py; compare against the
static-batch steady-state decode number from that script (the engine adds
scheduling + horizon-chunk host syncs on top).

Usage: python -u tools_r3/engine_bench.py [--requests 16] [--horizon 32]
"""

import argparse
import json
import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from internvideo_tpu.models.llm import MLATransformer
from internvideo_tpu.models.presets import qwen3_2b_mla
from internvideo_tpu.serve import ServingEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--horizon", type=int, default=32)
    args = ap.parse_args()

    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on tpu"}))
        return

    cfg = qwen3_2b_mla()
    model = MLATransformer(cfg)
    import jax.numpy as jnp

    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32)
    )

    rng = np.random.default_rng(0)

    def make_engine():
        return ServingEngine(
            model, params, max_batch=args.max_batch, page_size=64,
            num_pages=args.max_batch * 16, max_len=640,
            prompt_buckets=(128, 256), eos_token_id=None,
            decode_horizon=args.horizon,
        )

    def run_load(eng, n_req, lengths=None):
        if lengths is None:
            lengths = rng.integers(48, 256, size=n_req)
        prompts = [
            rng.integers(1, cfg.vocab_size, size=int(n)).astype(np.int32)
            for n in lengths
        ]
        for p in prompts:
            eng.submit(p, args.new)
        t0 = time.perf_counter()
        outs = eng.run()
        dt = time.perf_counter() - t0
        toks = sum(len(v) for v in outs.values())
        return toks, dt

    eng = make_engine()
    run_load(eng, 2, lengths=[100, 200])  # compile BOTH buckets + chunk
    eng.reset()  # same engine for the measured load: its jitted partials
    # stay warm (a fresh engine would retrace + reload the compile cache
    # inside the timed region, deflating tok/s)
    toks, dt = run_load(eng, args.requests)
    tps = toks / dt
    print(f"engine: {toks} tokens over {args.requests} reqs in {dt:.2f}s "
          f"-> {tps:,.0f} tok/s (horizon={args.horizon}, "
          f"slots={args.max_batch})", flush=True)
    print(json.dumps({
        "serving_engine_tokens_per_sec": round(tps),
        "requests": args.requests,
        "decode_horizon": args.horizon,
    }))


if __name__ == "__main__":
    main()
