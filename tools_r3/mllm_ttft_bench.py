"""Long-video MLLM time-to-first-token on the real chip.

The InternVideo2.5 headline serving workload (BASELINE.md: up to 1,024
frames @ fps 4, HiCo-R16 = 16 tokens per merged frame): a long clip through
the 27-layer vision tower, HiCo token compression, placeholder scatter, and
the LLM prefill — the full latency a user sees before the first token.

Model: default-shape InternVideo3 vision tower (1152d/27L) + the same
2B-class M²LA text model as tools_r3/serve_bench.py (bf16 8B params do not
fit the 16 GB v5e).

Usage: python -u tools_r3/mllm_ttft_bench.py [--frames 128] [--text 64]
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

import jax.numpy as jnp
import numpy as np

from internvideo_tpu.models.mllm import MLLMConfig, VideoMLLM
from internvideo_tpu.models.presets import qwen3_2b_mla
from internvideo_tpu.models.vision_tower import VisionTowerConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--text", type=int, default=64)
    ap.add_argument("--hico", type=int, default=16)
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print(json.dumps({"error": "not on tpu"}))
        return

    text_cfg = qwen3_2b_mla()
    cfg = MLLMConfig(
        vision=VisionTowerConfig(
            text_hidden_size=2560, dtype="bfloat16",
            param_dtype="bfloat16",
        ),
        text=text_cfg,
        hico_tokens_per_frame=args.hico,
    )
    model = VideoMLLM(cfg)

    merged_frames = args.frames // cfg.vision.temporal_patch_size
    n_visual = merged_frames * args.hico
    total = n_visual + args.text
    ids = np.full((1, total), 11, np.int32)
    ids[0, :n_visual] = cfg.video_token_id
    ids = jnp.asarray(ids)
    video = jnp.zeros((1, args.frames, args.img, args.img, 3), jnp.bfloat16)

    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.key(0), ids, video)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e9:.2f}B ({args.frames} frames -> "
          f"{n_visual} visual tokens, prefill {total})  "
          f"init {time.perf_counter()-t0:.1f}s", flush=True)

    max_len = total + 64

    @jax.jit
    def ttft(params, ids, video):
        caches = model.apply(
            params, 1, max_len, jnp.bfloat16, method="init_cache"
        )
        out = model.apply(params, ids, video, caches, method="prefill")
        return out.logits[:, -1].argmax(-1).astype(jnp.int32)

    def run():
        t0 = time.perf_counter()
        tok = ttft(params, ids, video)
        float(jax.device_get(jnp.sum(tok[:1].astype(jnp.float32))))
        return time.perf_counter() - t0

    run()  # compile
    run()  # warm
    lats = sorted(run() for _ in range(7))
    p50 = lats[len(lats) // 2]
    print(f"TTFT p50: {p50*1e3:.1f} ms "
          f"(min {lats[0]*1e3:.1f}, max {lats[-1]*1e3:.1f}) -> "
          f"{args.frames/p50:,.0f} frames/s ingest", flush=True)
    print(json.dumps({
        "mllm_ttft_ms": round(p50 * 1e3, 1),
        "mllm_ingest_frames_per_sec": round(args.frames / p50),
        "frames": args.frames,
        "prefill_tokens": total,
    }))


if __name__ == "__main__":
    main()
