"""Headline benchmark: InternVideo2-1B encoder throughput (clips/s/chip).

North star (BASELINE.json): 16 frames @ 224px, bf16. Target 150 clips/s/chip
(written for v5p; on this v5e tunnel peak bf16 is ~197 TFLOPs and the dense
16f forward costs ~12 TFLOP/clip, so ~16 clips/s is the speed of light —
vs_baseline is reported against the 150 target regardless).

NOTE on timing: on the axon-tunneled TPU, block_until_ready() does not
synchronize with device execution — we force a sync by fetching a 4-byte
scalar derived from the output, and subtract the one-iteration baseline.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import jax

# Persistent compile cache — the axon tunnel's remote compile is slow and
# flaky; cache hits make repeated bench runs cheap.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from internvideo_tpu.models.internvideo2 import InternVideo2, make_config

TARGET_CLIPS_PER_SEC = 150.0


def main():
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        size, frames, img, batch, iters = "1B", 16, 224, 8, 10
    else:  # CPU smoke: tiny proxy so the script always runs end-to-end
        size, frames, img, batch, iters = "S", 4, 56, 2, 3

    cfg = make_config(
        size,
        num_frames=frames,
        img_size=img,
        num_classes=0,
        dtype="bfloat16",
        param_dtype="bfloat16",
        attn_impl="pallas" if on_tpu else "xla",
    )
    model = InternVideo2(cfg)
    video = jnp.zeros((batch, frames, img, img, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), video)

    @jax.jit
    def fwd(p, v):
        return model.apply(p, v).pooled

    @jax.jit
    def _scalar(x):
        return jnp.sum(x[:1, :1])

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fwd(params, video)
        float(jax.device_get(_scalar(out)))  # true device sync
        return time.perf_counter() - t0

    run(1)  # compile + warm
    run(1)
    base = run(1)
    total = run(iters + 1)
    dt = max(total - base, 1e-9)

    clips_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": f"internvideo2_{size}_encoder_clips_per_sec_per_chip_{frames}f{img}",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / TARGET_CLIPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
