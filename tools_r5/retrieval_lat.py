"""Retrieval-query latency: old blocking-p50 vs amortized device time.

VERDICT r4 weak #1: `videoclip_retrieval_p50_ms` swung 31.3 -> 25.0 ->
40.3 across rounds. This script reproduces both methodologies in one
fresh process so the swing can be attributed:

  * old: 20 single blocking device_get round-trips, report p50 — each
    sample is (tunnel RTT + device time), so host jitter dominates.
  * new: 100 back-to-back dispatches with ONE sync, subtract the
    one-iteration baseline (the bench _timer protocol) — device time only.

Run three times in fresh processes; the new statistic must agree within
+-10% (the bench now reports it as videoclip_retrieval_p50_ms).
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp


def main():
    from internvideo_tpu.models.presets import internvideo2_stage2_1b
    from internvideo_tpu.models.videoclip import VideoCLIP

    vc_cfg = internvideo2_stage2_1b()
    vc = VideoCLIP(vc_cfg)
    ids = jnp.zeros((1, 32), jnp.int32)
    mask = jnp.ones((1, 32), jnp.int32)
    vvid = jnp.zeros(
        (1, vc_cfg.vision.num_frames, vc_cfg.vision.img_size,
         vc_cfg.vision.img_size, 3), jnp.bfloat16,
    )
    vparams = jax.jit(vc.init)(jax.random.key(0), vvid, ids, mask)
    bank = jnp.zeros((1000, vc_cfg.embed_dim), jnp.bfloat16)

    @jax.jit
    def query(p, ids, mask, bank):
        def run(m, ids, mask):
            _, pooled = m.encode_text(ids, mask)
            return m.text_proj(pooled)

        proj = vc.apply(p, ids, mask, method=run)
        proj = proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)
        return jnp.argmax(proj.astype(jnp.bfloat16) @ bank.T, axis=-1)

    def _q():
        return query(vparams, ids, mask, bank)

    float(jax.device_get(_q()[0]))  # compile
    float(jax.device_get(_q()[0]))

    # old methodology: blocking per-call samples
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        float(jax.device_get(_q()[0]))
        lats.append((time.perf_counter() - t0) * 1e3)
    lats.sort()
    p50 = lats[len(lats) // 2]
    print(f"old blocking: p50={p50:.2f} ms  min={lats[0]:.2f}  "
          f"max={lats[-1]:.2f} ms (spread = tunnel RTT jitter)")

    # new methodology: amortized device time
    for rep in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(_q()[0]))
        base = time.perf_counter() - t0
        n = 100
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = _q()
        float(jax.device_get(out[0]))
        dt = max(time.perf_counter() - t0 - base, 1e-9) / (n - 1)
        print(f"amortized device time rep{rep}: {dt * 1e3:.2f} ms/query")


if __name__ == "__main__":
    main()
