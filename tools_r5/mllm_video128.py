"""Long-video MLLM inference pipeline, end-to-end on-chip (BASELINE #5).

The north-star config the reference evaluates but never benches as one
program: 128 frames -> vision tower -> HiCo token compression -> paged
multimodal prefill -> steady-state paged decode (InternVideo2.5/README.md:
26-28 HiCo-R16; InternVideo3_eval/scripts/eval_videomme.sh:17-31 runs up to
1024 frames through this chain per question).

Model: presets.internvideo25_hico_2b — the InternVideo3-8B vision tower
(1152d/27L) + HiCo-R16 + the 2B-class M²LA text tower (the 8B architecture
scaled to fit one 16 GB v5e).

Measures (each amortized over N iters with a one-iteration baseline
subtracted — tunnel sync rules, see CLAUDE.md):
  * vision_ms      — vision tower + HiCo compression alone (the TTFT input)
  * ttft_ms        — full prefill_paged: vision + scatter + 1056-token
                     paged prompt pass + first-token argmax, B=1
  * prefill_nohico — same pipeline without HiCo (3168-token prompt,
                     deepstack on): is the token compression visible as
                     prefill speedup?
  * decode tok/s   — steady-state decode at the post-prefill context,
                     B=1 (per-request latency) and B=8 (serving batch)

Usage: python tools_r5/mllm_video128.py [--cpu] (cpu = tiny-dims smoke)
"""

import argparse
import dataclasses
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def _sync(x):
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def _amortized_ms(fn, n):
    """fn() -> syncable array. Returns per-call ms, baseline-subtracted."""
    _sync(fn())  # warm (compile already done by caller)
    t0 = time.perf_counter()
    _sync(fn())
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    _sync(out)
    return max(time.perf_counter() - t0 - base, 1e-9) / (n - 1) * 1e3


def build(cpu: bool, hico: bool):
    from internvideo_tpu.models.mllm import MLLMConfig, VideoMLLM
    from internvideo_tpu.models.presets import internvideo25_hico_2b

    if cpu:
        from internvideo_tpu.models.llm import LLMConfig
        from internvideo_tpu.models.vision_tower import VisionTowerConfig
        from internvideo_tpu.nn.mla import MLAConfig

        cfg = MLLMConfig(
            vision=VisionTowerConfig(
                hidden_size=32, num_layers=2, num_heads=2,
                intermediate_size=64, patch_size=8, temporal_patch_size=2,
                spatial_merge_size=2, pos_embed_grid=6, text_hidden_size=64,
                deepstack_indexes=(0, 1), attn_impl="xla",
            ),
            text=LLMConfig(
                vocab_size=512, hidden_size=64, num_layers=2,
                intermediate_size=128, mrope_section=None,
                mla=MLAConfig(
                    hidden_size=64, num_heads=2, kv_lora_rank=32,
                    qk_rope_head_dim=16, qk_nope_head_dim=16, v_head_dim=16,
                ),
                attn_impl="xla",
            ),
            hico_tokens_per_frame=4 if hico else None,
            image_token_id=500, video_token_id=501,
        )
        frames, img = 8, 32
    else:
        cfg = internvideo25_hico_2b()
        if not hico:
            cfg = dataclasses.replace(cfg, hico_tokens_per_frame=None)
        frames, img = 128, 224
    return VideoMLLM(cfg), cfg, frames, img


def visual_token_count(cfg, frames, img):
    merged_frames = frames // cfg.vision.temporal_patch_size
    per_frame = (img // cfg.vision.patch_size
                 // cfg.vision.spatial_merge_size) ** 2
    if cfg.hico_tokens_per_frame:
        per_frame = cfg.hico_tokens_per_frame
    return merged_frames * per_frame


def run(cpu: bool, hico: bool, decode_batches=(1, 8)):
    from internvideo_tpu.models.llm import init_paged_cache

    model, cfg, frames, img = build(cpu, hico)
    nv = visual_token_count(cfg, frames, img)
    n_text = 32
    prompt_len = nv + n_text
    page = 16 if cpu else 64
    decode_steps = 8 if cpu else 64
    max_len = prompt_len + decode_steps + 1
    iters = 2 if cpu else 10
    tag = "hico" if cfg.hico_tokens_per_frame else "nohico"

    # init at a small frame count (param shapes are frame-independent);
    # placeholder count matches that init clip so the trace is consistent
    init_frames = 2 * cfg.vision.temporal_patch_size
    init_nv = visual_token_count(cfg, init_frames, img)
    init_video = jnp.zeros((1, init_frames, img, img, 3), jnp.bfloat16)
    init_ids = np.full((1, init_nv + 4), 7, np.int32)
    init_ids[0, 2:2 + init_nv] = cfg.video_token_id
    t0 = time.perf_counter()
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(init_ids), init_video
    )
    jax.block_until_ready(jax.tree.leaves(params)[0])
    print(f"[{tag}] init {time.perf_counter() - t0:.1f}s  "
          f"visual_tokens={nv} prompt_len={prompt_len}", flush=True)

    video = jnp.zeros((1, frames, img, img, 3), jnp.bfloat16)
    ids = np.full((1, prompt_len), 7, np.int32)
    ids[0, 0] = cfg.vision_start_token_id
    ids[0, 1:1 + nv] = cfg.video_token_id
    ids[0, 1 + nv] = cfg.vision_end_token_id
    ids = jnp.asarray(ids)

    # --- vision tower + HiCo alone -------------------------------------
    @jax.jit
    def vision_fn(p, v):
        return model.apply(p, v, method="encode_video")[0]

    vis_ms = _amortized_ms(lambda: vision_fn(params, video), iters)
    print(f"[{tag}] vision+compress: {vis_ms:.1f} ms "
          f"({nv} tokens out)", flush=True)

    # --- TTFT: full paged multimodal prefill ---------------------------
    pages, tables = init_paged_cache(cfg.text, 1, max_len, page,
                                     jnp.bfloat16)

    @partial(jax.jit, donate_argnums=(3,))
    def prefill_fn(p, ids, video, pages):
        out = model.apply(p, ids, video, pages, tables, page,
                          method="prefill_paged")
        return out.logits[:, -1].argmax(-1).astype(jnp.int32), out.caches

    state = {"pages": pages}

    def ttft_once():
        tok, state["pages"] = prefill_fn(params, ids, video, state["pages"])
        return tok

    ttft_ms = _amortized_ms(ttft_once, iters)
    print(f"[{tag}] TTFT (vision+prefill+first token): {ttft_ms:.1f} ms "
          f"(prefill-only ~{ttft_ms - vis_ms:.1f} ms)", flush=True)
    pages = state["pages"]

    # --- steady-state decode -------------------------------------------
    for b in decode_batches:
        dpages, dtables = init_paged_cache(cfg.text, b, max_len, page,
                                           jnp.bfloat16)

        @partial(jax.jit, donate_argnums=(2,))
        def decode_fn(p, tok, pgs, lens, tbl=dtables):
            out = model.apply(p, tok[:, None], pgs, tbl, lens, page,
                              method="decode_step_paged")
            return out.logits[:, -1].argmax(-1).astype(jnp.int32), out.caches

        st = {"pages": dpages, "len": jnp.full((b,), prompt_len, jnp.int32),
              "tok": jnp.zeros((b,), jnp.int32)}

        def dec_once(st=st):
            st["tok"], st["pages"] = decode_fn(
                params, st["tok"], st["pages"], st["len"])
            st["len"] = st["len"] + 1
            return st["tok"]

        ms = _amortized_ms(dec_once, decode_steps)
        print(f"[{tag}] decode B={b}: {ms:.2f} ms/step = "
              f"{b / ms * 1e3:,.0f} tok/s @ctx~{prompt_len}", flush=True)
        del dpages, st
    del pages, params
    import gc

    gc.collect()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nohico-only", action="store_true")
    ap.add_argument("--hico-only", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.nohico_only:
        run(args.cpu, hico=True)
    if not args.hico_only:
        # no-HiCo comparison: same frames, 3136 visual tokens, deepstack on
        run(args.cpu, hico=False, decode_batches=(1,))


if __name__ == "__main__":
    main()
