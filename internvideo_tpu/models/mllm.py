"""InternVideo3-style video MLLM: vision tower → projector → MLA LLM.

Parity with InternVideo3ForConditionalGeneration
(xtuner/v1/model/compose/internvideo3/modeling_internvideo3.py:38-330):

  * visual features from the tower's final layer + deepstack taps, all
    through patch mergers into the text width
  * placeholder scatter: video/image token positions in input_ids receive
    the visual embeddings (here a cumsum-gather — no dynamic shapes)
  * deepstack features are ADDED to the hidden states at the visual
    positions after each of the first len(deepstack) LLM layers
    (Qwen3-VL deepstack scheme)
  * text model: MLA (M²LA) transformer with mRoPE

Also hosts `hico_compress`: HiCo-style per-frame token compression
(InternVideo2.5, README-only upstream — 16 tokens/frame) implemented as
ToMe bipartite soft matching with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from internvideo_tpu.core.mesh import constrain
from internvideo_tpu.models.llm import LLMConfig, LLMOutput, MLATransformer
from internvideo_tpu.models.vision_tower import (
    PatchMerger,
    VisionTower,
    VisionTowerConfig,
)


@dataclasses.dataclass(frozen=True)
class MLLMConfig:
    vision: VisionTowerConfig = dataclasses.field(
        default_factory=VisionTowerConfig
    )
    # LLMConfig (M²LA) or llm_gqa.GQAConfig (dense Qwen3-VL compose)
    text: object = dataclasses.field(default_factory=LLMConfig)
    # HiCo token budget per merged frame (InternVideo2.5 HiCo-R16/R64;
    # None = no compression). Placeholder counts must match frames x R.
    hico_tokens_per_frame: "int | None" = None
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653


def scatter_visual(text_embeds, visual_embeds, visual_mask):
    """Place visual_embeds (B, Nv, D) at True positions of visual_mask (B, L).

    Static-shape scatter: position j in the sequence takes visual row
    (cumsum of mask up to j) - 1. Rows beyond the real visual count are never
    selected as long as mask.sum() == Nv per sample.

    Sharding: the merger leaves `visual_embeds` feature-sharded (tensor) with
    a replicated batch, while the gather's output is consumed batch+seq
    sharded — GSPMD cannot transition a batched gather between those layouts
    and falls back to "involuntary full rematerialization" (replicate, then
    repartition, every step). Constraining the small operand to the output's
    batch sharding with a replicated feature dim keeps the gather trivially
    partitionable: each device gathers its own batch shard, the index/seq
    dim shards freely. No-op outside a logical-axis-rules/mesh context.
    """
    visual_embeds = constrain(visual_embeds, ("batch", None, None))
    idx = jnp.cumsum(visual_mask.astype(jnp.int32), axis=1) - 1
    idx = jnp.clip(idx, 0, visual_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(
        visual_embeds, idx[..., None], axis=1
    )
    out = jnp.where(
        visual_mask[..., None], gathered.astype(text_embeds.dtype), text_embeds
    )
    return constrain(out, ("batch", "seq_act", None))


class VideoMLLM(nn.Module):
    config: MLLMConfig

    def setup(self):
        cfg = self.config
        self.vision_tower = VisionTower(cfg.vision)
        self.merger = PatchMerger(cfg.vision, name="merger")
        # deepstack mergers norm AFTER the 2x2 shuffle (modeling_projector.py
        # :67-71 use_postshuffle_norm=True); the main merger norms before
        self.deepstack_mergers = [
            PatchMerger(
                cfg.vision, use_postshuffle_norm=True,
                name=f"deepstack_merger_{i}",
            )
            for i in range(len(cfg.vision.deepstack_indexes))
        ]
        # text flavor by config class: LLMConfig -> M²LA; GQAConfig ->
        # dense GQA (the Qwen3-VL-dense compose) — same method surface
        if hasattr(cfg.text, "num_kv_heads"):
            from internvideo_tpu.models.llm_gqa import GQATransformer

            self.language_model = GQATransformer(cfg.text)
        else:
            self.language_model = MLATransformer(cfg.text)

    def encode_video(self, video):
        """(B, T, H, W, 3) -> (visual (B, Nv, Dt), deepstack list).

        With `hico_tokens_per_frame` set (the InternVideo2.5 recipe:
        HiCo-R16 keeps 16 tokens per merged frame), the merged tokens are
        compressed per temporal frame before entering the LLM; the
        placeholder count in input_ids must equal frames x R. Deepstack
        taps are disabled under HiCo (2.5 composes InternVL without
        deepstack; the taps' positions would not survive compression)."""
        cfg = self.config
        tokens, taps = self.vision_tower(video)
        visual = self.merger(tokens)
        if cfg.hico_tokens_per_frame:
            t_frames = video.shape[1] // cfg.vision.temporal_patch_size
            b, nv, d = visual.shape
            per_frame = visual.reshape(b, t_frames, nv // t_frames, d)
            visual = hico_compress(
                per_frame, cfg.hico_tokens_per_frame
            ).reshape(b, t_frames * cfg.hico_tokens_per_frame, d)
            return visual, []
        deepstack = [
            m(t) for m, t in zip(self.deepstack_mergers, taps)
        ]
        return visual, deepstack

    def __call__(
        self,
        input_ids: jax.Array,  # (B, L) with video placeholders
        video: Optional[jax.Array] = None,  # (B, T, H, W, 3)
        *,
        position_ids: Optional[jax.Array] = None,  # (3,B,L) mrope or (B,L)
        segment_ids: Optional[jax.Array] = None,
        with_logits: bool = True,
    ) -> LLMOutput:
        cfg = self.config
        embeds = self.language_model.embed(input_ids)
        deepstack_scattered = None
        if video is not None:
            visual, deepstack = self.encode_video(video)
            vmask = (input_ids == cfg.video_token_id) | (
                input_ids == cfg.image_token_id
            )
            embeds = scatter_visual(embeds, visual, vmask)
            zeros = jnp.zeros_like(embeds)
            deepstack_scattered = [
                scatter_visual(zeros, d, vmask) for d in deepstack
            ]
        return self._run_llm(
            embeds, deepstack_scattered, position_ids, segment_ids, with_logits
        )

    def _run_llm(
        self, x, deepstack, position_ids, segment_ids, with_logits
    ):
        lm = self.language_model
        b, s, _ = x.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = lm._rope(position_ids)
        for i, layer in enumerate(lm.layers):
            x = layer(x, cos, sin, segment_ids)
            if deepstack is not None and i < len(deepstack):
                x = x + deepstack[i]
        x = lm.norm(x)
        logits = lm._head(x) if with_logits else None
        return LLMOutput(logits=logits, hidden=x)

    # --- generation -------------------------------------------------------

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        return self.language_model.init_cache(batch, max_len, dtype)

    def prefill(
        self, input_ids, video, caches, *, position_ids=None
    ) -> LLMOutput:
        cfg = self.config
        lm = self.language_model
        embeds = lm.embed(input_ids)
        deepstack_scattered = None
        if video is not None:
            visual, deepstack = self.encode_video(video)
            vmask = (input_ids == cfg.video_token_id) | (
                input_ids == cfg.image_token_id
            )
            embeds = scatter_visual(embeds, visual, vmask)
            zeros = jnp.zeros_like(embeds)
            deepstack_scattered = [
                scatter_visual(zeros, d, vmask) for d in deepstack
            ]
        b, s, _ = embeds.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = lm._rope(position_ids)
        x = embeds
        new_caches = []
        for i, (layer, cache) in enumerate(zip(lm.layers, caches)):
            h, cache = layer.self_attn.prefill(
                layer.input_layernorm(x), cos, sin, cache, 0
            )
            x = x + h
            # _mlp routes MoE layers through their router (MLA flavor);
            # plain layers expose .mlp directly
            mlp_fn = getattr(layer, "_mlp", None) or layer.mlp
            x = x + mlp_fn(layer.post_attention_layernorm(x))
            if deepstack_scattered is not None and i < len(deepstack_scattered):
                x = x + deepstack_scattered[i]
            new_caches.append(cache)
        x = lm.norm(x)
        return LLMOutput(
            logits=lm._head(x[:, -1:]), hidden=x, caches=new_caches
        )

    def decode_step(self, token_ids, caches, cache_len, *, position_ids=None):
        return self.language_model.decode_step(
            token_ids, caches, cache_len, position_ids=position_ids
        )

    def _head(self, h):
        """LM-head delegate (the ServingEngine samples from it directly)."""
        return self.language_model._head(h)

    # --- paged generation (video serving path) ---------------------------
    # Page pools are the language model's latent pools (llm.py paged
    # machinery); the prompt pass scatters visual tokens into the embeds
    # and applies the same deepstack residuals as the dense `prefill`,
    # writing latent page entries per layer instead of dense cache rows.

    def prefill_paged(
        self, input_ids, video, pages, block_tables, page_size,
        *, position_ids=None,
    ) -> LLMOutput:
        import jax.numpy as jnp

        from internvideo_tpu.models.llm import _write_positions

        cfg = self.config
        lm = self.language_model
        embeds = lm.embed(input_ids)
        deepstack_scattered = None
        if video is not None:
            visual, deepstack = self.encode_video(video)
            vmask = (input_ids == cfg.video_token_id) | (
                input_ids == cfg.image_token_id
            )
            embeds = scatter_visual(embeds, visual, vmask)
            zeros = jnp.zeros_like(embeds)
            deepstack_scattered = [
                scatter_visual(zeros, d, vmask) for d in deepstack
            ]
        b, s, _ = embeds.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = lm._rope(position_ids)
        x = embeds
        write_pos = jnp.broadcast_to(
            jnp.arange(s)[None], (b, s)
        ).astype(jnp.int32)
        new_pages = []
        for i, (layer, pool) in enumerate(zip(lm.layers, pages)):
            xn = layer.input_layernorm(x)
            entries = layer.self_attn.compute_cache_entry(xn, cos, sin)
            new_pages.append(_write_positions(
                pool, entries, block_tables, write_pos, page_size
            ))
            x = x + layer.self_attn(xn, cos, sin, causal=True)
            mlp_fn = getattr(layer, "_mlp", None) or layer.mlp
            x = x + mlp_fn(layer.post_attention_layernorm(x))
            if deepstack_scattered is not None and i < len(
                deepstack_scattered
            ):
                x = x + deepstack_scattered[i]
        x = lm.norm(x)
        return LLMOutput(
            logits=lm._head(x[:, -1:]), hidden=x, caches=new_pages
        )

    def decode_step_paged(
        self, token_ids, pages, block_tables, seq_lens, page_size,
        *, impl=None, interpret=False,
    ) -> LLMOutput:
        return self.language_model.decode_step_paged(
            token_ids, pages, block_tables, seq_lens, page_size,
            impl=impl, interpret=interpret,
        )


def hico_compress(
    frame_tokens: jax.Array,  # (B, T, N, D) per-frame visual tokens
    target_tokens: int,  # e.g. 16 (HiCo-R16)
    *,
    refine_iters: int = 2,
    temp: float = 50.0,
) -> jax.Array:
    """HiCo-style hierarchical token compression (static shapes).

    The reference ships no in-repo implementation (InternVideo2.5/
    README.md:26-28 documents only the 16-token/frame budget), so this is an
    original clustering formulation validated by a retrieval-quality test
    (tests/test_mllm.py::test_hico_compress_quality):

      1. farthest-point sampling over cosine distance picks K seed tokens —
         guaranteed coverage of every token mode (a fixed K-step fori_loop,
         unlike strided picks which can miss a cluster entirely)
      2. `refine_iters` soft-Lloyd steps: sharply-peaked softmax assignment
         to the current centroids, centroids re-estimated as the assignment-
         weighted token means

    Output tokens are UNnormalized token averages (the LLM consumes raw
    feature scale), K per frame.
    """
    b, t, n, d = frame_tokens.shape
    k = target_tokens
    x = frame_tokens.reshape(b * t, n, d)
    xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)

    # farthest-point sampling on cosine distance, vectorized over clips
    def fps_body(i, carry):
        idx, d_min = carry  # (BT, K) int32, (BT, N) f32
        nxt = jnp.argmax(d_min, axis=1)  # (BT,)
        idx = idx.at[:, i].set(nxt)
        picked = jnp.take_along_axis(xn, nxt[:, None, None], axis=1)
        dist = 1.0 - jnp.einsum("bnd,bqd->bn", xn, picked)
        return idx, jnp.minimum(d_min, dist)

    idx0 = jnp.zeros((b * t, k), jnp.int32)
    d0 = jnp.full((b * t, n), jnp.inf)
    idx, _ = jax.lax.fori_loop(0, k, fps_body, (idx0, d0))
    centroids = jnp.take_along_axis(xn, idx[..., None], axis=1)  # (BT,K,D)

    merged = None
    for _ in range(max(refine_iters, 1)):
        sim = jnp.einsum("bnd,bkd->bnk", xn, centroids)
        assign = jax.nn.softmax(sim * temp, axis=-1)
        merged = jnp.einsum("bnk,bnd->bkd", assign, x)
        merged = merged / (jnp.sum(assign, axis=1)[..., None] + 1e-6)
        centroids = merged / (
            jnp.linalg.norm(merged, axis=-1, keepdims=True) + 1e-6
        )
    return merged.reshape(b, t, k, d)
