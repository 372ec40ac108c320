"""Autoregressive generation with the latent (M²LA) KV cache.

Prefill once, then a lax.scan'd greedy/temperature decode loop — the whole
generate is ONE compiled XLA program (static max_new_tokens; eos handled by
a finished-mask so shapes stay fixed). Two cache regimes, mirroring the
reference's paged prefill/decode (xtuner mha.py:195-303):

  * dense (default): per-layer (B, max_len, C) latent caches
  * `paged=True`: latent entries in per-layer page pools walked by the
    Pallas paged-decode kernel (ops/paged_decode.py) — O(seq_len) HBM
    traffic per step, page-granular memory; token-identical to dense
    (tests/test_mla_llm.py::test_paged_generate_matches_dense)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def generate(
    model,
    params,
    input_ids: jax.Array,  # (B, L) right-aligned prompt (no padding support yet)
    *,
    video: Optional[jax.Array] = None,
    # (B, L) or (3, B, L) mrope grid rows (get_rope_index_3d) — REQUIRED
    # for faithful video-MLLM serving: mrope models trained on 3-D grids
    # must not prefill/decode with 1-D arange positions
    position_ids: Optional[jax.Array] = None,
    max_new_tokens: int = 64,
    eos_token_id: Optional[int] = None,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    rng: Optional[jax.Array] = None,
    cache_dtype=jnp.float32,
    paged: bool = False,  # page-pool decode via the Pallas paged kernel
    page_size: int = 64,
    decode_impl: Optional[str] = None,  # paged: auto | pallas | xla
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, max_new_tokens) generated ids (eos-padded)."""
    b, prompt_len = input_ids.shape
    max_len = prompt_len + max_new_tokens

    if paged:
        if position_ids is not None:
            raise NotImplementedError(
                "explicit position_ids (mrope serving) run through the "
                "dense-cache path; the paged decode kernel derives "
                "positions from seq_lens"
            )
        llm_cfg = getattr(model, "cfg", None)
        if llm_cfg is None:  # MLLM compose: text model's config
            llm_cfg = model.config.text
        if not hasattr(llm_cfg, "mla"):
            raise ValueError(
                "paged generate drives the latent (M²LA) page pools; the "
                "dense-GQA flavor uses its (B, L, Hkv, D) cache - run "
                "paged=False (GQA kv-heads are small, the dense cache IS "
                "the memory-honest layout)"
            )
        from internvideo_tpu.models.llm import init_paged_cache

        pages, tables = init_paged_cache(
            llm_cfg, b, max_len, page_size, cache_dtype
        )
        import inspect

        if "video" in inspect.signature(model.prefill_paged).parameters:
            out = model.apply(
                params, input_ids, video, pages, tables, page_size,
                method="prefill_paged",
            )
        else:
            if video is not None:  # not an assert: must survive python -O
                raise ValueError("this model's paged path is text-only")
            out = model.apply(
                params, input_ids, pages, tables, page_size,
                method="prefill_paged",
            )
        caches = out.caches
    else:
        caches = model.apply(
            params, b, max_len, cache_dtype, method="init_cache"
        )
        import inspect

        sig = inspect.signature(model.prefill).parameters
        takes_video = "video" in sig
        # only thread the kwarg when set — some flavors (VideoChat) have
        # no position_ids parameter and never serve mrope prompts
        pos_kw = {} if position_ids is None else {
            "position_ids": position_ids
        }
        if pos_kw and "position_ids" not in sig:
            raise ValueError(
                "this model's prefill does not accept position_ids"
            )
        if takes_video:  # MLLM flavor: prefill(input_ids, video, caches)
            out = model.apply(
                params, input_ids, video, caches, method="prefill",
                **pos_kw,
            )
        else:  # bare MLATransformer: prefill(input_embeds, caches)
            embeds = model.apply(
                params, method=lambda m: m.embed_tokens
            )(input_ids)
            out = model.apply(
                params, embeds, caches, method="prefill", **pos_kw
            )
        caches = out.caches

    # decode-position continuation: mrope rows advance together from the
    # prompt's max position (Qwen-VL convention), per batch row
    if position_ids is not None:
        red = (0, -1) if position_ids.ndim == 3 else (-1,)
        next_pos = jnp.max(position_ids, axis=red) + 1  # (B,)
        mrope = position_ids.ndim == 3
    else:
        next_pos = None
        mrope = False

    def sample(logits, key):
        logits = logits[:, -1].astype(jnp.float32)
        if temperature <= 0.0:
            return jnp.argmax(logits, axis=-1)
        logits = logits / temperature
        if top_k is not None and top_k > 0:
            kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        if top_p is not None and top_p < 1.0:
            if top_p <= 0.0:
                raise ValueError(
                    f"top_p={top_p} masks every token (NaN softmax); "
                    "use top_p in (0, 1]"
                )
            # nucleus: keep the smallest prefix of sorted probs summing to
            # top_p (the first token is always kept)
            sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = cum - probs < top_p
            cutoff = jnp.min(
                jnp.where(keep, sorted_logits, jnp.inf), axis=-1,
                keepdims=True,
            )
            logits = jnp.where(logits < cutoff, -jnp.inf, logits)
        return jax.random.categorical(key, logits, axis=-1)

    rng = rng if rng is not None else jax.random.key(0)
    rng, first_key = jax.random.split(rng)  # don't reuse the carry key
    first = sample(out.logits, first_key)

    def body(carry, step):
        token, caches, finished, key = carry
        key, sub = jax.random.split(key)
        if paged:
            seq_lens = jnp.full((b,), prompt_len + step, jnp.int32)
            out = model.apply(
                params, token[:, None], caches, tables, seq_lens,
                page_size, impl=decode_impl, interpret=interpret,
                method="decode_step_paged",
            )
        else:
            kw = {}
            if next_pos is not None:
                pos = (next_pos + step)[:, None]  # (B, 1)
                if mrope:
                    pos = jnp.broadcast_to(pos[None], (3, b, 1))
                kw["position_ids"] = pos
            out = model.apply(
                params, token[:, None], caches, prompt_len + step,
                method="decode_step", **kw,
            )
        nxt = sample(out.logits, sub)
        if eos_token_id is not None:
            nxt = jnp.where(finished, eos_token_id, nxt)
            finished = finished | (nxt == eos_token_id)
        return (nxt, out.caches, finished, key), token

    finished = (
        (first == eos_token_id)
        if eos_token_id is not None
        else jnp.zeros((b,), bool)
    )
    (last, *_), tokens = jax.lax.scan(
        body,
        (first, caches, finished, rng),
        jnp.arange(max_new_tokens - 1),
    )
    tokens = jnp.moveaxis(tokens, 0, 1)  # (B, max_new_tokens-1)
    return jnp.concatenate([tokens, last[:, None]], axis=1)
