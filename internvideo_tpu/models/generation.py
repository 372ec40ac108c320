"""Autoregressive generation with the latent (M²LA) KV cache.

Prefill once, then a lax.scan'd greedy/temperature decode loop — the whole
generate is ONE compiled XLA program (static max_new_tokens; eos handled by
a finished-mask so shapes stay fixed). Replaces the reference's
paged-prefill/decode path (xtuner mha.py:195-303) for the batch=small,
dense-cache regime; paged-Pallas decode is the follow-up optimization.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def generate(
    model,
    params,
    input_ids: jax.Array,  # (B, L) right-aligned prompt (no padding support yet)
    *,
    video: Optional[jax.Array] = None,
    max_new_tokens: int = 64,
    eos_token_id: Optional[int] = None,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    cache_dtype=jnp.float32,
) -> jax.Array:
    """Returns (B, max_new_tokens) generated ids (eos-padded)."""
    b, prompt_len = input_ids.shape
    max_len = prompt_len + max_new_tokens

    caches = model.apply(
        params, b, max_len, cache_dtype, method="init_cache"
    )
    if video is not None:
        out = model.apply(
            params, input_ids, video, caches, method="prefill"
        )
    else:
        out = model.apply(params, input_ids, None, caches, method="prefill")
    caches = out.caches

    def sample(logits, key):
        logits = logits[:, -1].astype(jnp.float32)
        if temperature > 0.0:
            return jax.random.categorical(key, logits / temperature, axis=-1)
        return jnp.argmax(logits, axis=-1)

    rng = rng if rng is not None else jax.random.key(0)
    first = sample(out.logits, rng)

    def body(carry, step):
        token, caches, finished, key = carry
        key, sub = jax.random.split(key)
        out = model.apply(
            params, token[:, None], caches, prompt_len + step,
            method="decode_step",
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
