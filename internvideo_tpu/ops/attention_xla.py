"""Pure-XLA scaled-dot-product attention.

The numerical ground truth for the Pallas flash kernel, and the fallback path
on CPU / in tests. Materializes the (S_q, S_k) score matrix, so it is only for
short sequences or correctness checks.

Capability parity target: the reference's flash-attn wrapper
(InternVideo2/single_modality/models/flash_attention_class.py:10 and
InternVideo3_sft/xtuner/v1/ops/flash_attn/gpu.py) — causal, padding/varlen via
segment ids, GQA via head broadcasting.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def xla_attention(
    q: jax.Array,  # (B, Sq, Hq, D)
    k: jax.Array,  # (B, Sk, Hkv, D)
    v: jax.Array,  # (B, Sk, Hkv, D)
    *,
    causal: bool = False,
    q_segment_ids: Optional[jax.Array] = None,  # (B, Sq) int32; 0 = padding
    kv_segment_ids: Optional[jax.Array] = None,  # (B, Sk)
    softmax_scale: Optional[float] = None,
    q_position_offset: int = 0,  # causal: query row i sits at key index i+off
) -> jax.Array:
    orig_dtype = q.dtype
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    if hq != hkv:
        assert hq % hkv == 0, (hq, hkv)
        k = jnp.repeat(k, hq // hkv, axis=2)
        v = jnp.repeat(v, hq // hkv, axis=2)
    scale = softmax_scale if softmax_scale is not None else d ** -0.5

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale

    mask = None
    if causal:
        qi = q_position_offset + jax.lax.broadcasted_iota(
            jnp.int32, (sq, sk), 0
        )
        ki = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        mask = (qi >= ki)[None, None]
    if q_segment_ids is not None or kv_segment_ids is not None:
        assert q_segment_ids is not None and kv_segment_ids is not None
        seg = (
            q_segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        )
        mask = seg if mask is None else jnp.logical_and(mask, seg)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)
