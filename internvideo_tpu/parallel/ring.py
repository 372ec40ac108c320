"""Ring attention: context parallelism over the `seq` mesh axis.

An upgrade the reference does NOT have (SURVEY §5.7: long context is handled
exclusively by Ulysses SP, which caps at num_heads ranks and keeps full-
sequence KV per rank during attention). Ring attention shards Q, K and V
across ranks permanently: each rank computes attention of its Q shard
against one KV shard at a time while KV shards rotate around the ring
(jax.lax.ppermute over ICI), merging partial softmax results with the
log-sum-exp trick. Memory per rank is O(S/sp), enabling contexts Ulysses
cannot reach.

Causal handling is block-granular: a KV shard strictly in the future of the
Q shard is skipped (its partial lse is -inf), the diagonal shard runs with
the causal flag, past shards run dense.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from internvideo_tpu.ops.attention_xla import NEG_INF


def _attention_with_lse(q, k, v, *, causal, scale):
    """(B, S, H, D) attention returning (out, lse (B, H, Sq)). XLA impl —
    per-shard sequences are short (S/sp), so materializing scores is fine;
    a Pallas inner kernel can swap in via the same contract."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        logits = jnp.where((qi >= ki)[None, None], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    l_safe = jnp.maximum(l, 1e-30)
    out = out / jnp.transpose(l_safe, (0, 2, 1))[..., None]
    lse = m + jnp.log(l_safe)
    return out.astype(q.dtype), lse


def ring_attention(
    q: jax.Array,  # (B, S, H, D) — S sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "seq",
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    batch_axes: tuple[str, ...] = ("replica", "fsdp"),
    head_axis: Optional[str] = "tensor",
) -> jax.Array:
    sp = mesh.shape[axis]
    scale = softmax_scale if softmax_scale is not None else q.shape[-1] ** -0.5
    if sp == 1:
        return _attention_with_lse(q, k, v, causal=causal, scale=scale)[0]
    batch_axes = tuple(a for a in batch_axes if a in mesh.axis_names)
    if head_axis is not None and head_axis not in mesh.axis_names:
        head_axis = None

    def local(q, k, v):
        my = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % sp) for i in range(sp)]

        def body(carry, step):
            k_cur, v_cur, acc, m_run, l_run = carry
            src = (my - step) % sp  # whose KV shard we hold this step
            if causal:
                # future shard: skip; diagonal: causal; past: dense
                is_future = src > my
                is_diag = src == my
                out_c, lse_c = _attention_with_lse(
                    q, k_cur, v_cur, causal=True, scale=scale
                )
                out_d, lse_d = _attention_with_lse(
                    q, k_cur, v_cur, causal=False, scale=scale
                )
                out = jnp.where(is_diag, out_c, out_d)
                lse = jnp.where(is_diag, lse_c, lse_d)
                lse = jnp.where(is_future, -jnp.inf, lse)
                out = jnp.where(is_future, 0.0, out)
            else:
                out, lse = _attention_with_lse(
                    q, k_cur, v_cur, causal=False, scale=scale
                )
            # merge partials: running logsumexp
            m_new = jnp.maximum(m_run, lse)
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            w_old = jnp.where(
                jnp.isfinite(m_run), jnp.exp(m_run - m_safe), 0.0
            )
            w_cur = jnp.where(
                jnp.isfinite(lse), jnp.exp(lse - m_safe), 0.0
            )
            # weights are per (B,H,Sq); out is (B,Sq,H,D)
            def bcast(w):
                return jnp.transpose(w, (0, 2, 1))[..., None]

            acc = acc * bcast(w_old) + out.astype(jnp.float32) * bcast(w_cur)
            l_new = l_run * w_old + w_cur
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return (k_nxt, v_nxt, acc, m_new, l_new), None

        b, sq, h, d = q.shape
        # initial carries must be marked device-varying inside shard_map
        # (only over the axes the inputs are actually sharded on)
        all_axes = batch_axes + (axis,) + ((head_axis,) if head_axis else ())
        acc0 = jax.lax.pvary(jnp.zeros((b, sq, h, d), jnp.float32), all_axes)
        m0 = jax.lax.pvary(jnp.full((b, h, sq), -jnp.inf), all_axes)
        l0 = jax.lax.pvary(jnp.zeros((b, h, sq)), all_axes)
        (k_f, v_f, acc, m_run, l_run), _ = jax.lax.scan(
            body, (k, v, acc0, m0, l0), jnp.arange(sp)
        )
        l_safe = jnp.maximum(l_run, 1e-30)
        out = acc / jnp.transpose(l_safe, (0, 2, 1))[..., None]
        return out.astype(q.dtype)

    spec = P(batch_axes if batch_axes else None, axis, head_axis, None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
