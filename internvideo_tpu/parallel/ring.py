"""Ring attention: context parallelism over the `seq` mesh axis.

An upgrade the reference does NOT have (SURVEY §5.7: long context is handled
exclusively by Ulysses SP, which caps at num_heads ranks and keeps full-
sequence KV per rank during attention). Ring attention shards Q, K and V
across ranks permanently: each rank computes attention of its Q shard
against one KV shard at a time while KV shards rotate around the ring
(jax.lax.ppermute over ICI), merging partial softmax results with the
log-sum-exp trick. Memory per rank is O(S/sp), enabling contexts Ulysses
cannot reach.

Reachable from model code via `ops.attention.sequence_parallel_context`
(impl="ring") — the same injection point Ulysses uses — and from the SFT
engine via `SFTConfig.sp_impl="ring"`.

Design notes:
  * the inner attention is a blockwise online-softmax scan (`lax.scan` over
    KV blocks): memory O(Sq_shard x block_k), never the (Sq, Sk) score
    matrix, and plain-XLA differentiable so the ring backward is autodiff
    through the forward ring (a second round of ppermutes, scheduled by
    XLA). Matmuls land on the MXU; the unfused softmax pays one extra HBM
    round-trip per block vs the Pallas flash kernel — the measured gap and
    the Ulysses-vs-ring decision record live in PERF.md ("Ring vs Ulysses").
  * causal handling is block-granular AND branch-free in FLOPs: a
    `lax.switch` on the rotating shard's position runs exactly one of
    {skip (future), causal inner (diagonal), dense inner (past)} — the old
    implementation computed causal + dense on every shard (2x FLOPs).
    Ranks still advance in ppermute lockstep, so causal work is imbalanced
    across ranks (rank r has r+1 live shards); a zigzag layout would fix
    that at the cost of an interleaved sequence order contract with the
    data layer — rejected for now, see PERF.md.
  * packed sequences: kv segment ids rotate around the ring with K/V, so
    the inner mask sees the true (q_seg, kv_seg) pair — ring composes with
    the packing data path like the flash kernel does.
  * GQA: KV travel the ring thin (Hkv heads) and are expanded to Hq only
    inside the inner matmuls, so ppermute bytes stay O(Hkv).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from internvideo_tpu.ops.attention_xla import NEG_INF


def _blockwise_attention_lse(
    q,  # (B, Sq, Hq, D)
    k,  # (B, Sk, Hkv, D)
    v,  # (B, Sk, Hkv, D)
    *,
    causal: bool,
    scale: float,
    q_seg=None,  # (B, Sq) int; <0 = padding
    kv_seg=None,  # (B, Sk)
    q_offset=0,  # q row i sits at global key position i + q_offset
    block_k: int = 1024,
    block_q: int = 1024,
):
    """Online-softmax attention returning (out (B,Sq,Hq,D) in q.dtype,
    lse (B,Hq,Sq) natural-log). Never materializes (Sq, Sk); autodiff
    through the `lax.scan` gives the backward (scan-of-checkpoint, so the
    backward replays each block instead of stashing its probabilities —
    without that a 262k forward would save ~2 TB of residuals).

    2D dead-block skipping (the compiled-XLA analog of the Pallas kernels'
    packed-segment block skipping, PERF.md): both q and k are blocked, and
    a (q-block, k-block) pair whose causal ranges cannot meet or whose
    segment-id RANGES are disjoint (packed ids are monotonic, so range
    intersection is exact at block granularity and conservative for
    arbitrary ids) is skipped by a lax.cond that returns the carry
    untouched — XLA executes neither matmul. At 16 packed segments this
    drops ~15/16 of a causal 262k walk, which is what makes the 262k
    packed SFT step executable on the CPU mesh
    (tests/test_long_context.py::test_sft_262k_sp4_executed)."""
    b, sq_orig, hq, d = q.shape
    sk, hkv = k.shape[1], k.shape[2]
    dv = v.shape[-1]  # may differ from d (MLA)
    group = hq // hkv
    block_k = min(block_k, sk)
    block_q = min(block_q, sq_orig)
    nk = -(-sk // block_k)
    nq = -(-sq_orig // block_q)
    pad_k = nk * block_k - sk
    pad_q = nq * block_q - sq_orig
    if (pad_k or pad_q) and kv_seg is None and q_seg is None:
        # padding rides the segment-id mask path
        q_seg = jnp.zeros((b, sq_orig), jnp.int32)
        kv_seg = jnp.zeros((b, sk), jnp.int32)
    if kv_seg is None and q_seg is not None:
        kv_seg = jnp.zeros((b, sk), jnp.int32)
    if q_seg is None and kv_seg is not None:
        q_seg = jnp.zeros((b, sq_orig), jnp.int32)
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        kv_seg = jnp.pad(kv_seg, ((0, 0), (0, pad_k)), constant_values=-2)
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        q_seg = jnp.pad(q_seg, ((0, 0), (0, pad_q)), constant_values=-1)
    sq = sq_orig + pad_q

    kb = k.reshape(b, nk, block_k, hkv, d).transpose(1, 0, 2, 3, 4)
    vb = v.reshape(b, nk, block_k, hkv, dv).transpose(1, 0, 2, 3, 4)
    qb = q.reshape(b, nq, block_q, hq, d).transpose(1, 0, 2, 3, 4)
    sb = (
        kv_seg.reshape(b, nk, block_k).transpose(1, 0, 2)
        if kv_seg is not None else None
    )
    qsb = (
        q_seg.reshape(b, nq, block_q).transpose(1, 0, 2)
        if q_seg is not None else None
    )

    k_starts = jnp.arange(nk, dtype=jnp.int32) * block_k
    q_starts = q_offset + jnp.arange(nq, dtype=jnp.int32) * block_q
    dead = jnp.zeros((nq, nk), bool)
    if causal:
        # k block fully in this q block's future: k_start > q_end
        q_end = q_starts + block_q - 1
        dead = dead | (k_starts[None, :] > q_end[:, None])
    if sb is not None and qsb is not None:
        k_min = jnp.min(sb, axis=(1, 2))  # (nk,)
        k_max = jnp.max(sb, axis=(1, 2))
        q_min = jnp.min(qsb, axis=(1, 2))  # (nq,)
        q_max = jnp.max(qsb, axis=(1, 2))
        dead = dead | (k_max[None, :] < q_min[:, None]) \
            | (k_min[None, :] > q_max[:, None])

    def _live_body(qc, qseg_c, qi, carry, blk):
        acc, m_run, l_run = carry
        kc, vc, seg_c, start = blk
        if group > 1:
            kc = jnp.repeat(kc, group, axis=2)
            vc = jnp.repeat(vc, group, axis=2)
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", qc, kc, preferred_element_type=jnp.float32
        ) * scale
        mask = None
        if causal:
            ki = start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = (qi >= ki)[None, None]
        if seg_c is not None:
            segm = (qseg_c[:, :, None] == seg_c[:, None, :]) & (
                qseg_c[:, :, None] >= 0
            )
            segm = segm[:, None]
            mask = segm if mask is None else jnp.logical_and(mask, segm)
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)
        m_blk = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_run, m_blk)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - m_safe[..., None])
        p = jnp.where(s <= NEG_INF, 0.0, p)
        alpha = jnp.where(jnp.isfinite(m_run), jnp.exp(m_run - m_safe), 0.0)
        l_new = l_run * alpha + jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(vc.dtype), vc,
            preferred_element_type=jnp.float32,
        )
        acc = acc * jnp.transpose(alpha, (0, 2, 1))[..., None] + pv
        return (acc, m_new, l_new), None

    def _skip(c, *_):
        return c, None

    def per_q_block(xq):
        qc, qseg_c, q_start, dead_row = xq
        qi = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        acc0 = jnp.zeros((b, block_q, hq, dv), jnp.float32)
        m0 = jnp.full((b, hq, block_q), -jnp.inf)
        l0 = jnp.zeros((b, hq, block_q))
        if sb is None:
            (acc, m_run, l_run), _ = jax.lax.scan(
                jax.checkpoint(lambda c, x: jax.lax.cond(
                    x[3], _skip,
                    lambda c, kc, vc, st: _live_body(
                        qc, qseg_c, qi, c, (kc, vc, None, st)),
                    c, x[0], x[1], x[2],
                )),
                (acc0, m0, l0), (kb, vb, k_starts, dead_row),
            )
        else:
            (acc, m_run, l_run), _ = jax.lax.scan(
                jax.checkpoint(lambda c, x: jax.lax.cond(
                    x[4], _skip,
                    lambda c, *a: _live_body(qc, qseg_c, qi, c, a),
                    c, x[0], x[1], x[2], x[3],
                )),
                (acc0, m0, l0), (kb, vb, sb, k_starts, dead_row),
            )
        l_safe = jnp.maximum(l_run, 1e-30)
        out = acc / jnp.transpose(l_safe, (0, 2, 1))[..., None]
        lse = jnp.where(l_run > 0.0, m_run + jnp.log(l_safe), -jnp.inf)
        return out.astype(q.dtype), lse

    if nq == 1:
        out, lse = per_q_block((
            qb[0], qsb[0] if qsb is not None else None,
            q_starts[0], dead[0],
        ))
        return out[:, :sq_orig], lse[:, :, :sq_orig]

    xq = (qb, qsb, q_starts, dead) if qsb is not None else (
        qb, None, q_starts, dead)
    if qsb is None:
        _, (outs, lses) = jax.lax.scan(
            lambda c, x: (c, per_q_block((x[0], None, x[1], x[2]))),
            None, (qb, q_starts, dead),
        )
    else:
        _, (outs, lses) = jax.lax.scan(
            lambda c, x: (c, per_q_block(x)), None, xq,
        )
    # (nq, B, block_q, H, Dv) -> (B, Sq, H, Dv); lse (nq, B, H, bq)
    out = outs.transpose(1, 0, 2, 3, 4).reshape(b, sq, hq, dv)
    lse = lses.transpose(1, 2, 0, 3).reshape(b, hq, sq)
    return out[:, :sq_orig], lse[:, :, :sq_orig]


def _attention_with_lse(q, k, v, *, causal, scale):
    """Back-compat alias used by tests: dense (out, lse) via the blockwise
    scan (single block when Sk <= block_k)."""
    return _blockwise_attention_lse(q, k, v, causal=causal, scale=scale)


def ring_attention(
    q: jax.Array,  # (B, S, H, D) — S sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "seq",
    causal: bool = False,
    q_segment_ids: Optional[jax.Array] = None,  # (B, S), sharded like q
    kv_segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    batch_axes: tuple[str, ...] = ("replica", "fsdp"),
    head_axis: Optional[str] = "tensor",
    block_k: int = 1024,
    inner: str = "auto",
) -> jax.Array:
    """`inner` selects the per-chunk attention: "pallas" runs the flash
    kernel via `flash_attention_with_lse` (the measured-fast path: the
    blockwise-XLA inner is 2.4-4.1x slower fwd and 17-24x slower fwd+bwd
    on-chip — PERF.md "Ring vs Ulysses"); "blockwise" is the compiled-XLA
    online-softmax scan (works on any backend, keeps dead-block skipping);
    "pallas_interpret" is the kernel under the Pallas interpreter (CPU
    tests). "auto" = pallas on TPU, blockwise elsewhere."""
    if inner == "auto":
        inner = "pallas" if jax.default_backend() == "tpu" else "blockwise"
    sp = mesh.shape[axis]
    scale = softmax_scale if softmax_scale is not None else q.shape[-1] ** -0.5
    if sp == 1:
        return _blockwise_attention_lse(
            q, k, v, causal=causal, scale=scale,
            q_seg=q_segment_ids, kv_seg=kv_segment_ids, block_k=block_k,
        )[0]
    batch_axes = tuple(a for a in batch_axes if a in mesh.axis_names)
    if head_axis is not None and head_axis not in mesh.axis_names:
        head_axis = None
    has_segs = q_segment_ids is not None or kv_segment_ids is not None
    b, _s_local, h, d = q.shape
    if kv_segment_ids is None and has_segs:
        kv_segment_ids = q_segment_ids
    if q_segment_ids is None and has_segs:
        # mirror the fallback _blockwise_attention_lse applies (all-zero q
        # ids): shard_map needs a real array, not None
        q_segment_ids = jnp.zeros(kv_segment_ids.shape, jnp.int32)

    def local(q, k, v, q_seg, kv_seg):
        my = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % sp) for i in range(sp)]
        b, sq, h, d = q.shape  # LOCAL shard shapes, not the global ones

        def partial_attn(kc, vc, seg_c, diag: bool):
            if inner in ("pallas", "pallas_interpret"):
                from internvideo_tpu.ops.flash_attention import (
                    flash_attention_with_lse,
                )

                return flash_attention_with_lse(
                    q, kc, vc, causal=(causal and diag),
                    softmax_scale=scale,
                    q_segment_ids=q_seg if seg_c is not None else None,
                    kv_segment_ids=seg_c, block_k=block_k,
                    interpret=inner == "pallas_interpret",
                )
            return _blockwise_attention_lse(
                q, kc, vc, causal=(causal and diag), scale=scale,
                q_seg=q_seg, kv_seg=seg_c, block_k=block_k,
            )

        def body(carry, _step):
            k_cur, v_cur, kseg_cur, acc, m_run, l_run = carry
            src = (my - _step) % sp  # whose KV shard we hold this step
            if causal:
                # exactly one branch runs: 0 = future shard (skip, zero
                # cost), 1 = diagonal (causal), 2 = past (dense)
                case = jnp.where(
                    src > my, 0, jnp.where(src == my, 1, 2)
                )
                out, lse = jax.lax.switch(
                    case,
                    [
                        lambda kc, vc, sc: (
                            # out rides at d_v (may differ from d: MLA)
                            jnp.zeros((b, sq, h, v.shape[-1]), q.dtype),
                            jnp.full((b, h, sq), -jnp.inf),
                        ),
                        lambda kc, vc, sc: partial_attn(kc, vc, sc, True),
                        lambda kc, vc, sc: partial_attn(kc, vc, sc, False),
                    ],
                    k_cur, v_cur, kseg_cur,
                )
            else:
                out, lse = partial_attn(k_cur, v_cur, kseg_cur, False)
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
            kseg_nxt = (
                jax.lax.ppermute(kseg_cur, axis, perm)
                if kseg_cur is not None else None
            )
            return (k_nxt, v_nxt, kseg_nxt, acc, m_new, l_new), None

        acc0 = jnp.zeros((b, sq, h, v.shape[-1]), jnp.float32)
        m0 = jnp.full((b, h, sq), -jnp.inf)
        l0 = jnp.zeros((b, h, sq))
        carry0 = (k, v, kv_seg if has_segs else None, acc0, m0, l0)
        (k_f, v_f, _s, acc, m_run, l_run), _ = jax.lax.scan(
            body, carry0, jnp.arange(sp)
        )
        l_safe = jnp.maximum(l_run, 1e-30)
        out = acc / jnp.transpose(l_safe, (0, 2, 1))[..., None]
        return out.astype(q.dtype)

    spec = P(batch_axes if batch_axes else None, axis, head_axis, None)
    seg_spec = P(batch_axes if batch_axes else None, axis)
    # check_vma=False: the varying-axes analysis cannot see through the
    # online-softmax scan carries (zeros/-inf inits are device-invariant
    # literals); the out_specs are the ground truth here.
    if has_segs:
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec, seg_spec, seg_spec),
            out_specs=spec, check_vma=False,
        )(q, k, v, q_segment_ids, kv_segment_ids)
    return jax.shard_map(
        lambda q, k, v: local(q, k, v, None, None),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
