"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for the reference's flash-attn CUDA dependency
(InternVideo2/single_modality/models/flash_attention_class.py:10,
InternVideo3_sft/xtuner/v1/ops/flash_attn/gpu.py). Features:

  * online-softmax blockwise attention, fp32 accumulation, bf16-friendly
  * `causal` masking with whole-block skipping below the diagonal, and
    sliding-window masking (xtuner mha.py window_size) with out-of-window
    block skipping
  * packed-varlen support via integer *segment ids* (the TPU-idiomatic
    stand-in for the reference's cu_seqlens varlen API) — tokens attend only
    within their own segment; id < 0 marks padding
  * GQA via shared-KV BlockSpec index maps: K/V stay at (B, Hkv, S, D) in
    HBM and each query head's grid step DMAs its group's KV block (no
    jnp.repeat materialization); the dk/dv backward walks (kv_head,
    q_heads_in_group × q_blocks) and accumulates across the group
  * custom VJP with two backward kernels (dq; dk/dv), re-computing
    probabilities from the saved log-sum-exp instead of materializing them

Layout: public API is (B, S, H, D) — matching the projection layout so XLA
can fuse the transposes; kernels run on (B, H, S, D) so blocks tile VMEM as
(block, head_dim).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634


def _mask_block(
    s,  # (bq, bk) f32 scaled logits
    *,
    causal: bool,
    q_seg,  # (bq, 1) int32 or None
    k_seg,  # (1, bk) int32 or None
    q_offset,
    k_offset,
    window=None,  # static int: attend only keys with |qi-ki| < window
):
    bq, bk = s.shape
    mask = None
    if causal or window is not None:
        qi = q_offset + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        ki = k_offset + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if causal:
        mask = qi >= ki
    if window is not None:
        wm = qi - ki < window
        if not causal:
            wm = jnp.logical_and(wm, ki - qi < window)
        mask = wm if mask is None else jnp.logical_and(mask, wm)
    if q_seg is not None:
        seg = q_seg == k_seg
        mask = seg if mask is None else jnp.logical_and(mask, seg)
    if mask is None:
        return s
    return jnp.where(mask, s, DEFAULT_MASK_VALUE)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _segs_overlap(q_ids, k_ids):
    """Conservative packed-segment block visibility: a (q-block, k-block)
    pair can only contain matching segment ids if the id RANGES intersect.
    Packed rows carry monotonic ids (pads: q=-1, kv=-2), so disjoint ranges
    => no q row attends any k row in the pair and the whole block is dead.
    At 8 packed segments this skips ~7/8 of the blocks the masked walk used
    to compute (segment masking zeroes FLOPs results, not FLOPs). Sound for
    arbitrary ids: range intersection over-approximates equality."""
    return jnp.logical_and(
        jnp.min(q_ids) <= jnp.max(k_ids),
        jnp.min(k_ids) <= jnp.max(q_ids),
    )


def _block_seg_minmax(ids, blk):
    """Per-block (min, max) of segment ids. ids: (b, s) with s % blk == 0."""
    b, s = ids.shape
    r = ids.reshape(b, s // blk, blk)
    return r.min(axis=2), r.max(axis=2)


def _build_remap(a_min, a_max, s_min, s_max, causal_vis):
    """Live-block remap tables for the packed-segment kernels.

    The in-kernel `_segs_overlap` skip predicates COMPUTE off dead
    (q-block, k-block) pairs, but their HBM block fetches still stream —
    at 8 packed segments that is ~7/8 of the streamed operand's traffic
    for nothing. This computes the same visibility once in XLA (segment
    range intersection at block granularity, ANDed with the causal
    whole-block test) and produces, per batch row and per anchor block,
    the ascending indices of the LIVE streamed blocks; dead tail entries
    REPEAT the last live index. The kernels walk streamed blocks through
    these tables via scalar prefetch: Pallas elides a block copy whenever
    the index map output is unchanged from the previous grid step, so the
    dead blocks' DMAs vanish (compute is predicated off with j < n_live).

    a_min/a_max: (b, na) anchor-block segment-id ranges.
    s_min/s_max: (b, ns) streamed-block ranges.
    causal_vis:  (na, ns) bool or None.
    Returns (idx_map (b, na, ns) int32, n_live (b, na) int32).
    """
    vis = jnp.logical_and(
        a_min[:, :, None] <= s_max[:, None, :],
        s_min[:, None, :] <= a_max[:, :, None],
    )
    if causal_vis is not None:
        vis = jnp.logical_and(vis, causal_vis[None])
    # Stable ascending argsort of (not visible) puts live indices first in
    # original (ascending) order — consecutive live steps then fetch
    # consecutive HBM blocks.
    order = jnp.argsort(
        jnp.logical_not(vis), axis=-1, stable=True
    ).astype(jnp.int32)
    n_live = vis.sum(axis=-1).astype(jnp.int32)
    last = jnp.take_along_axis(
        order, jnp.maximum(n_live - 1, 0)[..., None], axis=-1
    )
    j = jnp.arange(order.shape[-1], dtype=jnp.int32)
    idx = jnp.where(j[None, None, :] < n_live[..., None], order, last)
    return idx, n_live


def _block_visible(iq, ik, *, causal, block_q, block_k, q_pos, window):
    """Whether k-block ik can contribute to q-block iq (whole-block skip)."""
    visible = True
    if causal:
        visible = q_pos + (iq + 1) * block_q > ik * block_k
    if window is not None:
        in_window = (ik + 1) * block_k > q_pos + iq * block_q - window + 1
        if not causal:
            in_window = jnp.logical_and(
                in_window,
                ik * block_k < q_pos + (iq + 1) * block_q + window - 1,
            )
        visible = jnp.logical_and(visible, in_window)
    return visible


def _fwd_kernel(
    *refs,
    scale: float, causal: bool, block_q: int, block_k: int, has_segs: bool,
    kv_pad: int = 0, window=None, q_pos: int = 0, unroll: int = 1,
    remap: bool = False,
):
    # Softmax runs entirely in the base-2 domain: log2(e) is folded into the
    # score scale, so the per-element work is just sub+exp2 (no multiply),
    # and the denominator rides the MXU — V carries an appended ones column
    # (d+1 <= the same 128-lane tile), so acc[:, d] accumulates sum(p) as a
    # by-product of the p@V dot instead of a VPU row-reduction.
    #
    # With `unroll > 1` (non-causal/non-windowed paths) each grid step
    # processes `unroll` k sub-blocks with the running max / accumulator
    # threaded through SSA values: the sub-block bodies are independent
    # except for cheap (bq,)-vector couplings, so Mosaic co-issues one
    # sub-block's softmax (VPU) with the next's score dot (MXU) — measured
    # 9.4 -> 7.9 ms at 4096x4096 with unroll=4. (A cross-grid-step pipeline
    # via a lagged-V scratch was tried first and measured SLOWER: spilling
    # p through VMEM adds a write+read pass per element.)
    if remap:
        (kmap_ref, nvis_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
         o_ref, lse_ref, acc_ref, m_ref) = refs
    elif has_segs:
        q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref, acc_ref, m_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref = refs
        qseg_ref = kseg_ref = None
    iq, ik = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)
    if remap:
        # The streamed k block is kmap[b, iq, ik]; dead steps repeat a live
        # index (DMA elided), so compute MUST gate on `live`, not on the
        # seg-overlap test (the refetched live block would pass it twice).
        ib = pl.program_id(0)
        ik_eff = kmap_ref[ib, iq, ik]
        live = ik < nvis_ref[ib, iq]
    else:
        ik_eff = ik

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if unroll > 1:
        # Causal whole-step skip: sub-block visibility decreases with ik,
        # so if the first sub-block is above the diagonal the step is dead;
        # partially-visible (diagonal) steps mask per sub-block.
        assert window is None
        if remap:
            step_visible = live
        else:
            step_visible = True
            if causal:
                step_visible = _block_visible(
                    iq, ik * unroll, causal=True, block_q=block_q,
                    block_k=block_k, q_pos=q_pos, window=None,
                )
            if qseg_ref is not None:
                step_visible = jnp.logical_and(step_visible, _segs_overlap(
                    qseg_ref[0, :, 0], kseg_ref[0, 0, :]
                ))

        @pl.when(step_visible)
        def _compute_unrolled():
            q = q_ref[0, 0]
            m_run = m_ref[:, 0]
            acc = acc_ref[:]
            for u in range(unroll):
                k = k_ref[0, 0, u * block_k:(u + 1) * block_k]
                v = v_ref[0, 0, u * block_k:(u + 1) * block_k]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (scale * LOG2E)
                q_seg = k_seg = None
                if qseg_ref is not None:
                    q_seg = qseg_ref[0, :, 0].reshape(block_q, 1)
                    k_seg = kseg_ref[
                        0, 0, u * block_k:(u + 1) * block_k
                    ].reshape(1, block_k)
                if causal or q_seg is not None:
                    s = _mask_block(
                        s, causal=causal, q_seg=q_seg, k_seg=k_seg,
                        q_offset=q_pos + iq * block_q,
                        k_offset=(ik_eff * unroll + u) * block_k,
                    )
                m_cur = jnp.maximum(m_run, jnp.max(s, axis=1))
                p = jnp.exp2(s - m_cur[:, None])
                if has_segs or causal:
                    p = jnp.where((s <= DEFAULT_MASK_VALUE)[:, :], 0.0, p)
                alpha = jnp.exp2(m_run - m_cur)
                alpha = jnp.where(jnp.isfinite(m_run), alpha, 0.0)
                acc = acc * alpha[:, None] + jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32
                )
                m_run = m_cur
            m_ref[:, 0] = m_run
            acc_ref[:] = acc
    else:
        if remap:
            block_visible = live
        else:
            block_visible = _block_visible(
                iq, ik, causal=causal, block_q=block_q, block_k=block_k,
                q_pos=q_pos, window=window,
            )
            if qseg_ref is not None:
                block_visible = jnp.logical_and(block_visible, _segs_overlap(
                    qseg_ref[0, :, 0], kseg_ref[0, 0, :]
                ))

        @pl.when(block_visible)
        def _compute():
            # operands stay in their storage dtype (bf16 on the hot path)
            # with f32 accumulation — upcasting inputs would push the MXU
            # onto the multi-pass f32 path
            q = q_ref[0, 0]  # (bq, d)
            k = k_ref[0, 0]  # (bk, d)
            v = v_ref[0, 0]  # (bk, d+1): last column = denominator lane
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale * LOG2E)  # (bq, bk) f32, base-2 domain
            q_seg = k_seg = None
            if qseg_ref is not None:
                q_seg = qseg_ref[0, :, 0].reshape(block_q, 1)
                k_seg = kseg_ref[0, 0, :].reshape(1, block_k)
            s = _mask_block(
                s, causal=causal, q_seg=q_seg, k_seg=k_seg,
                q_offset=q_pos + iq * block_q, k_offset=ik_eff * block_k,
                window=window,
            )

            m_prev = m_ref[:, 0]  # (bq,) running max of base-2 scores
            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
            p = jnp.exp2(s - m_cur[:, None])
            if has_segs or causal or window is not None:
                # Rows where every key so far is masked: keep everything
                # at 0 (segment/causal/window masking can fully mask a
                # row's block).
                p = jnp.where((s <= DEFAULT_MASK_VALUE)[:, :], 0.0, p)
            alpha = jnp.exp2(m_prev - m_cur)
            alpha = jnp.where(jnp.isfinite(m_prev), alpha, 0.0)
            m_ref[:, 0] = m_cur
            acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

    @pl.when(ik == nk - 1)
    def _finalize():
        d_out = o_ref.shape[-1]
        l = acc_ref[:, d_out]
        if kv_pad:
            # K/V tail padding is zeros, so each pad key contributed exactly
            # exp2(0 - m) to l (and nothing to acc) — remove it analytically
            # instead of masking every tile (saves a VPU pass per tile).
            l = l - kv_pad * jnp.exp2(-m_ref[:, 0])
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:, :d_out] / l_safe[:, None]).astype(o_ref.dtype)
        m = m_ref[:, 0]
        # LSE is kept in the base-2 domain (log2 sum exp2 of scaled scores);
        # the backward recomputes p = exp2(s2 - lse2). Empty rows get a huge
        # LSE so p == 0 in the backward.
        lse = jnp.where(l <= 0.0, -DEFAULT_MASK_VALUE, m + jnp.log2(l_safe))
        lse_ref[0, 0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[2:])


def _fwd(
    q, k, v, q_seg, kv_seg, *, scale, causal, block_q, block_k, interpret,
    kv_pad=0, window=None, q_pos=0, group=1,
):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dv = v.shape[-1]  # MLA runs d_v < d_qk (128 vs 192) — no v padding
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    # sub-block unroll (see _fwd_kernel): largest of 4/2/1 dividing the
    # k-block count; windowed paths keep per-block skipping. Wide heads
    # cap at 2 — u=4 at head_dim 128 blows the 16M scoped-vmem stack.
    unroll = 1
    if window is None and sk % block_k == 0:
        nk_total = sk // block_k
        u_cap = 4 if max(d, dv) <= 96 else 2
        for u in (4, 2):
            if u <= u_cap and nk_total % u == 0:
                unroll = u
                break
    grid = (b, h, pl.cdiv(sq, block_q), pl.cdiv(sk, unroll * block_k))

    # Ones column appended to V: the p @ V dot then accumulates the softmax
    # denominator in acc[:, d] on the MXU (d+1 stays inside the same 128-lane
    # tile, so the extra column is free). XLA fuses this pad into the
    # preceding transpose copy. Sequence tail-pad rows (zeros in features)
    # also carry a 1 here — exactly the exp2(-m) mass the kv_pad finalize
    # correction removes.
    v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 1)), constant_values=1)

    has_segs = q_seg is not None
    # Packed-segment runs walk the k blocks through a live-block remap
    # table (scalar prefetch): dead blocks' DMAs are elided entirely, not
    # just their compute (see _build_remap). Windowed paths keep the
    # in-kernel skip (window visibility is cheap and rarely combined with
    # packing).
    remap = has_segs and window is None
    kb = unroll * block_k
    out_specs = [
        pl.BlockSpec((1, 1, block_q, dv), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, 8, block_q), lambda b, h, iq, ik: (b, h, 0, iq)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, sq, dv), q.dtype),
        # LSE broadcast over 8 sublanes to satisfy TPU tiling
        jax.ShapeDtypeStruct((b, h, 8, sq), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((block_q, dv + 1), jnp.float32),  # acc (+denominator)
        pltpu.VMEM((block_q, 128), jnp.float32),     # running max
    ]
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, has_segs=has_segs,
        kv_pad=kv_pad, window=window, q_pos=q_pos, unroll=unroll,
        remap=remap,
    )
    if remap:
        qmin, qmax = _block_seg_minmax(q_seg[:, :, 0], block_q)
        kmin, kmax = _block_seg_minmax(kv_seg[:, 0, :], kb)
        cv = None
        if causal:
            cv = (
                q_pos
                + (jnp.arange(sq // block_q)[:, None] + 1) * block_q
                > jnp.arange(sk // kb)[None, :] * kb
            )
        kmap, nvis = _build_remap(qmin, qmax, kmin, kmax, cv)
        in_specs = [
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b, h, iq, ik, km, nv: (b, h, iq, 0)
            ),
            pl.BlockSpec(
                (1, 1, kb, d),
                lambda b, h, iq, ik, km, nv: (b, h // group, km[b, iq, ik], 0),
            ),
            pl.BlockSpec(
                (1, 1, kb, dv + 1),
                lambda b, h, iq, ik, km, nv: (b, h // group, km[b, iq, ik], 0),
            ),
            pl.BlockSpec(
                (1, block_q, 128), lambda b, h, iq, ik, km, nv: (b, iq, 0)
            ),
            pl.BlockSpec(
                (1, 8, kb), lambda b, h, iq, ik, km, nv: (b, 0, km[b, iq, ik])
            ),
        ]
        out, lse = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=in_specs,
                out_specs=[  # out index maps also get the scalar refs
                    pl.BlockSpec(
                        (1, 1, block_q, dv),
                        lambda b, h, iq, ik, km, nv: (b, h, iq, 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, 8, block_q),
                        lambda b, h, iq, ik, km, nv: (b, h, 0, iq),
                    ),
                ],
                scratch_shapes=scratch_shapes,
            ),
            compiler_params=_main_params(max(d, dv)),
            out_shape=out_shape,
            interpret=interpret,
        )(kmap, nvis, q, k, v, q_seg, kv_seg)
        return out, lse

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec(
            (1, 1, kb, d), lambda b, h, iq, ik: (b, h // group, ik, 0)
        ),
        pl.BlockSpec(
            (1, 1, kb, dv + 1), lambda b, h, iq, ik: (b, h // group, ik, 0)
        ),
    ]
    args = [q, k, v]
    if has_segs:
        in_specs += [
            pl.BlockSpec((1, block_q, 128), lambda b, h, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, 8, kb), lambda b, h, iq, ik: (b, 0, ik)),
        ]
        args += [q_seg, kv_seg]

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=_main_params(max(d, dv)),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)
    return out, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    *refs,
    scale: float, causal: bool, block_q: int, block_k: int, has_segs: bool,
    kv_pad: int = 0, window=None, q_pos: int = 0, unroll: int = 1,
    remap: bool = False,
):
    if remap:
        (kmap_ref, nvis_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         qseg_ref, kseg_ref, dq_ref, dq_acc) = refs
    elif has_segs:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
         dq_ref, dq_acc) = refs
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc = refs
        qseg_ref = kseg_ref = None
    iq, ik = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)
    if remap:
        # See _fwd_kernel: dead steps refetch a live block, gate on `live`.
        ib = pl.program_id(0)
        ik_eff = kmap_ref[ib, iq, ik]
        live = ik < nvis_ref[ib, iq]
    else:
        ik_eff = ik

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    if unroll > 1:
        # SSA sub-block loop (see _fwd_kernel): overlaps one sub-block's
        # VPU p/ds math with the next's MXU dots. Fully-masked rows need no
        # guard here: their saved LSE is huge, so p underflows to 0.
        assert window is None
        if remap:
            step_visible = live
        else:
            step_visible = True
            if causal:
                step_visible = _block_visible(
                    iq, ik * unroll, causal=True, block_q=block_q,
                    block_k=block_k, q_pos=q_pos, window=None,
                )
            if qseg_ref is not None:
                step_visible = jnp.logical_and(step_visible, _segs_overlap(
                    qseg_ref[0, :, 0], kseg_ref[0, 0, :]
                ))

        @pl.when(step_visible)
        def _compute_unrolled():
            q = q_ref[0, 0]
            do = do_ref[0, 0]
            lse = lse_ref[0, 0, 0, :].reshape(block_q, 1)
            delta = delta_ref[0, 0, 0, :].reshape(block_q, 1)
            dq = dq_acc[:]
            for u in range(unroll):
                k = k_ref[0, 0, u * block_k:(u + 1) * block_k]
                v = v_ref[0, 0, u * block_k:(u + 1) * block_k]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (scale * LOG2E)
                q_seg = k_seg = None
                if qseg_ref is not None:
                    q_seg = qseg_ref[0, :, 0].reshape(block_q, 1)
                    k_seg = kseg_ref[
                        0, 0, u * block_k:(u + 1) * block_k
                    ].reshape(1, block_k)
                if causal or q_seg is not None:
                    s = _mask_block(
                        s, causal=causal, q_seg=q_seg, k_seg=k_seg,
                        q_offset=q_pos + iq * block_q,
                        k_offset=(ik_eff * unroll + u) * block_k,
                    )
                p = jnp.exp2(s - lse)
                dp = jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = (p * (dp - delta)).astype(k.dtype)
                dq = dq + scale * jax.lax.dot(
                    ds, k, preferred_element_type=jnp.float32
                )
            dq_acc[:] = dq

        @pl.when(ik == nk - 1)
        def _finalize_unrolled():
            dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)

        return

    if remap:
        block_visible = live
    else:
        block_visible = True
        if causal:
            block_visible = q_pos + (iq + 1) * block_q > ik * block_k
        if window is not None:
            in_window = (ik + 1) * block_k > q_pos + iq * block_q - window + 1
            if not causal:
                in_window = jnp.logical_and(
                    in_window,
                    ik * block_k < q_pos + (iq + 1) * block_q + window - 1,
                )
            block_visible = jnp.logical_and(block_visible, in_window)
        if qseg_ref is not None:
            block_visible = jnp.logical_and(block_visible, _segs_overlap(
                qseg_ref[0, :, 0], kseg_ref[0, 0, :]
            ))

    @pl.when(block_visible)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0, :].reshape(block_q, 1)
        delta = delta_ref[0, 0, 0, :].reshape(block_q, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)  # base-2 domain, matching the saved base-2 LSE
        q_seg = k_seg = None
        if qseg_ref is not None:
            q_seg = qseg_ref[0, :, 0].reshape(block_q, 1)
            k_seg = kseg_ref[0, 0, :].reshape(1, block_k)
        s = _mask_block(
            s, causal=causal, q_seg=q_seg, k_seg=k_seg,
            q_offset=q_pos + iq * block_q, k_offset=ik_eff * block_k,
            window=window,
        )
        p = jnp.exp2(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(k.dtype)
        dq_acc[:] += scale * jax.lax.dot(
            ds, k, preferred_element_type=jnp.float32
        )

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    *refs,
    scale: float, causal: bool, block_q: int, block_k: int, has_segs: bool,
    kv_pad: int = 0, window=None, q_pos: int = 0, nq_blocks: int = 1,
    unroll: int = 1, remap: bool = False,
):
    # Innermost grid dim enumerates (q_head_in_group, q_block) pairs so a
    # single (kv_head, k_block) accumulator sums over the whole GQA group.
    if remap:
        (qmap_ref, nqv_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         qseg_ref, kseg_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
    elif has_segs:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
        qseg_ref = kseg_ref = None
    ik, j = pl.program_id(2), pl.program_id(3)
    iq = j % nq_blocks
    nq = pl.num_programs(3)
    if remap:
        # The streamed q block is qmap[b, ik, j % nq_blocks]; dead steps
        # refetch a live block (DMA elided), gate compute on `live`.
        ib = pl.program_id(0)
        iq = qmap_ref[ib, ik, iq]
        live = (j % nq_blocks) < nqv_ref[ib, ik]

    @pl.when(j == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    if unroll > 1:
        # SSA loop over q sub-blocks (group == 1 enforced by the caller so
        # j == iq); LSE of fully-masked rows is huge -> p = 0, no guard.
        # Causal visibility GROWS with the q index, so the step is dead only
        # if its LAST q sub-block is above the diagonal.
        assert window is None
        if remap:
            step_visible = live
        else:
            step_visible = True
            if causal:
                step_visible = _block_visible(
                    j * unroll + unroll - 1, ik, causal=True, block_q=block_q,
                    block_k=block_k, q_pos=q_pos, window=None,
                )
            if qseg_ref is not None:
                step_visible = jnp.logical_and(step_visible, _segs_overlap(
                    qseg_ref[0, :, 0], kseg_ref[0, 0, :]
                ))

        @pl.when(step_visible)
        def _compute_unrolled():
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            dk = dk_acc[:]
            dv = dv_acc[:]
            for u in range(unroll):
                q = q_ref[0, 0, u * block_q:(u + 1) * block_q]
                do = do_ref[0, 0, u * block_q:(u + 1) * block_q]
                lse = lse_ref[
                    0, 0, 0, u * block_q:(u + 1) * block_q
                ].reshape(block_q, 1)
                delta = delta_ref[
                    0, 0, 0, u * block_q:(u + 1) * block_q
                ].reshape(block_q, 1)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (scale * LOG2E)
                q_seg = k_seg = None
                if qseg_ref is not None:
                    q_seg = qseg_ref[
                        0, u * block_q:(u + 1) * block_q, 0
                    ].reshape(block_q, 1)
                    k_seg = kseg_ref[0, 0, :].reshape(1, block_k)
                if causal or q_seg is not None:
                    s = _mask_block(
                        s, causal=causal, q_seg=q_seg, k_seg=k_seg,
                        # iq == j in this branch (group == 1) unless
                        # remapped, in which case it is the actual q block
                        q_offset=q_pos + (iq * unroll + u) * block_q,
                        k_offset=ik * block_k,
                    )
                p = jnp.exp2(s - lse)
                dv = dv + jax.lax.dot_general(
                    p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = (p * (dp - delta)).astype(q.dtype)
                dk = dk + scale * jax.lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dk_acc[:] = dk
            dv_acc[:] = dv

        @pl.when(j == nq - 1)
        def _finalize_unrolled():
            dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)

        return

    if remap:
        block_visible = live
    else:
        block_visible = True
        if causal:
            block_visible = q_pos + (iq + 1) * block_q > ik * block_k
        if window is not None:
            in_window = (ik + 1) * block_k > q_pos + iq * block_q - window + 1
            if not causal:
                in_window = jnp.logical_and(
                    in_window,
                    ik * block_k < q_pos + (iq + 1) * block_q + window - 1,
                )
            block_visible = jnp.logical_and(block_visible, in_window)
        if qseg_ref is not None:
            block_visible = jnp.logical_and(block_visible, _segs_overlap(
                qseg_ref[0, :, 0], kseg_ref[0, 0, :]
            ))

    @pl.when(block_visible)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0, :].reshape(block_q, 1)
        delta = delta_ref[0, 0, 0, :].reshape(block_q, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)  # base-2 domain, matching the saved base-2 LSE
        q_seg = k_seg = None
        if qseg_ref is not None:
            q_seg = qseg_ref[0, :, 0].reshape(block_q, 1)
            k_seg = kseg_ref[0, 0, :].reshape(1, block_k)
        s = _mask_block(
            s, causal=causal, q_seg=q_seg, k_seg=k_seg,
            q_offset=q_pos + iq * block_q, k_offset=ik * block_k,
            window=window,
        )
        p = jnp.exp2(s - lse)  # (bq, bk)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_acc[:] += scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(
    q, k, v, o, lse, do, q_seg, kv_seg,
    *, scale, causal, block_q, block_k, interpret, window=None, q_pos=0,
    group=1, lse_ct=None,
):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dvd = v.shape[-1]  # v/do/o head dim; MLA runs d_v < d_qk
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if lse_ct is not None:
        # LSE cotangent (natural-log units, (B,H,Sq)): d(lse)/d(s_ij) = p_ij,
        # so it enters ds = p*(dp - delta) exactly like -delta does — fold it
        # in instead of touching the kernels.
        delta = delta - lse_ct.astype(jnp.float32)
    delta = jnp.broadcast_to(delta[:, :, None, :], (b, h, 8, sq))

    has_segs = q_seg is not None

    def _pick_unroll(total_blocks, enabled=True):
        if window is not None or not enabled:
            return 1
        u_cap = 4 if max(d, dvd) <= 96 else 2
        for u in (4, 2):
            if u <= u_cap and total_blocks % u == 0:
                return u
        return 1

    # Packed-segment runs stream blocks through live-block remap tables
    # (scalar prefetch) so dead blocks' DMAs are elided — see _build_remap.
    remap = has_segs and window is None
    u_dq = _pick_unroll(sk // block_k if sk % block_k == 0 else 1)
    kbq = u_dq * block_k
    dq_kernel = functools.partial(
        _bwd_dq_kernel, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, has_segs=has_segs,
        window=window, q_pos=q_pos, unroll=u_dq, remap=remap,
    )
    dq_grid = (b, h, pl.cdiv(sq, block_q), pl.cdiv(sk, u_dq * block_k))
    dq_out_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda b, h, iq, ik: (b, h, iq, 0)
    )
    dq_scratch = [pltpu.VMEM((block_q, d), jnp.float32)]
    args = [q, k, v, do, lse, delta]
    if has_segs:
        args += [q_seg, kv_seg]

    if remap:
        q_ids = q_seg[:, :, 0]
        kv_ids = kv_seg[:, 0, :]
        qmin, qmax = _block_seg_minmax(q_ids, block_q)
        kmin, kmax = _block_seg_minmax(kv_ids, kbq)
        cv = None
        if causal:
            cv = (
                q_pos
                + (jnp.arange(sq // block_q)[:, None] + 1) * block_q
                > jnp.arange(sk // kbq)[None, :] * kbq
            )
        kmap, nvis = _build_remap(qmin, qmax, kmin, kmax, cv)
        dq_specs = [
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda b, h, iq, ik, km, nv: (b, h, iq, 0),
            ),  # q
            pl.BlockSpec(
                (1, 1, kbq, d),
                lambda b, h, iq, ik, km, nv: (b, h // group, km[b, iq, ik], 0),
            ),  # k
            pl.BlockSpec(
                (1, 1, kbq, dvd),
                lambda b, h, iq, ik, km, nv: (b, h // group, km[b, iq, ik], 0),
            ),  # v
            pl.BlockSpec(
                (1, 1, block_q, dvd),
                lambda b, h, iq, ik, km, nv: (b, h, iq, 0),
            ),  # do
            pl.BlockSpec(
                (1, 1, 8, block_q),
                lambda b, h, iq, ik, km, nv: (b, h, 0, iq),
            ),  # lse
            pl.BlockSpec(
                (1, 1, 8, block_q),
                lambda b, h, iq, ik, km, nv: (b, h, 0, iq),
            ),  # delta
            pl.BlockSpec(
                (1, block_q, 128), lambda b, h, iq, ik, km, nv: (b, iq, 0)
            ),
            pl.BlockSpec(
                (1, 8, kbq), lambda b, h, iq, ik, km, nv: (b, 0, km[b, iq, ik])
            ),
        ]
        dq = pl.pallas_call(
            dq_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=dq_grid,
                in_specs=dq_specs,
                out_specs=pl.BlockSpec(
                    (1, 1, block_q, d),
                    lambda b, h, iq, ik, km, nv: (b, h, iq, 0),
                ),
                scratch_shapes=dq_scratch,
            ),
            compiler_params=_main_params(max(d, dvd)),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            interpret=interpret,
        )(kmap, nvis, *args)
    else:
        common_specs = [
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik: (b, h, iq, 0)),  # q
            pl.BlockSpec(
                (1, 1, kbq, d), lambda b, h, iq, ik: (b, h // group, ik, 0)
            ),  # k
            pl.BlockSpec(
                (1, 1, kbq, dvd), lambda b, h, iq, ik: (b, h // group, ik, 0)
            ),  # v
            pl.BlockSpec((1, 1, block_q, dvd), lambda b, h, iq, ik: (b, h, iq, 0)),  # do
            pl.BlockSpec((1, 1, 8, block_q), lambda b, h, iq, ik: (b, h, 0, iq)),  # lse
            pl.BlockSpec((1, 1, 8, block_q), lambda b, h, iq, ik: (b, h, 0, iq)),  # delta
        ]
        seg_specs = [
            pl.BlockSpec((1, block_q, 128), lambda b, h, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, 8, kbq), lambda b, h, iq, ik: (b, 0, ik)),
        ] if has_segs else []
        dq = pl.pallas_call(
            dq_kernel,
            grid=dq_grid,
            compiler_params=_main_params(max(d, dvd)),
            in_specs=common_specs + seg_specs,
            out_specs=dq_out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            scratch_shapes=dq_scratch,
            interpret=interpret,
        )(*args)

    # For the dk/dv pass the grid walks the kv heads on dim 1 and
    # (q_head_in_group, q_block) pairs innermost; the index maps receive
    # (b, hk, ik, j) with q_head = hk*group + j // nq_blocks, iq = j % nq.
    nq_total = pl.cdiv(sq, block_q)
    # q-sub-block unroll only without GQA grouping (the innermost grid dim
    # then enumerates q blocks alone, which stay memory-contiguous)
    u_kv = _pick_unroll(
        nq_total if sq % block_q == 0 else 1, enabled=(group == 1)
    )
    nq_blocks = nq_total // u_kv
    qb = u_kv * block_q

    def _qh(hk, j):
        return hk * group + j // nq_blocks

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, has_segs=has_segs,
        window=window, q_pos=q_pos, nq_blocks=nq_blocks,
        unroll=u_kv, remap=remap,
    )
    dkv_grid = (b, h // group, pl.cdiv(sk, block_k), group * nq_blocks)
    dkv_out_specs = [
        pl.BlockSpec((1, 1, block_k, d), lambda b, h, ik, iq: (b, h, ik, 0)),
        pl.BlockSpec((1, 1, block_k, dvd), lambda b, h, ik, iq: (b, h, ik, 0)),
    ]
    dkv_out_shape = [
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ]
    dkv_scratch = [
        pltpu.VMEM((block_k, d), jnp.float32),
        pltpu.VMEM((block_k, dvd), jnp.float32),
    ]
    if remap:
        # Anchor on k blocks, stream q superblocks (qb = u_kv * block_q).
        # Dead q blocks repeat their predecessor's index, eliding the
        # q/do/lse/delta fetches; the head term of the index map changes
        # only at GQA-group boundaries so elision holds within each group
        # chunk of the innermost grid dim.
        kmin_a, kmax_a = _block_seg_minmax(kv_ids, block_k)
        qmin_s, qmax_s = _block_seg_minmax(q_ids, qb)
        cv2 = None
        if causal:
            cv2 = (
                q_pos + (jnp.arange(nq_blocks)[None, :] + 1) * qb
                > jnp.arange(sk // block_k)[:, None] * block_k
            )
        qmap, nqv = _build_remap(kmin_a, kmax_a, qmin_s, qmax_s, cv2)
        dkv_specs = [
            pl.BlockSpec(
                (1, 1, qb, d),
                lambda b, hk, ik, j, qm, nv: (
                    b, _qh(hk, j), qm[b, ik, j % nq_blocks], 0
                ),
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda b, hk, ik, j, qm, nv: (b, hk, ik, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, dvd),
                lambda b, hk, ik, j, qm, nv: (b, hk, ik, 0),
            ),
            pl.BlockSpec(
                (1, 1, qb, dvd),
                lambda b, hk, ik, j, qm, nv: (
                    b, _qh(hk, j), qm[b, ik, j % nq_blocks], 0
                ),
            ),
            pl.BlockSpec(
                (1, 1, 8, qb),
                lambda b, hk, ik, j, qm, nv: (
                    b, _qh(hk, j), 0, qm[b, ik, j % nq_blocks]
                ),
            ),
            pl.BlockSpec(
                (1, 1, 8, qb),
                lambda b, hk, ik, j, qm, nv: (
                    b, _qh(hk, j), 0, qm[b, ik, j % nq_blocks]
                ),
            ),
            pl.BlockSpec(
                (1, qb, 128),
                lambda b, hk, ik, j, qm, nv: (b, qm[b, ik, j % nq_blocks], 0),
            ),
            pl.BlockSpec(
                (1, 8, block_k), lambda b, hk, ik, j, qm, nv: (b, 0, ik)
            ),
        ]
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=dkv_grid,
                in_specs=dkv_specs,
                out_specs=[
                    pl.BlockSpec(
                        (1, 1, block_k, d),
                        lambda b, h, ik, iq, qm, nv: (b, h, ik, 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, dvd),
                        lambda b, h, ik, iq, qm, nv: (b, h, ik, 0),
                    ),
                ],
                scratch_shapes=dkv_scratch,
            ),
            compiler_params=_main_params(max(d, dvd)),
            out_shape=dkv_out_shape,
            interpret=interpret,
        )(qmap, nqv, *args)
        return dq, dk, dv

    dkv_specs = [
        pl.BlockSpec(
            (1, 1, qb, d),
            lambda b, hk, ik, j: (b, _qh(hk, j), j % nq_blocks, 0),
        ),
        pl.BlockSpec((1, 1, block_k, d), lambda b, hk, ik, j: (b, hk, ik, 0)),
        pl.BlockSpec((1, 1, block_k, dvd), lambda b, hk, ik, j: (b, hk, ik, 0)),
        pl.BlockSpec(
            (1, 1, qb, dvd),
            lambda b, hk, ik, j: (b, _qh(hk, j), j % nq_blocks, 0),
        ),
        pl.BlockSpec(
            (1, 1, 8, qb),
            lambda b, hk, ik, j: (b, _qh(hk, j), 0, j % nq_blocks),
        ),
        pl.BlockSpec(
            (1, 1, 8, qb),
            lambda b, hk, ik, j: (b, _qh(hk, j), 0, j % nq_blocks),
        ),
    ]
    dkv_seg_specs = [
        pl.BlockSpec(
            (1, qb, 128), lambda b, hk, ik, j: (b, j % nq_blocks, 0)
        ),
        pl.BlockSpec((1, 8, block_k), lambda b, hk, ik, j: (b, 0, ik)),
    ] if has_segs else []

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=dkv_grid,
        compiler_params=_main_params(max(d, dvd)),
        in_specs=dkv_specs + dkv_seg_specs,
        out_specs=dkv_out_specs,
        out_shape=dkv_out_shape,
        scratch_shapes=dkv_scratch,
        interpret=interpret,
    )(*args)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13)
)
def _flash_attention(
    q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret,
    kv_pad, window, group, q_pos,
):
    out, _ = _fwd(
        q, k, v, q_seg, kv_seg, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, interpret=interpret,
        kv_pad=kv_pad, window=window, q_pos=q_pos, group=group,
    )
    return out


def _flash_fwd_rule(
    q, k, v, q_seg, kv_seg, scale, causal, bq, bk, interp, kv_pad, window,
    group, q_pos,
):
    out, lse = _fwd(
        q, k, v, q_seg, kv_seg, scale=scale, causal=causal,
        block_q=bq, block_k=bk, interpret=interp, kv_pad=kv_pad,
        window=window, q_pos=q_pos, group=group,
    )
    return out, (q, k, v, out, lse, q_seg, kv_seg)


def _flash_bwd_rule(
    scale, causal, bq, bk, interp, kv_pad, window, group, q_pos, res, g
):
    # The backward needs no pad handling: pad K/V rows are zero, so dq gets
    # no contribution from them, and dk/dv pad rows are sliced by the
    # wrapper; q pad rows carry zero cotangent.
    q, k, v, out, lse, q_seg, kv_seg = res
    dq, dk, dv = _bwd(
        q, k, v, out, lse, g, q_seg, kv_seg,
        scale=scale, causal=causal, block_q=bq, block_k=bk, interpret=interp,
        window=window, q_pos=q_pos, group=group,
    )
    return dq, dk, dv, None, None


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# ---------------------------------------------------------------------------
# LSE-returning variant (ring attention's inner)
# ---------------------------------------------------------------------------
#
# Identical kernels; the public contract additionally exposes the softmax
# log-sum-exp so callers can merge partial attentions across KV chunks
# (parallel/ring.py rotates KV shards around the ring and combines partials
# by LSE). Differentiable in BOTH outputs: the LSE cotangent folds into the
# backward kernels' delta term (see _bwd lse_ct) — d lse/d s_ij = p_ij, the
# same shape the -delta term already rides.


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13)
)
def _flash_attention_lse(
    q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret,
    kv_pad, window, group, q_pos,
):
    out, lse = _fwd(
        q, k, v, q_seg, kv_seg, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, interpret=interpret,
        kv_pad=kv_pad, window=window, q_pos=q_pos, group=group,
    )
    return out, lse[:, :, 0, :]  # base-2, (B, H, Sq)


def _flash_lse_fwd_rule(
    q, k, v, q_seg, kv_seg, scale, causal, bq, bk, interp, kv_pad, window,
    group, q_pos,
):
    out, lse = _fwd(
        q, k, v, q_seg, kv_seg, scale=scale, causal=causal,
        block_q=bq, block_k=bk, interpret=interp, kv_pad=kv_pad,
        window=window, q_pos=q_pos, group=group,
    )
    return (out, lse[:, :, 0, :]), (q, k, v, out, lse, q_seg, kv_seg)


def _flash_lse_bwd_rule(
    scale, causal, bq, bk, interp, kv_pad, window, group, q_pos, res, g
):
    q, k, v, out, lse, q_seg, kv_seg = res
    g_out, g_lse2 = g
    # g_lse2 is the cotangent of the BASE-2 lse output; _bwd's fold expects
    # natural units (lse_nat = lse2/LOG2E => g_nat = g_lse2 * LOG2E).
    dq, dk, dv = _bwd(
        q, k, v, out, lse, g_out, q_seg, kv_seg,
        scale=scale, causal=causal, block_q=bq, block_k=bk, interpret=interp,
        window=window, q_pos=q_pos, group=group,
        lse_ct=g_lse2 * LOG2E,
    )
    return dq, dk, dv, None, None


_flash_attention_lse.defvjp(_flash_lse_fwd_rule, _flash_lse_bwd_rule)

# Empty-row sentinel: the forward writes lse2 = -DEFAULT_MASK_VALUE
# (+2.38e38) for rows with zero visible keys so the backward's
# p = exp2(s2 - lse2) underflows to 0. Partial-softmax merges need -inf
# there instead (a huge POSITIVE lse would win the merge max and zero
# the combined output); real lse2 is bounded by |s|*log2e << 1e37.
_EMPTY_LSE2 = 1e37


def flash_attention_with_lse(
    q: jax.Array,  # (B, Sq, Hq, D) — or (B, Hq, Sq, D) with layout="bhsd"
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    q_segment_ids: Optional[jax.Array] = None,  # (B, Sq)
    kv_segment_ids: Optional[jax.Array] = None,  # (B, Sk)
    softmax_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    q_position_offset: int = 0,
    interpret: bool = False,
    layout: str = "bshd",
) -> tuple[jax.Array, jax.Array]:
    """Flash attention returning (out, lse) where lse is the NATURAL-log
    softmax normalizer, (B, Hq, Sq) f32; rows with no visible keys get
    lse = -inf and out = 0. Fully differentiable in both outputs — ring
    attention's partial-softmax merge backprops through the lse.

    Skips the small-S / ragged-tail specializations of `flash_attention`
    (their LSEs live in merged/fused forms); any needed padding rides the
    explicit segment-id path so the LSE stays exact."""
    if layout == "bhsd":
        b, hq, sq, d = q.shape
        _, hkv, sk, _ = k.shape
    else:
        assert layout == "bshd", layout
        b, sq, hq, d = q.shape
        _, sk, hkv, _ = k.shape
    assert hq % hkv == 0, f"GQA heads {hq} not divisible by kv heads {hkv}"
    group = hq // hkv
    scale = softmax_scale if softmax_scale is not None else d ** -0.5

    block_q_eff, block_k_eff = _pick_blocks(sq, sk, block_q, block_k)
    sq_p = _round_up(sq, block_q_eff)
    sk_p = _round_up(sk, block_k_eff)
    needs_pad = (sq_p != sq) or (sk_p != sk)
    has_segs = q_segment_ids is not None or kv_segment_ids is not None
    if needs_pad or has_segs:
        if q_segment_ids is None:
            q_segment_ids = jnp.zeros((b, sq), jnp.int32)
        if kv_segment_ids is None:
            kv_segment_ids = jnp.zeros((b, sk), jnp.int32)
        q_segment_ids = jnp.pad(
            q_segment_ids, ((0, 0), (0, sq_p - sq)), constant_values=-1
        )
        kv_segment_ids = jnp.pad(
            kv_segment_ids, ((0, 0), (0, sk_p - sk)), constant_values=-2
        )
        q_segment_ids = jnp.broadcast_to(
            q_segment_ids[:, :, None], (b, sq_p, 128)
        )
        kv_segment_ids = jnp.broadcast_to(
            kv_segment_ids[:, None, :], (b, 8, sk_p)
        )
    if needs_pad:
        s_axis = 2 if layout == "bhsd" else 1

        def _pad_s(x, n):
            pads = [(0, 0)] * 4
            pads[s_axis] = (0, n)
            return jnp.pad(x, pads)

        q = _pad_s(q, sq_p - sq)
        k = _pad_s(k, sk_p - sk)
        v = _pad_s(v, sk_p - sk)

    if layout == "bshd":
        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
    out, lse2 = _flash_attention_lse(
        q, k, v, q_segment_ids, kv_segment_ids,
        scale, causal, block_q_eff, block_k_eff, interpret, 0,
        None, group, q_position_offset,
    )
    lse = jnp.where(lse2 >= _EMPTY_LSE2, -jnp.inf, lse2 / LOG2E)
    if needs_pad:
        out = out[:, :, :sq]
        lse = lse[:, :, :sq]
    if layout == "bshd":
        out = jnp.transpose(out, (0, 2, 1, 3))
    return out, lse


# ---------------------------------------------------------------------------
# Ragged-tail decomposition
# ---------------------------------------------------------------------------
#
# Sequences just over a block boundary (the encoder's S = 4096 patches + CLS
# = 4097) would pad a whole extra block per grid axis — 1.56x wasted work at
# 1024-blocks. Instead: run the Pallas kernel on the block-aligned main
# region only (zero padding), handle the ragged tails (< _RAGGED_TAIL_MAX
# rows/keys) with plain XLA einsum attention, and merge the two partial
# softmaxes through their base-2 LSEs. The backward reuses the main _bwd
# kernel with the *combined* LSE (p = exp2(s2 - lse2) is then the true
# probability over the full key set, so per-key-subset gradients just add).

_RAGGED_TAIL_MAX = 64  # XLA tail branches materialize (B,H,tail,S) scores


def _xla_partial_attn(q, k, v, scale2):
    """Dense attention over a small key set. (B,H,Sq,D)x(B,H,T,D) ->
    normalized out (B,H,Sq,D) and base-2 lse (B,H,Sq)."""
    s2 = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale2
    m = jnp.max(s2, axis=-1)
    p = jnp.exp2(s2 - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ) / l[..., None]
    return o, m + jnp.log2(l)


def _combine_partials(o1, lse1, o2, lse2, out_dtype):
    """Merge two normalized partial softmax outputs via their base-2 LSEs."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp2(lse1 - m)
    w2 = jnp.exp2(lse2 - m)
    den = w1 + w2
    o = o1 * (w1 / den)[..., None] + o2 * (w2 / den)[..., None]
    return o.astype(out_dtype), m + jnp.log2(den)


def _xla_partial_grads(q, k, v, do, lse2, delta, scale, scale2):
    """Gradients of the (small-key-set) branch given the global base-2 lse
    and delta = sum(do * out_full): returns (dq_add, dk, dv)."""
    f32 = jnp.float32
    s2 = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=f32) * scale2
    p = jnp.exp2(s2 - lse2[..., None])  # true probs over the full key set
    dp = jnp.einsum("bhqd,bhkd->bhqk", do, v, preferred_element_type=f32)
    ds = (p * (dp - delta[..., None])).astype(q.dtype)
    dq = scale * jnp.einsum(
        "bhqk,bhkd->bhqd", ds, k, preferred_element_type=f32
    )
    dk = scale * jnp.einsum(
        "bhqk,bhqd->bhkd", ds, q, preferred_element_type=f32
    )
    dv = jnp.einsum(
        "bhqk,bhqd->bhkd", p.astype(do.dtype), do, preferred_element_type=f32
    )
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _ragged_fwd_impl(q, k, v, scale, bq, bk, interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sqm, skm = sq - sq % bq, sk - sk % bk
    scale2 = scale * LOG2E
    qm = q[:, :, :sqm]
    km, vm = k[:, :, :skm], v[:, :, :skm]
    om, lsem = _fwd(
        qm, km, vm, None, None, scale=scale, causal=False,
        block_q=bq, block_k=bk, interpret=interpret,
    )
    lse_main = lsem[:, :, 0, :]  # (b,h,sqm) base-2
    if skm < sk:
        ot, lset = _xla_partial_attn(qm, k[:, :, skm:], v[:, :, skm:], scale2)
        out_main, lse_main = _combine_partials(
            om.astype(jnp.float32), lse_main, ot, lset, q.dtype
        )
    else:
        out_main = om
    if sqm < sq:
        o_tail, lse_tail = _xla_partial_attn(q[:, :, sqm:], k, v, scale2)
        out = jnp.concatenate([out_main, o_tail.astype(q.dtype)], axis=2)
        lse = jnp.concatenate([lse_main, lse_tail], axis=2)
    else:
        out, lse = out_main, lse_main
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_ragged(q, k, v, scale, block_q, block_k, interpret):
    return _ragged_fwd_impl(q, k, v, scale, block_q, block_k, interpret)[0]


def _ragged_fwd_rule(q, k, v, scale, bq, bk, interpret):
    out, lse = _ragged_fwd_impl(q, k, v, scale, bq, bk, interpret)
    return out, (q, k, v, out, lse)


def _ragged_bwd_rule(scale, bq, bk, interpret, res, g):
    q, k, v, out, lse = res
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sqm, skm = sq - sq % bq, sk - sk % bk
    scale2 = scale * LOG2E

    qm, km, vm = q[:, :, :sqm], k[:, :, :skm], v[:, :, :skm]
    out_m, do_m = out[:, :, :sqm], g[:, :, :sqm]
    lse_m = jnp.broadcast_to(lse[:, :, None, :sqm], (b, h, 8, sqm))
    dq_m, dk, dv = _bwd(
        qm, km, vm, out_m, lse_m, do_m, None, None,
        scale=scale, causal=False, block_q=bq, block_k=bk,
        interpret=interpret,
    )
    if skm < sk:
        delta_m = jnp.sum(
            do_m.astype(jnp.float32) * out_m.astype(jnp.float32), axis=-1
        )
        dq_add, dk_t, dv_t = _xla_partial_grads(
            qm, k[:, :, skm:], v[:, :, skm:], do_m,
            lse[:, :, :sqm], delta_m, scale, scale2,
        )
        dq_m = dq_m + dq_add.astype(q.dtype)
        dk = jnp.concatenate([dk, dk_t], axis=2)
        dv = jnp.concatenate([dv, dv_t], axis=2)
    if sqm < sq:
        q_t, out_t, do_t = q[:, :, sqm:], out[:, :, sqm:], g[:, :, sqm:]
        delta_t = jnp.sum(
            do_t.astype(jnp.float32) * out_t.astype(jnp.float32), axis=-1
        )
        dq_t, dk_add, dv_add = _xla_partial_grads(
            q_t, k, v, do_t, lse[:, :, sqm:], delta_t, scale, scale2,
        )
        dq = jnp.concatenate([dq_m, dq_t.astype(q.dtype)], axis=2)
        dk = dk + dk_add
        dv = dv + dv_add
    else:
        dq = dq_m
    return dq, dk, dv


_flash_attention_ragged.defvjp(_ragged_fwd_rule, _ragged_bwd_rule)


# ---------------------------------------------------------------------------
# Small-S zero-copy path
# ---------------------------------------------------------------------------
#
# At short sequence lengths (the masked-pretrain encoder runs S=820: 20% of
# 4096 visible + CLS) the general path's cost is not the kernel — a single
# 896x896 block already covers S — but the HOST-SIDE data movement around
# it: pad to the block multiple (3 copies), transpose (B,S,H,D)->(B,H,S,D)
# (3 copies), the V ones-column pad, the output transpose + slice. Measured
# in-context (xplane, tools_r3/masked_ablate.py) that overhead is
# ~0.5-0.8 ms/layer against a ~0.25 ms kernel.
#
# This path is zero-copy: (B,S,H,D) is reshaped FREE to the projection
# layout (B,S,H*D) (contiguous bitcast) and the kernel consumes it
# directly — full-width (chunk, H*D) blocks whose lane dim equals the
# array dim (always legal in Mosaic regardless of alignment), with each
# head's (S, D) matrix carved out by a STATIC lane slice inside the
# kernel (an in-register relayout, ~10 us/layer — measured; dynamic or
# DMA-level unaligned slicing is rejected by Mosaic, static is fine). S is
# exact, so there is no sequence padding and no masking anywhere. The
# whole score row-block fits VMEM, so softmax is one exact pass — no
# running max, no rescale, no ones-column denominator trick. Queries go
# in CQ-row chunks (VMEM bound + MXU-friendly M); K/V ride full-width
# blocks whose index is constant across chunks, so they are DMA'd once
# per batch row.
#
# Measured at the masked shape (B=8, S=820, H=16, D=88, bf16, v5e), scan
# of 40 layers: this kernel 0.411 ms/layer in-context-equivalent vs the
# general path's 1.13 ms/layer in-context (0.5 standalone). Rejected with
# measurements: lane-padding D 88->128 + per-head (S,128) slab blocks
# (0.499 standalone but XLA materializes the pads in a transposed layout
# in-context: pad.94/copy.769 in the HLO, ~0.5 ms/layer of data
# formatting); manual-DMA per-head slabs (Mosaic: DMA slices must be
# 8-aligned in sublanes, 820 is not); CQ=104 (1.40 ms/layer — M too small
# for the MXU). CQ originally capped at 208 by the compiler's default 16M
# scoped-vmem ceiling; raising the ceiling (v5e has 128M physical) made
# CQ=416 both compile and win — see _SMALL_S_VMEM_LIMIT.
#
# The backward is two kernels in the same layout (no host transposes):
# dq (chunked q, full K/V; also emits per-head base-2 LSE + delta), then
# dk/dv (chunked both ways, accumulating into revisited output blocks).

_SMALL_S_MAX = 1024
# All small-S kernels raise the scoped-vmem ceiling from the compiler's 16M
# default (v5e has 128M physical); the budget below keeps the working set
# comfortably under the raised ceiling. CQ=416 measured 0.390 ms/layer vs
# 0.501 at CQ=208 at the masked shape (B=8, S=820) once the ceiling allowed
# it; CQ=624 regressed (624+196 chunk imbalance) and CQ=832 still OOMs.
_SMALL_S_VMEM_LIMIT = 48 * 1024 * 1024
_SMALL_S_VMEM_BUDGET = 40 * 1024 * 1024
_SMALL_S_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_SMALL_S_VMEM_LIMIT)

# Main-kernel scoped-vmem override (None = compiler default 16M). Raised
# limits let block shapes above 1024x1024 compile — measured on-chip
# before adoption (see PERF.md); experiments set this via monkeypatch.
_MAIN_PARAMS = None

# Wide-head (d > 128) shapes — MLA prefill/train runs q_head_dim 192
# (nope 128 + rope 64) — overflow the compiler's 16M scoped-vmem stack at
# the measured-best 1024x1024 blocks (17.38M observed at B=8 S=2048 h=20
# d=192). Raise the ceiling for those shapes only; d <= 128 keeps the
# default so the measured encoder kernels are untouched. v5e has 128M
# physical vmem.
_WIDE_HEAD_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=32 * 1024 * 1024
)


def _main_params(d: int):
    if _MAIN_PARAMS is not None:
        return _MAIN_PARAMS
    return _WIDE_HEAD_PARAMS if d > 128 else None


def _ss_cq(s: int) -> int:
    return min(_round_up(s, 8), 416)


def _ss_fits(sq: int, sk: int, w: int, itemsize: int) -> bool:
    cq = _ss_cq(sq)
    est = 2 * 2 * sk * w * itemsize      # k, v (double-buffered)
    est += 2 * 2 * cq * w * itemsize     # q, out
    est += 3 * cq * sk * 4               # scores/probs f32
    return est <= _SMALL_S_VMEM_BUDGET


def _small_s_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, h, d):
    qb = q_ref[0]  # (cq, h*d)
    kb = k_ref[0]  # (sk, h*d)
    vb = v_ref[0]
    for i in range(h):
        sl = slice(i * d, (i + 1) * d)
        s = jax.lax.dot_general(
            qb[:, sl], kb[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)
        m = jnp.max(s, axis=1)
        p = jnp.exp2(s - m[:, None])
        l = jnp.sum(p, axis=1)
        o = jax.lax.dot(
            p.astype(vb.dtype), vb[:, sl], preferred_element_type=jnp.float32
        )
        o_ref[0, :, sl] = (o / l[:, None]).astype(o_ref.dtype)


def _small_s_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, delta_ref, dq_ref, lse_ref, *, scale, h, d,
):
    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    dob = do_ref[0]
    for i in range(h):
        sl = slice(i * d, (i + 1) * d)
        s = jax.lax.dot_general(
            qb[:, sl], kb[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)
        m = jnp.max(s, axis=1)
        p = jnp.exp2(s - m[:, None])
        l = jnp.sum(p, axis=1)
        pn = p / l[:, None]
        delta = delta_ref[0, :, i]
        dp = jax.lax.dot_general(
            dob[:, sl], vb[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (pn * (dp - delta[:, None])).astype(kb.dtype)
        dq_ref[0, :, sl] = (scale * jax.lax.dot(
            ds, kb[:, sl], preferred_element_type=jnp.float32
        )).astype(dq_ref.dtype)
        lse_ref[0, :, i] = m + jnp.log2(l)


def _small_s_dkdv_kernel(
    q_ref, k_ref, v_ref, do_ref, delta_ref, lse_ref, dk_ref, dv_ref,
    *, scale, h, d, sq: int,
):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    dob = do_ref[0]
    cq = qb.shape[0]
    # rows past sq are block-padding garbage; unlike fwd/dq (whose garbage
    # rows land in dropped output rows) this kernel REDUCES over q rows,
    # so they must be zeroed before the transposed dots
    valid = (
        iq * cq + jax.lax.broadcasted_iota(jnp.int32, (cq, 1), 0)
    ) < sq
    for i in range(h):
        sl = slice(i * d, (i + 1) * d)
        # the transposed dots below contract over q ROWS, so garbage rows
        # must be zeroed in the q/do operands too (0 * NaN = NaN through a
        # contraction even when ds/pn are masked)
        qh = jnp.where(valid, qb[:, sl], 0)
        doh = jnp.where(valid, dob[:, sl], 0)
        s = jax.lax.dot_general(
            qh, kb[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)
        pn = jnp.where(
            valid, jnp.exp2(s - lse_ref[0, :, i][:, None]), 0.0
        )
        dp = jax.lax.dot_general(
            doh, vb[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = jnp.where(
            valid, pn * (dp - delta_ref[0, :, i][:, None]), 0.0
        ).astype(kb.dtype)
        dk_ref[0, :, sl] += (scale * jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )).astype(dk_ref.dtype)
        dv_ref[0, :, sl] += jax.lax.dot_general(
            pn.astype(dob.dtype), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _small_s_attention(q, k, v, h, d, scale, interpret):
    """q/k/v: (B, S, H*D) — the free reshape of the projection layout."""
    b, sq, w = q.shape
    sk = k.shape[1]
    cq = _ss_cq(sq)
    return pl.pallas_call(
        functools.partial(_small_s_fwd_kernel, scale=scale, h=h, d=d),
        grid=(b, pl.cdiv(sq, cq)),
        in_specs=[
            pl.BlockSpec((1, cq, w), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, sk, w), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, sk, w), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cq, w), lambda bi, qi: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, w), q.dtype),
        compiler_params=_SMALL_S_PARAMS,
        interpret=interpret,
    )(q, k, v)


def _small_s_fwd_rule(q, k, v, h, d, scale, interpret):
    out = _small_s_attention(q, k, v, h, d, scale, interpret)
    return out, (q, k, v, out)


def _small_s_bwd_rule(h, d, scale, interpret, res, g):
    q, k, v, out = res
    b, sq, w = q.shape
    sk = k.shape[1]
    cq = _ss_cq(sq)
    ck = _ss_cq(sk)
    f32 = jnp.float32
    # per-head delta = rowsum(do * out): one fused elementwise+reduce in
    # XLA — cheaper than carrying `out` into the dq kernel
    delta = jnp.sum(
        g.astype(f32).reshape(b, sq, h, d)
        * out.astype(f32).reshape(b, sq, h, d),
        axis=-1,
    )  # (b, sq, h)
    qs = pl.BlockSpec((1, cq, w), lambda bi, qi: (bi, qi, 0))
    ks = pl.BlockSpec((1, sk, w), lambda bi, qi: (bi, 0, 0))
    hs = pl.BlockSpec((1, cq, h), lambda bi, qi: (bi, qi, 0))
    dq, lse = pl.pallas_call(
        functools.partial(_small_s_dq_kernel, scale=scale, h=h, d=d),
        grid=(b, pl.cdiv(sq, cq)),
        in_specs=[qs, ks, ks, qs, hs],
        out_specs=[qs, hs],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, w), q.dtype),
            jax.ShapeDtypeStruct((b, sq, h), f32),
        ],
        compiler_params=_SMALL_S_PARAMS,
        interpret=interpret,
    )(q, k, v, g, delta)
    q3 = pl.BlockSpec((1, cq, w), lambda bi, ki, qi: (bi, qi, 0))
    k3 = pl.BlockSpec((1, ck, w), lambda bi, ki, qi: (bi, ki, 0))
    h3 = pl.BlockSpec((1, cq, h), lambda bi, ki, qi: (bi, qi, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_small_s_dkdv_kernel, scale=scale, h=h, d=d, sq=sq),
        grid=(b, pl.cdiv(sk, ck), pl.cdiv(sq, cq)),
        in_specs=[q3, k3, k3, q3, h3, h3],
        out_specs=[k3, k3],
        out_shape=[
            jax.ShapeDtypeStruct((b, sk, w), k.dtype),
            jax.ShapeDtypeStruct((b, sk, w), v.dtype),
        ],
        compiler_params=_SMALL_S_PARAMS,
        interpret=interpret,
    )(q, k, v, g, delta, lse)
    return dq, dk, dv


_small_s_attention.defvjp(_small_s_fwd_rule, _small_s_bwd_rule)


# ---------------------------------------------------------------------------
# Fused qkv + whole-dim QK-RMSNorm + attention (small-S forward)
# ---------------------------------------------------------------------------
#
# The encoder's attention consumes the (B, S, 3W) output of one flat qkv
# GEMM; between that GEMM and the kernel sit three lane slices and two
# whole-dim RMSNorms (reference internvideo2.py:171-172 normalizes q/k over
# the flattened head dim). Even with the zero-copy small-S kernel, XLA
# materializes normalized q and k plus the v slice — three full-tensor
# write+read passes per layer. This op removes them: the kernel takes THREE
# BlockSpec views of the SAME qkv array (block width W at column blocks
# 0/1/2 — W = H*D is a lane multiple of the 3W array, so the views are
# block-aligned), applies the RMSNorms in-kernel on full-width rows
# (replicating rms_norm's exact cast chain: f32 variance, normalize, cast
# to input dtype, multiply by f32 weight, cast back), and runs the same
# per-head static-lane-slice attention.
#
# The backward VJPs the unfused composition (slice → rms_norm →
# _small_s_attention), so gradients are exactly the production path's; the
# recomputed forward inside the VJP is the same work full remat would do.

def _small_s_fused_fwd_kernel(
    q_ref, k_ref, v_ref, qw_ref, kw_ref, o_ref, *, scale, h, d, eps,
):
    def _norm(x, w_row):
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
        return (w_row * normed.astype(jnp.float32)).astype(x.dtype)

    qb = _norm(q_ref[0], qw_ref[0][None, :])  # (cq, h*d)
    kb = _norm(k_ref[0], kw_ref[0][None, :])  # (sk, h*d)
    vb = v_ref[0]
    for i in range(h):
        sl = slice(i * d, (i + 1) * d)
        s = jax.lax.dot_general(
            qb[:, sl], kb[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)
        m = jnp.max(s, axis=1)
        p = jnp.exp2(s - m[:, None])
        l = jnp.sum(p, axis=1)
        o = jax.lax.dot(
            p.astype(vb.dtype), vb[:, sl], preferred_element_type=jnp.float32
        )
        o_ref[0, :, sl] = (o / l[:, None]).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_qkv_small_s(qkv, qw, kw, h, d, scale, eps, interpret):
    """qkv: (B, S, 3W) straight off the projection GEMM; qw/kw: (W,) f32."""
    b, s, w3 = qkv.shape
    w = w3 // 3
    cq = _ss_cq(s)
    col = pl.BlockSpec((1, w), lambda bi, qi: (0, 0))
    return pl.pallas_call(
        functools.partial(
            _small_s_fused_fwd_kernel, scale=scale, h=h, d=d, eps=eps
        ),
        grid=(b, pl.cdiv(s, cq)),
        in_specs=[
            pl.BlockSpec((1, cq, w), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, s, w), lambda bi, qi: (bi, 0, 1)),
            pl.BlockSpec((1, s, w), lambda bi, qi: (bi, 0, 2)),
            col, col,
        ],
        out_specs=pl.BlockSpec((1, cq, w), lambda bi, qi: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, w), qkv.dtype),
        compiler_params=_SMALL_S_PARAMS,
        interpret=interpret,
    )(qkv, qkv, qkv, qw.reshape(1, w), kw.reshape(1, w))


def _fused_qkv_unfused_ref(qkv, qw, kw, h, d, scale, eps, interpret):
    from internvideo_tpu.ops.rmsnorm import rms_norm

    w = h * d
    q = rms_norm(qkv[..., :w], qw, eps=eps)
    k = rms_norm(qkv[..., w:2 * w], kw, eps=eps)
    v = qkv[..., 2 * w:]
    return _small_s_attention(q, k, v, h, d, scale, interpret)


def _fused_qkv_fwd_rule(qkv, qw, kw, h, d, scale, eps, interpret):
    out = _fused_qkv_small_s(qkv, qw, kw, h, d, scale, eps, interpret)
    return out, (qkv, qw, kw)


def _fused_qkv_bwd_rule(h, d, scale, eps, interpret, res, g):
    qkv, qw, kw = res
    _, vjp = jax.vjp(
        lambda a, b, c: _fused_qkv_unfused_ref(
            a, b, c, h, d, scale, eps, interpret
        ),
        qkv, qw, kw,
    )
    return vjp(g)


_fused_qkv_small_s.defvjp(_fused_qkv_fwd_rule, _fused_qkv_bwd_rule)


def fused_qkv_eligible(s: int, num_heads: int, head_dim: int,
                       itemsize: int) -> bool:
    """Can (B, S, 3W) self-attention take the fused small-S path?"""
    w = num_heads * head_dim
    if not (0 < s <= _SMALL_S_MAX):
        return False
    # the kernel carves the (B, S, 3W) projection into interior column
    # blocks of width W — Mosaic only accepts those views when W itself
    # is lane-aligned (otherwise: compile-time unaligned-block error, not
    # a fallback)
    if w % 128:
        return False
    # the fused kernel only adds per-row 1/rms factors and per-head
    # (S, D) staging on top of the plain small-S footprint
    return _ss_fits(s, s, w, itemsize)


def fused_qkv_rmsnorm_attention(
    qkv: jax.Array,          # (B, S, 3*W) — one flat projection GEMM output
    q_weight: jax.Array,     # (W,) f32 RMSNorm weight over the flattened dim
    k_weight: jax.Array,
    *,
    num_heads: int,
    eps: float = 1e-6,
    softmax_scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused qkv-slice + whole-dim QK-RMSNorm + small-S flash attention.

    Returns (B, S, W) in projection layout (reshape to (B, S, H, D) is
    free). Caller must ensure `fused_qkv_eligible` — this asserts it.
    """
    b, s, w3 = qkv.shape
    w = w3 // 3
    assert w3 == 3 * w and w % num_heads == 0
    d = w // num_heads
    itemsize = jnp.dtype(qkv.dtype).itemsize
    assert fused_qkv_eligible(s, num_heads, d, itemsize) or (
        fused_qkv_large_eligible(s, num_heads, d, itemsize)
    )
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    if 0 < s <= _SMALL_S_MAX and _ss_fits(
        s, s, w, jnp.dtype(qkv.dtype).itemsize
    ):
        return _fused_qkv_small_s(
            qkv, q_weight.astype(jnp.float32), k_weight.astype(jnp.float32),
            num_heads, d, scale, eps, interpret,
        )
    return _fused_qkv_large(
        qkv, q_weight.astype(jnp.float32), k_weight.astype(jnp.float32),
        num_heads, d, scale, eps, interpret,
    )


# ---------------------------------------------------------------------------
# Fused qkv + whole-dim QK-RMSNorm, blocked-K (large-S forward)
# ---------------------------------------------------------------------------
#
# The small-S fused path stops at S<=1024 because it holds the WHOLE K/V in
# VMEM for an exact single-pass softmax. The dense encoder runs S=4097
# (4096 patches + CLS), where the unfused path pays the QK-norm + v-slice
# materializations, four (B,S,H,D)<->(B,H,S,D) transposes, AND the
# ragged-tail decomposition's tail/combine overhead (~1.6 ms/layer).
#
# This kernel extends the fused design with K-blocking + an online softmax:
#   * grid (B, nq, nk), nk innermost; q/k/v are three column-block views of
#     the SAME (B, S, 3W) projection output (zero-copy)
#   * block edge is chosen per-shape to make in-kernel masked raggedness
#     CHEAP: S=4097 with bq=688 pads to 4128 -> +1.5% FLOPs, vs the 1.56x
#     a 1024-block pad costs or the tail-einsum/LSE-merge machinery the
#     general path needs. Garbage key rows (reads past S) are masked to
#     -inf BEFORE the max (jnp.where drops NaN garbage); garbage q rows
#     produce garbage in output rows that the partial out block discards.
#   * whole-dim RMSNorms run in-kernel: q once per q-block into scratch,
#     k per (iq, ik) visit — recomputing the k-norm nq times costs VPU
#     FLOPs but saves the two full-tensor HBM write+read passes
#   * per-head running max / denominator live in (bq, 128) scratch lanes
#
# Backward VJPs the unfused composition (slice -> rms_norm -> general
# flash), so gradients are exactly the production path's; under remat —
# how the 1B/6B encoders train — the recomputed forward inside the VJP is
# work the step does anyway.

_FUSED_LARGE_MAX = 8192
# The static estimate in _fused_large_block undercounts Mosaic's real
# scoped allocation by ~2.4x (bq=1376 estimated 63M, compiled to 153M >
# the 128M physical vmem). 64M keeps the picker at block edges whose real
# footprint compiles (bq=688 at the encoder shape).
_FUSED_LARGE_VMEM_LIMIT = 64 * 1024 * 1024
_FUSED_LARGE_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=_FUSED_LARGE_VMEM_LIMIT
)


def _fused_large_block(s: int, w: int, itemsize: int):
    """Block edge (multiple of 16 rows) minimizing padded-FLOPs waste, then
    maximizing block size, under the scoped-vmem budget. None = no fit."""
    best = None
    for bq in range(256, 1440 + 1, 16):
        padded = -(-s // bq) * bq
        est = (3 * 2 + 2) * bq * w * itemsize  # q/k/v/out double-buffered
        est += 2 * bq * w * itemsize           # qn, kn staging
        est += bq * w * 4                      # acc f32
        est += 2 * bq * bq * 4                 # scores/probs f32
        est += 2 * bq * 128 * 4                # m, l
        if est > _FUSED_LARGE_VMEM_LIMIT - 8 * 1024 * 1024:
            continue
        key = (round((padded / s) ** 2, 4), -bq)
        if best is None or key < best[0]:
            best = (key, bq)
    return None if best is None else best[1]


def _fused_large_fwd_kernel(
    q_ref, k_ref, v_ref, qw_ref, kw_ref, o_ref,
    qn_ref, acc_ref, m_ref, l_ref,
    *, scale, h, d, eps, s_total, block,
):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    def _norm(x, w_row):
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
        return (w_row * normed.astype(jnp.float32)).astype(x.dtype)

    @pl.when(ik == 0)
    def _init():
        qn_ref[...] = _norm(q_ref[0], qw_ref[0][None, :])
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    kn = _norm(k_ref[0], kw_ref[0][None, :])  # (bk, W)
    kvalid = (
        ik * block + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    ) < s_total
    # garbage rows past S are masked out of the scores, but the p @ V dot
    # contracts over key rows — 0 * garbage(NaN) = NaN, so V garbage must
    # be zeroed, not just masked. Column-vector iota (not a reshape of the
    # row mask: Mosaic can't minor-dim-insert i1 vectors).
    kvalid_col = (
        ik * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    ) < s_total
    vb = jnp.where(kvalid_col, v_ref[0], 0)
    for i in range(h):
        sl = slice(i * d, (i + 1) * d)
        s = jax.lax.dot_general(
            qn_ref[:, sl], kn[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)  # (bq, bk)
        s = jnp.where(kvalid, s, DEFAULT_MASK_VALUE)
        m_prev = m_ref[:, i]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        p = jnp.exp2(s - m_cur[:, None])
        p = jnp.where(s <= DEFAULT_MASK_VALUE, 0.0, p)
        alpha = jnp.exp2(m_prev - m_cur)
        alpha = jnp.where(jnp.isfinite(m_prev), alpha, 0.0)
        l_ref[:, i] = l_ref[:, i] * alpha + jnp.sum(p, axis=1)
        m_ref[:, i] = m_cur
        acc_ref[:, sl] = acc_ref[:, sl] * alpha[:, None] + jax.lax.dot(
            p.astype(vb.dtype), vb[:, sl], preferred_element_type=jnp.float32
        )

    @pl.when(ik == nk - 1)
    def _finalize():
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            l = l_ref[:, i]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, :, sl] = (
                acc_ref[:, sl] / l_safe[:, None]
            ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_qkv_large(qkv, qw, kw, h, d, scale, eps, interpret):
    """qkv: (B, S, 3W) off the projection GEMM; qw/kw: (W,) f32."""
    b, s, w3 = qkv.shape
    w = w3 // 3
    bq = _fused_large_block(s, w, jnp.dtype(qkv.dtype).itemsize)
    assert bq is not None, (s, w)
    col = pl.BlockSpec((1, w), lambda bi, qi, ki: (0, 0))
    return pl.pallas_call(
        functools.partial(
            _fused_large_fwd_kernel, scale=scale, h=h, d=d, eps=eps,
            s_total=s, block=bq,
        ),
        grid=(b, pl.cdiv(s, bq), pl.cdiv(s, bq)),
        in_specs=[
            pl.BlockSpec((1, bq, w), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, bq, w), lambda bi, qi, ki: (bi, ki, 1)),
            pl.BlockSpec((1, bq, w), lambda bi, qi, ki: (bi, ki, 2)),
            col, col,
        ],
        out_specs=pl.BlockSpec((1, bq, w), lambda bi, qi, ki: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, w), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, w), qkv.dtype),      # normalized q staging
            pltpu.VMEM((bq, w), jnp.float32),    # latent accumulator
            pltpu.VMEM((bq, 128), jnp.float32),  # per-head running max
            pltpu.VMEM((bq, 128), jnp.float32),  # per-head denominator
        ],
        compiler_params=_FUSED_LARGE_PARAMS,
        interpret=interpret,
    )(qkv, qkv, qkv, qw.reshape(1, w), kw.reshape(1, w))


def _fused_large_unfused_ref(qkv, qw, kw, h, d, scale, eps, interpret):
    from internvideo_tpu.ops.rmsnorm import rms_norm

    w = h * d
    b, s, _ = qkv.shape
    q = rms_norm(qkv[..., :w], qw, eps=eps).reshape(b, s, h, d)
    k = rms_norm(qkv[..., w:2 * w], kw, eps=eps).reshape(b, s, h, d)
    v = qkv[..., 2 * w:].reshape(b, s, h, d)
    out = flash_attention(
        q, k, v, softmax_scale=scale, interpret=interpret
    )
    return out.reshape(b, s, w)


def _fused_large_fwd_rule(qkv, qw, kw, h, d, scale, eps, interpret):
    out = _fused_qkv_large(qkv, qw, kw, h, d, scale, eps, interpret)
    return out, (qkv, qw, kw)


def _fused_large_bwd_rule(h, d, scale, eps, interpret, res, g):
    qkv, qw, kw = res
    _, vjp = jax.vjp(
        lambda a, b, c: _fused_large_unfused_ref(
            a, b, c, h, d, scale, eps, interpret
        ),
        qkv, qw, kw,
    )
    return vjp(g)


_fused_qkv_large.defvjp(_fused_large_fwd_rule, _fused_large_bwd_rule)


def fused_qkv_large_eligible(s: int, num_heads: int, head_dim: int,
                             itemsize: int) -> bool:
    """Can (B, S, 3W) self-attention take the fused blocked-K path?"""
    w = num_heads * head_dim
    if not (_SMALL_S_MAX < s <= _FUSED_LARGE_MAX):
        return False
    if w % 128 or num_heads > 128:
        return False
    return _fused_large_block(s, w, itemsize) is not None


def flash_attention(
    q: jax.Array,  # (B, Sq, Hq, D)
    k: jax.Array,  # (B, Sk, Hkv, D)
    v: jax.Array,
    *,
    causal: bool = False,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    window: Optional[int] = None,
    q_position_offset: int = 0,
    interpret: bool = False,
    layout: str = "bshd",
) -> jax.Array:
    """Flash attention over (B, S, H, D) inputs. See module docstring.

    `q_position_offset` (static) places query row i at key index i+offset in
    the causal/window masks — used for chunked prefill where the query block
    sits `offset` tokens into the key sequence.

    `layout="bhsd"`: q/k/v arrive (and the output returns) in the kernel's
    native (B, H, S, D) layout, skipping the four wrapper transposes — for
    producers that can emit that layout directly from their projection
    einsums (nn/mla.py prefill: measured +5% per layer at the 2B prefill
    shape, tools_r5/prefill_native.py). Segment ids stay (B, S).
    """
    if layout == "bhsd":
        b, hq, sq, d = q.shape
        _, hkv, sk, _ = k.shape
    else:
        assert layout == "bshd", layout
        b, sq, hq, d = q.shape
        _, sk, hkv, _ = k.shape
    dv = v.shape[-1]  # may differ from d: MLA runs d_qk=192, d_v=128 —
    # the kernels carry separate q/k and v/o lane widths, so callers skip
    # the v pad-to-d_qk (and its 1.5x pV FLOPs) the reference's CUDA
    # flash-attn forces (xtuner/v1/module/attention/mla.py:281-351).
    assert hq % hkv == 0, f"GQA heads {hq} not divisible by kv heads {hkv}"
    group = hq // hkv  # kernel index maps share each KV block across a group
    scale = softmax_scale if softmax_scale is not None else d ** -0.5

    # Short sequences take the zero-copy single-pass path (see the
    # small-S section above): no pad, no transpose, exact softmax.
    if (layout == "bshd"
            and q_segment_ids is None and kv_segment_ids is None
            and not causal
            and window is None and group == 1 and d == dv
            and 0 < sq <= _SMALL_S_MAX and 0 < sk <= _SMALL_S_MAX
            and _ss_fits(sq, sk, hq * d, jnp.dtype(q.dtype).itemsize)):
        out = _small_s_attention(
            q.reshape(b, sq, hq * d),
            k.reshape(b, sk, hq * d),
            v.reshape(b, sk, hq * d),
            hq, d, scale, interpret,
        )
        return out.reshape(b, sq, hq, d)

    # Pad sequence dims to block multiples; padded tokens get segment id -1
    # (q pads) / -2 (kv pads) so they never attend to anything real.
    # Blocks are chosen to minimize total padded work: large blocks run the
    # MXU harder, but an S just over a block boundary (e.g. 4097 = 4096+CLS)
    # would waste a whole extra block per axis.
    if (causal and window is None and q_segment_ids is None
            and sq == sk and 1024 < sq <= 2048 and sq % 512 == 0
            and block_q == 1024 and block_k == 1024):
        # Measured at the MLA prefill shape (B=8 S=2048 H=20 d=192):
        # 512-wide k blocks tighten the whole-step causal skip granularity
        # vs the 1024^2 default (6.13 -> 5.7 ms in the r4 sweep). NOTE the
        # r4 sweep's 2048x512 "5.11 ms" did NOT survive re-measurement once
        # it actually shipped (_pick_blocks had been silently clamping
        # block_q to 1024): same-session on-chip, 2048x512 ran 7.10 vs
        # 1024x512's 6.37 ms (dv=192) and 5.87 vs 5.29 (dv=128) — so the
        # deliberate choice is 1024x512.
        block_q_eff, block_k_eff = min(sq, 1024), 512
    else:
        block_q_eff, block_k_eff = _pick_blocks(sq, sk, block_q, block_k)
    sq_p = _round_up(sq, block_q_eff)
    sk_p = _round_up(sk, block_k_eff)
    needs_pad = (sq_p != sq) or (sk_p != sk)
    # Small ragged tails (CLS-token shapes like 4097) skip block padding
    # entirely: Pallas on the aligned main region + XLA tails + LSE merge.
    if (needs_pad and q_segment_ids is None and not causal
            and window is None and group == 1 and d == dv
            and sq >= block_q_eff and sk >= block_k_eff
            and sq % block_q_eff <= _RAGGED_TAIL_MAX
            and sk % block_k_eff <= _RAGGED_TAIL_MAX):
        if layout == "bhsd":
            return _flash_attention_ragged(
                q, k, v, scale, block_q_eff, block_k_eff, interpret,
            )
        out = _flash_attention_ragged(
            jnp.transpose(q, (0, 2, 1, 3)),
            jnp.transpose(k, (0, 2, 1, 3)),
            jnp.transpose(v, (0, 2, 1, 3)),
            scale, block_q_eff, block_k_eff, interpret,
        )
        return jnp.transpose(out, (0, 2, 1, 3))
    # With tail-padding only (no real packing), no masking is needed at all:
    # padded q rows are sliced off (zero cotangent), and zero-padded K/V
    # contributions to the softmax are removed analytically in the kernel's
    # finalize (l -= pad·exp(-m)). Causal self-attention with equal q/k pads
    # even skips the correction — real rows never see the tail.
    kv_pad = 0
    if needs_pad and q_segment_ids is None:
        if causal and q_position_offset + sq == sk:
            # the last real query row sits at key index sk-1, so the causal
            # mask excludes every kv tail pad (index >= sk) for all real rows
            pass
        elif causal or window is not None:
            # the analytic pad correction assumes every row sees every pad;
            # causal cross-length and windowed masks make pad visibility
            # row-dependent → explicit ids
            q_segment_ids = jnp.zeros((b, sq), jnp.int32)
            kv_segment_ids = jnp.zeros((b, sk), jnp.int32)
        else:
            kv_pad = sk_p - sk
    if q_segment_ids is not None:
        q_segment_ids = jnp.pad(
            q_segment_ids, ((0, 0), (0, sq_p - sq)), constant_values=-1
        )
        kv_segment_ids = jnp.pad(
            kv_segment_ids, ((0, 0), (0, sk_p - sk)), constant_values=-2
        )
    if needs_pad:
        s_axis = 2 if layout == "bhsd" else 1

        def _pad_s(x, n):
            pads = [(0, 0)] * 4
            pads[s_axis] = (0, n)
            return jnp.pad(x, pads)

        q = _pad_s(q, sq_p - sq)
        k = _pad_s(k, sk_p - sk)
        v = _pad_s(v, sk_p - sk)

    if q_segment_ids is not None:
        # TPU tiling wants >=2D tiles: q ids ride the lane dim (128), kv ids
        # the sublane dim (8) — same trick as jax's reference TPU kernel.
        q_segment_ids = jnp.broadcast_to(
            q_segment_ids[:, :, None], (b, sq_p, 128)
        )
        kv_segment_ids = jnp.broadcast_to(
            kv_segment_ids[:, None, :], (b, 8, sk_p)
        )

    if layout == "bhsd":
        out = _flash_attention(
            q, k, v, q_segment_ids, kv_segment_ids,
            scale, causal, block_q_eff, block_k_eff, interpret, kv_pad,
            window, group, q_position_offset,
        )
        return out[:, :, :sq] if needs_pad else out
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = _flash_attention(
        qt, kt, vt, q_segment_ids, kv_segment_ids,
        scale, causal, block_q_eff, block_k_eff, interpret, kv_pad,
        window, group, q_position_offset,
    )
    out = jnp.transpose(out, (0, 2, 1, 3))
    if needs_pad:
        out = out[:, :sq]
    return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Empirical per-block-size time multipliers on v5e (measured at D=88, bf16,
# same-session: 1024-blocks ≈76-83 TFLOPs, 512 ≈48, 256 ≈22): smaller blocks
# underfeed the MXU and pay more grid overhead, usually outweighing the
# padding they save.
_BLOCK_EFF = {1024: 1.00, 512: 1.55, 256: 3.4}


def _pick_blocks(sq: int, sk: int, max_q: int, max_k: int) -> tuple[int, int]:
    """Choose (block_q, block_k) minimizing padded work × block efficiency."""
    if sq * sk == 0:
        return 128, 128
    best = None
    for b in (1024, 512, 256):
        bq = min(b, max_q, _round_up(sq, 128))
        bk = min(b, max_k, _round_up(sk, 128))
        work = _round_up(sq, bq) * _round_up(sk, bk)
        cost = work * _BLOCK_EFF[b]
        if best is None or cost < best[0]:
            best = (cost, bq, bk)
    return best[1], best[2]
