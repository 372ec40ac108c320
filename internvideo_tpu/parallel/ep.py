"""Expert-parallel dropless MoE dispatch via ragged all-to-all.

The true DeepEP equivalent (xtuner/v1/module/dispatcher/deepep.py +
ops/comm/deepep_op.py): tokens are data-sharded over the `expert` mesh
axis, each rank owns a contiguous slice of experts, and tokens travel to
their experts' ranks through `jax.lax.ragged_all_to_all` — variable
per-peer chunk sizes, no capacity-factor token drops. Like DeepEP's RDMA
buffers, the receive side is a bounded static buffer (`buffer_tokens`);
overflow beyond it is detected and reported rather than silently dropped.

Flow per rank (inside shard_map over the `expert` axis):
  1. sort local (token, k-slot) pairs by destination expert (expert ids are
     contiguous per rank, so this is also destination-rank order)
  2. all_gather the E×E send-count matrix → input/output offsets for the
     ragged exchange
  3. ragged_all_to_all the token payloads and (expert, source-slot) tags
  4. bucket received rows by local expert (stable sort), grouped GEMMs via
     lax.ragged_dot (pad rows ride the last group and are discarded)
  5. reverse ragged_all_to_all, unsort into slot order, gate-combine
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _excl_cumsum(x, axis=0):
    return jnp.cumsum(x, axis=axis) - x


def _ragged_a2a(operand, output, in_off, send_sz, out_off, recv_sz, axis):
    """lax.ragged_all_to_all, with a dense all-gather emulation on backends
    whose XLA lacks the ragged collective (CPU — used by the test mesh).
    Identical semantics: sender j's chunk for rank r (rows
    [in_off[j,r], +sz)) lands in r's output at [out_off[j,r], +sz)."""
    if jax.default_backend() == "tpu":
        return jax.lax.ragged_all_to_all(
            operand, output, in_off, send_sz, out_off, recv_sz,
            axis_name=axis,
        )
    ranks = jax.lax.psum(1, axis)
    r = jax.lax.axis_index(axis)
    ops = jax.lax.all_gather(operand, axis)  # (R, rows, ...)
    in_offs = jax.lax.all_gather(in_off, axis)  # (R, R)
    szs = jax.lax.all_gather(send_sz, axis)  # (R, R)
    out_offs = jax.lax.all_gather(out_off, axis)  # (R, R)
    cap = output.shape[0]
    idx = jnp.arange(cap)
    out = output
    for j in range(ranks):
        start_dst = out_offs[j, r]
        start_src = in_offs[j, r]
        sz = szs[j, r]
        src_row = jnp.clip(idx - start_dst + start_src, 0,
                           operand.shape[0] - 1)
        mask = (idx >= start_dst) & (idx < start_dst + sz)
        gathered = ops[j][src_row]
        out = jnp.where(
            mask.reshape((cap,) + (1,) * (output.ndim - 1)), gathered, out
        )
    return out


def ep_dropless_moe(
    x: jax.Array,  # (N, D) tokens, sharded over `axis` on dim 0
    top_idx: jax.Array,  # (N, k) global expert ids
    top_gate: jax.Array,  # (N, k) combine weights
    w_gate: jax.Array,  # (E, D, I) sharded over `axis` on dim 0
    w_up: jax.Array,  # (E, D, I)
    w_down: jax.Array,  # (E, I, D)
    *,
    mesh: Mesh,
    axis: str = "expert",
    buffer_factor: float = 2.0,
):
    """Returns (out (N, D), dropped_fraction ()). See module docstring.

    `buffer_factor` scales the per-rank receive buffer relative to the
    balanced share (n_local·k); tokens past the buffer are dropped and
    counted in `dropped_fraction` (0 under balanced routing).
    """
    e_total = w_gate.shape[0]
    ranks = mesh.shape[axis]
    assert e_total % ranks == 0
    e_loc = e_total // ranks
    n, k = top_idx.shape
    assert n % ranks == 0
    n_loc = n // ranks
    cap = int(buffer_factor * n_loc * k)

    def body(xs, idx, gate, wg, wu, wd):
        r = jax.lax.axis_index(axis)
        nl = xs.shape[0]
        slots = nl * k
        flat_e = idx.reshape(-1)  # (slots,) global expert ids
        order = jnp.argsort(flat_e)  # dest-rank-major (experts contiguous)
        src_tok = order // k
        payload = xs[src_tok]  # (slots, D)
        # tags: (global expert id, source slot) to reconstruct on return
        tags = jnp.stack([flat_e[order], order], axis=1).astype(jnp.int32)

        dest = flat_e // e_loc  # (slots,) destination rank per slot
        want_sizes = jnp.bincount(dest, length=ranks)  # (ranks,)

        # E×E count matrix: M[i, j] = rows rank i wants to send rank j.
        # Clamp against the receive buffer like DeepEP's bounded RDMA
        # buffers: each receiver accepts senders in rank order until `cap`
        # rows; the remainder is dropped (counted below, 0 when balanced).
        m_want = jax.lax.all_gather(want_sizes, axis)  # (ranks, ranks)
        arrive_off = _excl_cumsum(m_want, axis=0)  # offsets at receivers
        m = jnp.minimum(
            m_want, jnp.maximum(cap - arrive_off, 0)
        )  # accepted counts
        send_sizes = m[r, :]
        input_offsets = _excl_cumsum(want_sizes)  # chunk starts (pre-clamp)
        recv_sizes = m[:, r]  # rows arriving at me, per sender
        output_offsets = _excl_cumsum(m, axis=0)[r]  # my landing spots
        n_recv = jnp.sum(recv_sizes)

        recv_x = jnp.zeros((cap,) + payload.shape[1:], payload.dtype)
        recv_t = jnp.full((cap, 2), jnp.iinfo(jnp.int32).max, jnp.int32)
        recv_x = _ragged_a2a(
            payload, recv_x, input_offsets, send_sizes, output_offsets,
            recv_sizes, axis,
        )
        recv_t = _ragged_a2a(
            tags, recv_t, input_offsets, send_sizes, output_offsets,
            recv_sizes, axis,
        )

        # bucket by local expert; pad rows carry INT32_MAX tags and sort to
        # the tail, where they ride the last group's GEMM and are discarded
        local_e = jnp.clip(recv_t[:, 0] - r * e_loc, 0, e_loc - 1)
        valid = jnp.arange(cap) < n_recv
        sort_key = jnp.where(valid, local_e, e_loc - 1)
        e_order = jnp.argsort(sort_key)
        xe = recv_x[e_order]
        group_sizes = jnp.bincount(
            sort_key, length=e_loc
        )  # pads included in the last group

        h = jax.lax.ragged_dot(xe, wg, group_sizes)
        u = jax.lax.ragged_dot(xe, wu, group_sizes)
        ye = jax.lax.ragged_dot(jax.nn.silu(h) * u, wd, group_sizes)
        # unsort back to arrival order
        y = jnp.zeros_like(ye).at[e_order].set(ye)

        # reverse exchange: counts transpose
        back_out = jnp.zeros((slots,) + y.shape[1:], y.dtype)
        back = _ragged_a2a(
            y, back_out,
            # my arrival chunks (per sender) go back to their senders
            _excl_cumsum(recv_sizes), recv_sizes,
            # they land on sender j at j's ORIGINAL (pre-clamp) chunk start
            # for me, since j's payload keeps full chunk spacing
            _excl_cumsum(m_want, axis=1)[:, r], m[r, :],
            axis,
        )
        # back[i] corresponds to payload[i] (same sorted slot order);
        # clamped-away rows were never written back and stay zero — those
        # tokens pass through the residual untouched
        out_slots = jnp.zeros_like(back).at[order].set(back)
        gates = gate.reshape(-1)
        out = jnp.zeros_like(xs)
        out = out.at[jnp.arange(slots) // k].add(
            out_slots * gates[:, None]
        )

        dropped = jnp.sum(m_want[r] - m[r])  # this rank's rejected sends
        dropped_frac = jax.lax.psum(dropped, axis) / jax.lax.psum(
            jnp.asarray(slots), axis
        )
        return out, jnp.broadcast_to(dropped_frac, (1,))

    out, dropped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
        ),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )(x, top_idx, top_gate, w_gate, w_up, w_down)
    return out, dropped[0]
