"""Pipeline parallelism: GPipe-style microbatch pipeline over a mesh axis.

An upgrade the reference does NOT have (SURVEY §2f: PP is absent from the
xtuner stack — FSDP/TP/SP/EP only). TPU-native design: the S pipeline
stages live on S ranks of a mesh axis, activations hop stage→stage with
`jax.lax.ppermute` (one ICI neighbor transfer per tick — the cheapest
collective on a torus), and the whole schedule is a `lax.scan` of
M + S - 1 ticks, so it is one compiled program and reverse-mode AD through
the scan + ppermute yields the backward pipeline automatically (activation
memory is GPipe's O(M) per stage; wrap `stage_fn` in jax.checkpoint to
trade it down).

Contract: homogeneous stages — `stage_fn(stage_params, x) -> y` with
x.shape == y.shape (the transformer-layer case; heterogeneous embed/head
layers stay outside the pipelined trunk). Parameters arrive stacked on a
leading stage axis, sharded over `axis`, so each rank holds only its
stage's weights.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,  # pytree; leaves (S, ...) — stage-major
    x: jax.Array,  # (M * mb, ...) global batch, microbatched on axis 0
    *,
    mesh: Mesh,
    axis: str = "pipe",
    num_microbatches: int,
) -> jax.Array:
    """Apply stage_{S-1} ∘ … ∘ stage_0 to every microbatch of x."""
    s_total = mesh.shape[axis]
    m = num_microbatches
    if x.shape[0] % m:
        raise ValueError(f"batch {x.shape[0]} not divisible by {m} microbatches")
    mb = x.shape[0] // m

    def body(params_local, x_local):
        # params_local leaves: (1, ...) — this rank's stage
        params_me = jax.tree.map(lambda p: p[0], params_local)
        stage = jax.lax.axis_index(axis)
        micro = x_local.reshape(m, mb, *x_local.shape[1:])
        perm = [(i, (i + 1) % s_total) for i in range(s_total)]

        def tick(carry, t):
            buf = carry  # activation arriving from the previous stage
            feed = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            x_in = jnp.where(stage == 0, feed, buf)
            y = stage_fn(params_me, x_in)
            # ticks where this stage has no live microbatch produce junk —
            # zero it so NaNs can't propagate into live lanes via ppermute
            live = jnp.logical_and(t >= stage, t - stage < m)
            y = jnp.where(live, y, jnp.zeros_like(y))
            # the last stage's live outputs are the pipeline's results
            out_t = jnp.where(
                jnp.logical_and(stage == s_total - 1, live),
                y, jnp.zeros_like(y),
            )
            buf_next = jax.lax.ppermute(y, axis, perm)
            return buf_next, out_t

        # the scan carry is device-varying (each rank holds a different
        # in-flight activation) — mark the zeros-init accordingly
        zeros = jnp.zeros((mb, *x_local.shape[1:]), x_local.dtype)
        if hasattr(jax.lax, "pcast"):
            buf0 = jax.lax.pcast(zeros, (axis,), to="varying")
        else:  # older jax
            buf0 = jax.lax.pvary(zeros, (axis,))
        ticks = jnp.arange(m + s_total - 1)
        _, outs = jax.lax.scan(tick, buf0, ticks)  # (T, mb, ...)
        # tick t on the last stage carries microbatch t - (S-1)
        outs = outs[s_total - 1:]
        # only the last rank holds real outputs; share them with the axis
        outs = jax.lax.psum(outs, axis)
        return outs.reshape(m * mb, *x_local.shape[1:])

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), stacked_params), P()),
        out_specs=P(),
    )(stacked_params, x)
