"""Ulysses sequence parallelism: all-to-all head↔sequence swap.

TPU-native version of xtuner's ulysses_all_to_all
(InternVideo3_sft/xtuner/v1/ops/comm/all_to_all.py:6-52 and its use around
attention, module/attention/mha.py:347-416): activations are sequence-
sharded everywhere except inside attention, where one all_to_all re-shards
to head-parallel (each rank sees the FULL sequence for H/sp heads), the
normal flash kernel runs locally, and a second all_to_all restores
sequence sharding.

Expressed with shard_map over the `seq` mesh axis and jax.lax.all_to_all —
the collectives ride ICI; gradients flow through all_to_all natively, so no
custom autograd wrapper is needed (reference needs one for torch).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from internvideo_tpu.ops.attention_xla import xla_attention
from internvideo_tpu.ops.flash_attention import flash_attention


def ulysses_attention(
    q: jax.Array,  # (B, S, H, D) — S globally sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "seq",
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    impl: str = "auto",
    interpret: bool = False,  # pallas interpret mode (CPU tests)
    batch_axes: tuple[str, ...] = ("replica", "fsdp"),
    head_axis: Optional[str] = "tensor",
) -> jax.Array:
    """Attention over sequence-sharded activations via head-sharding swap.

    Composes with data parallelism (batch over `batch_axes`) and tensor
    parallelism (heads over `head_axis`): the all_to_all runs within each
    (dp, tp) slice. Local head count must be divisible by the seq-axis size.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    # call concrete impls directly — re-entering the dispatcher under an
    # active ulysses_context would recurse
    attn = flash_attention if impl == "pallas" else xla_attention
    extra = {"interpret": interpret} if impl == "pallas" else {}

    sp = mesh.shape[axis]
    if sp == 1:
        return attn(
            q, k, v,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            causal=causal, softmax_scale=softmax_scale, **extra,
        )
    batch_axes = tuple(a for a in batch_axes if a in mesh.axis_names)
    if head_axis is not None and head_axis not in mesh.axis_names:
        head_axis = None
    tp = mesh.shape[head_axis] if head_axis else 1
    h = q.shape[2]
    assert h % (sp * tp) == 0, f"heads {h} not divisible by sp*tp {sp}*{tp}"

    has_segs = q_segment_ids is not None

    def local(q, k, v, *segs):
        # local shapes: (B, S/sp, H, D); ids (B, S/sp)
        # seq-shard -> head-shard: concat sequence, split heads
        def to_heads(x):
            # (B, s, H, D) -> (B, S, H/sp, D)
            return jax.lax.all_to_all(
                x, axis, split_axis=2, concat_axis=1, tiled=True
            )

        qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
        full_qseg = full_kvseg = None
        if segs:
            full_qseg = jax.lax.all_gather(segs[0], axis, axis=1, tiled=True)
            full_kvseg = jax.lax.all_gather(segs[1], axis, axis=1, tiled=True)
        out = attn(
            qh, kh, vh,
            q_segment_ids=full_qseg, kv_segment_ids=full_kvseg,
            causal=causal, softmax_scale=softmax_scale, **extra,
        )
        # head-shard -> seq-shard
        return jax.lax.all_to_all(
            out, axis, split_axis=1, concat_axis=2, tiled=True
        )

    spec = P(batch_axes if batch_axes else None, axis, head_axis, None)
    seg_spec = P(batch_axes if batch_axes else None, axis)
    args = (q, k, v)
    in_specs = (spec, spec, spec)
    if has_segs:
        args += (q_segment_ids, kv_segment_ids)
        in_specs += (seg_spec, seg_spec)
    return jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=spec,
        # pallas_call outputs carry no varying-mesh-axes metadata yet;
        # without this the vma check rejects the kernel inside shard_map
        check_vma=False,
    )(*args)
