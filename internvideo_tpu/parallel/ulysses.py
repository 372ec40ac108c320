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
    window: Optional[int] = None,  # sliding-window size
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
    # active ulysses_context would recurse. xla_attention has no window
    # support; windowed XLA runs the flash kernel in interpret mode (the
    # dispatcher's own convention)
    if impl == "xla_blockwise" and window is None:
        # compiled blockwise scan with dead-block skipping (ring.py inner):
        # the CPU-executable inner at 262k-class lengths, where interpret-
        # mode Pallas takes minutes per pass and plain XLA would
        # materialize the S×S scores
        from internvideo_tpu.parallel.ring import _blockwise_attention_lse

        def attn(q, k, v, *, q_segment_ids, kv_segment_ids, causal,
                 softmax_scale):
            scale = (
                softmax_scale if softmax_scale is not None
                else q.shape[-1] ** -0.5
            )
            return _blockwise_attention_lse(
                q, k, v, causal=causal, scale=scale,
                q_seg=q_segment_ids, kv_seg=kv_segment_ids,
            )[0]

        use_flash = False
        extra = {}
    else:
        use_flash = impl == "pallas" or window is not None
        attn = flash_attention if use_flash else xla_attention
        extra = {}
        if use_flash:
            extra["interpret"] = interpret or impl != "pallas"
            extra["window"] = window

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

    s_orig, sk_orig = q.shape[1], k.shape[1]
    s_pad = -(-s_orig // sp) * sp
    sk_pad = -(-sk_orig // sp) * sp
    if s_pad != s_orig or sk_pad != sk_orig:
        # Sequences not divisible by sp (the encoder's CLS-token shapes,
        # e.g. 4097): pad rows and mask them out via the segment-id path —
        # pad queries get id -1, pad keys -2, so they match nothing. The
        # XLA path's finite NEG_INF masking keeps fully-masked pad rows
        # NaN-free in fwd and bwd; their outputs are sliced off below.
        # Q and KV lengths pad independently (cross-attention can differ).
        if (q_segment_ids is None) != (kv_segment_ids is None):
            raise ValueError(
                "ulysses padding needs both q_segment_ids and "
                "kv_segment_ids, or neither"
            )
        if q_segment_ids is None:
            b_ = q.shape[0]
            q_segment_ids = jnp.zeros((b_, s_orig), jnp.int32)
            kv_segment_ids = jnp.zeros((b_, sk_orig), jnp.int32)
        q_rows = ((0, 0), (0, s_pad - s_orig), (0, 0), (0, 0))
        kv_rows = ((0, 0), (0, sk_pad - sk_orig), (0, 0), (0, 0))
        q = jnp.pad(q, q_rows)
        k, v = jnp.pad(k, kv_rows), jnp.pad(v, kv_rows)
        q_segment_ids = jnp.pad(
            q_segment_ids, ((0, 0), (0, s_pad - s_orig)),
            constant_values=-1)
        kv_segment_ids = jnp.pad(
            kv_segment_ids, ((0, 0), (0, sk_pad - sk_orig)),
            constant_values=-2)

    h = q.shape[2]
    h_pad = -(-h // (sp * tp)) * (sp * tp)
    if h_pad != h:
        # Heads not divisible by sp*tp (the 6B encoder has 25): pad with
        # zero heads and drop their outputs. The reference's inner-SP
        # (xtuner/parallel/sequence/attention.py:21-110) instead splits
        # head_dim into insp = sp/gcd(h, sp) slices, all-to-alls the thin
        # heads, and re-gathers full head_dim inside inner groups — which
        # REPLICATES the attention compute insp× per inner group (4× for
        # h=25, sp=4) plus three extra all-gathers. Zero-padding costs
        # (h_pad-h)/h extra compute and comm (12% for 25→28) with no extra
        # collectives, so it strictly dominates whenever h >= sp; at h < sp
        # the two schemes tie on compute and padding still saves the inner
        # collectives. Zero heads are softmax-safe (uniform probs over
        # zero values → zero output).
        if k.shape[2] != h:
            raise NotImplementedError(
                f"Ulysses head padding requires MHA (hq={h}, hkv={k.shape[2]});"
                " GQA with heads not divisible by sp*tp is unsupported"
            )
        pad = ((0, 0), (0, 0), (0, h_pad - h), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

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
        # after the all-to-all each rank holds the FULL sequence for its
        # heads, so the sliding window applies locally without changes
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
    out = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=spec,
        # pallas_call outputs carry no varying-mesh-axes metadata yet;
        # without this the vma check rejects the kernel inside shard_map
        check_vma=False,
    )(*args)
    if h_pad != h:
        out = out[:, :, :h]
    if s_pad != s_orig:
        out = out[:, :s_orig]
    return out
