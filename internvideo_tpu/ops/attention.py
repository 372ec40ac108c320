"""Attention dispatcher: Pallas flash kernel on TPU, XLA reference elsewhere.

All model code calls `dot_product_attention`; the backend is chosen once per
trace from the default JAX backend (or forced via `impl=`), so tests run the
same model code on CPU against the same numerics.

Sequence parallelism is injected here rather than threaded through every
module: under `ulysses_context(mesh, axis)`, any attention whose sequence is
sharded over the axis routes through the all-to-all Ulysses path — the TPU
analogue of xtuner wrapping its attention calls in ulysses pre/post
(mha.py:347-416), without the model code knowing.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import jax.numpy as jnp

from internvideo_tpu.ops.attention_xla import xla_attention
from internvideo_tpu.ops.flash_attention import (
    flash_attention,
    fused_qkv_eligible,
    fused_qkv_large_eligible,
    fused_qkv_rmsnorm_attention,
)

_TLS = threading.local()


@contextlib.contextmanager
def sequence_parallel_context(mesh, axis: str = "seq", impl: str = "ulysses"):
    """Route dot_product_attention through sequence parallelism inside this
    trace. impl="ulysses" (all-to-all, full-sequence KV per rank during
    attention) or "ring" (parallel/ring.py: permanently sharded KV rotating
    over ppermute, O(S/sp) memory per rank)."""
    assert impl in ("ulysses", "ring"), impl
    prev = getattr(_TLS, "ulysses", None)
    _TLS.ulysses = (mesh, axis, impl) if mesh.shape[axis] > 1 else None
    try:
        yield
    finally:
        _TLS.ulysses = prev


def ulysses_context(mesh, axis: str = "seq"):
    """Back-compat alias for sequence_parallel_context(impl="ulysses")."""
    return sequence_parallel_context(mesh, axis, "ulysses")


@contextlib.contextmanager
def head_parallel_context(mesh, axis: str = "tensor"):
    """Tensor-parallel attention for the Pallas paths inside this trace.

    GSPMD partitions every einsum/GEMM of a tensor-sharded model on its
    own, but a pallas_call is opaque to the partitioner — without help it
    would gather the head-sharded q/k/v and run the full kernel per
    device. Under this context, dot_product_attention (and the MLA paged
    decode) wrap their kernels in a shard_map over `axis`: heads are
    embarrassingly parallel in attention, so each device runs the kernel
    on its H/tp heads with zero collectives. This is what makes the
    ServingEngine's decode/prefill programs tensor-shardable
    (serve/engine.py mesh=...)."""
    prev = getattr(_TLS, "headpar", None)
    _TLS.headpar = (mesh, axis) if mesh.shape[axis] > 1 else None
    try:
        yield
    finally:
        _TLS.headpar = prev


def head_parallel_active():
    """(mesh, axis) when a head_parallel_context with axis size > 1 is
    active in this thread, else None."""
    return getattr(_TLS, "headpar", None)


def fused_qkv_attention_or_none(
    qkv: jax.Array,        # (B, S, 3*W) flat projection output
    q_weight: jax.Array,   # (W,) whole-dim QK-RMSNorm weights
    k_weight: jax.Array,
    *,
    num_heads: int,
    eps: float = 1e-6,
    softmax_scale: Optional[float] = None,
    impl: str = "auto",
    allow_large: bool = False,
) -> Optional[jax.Array]:
    """Fused qkv+QK-RMSNorm+attention when a fused Pallas path applies.

    Returns (B, S, W) or None when the caller must run the unfused path
    (non-TPU backend, Ulysses sequence sharding active, or shapes outside
    the fused envelopes). Model code calls this first and falls back.
    `allow_large=True` opts in to the blocked-K large-S variant, which is
    correct but MEASURED SLOWER than the unfused chain at the dense
    encoder shape (18.46 vs 13.96 ms/layer at S=4097 — PERF.md "Fused qkv
    at dense S"), and whose VJP recomputes the unfused composition; it is
    off by default and no production caller enables it.
    """
    if getattr(_TLS, "ulysses", None) is not None:
        return None
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl != "pallas":
        return None
    b, s, w3 = qkv.shape
    w = w3 // 3
    if w % num_heads != 0:
        return None
    d = w // num_heads
    # Only the small-S fused variant routes automatically; the blocked-K
    # large-S variant requires the explicit allow_large opt-in (see
    # docstring — measured slower than the unfused chain at dense S).
    itemsize = jnp.dtype(qkv.dtype).itemsize
    if fused_qkv_eligible(s, num_heads, d, itemsize):
        return fused_qkv_rmsnorm_attention(
            qkv, q_weight, k_weight,
            num_heads=num_heads, eps=eps, softmax_scale=softmax_scale,
        )
    if allow_large and fused_qkv_large_eligible(s, num_heads, d, itemsize):
        from internvideo_tpu.ops.flash_attention import _fused_qkv_large

        scale = (
            softmax_scale if softmax_scale is not None else d ** -0.5
        )
        return _fused_qkv_large(
            qkv, q_weight.astype(jnp.float32),
            k_weight.astype(jnp.float32), num_heads, d, scale, eps, False,
        )
    return None


def native_attention_layout(impl: str = "auto") -> str:
    """The layout the attention path will consume without copies.

    Returns "bhsd" when the Pallas kernel will run directly (TPU or
    interpret, no sequence-parallel context) — producers can then emit
    (B, H, S, D) straight from their projection einsums and skip the four
    wrapper transposes (measured +5%/layer at MLA prefill shapes,
    tools_r5/prefill_native.py). Otherwise "bshd"."""
    if getattr(_TLS, "ulysses", None) is not None:
        return "bshd"
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    return "bhsd" if impl in ("pallas", "pallas_interpret") else "bshd"


def dot_product_attention(
    q: jax.Array,  # (B, Sq, Hq, D) — or (B, Hq, Sq, D) with layout="bhsd"
    k: jax.Array,  # (B, Sk, Hkv, D)
    v: jax.Array,
    *,
    causal: bool = False,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    impl: str = "auto",  # auto | pallas | xla
    block_q: int = 1024,
    block_k: int = 1024,
    window: Optional[int] = None,  # sliding-window size (pallas path)
    q_position_offset: int = 0,  # causal: query row i sits at key i+offset
    layout: str = "bshd",  # "bhsd" = kernel-native, see native_attention_layout
) -> jax.Array:
    ulysses = getattr(_TLS, "ulysses", None)
    if layout == "bhsd" and (
        ulysses is not None
        or (impl not in ("pallas", "pallas_interpret")
            and not (impl == "auto" and jax.default_backend() == "tpu"))
    ):
        # non-native consumer: fall back via transposes (CPU/xla test path)
        out = dot_product_attention(
            jnp.transpose(q, (0, 2, 1, 3)),
            jnp.transpose(k, (0, 2, 1, 3)),
            jnp.transpose(v, (0, 2, 1, 3)),
            causal=causal, q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids, softmax_scale=softmax_scale,
            impl=impl, block_q=block_q, block_k=block_k, window=window,
            q_position_offset=q_position_offset,
        )
        return jnp.transpose(out, (0, 2, 1, 3))
    if ulysses is not None:
        assert q_position_offset == 0, (
            "q_position_offset is incompatible with sequence sharding "
            "(offsets would differ per shard)"
        )
        mesh, axis, sp_impl = ulysses
        if sp_impl == "ring":
            assert window is None, (
                "sliding-window attention is not supported under ring "
                "sequence parallelism — use Ulysses"
            )
            from internvideo_tpu.parallel.ring import ring_attention

            ring_inner = {
                "auto": "auto", "pallas": "pallas",
                "pallas_interpret": "pallas_interpret",
            }.get(impl, "blockwise")
            return ring_attention(
                q, k, v, mesh=mesh, axis=axis, causal=causal,
                q_segment_ids=q_segment_ids,
                kv_segment_ids=kv_segment_ids,
                softmax_scale=softmax_scale,
                inner=ring_inner,
            )
        from internvideo_tpu.parallel.ulysses import ulysses_attention
        inner = "pallas" if (
            impl == "auto" and jax.default_backend() == "tpu"
        ) else ("xla" if impl == "auto" else impl)
        interp = inner == "pallas_interpret"
        return ulysses_attention(
            q, k, v,
            mesh=mesh, axis=axis,
            causal=causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            softmax_scale=softmax_scale,
            window=window,
            impl="pallas" if interp else inner,
            interpret=interp,
        )
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    headpar = getattr(_TLS, "headpar", None)
    if headpar is not None and impl in ("pallas", "pallas_interpret"):
        # tensor-parallel kernels: shard the head axis over the mesh and
        # run the flash kernel per-shard (no collectives — heads are
        # independent); see head_parallel_context
        from jax.sharding import PartitionSpec as _P

        hp_mesh, hp_axis = headpar
        tp = hp_mesh.shape[hp_axis]
        h_axis = 1 if layout == "bhsd" else 2
        if q.shape[h_axis] % tp or k.shape[h_axis] % tp:
            raise ValueError(
                f"head counts ({q.shape[h_axis]}, {k.shape[h_axis]}) must "
                f"divide the tensor axis size {tp} for head-parallel "
                "attention"
            )
        spec = (
            _P(None, hp_axis, None, None) if layout == "bhsd"
            else _P(None, None, hp_axis, None)
        )
        seg_spec = _P(None, None)
        interp = impl == "pallas_interpret"

        def _local(q, k, v, *segs):
            return flash_attention(
                q, k, v, causal=causal,
                q_segment_ids=segs[0] if segs else None,
                kv_segment_ids=segs[1] if segs else None,
                softmax_scale=softmax_scale,
                block_q=block_q, block_k=block_k, window=window,
                q_position_offset=q_position_offset,
                interpret=interp, layout=layout,
            )

        args = (q, k, v)
        in_specs = (spec, spec, spec)
        if q_segment_ids is not None or kv_segment_ids is not None:
            b_, = (q.shape[0],)
            sq_ = q.shape[2] if layout == "bhsd" else q.shape[1]
            sk_ = k.shape[2] if layout == "bhsd" else k.shape[1]
            qs = q_segment_ids if q_segment_ids is not None else \
                jnp.zeros((b_, sq_), jnp.int32)
            ks = kv_segment_ids if kv_segment_ids is not None else \
                jnp.zeros((b_, sk_), jnp.int32)
            args += (qs, ks)
            in_specs += (seg_spec, seg_spec)
        return jax.shard_map(
            _local, mesh=hp_mesh, in_specs=in_specs, out_specs=spec,
            check_vma=False,
        )(*args)
    if impl in ("pallas", "pallas_interpret"):
        # "pallas_interpret" runs the flash kernels in interpret mode —
        # blockwise memory on CPU, where the XLA reference would
        # materialize the full S×S scores (infeasible at 32k+)
        return flash_attention(
            q, k, v,
            causal=causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            softmax_scale=softmax_scale,
            block_q=block_q,
            block_k=block_k,
            window=window,
            q_position_offset=q_position_offset,
            interpret=impl == "pallas_interpret",
            layout=layout,
        )
    if impl == "xla_blockwise":
        # compiled online-softmax scan (never materializes S×S) with
        # dead-block skipping — the executable-at-262k CPU path; shares
        # the ring-attention inner (parallel/ring.py)
        assert window is None, "xla_blockwise does not support windows"
        from internvideo_tpu.parallel.ring import _blockwise_attention_lse

        scale = (
            softmax_scale if softmax_scale is not None
            else q.shape[-1] ** -0.5
        )
        return _blockwise_attention_lse(
            q, k, v, causal=causal, scale=scale,
            q_seg=q_segment_ids, kv_seg=kv_segment_ids,
            q_offset=q_position_offset, block_k=block_k,
        )[0]
    if impl == "xla":
        if window is not None:
            # emulate the window with position-derived segment... simpler:
            # build an explicit mask via logits bias is not supported by
            # xla_attention; windowed XLA path uses the pallas interpreter
            return flash_attention(
                q, k, v, causal=causal,
                q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
                softmax_scale=softmax_scale, block_q=block_q, block_k=block_k,
                window=window, q_position_offset=q_position_offset,
                interpret=True,
            )
        return xla_attention(
            q, k, v,
            causal=causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            softmax_scale=softmax_scale,
            q_position_offset=q_position_offset,
        )
    raise ValueError(f"unknown attention impl {impl!r}")
