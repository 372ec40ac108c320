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

from internvideo_tpu.ops.attention_xla import xla_attention
from internvideo_tpu.ops.flash_attention import flash_attention

_TLS = threading.local()


@contextlib.contextmanager
def ulysses_context(mesh, axis: str = "seq"):
    """Route dot_product_attention through Ulysses SP inside this trace."""
    prev = getattr(_TLS, "ulysses", None)
    _TLS.ulysses = (mesh, axis) if mesh.shape[axis] > 1 else None
    try:
        yield
    finally:
        _TLS.ulysses = prev


def dot_product_attention(
    q: jax.Array,  # (B, Sq, Hq, D)
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
) -> jax.Array:
    ulysses = getattr(_TLS, "ulysses", None)
    if ulysses is not None:
        assert q_position_offset == 0, (
            "q_position_offset is incompatible with Ulysses sequence "
            "sharding (offsets would differ per shard)"
        )
        from internvideo_tpu.parallel.ulysses import ulysses_attention

        mesh, axis = ulysses
        inner = "pallas" if (
            impl == "auto" and jax.default_backend() == "tpu"
        ) else ("xla" if impl == "auto" else impl)
        return ulysses_attention(
            q, k, v,
            mesh=mesh, axis=axis,
            causal=causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            softmax_scale=softmax_scale,
            impl=inner,
        )
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
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
        )
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
