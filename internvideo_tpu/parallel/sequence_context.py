"""SequenceContext: packed varlen batch metadata.

TPU counterpart of xtuner's SequenceContext
(InternVideo3_sft/xtuner/v1/data_proto/sequence_context.py:15-340). The
reference carries cu_seq_lens for CUDA varlen attention; on TPU the flash
kernel consumes *segment ids*, so the context holds those plus position ids,
and knows how to pad itself to an SP-divisible length and split across the
`seq` mesh axis (reference .split(sp_mesh) :139).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class SequenceContext:
    input_ids: jax.Array  # (B, L)
    segment_ids: jax.Array  # (B, L) int32; <0 = padding
    position_ids: jax.Array  # (B, L) or (3, B, L) for mRoPE
    labels: Optional[jax.Array] = None  # (B, L) shifted targets; -100 = skip

    @property
    def seq_len(self) -> int:
        return self.input_ids.shape[-1]

    @classmethod
    def from_segments(cls, segments, pad_to=None, pad_id=0):
        """Pack a list of (ids, labels|None) into one row per call.

        Host-side helper (numpy), one packed row: ids concatenated, segment
        k for the k-th sample, positions restarting at 0 per segment.
        """
        ids, segs, pos, labels = [], [], [], []
        for k, item in enumerate(segments):
            sample_ids, sample_labels = (
                item if isinstance(item, tuple) else (item, None)
            )
            n = len(sample_ids)
            ids.append(np.asarray(sample_ids, np.int32))
            segs.append(np.full(n, k, np.int32))
            pos.append(np.arange(n, dtype=np.int32))
            labels.append(
                np.asarray(sample_labels, np.int32)
                if sample_labels is not None
                else np.full(n, -100, np.int32)
            )
        ids = np.concatenate(ids)
        segs = np.concatenate(segs)
        pos = np.concatenate(pos)
        labels = np.concatenate(labels)
        if pad_to is not None and len(ids) < pad_to:
            pad = pad_to - len(ids)
            ids = np.pad(ids, (0, pad), constant_values=pad_id)
            segs = np.pad(segs, (0, pad), constant_values=-1)
            pos = np.pad(pos, (0, pad))
            labels = np.pad(labels, (0, pad), constant_values=-100)
        return cls(
            input_ids=jnp.asarray(ids)[None],
            segment_ids=jnp.asarray(segs)[None],
            position_ids=jnp.asarray(pos)[None],
            labels=jnp.asarray(labels)[None],
        )

    def pad_to_multiple(self, multiple: int, pad_id: int = 0):
        l = self.seq_len
        target = ((l + multiple - 1) // multiple) * multiple
        if target == l:
            return self
        pad = target - l

        def pad_last(x, value):
            if x is None:
                return None
            cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            return jnp.pad(x, cfg, constant_values=value)

        return SequenceContext(
            input_ids=pad_last(self.input_ids, pad_id),
            segment_ids=pad_last(self.segment_ids, -1),
            position_ids=pad_last(self.position_ids, 0),
            labels=pad_last(self.labels, -100),
        )

    def shard_slice(self, rank: int, world: int) -> "SequenceContext":
        """Contiguous per-rank slice along the sequence (Ulysses layout)."""
        assert self.seq_len % world == 0, (self.seq_len, world)
        n = self.seq_len // world

        def sl(x):
            if x is None:
                return None
            return jax.lax.dynamic_slice_in_dim(x, rank * n, n, axis=-1)

        return SequenceContext(
            input_ids=sl(self.input_ids),
            segment_ids=sl(self.segment_ids),
            position_ids=sl(self.position_ids),
            labels=sl(self.labels),
        )

    def num_real_tokens(self) -> jax.Array:
        return jnp.sum(self.segment_ids >= 0)
