"""Paged KV cache: block-table memory management for batched serving.

Counterpart of the reference's paged-KV path (xtuner
module/attention/kv_cache.py:5-47 fill_paged_kv_cache + lmdeploy kernel,
mha.py:195-303 paged prefill/decode). The cache pool is a device array of
fixed-size pages; each sequence owns a block table of page ids, so sequences
grow without reallocation and freed pages recycle — the standard
vLLM/lmdeploy memory model, here over the M²LA latent entries
(kv_lora_rank + rope_dim floats per token).

Decode gathers a sequence's pages into a contiguous view (one XLA gather —
correct and simple; a Pallas gather-attend decode kernel is the follow-up
optimization) and runs the same absorbed-attention math as the dense path.

Host-side allocation (PageAllocator) is plain python — allocation decisions
are control flow, not compute.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class PageAllocator:
    """Host-side page bookkeeping: alloc/free page ids per sequence."""

    def __init__(self, num_pages: int, page_size: int):
        self.page_size = page_size
        self.free = list(range(num_pages - 1, -1, -1))
        self.tables: dict[int, list[int]] = {}
        self.lengths: dict[int, int] = {}

    def ensure(self, seq_id: int, new_len: int) -> list[int]:
        """Grow seq to new_len tokens; returns its page table."""
        table = self.tables.setdefault(seq_id, [])
        need = -(-new_len // self.page_size)  # ceil
        while len(table) < need:
            if not self.free:
                raise RuntimeError("paged cache out of pages")
            table.append(self.free.pop())
        self.lengths[seq_id] = new_len
        return table

    def release(self, seq_id: int):
        for p in self.tables.pop(seq_id, []):
            self.free.append(p)
        self.lengths.pop(seq_id, None)


@dataclasses.dataclass
class PagedCacheState:
    pages: jax.Array  # (num_pages, page_size, cache_dim)

    @classmethod
    def create(cls, num_pages, page_size, cache_dim, dtype=jnp.bfloat16):
        return cls(jnp.zeros((num_pages, page_size, cache_dim), dtype))


def paged_write(
    pages: jax.Array,  # (P, page_size, C)
    entries: jax.Array,  # (n, C) new token entries
    page_ids: jax.Array,  # (n,) destination page per token
    offsets: jax.Array,  # (n,) slot within the page
) -> jax.Array:
    return pages.at[page_ids, offsets].set(entries.astype(pages.dtype))


def positions_to_slots(start: int, count: int, table: list[int], page_size: int):
    """Host helper: token positions [start, start+count) -> (page_ids, offsets)."""
    pos = np.arange(start, start + count)
    page_idx = pos // page_size
    return (
        np.asarray([table[i] for i in page_idx], np.int32),
        (pos % page_size).astype(np.int32),
    )


def paged_gather(
    pages: jax.Array,  # (P, page_size, C)
    block_table: jax.Array,  # (max_pages,) page ids for one sequence (padded)
) -> jax.Array:
    """-> (max_pages * page_size, C) contiguous view of a sequence's cache."""
    g = pages[block_table]  # (max_pages, page_size, C)
    return g.reshape(-1, g.shape[-1])


def batched_paged_gather(
    pages: jax.Array,
    block_tables: jax.Array,  # (B, max_pages)
) -> jax.Array:
    """-> (B, max_pages*page_size, C)."""
    g = pages[block_tables]  # (B, max_pages, page_size, C)
    b, mp, ps, c = g.shape
    return g.reshape(b, mp * ps, c)
