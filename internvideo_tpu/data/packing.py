"""Sample packing: fill fixed-length token budgets with whole samples.

Host-side counterpart of xtuner's soft/hard packing
(InternVideo3_sft/xtuner/v1/datasets/packing.py:24-474): soft packing keeps
a buffer of pending samples and greedily closes the pack whose remaining
space best matches the next sample ("closest-sum" buffer packing); hard
packing additionally splits over-long samples.

Output is a list of packs (lists of sample indices); `SequenceContext.
from_segments` turns a pack into the padded device batch. Packing
efficiency Σlᵢ/(P·L) is returned for logging (the reference logs the
related Σlᵢ²/(Σlᵢ)² attention-efficiency ratio every step —
train_engine.py:268-288).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass
class PackingResult:
    packs: list[list[int]]  # sample indices per pack
    efficiency: float  # fraction of budget filled with real tokens
    dropped: list[int]  # samples longer than the budget (soft mode)


def soft_pack(
    lengths: Sequence[int],
    pack_max_length: int,
    *,
    buffer_size: int = 512,
) -> PackingResult:
    """Greedy closest-fit packing with a look-ahead buffer."""
    order = sorted(range(len(lengths)), key=lambda i: -lengths[i])
    dropped = [i for i in order if lengths[i] > pack_max_length]
    pending = [i for i in order if lengths[i] <= pack_max_length]

    packs: list[list[int]] = []
    remaining: list[int] = []
    for idx in pending:
        n = lengths[idx]
        # best-fit: the open pack with the least leftover after adding
        best, best_left = None, None
        for pi in range(max(0, len(packs) - buffer_size), len(packs)):
            left = remaining[pi] - n
            if left >= 0 and (best_left is None or left < best_left):
                best, best_left = pi, left
        if best is None:
            packs.append([idx])
            remaining.append(pack_max_length - n)
        else:
            packs[best].append(idx)
            remaining[best] = best_left
    used = sum(lengths[i] for p in packs for i in p)
    eff = used / max(len(packs) * pack_max_length, 1)
    return PackingResult(packs=packs, efficiency=eff, dropped=dropped)


def hard_pack(
    lengths: Sequence[int], pack_max_length: int
) -> PackingResult:
    """Stream-concatenate samples, splitting across pack boundaries.

    Returns packs of (index, start, end) triples flattened as indices with
    the split bookkeeping left to the caller (token streams, not samples).
    """
    packs: list[list[int]] = []
    cur: list[int] = []
    space = pack_max_length
    for i, n in enumerate(lengths):
        left = n
        while left > 0:
            take = min(left, space)
            cur.append(i)
            space -= take
            left -= take
            if space == 0:
                packs.append(cur)
                cur, space = [], pack_max_length
    if cur:
        packs.append(cur)
    total = sum(lengths)
    eff = total / max(
        ((total + pack_max_length - 1) // pack_max_length) * pack_max_length, 1
    )
    return PackingResult(packs=packs, efficiency=eff, dropped=[])


def attention_efficiency(lengths: Sequence[int]) -> float:
    """Σlᵢ² / (Σlᵢ)² — quadratic-cost efficiency of a pack
    (xtuner train_engine.py:268-288)."""
    s = sum(lengths)
    return sum(l * l for l in lengths) / max(s * s, 1)
