"""Multi-source scheduling, resumable iteration, device prefetch.

  * MetaLoader: deterministic weighted interleave of several media streams —
    the reference broadcasts a shuffled source order from rank 0 every epoch
    (multi_modality/dataset/dataloader.py:10-59); here the order is derived
    from a seed so every host computes it identically (no collective needed).
  * StatefulIterator: iteration-resumable wrapper à la
    StatefulDistributedSampler (dataset/sampler.py:7-60) — skip-free resume
    by reconstructing the permutation from (seed, epoch) and jumping to the
    step offset.
  * prefetch_to_device: double-buffered host→device pipeline (the north-star
    "streams clips directly into HBM").
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Iterable, Iterator, Optional

import jax
import numpy as np


class MetaLoader:
    """Interleave iterators from several sources in a seeded random order.

    Each epoch: a schedule listing source s exactly len(s) times (or
    weighted), shuffled with `seed + epoch`, then consumed in order.
    """

    def __init__(
        self,
        sources: dict[str, Iterable],
        *,
        counts: Optional[dict[str, int]] = None,
        seed: int = 0,
        epoch: int = 0,
    ):
        self.sources = sources
        self.counts = counts or {k: len(v) for k, v in sources.items()}
        self.seed = seed
        self.epoch = epoch

    def schedule(self) -> list[str]:
        names = []
        for k, n in self.counts.items():
            names += [k] * n
        rng = np.random.default_rng(self.seed + self.epoch)
        rng.shuffle(names)
        return names

    def __len__(self):
        return sum(self.counts.values())

    def __iter__(self):
        its = {k: iter(v) for k, v in self.sources.items()}
        for name in self.schedule():
            try:
                item = next(its[name])
            except StopIteration:
                its[name] = iter(self.sources[name])
                try:
                    item = next(its[name])
                except StopIteration:
                    # a bare re-raise would escape the generator frame as
                    # PEP 479's opaque RuntimeError
                    raise ValueError(
                        f"MetaLoader source {name!r} is empty"
                    ) from None
            yield name, item


class StatefulIterator:
    """Seeded, epoch-aware, step-resumable index iterator over a dataset.

    `num_shards`/`shard_id` give per-host data sharding (DistributedSampler
    equivalent): every host computes the same epoch permutation from the
    seed and consumes its strided slice — disjoint, no collective.
    """

    def __init__(
        self, n: int, *, seed: int = 0, shuffle: bool = True,
        num_shards: int = 1, shard_id: int = 0,
    ):
        self.n = n
        self.seed = seed
        self.shuffle = shuffle
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.epoch = 0
        self.step = 0  # index position inside this shard's epoch slice

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "step": self.step}

    def load_state_dict(self, s: dict):
        self.epoch, self.step = s["epoch"], s["step"]

    def _perm(self) -> np.ndarray:
        if self.shuffle:
            perm = np.random.default_rng(
                self.seed + self.epoch
            ).permutation(self.n)
        else:
            perm = np.arange(self.n)
        return perm[self.shard_id :: self.num_shards]

    def __iter__(self) -> Iterator[int]:
        while True:
            perm = self._perm()
            while self.step < len(perm):
                idx = int(perm[self.step])
                self.step += 1
                yield idx
            self.epoch += 1
            self.step = 0


def prefetch_to_device(
    it: Iterable,
    *,
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Background thread moves batches to device `size` steps ahead.

    Producer errors (corrupt media, device_put OOM) re-raise in the
    consumer instead of masquerading as end-of-data; abandoning the
    generator early (break / close) stops the producer and releases the
    queued device batches instead of pinning them for the process life.
    """
    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def producer():
        try:
            for batch in it:
                if sharding is not None:
                    batch = jax.tree.map(
                        lambda x, s=sharding: jax.device_put(x, s), batch
                    )
                else:
                    batch = jax.tree.map(jax.device_put, batch)
                if not _put(batch):
                    return
        except BaseException as e:  # surface in the consumer
            _put(e)
            return
        _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while not q.empty():  # drop queued device references
            try:
                q.get_nowait()
            except queue_mod.Empty:
                break
