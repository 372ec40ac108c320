"""PRNG discipline.

One root key per run; every consumer gets a fold_in'd stream. Streams are
cheap, deterministic, and safe to carry through jit (keys are data). This
replaces the reference's global `torch.manual_seed` + per-worker seeds
(InternVideo2/single_modality/run_pretraining.py seeding, dataloader
worker_init) with an explicit, functional scheme.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class RngStream:
    """A named, forkable stream of PRNG keys.

    >>> root = RngStream.from_seed(0)
    >>> dropout = root.fork("dropout")
    >>> k0 = dropout.at_step(0)   # key for step 0 — same every time
    """

    def __init__(self, key: jax.Array, name: str = "root"):
        self._key = key
        self.name = name

    @classmethod
    def from_seed(cls, seed: int) -> "RngStream":
        return cls(jax.random.key(seed))

    def fork(self, name: str) -> "RngStream":
        # Stable string hash (python's hash() is salted per-process).
        h = jnp.uint32(_fnv1a(name))
        return RngStream(jax.random.fold_in(self._key, h), name=name)

    def at_step(self, step) -> jax.Array:
        return jax.random.fold_in(self._key, step)

    @property
    def key(self) -> jax.Array:
        return self._key


def _fnv1a(s: str) -> int:
    h = 0x811C9DC5
    for ch in s.encode():
        h = ((h ^ ch) * 0x01000193) & 0xFFFFFFFF
    return h
