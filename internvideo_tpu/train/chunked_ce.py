"""Chunked cross-entropy: CE over a huge vocab without materializing logits.

Counterpart of xtuner's chunked LM-head loss (xtuner/v1/loss/ce_loss.py:18,
chunk_loss.py:6-60): the (L, vocab) logits for a 262k-token pack at 151k
vocab would be ~150GB — instead the lm_head matmul + CE run per sequence
chunk. The reference hand-writes the autograd; here a remat'd lax.scan gets
the same memory profile (logits recomputed chunk-by-chunk in the backward)
with XLA doing the scheduling.

Normalization is global: the caller passes the total valid-token count
(summed across dp/sp ranks — one psum at the loss site, matching
loss/ce_loss.py's global denominators).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def chunked_cross_entropy(
    hidden: jax.Array,  # (B, L, D)
    lm_head_kernel: jax.Array,  # (D, V)
    labels: jax.Array,  # (B, L) int; -100 = ignore
    *,
    chunk_size: int = 2048,
    total_valid: Optional[jax.Array] = None,  # global denominator
) -> jax.Array:
    b, l, d = hidden.shape
    v = lm_head_kernel.shape[1]
    pad = (-l) % chunk_size
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=-100)
    n_chunks = hidden.shape[1] // chunk_size
    hidden = hidden.reshape(b, n_chunks, chunk_size, d).swapaxes(0, 1)
    labels = labels.reshape(b, n_chunks, chunk_size).swapaxes(0, 1)

    @functools.partial(jax.checkpoint, policy=None)
    def chunk_loss(h, y):
        # keep operands in their storage dtype and accumulate in f32: an
        # .astype(f32) on the (D, V) kernel would re-materialize a
        # multi-GB f32 copy per chunk (and again in the remat'd backward)
        # and run the GEMM at f32 MXU rate; preferred_element_type gives
        # the same f32 logits at bf16 throughput
        logits = jnp.einsum(
            "bsd,dv->bsv", h, lm_head_kernel,
            preferred_element_type=jnp.float32,
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        valid = y != -100
        picked = jnp.take_along_axis(
            logp, jnp.maximum(y, 0)[..., None], axis=-1
        )[..., 0]
        return -jnp.sum(jnp.where(valid, picked, 0.0)), jnp.sum(valid)

    def body(carry, xs):
        loss_sum, count = carry
        h, y = xs
        loss, cnt = chunk_loss(h, y)
        return (loss_sum + loss, count + cnt), None

    (loss_sum, count), _ = jax.lax.scan(
        body, (jnp.zeros(()), jnp.zeros((), jnp.int32)), (hidden, labels)
    )
    denom = (
        total_valid if total_valid is not None else jnp.maximum(count, 1)
    )
    return loss_sum / denom
