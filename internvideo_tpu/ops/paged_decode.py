"""Pallas TPU paged-attention decode kernel for M²LA latent caches.

TPU-native counterpart of the reference's paged decode path (xtuner
module/attention/kv_cache.py:5-47 fill_paged_kv_cache + the lmdeploy
`flash_mla_decoding` custom op, mla.py:86-127): one generated token per
sequence attends over that sequence's paged latent cache WITHOUT
materializing a contiguous (B, max_len, C) gather in HBM.

Design (absorbed MLA decode — mla.py:453-560 math):
  * the cache entry per token is `kv_lora_rank` latent floats plus
    `qk_rope_head_dim` shared rotary-key floats, stored page-contiguous in
    a global pool `pages: (num_pages, page_size, R+P)`
  * queries arrive already absorbed into latent space:
        q_lat = q_nope @ W_uk   (B, H, R)
        q_pe  = rope'd rope-queries (B, H, P)
  * grid = (batch, max_pages); the page pool is indexed through a
    *scalar-prefetched* block table, so each grid step DMAs exactly one
    page of this sequence — HBM traffic is O(seq_len), not O(pool)
  * scores s = (q_lat·c + q_pe·p)·scale over the page's tokens; online
    softmax across pages; context accumulates in latent space
    (acc += prob @ c), finalized as ctx = acc / l
  * pages past the sequence's length are skipped (`pl.when`) and their
    index map clamps to the last real page so no fresh DMA is issued

The caller finishes with out = einsum(ctx, W_uv) + o_proj — plain XLA
matmuls that fuse fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(
    bt_ref,  # scalar prefetch: (B, max_pages) int32 block tables
    sl_ref,  # scalar prefetch: (B,) int32 sequence lengths
    qlat_ref,  # (1, H, R)
    qpe_ref,  # (1, H, P)
    page_ref,  # (1, page_size, R+P)
    out_ref,  # (1, H, R)
    m_ref,  # VMEM (H, 128) f32 running max
    l_ref,  # VMEM (H, 128) f32 running denominator
    acc_ref,  # VMEM (H, R) f32 latent context accumulator
    *,
    scale: float,
    page_size: int,
    lora_rank: int,
):
    b, i = pl.program_id(0), pl.program_id(1)
    n_pages = pl.num_programs(1)
    seq_len = sl_ref[b]

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i * page_size < seq_len)
    def _compute():
        ql = qlat_ref[0].astype(jnp.float32)  # (H, R)
        qp = qpe_ref[0].astype(jnp.float32)  # (H, P)
        page = page_ref[0].astype(jnp.float32)  # (page_size, R+P)
        c = page[:, :lora_rank]  # (page_size, R)
        p = page[:, lora_rank:]  # (page_size, P)
        s = (
            jax.lax.dot_general(
                ql, c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                qp, p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ) * scale  # (H, page_size)
        pos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(pos < seq_len, s, _NEG_INF)

        m_prev = m_ref[:, 0]  # (H,)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        prob = jnp.exp2((s - m_cur[:, None]) * 1.4426950408889634)
        prob = jnp.where((s <= _NEG_INF), 0.0, prob)
        alpha = jnp.exp2((m_prev - m_cur) * 1.4426950408889634)
        alpha = jnp.where(jnp.isfinite(m_prev), alpha, 0.0)
        l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(prob, axis=1)
        m_ref[:, 0] = m_cur
        acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot(
            prob, c, preferred_element_type=jnp.float32
        )

    @pl.when(i == n_pages - 1)
    def _finalize():
        l = l_ref[:, 0]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_ref[:] / l_safe[:, None]).astype(out_ref.dtype)


def paged_mla_decode(
    q_lat: jax.Array,  # (B, H, R) latent-absorbed queries
    q_pe: jax.Array,  # (B, H, P) rope queries (already rotated)
    pages: jax.Array,  # (num_pages, page_size, R+P) latent page pool
    block_tables: jax.Array,  # (B, max_pages) int32 page ids (pad: any valid)
    seq_lens: jax.Array,  # (B,) int32 valid tokens per sequence
    *,
    softmax_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """-> (B, H, R) latent context per query head. See module docstring."""
    b, h, r = q_lat.shape
    p_dim = q_pe.shape[-1]
    _, page_size, cache_dim = pages.shape
    assert cache_dim == r + p_dim
    max_pages = block_tables.shape[1]

    # Pad heads up to the 8-sublane tile so tiny test configs stay legal.
    h_pad = max(8 - h, 0)
    if h_pad:
        q_lat = jnp.pad(q_lat, ((0, 0), (0, h_pad), (0, 0)))
        q_pe = jnp.pad(q_pe, ((0, 0), (0, h_pad), (0, 0)))
    hp = h + h_pad

    block_tables = block_tables.astype(jnp.int32)
    seq_lens = seq_lens.astype(jnp.int32)

    def _page_map(b_idx, i, bt, sl):
        # Clamp past-the-end steps onto the last real page: the block index
        # doesn't change, so Pallas issues no fresh DMA for skipped pages.
        last = jnp.maximum(
            (sl[b_idx] + page_size - 1) // page_size - 1, 0
        )
        return bt[b_idx, jnp.minimum(i, last)], 0, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, max_pages),
        in_specs=[
            pl.BlockSpec((1, hp, r), lambda b_idx, i, bt, sl: (b_idx, 0, 0)),
            pl.BlockSpec(
                (1, hp, p_dim), lambda b_idx, i, bt, sl: (b_idx, 0, 0)
            ),
            pl.BlockSpec((1, page_size, cache_dim), _page_map),
        ],
        out_specs=pl.BlockSpec(
            (1, hp, r), lambda b_idx, i, bt, sl: (b_idx, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((hp, 128), jnp.float32),
            pltpu.VMEM((hp, 128), jnp.float32),
            pltpu.VMEM((hp, r), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            scale=softmax_scale,
            page_size=page_size,
            lora_rank=r,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, r), q_lat.dtype),
        interpret=interpret,
    )(block_tables, seq_lens, q_lat, q_pe, pages)
    return out[:, :h]
