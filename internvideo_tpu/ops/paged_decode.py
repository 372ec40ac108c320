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
  * grid = (batch, ceil(max_pages / G)); each grid step DMAs **G pages at
    once** through G scalar-prefetched block-table lookups. One page per
    step (G=1, the r3 design) measured 130 GB/s at the 2B serve shapes —
    a 64x576 bf16 page is 73 KB, so the per-DMA latency dominated and the
    kernel sat 6x off the HBM roofline while the decode step is purely
    cache+weight streaming. With G=8 the step moves 590 KB across 8
    concurrent DMAs and the score matmul becomes (H, R)x(R, G*ps) — MXU-
    shaped instead of vector-thin. Measured: see PERF.md "Serving".
  * scores s = (q_lat·c + q_pe·p)·scale over the G pages' tokens; online
    softmax across grid steps; context accumulates in latent space
    (acc += prob @ c), finalized as ctx = acc / l
  * page slots past the sequence's length are masked by position; grid
    steps entirely past the end are skipped (`pl.when`) and their index
    maps clamp to the last real page so no fresh DMA is issued

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
    *refs,  # G page refs (1, page_size, R+P), out_ref, m/l/acc scratch
    scale: float,
    page_size: int,
    lora_rank: int,
    group: int,  # pages per grid step (G)
):
    page_refs = refs[:group]
    out_ref, m_ref, l_ref, acc_ref = refs[group:]
    b, i = pl.program_id(0), pl.program_id(1)
    n_steps = pl.num_programs(1)
    seq_len = sl_ref[b]
    gp = group * page_size

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i * gp < seq_len)
    def _compute():
        ql = qlat_ref[0]  # (H, R) cache dtype — score dot runs bf16 on MXU
        qp = qpe_ref[0]  # (H, P)
        page = (
            page_refs[0][0] if group == 1
            else jnp.concatenate([r[0] for r in page_refs], axis=0)
        )  # (G*page_size, R+P)
        c = page[:, :lora_rank]  # (gp, R)
        p = page[:, lora_rank:]  # (gp, P)
        s = (
            jax.lax.dot_general(
                ql, c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                qp, p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ) * scale  # (H, gp)
        pos = i * gp + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
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
            prob.astype(c.dtype), c, preferred_element_type=jnp.float32
        )

    @pl.when(i == n_steps - 1)
    def _finalize():
        l = l_ref[:, 0]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_ref[:] / l_safe[:, None]).astype(out_ref.dtype)


def _pick_group(max_pages: int, page_bytes: int) -> int:
    """Pages per grid step: minimize clamp-padding waste (every ref in a
    step DMAs even when clamped, so ceil(mp/G)*G - mp pages are re-read),
    then minimize step count (per-step cost measured ~0.6 us), under a
    ~6 MB double-buffered VMEM budget for the page refs. At the 2B serve
    shapes (max_pages 33): G=33 -> one step per sequence, 2.4 MB DMAs at
    ~the HBM roofline; G=8 with its 7-page padded tail measured 364 GB/s."""
    gmax = max(1, min(max_pages, int(6_000_000 // (2 * page_bytes))))
    best_g, best_key = 1, None
    for g in range(1, gmax + 1):
        steps = -(-max_pages // g)
        waste = steps * g - max_pages
        key = (waste, steps)
        if best_key is None or key < best_key:
            best_key, best_g = key, g
    return best_g


def paged_mla_decode(
    q_lat: jax.Array,  # (B, H, R) latent-absorbed queries
    q_pe: jax.Array,  # (B, H, P) rope queries (already rotated)
    pages: jax.Array,  # (num_pages, page_size, R+P) latent page pool
    block_tables: jax.Array,  # (B, max_pages) int32 page ids (pad: any valid)
    seq_lens: jax.Array,  # (B,) int32 valid tokens per sequence
    *,
    softmax_scale: float,
    pages_per_block: int | None = None,  # None = auto (_pick_group)
    interpret: bool = False,
) -> jax.Array:
    """-> (B, H, R) latent context per query head. See module docstring."""
    b, h, r = q_lat.shape
    p_dim = q_pe.shape[-1]
    _, page_size, cache_dim = pages.shape
    assert cache_dim == r + p_dim
    max_pages = block_tables.shape[1]
    if pages_per_block is None:
        pages_per_block = _pick_group(
            max_pages, page_size * cache_dim * pages.dtype.itemsize
        )
    group = max(1, min(pages_per_block, max_pages))

    # Pad heads up to the 8-sublane tile so tiny test configs stay legal.
    h_pad = max(8 - h, 0)
    if h_pad:
        q_lat = jnp.pad(q_lat, ((0, 0), (0, h_pad), (0, 0)))
        q_pe = jnp.pad(q_pe, ((0, 0), (0, h_pad), (0, 0)))
    hp = h + h_pad

    block_tables = block_tables.astype(jnp.int32)
    seq_lens = seq_lens.astype(jnp.int32)
    n_steps = -(-max_pages // group)

    def _page_map(j):
        def imap(b_idx, i, bt, sl):
            # Clamp past-the-end lookups onto the last real page: the block
            # index doesn't change step-over-step, so Pallas issues no fresh
            # DMA for fully-skipped steps; in-step tail pages are masked by
            # position inside the kernel.
            last = jnp.maximum(
                (sl[b_idx] + page_size - 1) // page_size - 1, 0
            )
            return bt[b_idx, jnp.minimum(i * group + j, last)], 0, 0

        return imap

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_steps),
        in_specs=[
            pl.BlockSpec((1, hp, r), lambda b_idx, i, bt, sl: (b_idx, 0, 0)),
            pl.BlockSpec(
                (1, hp, p_dim), lambda b_idx, i, bt, sl: (b_idx, 0, 0)
            ),
        ] + [
            pl.BlockSpec((1, page_size, cache_dim), _page_map(j))
            for j in range(group)
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
            group=group,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, r), q_lat.dtype),
        interpret=interpret,
    )(block_tables, seq_lens, q_lat, q_pe, *([pages] * group))
    return out[:, :h]
