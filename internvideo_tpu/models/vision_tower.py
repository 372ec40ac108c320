"""InternVideo3 vision tower (SigLIP-style) + patch-merger projector.

Parity target: xtuner's InternVideo3VisionModel / Projector
(InternVideo3_sft/xtuner/v1/model/compose/internvideo3/modeling_vision.py,
modeling_projector.py): 1152-d, 24 layers, 16 heads, gelu-tanh MLP 4304,
16px patches with temporal_patch 2, learned 48x48 pos table bilinearly
resampled to the input grid, 2D rotary embedding over (row, col) at
head_dim/4 frequencies each, tokens laid out in 2x2 merge-block order,
deepstack feature taps, and per-tap patch mergers
(LayerNorm -> concat 2x2 -> fc1 -> gelu -> fc2 to text width).

TPU-first deviation: the reference streams a flat packed pixel sequence with
per-sample grids (cu_seqlens varlen attention); here the batched path takes
(B, T, H, W, 3) with one static grid — attention is full (no masking needed)
and everything is a static-shape tensor op. Packed multi-grid support rides
the same kernels via segment ids when needed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from internvideo_tpu.nn.norms import LayerNorm
from internvideo_tpu.nn.rope import apply_rope
from internvideo_tpu.ops import dot_product_attention


@dataclasses.dataclass(frozen=True)
class VisionTowerConfig:
    hidden_size: int = 1152
    num_layers: int = 27  # internvideo3_config.py:25 depth=27
    num_heads: int = 16
    intermediate_size: int = 4304
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    pos_embed_grid: int = 48  # sqrt(num_position_embeddings=2304)
    # taps AFTER 0-indexed block i (modeling_vision.py:525 `layer_num in
    # deepstack_visual_indexes` fires after blk() ran)
    deepstack_indexes: tuple[int, ...] = (8, 16, 24)
    text_hidden_size: int = 4096
    dtype: str = "float32"
    param_dtype: str = "float32"
    attn_impl: str = "auto"
    # "int8" = serving-time Int8Dense block projections (dynamic-int8 on
    # the int8 MXU — the tower is GEMM-dominated and compute-bound, the
    # shape regime where dynamic int8 wins; see PERF.md "Quantized GEMM").
    # Convert trained params once with ops.quant.quantize_params_like.
    quant: str | None = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _vision_rope_tables(gt: int, gh: int, gw: int, head_dim: int):
    """2D rope cos/sin (S, head_dim) for merge-block-ordered tokens.

    Row coords drive the first head_dim/4 frequency slots, col coords the
    next head_dim/4; the half-table is then tiled twice (rotate-half form) —
    matching modeling_vision.py:433-470 rot_pos_emb.
    """
    m = 2  # merge size fixed at 2 here
    rows, cols = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    # merge-block order: (gh/m, gw/m, m, m)
    order = (
        np.arange(gh * gw)
        .reshape(gh // m, m, gw // m, m)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    r = rows.reshape(-1)[order]
    c = cols.reshape(-1)[order]
    r = np.tile(r, gt)
    c = np.tile(c, gt)
    quarter = head_dim // 4
    inv = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))
    ang = np.concatenate(
        [r[:, None] * inv[None], c[:, None] * inv[None]], axis=1
    )  # (S, head_dim/2)
    ang = np.concatenate([ang, ang], axis=1)  # (S, head_dim)
    return (
        jnp.asarray(np.cos(ang), jnp.float32),
        jnp.asarray(np.sin(ang), jnp.float32),
    )


def _interpolate_pos_embed(table: jax.Array, n: int, gh: int, gw: int):
    """Bilinear resample of the (n*n, D) pos table to (gh*gw, D).

    Exact replica of fast_pos_embed_interpolate (modeling_vision.py:372-417):
    linspace(0, n-1, g) sample points with floor/ceil gathers — i.e.
    align-corners bilinear, NOT the half-pixel-centers convention of
    jax.image.resize (which differs at every non-corner cell).
    """
    def axis(g):
        idx = np.linspace(0, n - 1, g)
        lo = idx.astype(np.int32)
        hi = np.clip(lo + 1, None, n - 1)
        frac = (idx - lo).astype(np.float32)
        return lo, hi, frac

    h_lo, h_hi, dh = axis(gh)
    w_lo, w_hi, dw = axis(gw)
    idx = np.stack([
        (h_lo[:, None] * n + w_lo[None]).reshape(-1),
        (h_lo[:, None] * n + w_hi[None]).reshape(-1),
        (h_hi[:, None] * n + w_lo[None]).reshape(-1),
        (h_hi[:, None] * n + w_hi[None]).reshape(-1),
    ])  # (4, gh*gw)
    wgt = np.stack([
        ((1 - dh)[:, None] * (1 - dw)[None]).reshape(-1),
        ((1 - dh)[:, None] * dw[None]).reshape(-1),
        (dh[:, None] * (1 - dw)[None]).reshape(-1),
        (dh[:, None] * dw[None]).reshape(-1),
    ])  # (4, gh*gw)
    gathered = table[jnp.asarray(idx)]  # (4, gh*gw, D)
    return jnp.einsum(
        "kgd,kg->gd", gathered, jnp.asarray(wgt, jnp.float32)
    )


class _VisionBlock(nn.Module):
    cfg: VisionTowerConfig

    @nn.compact
    def __call__(self, x, cos, sin):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        b, s, d = x.shape
        h = LayerNorm(eps=1e-6, dtype=dtype, name="norm1")(x)

        def dense(feats, name, logical=("embed", "heads")):
            if cfg.quant == "int8":
                from internvideo_tpu.ops.quant import Int8Dense

                return Int8Dense(
                    feats, use_bias=True, dtype=dtype, param_dtype=pdtype,
                    logical=tuple(logical), name=name,
                )
            return nn.Dense(
                feats, dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), logical
                ),
                name=name,
            )

        qkv = dense(3 * d, "qkv")(h).reshape(b, s, 3, cfg.num_heads, -1)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v, impl=cfg.attn_impl)
        attn = dense(d, "proj", ("heads", "embed"))(
            attn.reshape(b, s, d)
        )
        x = x + attn

        h = LayerNorm(eps=1e-6, dtype=dtype, name="norm2")(x)
        h = dense(cfg.intermediate_size, "fc1", ("embed", "mlp"))(h)
        h = nn.gelu(h, approximate=True)  # gelu_pytorch_tanh
        h = dense(d, "fc2", ("mlp", "embed"))(h)
        return x + h


class PatchMerger(nn.Module):
    """LayerNorm -> concat 2x2 block -> fc1 -> gelu -> fc2 (projector)."""

    cfg: VisionTowerConfig
    use_postshuffle_norm: bool = False

    @nn.compact
    def __call__(self, x):  # (B, S, D) in merge-block order
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        factor = cfg.spatial_merge_size ** 2
        b, s, d = x.shape
        if self.use_postshuffle_norm:
            x = x.reshape(b, s // factor, factor * d)
            x = LayerNorm(eps=1e-6, dtype=dtype, name="norm")(x)
        else:
            x = LayerNorm(eps=1e-6, dtype=dtype, name="norm")(x)
            x = x.reshape(b, s // factor, factor * d)

        def dense(feats, name, logical):
            return nn.Dense(
                feats, dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), logical
                ),
                name=name,
            )

        x = dense(factor * d, "linear_fc1", ("embed", "mlp"))(x)
        x = nn.gelu(x, approximate=False)
        return dense(cfg.text_hidden_size, "linear_fc2", ("mlp", "embed"))(x)


class VisionTower(nn.Module):
    cfg: VisionTowerConfig

    @nn.compact
    def __call__(self, video: jax.Array):
        """video: (B, T, H, W, 3), T divisible by temporal_patch_size.

        Returns (tokens, deepstack): tokens (B, S, D) in merge-block order
        and the list of deepstack tap features.
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        b, t, hh, ww, c = video.shape
        p, tp, m = cfg.patch_size, cfg.temporal_patch_size, cfg.spatial_merge_size
        gt, gh, gw = t // tp, hh // p, ww // p

        # patchify as one GEMM, in merge-block order
        x = video.reshape(b, gt, tp, gh // m, m, p, gw // m, m, p, c)
        x = x.transpose(0, 1, 3, 6, 4, 7, 2, 5, 8, 9)
        # (B, gt, gh/m, gw/m, m, m, tp, p, p, c)
        x = x.reshape(b, gt * gh * gw, tp * p * p * c)
        x = nn.Dense(
            cfg.hidden_size, dtype=dtype, param_dtype=pdtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02),
                ("kernel_spatial", "embed"),
            ),
            name="patch_embed",
        )(x.astype(dtype))

        # learned 48x48 pos table, bilinear to (gh, gw), merge-block order
        table = self.param(
            "pos_embed",
            nn.with_logical_partitioning(
                nn.initializers.normal(0.02), (None, "embed")
            ),
            (cfg.pos_embed_grid * cfg.pos_embed_grid, cfg.hidden_size),
            pdtype,
        )
        pos = _interpolate_pos_embed(
            table.astype(jnp.float32), cfg.pos_embed_grid, gh, gw
        )
        order = (
            np.arange(gh * gw)
            .reshape(gh // m, m, gw // m, m)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )
        pos = pos.reshape(gh * gw, cfg.hidden_size)[order]
        pos = jnp.tile(pos, (gt, 1)).astype(dtype)
        x = x + pos[None]

        # attention is PER TEMPORAL FRAME: the reference's cu_seqlens are
        # repeat_interleave(h*w, t) (modeling_vision.py:498-502) — each of
        # the gt segments of gh*gw tokens attends only within itself. The
        # segments are uniform (gt frames x gh*gw tokens) and every
        # per-token table (pos embed, rope) is tiled identically per frame,
        # so folding gt into the batch dim is EXACT: no segment-id masking,
        # and attention runs batched dense at S=gh*gw instead of packed at
        # S=gt*gh*gw where (on TPU) most of each 1024-wide kernel block was
        # masked cross-frame waste (the r5 TTFT lever: the 128-frame tower
        # spent ~half its attention time on masked blocks).
        cos, sin = _vision_rope_tables(1, gh, gw, cfg.head_dim)
        x = x.reshape(b * gt, gh * gw, cfg.hidden_size)

        deepstack = []
        for i in range(cfg.num_layers):
            x = _VisionBlock(cfg, name=f"blocks_{i}")(x, cos, sin)
            if i in cfg.deepstack_indexes:
                deepstack.append(x.reshape(b, gt * gh * gw, cfg.hidden_size))
        return x.reshape(b, gt * gh * gw, cfg.hidden_size), deepstack
