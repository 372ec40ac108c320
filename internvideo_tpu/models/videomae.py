"""VideoMAE: masked pixel-reconstruction pretraining (InternVideo1 gen-1).

Counterpart of InternVideo1/Pretrain/VideoMAE/modeling_pretrain.py: a
LayerNorm ViT encoder over visible tubelet tokens and a narrow decoder over
the full grid (mask tokens at masked slots) regressing per-patch normalized
pixels; loss = MSE on masked positions only.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from internvideo_tpu.data.masking import indices_to_mask
from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.nn.embeds import get_3d_sincos_pos_embed
from internvideo_tpu.nn.norms import LayerNorm
from internvideo_tpu.nn.transformer import Block


@dataclasses.dataclass(frozen=True)
class VideoMAEConfig:
    encoder: InternVideo2Config = dataclasses.field(
        default_factory=lambda: InternVideo2Config(
            norm_type="layernorm", qk_normalization=False, init_values=0.0,
            tubelet_size=2, patch_size=16,
        )
    )
    decoder_dim: int = 384
    decoder_depth: int = 4
    decoder_heads: int = 6
    normalize_target: bool = True


@struct.dataclass
class VideoMAEOutput:
    loss: jax.Array
    pred: jax.Array  # (B, N, patch_pixels) full-grid predictions
    target: jax.Array


class VideoMAEPretrain(nn.Module):
    config: VideoMAEConfig

    @nn.compact
    def __call__(
        self,
        video: jax.Array,  # (B, T, H, W, 3)
        keep_indices: jax.Array,  # (B, n_vis)
        *,
        deterministic: bool = True,
    ) -> VideoMAEOutput:
        cfg = self.config
        enc = cfg.encoder
        dtype = jnp.dtype(enc.dtype)
        gt, gh, gw = enc.grid_size
        n = enc.num_patches
        b = video.shape[0]
        p, ts = enc.patch_size, enc.tubelet_size

        out = InternVideo2(enc, name="encoder")(
            video, keep_indices=keep_indices, deterministic=deterministic
        )

        d = cfg.decoder_dim
        enc_to_dec = nn.Dense(
            d, dtype=dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", "mlp")
            ),
            name="encoder_to_decoder",
        )(out.tokens[:, 1:])  # drop cls
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, d)
        )
        grid = jnp.broadcast_to(mask_token.astype(dtype), (b, n, d))
        grid = jax.vmap(lambda g, idx, val: g.at[idx].set(val))(
            grid, keep_indices, enc_to_dec
        )
        dec_pos = jnp.asarray(
            get_3d_sincos_pos_embed(d, gh, gt, cls_token=False)
        ).astype(dtype)
        grid = grid + dec_pos[None]
        for i in range(cfg.decoder_depth):
            grid = Block(
                num_heads=cfg.decoder_heads, mlp_ratio=4.0,
                qk_normalization=False, init_values=None,
                norm_type="layernorm", dtype=dtype,
                attn_impl=enc.attn_impl, name=f"decoder_block_{i}",
            )(grid, deterministic)
        grid = LayerNorm(dtype=dtype, name="decoder_norm")(grid)
        pred = nn.Dense(
            ts * p * p * 3, dtype=dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("mlp", None)
            ),
            name="decoder_head",
        )(grid)  # (B, N, pixels)

        x = video.reshape(b, gt, ts, gh, p, gw, p, 3)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, n, -1)
        target = x
        if cfg.normalize_target:
            mu = x.mean(-1, keepdims=True)
            sd = x.std(-1, keepdims=True) + 1e-6
            target = (x - mu) / sd

        masked = ~indices_to_mask(keep_indices, n)  # (B, N) True = masked
        per_tok = jnp.mean(
            jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)),
            axis=-1,
        )
        loss = jnp.sum(per_tok * masked) / jnp.maximum(masked.sum(), 1)
        return VideoMAEOutput(loss=loss, pred=pred, target=target)
