"""UMT/MAE masked-pretraining student (PretrainInternVideo2 equivalent).

Architecture parity with the reference
(single_modality/models/internvideo2_pretrain.py:406-744):

  student = InternVideo2 encoder run on visible tokens only
  + K CLIP-align decoders: Linear -> LayerNorm -> l2 (Linear_Decoder :334),
    one per aligned intermediate layer, fed layer features + a dedicated
    learnable sincos 'clip_pos_embed' gathered at visible positions
  + one final CLIP decoder on the attention-pooled output
  + K MAE-align decoders: MLP(Linear-GELU-Linear) -> LayerNorm -> l2
    (MLP_Decoder :368) on patch tokens (no cls) + 'mae_pos_embed'

Aligned layer indices follow the reference recipe
(internvideo2_pretrain.py:453-464): depth - i*interval - 1 for i in range(K).

Masking is index-based (see data/masking.py) — keep_indices has a static
visible count, replacing the reference's dynamic x[~mask] (:659).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.nn.embeds import get_3d_sincos_pos_embed
from internvideo_tpu.nn.norms import LayerNorm


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    encoder: InternVideo2Config = dataclasses.field(
        default_factory=InternVideo2Config
    )
    clip_output_dim: int = 3200  # teacher hidden dim (internvl-6B: 3200)
    clip_final_output_dim: int = 768  # teacher projector dim
    clip_norm_type: str = "l2"
    clip_return_layers: int = 6
    clip_return_interval: float = 1.0
    mae_output_dim: int = 768  # mae teacher dim
    mae_norm_type: str = "l2"
    mae_return_layers: int = 1
    mae_return_interval: float = 1.0
    distill_final_features: bool = True

    def return_indices(self, k: int, interval: float) -> tuple[int, ...]:
        depth = self.encoder.depth
        return tuple(depth - int(i * interval) - 1 for i in range(k))

    @property
    def clip_indices(self) -> tuple[int, ...]:
        return self.return_indices(
            self.clip_return_layers, self.clip_return_interval
        )

    @property
    def mae_indices(self) -> tuple[int, ...]:
        return self.return_indices(
            self.mae_return_layers, self.mae_return_interval
        )


@struct.dataclass
class PretrainOutput:
    clip_middle: jax.Array  # (K, B, 1+n_vis, clip_output_dim), l2-normed
    clip_final: Optional[jax.Array]  # (B, clip_output_dim)
    mae: Optional[jax.Array]  # (K_mae, B, n_vis, mae_output_dim); None for distill
    # encoder outputs — stage-2 (internvideo2_stage2_visual.py:264-266) feeds
    # the masked tokens/pooled into the contrastive branch alongside UTA
    tokens: Optional[jax.Array] = None  # (B, 1+n_vis, D)
    pooled: Optional[jax.Array] = None  # (B, clip_embed_dim)


class _LinearDecoder(nn.Module):
    out_dim: int
    norm_type: str = "l2"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.out_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("embed", "vocab")
            ),
            name="head",
        )(x)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm")(x)
        if self.norm_type == "l2":
            x = x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True).astype(x.dtype)
        return x


class _MlpDecoder(nn.Module):
    out_dim: int
    norm_type: str = "l2"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(
            d, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("embed", "mlp")
            ),
            name="head_0",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("mlp", "vocab")
            ),
            name="head_2",
        )(x)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm")(x)
        if self.norm_type == "l2":
            x = x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True).astype(x.dtype)
        return x


class PretrainInternVideo2(nn.Module):
    config: PretrainConfig

    @nn.compact
    def __call__(
        self,
        video: jax.Array,  # (B, T, H, W, 3)
        keep_indices: Optional[jax.Array] = None,  # (B, n_vis) visible positions
        *,
        deterministic: bool = True,
        return_align: Optional[bool] = None,  # None: align iff masked
    ) -> PretrainOutput:
        cfg = self.config
        enc_cfg = cfg.encoder
        dtype = jnp.dtype(enc_cfg.dtype)
        param_dtype = jnp.dtype(enc_cfg.param_dtype)
        gt, gh, gw = enc_cfg.grid_size
        if return_align is None:
            # stage-2 test/eval forward is unmasked and skips the decoders
            # (internvideo2_stage2_visual.py:256-258 `if test:`)
            return_align = keep_indices is not None

        want = sorted(set(cfg.clip_indices) | set(cfg.mae_indices))
        out = InternVideo2(enc_cfg, name="encoder")(
            video,
            keep_indices=keep_indices,
            deterministic=deterministic,
            return_hidden_layers=want if return_align else None,
        )
        if not return_align:
            return PretrainOutput(
                clip_middle=None, clip_final=None, mae=None,
                tokens=out.tokens, pooled=out.pooled,
            )
        hidden = dict(zip(want, out.hidden_states))

        b = video.shape[0]
        if keep_indices is None:
            keep_indices = jnp.broadcast_to(
                jnp.arange(enc_cfg.num_patches, dtype=jnp.int32)[None],
                (b, enc_cfg.num_patches),
            )
        n_vis = keep_indices.shape[1]

        # --- CLIP alignment branch ---
        clip_pos = self.param(
            "clip_pos_embed",
            nn.with_logical_partitioning(
                lambda key, shape, dt: jnp.asarray(
                    get_3d_sincos_pos_embed(shape[-1], gh, gt, cls_token=True), dt
                ),
                (None, "embed"),
            ),
            (1 + enc_cfg.num_patches, enc_cfg.embed_dim),
            param_dtype,
        )
        # visible positions (+1 offset past cls) with cls slot in front
        clip_pos_vis = jnp.concatenate(
            [
                jnp.broadcast_to(clip_pos[:1], (b, 1, enc_cfg.embed_dim)),
                jnp.take(clip_pos, keep_indices + 1, axis=0),
            ],
            axis=1,
        ).astype(dtype)

        # Decoder j pairs with the j-th layer in ASCENDING block order — the
        # reference appends intermediate layers as the block loop ascends
        # (internvideo2_pretrain.py:659-668), so decoder 0 sees the earliest
        # returned layer. Matters for K>1 and for loading reference ckpts.
        clip_aligned = []
        for j, layer_idx in enumerate(sorted(set(cfg.clip_indices))):
            feats = hidden[layer_idx] + clip_pos_vis
            clip_aligned.append(
                _LinearDecoder(
                    cfg.clip_output_dim, cfg.clip_norm_type,
                    dtype=dtype, param_dtype=param_dtype,
                    name=f"clip_decoder_{j}",
                )(feats)
            )
        clip_middle = jnp.stack(clip_aligned)

        clip_final = None
        if cfg.distill_final_features:
            clip_final = _LinearDecoder(
                cfg.clip_final_output_dim, cfg.clip_norm_type,
                dtype=dtype, param_dtype=param_dtype,
                name="final_clip_decoder",
            )(out.pooled)

        # --- MAE alignment branch (patch tokens only, no cls) ---
        if cfg.mae_return_layers == 0:
            # distillation variant (internvideo2_distill.py): CLIP-align only
            return PretrainOutput(
                clip_middle=clip_middle, clip_final=clip_final, mae=None,
                tokens=out.tokens, pooled=out.pooled,
            )
        mae_pos = self.param(
            "mae_pos_embed",
            nn.with_logical_partitioning(
                lambda key, shape, dt: jnp.asarray(
                    get_3d_sincos_pos_embed(shape[-1], gh, gt, cls_token=False), dt
                ),
                (None, "embed"),
            ),
            (enc_cfg.num_patches, enc_cfg.embed_dim),
            param_dtype,
        )
        mae_pos_vis = jnp.take(mae_pos, keep_indices, axis=0).astype(dtype)

        mae_aligned = []
        for j, layer_idx in enumerate(sorted(set(cfg.mae_indices))):
            feats = hidden[layer_idx][:, 1:] + mae_pos_vis
            mae_aligned.append(
                _MlpDecoder(
                    cfg.mae_output_dim, cfg.mae_norm_type,
                    dtype=dtype, param_dtype=param_dtype,
                    name=f"mae_decoder_{j}",
                )(feats)
            )
        mae = jnp.stack(mae_aligned)

        return PretrainOutput(
            clip_middle=clip_middle, clip_final=clip_final, mae=mae,
            tokens=out.tokens, pooled=out.pooled,
        )
