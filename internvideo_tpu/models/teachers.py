"""Frozen teacher encoders for UMT masked distillation.

CLIPTeacher ≙ the reference's InternVL-CLIP-6B *image* encoder applied
per-frame (single_modality/models/internvl_clip_vision.py:376-466): the same
RMSNorm/QK-norm/LayerScale block stack as InternVideo2 but with num_frames=1,
returning
  * K intermediate layers, l2-normed, with per-frame CLS tokens averaged over
    time and patch tokens concatenated over time → (K, B, 1+T*HW, C)
  * the attention-pooled projection, frame-averaged and l2-normed → (B, Cclip)
  * the pooling attention over patches per frame → (B*T, HW)
    (drives attention-guided masking)

MAETeacher ≙ the VideoMAE-g14 hybrid (models/videomae.py VisionTransformer):
no cls token, 1-D sinusoid pos-embed added to tubelet tokens, LayerNorm
blocks (optional gamma LayerScale), the FINAL norm applied to the last
block's output before it is recorded; returns K intermediate patch-feature
layers stacked in ascending block order, l2-normed → (K, B, N, C).

Teachers are ordinary modules; freezing = jax.lax.stop_gradient at the loss
site plus exclusion from the optimizer param tree.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config


@dataclasses.dataclass(frozen=True)
class TeacherConfig:
    embed_dim: int = 3200
    depth: int = 48
    num_heads: int = 25
    mlp_ratio: float = 4.0
    patch_size: int = 14
    img_size: int = 224
    clip_embed_dim: int = 768
    return_layers: int = 6
    return_interval: float = 1.0
    norm_type: str = "rmsnorm"  # MAE teacher: "layernorm"
    qk_normalization: bool = True
    init_values: float = 0.1
    tubelet_size: int = 1
    dtype: str = "float32"
    param_dtype: str = "float32"
    attn_impl: str = "auto"

    @property
    def return_indices(self) -> tuple[int, ...]:
        return tuple(
            self.depth - int(i * self.return_interval) - 1
            for i in range(self.return_layers)
        )


class CLIPTeacher(nn.Module):
    config: TeacherConfig

    @nn.compact
    def __call__(self, video: jax.Array):
        """video: (B, T, H, W, 3) -> (z, pooled, attn) as documented above."""
        cfg = self.config
        b, t = video.shape[:2]
        frames = video.reshape((b * t, 1) + video.shape[2:])
        enc_cfg = InternVideo2Config(
            embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio, patch_size=cfg.patch_size,
            img_size=cfg.img_size, num_frames=1, tubelet_size=1,
            qk_normalization=cfg.qk_normalization,
            init_values=cfg.init_values,
            clip_embed_dim=cfg.clip_embed_dim, num_classes=0,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            attn_impl=cfg.attn_impl, norm_type=cfg.norm_type,
        )
        out = InternVideo2(enc_cfg, name="encoder")(
            frames,
            return_hidden_layers=sorted(set(cfg.return_indices)),
            return_pool_attn=True,
        )
        # ascending block order — the reference appends as the block loop
        # ascends (internvl_clip_vision.py:429-437), so z[0] is the earliest
        # returned layer; pairs index-wise with the student's decoders
        # hidden_states arrive in ascending block order (the encoder
        # appends at each requested layer) — stack directly
        z = jnp.stack(out.hidden_states)  # (K, BT, 1+HW, C)
        k, _, hw1, c = z.shape
        cls = z[:, :, :1].reshape(k, b, t, 1, c).mean(axis=2)
        patches = z[:, :, 1:].reshape(k, b, t * (hw1 - 1), c)
        z = jnp.concatenate([cls, patches], axis=2)  # (K, B, 1+T*HW, C)
        z = z / jnp.linalg.norm(
            z.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(z.dtype)

        pooled = out.pooled.reshape(b, t, -1).mean(axis=1)
        pooled = pooled / jnp.linalg.norm(
            pooled.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(pooled.dtype)

        attn = out.pool_attn[:, 1:]  # (B*T, HW) — drop attention onto cls
        return z, pooled, attn


def sinusoid_table_1d(n_position: int, dim: int) -> jnp.ndarray:
    """Classic 1-D transformer sinusoid table (videomae.py
    get_sinusoid_encoding_table): angle[p, j] = p / 10000^(2*(j//2)/dim),
    sin on even columns, cos on odd."""
    import numpy as np

    pos = np.arange(n_position)[:, None]
    j = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, 2 * (j // 2) / dim)
    table = np.zeros((n_position, dim), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table)


class MAETeacher(nn.Module):
    config: TeacherConfig

    @nn.compact
    def __call__(self, video: jax.Array):
        """video: (B, T, H, W, 3) -> (K, B, N, C) l2-normed patch features.

        Faithful to videomae.py VisionTransformer.forward:285-320: no cls
        token; frozen sinusoid pos table; the final `norm` is applied to the
        last block's output before recording; z stacks ascending.
        """
        from internvideo_tpu.nn.embeds import PatchEmbed3D
        from internvideo_tpu.nn.norms import LayerNorm
        from internvideo_tpu.nn.transformer import Block

        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        param_dtype = jnp.dtype(cfg.param_dtype)
        x = PatchEmbed3D(
            embed_dim=cfg.embed_dim, patch_size=cfg.patch_size,
            tubelet_size=cfg.tubelet_size, dtype=dtype,
            param_dtype=param_dtype, name="patch_embed",
        )(video)  # (B, T', L, C)
        x = x.reshape(x.shape[0], -1, cfg.embed_dim)  # (B, N, C)
        n = x.shape[1]
        pos = self.param(
            "pos_embed",
            lambda key, shape, dt: sinusoid_table_1d(*shape).astype(dt),
            (n, cfg.embed_dim),
            param_dtype,
        )
        x = x + jax.lax.stop_gradient(pos)[None].astype(dtype)

        want = sorted(set(cfg.return_indices))
        z = []
        for i in range(cfg.depth):
            x = Block(
                num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                qkv_bias=True, qk_normalization=False,
                init_values=cfg.init_values or None,
                norm_type="layernorm", dtype=dtype, param_dtype=param_dtype,
                attn_impl=cfg.attn_impl, name=f"blocks_{i}",
            )(x, True)
            if i == cfg.depth - 1:
                x = LayerNorm(dtype=dtype, name="norm")(x)
            if i in want:
                z.append(x)
        z = jnp.stack(z)  # (K, B, N, C) ascending block order
        z = z / jnp.linalg.norm(
            z.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(z.dtype)
        return z
