"""InternVideo-Next stage-2: masked self-distillation with a mask-token
decoder (InternVideo-Next/models/InternVideo_next_s2.py:514-960 +
engines/engine_for_stage2.py:23-120).

Stage-2 trains a student against a FROZEN stage-1 model used as an
`embed_only` teacher: per clip, two mask views are drawn; for each view the
student encodes only the visible tokens, rebuilds the full token grid
(mask tokens at masked slots + a dedicated "diff" pos-embed, encoder
outputs at visible slots — forward_reconstruction_loss:745-777), runs a
small full-attention BERT-style decoder, and predicts the teacher's patch
features at the MASKED positions (l2-normed, 2−2cos); a global head aligns
with the teacher's pooled projection.

TPU restructurings (vs the CUDA reference):
  * dynamic masking's argsort/scatter (dynamic_masking:813-853) becomes a
    fixed-count top-k over the temporal-difference importance, returning
    static-shape keep/pred index tensors
  * boolean-mask gathers become take_along_axis over those indices
  * one cls token (this framework's encoder standard) instead of
    cls_token_num=4 registers
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
from internvideo_tpu.nn.transformer import Block


def dynamic_keep_indices(
    patch_embeds: jax.Array,  # (B, T, L, C) tubelet embeddings
    mask_ratio: float,
) -> tuple[jax.Array, jax.Array]:
    """Temporal-difference importance masking (dynamic_masking:813-853):
    tokens whose features change most between adjacent frames stay visible.
    Returns (keep_indices (B, n_vis), pred_indices (B, n_masked)), both
    sorted — static shapes via top-k instead of argsort/scatter."""
    b, t, l, _ = patch_embeds.shape
    n = t * l
    if t == 1:
        raise ValueError("dynamic masking needs T > 1 (reference falls "
                         "back to random masking for images)")
    d = jnp.linalg.norm(
        patch_embeds[:, 1:] - patch_embeds[:, :-1], axis=-1
    )  # (B, T-1, L)
    imp = jnp.concatenate([d[:, :1], d], axis=1).reshape(b, n)
    n_vis = int(round((1.0 - mask_ratio) * n))
    _, keep = jax.lax.top_k(imp, n_vis)
    keep = jnp.sort(keep, axis=-1)
    _, order = jax.lax.top_k(-imp, n)  # ascending importance
    pred = jnp.sort(order[:, : n - n_vis], axis=-1)
    return keep.astype(jnp.int32), pred.astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class NextS2Config:
    encoder: InternVideo2Config = dataclasses.field(
        default_factory=lambda: InternVideo2Config(num_classes=0)
    )
    decoder_dim: int = 384  # bert_decoder width (to_bert_proj target)
    decoder_depth: int = 4
    decoder_heads: int = 6
    selfdist_dim: int = 768  # teacher patch-feature dim
    align_dim: int = 768  # teacher pooled-projection dim


@struct.dataclass
class NextS2Output:
    pred: jax.Array  # (B, n_masked, selfdist_dim) l2-normed predictions
    align: jax.Array  # (B, align_dim) l2-normed pooled alignment
    tokens: jax.Array  # encoder visible tokens (cls + vis)


class InternVideoNextS2(nn.Module):
    config: NextS2Config

    @nn.compact
    def __call__(
        self,
        video: jax.Array,  # (B, T, H, W, 3)
        keep_indices: jax.Array,  # (B, n_vis)
        pred_indices: jax.Array,  # (B, n_masked) positions to predict
        *,
        deterministic: bool = True,
    ) -> NextS2Output:
        cfg = self.config
        enc = cfg.encoder
        dtype = jnp.dtype(enc.dtype)
        n = enc.num_patches
        gt, gh, gw = enc.grid_size
        b = video.shape[0]

        out = InternVideo2(enc, name="encoder")(
            video, keep_indices=keep_indices, deterministic=deterministic
        )

        # full grid: mask tokens everywhere, encoder outputs at visible slots
        # (forward_reconstruction_loss:745-760, bert_mask_token fill)
        mask_token = self.param(
            "bert_mask_token", nn.initializers.normal(0.02),
            (1, 1, enc.embed_dim),
        )
        grid = jnp.broadcast_to(
            mask_token.astype(dtype), (b, n, enc.embed_dim)
        )
        grid = jax.vmap(lambda g, idx, val: g.at[idx].set(val))(
            grid, keep_indices, out.tokens[:, 1:]
        )
        diff_pos = self.param(
            "diff_pos_embed",
            nn.with_logical_partitioning(
                lambda key, shape, dt: jnp.asarray(
                    get_3d_sincos_pos_embed(shape[-1], gh, gt, cls_token=True),
                    dt,
                ),
                (None, "embed"),
            ),
            (1 + n, enc.embed_dim),
            jnp.dtype(enc.param_dtype),
        )
        grid = grid + diff_pos[None, 1:].astype(dtype)
        h = jnp.concatenate(
            [out.tokens[:, :1] + diff_pos[None, :1].astype(dtype), grid],
            axis=1,
        )
        h = nn.Dense(
            cfg.decoder_dim, dtype=dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", "mlp")
            ),
            name="to_bert_proj",
        )(h)
        for i in range(cfg.decoder_depth):
            h = Block(
                num_heads=cfg.decoder_heads, mlp_ratio=4.0,
                qkv_bias=True, qk_normalization=False, init_values=None,
                norm_type="layernorm", dtype=dtype,
                attn_impl=enc.attn_impl, name=f"bert_decoder_{i}",
            )(h, deterministic)
        h = LayerNorm(dtype=dtype, name="bert_decoder_norm")(h)

        # selfdist decoder MLP over patch slots, predictions at masked slots
        p = nn.Dense(
            cfg.decoder_dim, dtype=dtype, name="selfdist_fc1"
        )(h[:, 1:])
        p = nn.gelu(p, approximate=False)
        p = nn.Dense(cfg.selfdist_dim, dtype=dtype, name="selfdist_fc2")(p)
        pred = jnp.take_along_axis(p, pred_indices[..., None], axis=1)
        pred = pred / jnp.linalg.norm(
            pred.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(dtype)

        align = nn.Dense(
            cfg.align_dim, dtype=dtype, name="selfdist_proj_clip"
        )(out.pooled)
        align = align / jnp.linalg.norm(
            align.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(dtype)
        return NextS2Output(pred=pred, align=align, tokens=out.tokens)
