"""InternVideo2 video encoder family (S/B/L/1B/6B).

Architecture parity with the reference encoder
(InternVideo2/single_modality/models/internvideo2.py:337-601):

  Conv3D-tubelet patchify (here: reshape+GEMM) → CLS token → 3D sin-cos (or
  separable) pos embed → `depth` pre-norm RMSNorm blocks with whole-dim
  QK-norm, LayerScale(1e-5, fp32) and linearly-ramped DropPath → mean-query
  attention-pooling projector to `clip_embed_dim` → LayerNorm → linear head.

Size registry matches internvideo2.py:546-601:

  | size | embed | depth | heads | mlp_ratio |
  | S    | 384   | 12    | 6     | 4         |
  | B    | 768   | 12    | 12    | 4         |
  | L    | 1024  | 24    | 16    | 4         |
  | 1B   | 1408  | 40    | 16    | 48/11     |
  | 6B   | 3200  | 48    | 25    | 4         |

Extras the pretrain/distill variants need and the base class exposes:
  * `return_features=True` gives per-layer hidden states + pooled embedding
  * masked forward: a boolean keep-mask gathers a *static* number of visible
    tokens before the blocks (UMT masked pretraining; see models/pretrain.py).
    The reference does dynamic `x[~mask]` (internvideo2_pretrain.py:659) —
    hostile to XLA, so we require a fixed visible count and use a gather.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from internvideo_tpu.nn.embeds import PatchEmbed3D, get_3d_sincos_pos_embed
from internvideo_tpu.nn.norms import LayerNorm
from internvideo_tpu.nn.transformer import AttentionPoolingBlock, Block


def _remat_policy(name):
    """Map a config string to a jax.checkpoint policy (see PERF.md)."""
    if name is None:
        return None
    cp = jax.checkpoint_policies
    if name == "save_attn":
        return cp.save_only_these_names("attn_out")
    if name == "save_attn_mlp":
        return cp.save_only_these_names("attn_out", "mlp_hidden")
    if name == "offload_mlp":
        return cp.save_and_offload_only_these_names(
            names_which_can_be_saved=["attn_out"],
            names_which_can_be_offloaded=["mlp_hidden"],
            offload_src="device", offload_dst="pinned_host",
        )
    if name == "dots":
        return cp.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy {name!r}")


@dataclasses.dataclass(frozen=True)
class InternVideo2Config:
    embed_dim: int = 1408
    depth: int = 40
    num_heads: int = 16
    mlp_ratio: float = 48 / 11
    patch_size: int = 14
    img_size: int = 224
    num_frames: int = 8
    tubelet_size: int = 1
    qkv_bias: bool = False
    qk_normalization: bool = True
    init_values: float = 1e-5
    drop_path_rate: float = 0.0
    attn_pool_num_heads: int = 16
    clip_embed_dim: int = 768
    num_classes: int = 0  # 0 = no classifier head
    dtype: str = "float32"
    param_dtype: str = "float32"
    attn_impl: str = "auto"
    norm_type: str = "rmsnorm"  # "layernorm" for VideoMAE-style backbones
    norm_eps: Optional[float] = None  # layernorm eps (CLIP lineage: 1e-5)
    # CLIP-lineage towers (ViCLIP vision, viclip_vision.py:123) norm the
    # token stream once before the blocks
    ln_pre: bool = False
    # "attn" = learned attention pooling (InternVideo2's clip_projector);
    # "cls_proj" = ln_post -> cls token -> matmul projection (CLIP/ViCLIP,
    # viclip_vision.py:192-195)
    pool_type: str = "attn"
    # "gelu_tanh" = the tanh approximation the reference trains/serves with
    # when use_fused_mlp=True (flash-attn FusedMLP); "gelu" = exact erf
    mlp_act: str = "gelu"
    remat: bool = False  # jax.checkpoint each block (memory/flops trade)
    # selective-remat policy (with remat=True): None = save nothing (full
    # replay); "save_attn" keeps attention outputs; "save_attn_mlp" also
    # keeps the post-gelu MLP activation (skips attention + fc1 + gelu in
    # the bwd replay); "offload_mlp" saves attn on-device and offloads the
    # MLP activation to host memory; "dots" = XLA's
    # dots_with_no_batch_dims_saveable. Measured trade-offs in PERF.md.
    remat_policy: Optional[str] = None
    # "int8" = Int8Dense serving projections in every block (weights live
    # as int8 + scales; load via ops.quant.quantize_params_like) — eval/
    # serving only; measured 1.54x GEMM throughput (PERF.md)
    quant: Optional[str] = None

    @property
    def grid_size(self) -> tuple[int, int, int]:
        return (
            self.num_frames // self.tubelet_size,
            self.img_size // self.patch_size,
            self.img_size // self.patch_size,
        )

    @property
    def num_patches(self) -> int:
        t, h, w = self.grid_size
        return t * h * w


INTERNVIDEO2_SIZES: dict[str, dict] = {
    "S": dict(embed_dim=384, depth=12, num_heads=6, mlp_ratio=4.0),
    "B": dict(embed_dim=768, depth=12, num_heads=12, mlp_ratio=4.0),
    "L": dict(embed_dim=1024, depth=24, num_heads=16, mlp_ratio=4.0),
    "1B": dict(embed_dim=1408, depth=40, num_heads=16, mlp_ratio=48 / 11),
    "6B": dict(embed_dim=3200, depth=48, num_heads=25, mlp_ratio=4.0),
}


def make_config(size: str, **overrides) -> InternVideo2Config:
    return InternVideo2Config(**{**INTERNVIDEO2_SIZES[size], **overrides})


@struct.dataclass
class EncoderOutput:
    pooled: jax.Array  # (B, clip_embed_dim) attention-pooled embedding
    logits: Optional[jax.Array]  # (B, num_classes) if a head is configured
    tokens: jax.Array  # (B, 1+N, D) final-layer hidden states
    hidden_states: Optional[tuple]  # per-layer (B, 1+N, D) when requested
    pool_attn: Optional[jax.Array] = None  # (B, 1+N) pooling attention


class InternVideo2(nn.Module):
    config: InternVideo2Config

    @nn.compact
    def __call__(
        self,
        video: jax.Array,  # (B, T, H, W, 3) channels-last
        *,
        keep_indices: Optional[jax.Array] = None,  # (B, n_vis) into [0, N)
        deterministic: bool = True,
        return_hidden_states: bool = False,
        return_hidden_layers: Optional[Sequence[int]] = None,
        return_pool_attn: bool = False,
    ) -> EncoderOutput:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        param_dtype = jnp.dtype(cfg.param_dtype)

        x = PatchEmbed3D(
            embed_dim=cfg.embed_dim,
            patch_size=cfg.patch_size,
            tubelet_size=cfg.tubelet_size,
            dtype=dtype,
            param_dtype=param_dtype,
            name="patch_embed",
        )(video)  # (B, T', L, D)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.embed_dim)

        cls_token = self.param(
            "cls_token",
            nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), (None, None, "embed")
            ),
            (1, 1, cfg.embed_dim),
            param_dtype,
        )

        gt, gh, gw = cfg.grid_size
        # Learnable pos embed initialized from the 3D sincos recipe — the
        # reference keeps it as a Parameter (internvideo2.py:400,444-465), so
        # finetuned checkpoints may carry drifted values.
        pos = self.param(
            "pos_embed",
            nn.with_logical_partitioning(
                lambda key, shape, dt: jnp.asarray(
                    get_3d_sincos_pos_embed(cfg.embed_dim, gh, gt, cls_token=True),
                    dt,
                ),
                (None, "embed"),
            ),
            (1 + cfg.num_patches, cfg.embed_dim),
            param_dtype,
        )
        x = x + pos[1:].astype(dtype)

        if keep_indices is not None:
            # UMT masked forward: gather a static count of visible tokens.
            x = jnp.take_along_axis(x, keep_indices[..., None], axis=1)

        cls = jnp.broadcast_to(
            cls_token.astype(dtype) + pos[:1].astype(dtype),
            (b, 1, cfg.embed_dim),
        )
        x = jnp.concatenate([cls, x], axis=1)

        if cfg.ln_pre:
            x = LayerNorm(
                eps=cfg.norm_eps or 1e-5, dtype=dtype, name="ln_pre"
            )(x)

        dp_rates = [
            cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
            for i in range(cfg.depth)
        ]
        hidden = []
        block_cls = Block
        if cfg.remat:
            block_cls = nn.remat(
                Block, static_argnums=(2,),
                policy=_remat_policy(cfg.remat_policy),
            )
        for i in range(cfg.depth):
            x = block_cls(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                qk_normalization=cfg.qk_normalization,
                init_values=cfg.init_values,
                drop_path=dp_rates[i],
                dtype=dtype,
                param_dtype=param_dtype,
                attn_impl=cfg.attn_impl,
                norm_type=cfg.norm_type,
                norm_eps=cfg.norm_eps,
                mlp_act=cfg.mlp_act,
                quant=cfg.quant,
                name=f"blocks_{i}",
            )(x, deterministic)
            if return_hidden_states or (
                return_hidden_layers and i in return_hidden_layers
            ):
                hidden.append(x)

        pool_attn = None
        if cfg.pool_type == "cls_proj" and return_pool_attn:
            raise ValueError(
                "return_pool_attn requires the attention-pooled head "
                "(pool_type='attn'); cls_proj towers have no pooling "
                "attention map for attention-guided masking"
            )
        if cfg.pool_type == "cls_proj":
            # CLIP/ViCLIP head: ln_post on the cls token, then a bias-free
            # matmul projection (viclip_vision.py:192-195). LayerNorm is
            # per-token, so norming the slice equals slicing the norm.
            h = LayerNorm(
                eps=cfg.norm_eps or 1e-5, dtype=dtype, name="ln_post"
            )(x[:, 0])
            proj = self.param(
                "proj",
                nn.with_logical_partitioning(
                    nn.initializers.normal(cfg.embed_dim ** -0.5),
                    ("embed", "mlp"),
                ),
                (cfg.embed_dim, cfg.clip_embed_dim),
                param_dtype,
            )
            pooled = h @ proj.astype(dtype)
        else:
            pooled = AttentionPoolingBlock(
                num_heads=cfg.attn_pool_num_heads,
                out_dim=cfg.clip_embed_dim,
                dtype=dtype,
                param_dtype=param_dtype,
                attn_impl="xla",  # single-query attn: XLA beats a flash pass
                name="clip_projector",
            )(x, return_attn=return_pool_attn)
            if return_pool_attn:
                pooled, pool_attn = pooled

        logits = None
        if cfg.num_classes:
            h = LayerNorm(eps=1e-5, dtype=dtype, name="fc_norm")(pooled)
            logits = nn.Dense(
                cfg.num_classes,
                dtype=dtype,
                param_dtype=param_dtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02 * 0.001),
                    ("embed", "vocab"),
                ),
                name="head",
            )(h)

        return EncoderOutput(
            pooled=pooled,
            logits=logits,
            tokens=x,
            hidden_states=tuple(hidden) if hidden else None,
            pool_attn=pool_attn,
        )
