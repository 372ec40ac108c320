"""UniFormerV2 — InternVideo1's supervised video backbone.

Faithful port of InternVideo1/Pretrain/UniFormerV2/slowfast/models/
uniformerv2_model.py (cited per piece): a frozen-CLIP-style ViT whose
blocks gain Local MHRA temporal convolutions, aggregated by a global
cross-attention Extractor head over multiple layers.

  * Conv3d patch embed with optional 2x temporal downsample (:296-301)
  * per-frame spatial ViT blocks with QuickGELU MLPs; Local MHRA before
    attention (and optionally after): BN3d -> 1x1x1 reduce -> depthwise
    temporal conv -> 1x1x1 expand (zero-init) residual (:40-59,:100-121)
  * per return-layer: depthwise-3D conv dynamic position encoding added
    to patch tokens, then an Extractor (cross-attn: temporal cls query
    over all T*L tokens + MLP) updates the class token (:131-183,:252-270)
  * head: sigmoid-balance blend of the Extractor cls token with the
    time-averaged backbone cls, LayerNorm+Dropout+Linear (:236-241,:272-277)

BatchNorm runs with stored running statistics (the released checkpoints'
eval semantics); they convert as plain parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from internvideo_tpu.nn.norms import LayerNorm


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@dataclasses.dataclass(frozen=True)
class UniFormerV2Config:
    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    t_size: int = 8  # input frames (halved internally if downsampled)
    kernel_size: int = 3
    temporal_downsample: bool = True
    dw_reduction: float = 1.5
    no_lmhra: bool = False
    double_lmhra: bool = True
    return_list: tuple = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
    n_dim: int = 768  # global-block width (== width for released models)
    n_head: int = 12
    mlp_factor: float = 4.0
    num_classes: int = 400
    frozen: bool = False
    dtype: str = "float32"
    param_dtype: str = "float32"


class _BN3d(nn.Module):
    """BatchNorm with running statistics as parameters (eval semantics)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (..., C)
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (f,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (f,), jnp.float32)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(self.dtype)


class LocalMHRA(nn.Module):
    """BN -> 1x1x1 reduce -> depthwise temporal conv -> 1x1x1 expand
    (uniformerv2_model.py:40-59). Operates on (B, T, H, W, C)."""

    d_model: int
    dw_reduction: float = 1.5
    pos_kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        rd = int(self.d_model // self.dw_reduction)
        pad = self.pos_kernel_size // 2
        h = _BN3d(self.d_model, dtype=self.dtype, name="bn")(x)
        conv = lambda f, k, p, g, name: nn.Conv(
            f, k, padding=p, feature_group_count=g, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        h = conv(rd, (1, 1, 1), ((0, 0), (0, 0), (0, 0)), 1, "reduce")(h)
        h = conv(rd, (self.pos_kernel_size, 1, 1),
                 ((pad, pad), (0, 0), (0, 0)), rd, "dw")(h)
        # expand conv is zero-initialized in the reference (:54-56)
        h = nn.Conv(
            self.d_model, (1, 1, 1), padding=((0, 0), (0, 0), (0, 0)),
            dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros, name="expand",
        )(h)
        return h


class _CLIPAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (packed in_proj)."""

    d_model: int
    n_head: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in):
        d, h = self.d_model, self.n_head
        hd = d // h
        # packed projection like torch MultiheadAttention's in_proj:
        # output columns [0:d) = q, [d:2d) = k, [2d:3d) = v
        qkv = nn.Dense(3 * d, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="in_proj")
        q = qkv(q_in)[..., :d]
        packed = qkv(kv_in)
        k, v = packed[..., d:2 * d], packed[..., 2 * d:]
        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, h, hd)
        k = k.reshape(b, lk, h, hd)
        v = v.reshape(b, lk, h, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).reshape(b, lq, d)
        return nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    """CLIP block + Local MHRA (uniformerv2_model.py:62-128).
    x: (B*T, 1+L, C) per-frame tokens; lmhra reshapes patch tokens to
    (B, T, H, W, C)."""

    cfg: UniFormerV2Config

    @nn.compact
    def __call__(self, x, t: int):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        bt, l1, c = x.shape
        b = bt // t
        hw = l1 - 1
        side = int(round(hw ** 0.5))

        def lmhra(tokens, name):
            grid = tokens.reshape(b, t, side, side, c)
            out = LocalMHRA(
                c, cfg.dw_reduction, dtype=dt,
                param_dtype=jnp.dtype(cfg.param_dtype), name=name,
            )(grid)
            return tokens + out.reshape(bt, hw, c)

        if not cfg.no_lmhra:
            x = jnp.concatenate(
                [x[:, :1], lmhra(x[:, 1:], "lmhra1")], axis=1
            )
        attn = _CLIPAttention(
            c, cfg.heads, dtype=dt, param_dtype=jnp.dtype(cfg.param_dtype),
            name="attn",
        )
        xn = LayerNorm(eps=1e-5, dtype=dt, name="ln_1")(x)
        x = x + attn(xn, xn)
        if not cfg.no_lmhra and cfg.double_lmhra:
            x = jnp.concatenate(
                [x[:, :1], lmhra(x[:, 1:], "lmhra2")], axis=1
            )
        h = LayerNorm(eps=1e-5, dtype=dt, name="ln_2")(x)
        h = nn.Dense(4 * c, dtype=dt,
                     param_dtype=jnp.dtype(cfg.param_dtype), name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(c, dtype=dt, param_dtype=jnp.dtype(cfg.param_dtype),
                     name="c_proj")(h)
        return x + h


class Extractor(nn.Module):
    """Cross-attention cls aggregator (uniformerv2_model.py:131-183)."""

    cfg: UniFormerV2Config

    @nn.compact
    def __call__(self, cls_tok, y):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        d = cfg.n_dim
        attn = _CLIPAttention(
            d, cfg.n_head, dtype=dt,
            param_dtype=jnp.dtype(cfg.param_dtype), name="attn",
        )
        q = LayerNorm(eps=1e-5, dtype=dt, name="ln_1")(cls_tok)
        kv = LayerNorm(eps=1e-5, dtype=dt, name="ln_3")(y)
        cls_tok = cls_tok + attn(q, kv)
        h = LayerNorm(eps=1e-5, dtype=dt, name="ln_2")(cls_tok)
        d_mlp = round(cfg.mlp_factor * d)
        h = nn.Dense(d_mlp, dtype=dt,
                     param_dtype=jnp.dtype(cfg.param_dtype), name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(d, dtype=dt, param_dtype=jnp.dtype(cfg.param_dtype),
                     name="c_proj")(h)
        return cls_tok + h


class UniFormerV2(nn.Module):
    cfg: UniFormerV2Config

    @nn.compact
    def __call__(self, video: jax.Array):  # (B, T, H, W, 3)
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        pdt = jnp.dtype(cfg.param_dtype)
        b = video.shape[0]
        k = cfg.kernel_size
        pad = (k - 1) // 2
        t_stride = 2 if cfg.temporal_downsample else 1
        x = nn.Conv(
            cfg.width,
            (k if cfg.temporal_downsample else 1, cfg.patch_size,
             cfg.patch_size),
            strides=(t_stride, cfg.patch_size, cfg.patch_size),
            padding=((pad, pad) if cfg.temporal_downsample else (0, 0),
                     (0, 0), (0, 0)),
            use_bias=False, dtype=dt, param_dtype=pdt, name="conv1",
        )(video.astype(dt))
        _, t, gh, gw, c = x.shape
        x = x.reshape(b * t, gh * gw, c)

        cls = self.param(
            "class_embedding", nn.initializers.normal(cfg.width ** -0.5),
            (cfg.width,), pdt,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (b * t, 1, c)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(cfg.width ** -0.5),
            ((cfg.input_resolution // cfg.patch_size) ** 2 + 1, cfg.width),
            pdt,
        )
        x = x + pos.astype(dt)[None]
        x = LayerNorm(eps=1e-5, dtype=dt, name="ln_pre")(x)

        cls_tok = jnp.broadcast_to(
            self.param(
                "temporal_cls_token", nn.initializers.zeros,
                (1, 1, cfg.n_dim), pdt,
            ).astype(dt),
            (b, 1, cfg.n_dim),
        )
        hw = gh * gw
        j = -1
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg, name=f"resblocks_{i}")(x, t)
            if i in cfg.return_list:
                j += 1
                # dpe on patch tokens in (B, T, H, W, C)
                grid = x[:, 1:].reshape(b, t, gh, gw, c)
                dpe = nn.Conv(
                    c, (3, 3, 3), padding=((1, 1), (1, 1), (1, 1)),
                    feature_group_count=c, dtype=dt, param_dtype=pdt,
                    name=f"dpe_{j}",
                )(grid)
                feats = jnp.concatenate(
                    [x[:, :1].reshape(b, t, 1, c),
                     (grid + dpe).reshape(b, t, hw, c)], axis=2,
                ).reshape(b, t * (hw + 1), c)
                cls_tok = Extractor(cfg, name=f"dec_{j}")(cls_tok, feats)

        cls_out = cls_tok[:, 0]
        if not cfg.frozen:
            balance = self.param(
                "balance", nn.initializers.zeros, (cfg.n_dim,), pdt
            ).astype(jnp.float32)
            w = jax.nn.sigmoid(balance)
            # time-averaged backbone cls token (:275-277)
            residual = x[:, 0].reshape(b, t, c).mean(axis=1)
            cls_out = ((1 - w) * cls_out.astype(jnp.float32)
                       + w * residual.astype(jnp.float32)).astype(dt)
        h = LayerNorm(eps=1e-5, dtype=dt, name="proj_norm")(cls_out)
        return nn.Dense(
            cfg.num_classes, dtype=dt, param_dtype=pdt, name="proj"
        )(h)
