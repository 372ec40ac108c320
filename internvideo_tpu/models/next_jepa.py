"""InternVideo-Next stage-1: masked latent prediction + diffusion decoding.

Compact TPU-native counterpart of InternVideo-Next
(/root/reference/InternVideo-Next/models/InternVideo_next_s1.py +
diffloss.py + diffusion/gaussian_diffusion.py):

  * masked encoder (InternVideo2 skeleton) over visible tokens
  * CLIP-align decoders against a frozen (SigLIP-style) teacher — identical
    mechanics to the UMT pretrain branch
  * reconstruction branch: a small transformer decoder runs over the FULL
    token grid (mask tokens + pos embed at masked slots, encoder outputs at
    visible slots) and produces per-token conditioning z; a DDPM "DiffLoss"
    head (MLP-AdaLN denoiser, cosine schedule, epsilon prediction) scores
    the masked tokens' normalized patch pixels given z (diffloss.py:8-33)

Losses combine as clip_loss_ratio / reconstruction_ratio
(engines/engine_for_stage1.py:20-60).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from internvideo_tpu.data.masking import indices_to_mask
from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.nn.embeds import get_3d_sincos_pos_embed
from internvideo_tpu.nn.norms import LayerNorm
from internvideo_tpu.nn.transformer import Block


def cosine_alpha_bar(timesteps: int, s: float = 0.008) -> np.ndarray:
    t = np.linspace(0, timesteps, timesteps + 1)
    f = np.cos((t / timesteps + s) / (1 + s) * np.pi / 2) ** 2
    ab = f / f[0]
    return ab[1:]  # (T,)


class TimestepEmbed(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t):  # (N,) int
        half = self.dim // 2
        freqs = jnp.exp(
            -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
        )
        ang = t.astype(jnp.float32)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        emb = nn.Dense(self.dim, name="fc1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, name="fc2")(emb)


class MLPAdaLN(nn.Module):
    """SimpleMLPAdaLN denoiser (diffloss.py SimpleMLPAdaLN): residual MLP
    blocks whose LayerNorm scale/shift/gate come from (t, z) conditioning."""

    width: int
    depth: int
    out_dim: int

    @nn.compact
    def __call__(self, x, t, z):
        # x: (N, C) noisy target; t: (N,); z: (N, Z) conditioning
        h = nn.Dense(self.width, name="in_proj")(x)
        cond = TimestepEmbed(self.width, name="t_embed")(t)
        cond = cond + nn.Dense(self.width, name="z_proj")(z)
        for i in range(self.depth):
            mod = nn.Dense(3 * self.width, name=f"adaln_{i}")(nn.silu(cond))
            scale, shift, gate = jnp.split(mod, 3, axis=-1)
            u = LayerNorm(use_bias=False, name=f"ln_{i}")(h)
            u = u * (1 + scale) + shift
            u = nn.Dense(self.width, name=f"fc1_{i}")(u)
            u = nn.silu(u)
            u = nn.Dense(self.width, name=f"fc2_{i}")(u)
            h = h + gate * u
        h = LayerNorm(use_bias=False, name="ln_out")(h)
        return nn.Dense(self.out_dim, name="out_proj")(h)


class DiffusionLoss(nn.Module):
    """DDPM epsilon-prediction loss over per-token targets, z-conditioned."""

    target_dim: int
    z_dim: int
    width: int = 256
    depth: int = 3
    timesteps: int = 1000

    def setup(self):
        self.net = MLPAdaLN(self.width, self.depth, self.target_dim)
        self.alpha_bar = jnp.asarray(
            cosine_alpha_bar(self.timesteps), jnp.float32
        )

    def __call__(self, target, z, rng, mask=None):
        """target/z: (N, C)/(N, Z); mask: (N,) weight. Returns scalar."""
        n = target.shape[0]
        r_t, r_eps = jax.random.split(rng)
        t = jax.random.randint(r_t, (n,), 0, self.timesteps)
        eps = jax.random.normal(r_eps, target.shape)
        ab = self.alpha_bar[t][:, None]
        x_t = jnp.sqrt(ab) * target + jnp.sqrt(1 - ab) * eps
        pred = self.net(x_t, t, z)
        per_token = jnp.mean(jnp.square(pred - eps), axis=-1)
        if mask is not None:
            return jnp.sum(per_token * mask) / jnp.maximum(mask.sum(), 1)
        return jnp.mean(per_token)

    def sample(self, z, rng, steps: int = 50):
        """DDIM-style deterministic sampling of targets from conditioning."""
        n = z.shape[0]
        idx = jnp.linspace(self.timesteps - 1, 0, steps).astype(jnp.int32)
        x = jax.random.normal(rng, (n, self.target_dim))

        def body(x, i):
            t = idx[i]
            ab = self.alpha_bar[t]
            eps = self.net(x, jnp.full((n,), t), z)
            x0 = (x - jnp.sqrt(1 - ab) * eps) / jnp.sqrt(ab)
            ab_prev = jnp.where(
                i + 1 < steps, self.alpha_bar[idx[jnp.minimum(i + 1, steps - 1)]], 1.0
            )
            x = jnp.sqrt(ab_prev) * x0 + jnp.sqrt(1 - ab_prev) * eps
            return x, None

        x, _ = jax.lax.scan(body, x, jnp.arange(steps))
        return x


@dataclasses.dataclass(frozen=True)
class NextS1Config:
    encoder: InternVideo2Config = dataclasses.field(
        default_factory=InternVideo2Config
    )
    clip_output_dim: int = 1152  # SigLIP teacher hidden
    clip_final_output_dim: int = 1152
    clip_return_layers: int = 1
    decoder_depth: int = 2
    decoder_heads: int = 8
    diff_width: int = 256
    diff_depth: int = 3


@struct.dataclass
class NextS1Output:
    clip_middle: jax.Array
    clip_final: jax.Array
    reconstruction_loss: jax.Array


class InternVideoNextS1(nn.Module):
    config: NextS1Config

    @nn.compact
    def __call__(
        self,
        video: jax.Array,  # (B, T, H, W, 3)
        keep_indices: jax.Array,  # (B, n_vis)
        rng: jax.Array,
        *,
        deterministic: bool = True,
    ) -> NextS1Output:
        cfg = self.config
        enc_cfg = cfg.encoder
        dtype = jnp.dtype(enc_cfg.dtype)
        gt, gh, gw = enc_cfg.grid_size
        n = enc_cfg.num_patches
        b = video.shape[0]
        n_vis = keep_indices.shape[1]
        p, ts = enc_cfg.patch_size, enc_cfg.tubelet_size

        want = sorted(
            enc_cfg.depth - 1 - i for i in range(cfg.clip_return_layers)
        )
        out = InternVideo2(enc_cfg, name="encoder")(
            video, keep_indices=keep_indices,
            deterministic=deterministic, return_hidden_layers=want,
        )
        hidden = dict(zip(want, out.hidden_states))

        # --- CLIP-align branch (UMT mechanics) ---
        from internvideo_tpu.models.pretrain import _LinearDecoder

        clip_aligned = [
            _LinearDecoder(
                cfg.clip_output_dim, dtype=dtype, name=f"clip_decoder_{j}"
            )(hidden[idx])
            for j, idx in enumerate(sorted(want, reverse=True))
        ]
        clip_middle = jnp.stack(clip_aligned)
        clip_final = _LinearDecoder(
            cfg.clip_final_output_dim, dtype=dtype, name="final_clip_decoder"
        )(out.pooled)

        # --- reconstruction branch ---
        d = enc_cfg.embed_dim
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, d)
        )
        dec_pos = jnp.asarray(
            get_3d_sincos_pos_embed(d, gh, gt, cls_token=False)
        ).astype(dtype)
        # scatter encoder outputs (minus cls) back to their grid slots
        grid = jnp.broadcast_to(mask_token.astype(dtype), (b, n, d))
        grid = jax.vmap(lambda g, idx, val: g.at[idx].set(val))(
            grid, keep_indices, out.tokens[:, 1:]
        )
        grid = grid + dec_pos[None]
        for i in range(cfg.decoder_depth):
            grid = Block(
                num_heads=cfg.decoder_heads, mlp_ratio=4.0,
                dtype=dtype, name=f"decoder_block_{i}",
            )(grid, deterministic)
        z = LayerNorm(dtype=dtype, name="decoder_norm")(grid)  # (B, N, D)

        # targets: per-patch normalized pixels
        x = video.reshape(b, gt, ts, gh, p, gw, p, 3)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, n, -1)
        mu = x.mean(-1, keepdims=True)
        sd = x.std(-1, keepdims=True) + 1e-6
        target = (x - mu) / sd

        vis_mask = indices_to_mask(keep_indices, n)
        recon_weight = (~vis_mask).astype(jnp.float32).reshape(-1)
        loss = DiffusionLoss(
            target_dim=target.shape[-1], z_dim=d,
            width=cfg.diff_width, depth=cfg.diff_depth,
            name="diff_loss",
        )(
            target.reshape(b * n, -1).astype(jnp.float32),
            z.reshape(b * n, d).astype(jnp.float32),
            rng, mask=recon_weight,
        )
        return NextS1Output(
            clip_middle=clip_middle,
            clip_final=clip_final,
            reconstruction_loss=loss,
        )
