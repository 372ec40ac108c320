"""Faithful BEATs audio encoder (multi_modality/models/backbones/beats/).

Structure mirrors the reference exactly so released BEATs checkpoints load
through `models/convert.py:convert_beats` (citations per piece):

  * Conv2d 16x16/16 spectrogram patch embed, no bias (BEATs.py:94),
    LayerNorm(512) then post_extract_proj 512 -> 768 (BEATs.py:87,152-157)
  * weight-normed grouped Conv1d positional embedding (k=128, groups=16)
    with SamePad trim + GELU, added residually (backbone.py:205-219,291-296)
  * post-norm ("deep_norm") transformer layers with T5-style bucketed
    relative position bias (320 buckets / 800 max distance, shared
    embedding across layers — backbone.py:252-256) gated per query by the
    GRU-gate (gru_rel_pos, backbone.py:826-834), residuals scaled by
    deep_norm_alpha = (2L)^(1/4) (backbone.py:387-389,441-455)

The softmax-stability dance in the reference ((s - max)*alpha with
alpha=32, backbone.py:691-692,800-801) is a row-constant shift + common
scale that cancels inside softmax; we compute softmax(s + gated_bias)
directly in f32.

The pragmatic simplified tower (`models/audio.py:AudioEncoder`) remains
for from-scratch AV experiments; this module is the checkpoint-faithful
one.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BEATsConfig:
    # BEATs_iter3 release configuration (BEATs.py:31-74 defaults + released
    # checkpoint cfg: deep_norm, gru_rel_pos, rel-pos embedding on)
    input_patch_size: int = 16
    embed_dim: int = 512
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_layers: int = 12
    encoder_attention_heads: int = 12
    conv_pos: int = 128
    conv_pos_groups: int = 16
    num_buckets: int = 320
    max_distance: int = 800
    dtype: str = "float32"
    param_dtype: str = "float32"


def _relative_position_bucket(rel, num_buckets, max_distance):
    """Bidirectional T5 bucketing (backbone.py:570-595)."""
    nb = num_buckets // 2
    out = jnp.where(rel > 0, nb, 0)
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return out + jnp.where(is_small, rel, large)


class BEATsSelfAttention(nn.Module):
    cfg: BEATsConfig
    # only layer 0 owns the relative_attention_bias embedding; later layers
    # receive the computed bias (backbone.py:252-256)
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, pos_bias=None):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        pdt = jnp.dtype(cfg.param_dtype)
        b, s, d = x.shape
        h = cfg.encoder_attention_heads
        hd = d // h

        dense = lambda name: nn.Dense(d, use_bias=True, dtype=dt,
                                      param_dtype=pdt, name=name)
        q = dense("q_proj")(x).reshape(b, s, h, hd)
        k = dense("k_proj")(x).reshape(b, s, h, hd)
        v = dense("v_proj")(x).reshape(b, s, h, hd)

        if self.has_rel_bias and pos_bias is None:
            table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(0.02), (cfg.num_buckets, h), pdt,
            )
            pos = jnp.arange(s)
            buckets = _relative_position_bucket(
                pos[None, :] - pos[:, None], cfg.num_buckets,
                cfg.max_distance,
            )  # (S, S)
            pos_bias = jnp.transpose(table[buckets], (2, 0, 1))  # (H, S, S)

        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)

        if pos_bias is not None:
            # GRU gate on the bias, computed from the raw query
            # (backbone.py:826-834): per (batch, head, position) scalar.
            grep = nn.Dense(8, dtype=dt, param_dtype=pdt, name="grep_linear")
            grep_a = self.param(
                "grep_a", nn.initializers.ones, (1, h, 1, 1), pdt
            )
            g = grep(q).reshape(b, s, h, 2, 4).sum(-1)  # (B, S, H, 2)
            g = jax.nn.sigmoid(g.astype(jnp.float32))
            gate_a = g[..., 0].transpose(0, 2, 1)[..., None]  # (B, H, S, 1)
            gate_b = g[..., 1].transpose(0, 2, 1)[..., None]
            gate = gate_a * (gate_b * grep_a.astype(jnp.float32) - 1.0) + 2.0
            scores = scores + gate * pos_bias.astype(jnp.float32)[None]

        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(dt), v,
            preferred_element_type=jnp.float32,
        ).astype(dt).reshape(b, s, d)
        return dense("out_proj")(out), pos_bias


class BEATsLayer(nn.Module):
    """Post-norm deep-norm layer (backbone.py:426-455)."""

    cfg: BEATsConfig
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, pos_bias=None):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        pdt = jnp.dtype(cfg.param_dtype)
        alpha = (2 * cfg.encoder_layers) ** 0.25  # deep_norm_alpha

        attn_out, pos_bias = BEATsSelfAttention(
            cfg, has_rel_bias=self.has_rel_bias, name="self_attn"
        )(x, pos_bias)
        x = nn.LayerNorm(dtype=dt, param_dtype=pdt,
                         name="self_attn_layer_norm")(x * alpha + attn_out)

        h = nn.Dense(cfg.encoder_ffn_embed_dim, dtype=dt, param_dtype=pdt,
                     name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.encoder_embed_dim, dtype=dt, param_dtype=pdt,
                     name="fc2")(h)
        x = nn.LayerNorm(dtype=dt, param_dtype=pdt,
                         name="final_layer_norm")(x * alpha + h)
        return x, pos_bias


class BEATsEncoder(nn.Module):
    """fbank (B, frames, n_mels) -> (tokens (B, N, 768), pooled (B, 768))."""

    cfg: BEATsConfig

    @nn.compact
    def __call__(self, fbank: jax.Array):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        pdt = jnp.dtype(cfg.param_dtype)
        p = cfg.input_patch_size
        b, frames, mels = fbank.shape

        # Conv2d(1, 512, 16, 16, bias=False) over (B, F, M, 1); row-major
        # flatten (time-major, then mel) matches the torch reshape
        # (BEATs.py:146-150: (B, C, F/16, M/16) -> (B, C, N) -> (B, N, C)).
        x = nn.Conv(
            cfg.embed_dim, (p, p), strides=(p, p), use_bias=False,
            dtype=dt, param_dtype=pdt, name="patch_embedding",
        )(fbank[..., None].astype(dt))
        x = x.reshape(b, -1, cfg.embed_dim)
        x = nn.LayerNorm(dtype=dt, param_dtype=pdt, name="layer_norm")(x)
        x = nn.Dense(cfg.encoder_embed_dim, dtype=dt, param_dtype=pdt,
                     name="post_extract_proj")(x)

        # grouped conv positional embedding + SamePad trim + GELU
        # (backbone.py:205-219; weight norm is folded at convert time)
        pc = nn.Conv(
            cfg.encoder_embed_dim, (cfg.conv_pos,),
            padding=[(cfg.conv_pos // 2, cfg.conv_pos // 2)],
            feature_group_count=cfg.conv_pos_groups,
            dtype=dt, param_dtype=pdt, name="pos_conv",
        )(x)
        if cfg.conv_pos % 2 == 0:
            pc = pc[:, :-1]
        x = x + nn.gelu(pc, approximate=False)
        x = nn.LayerNorm(dtype=dt, param_dtype=pdt,
                         name="encoder_layer_norm")(x)

        pos_bias = None
        for i in range(cfg.encoder_layers):
            x, pos_bias = BEATsLayer(
                cfg, has_rel_bias=(i == 0), name=f"layers_{i}"
            )(x, pos_bias)
        return x, x.mean(axis=1)


# ---------------------------------------------------------------------------
# Acoustic tokenizer (the audio-pretraining side of BEATs)
# ---------------------------------------------------------------------------


def _l2norm(t: jax.Array) -> jax.Array:
    """F.normalize(p=2, dim=-1) semantics: x / max(||x||, 1e-12)."""
    n = jnp.sqrt(jnp.sum(jnp.square(t), axis=-1, keepdims=True))
    return t / jnp.maximum(n, 1e-12)


def _kmeans_cosine(samples, k: int, iters: int, key):
    """Cosine-similarity k-means (quantizer.py:40-67), matmul-binned:
    bucket counts and centroid sums are one-hot matmuls (MXU) instead of
    scatter_add. Returns (means, final bucket counts)."""
    n = samples.shape[0]
    if n >= k:
        idx = jax.random.permutation(key, n)[:k]
    else:
        idx = jax.random.randint(key, (k,), 0, n)
    means = samples[idx]

    def body(_, means):
        buckets = jnp.argmax(samples @ means.T, axis=1)
        onehot = jax.nn.one_hot(buckets, k, dtype=samples.dtype)
        bins = onehot.sum(axis=0)
        new = _l2norm((onehot.T @ samples) / jnp.maximum(bins, 1.0)[:, None])
        return jnp.where((bins == 0)[:, None], means, new)

    means = jax.lax.fori_loop(0, iters, body, means)
    bins = jax.nn.one_hot(
        jnp.argmax(samples @ means.T, axis=1), k, dtype=samples.dtype
    ).sum(axis=0)
    return means, bins


class NormEMAVectorQuantizer(nn.Module):
    """Cosine EMA codebook VQ (quantizer.py:131-215), TPU-native.

    Codebook state (weight / cluster_size / initted) lives in the mutable
    "quantizer" collection: training applies must pass
    mutable=["quantizer"] (and an rng "quantizer" for the k-means init on
    the first batch) and thread the returned state — the functional form
    of the reference's in-place EMA buffers. All scatter-style updates are
    one-hot matmuls. The straight-through estimator and the beta commit
    loss match the reference exactly.
    """

    num_tokens: int = 1024
    codebook_dim: int = 256
    beta: float = 1.0
    decay: float = 0.99
    eps: float = 1e-5

    @nn.compact
    def __call__(self, z: jax.Array, *, train: bool = False):
        n, d = self.num_tokens, self.codebook_dim
        z = _l2norm(z.astype(jnp.float32))
        zf = z.reshape(-1, d)

        weight = self.variable(
            "quantizer", "weight", lambda: jnp.zeros((n, d), jnp.float32))
        cluster = self.variable(
            "quantizer", "cluster_size", lambda: jnp.zeros((n,), jnp.float32))
        initted = self.variable(
            "quantizer", "initted", lambda: jnp.zeros((), jnp.bool_))

        writable = self.is_mutable_collection("quantizer") \
            and not self.is_initializing()
        if train and writable:
            # k-means init on the first training batch (EmbeddingEMA
            # kmeans_init=True path, quantizer.py:96-105)
            key = (self.make_rng("quantizer") if self.has_rng("quantizer")
                   else jax.random.key(0))
            # lax.cond so the 10-iteration k-means only EXECUTES on the
            # first step — an unconditional compute masked by jnp.where
            # would pay the clustering matmuls every step of the run
            weight.value, cluster.value = jax.lax.cond(
                initted.value,
                lambda: (weight.value, cluster.value),
                lambda: _kmeans_cosine(zf, n, 10, key),
            )
            initted.value = jnp.ones((), jnp.bool_)

        w = weight.value
        dist = (jnp.sum(zf * zf, axis=1, keepdims=True)
                + jnp.sum(w * w, axis=1) - 2.0 * (zf @ w.T))
        idx = jnp.argmin(dist, axis=1)
        z_q = w[idx].reshape(z.shape)

        if train and writable:
            onehot = jax.nn.one_hot(idx, n, dtype=jnp.float32)
            bins = onehot.sum(axis=0)
            cluster.value = (self.decay * cluster.value
                             + (1.0 - self.decay) * bins)
            embed_sum = zf.T @ onehot  # (d, n)
            embed_norm = _l2norm(
                (embed_sum / jnp.maximum(bins, 1.0)[None, :]).T)
            embed_norm = jnp.where(
                (bins == 0)[:, None], w, embed_norm)
            weight.value = _l2norm(
                self.decay * w + (1.0 - self.decay) * embed_norm)

        loss = self.beta * jnp.mean(
            jnp.square(jax.lax.stop_gradient(z_q) - z))
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        return z_q, loss, idx.reshape(z.shape[:-1])


class BEATsTokenizer(nn.Module):
    """BEATs acoustic tokenizer (Tokenizers.py:73-173): the encoder tower,
    a Linear-Tanh-Linear projection, and the NormEMA VQ. `extract_labels`
    (the reference's API for generating audio-pretrain distillation
    targets) is the code-index output."""

    cfg: BEATsConfig
    quant_n: int = 1024
    quant_dim: int = 256

    @nn.compact
    def __call__(self, fbank: jax.Array, *, train: bool = False):
        tokens, _ = BEATsEncoder(self.cfg, name="encoder")(fbank)
        dt = jnp.dtype(self.cfg.dtype)
        pdt = jnp.dtype(self.cfg.param_dtype)
        q = nn.Dense(self.cfg.encoder_embed_dim, dtype=dt, param_dtype=pdt,
                     name="quantize_layer_0")(tokens)
        q = jnp.tanh(q)
        q = nn.Dense(self.quant_dim, dtype=dt, param_dtype=pdt,
                     name="quantize_layer_2")(q)
        return NormEMAVectorQuantizer(
            num_tokens=self.quant_n, codebook_dim=self.quant_dim,
            beta=1.0, name="quantize",
        )(q, train=train)

    def extract_labels(self, fbank: jax.Array) -> jax.Array:
        """(B, frames, mels) -> (B, N) code indices (Tokenizers.py:138-173)."""
        return self(fbank)[2]
