"""Audio tower (BEATs-style) + audio-visual VideoCLIP variant.

Covers the reference's audio capability (SURVEY M4): the BEATs audio
encoder (multi_modality/models/backbones/beats/, ~1.6k LoC incl. its
tokenizer/quantizer — the quantizer is a pretraining artifact not needed
for stage-2 use) and InternVideo2_Stage2_audiovisual's per-media forwards
(internvideo2_stage2_audiovisual.py:157-571).

The tower: log-mel fbank (host-side, numpy) → 16x16 spectrogram patch GEMM
→ LayerNorm transformer blocks (reused Block) → mean-pool. The AV model
adds an audio projection and supports media types "audio", "video", and
"audio_video" (concatenated tokens through the fusion BERT).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from internvideo_tpu.nn.norms import LayerNorm
from internvideo_tpu.nn.transformer import Block


# ---------------------------------------------------------------------------
# host-side fbank frontend
# ---------------------------------------------------------------------------


def mel_filterbank(n_mels=128, n_fft=400, sr=16000, fmin=0.0, fmax=8000.0):
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        l, c, r = bins[i], bins[i + 1], bins[i + 2]
        if c > l:
            fb[i, l:c] = (np.arange(l, c) - l) / (c - l)
        if r > c:
            fb[i, c:r] = (r - np.arange(c, r)) / (r - c)
    return fb.astype(np.float32)


def log_mel_spectrogram(
    wav: np.ndarray, *, sr=16000, n_fft=400, hop=160, n_mels=128
) -> np.ndarray:
    """(num_samples,) -> (frames, n_mels) log-mel features (host)."""
    window = np.hanning(n_fft).astype(np.float32)
    n = 1 + max(len(wav) - n_fft, 0) // hop
    frames = np.stack([
        wav[i * hop:i * hop + n_fft] * window for i in range(n)
    ])
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    mel = spec @ mel_filterbank(n_mels, n_fft, sr).T
    return np.log(mel + 1e-6).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class AudioEncoderConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 16
    n_mels: int = 128
    max_frames: int = 1024  # spectrogram frames (time patches come from this)
    dtype: str = "float32"
    param_dtype: str = "float32"
    attn_impl: str = "auto"


class AudioEncoder(nn.Module):
    cfg: AudioEncoderConfig

    @nn.compact
    def __call__(
        self, fbank: jax.Array, deterministic: bool = True
    ):
        """fbank: (B, frames, n_mels) -> (tokens (B,N,D), pooled (B,D))."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        p = cfg.patch_size
        b, t, m = fbank.shape
        assert t % p == 0 and m % p == 0, (t, m, p)
        x = fbank.reshape(b, t // p, p, m // p, p)
        x = x.transpose(0, 1, 3, 2, 4).reshape(b, (t // p) * (m // p), p * p)
        x = nn.Dense(
            cfg.embed_dim, dtype=dtype,
            param_dtype=jnp.dtype(cfg.param_dtype),
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02),
                ("kernel_spatial", "embed"),
            ),
            name="patch_embed",
        )(x.astype(dtype))
        pos = self.param(
            "pos_embed",
            nn.with_logical_partitioning(
                nn.initializers.normal(0.02), (None, "embed")
            ),
            ((cfg.max_frames // p) * (cfg.n_mels // p), cfg.embed_dim),
            jnp.dtype(cfg.param_dtype),
        )
        x = x + pos[: x.shape[1]].astype(dtype)[None]
        for i in range(cfg.depth):
            x = Block(
                num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                qk_normalization=False, init_values=None,
                norm_type="layernorm", dtype=dtype,
                attn_impl=cfg.attn_impl, name=f"blocks_{i}",
            )(x, deterministic)
        x = LayerNorm(dtype=dtype, name="norm")(x)
        return x, x.mean(axis=1)


# ---------------------------------------------------------------------------
# Kaldi-compatible fbank frontend (BEATs preprocess parity)
# ---------------------------------------------------------------------------


def _povey_window(n: int) -> np.ndarray:
    # kaldi "povey" window = hann^0.85
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))) ** 0.85


def _kaldi_mel_banks(n_mels, n_fft, sr, low_freq=20.0, high_freq=0.0):
    """Kaldi mel filterbank (triangular in mel domain, bins over FFT freqs;
    differs from the HTK/librosa variant used by mel_filterbank above)."""
    if high_freq <= 0.0:
        high_freq = sr / 2 + high_freq
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    mel_lo, mel_hi = mel(low_freq), mel(high_freq)
    mel_delta = (mel_hi - mel_lo) / (n_mels + 1)
    fft_freqs = np.arange(n_fft // 2 + 1) * (sr / n_fft)
    fft_mel = mel(fft_freqs)
    banks = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        left = mel_lo + i * mel_delta
        center = left + mel_delta
        right = center + mel_delta
        up = (fft_mel - left) / (center - left)
        down = (right - fft_mel) / (right - center)
        banks[i] = np.maximum(0.0, np.minimum(up, down))
    return banks


def kaldi_fbank(
    wav: np.ndarray,  # (num_samples,) float waveform
    *,
    sr: int = 16000,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    n_mels: int = 128,
    preemphasis: float = 0.97,
    remove_dc: bool = True,
) -> np.ndarray:
    """Kaldi-style log-mel fbank, matching torchaudio.compliance.kaldi
    defaults as BEATs' preprocess invokes it (BEATs.py:124-137: fbank with
    num_mel_bins=128, 25/10 ms frames; waveform pre-scaled by 2^15).

    snip_edges=True framing, DC removal, 0.97 pre-emphasis, povey window,
    power spectrum over a 512-point FFT (round to pow2), kaldi mel banks
    (low 20 Hz), natural-log output. -> (frames, n_mels).
    """
    frame_len = int(sr * frame_length_ms / 1000)  # 400
    shift = int(sr * frame_shift_ms / 1000)  # 160
    n_fft = 1 << (frame_len - 1).bit_length()  # 512
    if len(wav) < frame_len:
        return np.zeros((0, n_mels), np.float32)
    n = 1 + (len(wav) - frame_len) // shift
    idx = np.arange(frame_len)[None, :] + shift * np.arange(n)[:, None]
    frames = wav[idx].astype(np.float64)
    if remove_dc:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis:
        pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * pre
    frames = frames * _povey_window(frame_len)
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=1)) ** 2
    mel = spec @ _kaldi_mel_banks(n_mels, n_fft, sr).T
    return np.log(np.maximum(mel, 1.1921e-07)).astype(np.float32)


def beats_preprocess(
    wav: np.ndarray, *, fbank_mean: float = 15.41663,
    fbank_std: float = 6.55582, n_mels: int = 128,
) -> np.ndarray:
    """Waveform -> normalized fbank exactly as BEATs.preprocess
    (BEATs.py:124-141): x2^15 scaling then (fbank - mean) / (2 * std).
    n_mels=128 is the BEATs tokenizer/encoder geometry; the stage-2 AV
    data path uses the same recipe at 64 mels (av_utils.py:116-123)."""
    fb = kaldi_fbank(np.asarray(wav, np.float64) * 2 ** 15, n_mels=n_mels)
    return (fb - fbank_mean) / (2 * fbank_std)
