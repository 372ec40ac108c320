"""Audio tower + audio-visual stage-2 variant."""

import jax
import jax.numpy as jnp
import numpy as np

from internvideo_tpu.models.audio import (
    AudioEncoder,
    AudioEncoderConfig,
    log_mel_spectrogram,
    mel_filterbank,
)
from internvideo_tpu.models.bert import BertConfig
from internvideo_tpu.models.internvideo2 import InternVideo2Config
from internvideo_tpu.models.videoclip_av import VideoCLIPAV, VideoCLIPAVConfig

AUD = AudioEncoderConfig(
    embed_dim=32, depth=2, num_heads=2, patch_size=16,
    n_mels=32, max_frames=64, attn_impl="xla",
)


def test_fbank_frontend():
    fb = mel_filterbank(n_mels=16, n_fft=64, sr=1600, fmax=800)
    assert fb.shape == (16, 33)
    assert np.all(fb >= 0)
    wav = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    feat = log_mel_spectrogram(wav, n_fft=400, hop=160, n_mels=32)
    assert feat.shape[1] == 32 and np.isfinite(feat).all()


def test_audio_encoder():
    model = AudioEncoder(AUD)
    fbank = jax.random.normal(jax.random.key(0), (2, 64, 32))
    params = model.init(jax.random.key(1), fbank)
    tokens, pooled = model.apply(params, fbank)
    assert tokens.shape == (2, (64 // 16) * (32 // 16), 32)
    assert pooled.shape == (2, 32)


def test_av_model_media_types():
    cfg = VideoCLIPAVConfig(
        vision=InternVideo2Config(
            embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0,
            patch_size=14, img_size=28, num_frames=2, tubelet_size=1,
            clip_embed_dim=16, attn_impl="xla",
        ),
        audio=AUD,
        text=BertConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, fusion_layer=1, dropout=0.0,
            attn_impl="xla",
        ),
        embed_dim=24,
    )
    model = VideoCLIPAV(cfg)
    video = jax.random.normal(jax.random.key(0), (2, 2, 28, 28, 3))
    audio = jax.random.normal(jax.random.key(1), (2, 64, 32))
    ids = jax.random.randint(jax.random.key(2), (2, 8), 1, 60)
    mask = jnp.ones((2, 8), jnp.int32)

    params = model.init(
        jax.random.key(3), ids, mask, video, audio, media_type="audio_video",
        init_all_branches=True,
    )
    for media, kwargs in [
        ("video", dict(video=video)),
        ("audio", dict(audio=audio)),
        ("audio_video", dict(video=video, audio=audio)),
    ]:
        out = model.apply(
            params, ids, mask, media_type=media, **kwargs
        )
        assert out.vision_proj.shape == (2, 24), media
        assert out.text_proj.shape == (2, 24)
        assert np.isfinite(np.asarray(out.vision_proj)).all()


def test_av_model_beats_tower():
    """AV model with the checkpoint-faithful BEATs audio tower."""
    from internvideo_tpu.models.beats import BEATsConfig

    cfg = VideoCLIPAVConfig(
        vision=InternVideo2Config(
            embed_dim=32, depth=1, num_heads=2, patch_size=14, img_size=28,
            num_frames=2, tubelet_size=1, clip_embed_dim=16, num_classes=0,
            attn_impl="xla",
        ),
        audio_tower="beats",
        beats=BEATsConfig(
            input_patch_size=8, embed_dim=16, encoder_embed_dim=32,
            encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
            num_buckets=32, max_distance=16,
        ),
        text=BertConfig(
            vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, fusion_layer=1, attn_impl="xla",
        ),
        embed_dim=24,
    )
    model = VideoCLIPAV(cfg)
    video = jnp.zeros((2, 2, 28, 28, 3))
    audio = jax.random.normal(jax.random.key(0), (2, 32, 32))
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.key(1), ids, mask, video=video,
                        audio=audio, media_type="audio_video",
                        init_all_branches=True)
    for media in ("audio", "audio_video"):
        tokens, pooled = model.apply(
            params, media, video, audio, method="encode_media",
        )
        assert pooled.shape == (2, 24)
        assert np.isfinite(np.asarray(tokens)).all()
