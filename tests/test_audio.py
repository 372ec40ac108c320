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


def test_kaldi_fbank_properties():
    from internvideo_tpu.models.audio import beats_preprocess, kaldi_fbank

    sr = 16000
    t = np.arange(sr) / sr
    # 1 kHz tone: energy should peak in the mel bin containing 1 kHz
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float64)
    fb = kaldi_fbank(tone)
    # snip_edges framing: 1 + (16000 - 400) // 160 frames
    assert fb.shape == (1 + (sr - 400) // 160, 128)
    mean_spec = fb.mean(0)
    peak_bin = int(np.argmax(mean_spec))
    # kaldi mel: mel(f) = 1127 ln(1 + f/700); bin centers linear in mel
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    centers_mel = mel(20.0) + (np.arange(128) + 1) * (
        (mel(8000.0) - mel(20.0)) / 129
    )
    expected_bin = int(np.argmin(np.abs(centers_mel - mel(1000.0))))
    assert abs(peak_bin - expected_bin) <= 1, (peak_bin, expected_bin)
    # louder signal -> uniformly larger log energies
    fb_loud = kaldi_fbank(tone * 4)
    assert (fb_loud.mean(0) >= fb.mean(0) - 1e-6).all()
    # 16x power shows up as +ln(16) where energy is well above the log
    # floor (bins at the floor stay clamped, so compare at the peak)
    np.testing.assert_allclose(
        fb_loud.mean(0)[peak_bin], mean_spec[peak_bin] + np.log(16),
        atol=0.05,
    )
    # BEATs normalization wrapper
    norm = beats_preprocess(tone)
    assert norm.shape == fb.shape and np.isfinite(norm).all()


def test_kaldi_fbank_feeds_beats_tower():
    from internvideo_tpu.models.audio import beats_preprocess
    from internvideo_tpu.models.beats import BEATsConfig, BEATsEncoder

    wav = np.random.default_rng(0).normal(size=16000 * 2).astype(np.float64)
    fb = beats_preprocess(wav)  # (198, 128)
    # BEATs patches 16x16: crop frames to a multiple of 16
    fb = fb[: (fb.shape[0] // 16) * 16][None]
    cfg = BEATsConfig(encoder_layers=2)
    model = BEATsEncoder(cfg)
    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(fb))
    tokens, pooled = model.apply(params, jnp.asarray(fb))
    assert tokens.shape == (1, (fb.shape[1] // 16) * 8, 768)
    assert np.isfinite(np.asarray(pooled)).all()


def test_av_clip_train_step_all_media():
    """AV stage-2 step: loss decreases for each media type."""
    import optax

    from internvideo_tpu.train.engines.clip import (
        CLIPLossConfig,
        make_av_clip_train_step,
    )
    from internvideo_tpu.train.state import TrainState

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
    b = 4
    video = jax.random.normal(jax.random.key(0), (b, 2, 28, 28, 3))
    audio = jax.random.normal(jax.random.key(1), (b, 64, 32))
    ids = jax.random.randint(jax.random.key(2), (b, 8), 4, 60)
    mask = jnp.ones((b, 8), jnp.int32)
    params = model.init(
        jax.random.key(3), ids, mask, video, audio,
        media_type="audio_video", init_all_branches=True,
    )["params"]
    tx = optax.adam(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )
    loss_cfg = CLIPLossConfig(
        vocab_size=64, mask_token_id=1, cls_token_id=2, mlm_probability=0.3
    )
    batch = {
        "input_ids": ids, "attention_mask": mask, "video": video,
        "audio": audio, "idx": jnp.arange(b),
    }
    for media in ("video", "audio", "audio_video"):
        step = jax.jit(make_av_clip_train_step(model, loss_cfg, media))
        s = state
        first = last = None
        for i in range(8):
            s, m = step(s, batch, jax.random.key(i))
            if first is None:
                first = float(m["loss"])
            last = float(m["loss"])
        assert np.isfinite(last)
        assert last < first, (media, first, last)
        assert {"loss_vtc", "loss_vtm", "loss_mlm"} <= set(m)


def test_beats_tokenizer_kmeans_init_and_labels():
    """From-scratch tokenizer training path: first train batch k-means-
    initializes the codebook (initted flips), EMA updates move it, and
    extract_labels yields in-range codes."""
    import jax
    import jax.numpy as jnp

    from internvideo_tpu.models.beats import BEATsConfig, BEATsTokenizer

    cfg = BEATsConfig(
        input_patch_size=8, embed_dim=16, encoder_embed_dim=24,
        encoder_ffn_embed_dim=48, encoder_layers=1,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        num_buckets=16, max_distance=8,
    )
    model = BEATsTokenizer(cfg, quant_n=12, quant_dim=8)
    fbank = jax.random.normal(jax.random.key(0), (2, 16, 32))
    variables = model.init(
        {"params": jax.random.key(1), "quantizer": jax.random.key(2)},
        fbank, train=True)
    assert not bool(variables["quantizer"]["quantize"]["initted"])

    (zq, loss, idx), updated = model.apply(
        variables, fbank, train=True,
        rngs={"quantizer": jax.random.key(3)}, mutable=["quantizer"])
    q = updated["quantizer"]["quantize"]
    assert bool(q["initted"])
    assert float(jnp.sum(jnp.abs(q["weight"]))) > 0
    assert float(loss) >= 0
    assert idx.shape == (2, fbank.shape[1] // 8 * (32 // 8))
    assert int(idx.min()) >= 0 and int(idx.max()) < 12

    # eval labels through the updated state
    labels = model.apply(updated | {"params": variables["params"]}, fbank)[2]
    assert labels.shape == idx.shape
