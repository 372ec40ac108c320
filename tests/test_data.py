"""Data layer: samplers, readers, transforms, mixup, loaders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from internvideo_tpu.data.loader import (
    MetaLoader,
    StatefulIterator,
    prefetch_to_device,
)
from internvideo_tpu.data.mixup import MixupConfig, mixup_cutmix
from internvideo_tpu.data.transforms import (
    center_crop,
    multi_scale_crop,
    normalize,
    rand_augment,
    random_erasing,
    random_resized_crop,
    resize_short_side,
)
from internvideo_tpu.data.video import (
    read_video,
    sample_frame_indices,
)


def test_frame_samplers():
    rng = np.random.default_rng(0)
    idx = sample_frame_indices(8, 100, sample="middle")
    assert len(idx) == 8 and np.all(np.diff(idx) > 0) and idx[-1] < 100
    idx = sample_frame_indices(8, 100, sample="rand", rng=rng)
    assert len(idx) == 8 and idx.max() < 100
    # short video loops
    idx = sample_frame_indices(8, 3, sample="middle")
    assert len(idx) == 8
    # multi-clip sparse: clip 0 starts earlier than last clip
    i0 = sample_frame_indices(4, 100, sample="sparse", clip_idx=0, num_clips=4)
    i3 = sample_frame_indices(4, 100, sample="sparse", clip_idx=3, num_clips=4)
    assert i0[0] <= i3[0] and np.all(i3 <= 99)
    # dense clips move forward
    d0 = sample_frame_indices(4, 200, sample="dense", clip_idx=0, num_clips=3)
    d2 = sample_frame_indices(4, 200, sample="dense", clip_idx=2, num_clips=3)
    assert d0[0] <= d2[0]


def test_npy_reader_roundtrip(tmp_path):
    vid = (np.random.rand(20, 8, 8, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "clip.npy")
    np.save(p, vid)
    out = read_video(p, 4, sample="middle")
    assert out.shape == (4, 8, 8, 3)
    idx = sample_frame_indices(4, 20, sample="middle")
    np.testing.assert_array_equal(out, vid[idx])


def test_transforms():
    rng = np.random.default_rng(0)
    clip = (np.random.rand(4, 64, 48, 3) * 255).astype(np.uint8)
    r = resize_short_side(clip, 32)
    assert min(r.shape[1:3]) == 32
    c = center_crop(r, 32)
    assert c.shape[1:3] == (32, 32)
    rc = random_resized_crop(clip, 24, rng)
    assert rc.shape == (4, 24, 24, 3)
    ms = multi_scale_crop(clip, 24, rng)
    assert ms.shape == (4, 24, 24, 3)
    n = normalize(c)
    assert n.dtype == np.float32 and abs(float(n.mean())) < 3

    ra = rand_augment(clip, rng, num_ops=2, magnitude=9)
    assert ra.shape == clip.shape and ra.dtype == np.uint8

    er = random_erasing(clip, np.random.default_rng(3), p=1.0)
    assert er.shape == clip.shape
    assert not np.array_equal(er, clip)


def test_mixup_cutmix():
    cfg = MixupConfig(num_classes=10, label_smoothing=0.1)
    video = jax.random.normal(jax.random.key(0), (4, 2, 16, 16, 3))
    labels = jnp.array([0, 1, 2, 3])
    out, soft = mixup_cutmix(jax.random.key(1), video, labels, cfg)
    assert out.shape == video.shape
    assert soft.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)
    # soft targets put most mass on the true + partner labels
    assert float(soft[1, 1] + soft[1, 0]) > 0.8


def test_metaloader_deterministic():
    a = [("a", i) for i in range(4)]
    b = [("b", i) for i in range(2)]
    ml1 = MetaLoader({"a": a, "b": b}, seed=7)
    ml2 = MetaLoader({"a": a, "b": b}, seed=7)
    assert ml1.schedule() == ml2.schedule()
    assert sorted(ml1.schedule()) == ["a"] * 4 + ["b"] * 2
    items = list(ml1)
    assert len(items) == 6


def test_stateful_iterator_resume():
    it1 = StatefulIterator(10, seed=3)
    gen = iter(it1)
    first = [next(gen) for _ in range(4)]
    state = it1.state_dict()

    it2 = StatefulIterator(10, seed=3)
    it2.load_state_dict(state)
    rest = [next(iter(it2)) for _ in range(6)]
    # together they form a full permutation of the epoch
    assert sorted(first + rest) == list(range(10))


def test_prefetch():
    batches = [{"x": np.full((2,), i)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    np.testing.assert_array_equal(np.asarray(out[3]["x"]), [3, 3])
