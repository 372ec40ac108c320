"""Native host ops (C++ vs numpy parity), ROIAlign3D, focal losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internvideo_tpu.ops import native
from internvideo_tpu.ops.losses import sigmoid_focal_loss, softmax_focal_loss
from internvideo_tpu.ops.roi_align3d import roi_align_3d, roi_pool_3d


def _proposals():
    rng = np.random.RandomState(0)
    starts = rng.rand(50) * 100
    segs = np.stack([starts, starts + 1 + rng.rand(50) * 20], 1)
    scores = rng.rand(50)
    return segs.astype(np.float32), scores.astype(np.float32)


def test_native_lib_builds():
    assert native._load() is not None, "C++ native lib failed to build"


def test_temporal_nms_native_matches_numpy():
    segs, scores = _proposals()
    keep_native = native.temporal_nms(segs, scores, 0.5)
    keep_np = native._temporal_nms_np(segs, scores, 0.5, len(scores))
    np.testing.assert_array_equal(keep_native, keep_np)
    # kept segments are score-sorted and pairwise below the IoU threshold
    assert np.all(np.diff(scores[keep_native]) <= 0)


def test_soft_nms():
    segs, scores = _proposals()
    idx, vals = native.soft_temporal_nms(segs, scores, method="gaussian")
    assert len(idx) > 0
    assert np.all(np.diff(vals) <= 1e-6)  # decayed scores non-increasing


def test_weibull_fit_and_score():
    rng = np.random.RandomState(0)
    # true Weibull(shape=2, scale=5) samples
    data = 5.0 * rng.weibull(2.0, size=2000)
    mr = native.MetaRecognition()
    assert mr.fit_high(data, tail_size=500)
    # tail-only fit: shape differs from the parent distribution's, but must
    # be a sane positive value
    assert 0.5 < mr.shape < 20.0 and mr.scale > 0
    # CDF is monotone and near 1 far in the tail
    scores = mr.w_score(np.array([0.1, 5.0, 30.0]))
    assert scores[0] < scores[1] < scores[2]
    assert scores[2] > 0.99

    # numpy fallback agrees with the native fit
    mr2 = native.MetaRecognition()
    mr2._fit_high_np(np.asarray(data, np.float64), 500)
    np.testing.assert_allclose(mr.shape, mr2.shape, rtol=1e-5)
    np.testing.assert_allclose(mr.scale, mr2.scale, rtol=1e-5)


def test_roi_align3d():
    # constant feature: any ROI average equals the constant
    feat = jnp.full((1, 2, 16, 16, 3), 2.5)
    boxes = jnp.array([[0, 2.0, 2.0, 10.0, 10.0]])
    out = roi_align_3d(feat, boxes, output_size=(4, 4))
    assert out.shape == (1, 2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-5)

    # gradient flows
    def f(x):
        return jnp.sum(roi_align_3d(x, boxes, output_size=(2, 2)))

    g = jax.grad(f)(feat)
    assert float(jnp.sum(jnp.abs(g))) > 0

    # linear ramp in x: ROI centered further right has larger mean
    ramp = jnp.broadcast_to(
        jnp.arange(16.0)[None, None, None, :, None], (1, 1, 16, 16, 1)
    )
    left = roi_align_3d(ramp, jnp.array([[0, 0.0, 0.0, 4.0, 16.0]]))
    right = roi_align_3d(ramp, jnp.array([[0, 12.0, 0.0, 16.0, 16.0]]))
    assert float(right.mean()) > float(left.mean())

    pooled = roi_pool_3d(feat, boxes, output_size=(3, 3))
    assert pooled.shape == (1, 2, 3, 3, 3)


def test_focal_losses():
    logits = jnp.array([[3.0, -3.0], [-3.0, 3.0]])
    targets = jnp.array([1, 2])  # class ids (1-based, sigmoid convention)
    good = sigmoid_focal_loss(logits, targets)
    bad = sigmoid_focal_loss(-logits, targets)
    assert float(good) < float(bad)

    logits3 = jnp.array([[5.0, 0.0, 0.0], [0.0, 5.0, 0.0]])
    t = jnp.array([0, 1])
    good = softmax_focal_loss(logits3, t)
    bad = softmax_focal_loss(jnp.roll(logits3, 1, axis=1), t)
    assert float(good) < float(bad)
    assert np.isfinite(float(good))
