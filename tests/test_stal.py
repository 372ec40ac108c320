"""STAL training suite: ROI action head trains end-to-end on synthetic
feature volumes (reference alphaction action_head behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from internvideo_tpu.models.stal import (
    ROIActionHead,
    STALConfig,
    random_box_aug,
    stal_loss,
)

CFG = STALConfig(in_dim=8, hidden_dim=32, num_pose=3, num_object=2,
                 num_person=2, roi_size=(4, 4))


def _synth(rng, b=2, n=3, t=4, hw=16):
    """Box interiors carry their pose class on channel c and interaction
    flags on channels 3/4 (object) and 5/6 (person)."""
    feats = rng.standard_normal((b, t, hw, hw, CFG.in_dim)).astype(
        np.float32) * 0.1
    boxes = np.zeros((b, n, 4), np.float32)
    labels = np.zeros((b, n, CFG.num_classes), np.float32)
    for i in range(b):
        for j in range(n):
            x1 = rng.integers(0, hw - 6)
            y1 = rng.integers(0, hw - 6)
            w = rng.integers(4, 6)
            boxes[i, j] = (x1, y1, x1 + w, y1 + w)
            pose = rng.integers(0, CFG.num_pose)
            labels[i, j, pose] = 1.0
            feats[i, :, y1:y1 + w, x1:x1 + w, pose] += 3.0
            if rng.random() < 0.5:
                k = rng.integers(0, CFG.num_object)
                labels[i, j, CFG.num_pose + k] = 1.0
                feats[i, :, y1:y1 + w, x1:x1 + w, CFG.num_pose + k] += 3.0
    return (jnp.asarray(feats), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.ones((b, n), bool))


def test_box_aug_shapes_and_bounds():
    rng = np.random.default_rng(0)
    _, boxes, _, _ = _synth(rng)
    out = random_box_aug(boxes, jax.random.key(0))
    assert out.shape == boxes.shape
    # jitter is bounded: centers moved by < 40% of size, sizes within 30%
    w0 = boxes[..., 2] - boxes[..., 0]
    w1 = out[..., 2] - out[..., 0]
    assert float(jnp.max(jnp.abs(w1 / w0 - 1.0))) < 0.35


def test_stal_head_trains():
    rng = np.random.default_rng(1)
    model = ROIActionHead(CFG)
    feats, boxes, labels, mask = _synth(rng)
    params = model.init(jax.random.key(0), feats, boxes, mask)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    def loss_fn(p, feats, boxes, labels, mask):
        logits = model.apply(p, feats, boxes, mask)
        total, parts = stal_loss(logits, labels, mask, CFG)
        return total, parts

    @jax.jit
    def step(p, o, feats, boxes, labels, mask, key):
        aug = random_box_aug(boxes, key)
        (l, parts), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, feats, aug, labels, mask)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for i in range(80):
        feats, boxes, labels, mask = _synth(rng)
        params, opt, l = step(params, opt, feats, boxes, labels, mask,
                              jax.random.key(i))
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.6 * np.mean(losses[:10]), (
        losses[:3], losses[-3:])

    # held-out: the pose prediction for each box matches its class
    feats, boxes, labels, mask = _synth(np.random.default_rng(123))
    logits = model.apply(params, feats, boxes, mask)
    pred = jnp.argmax(logits[..., :CFG.num_pose], axis=-1)
    gt = jnp.argmax(labels[..., :CFG.num_pose], axis=-1)
    acc = float(jnp.mean((pred == gt).astype(jnp.float32)))
    assert acc >= 0.5, acc
