"""TAL training suite: ActionFormer-class model end-to-end (train +
decode + mAP), reference meta_archs.py:167-750 behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from internvideo_tpu.eval.temporal_detection import nms_proposals
from internvideo_tpu.models.actionformer import (
    ActionFormer,
    ActionFormerConfig,
    actionformer_loss,
    decode_detections,
    generate_points,
    label_points,
)

CFG = ActionFormerConfig(
    in_dim=16, embed_dim=32, num_heads=4, num_levels=3, num_blocks=1,
    window=-1, head_layers=1, num_classes=3, max_seq_len=64,
)


def _synth_batch(rng, b=4, n_events=2):
    """Features carry the event signature: class c paints channel c."""
    t, c_in = CFG.max_seq_len, CFG.in_dim
    feats = rng.standard_normal((b, t, c_in), np.float32) * 0.1
    segs = np.zeros((b, n_events, 2), np.float32)
    labels = np.zeros((b, n_events), np.int64)
    for i in range(b):
        for j in range(n_events):
            start = rng.integers(0, t - 16)
            length = rng.integers(6, 14)
            cls = rng.integers(0, CFG.num_classes)
            segs[i, j] = (start, start + length)
            labels[i, j] = cls
            feats[i, start:start + length, cls] += 4.0
    return {
        "feats": jnp.asarray(feats),
        "mask": jnp.ones((b, t), bool),
        "segments": jnp.asarray(segs),
        "labels": jnp.asarray(labels),
        "event_mask": jnp.ones((b, n_events), bool),
    }


def test_label_assignment_properties():
    points = jnp.asarray(generate_points(CFG))
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, b=2)
    cls_t, reg_t, pos = label_points(
        points, batch["segments"], batch["labels"], batch["event_mask"],
        num_classes=CFG.num_classes)
    # positives exist, sit inside their events, and regress >= 0
    assert int(jnp.sum(pos)) > 0
    assert float(jnp.min(jnp.where(pos[..., None], reg_t, 0.0))) >= 0.0
    # each positive's class target matches a ground-truth label
    b, p = 0, int(jnp.argmax(pos[0]))
    assert float(jnp.sum(cls_t[b, p])) >= 1.0


def test_actionformer_trains_and_detects():
    rng = np.random.default_rng(1)
    model = ActionFormer(CFG)
    points = jnp.asarray(generate_points(CFG))
    batch = _synth_batch(rng)
    params = model.init(jax.random.key(0), batch["feats"], batch["mask"])
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    def loss_fn(p, batch):
        out = model.apply(p, batch["feats"], batch["mask"])
        return actionformer_loss(out, points, batch, CFG)

    @jax.jit
    def step(p, o, batch):
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, batch)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for i in range(150):
        b = _synth_batch(rng)
        params, opt, l = step(params, opt, b)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10]), (
        losses[:3], losses[-3:])

    # decode a fresh sample and check the top detection hits an event
    test = _synth_batch(np.random.default_rng(99), b=1)
    logits, offsets, _ = model.apply(params, test["feats"], test["mask"])
    dets = decode_detections(
        np.asarray(logits[0]), np.asarray(offsets[0]),
        generate_points(CFG), score_threshold=0.05)
    all_segs = np.concatenate(
        [s[:, :2] for s in dets.values()]) if dets else np.zeros((0, 2))
    all_scores = np.concatenate([s[:, 2] for s in dets.values()])
    all_labels = np.concatenate(
        [np.full(len(s), c) for c, s in dets.items()])
    segs_k, scores_k, labels_k = nms_proposals(
        all_segs, all_scores, all_labels, iou_threshold=0.5)
    order = np.argsort(-np.asarray(scores_k))[:10]
    best_iou = 0.0
    for i in order:
        s, c = np.asarray(segs_k)[i], int(np.asarray(labels_k)[i])
        for (gs, ge), gl in zip(np.asarray(test["segments"][0]),
                                np.asarray(test["labels"][0])):
            if int(gl) != c:
                continue
            inter = max(0.0, min(s[1], ge) - max(s[0], gs))
            union = max(s[1], ge) - min(s[0], gs)
            best_iou = max(best_iou, inter / max(union, 1e-6))
    assert best_iou > 0.5, f"best tIoU {best_iou}"
