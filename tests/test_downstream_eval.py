"""InternVideo1 downstream pipelines (I2): temporal action localization
decode/NMS/mAP and open-set OpenMax recalibration."""

import numpy as np

from internvideo_tpu.eval.openset import OpenMax, openset_metrics
from internvideo_tpu.eval.temporal_detection import (
    decode_proposals,
    detection_map,
    nms_proposals,
)


def _synthetic_video(rng, gt_segments, num_t=100, num_c=3, noise=0.05):
    """Build per-timestep score/offset maps that encode the gt segments."""
    scores = rng.uniform(0, noise, size=(num_t, num_c)).astype(np.float32)
    left = np.zeros(num_t, np.float32)
    right = np.zeros(num_t, np.float32)
    for (s, e), c in gt_segments:
        mid = int((s + e) / 2)
        scores[mid, c] = 0.9
        left[mid] = mid - s
        right[mid] = e - mid
    return scores, left, right


def test_tal_pipeline_perfect_predictions():
    rng = np.random.default_rng(0)
    gts = {
        "v1": [((10, 30), 0), ((50, 80), 1)],
        "v2": [((5, 25), 2)],
    }
    preds, gt = {}, {}
    for vid, items in gts.items():
        scores, left, right = _synthetic_video(rng, items)
        segs, sc, labs = decode_proposals(
            scores, left, right, score_threshold=0.3
        )
        segs, sc, labs = nms_proposals(segs, sc, labs, iou_threshold=0.5)
        preds[vid] = (segs, sc, labs)
        gt[vid] = (
            np.asarray([g for g, _ in items], np.float32),
            np.asarray([c for _, c in items], np.int32),
        )
    m = detection_map(preds, gt, num_classes=3)
    assert m["average_mAP"] > 0.99, m

    # degraded predictions rank below perfect ones
    bad = {
        vid: (segs + 15.0, sc, labs) for vid, (segs, sc, labs) in preds.items()
    }
    m_bad = detection_map(bad, gt, num_classes=3)
    assert m_bad["average_mAP"] < m["average_mAP"]


def test_tal_nms_dedupes():
    segs = np.asarray([[0, 10], [1, 11], [20, 30]], np.float32)
    sc = np.asarray([0.9, 0.8, 0.7], np.float32)
    labs = np.zeros(3, np.int32)
    out_s, out_sc, _ = nms_proposals(segs, sc, labs, iou_threshold=0.5)
    assert len(out_sc) == 2  # the overlapping pair collapses


def test_openmax_openset():
    rng = np.random.default_rng(1)
    c, d, n = 3, 8, 120
    means = rng.normal(size=(c, d)) * 4
    labels = rng.integers(0, c, n)
    feats = means[labels] + rng.normal(size=(n, d)) * 0.3

    def make_logits(f):  # positive activations (OpenMax's AV assumption)
        dist = np.linalg.norm(f[:, None] - means[None], axis=-1)
        return np.maximum(10.0 - dist, 0.0)

    logits = make_logits(feats)
    om = OpenMax(tail_size=15, alpha=2).fit(feats, labels, logits)

    # unknowns sit well outside every class's Weibull tail but still
    # activate the nearest class (the regime OpenMax is built for)
    direction = rng.normal(size=(40, d))
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)
    unk = means[rng.integers(0, c, 40)] + direction * 3.0
    test_feats = np.concatenate([feats[:40], unk])
    test_logits = np.concatenate([logits[:40], make_logits(unk)])
    test_labels = np.concatenate([labels[:40], -np.ones(40, np.int64)])
    probs = om.recalibrate(test_feats, test_logits)
    m = openset_metrics(probs, test_labels)
    assert m["closed_acc"] > 0.9, m
    assert m["unknown_detection_rate"] > 0.8, m
    assert m["open_acc"] > 0.85, m


def test_spatiotemporal_frame_map():
    """ROI action head + frame mAP: a detector whose ROI features separate
    two actions scores ~1.0 mAP; shuffled boxes score lower."""
    import jax.numpy as jnp

    from internvideo_tpu.eval.spatiotemporal import (
        box_iou,
        evaluate_action_detector,
        frame_map,
    )

    # box_iou sanity
    a = np.asarray([[0, 0, 10, 10]], np.float32)
    b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                   np.float32)
    iou = box_iou(a, b)[0]
    assert abs(iou[0] - 1.0) < 1e-6 and iou[2] == 0.0
    assert 0.1 < iou[1] < 0.2

    # synthetic features: class is encoded in the channel mean inside a box
    rng = np.random.default_rng(0)
    feats, boxes, gt = {}, {}, {}
    for fid in range(4):
        fm = np.zeros((1, 2, 16, 16, 4), np.float32)
        b0 = np.asarray([1.0, 1.0, 6.0, 6.0]) + fid * 0.5
        b1 = np.asarray([9.0, 9.0, 14.0, 14.0])
        fm[0, :, int(b0[1]):int(b0[3]), int(b0[0]):int(b0[2]), 0] = 5.0
        fm[0, :, int(b1[1]):int(b1[3]), int(b1[0]):int(b1[2]), 1] = 5.0
        feats[fid] = fm
        boxes[fid] = np.stack([b0, b1]).astype(np.float32)
        gt[fid] = (boxes[fid].copy(), np.asarray([0, 1], np.int32))

    def head(roi_feats):  # scores from channel evidence
        return jnp.stack(
            [roi_feats[:, 0], roi_feats[:, 1]], axis=1
        )

    m = evaluate_action_detector(head, feats, boxes, gt)
    assert m["frame_mAP@0.5"] > 0.99, m

    # mismatched boxes -> lower mAP
    bad_gt = {
        fid: (bx + 8.0, lb) for fid, (bx, lb) in gt.items()
    }
    m_bad = evaluate_action_detector(head, feats, boxes, bad_gt)
    assert m_bad["frame_mAP@0.5"] < 0.5

    # empty predictions degrade gracefully
    assert frame_map({}, gt)["frame_mAP@0.5"] == 0.0
