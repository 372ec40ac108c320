"""Action-recognition evaluation: top-k validation + multi-view final test.

Parity with the reference's finetune engines (engine_for_finetuning.py):
  * validation_one_epoch (:114-147): clip top-1/top-5
  * final_test + merge (:188-311): K400-style multi-view protocol — each
    video is sampled `num_clips` x `num_crops` times; per-view softmax
    probabilities are averaged per video id, then top-1/5 computed on the
    ensemble. The reference writes per-rank txt files and merges; here views
    accumulate in a dict keyed by video id (multi-host: accumulate local
    shards, merge host-side).
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable

import jax
import numpy as np


def topk_accuracy(logits: np.ndarray, labels: np.ndarray, ks=(1, 5)):
    order = np.argsort(-logits, axis=-1)
    out = {}
    for k in ks:
        hit = (order[:, :k] == labels[:, None]).any(axis=1)
        out[f"top{k}"] = 100.0 * float(hit.mean())
    return out


def validate(
    forward: Callable,  # batch["video"] -> logits
    data: Iterable[dict],
) -> dict:
    all_logits, all_labels = [], []
    for batch in data:
        logits = np.asarray(jax.device_get(forward(batch["video"])))
        all_logits.append(logits)
        all_labels.append(np.asarray(batch["label"]))
    return topk_accuracy(
        np.concatenate(all_logits), np.concatenate(all_labels)
    )


class MultiViewAccumulator:
    """Softmax-ensemble across views of the same video (merge stage)."""

    def __init__(self):
        self.probs: dict = collections.defaultdict(float)
        self.labels: dict = {}

    def add(self, video_ids, logits: np.ndarray, labels: np.ndarray):
        logits = logits - logits.max(-1, keepdims=True)
        probs = np.exp(logits)
        probs /= probs.sum(-1, keepdims=True)
        for vid, p, y in zip(video_ids, probs, labels):
            self.probs[vid] = self.probs[vid] + p
            self.labels[vid] = int(y)

    def result(self, ks=(1, 5)) -> dict:
        vids = sorted(self.probs)
        logits = np.stack([self.probs[v] for v in vids])
        labels = np.array([self.labels[v] for v in vids])
        out = topk_accuracy(logits, labels, ks)
        out["num_videos"] = len(vids)
        return out


def final_test(
    forward: Callable,  # video -> logits
    view_iter: Iterable[dict],  # {"video", "label", "video_id"} per view-batch
) -> dict:
    acc = MultiViewAccumulator()
    for batch in view_iter:
        logits = np.asarray(jax.device_get(forward(batch["video"])))
        acc.add(batch["video_id"], logits, np.asarray(batch["label"]))
    return acc.result()
