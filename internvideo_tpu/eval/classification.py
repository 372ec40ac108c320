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

    def merge(self, other_probs: dict, other_labels: dict):
        """Fold another host's accumulated views in (the reference's
        per-rank txt merge — engine_for_finetuning.py:246-311)."""
        for vid, p in other_probs.items():
            self.probs[vid] = self.probs[vid] + p
        self.labels.update(other_labels)

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
    *,
    merge_hosts: bool = False,
) -> dict:
    """Multi-view softmax ensemble. With `merge_hosts`, each jax process
    feeds only its shard of views (e.g. via StatefulIterator num_shards)
    and the partial ensembles merge across hosts before scoring."""
    acc = MultiViewAccumulator()
    for batch in view_iter:
        logits = np.asarray(jax.device_get(forward(batch["video"])))
        acc.add(batch["video_id"], logits, np.asarray(batch["label"]))
    if merge_hosts and jax.process_count() > 1:
        import pickle

        from internvideo_tpu.core.distributed import process_allgather

        blob = np.frombuffer(
            pickle.dumps((dict(acc.probs), acc.labels)), np.uint8
        )
        # pad to a common length for the gather, prefix with the true size
        sizes = process_allgather(np.asarray([blob.size], np.int64))
        pad = int(sizes.max()) - blob.size
        blob = np.concatenate([blob, np.zeros(pad, np.uint8)])
        gathered = process_allgather(blob)
        merged = MultiViewAccumulator()
        for row, size in zip(np.atleast_2d(gathered), sizes.reshape(-1)):
            probs, labels = pickle.loads(row[: int(size)].tobytes())
            merged.merge(probs, labels)
        return merged.result()
    return acc.result()
