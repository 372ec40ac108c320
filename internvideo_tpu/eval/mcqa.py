"""Multiple-choice QA evaluation (MSRVTT-MC etc.).

Counterpart of tasks_clip/retrieval_mc.py: for each video, score its K
candidate answers with the dual encoders (cosine similarity of projections),
predict the argmax, report accuracy. Optionally a cross-encoder rerank
scorer refines the dual-encoder scores, as the fusion tower does for
retrieval.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import numpy as np


def mcqa_accuracy(
    encode_video: Callable,  # video batch -> (B, E) projections
    encode_choices: Callable,  # ids (B*K, L) -> (B*K, E) projections
    data: Iterable[dict],  # {"video", "choice_ids", "answer"} per batch;
    # choice_ids: (B, K, L); answer: (B,) index of the correct choice
    rerank: Optional[Callable] = None,  # (video_batch, ids (B,K,L)) -> (B,K)
) -> dict:
    correct, total = 0, 0
    for batch in data:
        v = np.asarray(jax.device_get(encode_video(batch["video"])))
        b, k, l = batch["choice_ids"].shape
        t = np.asarray(jax.device_get(
            encode_choices(batch["choice_ids"].reshape(b * k, l))
        )).reshape(b, k, -1)
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)
        t = t / np.linalg.norm(t, axis=-1, keepdims=True)
        scores = np.einsum("be,bke->bk", v, t)
        if rerank is not None:
            scores = scores + np.asarray(
                jax.device_get(rerank(batch["video"], batch["choice_ids"]))
            )
        pred = scores.argmax(-1)
        correct += int((pred == np.asarray(batch["answer"])).sum())
        total += b
    return {"accuracy": 100.0 * correct / max(total, 1), "num": total}
