"""Video-text retrieval evaluation.

Two-stage protocol of the reference (multi_modality/tasks/retrieval_utils.py):

  1. dual-encoder stage (:18-101): batch all texts and all videos through
     their towers, build the full ITC score matrix (vision_proj @ text_proj.T)
  2. cross-encoder rerank (:371-470): for each video take its top-k texts,
     run the fusion encoder on those (video, text) pairs, add the ITM
     positive-class logit to the ITC score; same in the text→video direction
  3. metrics (:1243-1303 itm_eval): median/mean rank and R@1/5/10 in both
     directions

The rerank is top-k-driven: k is static, fusion forwards are batched, and
rows can be sharded across hosts exactly as the reference shards them across
ranks (:371-379) — here a jit over a batch dim per row-chunk.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _encode_in_batches(encode_fn, data, batch_size):
    outs = None
    n = jax.tree.leaves(data)[0].shape[0]
    chunks = []
    for s in range(0, n, batch_size):
        piece = jax.tree.map(lambda x: x[s:s + batch_size], data)
        chunks.append(jax.device_get(encode_fn(piece)))
    return jax.tree.map(lambda *xs: np.concatenate(xs, 0), *chunks)


def retrieval_evaluation(
    *,
    encode_video: Callable,  # {video} -> (vision_embeds, vision_proj)
    encode_text: Callable,  # {ids, mask} -> (text_embeds, text_proj)
    rerank_score: Optional[Callable],  # (vis_embeds, txt_embeds, txt_mask) -> itm pos-logit
    videos,  # (Nv, ...) array or pytree with leading Nv
    texts,  # {"input_ids": (Nt, L), "attention_mask": (Nt, L)}
    batch_size: int = 32,
    k_test: int = 16,
    rerank_batch: int = 32,
):
    """Returns (score_v2t, score_t2v) as numpy (Nv, Nt)/(Nt, Nv) matrices."""
    vis_embeds, vis_proj = _encode_in_batches(
        encode_video, videos, batch_size
    )
    txt_embeds, txt_proj = _encode_in_batches(
        encode_text, texts, batch_size
    )

    v = vis_proj / np.linalg.norm(vis_proj, axis=-1, keepdims=True)
    t = txt_proj / np.linalg.norm(txt_proj, axis=-1, keepdims=True)
    itc = v @ t.T  # (Nv, Nt)

    if rerank_score is None:
        return itc, itc.T

    nv, nt = itc.shape
    k = min(k_test, nt)
    score_v2t = np.full_like(itc, -100.0)
    for i in range(nv):  # rows shardable across hosts
        topk = np.argsort(-itc[i])[:k]
        vis_rep = np.broadcast_to(
            vis_embeds[i][None], (k,) + vis_embeds.shape[1:]
        )
        itm = np.asarray(
            _batched_rerank(
                rerank_score, vis_rep,
                txt_embeds[topk], texts["attention_mask"][topk],
                rerank_batch,
            )
        )
        score_v2t[i, topk] = itc[i, topk] + itm

    kv = min(k_test, nv)
    score_t2v = np.full_like(itc.T, -100.0)
    for j in range(nt):
        topk = np.argsort(-itc[:, j])[:kv]
        txt_rep = np.broadcast_to(
            txt_embeds[j][None], (kv,) + txt_embeds.shape[1:]
        )
        mask_rep = np.broadcast_to(
            np.asarray(texts["attention_mask"])[j][None],
            (kv,) + texts["attention_mask"].shape[1:],
        )
        itm = np.asarray(
            _batched_rerank(
                rerank_score, vis_embeds[topk], txt_rep, mask_rep,
                rerank_batch,
            )
        )
        score_t2v[j, topk] = itc[topk, j] + itm
    return score_v2t, score_t2v


def _batched_rerank(fn, vis, txt, mask, batch):
    outs = []
    for s in range(0, vis.shape[0], batch):
        outs.append(
            jax.device_get(fn(vis[s:s + batch], txt[s:s + batch], mask[s:s + batch]))
        )
    return np.concatenate(outs, 0)


def itm_eval(
    score_v2t: np.ndarray,  # (Nv, Nt)
    score_t2v: np.ndarray,  # (Nt, Nv)
    gt_txt_ids: np.ndarray,  # (Nv,) or list[list[int]]: matching text ids per video
    gt_vid_ids: np.ndarray,  # (Nt,): matching video id per text
) -> dict:
    """R@1/5/10 + median/mean rank, both directions (retrieval_utils.py:1243)."""

    def ranks(scores, gts):
        out = np.zeros(scores.shape[0])
        for i, row in enumerate(scores):
            order = np.argsort(-row)
            gt = gts[i]
            gt = [gt] if np.isscalar(gt) else list(np.atleast_1d(gt))
            out[i] = min(np.where(order == g)[0][0] for g in gt)
        return out

    r_v2t = ranks(score_v2t, gt_txt_ids)
    r_t2v = ranks(score_t2v, gt_vid_ids)

    def metrics(r, prefix):
        return {
            f"{prefix}_r1": 100.0 * float(np.mean(r < 1)),
            f"{prefix}_r5": 100.0 * float(np.mean(r < 5)),
            f"{prefix}_r10": 100.0 * float(np.mean(r < 10)),
            f"{prefix}_mdR": float(np.median(r) + 1),
            f"{prefix}_meanR": float(np.mean(r) + 1),
        }

    out = {**metrics(r_v2t, "v2t"), **metrics(r_t2v, "t2v")}
    out["r_mean"] = (
        out["v2t_r1"] + out["v2t_r5"] + out["v2t_r10"]
        + out["t2v_r1"] + out["t2v_r5"] + out["t2v_r10"]
    ) / 6
    return out
