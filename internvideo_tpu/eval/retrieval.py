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
    n = jax.tree.leaves(data)[0].shape[0]
    chunks = []
    for s in range(0, n, batch_size):
        piece = jax.tree.map(lambda x: x[s:s + batch_size], data)
        m = jax.tree.leaves(piece)[0].shape[0]
        if m < batch_size:
            # pad the tail chunk so the jitted tower compiles ONE program
            # (remote TPU compiles run 20-60 s; _rerank_rows already pads
            # for the same reason)
            piece = jax.tree.map(
                lambda x: np.concatenate(
                    [x, np.repeat(np.asarray(x[-1:]), batch_size - m, 0)], 0
                ),
                piece,
            )
        out = jax.device_get(encode_fn(piece))
        if m < batch_size:
            out = jax.tree.map(lambda x: x[:m], out)
        chunks.append(out)
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
    shard_hosts: bool = False,  # shard rerank rows across jax processes
    dsl: bool = False,  # dual-softmax (retrieval_utils.py:283-287)
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

    if dsl:
        # dual-softmax: rescale each score by its column-softmax mass —
        # both directions derive from the v2t matrix as the reference does
        def _sm0(m):
            e = np.exp(m - m.max(axis=0, keepdims=True))
            return e / e.sum(axis=0, keepdims=True)

        itc_t2v = itc.T * _sm0(itc.T)
        itc = itc * _sm0(itc)
        if rerank_score is None:
            return itc, itc_t2v
        itc_t = itc_t2v  # the rerank base must be the DSL-rescaled t2v
    else:
        itc_t = itc.T

    if rerank_score is None:
        return itc, itc_t

    nv, nt = itc.shape
    k = min(k_test, nt)
    kv = min(k_test, nv)

    # per-host row sharding — exactly the reference's rank sharding
    # (retrieval_utils.py:371-379); single-process covers everything
    if shard_hosts:
        from internvideo_tpu.core.distributed import (
            host_shard_indices,
            process_allgather,
        )

        v_rows = host_shard_indices(nv)
        t_rows = host_shard_indices(nt)
    else:
        v_rows = np.arange(nv)
        t_rows = np.arange(nt)

    mask_arr = np.asarray(texts["attention_mask"])

    score_v2t = np.full_like(itc, -100.0)
    topk_v = _topk_idx(itc[v_rows], k)  # (rows, k)
    itm = _rerank_rows(
        rerank_score, vis_embeds[v_rows], txt_embeds, mask_arr,
        topk_v, rerank_batch,
    )
    score_v2t[v_rows[:, None], topk_v] = (
        itc[v_rows[:, None], topk_v] + itm
    )

    score_t2v = np.full_like(itc_t, -100.0)
    topk_t = _topk_idx(itc_t[t_rows], kv)
    itm = _rerank_rows(
        lambda t_rep, v_cand, m_rep: rerank_score(v_cand, t_rep, m_rep),
        txt_embeds[t_rows], vis_embeds, None,
        topk_t, rerank_batch, row_masks=mask_arr[t_rows],
    )
    score_t2v[t_rows[:, None], topk_t] = (
        itc_t[t_rows[:, None], topk_t] + itm
    )

    if shard_hosts:
        # disjoint row fills merge by elementwise max (-100 elsewhere)
        score_v2t = np.max(process_allgather(score_v2t), axis=0)
        score_t2v = np.max(process_allgather(score_t2v), axis=0)
    return score_v2t, score_t2v


def _topk_idx(scores: np.ndarray, k: int) -> np.ndarray:
    part = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
    return part


def _rerank_rows(fn, row_feats, cand_feats, cand_masks, topk, rerank_batch,
                 *, row_masks=None):
    """Pair each row with its top-k candidates and score them in DEVICE
    batches of whole row-groups (one dispatch + one device_get per chunk,
    instead of the per-row host loop the reference uses). The last chunk is
    padded to the fixed batch so only one program is compiled."""
    n, k = topk.shape
    rows_per = max(1, rerank_batch // k)
    itm = np.zeros((n, k), np.float32)
    for s in range(0, n, rows_per):
        rows = np.arange(s, min(s + rows_per, n))
        pad = rows_per - len(rows)
        rows_p = np.concatenate([rows, np.zeros(pad, np.int64)])
        idx = topk[rows_p].reshape(-1)
        a = np.repeat(row_feats[rows_p], k, axis=0)
        b = cand_feats[idx]
        if row_masks is not None:  # t2v: the mask belongs to the text row
            m = np.repeat(row_masks[rows_p], k, axis=0)
        else:  # v2t: the mask belongs to the text candidate
            m = cand_masks[idx]
        out = np.asarray(jax.device_get(fn(a, b, m))).reshape(rows_per, k)
        itm[rows] = out[: len(rows)]
    return itm


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
