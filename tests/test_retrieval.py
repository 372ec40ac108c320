"""Retrieval eval: metrics math + end-to-end with a tiny VideoCLIP."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from internvideo_tpu.eval.retrieval import itm_eval, retrieval_evaluation
from internvideo_tpu.models.bert import BertConfig
from internvideo_tpu.models.internvideo2 import InternVideo2Config
from internvideo_tpu.models.videoclip import VideoCLIP, VideoCLIPConfig


def test_itm_eval_perfect_and_ranked():
    n = 6
    perfect = np.eye(n) * 10 + np.random.RandomState(0).randn(n, n) * 0.01
    gt = np.arange(n)
    m = itm_eval(perfect, perfect.T, gt, gt)
    assert m["v2t_r1"] == 100.0 and m["t2v_r1"] == 100.0
    assert m["v2t_mdR"] == 1.0

    # ground truth always rank 2
    scores = np.zeros((n, n))
    for i in range(n):
        scores[i, (i + 1) % n] = 5.0
        scores[i, i] = 4.0
    m = itm_eval(scores, scores.T, gt, gt)
    assert m["v2t_r1"] == 0.0 and m["v2t_r5"] == 100.0


def test_retrieval_end_to_end():
    bert = BertConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, fusion_layer=1, dropout=0.0, attn_impl="xla",
    )
    vis = InternVideo2Config(
        embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0,
        patch_size=14, img_size=28, num_frames=1, tubelet_size=1,
        clip_embed_dim=16, num_classes=0, attn_impl="xla",
    )
    cfg = VideoCLIPConfig(vision=vis, text=bert, embed_dim=16)
    model = VideoCLIP(cfg)
    nv, nt, l = 5, 5, 8
    videos = {"video": jax.random.normal(jax.random.key(0), (nv, 1, 28, 28, 3))}
    texts = {
        "input_ids": jax.random.randint(jax.random.key(1), (nt, l), 1, 60),
        "attention_mask": jnp.ones((nt, l), jnp.int32),
    }
    params = model.init(
        jax.random.key(2), videos["video"][:1], texts["input_ids"][:1],
        texts["attention_mask"][:1], init_all_branches=True,
    )

    @jax.jit
    def encode_video(batch):
        out = model.apply(
            params, batch["video"], method="encode_vision"
        )
        tokens, pooled = out[0], out[1]
        proj = model.apply(
            params, pooled,
            method=lambda m, x: m.vision_proj(x),
        )
        return tokens, proj

    @jax.jit
    def encode_text(batch):
        tokens, pooled = model.apply(
            params, batch["input_ids"], batch["attention_mask"],
            method="encode_text",
        )
        proj = model.apply(
            params, pooled, method=lambda m, x: m.text_proj(x)
        )
        return tokens, proj

    @jax.jit
    def rerank(vis_embeds, txt_embeds, txt_mask):
        fused = model.apply(
            params, txt_embeds, txt_mask, vis_embeds, method="fusion"
        )
        logits = model.apply(params, fused.pooled, method="itm_logits")
        return logits[:, 1] - logits[:, 0]

    s_v2t, s_t2v = retrieval_evaluation(
        encode_video=encode_video,
        encode_text=encode_text,
        rerank_score=rerank,
        videos=videos,
        texts=texts,
        batch_size=2,
        k_test=3,
        rerank_batch=2,
    )
    assert s_v2t.shape == (nv, nt) and s_t2v.shape == (nt, nv)
    gt = np.arange(nv)
    m = itm_eval(s_v2t, s_t2v, gt, gt)
    assert 0 <= m["v2t_r1"] <= 100 and np.isfinite(m["r_mean"])
    # top-k rows got reranked, everything else is the -100 floor
    assert (s_v2t > -100).sum() == nv * 3


def test_dsl_rescoring():
    """Dual-softmax rescoring preserves a clean diagonal and matches the
    reference formula (retrieval_utils.py:283-287)."""
    import numpy as np

    from internvideo_tpu.eval.retrieval import retrieval_evaluation

    rng = np.random.RandomState(0)
    feats = rng.randn(6, 8).astype(np.float32) * 2

    def enc_v(v):
        return v, v

    def enc_t(t):
        return t["input_ids"], t["input_ids"]

    texts = {
        "input_ids": feats + rng.randn(6, 8).astype(np.float32) * 0.05,
        "attention_mask": np.ones((6, 4), np.int32),
    }
    v2t, t2v = retrieval_evaluation(
        encode_video=enc_v, encode_text=enc_t, rerank_score=None,
        videos=feats, texts=texts, dsl=True,
    )
    assert (np.argmax(v2t, 1) == np.arange(6)).all()
    assert (np.argmax(t2v, 1) == np.arange(6)).all()
    # reference formula check
    vn = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    tn = texts["input_ids"] / np.linalg.norm(
        texts["input_ids"], axis=-1, keepdims=True
    )
    itc = vn @ tn.T
    e = np.exp(itc - itc.max(0, keepdims=True))
    np.testing.assert_allclose(v2t, itc * e / e.sum(0, keepdims=True),
                               rtol=1e-5, atol=1e-6)


def test_zero_shot_classification():
    """Prompt-ensemble zero-shot: a toy embedding space where class k's
    name maps near axis k must classify perfectly."""
    from internvideo_tpu.eval.zeroshot import (
        KINETICS_TEMPLATES,
        KINETICS_TEMPLATES_ACTION_CLIP,
        build_zero_shot_classifier,
        zero_shot_eval,
    )

    assert len(KINETICS_TEMPLATES) == 28
    assert len(KINETICS_TEMPLATES_ACTION_CLIP) == 16
    assert all("{}" in t for t in KINETICS_TEMPLATES)

    classes = ["running", "swimming", "climbing"]
    rng = np.random.RandomState(0)

    def encode_texts(texts):
        # embedding = one-hot of whichever class name the prompt contains,
        # plus template-dependent noise (the ensemble averages it out)
        out = []
        for t in texts:
            k = next(i for i, c in enumerate(classes) if c in t)
            e = np.eye(3)[k] * 4 + rng.randn(3) * 0.5
            out.append(e)
        return np.stack(out)

    clf = build_zero_shot_classifier(encode_texts, classes)
    assert clf.shape == (3, 3)
    np.testing.assert_allclose(np.linalg.norm(clf, axis=-1), 1.0, atol=1e-6)

    def encode_video(v):
        return v  # videos already live in the class space

    data = [{
        "video": jnp.asarray(np.eye(3)[[0, 1, 2, 1]] * 3
                             + rng.randn(4, 3) * 0.1),
        "label": np.asarray([0, 1, 2, 1]),
    }]
    m = zero_shot_eval(encode_video, clf, data)
    assert m["top1"] == 100.0 and m["n"] == 4
