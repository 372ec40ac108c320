"""CoTrain-style open-ended VQA classifier: loss decreases, eval accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from internvideo_tpu.eval.openend_vqa import (
    VQAClassifier,
    evaluate_openend_vqa,
    make_vqa_train_step,
    vqa_features,
)


def _toy_data(n=64, dv=16, dt=12, vocab=5, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, vocab, n).astype(np.int32)
    # separable features: answer id leaks into the video feature mean
    vf = rng.normal(size=(n, dv)).astype(np.float32) + labels[:, None]
    tf = rng.normal(size=(n, dt)).astype(np.float32)
    return jnp.asarray(vf), jnp.asarray(tf), jnp.asarray(labels)


def test_vqa_train_and_eval():
    vocab = 5
    vf, tf, labels = _toy_data(vocab=vocab)
    clf = VQAClassifier(answer_vocab_size=vocab, dropout=0.1)
    feats = vqa_features(vf, tf)
    params = clf.init(jax.random.key(0), feats)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = jax.jit(make_vqa_train_step(clf, tx))

    batch = {"video_feats": vf, "text_feats": tf, "label": labels}
    losses = []
    for i in range(30):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]

    res = evaluate_openend_vqa(
        lambda b: (b["video_feats"], b["text_feats"]),
        lambda f: clf.apply(params, f),
        [batch],
    )
    assert res["n"] == 64
    assert res["acc"] > 0.6, res
