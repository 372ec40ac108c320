"""Finetune step + classification eval (multi-view merge)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from internvideo_tpu.data.mixup import MixupConfig
from internvideo_tpu.eval.classification import (
    MultiViewAccumulator,
    final_test,
    topk_accuracy,
    validate,
)
from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.train.engines.finetune import (
    FinetuneConfig,
    make_finetune_step,
)
from internvideo_tpu.train.state import TrainState

TINY = InternVideo2Config(
    embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0,
    patch_size=14, img_size=28, num_frames=1, tubelet_size=1,
    clip_embed_dim=16, num_classes=6, attn_impl="xla",
)


def test_topk():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.array([1, 2])
    m = topk_accuracy(logits, labels, ks=(1, 2))
    assert m["top1"] == 50.0 and m["top2"] == 50.0


def test_multi_view_merge():
    acc = MultiViewAccumulator()
    # video 0: two views disagree, ensemble favors class 1
    acc.add(["v0"], np.array([[0.0, 2.0, 0.0]]), np.array([1]))
    acc.add(["v0"], np.array([[1.0, 1.5, 0.0]]), np.array([1]))
    acc.add(["v1"], np.array([[3.0, 0.0, 0.0]]), np.array([2]))
    r = acc.result(ks=(1,))
    assert r["num_videos"] == 2
    assert r["top1"] == 50.0


def test_finetune_step_with_mixup():
    model = InternVideo2(TINY)
    video = jax.random.normal(jax.random.key(0), (4, 1, 28, 28, 3))
    labels = jnp.array([0, 1, 2, 3])
    params = model.init(jax.random.key(1), video)["params"]
    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )
    cfg = FinetuneConfig(
        mixup=MixupConfig(num_classes=6), num_classes=6
    )
    step = jax.jit(make_finetune_step(model, cfg))
    batch = {"video": video, "label": labels}
    st, m = step(state, batch, jax.random.key(2))
    assert bool(m["finite"])
    losses = [float(m["loss"])]
    for _ in range(3):
        st, m = step(st, batch, jax.random.key(2))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_validate_and_final_test():
    model = InternVideo2(TINY)
    video = jax.random.normal(jax.random.key(0), (2, 1, 28, 28, 3))
    params = model.init(jax.random.key(1), video)

    @jax.jit
    def fwd(v):
        return model.apply(params, v).logits

    data = [
        {"video": video, "label": np.array([0, 1])},
        {"video": video + 1, "label": np.array([2, 3])},
    ]
    m = validate(fwd, data)
    assert 0.0 <= m["top1"] <= 100.0

    views = [
        {"video": video, "label": np.array([0, 1]), "video_id": ["a", "b"]},
        {"video": video * 1.1, "label": np.array([0, 1]), "video_id": ["a", "b"]},
    ]
    r = final_test(fwd, views)
    assert r["num_videos"] == 2


def test_multiview_merge_across_accumulators():
    """Host-merge semantics: two partial ensembles (disjoint view shards of
    the same videos) merge to the single-accumulator result."""
    import numpy as np

    from internvideo_tpu.eval.classification import MultiViewAccumulator

    rng = np.random.default_rng(0)
    vids = ["a", "b", "c"]
    labels = {"a": 0, "b": 1, "c": 2}
    views = [(v, rng.standard_normal(4).astype(np.float32)) for v in vids
             for _ in range(4)]

    full = MultiViewAccumulator()
    h0, h1 = MultiViewAccumulator(), MultiViewAccumulator()
    for i, (v, logit) in enumerate(views):
        full.add([v], logit[None], np.asarray([labels[v]]))
        (h0 if i % 2 == 0 else h1).add(
            [v], logit[None], np.asarray([labels[v]])
        )
    h0.merge(dict(h1.probs), h1.labels)
    r_full, r_merged = full.result(), h0.result()
    assert r_full == r_merged, (r_full, r_merged)
