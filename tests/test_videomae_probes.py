"""VideoMAE pixel pretrain + probing heads + profiling utils."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from internvideo_tpu.data.masking import tube_keep_indices
from internvideo_tpu.models.internvideo2 import InternVideo2Config
from internvideo_tpu.models.probes import ProbeConfig, ProbedClassifier
from internvideo_tpu.models.videomae import VideoMAEConfig, VideoMAEPretrain
from internvideo_tpu.utils.profiling import timed

ENC = InternVideo2Config(
    embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
    patch_size=14, img_size=28, num_frames=4, tubelet_size=2,
    clip_embed_dim=16, norm_type="layernorm", qk_normalization=False,
    init_values=0.0, attn_impl="xla",
)


def test_videomae_loss_and_overfit():
    cfg = VideoMAEConfig(
        encoder=ENC, decoder_dim=32, decoder_depth=1, decoder_heads=2,
    )
    model = VideoMAEPretrain(cfg)
    video = jax.random.normal(jax.random.key(0), (2, 4, 28, 28, 3))
    keep = tube_keep_indices(jax.random.key(1), 2, 2, 4, mask_ratio=0.5)
    params = model.init(jax.random.key(2), video, keep)["params"]
    out = model.apply({"params": params}, video, keep)
    assert out.pred.shape == (2, ENC.num_patches, 2 * 14 * 14 * 3)
    assert np.isfinite(float(out.loss))

    tx = optax.adam(1e-3)
    st = tx.init(params)

    @jax.jit
    def step(params, st):
        loss, g = jax.value_and_grad(
            lambda p: model.apply({"params": p}, video, keep).loss
        )(params)
        up, st = tx.update(g, st, params)
        return optax.apply_updates(params, up), st, loss

    losses = []
    for _ in range(5):
        params, st, l = step(params, st)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_probes():
    video = jax.random.normal(jax.random.key(0), (2, 4, 28, 28, 3))
    for ptype, kwargs in [
        ("linear", {}),
        ("attentive", {}),
        ("cat", {"cat_layers": (0, 1)}),
    ]:
        cfg = ProbeConfig(
            encoder=ENC, num_classes=5, probe_type=ptype, pool_heads=2,
            **kwargs,
        )
        model = ProbedClassifier(cfg)
        params = nn.unbox(model.init(jax.random.key(1), video)["params"])
        logits = model.apply({"params": params}, video)
        assert logits.shape == (2, 5), ptype

        # backbone gradient is zero (stop_gradient), head gradient nonzero
        def loss(p):
            return jnp.sum(model.apply({"params": p}, video))

        g = jax.grad(loss)(params)
        bb = sum(
            float(jnp.sum(jnp.abs(x)))
            for x in jax.tree.leaves(g["backbone"])
        )
        head = float(jnp.sum(jnp.abs(g["probe_head"]["kernel"])))
        assert bb == 0.0, ptype
        assert head > 0, ptype


def test_timed():
    results = {}
    with timed("block", results):
        _ = sum(range(1000))
    assert "block" in results and results["block"] >= 0
