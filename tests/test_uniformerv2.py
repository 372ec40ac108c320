"""UniFormerV2: shapes, variants, trainability."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from internvideo_tpu.models.uniformerv2 import UniFormerV2, UniFormerV2Config

CFG = UniFormerV2Config(
    input_resolution=32, patch_size=8, width=32, layers=2, heads=2,
    t_size=4, dw_reduction=2.0, return_list=(0, 1), n_dim=32, n_head=2,
    num_classes=5,
)


def test_variants_forward():
    video = jax.random.normal(jax.random.key(0), (2, 4, 32, 32, 3))
    for cfg in (
        CFG,
        dataclasses.replace(CFG, no_lmhra=True),  # clip_vit_only_global
        dataclasses.replace(CFG, double_lmhra=False),
        dataclasses.replace(CFG, temporal_downsample=False),
        dataclasses.replace(CFG, frozen=True),
    ):
        model = UniFormerV2(cfg)
        params = model.init(jax.random.key(1), video)
        out = model.apply(params, video)
        assert out.shape == (2, 5)
        assert np.isfinite(np.asarray(out)).all()


def test_trains():
    model = UniFormerV2(CFG)
    video = jax.random.normal(jax.random.key(2), (4, 4, 32, 32, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    params = model.init(jax.random.key(3), video)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, video).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for _ in range(10):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
        last = float(loss)
    assert last < first, (first, last)
