"""InternVideo-Next stage-1: diffusion loss + masked reconstruction model."""

import jax
import jax.numpy as jnp
import numpy as np

from internvideo_tpu.models.internvideo2 import InternVideo2Config
from internvideo_tpu.models.next_jepa import (
    DiffusionLoss,
    InternVideoNextS1,
    NextS1Config,
    cosine_alpha_bar,
)

ENC = InternVideo2Config(
    embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
    patch_size=14, img_size=28, num_frames=2, tubelet_size=1,
    clip_embed_dim=16, num_classes=0, attn_impl="xla",
)


def test_cosine_schedule():
    ab = cosine_alpha_bar(1000)
    assert ab.shape == (1000,)
    assert np.all(np.diff(ab) < 0) and ab[0] < 1.0 and ab[-1] > 0.0


def test_diffusion_loss_and_sample():
    model = DiffusionLoss(target_dim=12, z_dim=8, width=32, depth=2,
                          timesteps=100)
    target = jax.random.normal(jax.random.key(0), (16, 12))
    z = jax.random.normal(jax.random.key(1), (16, 8))
    params = model.init(jax.random.key(2), target, z, jax.random.key(3))
    loss = model.apply(params, target, z, jax.random.key(3))
    assert np.isfinite(float(loss))
    # masked variant
    mask = jnp.zeros(16).at[:4].set(1.0)
    lm = model.apply(params, target, z, jax.random.key(3), mask=mask)
    assert np.isfinite(float(lm))
    samp = model.apply(params, z, jax.random.key(4), 10, method="sample")
    assert samp.shape == (16, 12) and np.isfinite(np.asarray(samp)).all()


def test_next_s1_forward_and_training():
    import optax
    from internvideo_tpu.train.state import TrainState

    cfg = NextS1Config(
        encoder=ENC, clip_output_dim=24, clip_final_output_dim=16,
        clip_return_layers=1, decoder_depth=1, decoder_heads=2,
        diff_width=32, diff_depth=1,
    )
    model = InternVideoNextS1(cfg)
    video = jax.random.normal(jax.random.key(0), (2, 2, 28, 28, 3))
    n = ENC.num_patches
    keep = jnp.broadcast_to(jnp.arange(n // 2, dtype=jnp.int32), (2, n // 2))
    params = model.init(
        jax.random.key(1), video, keep, jax.random.key(2)
    )["params"]
    out = model.apply({"params": params}, video, keep, jax.random.key(2))
    assert out.clip_middle.shape[0] == 1
    assert np.isfinite(float(out.reconstruction_loss))

    # joint loss decreases when overfitting a fixed batch
    tx = optax.adam(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )
    tgt_mid = jax.random.normal(jax.random.key(5), out.clip_middle.shape)
    tgt_mid = tgt_mid / jnp.linalg.norm(tgt_mid, axis=-1, keepdims=True)

    @jax.jit
    def step(state, rng):
        def loss_fn(p):
            o = model.apply({"params": p}, video, keep, rng)
            align = jnp.mean(2 - 2 * jnp.sum(o.clip_middle * tgt_mid, -1))
            return align + 0.5 * o.reconstruction_loss, o

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads), loss

    losses = []
    st = state
    for i in range(4):
        st, l = step(st, jax.random.key(9))
        losses.append(float(l))
    assert losses[-1] < losses[0]
