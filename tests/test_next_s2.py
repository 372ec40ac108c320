"""InternVideo-Next stage-2: dynamic masking semantics + two-view
self-distillation training step (loss decreases against a frozen teacher)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.models.next_s2 import (
    InternVideoNextS2,
    NextS2Config,
    dynamic_keep_indices,
)
from internvideo_tpu.train.engines.next_s2 import (
    NextS2EngineConfig,
    make_next_s2_step,
)
from internvideo_tpu.train.state import TrainState


def test_dynamic_keep_indices():
    """Tokens with the largest temporal change stay visible."""
    b, t, l, c = 1, 3, 4, 8
    x = np.zeros((b, t, l, c), np.float32)
    # token 2 changes a lot between frames; token 0 a little; others static
    x[0, 1, 2] = 10.0
    x[0, 2, 2] = -10.0
    x[0, 1, 0] = 0.5
    keep, pred = dynamic_keep_indices(jnp.asarray(x), mask_ratio=0.75)
    n = t * l
    assert keep.shape == (1, 3) and pred.shape == (1, n - 3)
    kept = set(np.asarray(keep[0]).tolist())
    # grid positions of token 2 at frames 1,2 (importance rides the diff)
    assert {1 * l + 2, 2 * l + 2} <= kept
    assert set(np.asarray(pred[0]).tolist()) == set(range(n)) - kept


def test_next_s2_training_step():
    enc = InternVideo2Config(
        embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
        patch_size=8, img_size=16, num_frames=2, tubelet_size=1,
        clip_embed_dim=24, num_classes=0, attn_impl="xla",
    )
    teacher_enc = InternVideo2Config(
        embed_dim=48, depth=1, num_heads=2, mlp_ratio=2.0,
        patch_size=8, img_size=16, num_frames=2, tubelet_size=1,
        clip_embed_dim=24, num_classes=0, attn_impl="xla",
    )
    cfg = NextS2Config(
        encoder=enc, decoder_dim=32, decoder_depth=1, decoder_heads=2,
        selfdist_dim=48, align_dim=24,
    )
    student = InternVideoNextS2(cfg)
    teacher = InternVideo2(teacher_enc)

    video = jax.random.normal(jax.random.key(0), (2, 2, 16, 16, 3))
    n = enc.num_patches  # 2*2*2 = 8
    keep = jnp.broadcast_to(jnp.array([0, 2], jnp.int32)[None], (2, 2))
    pred = jnp.broadcast_to(
        jnp.array([1, 3, 4, 5, 6, 7], jnp.int32)[None], (2, 6)
    )
    params = student.init(jax.random.key(1), video, keep, pred)
    out = student.apply(params, video, keep, pred)
    assert out.pred.shape == (2, 6, 48)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.pred), axis=-1), 1.0, atol=1e-4
    )
    assert out.align.shape == (2, 24)

    teacher_params = teacher.init(jax.random.key(2), video)
    ecfg = NextS2EngineConfig(mask_ratio=0.75, num_views=2)
    step = make_next_s2_step(student, teacher, ecfg)

    tx = optax.adam(3e-3)
    from flax.core import meta
    p0 = meta.unbox(params)["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=p0,
        opt_state=tx.init(p0), tx=tx, apply_fn=student.apply,
    )
    batch = {"video": video}
    losses = []
    rng = jax.random.key(3)
    jstep = jax.jit(step)
    for i in range(8):
        state, m = jstep(state, teacher_params, batch, rng)
        losses.append(float(m["loss"]))
        assert float(m["finite"]) == 1.0
    assert losses[-1] < losses[0], losses
