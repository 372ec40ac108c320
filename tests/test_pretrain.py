"""Masked pretraining: masking generators, student forward, full train step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from internvideo_tpu.data.masking import (
    attention_guided_keep_indices,
    indices_to_mask,
    num_visible,
    random_keep_indices,
    tube_keep_indices,
)
from internvideo_tpu.models.internvideo2 import InternVideo2Config
from internvideo_tpu.models.pretrain import PretrainConfig, PretrainInternVideo2
from internvideo_tpu.models.teachers import CLIPTeacher, MAETeacher, TeacherConfig
from internvideo_tpu.train.engines.pretrain import (
    UMTPretrainConfig,
    make_pretrain_step,
)
from internvideo_tpu.train.state import TrainState


def test_masking_generators():
    rng = jax.random.key(0)
    keep = random_keep_indices(rng, 4, 100, 0.75)
    assert keep.shape == (4, 25)
    # strictly increasing (sorted, no duplicates)
    assert np.all(np.diff(np.asarray(keep), axis=1) > 0)

    keep = tube_keep_indices(rng, 2, t_size=4, spatial_size=16, mask_ratio=0.75)
    assert keep.shape == (2, 16)
    k = np.asarray(keep).reshape(2, 4, 4)
    # same spatial pattern every frame
    np.testing.assert_array_equal(k[:, 0] % 16, k[:, -1] % 16)

    attn = jax.random.uniform(rng, (6, 16))  # B*T=6 frames
    keep = attention_guided_keep_indices(rng, attn, 0.5, batch=2)
    assert keep.shape == (2, 3 * 8)
    assert np.all(np.diff(np.asarray(keep).reshape(2, 3, 8), axis=2) > 0)

    mask = indices_to_mask(keep, 3 * 16)
    assert mask.shape == (2, 48) and int(mask.sum()) == 2 * 24


def test_attention_guided_bias():
    """High-attention tokens should be kept far more often."""
    rng = jax.random.key(1)
    attn = jnp.ones((64, 16)).at[:, 0].set(100.0)
    keep = attention_guided_keep_indices(rng, attn, 0.5)
    frac_kept_0 = float(jnp.mean(jnp.any(keep == 0, axis=1)))
    assert frac_kept_0 > 0.95


TINY_ENC = InternVideo2Config(
    embed_dim=64, depth=4, num_heads=2, mlp_ratio=4.0,
    patch_size=14, img_size=56, num_frames=2, tubelet_size=1,
    clip_embed_dim=32, num_classes=0, attn_impl="xla",
)


def test_pretrain_student_shapes():
    cfg = PretrainConfig(
        encoder=TINY_ENC,
        clip_output_dim=48, clip_final_output_dim=40, clip_return_layers=2,
        mae_output_dim=24, mae_return_layers=1,
    )
    assert cfg.clip_indices == (3, 2)
    model = PretrainInternVideo2(cfg)
    video = jnp.zeros((2, 2, 56, 56, 3))
    n = TINY_ENC.num_patches
    n_vis = num_visible(n, 0.75)
    keep = jnp.broadcast_to(jnp.arange(n_vis, dtype=jnp.int32), (2, n_vis))
    params = model.init(jax.random.key(0), video, keep)
    out = model.apply(params, video, keep)
    assert out.clip_middle.shape == (2, 2, 1 + n_vis, 48)
    # l2 normalization
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.clip_middle), axis=-1), 1.0, rtol=1e-4
    )
    assert out.clip_final.shape == (2, 40)
    assert out.mae.shape == (1, 2, n_vis, 24)


@pytest.mark.parametrize("mask_type", ["tube", "attention"])
def test_pretrain_train_step(mask_type):
    t_full = 4  # full-rate; student sees 2 after td_ratio=2
    enc = TINY_ENC
    teacher_cfg = TeacherConfig(
        embed_dim=64, depth=2, num_heads=2, patch_size=14, img_size=56,
        clip_embed_dim=48, return_layers=2, attn_impl="xla",
    )
    mae_cfg = TeacherConfig(
        embed_dim=48, depth=2, num_heads=2, patch_size=14, img_size=56,
        return_layers=1, norm_type="layernorm", qk_normalization=False,
        tubelet_size=2, attn_impl="xla",
    )
    pre_cfg = PretrainConfig(
        encoder=enc,
        clip_output_dim=64, clip_final_output_dim=48, clip_return_layers=2,
        mae_output_dim=48, mae_return_layers=1,
    )
    student = PretrainInternVideo2(pre_cfg)
    clip_t = CLIPTeacher(teacher_cfg)
    mae_t = MAETeacher(mae_cfg)

    video = jax.random.normal(jax.random.key(0), (2, t_full, 56, 56, 3))
    student_video = video[:, ::2]
    n = enc.num_patches
    n_vis = num_visible(16, 0.75) * 2  # per-frame spatial vis x T

    clip_params = clip_t.init(jax.random.key(1), student_video)
    mae_params = mae_t.init(jax.random.key(2), video)
    keep = jnp.broadcast_to(jnp.arange(n_vis, dtype=jnp.int32), (2, n_vis))
    params = student.init(jax.random.key(3), student_video, keep)["params"]

    tx = optax.adamw(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=student.apply,
    )
    step = make_pretrain_step(
        student, clip_t, mae_t,
        UMTPretrainConfig(mask_type=mask_type, mask_ratio=0.75, td_ratio=2),
    )
    step = jax.jit(step)
    teacher_params = {"clip": clip_params, "mae": mae_params}
    batch = {"video": video}
    state1, metrics = step(state, teacher_params, batch, jax.random.key(4))
    assert bool(metrics["finite"])
    assert metrics["loss"].shape == ()
    # params actually moved
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state1.params
    )
    assert max(jax.tree.leaves(diff)) > 0
    # loss decreases over a few steps on a fixed batch
    losses = [float(metrics["loss"])]
    st = state1
    for i in range(3):
        st, m = step(st, teacher_params, batch, jax.random.key(4))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
