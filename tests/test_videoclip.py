"""VideoCLIP stage-2: BERT tower, similarity/losses, full train step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from internvideo_tpu.models.bert import BertConfig, BertModel
from internvideo_tpu.models.internvideo2 import InternVideo2Config
from internvideo_tpu.models.videoclip import VideoCLIP, VideoCLIPConfig
from internvideo_tpu.train.engines.clip import (
    CLIPLossConfig,
    get_sim,
    make_clip_train_step,
    mlm_corrupt,
    vtc_loss,
)
from internvideo_tpu.train.state import TrainState

BERT_TINY = BertConfig(
    vocab_size=128, hidden_size=32, num_layers=4, num_heads=2,
    intermediate_size=64, fusion_layer=2, dropout=0.0, attn_impl="xla",
)
VIS_TINY = InternVideo2Config(
    embed_dim=48, depth=2, num_heads=2, mlp_ratio=4.0,
    patch_size=14, img_size=56, num_frames=2, tubelet_size=1,
    clip_embed_dim=32, num_classes=0, attn_impl="xla",
)


def test_bert_modes():
    model = BertModel(BERT_TINY)
    ids = jnp.ones((2, 10), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32).at[1, 7:].set(0)
    vis = jnp.zeros((2, 5, 32))
    params = model.init(jax.random.key(0), ids, mask)
    # text mode: layers [0, fusion)
    out = model.apply(params, ids, mask, mode="text")
    assert out.last_hidden_state.shape == (2, 10, 32)
    # multimodal: needs cross-attention params
    params_mm = model.init(
        jax.random.key(0), ids, mask, vision_embeds=vis, mode="multimodal",
        with_mlm_logits=True,
    )
    out_mm = model.apply(
        params_mm, ids, mask, vision_embeds=vis, mode="multimodal",
        with_mlm_logits=True,
    )
    assert out_mm.mlm_logits.shape == (2, 10, 128)
    # fusion mode consumes precomputed embeds
    out_f = model.apply(
        params_mm, encoder_embeds=out.last_hidden_state,
        attention_mask=mask, vision_embeds=vis, mode="fusion",
    )
    assert out_f.pooled.shape == (2, 32)


def test_padding_mask_blocks_attention():
    """Changing a padded token must not change unpadded outputs."""
    model = BertModel(BERT_TINY)
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32).at[0, 6:].set(0)
    params = model.init(jax.random.key(0), ids, mask)
    out1 = model.apply(params, ids, mask, mode="text")
    ids2 = ids.at[0, 7].set(55)
    out2 = model.apply(params, ids2, mask, mode="text")
    np.testing.assert_allclose(
        out1.last_hidden_state[:, :6], out2.last_hidden_state[:, :6],
        atol=1e-6,
    )


def test_get_sim_and_vtc():
    v = jax.random.normal(jax.random.key(0), (4, 8))
    t = jax.random.normal(jax.random.key(1), (4, 8))
    s_v2t, s_t2v = get_sim(v, t, temp=0.07)
    assert s_v2t.shape == (4, 4)
    np.testing.assert_allclose(s_t2v, s_v2t.T, atol=1e-6)
    # frame-agg path
    v3 = jax.random.normal(jax.random.key(2), (4, 3, 8))
    s_v2t, _ = get_sim(v3, t, temp=1.0)
    assert s_v2t.shape == (4, 4)
    # identical pairs → low loss; idx duplicates handled
    idx = jnp.array([0, 1, 2, 2])
    loss = vtc_loss(v, t, idx, 0.07)
    assert jnp.isfinite(loss)
    loss_self = vtc_loss(v, v, None, 0.07)
    loss_rand = vtc_loss(v, t, None, 0.07)
    assert float(loss_self) < float(loss_rand)


def test_mlm_corrupt():
    cfg = CLIPLossConfig(
        mlm_probability=0.9, vocab_size=128, mask_token_id=103,
        pad_token_id=0, cls_token_id=101,
    )
    ids = jnp.full((4, 32), 7, jnp.int32).at[:, 0].set(101).at[:, 30:].set(0)
    out, labels = mlm_corrupt(jax.random.key(0), ids, cfg)
    # cls and pads never masked
    assert np.all(np.asarray(labels[:, 0]) == -100)
    assert np.all(np.asarray(labels[:, 30:]) == -100)
    masked = np.asarray(labels != -100)
    assert masked.sum() > 0
    # ~80% of masked become [MASK]
    frac_mask_tok = (np.asarray(out)[masked] == 103).mean()
    assert 0.6 < frac_mask_tok < 0.95


def test_clip_train_step():
    cfg = VideoCLIPConfig(vision=VIS_TINY, text=BERT_TINY, embed_dim=24)
    model = VideoCLIP(cfg)
    b, l = 4, 12
    video = jax.random.normal(jax.random.key(0), (b, 2, 56, 56, 3))
    ids = jax.random.randint(jax.random.key(1), (b, l), 1, 120)
    mask = jnp.ones((b, l), jnp.int32)
    batch = {
        "video": video, "input_ids": ids, "attention_mask": mask,
        "idx": jnp.arange(b),
    }
    tx = optax.adamw(1e-4)
    loss_cfg = CLIPLossConfig(vocab_size=128, mlm_probability=0.3)
    step = make_clip_train_step(model, loss_cfg)

    params = model.init(
        jax.random.key(2), video, ids, mask, init_all_branches=True
    )["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )
    jstep = jax.jit(step)
    state1, metrics = jstep(state, batch, jax.random.key(3))
    assert bool(metrics["finite"]), metrics
    for k in ("loss_vtc", "loss_vtm", "loss_mlm"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    # overfit a fixed batch: total loss drops
    st, losses = state1, [float(metrics["loss"])]
    for _ in range(3):
        st, m = jstep(st, batch, jax.random.key(3))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_stage2_uta_train_step():
    """Full stage-2 step: frozen teacher + shared mask + masked student fwd +
    UTA/VTC/VTM/MLM — the flagship recipe (internvideo2_stage2_visual.py:83).
    """
    from internvideo_tpu.models.pretrain import PretrainConfig
    from internvideo_tpu.models.teachers import CLIPTeacher, TeacherConfig

    teacher_cfg = TeacherConfig(
        embed_dim=48, depth=3, num_heads=2, mlp_ratio=2.0,
        patch_size=14, img_size=56, clip_embed_dim=24,
        return_layers=2, tubelet_size=1, attn_impl="xla",
    )
    pre_cfg = PretrainConfig(
        encoder=VIS_TINY,
        clip_output_dim=48,  # teacher hidden dim
        clip_final_output_dim=24,  # teacher projector dim
        clip_return_layers=2,
        mae_return_layers=0,  # stage-2: CLIP-align only
    )
    cfg = VideoCLIPConfig(
        vision=VIS_TINY, text=BERT_TINY, embed_dim=24, pretrain=pre_cfg
    )
    model = VideoCLIP(cfg)
    teacher = CLIPTeacher(teacher_cfg)

    b, l = 4, 12
    video = jax.random.normal(jax.random.key(0), (b, 2, 56, 56, 3))
    ids = jax.random.randint(jax.random.key(1), (b, l), 1, 120)
    mask = jnp.ones((b, l), jnp.int32)
    batch = {
        "video": video, "input_ids": ids, "attention_mask": mask,
        "idx": jnp.arange(b),
    }
    teacher_params = teacher.init(jax.random.key(5), video)

    loss_cfg = CLIPLossConfig(
        vocab_size=128, mlm_probability=0.3,
        uta=1.0, mask_type="attention", mask_ratio=0.5,
    )
    step = make_clip_train_step(
        model, loss_cfg, clip_teacher=teacher, teacher_params=teacher_params
    )
    params = model.init(
        jax.random.key(2), video, ids, mask, init_all_branches=True
    )["params"]
    # the stage-2 tower carries the UTA decoders
    assert any(k.startswith("clip_decoder") for k in params["vision_encoder"])
    tx = optax.adamw(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )
    jstep = jax.jit(step)
    state1, metrics = jstep(state, batch, jax.random.key(3))
    assert bool(metrics["finite"]), metrics
    for k in ("loss_uta", "loss_vtc", "loss_vtm", "loss_mlm"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    # UTA starts near 2 (random student vs l2-normed teacher) and must drop
    st, first_uta = state1, float(metrics["loss_uta"])
    losses = [float(metrics["loss"])]
    for _ in range(4):
        st, m = jstep(st, batch, jax.random.key(3))
        losses.append(float(m["loss"]))
    assert float(m["loss_uta"]) < first_uta, (first_uta, m["loss_uta"])
    assert losses[-1] < losses[0], losses


def test_stage2_masked_forward_shapes():
    """The masked stage-2 forward sees only cls + visible tokens, and the
    unmasked eval forward still works on the same params."""
    from internvideo_tpu.models.pretrain import PretrainConfig

    pre_cfg = PretrainConfig(
        encoder=VIS_TINY, clip_output_dim=40, clip_final_output_dim=24,
        clip_return_layers=2, mae_return_layers=0,
    )
    cfg = VideoCLIPConfig(
        vision=VIS_TINY, text=BERT_TINY, embed_dim=24, pretrain=pre_cfg
    )
    model = VideoCLIP(cfg)
    b, l = 2, 8
    video = jax.random.normal(jax.random.key(0), (b, 2, 56, 56, 3))
    ids = jnp.ones((b, l), jnp.int32)
    mask = jnp.ones((b, l), jnp.int32)
    params = model.init(
        jax.random.key(1), video, ids, mask, init_all_branches=True
    )
    n_tokens = VIS_TINY.num_patches  # 2 * 4 * 4 = 32
    keep = jnp.broadcast_to(jnp.arange(16, dtype=jnp.int32)[None], (b, 16))
    out = model.apply(params, video, ids, mask, keep_indices=keep)
    assert out.vision_embeds.shape[1] == 1 + 16  # cls + visible
    assert out.clip_middle.shape == (2, b, 1 + 16, 40)
    assert out.clip_final.shape == (b, 24)
    # unmasked eval forward: full tokens, no align outputs
    out_full = model.apply(params, video, ids, mask)
    assert out_full.vision_embeds.shape[1] == 1 + n_tokens
    assert out_full.clip_middle is None
