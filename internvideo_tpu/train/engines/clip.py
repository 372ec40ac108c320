"""Stage-2 VideoCLIP losses and train step (VTC + VTM + MLM [+ UTA]).

Criterion parity (multi_modality/models/criterions.py):
  * get_sim (:15): l2-norm, temperature-scaled pairwise similarity, with
    mean/max frame aggregation when vision features are per-frame
  * VTC (:58-103): softmax-CE over the GLOBAL batch with idx-based soft
    targets (same-source pairs count as positives). The reference gathers
    with a differentiable all-gather (models/utils.py:193); under pjit this
    is just computing on the sharded global batch.
  * VTM (:105-183): hard-negative mining via multinomial over masked
    similarity (jax.random.categorical on masked logits here), 3B fusion
    forward, 2-way CE
  * MLM (:227-343): 80/10/10 token corruption on-device, fusion MLM CE
  * UTA (:345-533): 2−2cos alignment (shared with the pretrain engine)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from internvideo_tpu.train.state import TrainState
from internvideo_tpu.train.step import make_accum_step, optax_global_norm

NEG = -1e30


@dataclasses.dataclass(frozen=True)
class CLIPLossConfig:
    vtc: float = 1.0
    vtm: float = 1.0
    mlm: float = 1.0
    vtm_hard_neg: bool = True
    mlm_probability: float = 0.5
    mask_token_id: int = 103  # [MASK] for bert-base vocabs
    pad_token_id: int = 0
    cls_token_id: int = 101
    vocab_size: int = 30522
    # ---- stage-2 UTA (unmasked-token alignment) teacher branch ----
    # (internvideo2_stage2_visual.py:107-114 loss_uta, :155-236 encode_teacher;
    # criterions.py:458 new_UTA_Loss). uta > 0 requires the model's vision
    # tower to be the pretrain student (VideoCLIPConfig.pretrain) and a
    # frozen CLIP teacher passed to make_clip_train_step.
    uta: float = 0.0
    mask_type: str = "attention"  # attention | tube | random
    mask_ratio: float = 0.8
    clip_loss_ratio: tuple[float, float] = (1.0, 1.0)  # (middle, final)
    distill_final_features: bool = True


def get_sim(vision_proj, text_proj, temp=1.0, agg="mean"):
    """Pairwise sim (criterions.py:15-55); supports (B,C) or (B,T,C) vision."""
    v = vision_proj / jnp.linalg.norm(
        vision_proj.astype(jnp.float32), axis=-1, keepdims=True
    )
    t = text_proj / jnp.linalg.norm(
        text_proj.astype(jnp.float32), axis=-1, keepdims=True
    )
    if v.ndim == 3:
        s = jnp.einsum("mld,nd->mln", v, t) / temp
        s = s.mean(1) if agg == "mean" else s.max(1)
        return s, s.T
    s = v @ t.T / temp
    return s, s.T


def _idx_targets(idx, n):
    """Soft targets: same-idx pairs are positives, row-normalized."""
    if idx is None:
        return jnp.eye(n)
    m = (idx[:, None] == idx[None, :]).astype(jnp.float32)
    return m / jnp.sum(m, axis=1, keepdims=True)


def vtc_loss(vision_proj, text_proj, idx, temp, agg="mean"):
    sim_v2t, sim_t2v = get_sim(vision_proj, text_proj, temp, agg)
    targets = jax.lax.stop_gradient(_idx_targets(idx, sim_v2t.shape[0]))
    l_v2t = -jnp.mean(
        jnp.sum(jax.nn.log_softmax(sim_v2t, axis=1) * targets, axis=1)
    )
    l_t2v = -jnp.mean(
        jnp.sum(jax.nn.log_softmax(sim_t2v, axis=1) * targets, axis=1)
    )
    return (l_v2t + l_t2v) / 2


def mine_negatives(rng, vision_proj, text_proj, idx, temp, hard: bool):
    """Per-row negative indices for VTM (criterions.py:133-157)."""
    sim_v2t, sim_t2v = get_sim(vision_proj, text_proj, temp)
    n = sim_v2t.shape[0]
    pos_mask = (
        (idx[:, None] == idx[None, :]) if idx is not None
        else jnp.eye(n, dtype=bool)
    )
    r1, r2 = jax.random.split(rng)
    if hard:
        logits_v2t = jnp.where(pos_mask, NEG, sim_v2t)
        logits_t2v = jnp.where(pos_mask, NEG, sim_t2v)
        txt_neg = jax.random.categorical(r1, logits_v2t, axis=1)
        vis_neg = jax.random.categorical(r2, logits_t2v, axis=1)
    else:
        noise1 = jnp.where(pos_mask, NEG, jax.random.normal(r1, (n, n)))
        noise2 = jnp.where(pos_mask, NEG, jax.random.normal(r2, (n, n)))
        txt_neg = jnp.argmax(noise1, axis=1)
        vis_neg = jnp.argmax(noise2, axis=1)
    return vis_neg, txt_neg


def mlm_corrupt(rng, input_ids, cfg: CLIPLossConfig):
    """BERT 80/10/10 corruption (criterions.py:297-343), on-device.

    Returns (corrupted_ids, labels) with labels=-100 on unmasked positions.
    """
    r_sel, r_kind, r_rand = jax.random.split(rng, 3)
    special = (input_ids == cfg.pad_token_id) | (input_ids == cfg.cls_token_id)
    masked = (
        jax.random.bernoulli(r_sel, cfg.mlm_probability, input_ids.shape)
        & ~special
    )
    labels = jnp.where(masked, input_ids, -100)
    u = jax.random.uniform(r_kind, input_ids.shape)
    rand_ids = jax.random.randint(
        r_rand, input_ids.shape, 0, cfg.vocab_size
    )
    out = jnp.where(masked & (u < 0.8), cfg.mask_token_id, input_ids)
    out = jnp.where(masked & (u >= 0.8) & (u < 0.9), rand_ids, out)
    return out, labels


def mlm_loss_from_logits(logits, labels):
    valid = labels != -100
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        logp, jnp.maximum(labels, 0)[..., None], axis=-1
    )[..., 0]
    return -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1)


def _align_loss(student, target):
    """2 − 2·cos for l2-normalized features (criterions.py:481 uta_loss)."""
    return jnp.mean(
        2.0 - 2.0 * jnp.sum(
            student.astype(jnp.float32) * target.astype(jnp.float32), axis=-1
        )
    )


def _teacher_targets_and_mask(clip_teacher, teacher_params, video, rng, cfg):
    """Frozen-teacher forward + shared mask (encode_teacher :155-236).

    Returns (keep_indices, tgt_middle, tgt_final): the visible-token indices
    the student must use, and the teacher targets gathered at those
    positions (cls + visible).
    """
    from internvideo_tpu.data.masking import (
        attention_guided_keep_indices,
        random_keep_indices,
        tube_keep_indices,
    )

    b, t = video.shape[:2]
    teacher_img = clip_teacher.config.img_size
    if video.shape[2] != teacher_img:
        # bicubic resize to the teacher's resolution (:190-196)
        video = jax.image.resize(
            video, (b, t, teacher_img, teacher_img, video.shape[-1]),
            method="bicubic",
        )
    z, pooled, attn = clip_teacher.apply(teacher_params, video)
    z, pooled, attn = jax.lax.stop_gradient((z, pooled, attn))

    n_spatial = attn.shape[-1]
    if cfg.mask_type == "attention":
        keep = attention_guided_keep_indices(
            rng, attn, cfg.mask_ratio, batch=b
        )
    elif cfg.mask_type == "tube":
        keep = tube_keep_indices(rng, b, t, n_spatial, cfg.mask_ratio)
    elif cfg.mask_type == "random":
        keep = random_keep_indices(rng, b, t * n_spatial, cfg.mask_ratio)
    else:
        raise ValueError(cfg.mask_type)

    # teacher middle targets at visible positions: cls + (keep+1)
    gather = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), keep + 1], axis=1
    )
    tgt_middle = jnp.take_along_axis(z, gather[None, :, :, None], axis=2)
    return keep, tgt_middle, pooled


def make_clip_train_step(
    model, cfg: CLIPLossConfig, clip_teacher=None, teacher_params=None,
    *, grad_accum: int = 1,
):
    """step(state, batch, rng) for VideoCLIP stage-2.

    batch: {"video", "input_ids", "attention_mask", "idx"}.

    With cfg.uta > 0 and a (clip_teacher, teacher_params) pair, each step
    runs the frozen teacher, draws the shared mask, feeds the student the
    masked forward, and adds the UTA alignment loss — the contrastive
    losses then operate on the masked pooled features exactly like the
    reference stage-2 step (internvideo2_stage2_visual.py:83-152).
    """
    use_uta = cfg.uta > 0
    if use_uta and (clip_teacher is None or teacher_params is None):
        raise ValueError("cfg.uta > 0 needs clip_teacher + teacher_params")
    if cfg.mlm and max(cfg.mask_token_id, cfg.cls_token_id) >= cfg.vocab_size:
        # an out-of-range [MASK] id makes flax's Embed gather fill NaN
        # under jit — fail here, not as a mid-training NaN
        raise ValueError(
            f"vocab_size={cfg.vocab_size} does not cover the special ids "
            f"(mask={cfg.mask_token_id}, cls={cfg.cls_token_id})"
        )

    def loss_fn(params, batch, rng):
        r_neg, r_mlm, r_drop, r_mask = jax.random.split(rng, 4)
        var = {"params": params}
        keep = tgt_middle = tgt_final = None
        if use_uta:
            keep, tgt_middle, tgt_final = _teacher_targets_and_mask(
                clip_teacher, teacher_params, batch["video"], r_mask, cfg
            )
        out = model.apply(
            var, batch["video"], batch["input_ids"],
            batch["attention_mask"], keep_indices=keep, deterministic=False,
            rngs={"dropout": r_drop, "droppath": jax.random.fold_in(r_drop, 1)},
        )
        idx = batch.get("idx")
        losses = {}

        if use_uta:
            loss_mid = _align_loss(out.clip_middle, tgt_middle)
            if cfg.distill_final_features and cfg.clip_loss_ratio[1] > 0:
                loss_fin = _align_loss(out.clip_final, tgt_final)
            else:
                loss_fin = jnp.zeros(())
            losses["loss_uta"] = (
                loss_mid * cfg.clip_loss_ratio[0]
                + loss_fin * cfg.clip_loss_ratio[1]
            )

        if cfg.vtc:
            losses["loss_vtc"] = vtc_loss(
                out.vision_proj, out.text_proj, idx, out.temp
            )

        if cfg.vtm:
            vis_neg, txt_neg = jax.lax.stop_gradient(
                mine_negatives(
                    r_neg, out.vision_proj, out.text_proj, idx, out.temp,
                    cfg.vtm_hard_neg,
                )
            )
            b = out.vision_embeds.shape[0]
            vis_all = jnp.concatenate(
                [
                    out.vision_embeds,
                    out.vision_embeds[vis_neg],
                    out.vision_embeds,
                ], axis=0,
            )
            txt_all = jnp.concatenate(
                [
                    out.text_embeds,
                    out.text_embeds,
                    out.text_embeds[txt_neg],
                ], axis=0,
            )
            mask_all = jnp.concatenate(
                [
                    batch["attention_mask"],
                    batch["attention_mask"],
                    batch["attention_mask"][txt_neg],
                ], axis=0,
            )
            fused = model.apply(
                var, txt_all, mask_all, vis_all,
                deterministic=False, method="fusion",
                rngs={"dropout": jax.random.fold_in(r_drop, 2)},
            )
            logits = model.apply(
                var, fused.pooled, method="itm_logits"
            ).astype(jnp.float32)
            labels = jnp.concatenate(
                [jnp.ones((b,), jnp.int32), jnp.zeros((2 * b,), jnp.int32)]
            )
            losses["loss_vtm"] = jnp.mean(
                -jax.nn.log_softmax(logits)[jnp.arange(3 * b), labels]
            )

        if cfg.mlm:
            corrupted, labels = mlm_corrupt(r_mlm, batch["input_ids"], cfg)
            mlm_out = model.apply(
                var, corrupted, batch["attention_mask"], out.vision_embeds,
                deterministic=False, method="text_multimodal",
                rngs={"dropout": jax.random.fold_in(r_drop, 3)},
            )
            losses["loss_mlm"] = mlm_loss_from_logits(
                mlm_out.mlm_logits, labels
            )

        total = (
            cfg.uta * losses.get("loss_uta", 0.0)
            + cfg.vtc * losses.get("loss_vtc", 0.0)
            + cfg.vtm * losses.get("loss_vtm", 0.0)
            + cfg.mlm * losses.get("loss_mlm", 0.0)
        )
        return total, losses

    return make_accum_step(loss_fn, grad_accum=grad_accum)


def make_av_clip_train_step(
    model, cfg: CLIPLossConfig, media_type: str = "audio_video",
    *, grad_accum: int = 1,
):
    """Stage-2 audio-visual step for ONE media type.

    The reference trains each batch as a single media type drawn by the
    MetaLoader, with the same VTC/VTM/MLM criterion set applied to the
    per-media forwards (internvideo2_stage2_audiovisual.py:157-571); jit
    one step per media type and let the MetaLoader schedule decide which
    to invoke. batch: {"input_ids", "attention_mask", "idx", and "video"
    and/or "audio" per media_type}.
    """

    def loss_fn(params, batch, rng):
        r_neg, r_mlm, r_drop = jax.random.split(rng, 3)
        var = {"params": params}
        out = model.apply(
            var, batch["input_ids"], batch["attention_mask"],
            video=batch.get("video"), audio=batch.get("audio"),
            media_type=media_type, deterministic=False,
            rngs={
                "dropout": r_drop,
                "droppath": jax.random.fold_in(r_drop, 1),
            },
        )
        idx = batch.get("idx")
        losses = {}
        if cfg.vtc:
            losses["loss_vtc"] = vtc_loss(
                out.vision_proj, out.text_proj, idx, out.temp
            )
        if cfg.vtm:
            vis_neg, txt_neg = jax.lax.stop_gradient(
                mine_negatives(
                    r_neg, out.vision_proj, out.text_proj, idx, out.temp,
                    cfg.vtm_hard_neg,
                )
            )
            b = out.vision_embeds.shape[0]
            vis_all = jnp.concatenate(
                [out.vision_embeds, out.vision_embeds[vis_neg],
                 out.vision_embeds], axis=0,
            )
            txt_all = jnp.concatenate(
                [out.text_embeds, out.text_embeds,
                 out.text_embeds[txt_neg]], axis=0,
            )
            mask_all = jnp.concatenate(
                [batch["attention_mask"], batch["attention_mask"],
                 batch["attention_mask"][txt_neg]], axis=0,
            )
            fused = model.apply(
                var, txt_all, mask_all, vis_all,
                deterministic=False, method="fusion",
                rngs={"dropout": jax.random.fold_in(r_drop, 2)},
            )
            logits = model.apply(
                var, fused.pooled, method="itm_logits"
            ).astype(jnp.float32)
            labels = jnp.concatenate(
                [jnp.ones((b,), jnp.int32), jnp.zeros((2 * b,), jnp.int32)]
            )
            losses["loss_vtm"] = jnp.mean(
                -jax.nn.log_softmax(logits)[jnp.arange(3 * b), labels]
            )
        if cfg.mlm:
            corrupted, labels = mlm_corrupt(r_mlm, batch["input_ids"], cfg)
            mlm_out = model.apply(
                var, corrupted, batch["attention_mask"], out.vision_embeds,
                deterministic=False, method="text_multimodal",
                rngs={"dropout": jax.random.fold_in(r_drop, 3)},
            )
            losses["loss_mlm"] = mlm_loss_from_logits(
                mlm_out.mlm_logits, labels
            )
        total = (
            cfg.vtc * losses.get("loss_vtc", 0.0)
            + cfg.vtm * losses.get("loss_vtm", 0.0)
            + cfg.mlm * losses.get("loss_mlm", 0.0)
        )
        return total, losses

    return make_accum_step(loss_fn, grad_accum=grad_accum)
