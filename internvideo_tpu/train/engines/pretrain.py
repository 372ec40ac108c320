"""UMT/MAE masked-pretraining engine.

One jit-able step reproducing engine_for_pretraining.train_one_epoch
(single_modality/engines/engine_for_pretraining.py:20-216):

  1. frozen CLIP teacher on the temporally-downsampled clip (+ attention map)
     and frozen MAE teacher on the full-rate clip (tubelet 2) — stop_gradient
  2. masking: tube / random / attention-guided (Gumbel-top-k ∼ multinomial)
  3. student forward on visible tokens only
  4. align losses 2 − 2·cos between l2-normed student decoders and teacher
     targets gathered at the same visible positions
  5. adamw step (grad clip etc. live in the optax chain)

The NaN all-gather abort (:153-163) becomes a jnp.isfinite flag in metrics —
the host trainer loop decides whether to halt (device-side branch would
force a sync every step).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from internvideo_tpu.data.masking import (
    attention_guided_keep_indices,
    random_keep_indices,
    tube_keep_indices,
)
from internvideo_tpu.train.step import make_accum_step


@dataclasses.dataclass(frozen=True)
class UMTPretrainConfig:
    mask_type: str = "tube"  # tube | random | attention
    mask_ratio: float = 0.8
    td_ratio: int = 2  # temporal downsample for student/CLIP vs MAE teacher
    clip_loss_ratio: tuple[float, float] = (1.0, 1.0)  # (middle, final)
    mae_loss_ratio: float = 1.0
    distill_final_features: bool = True


def _align_loss(student, target):
    """2 − 2·cos for l2-normalized features (engine :130-147)."""
    s = student.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return jnp.mean(2.0 - 2.0 * jnp.sum(s * t, axis=-1))


def make_pretrain_step(
    student_model,
    clip_teacher,
    mae_teacher,
    cfg: UMTPretrainConfig,
    *,
    grad_accum: int = 1,
):
    """Returns step(state, teacher_params, batch, rng) -> (state, metrics).

    teacher_params: {"clip": clip_variables, "mae": mae_variables} — frozen,
    passed as arguments (not closure constants) so they live once on device.
    batch: {"video": (B, T, H, W, 3)} full-rate clip.
    """

    def loss_fn(params, teacher_params, batch, rng):
        video = batch["video"]
        b, t = video.shape[:2]
        student_video = video[:, :: cfg.td_ratio]
        # temporal TOKEN count, not frame count — a tubelet-2 student has
        # half as many temporal grid positions as frames (matches
        # cli/train.py _num_visible_tokens and the distill engine)
        t_s = (
            student_video.shape[1]
            // student_model.config.encoder.tubelet_size
        )

        # --- frozen teachers ---
        z_clip, clip_final_t, attn = clip_teacher.apply(
            teacher_params["clip"], student_video
        )
        z_mae = mae_teacher.apply(teacher_params["mae"], video)
        z_clip, clip_final_t, attn, z_mae = jax.lax.stop_gradient(
            (z_clip, clip_final_t, attn, z_mae)
        )

        # --- masking ---
        n_spatial = attn.shape[-1]
        n_tokens = t_s * n_spatial
        if cfg.mask_type == "attention":
            keep = attention_guided_keep_indices(
                rng, attn, cfg.mask_ratio, batch=b
            )
        elif cfg.mask_type == "tube":
            keep = tube_keep_indices(rng, b, t_s, n_spatial, cfg.mask_ratio)
        elif cfg.mask_type == "random":
            keep = random_keep_indices(rng, b, n_tokens, cfg.mask_ratio)
        else:
            raise ValueError(cfg.mask_type)

        # --- student ---
        out = student_model.apply(
            {"params": params}, student_video, keep,
            deterministic=False,
            rngs={"droppath": jax.random.fold_in(rng, 1)},
        )

        # --- targets at visible positions ---
        gather_clip = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32), keep + 1], axis=1
        )  # cls + visible patches in teacher token space
        tgt_clip_middle = jnp.take_along_axis(
            z_clip, gather_clip[None, :, :, None], axis=2
        )
        tgt_mae = jnp.take_along_axis(
            z_mae, keep[None, :, :, None], axis=2
        )

        loss_clip_middle = _align_loss(out.clip_middle, tgt_clip_middle)
        if cfg.distill_final_features and cfg.clip_loss_ratio[1] > 0:
            loss_clip_final = _align_loss(out.clip_final, clip_final_t)
        else:
            loss_clip_final = jnp.zeros(())
        loss_mae = _align_loss(out.mae, tgt_mae)

        loss = (
            loss_clip_middle * cfg.clip_loss_ratio[0]
            + loss_clip_final * cfg.clip_loss_ratio[1]
            + loss_mae * cfg.mae_loss_ratio
        )
        aux = {
            "loss_clip_middle": loss_clip_middle,
            "loss_clip_final": loss_clip_final,
            "loss_mae": loss_mae,
        }
        return loss, aux

    return make_accum_step(loss_fn, grad_accum=grad_accum)
