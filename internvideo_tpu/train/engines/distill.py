"""Distillation engine: small student aligned to a big frozen encoder.

Mirrors engines/engine_for_distill.py:20-190 + models/internvideo2_distill.py:
the student is the pretrain skeleton with CLIP-align decoders only
(mae_return_layers=0); the teacher is a (1B/6B stage-2) InternVideo2 encoder
whose middle-layer features (l2-normed, at matching indices) and pooled
output are the targets; loss is the same 2−2cos alignment.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from internvideo_tpu.data.masking import random_keep_indices, tube_keep_indices
from internvideo_tpu.train.engines.pretrain import _align_loss
from internvideo_tpu.train.state import TrainState
from internvideo_tpu.train.step import make_accum_step, optax_global_norm


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    teacher_layer_indices: tuple[int, ...] = ()  # teacher layers to align
    mask_type: str = "tube"  # tube | random | none
    mask_ratio: float = 0.0
    loss_ratio: tuple[float, float] = (1.0, 1.0)  # (middle, final)


def make_distill_step(student, teacher, cfg: DistillConfig, *, grad_accum: int = 1):
    """step(state, teacher_params, batch{"video"}, rng)."""

    def teacher_targets(teacher_params, video, keep):
        out = teacher.apply(
            teacher_params, video,
            return_hidden_layers=sorted(set(cfg.teacher_layer_indices)),
        )
        hidden = dict(
            zip(sorted(set(cfg.teacher_layer_indices)), out.hidden_states)
        )
        layers = jnp.stack(
            [hidden[i] for i in cfg.teacher_layer_indices]
        )  # (K, B, 1+N, C)
        layers = layers / jnp.linalg.norm(
            layers.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(layers.dtype)
        if keep is not None:
            b = video.shape[0]
            gather = jnp.concatenate(
                [jnp.zeros((b, 1), jnp.int32), keep + 1], axis=1
            )
            layers = jnp.take_along_axis(
                layers, gather[None, :, :, None], axis=2
            )
        pooled = out.pooled / jnp.linalg.norm(
            out.pooled.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(out.pooled.dtype)
        return jax.lax.stop_gradient(layers), jax.lax.stop_gradient(pooled)

    def loss_fn(params, teacher_params, batch, rng):
        video = batch["video"]
        b, t = video.shape[:2]
        enc = student.config.encoder
        n_spatial = (enc.img_size // enc.patch_size) ** 2
        keep = None
        if cfg.mask_type == "tube" and cfg.mask_ratio > 0:
            keep = tube_keep_indices(
                rng, b, t // enc.tubelet_size, n_spatial, cfg.mask_ratio
            )
        elif cfg.mask_type == "random" and cfg.mask_ratio > 0:
            keep = random_keep_indices(
                rng, b, enc.num_patches, cfg.mask_ratio
            )
        if keep is None:
            keep = jnp.broadcast_to(
                jnp.arange(enc.num_patches, dtype=jnp.int32),
                (b, enc.num_patches),
            )

        tgt_mid, tgt_final = teacher_targets(teacher_params, video, keep)
        out = student.apply(
            {"params": params}, video, keep,
            deterministic=False,
            rngs={"droppath": jax.random.fold_in(rng, 1)},
        )
        loss_mid = _align_loss(out.clip_middle, tgt_mid)
        loss_final = (
            _align_loss(out.clip_final, tgt_final)
            if out.clip_final is not None else jnp.zeros(())
        )
        loss = cfg.loss_ratio[0] * loss_mid + cfg.loss_ratio[1] * loss_final
        return loss, {"loss_middle": loss_mid, "loss_final": loss_final}

    return make_accum_step(loss_fn, grad_accum=grad_accum)
