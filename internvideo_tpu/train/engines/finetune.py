"""Finetune engine: mixup/cutmix + soft-target CE classification.

Mirrors engine_for_finetuning.train_one_epoch (:25-100): mixup applied
on-device inside the step (the reference does it in the collate), soft CE,
then the shared optimizer machinery. Validation/final-test live in
eval/classification.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from internvideo_tpu.data.mixup import MixupConfig, mixup_cutmix
from internvideo_tpu.train.state import TrainState
from internvideo_tpu.train.step import make_accum_step, optax_global_norm


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    mixup: Optional[MixupConfig] = None
    label_smoothing: float = 0.1  # used when mixup is off
    num_classes: int = 400


def make_finetune_step(model, cfg: FinetuneConfig, mesh=None, *, grad_accum: int = 1):
    def loss_fn(params, batch, rng):
        video, labels = batch["video"], batch["label"]
        if cfg.mixup is not None:
            video, soft = mixup_cutmix(
                jax.random.fold_in(rng, 7), video, labels, cfg.mixup
            )
        else:
            off = cfg.label_smoothing / cfg.num_classes
            soft = (
                jax.nn.one_hot(labels, cfg.num_classes)
                * (1.0 - cfg.label_smoothing)
                + off
            )
        out = model.apply(
            {"params": params}, video,
            deterministic=False,
            rngs={"droppath": jax.random.fold_in(rng, 11)},
        )
        logits = out.logits.astype(jnp.float32)
        loss = -jnp.mean(
            jnp.sum(soft * jax.nn.log_softmax(logits, -1), axis=-1)
        )
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, {"acc": acc}

    return make_accum_step(loss_fn, grad_accum=grad_accum)
