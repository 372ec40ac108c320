"""jit-able train steps.

Each engine (pretrain/finetune/clip/sft) supplies a loss_fn; this module owns
the shared mechanics: grad, global-norm metric, optimizer apply. Grad
accumulation is a lax.scan over micro-batches (TPU equivalent of the
reference's micro-batch loop, xtuner/v1/engine/train_engine.py:226-310).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from internvideo_tpu.train.state import TrainState


def make_train_step(
    loss_fn: Callable,  # (params, apply_fn, batch, rngs) -> (loss, aux)
    *,
    grad_accum: int = 1,
    rng_names: tuple[str, ...] = (),
):
    """Build a train_step(state, batch, rng) -> (state, metrics) function."""

    def _grads(state: TrainState, batch, rng):
        rngs = {
            name: jax.random.fold_in(rng, i)
            for i, name in enumerate(rng_names)
        }
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.apply_fn, batch, rngs
        )
        return loss, aux, grads

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if grad_accum == 1:
            loss, aux, grads = _grads(state, batch, rng)
        else:
            # micro-batch scan: batch leaves are (accum, micro, ...)
            def body(carry, micro):
                mb, mrng = micro
                loss, aux, grads = _grads(state, mb, mrng)
                acc_loss, acc_grads = carry
                return (
                    acc_loss + loss,
                    jax.tree.map(jnp.add, acc_grads, grads),
                ), aux

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            micro_rngs = jax.random.split(rng, grad_accum)
            (loss_sum, grads), aux = jax.lax.scan(
                body, (jnp.zeros(()), zeros), (batch, micro_rngs)
            )
            loss = loss_sum / grad_accum
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            # whole-step metrics, not the last micro-batch's (same
            # reduction make_accum_step uses)
            aux = jax.tree.map(lambda a: jnp.mean(a, axis=0), aux)

        grad_norm = optax_global_norm(grads)
        state = state.apply_gradients(grads)
        # "finite" feeds the Trainer's halt_on_nan guard (the reference
        # all-gathers losses and aborts — engine_for_pretraining.py:153-163);
        # emitted here so every engine gets the guard, not just clip.
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "finite": jnp.isfinite(loss).astype(jnp.float32),
            **aux,
        }
        return state, metrics

    return train_step


def make_accum_step(loss_fn: Callable, *, grad_accum: int = 1):
    """Shared step factory for the engines.

    loss_fn(params, *extra, batch, rng) -> (loss, aux_metrics); returns
    step(state, *extra, batch, rng) -> (state, metrics). With grad_accum>1
    the batch leaves must arrive shaped (accum, micro, ...) (Trainer
    reshapes) and gradients average over a lax.scan of micro-batches — the
    TPU form of xtuner's micro-batch loop (train_engine.py:226-310).
    """

    def step(state: TrainState, *rest):
        *extra, batch, rng = rest
        rng = jax.random.fold_in(rng, state.step)

        def _grads(mb, mrng):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, *extra, mb, mrng
            )
            return loss, aux, grads

        if grad_accum == 1:
            loss, aux, grads = _grads(batch, rng)
        else:
            def body(carry, micro):
                mb, mrng = micro
                loss, aux, grads = _grads(mb, mrng)
                acc_loss, acc_grads = carry
                return (
                    acc_loss + loss,
                    jax.tree.map(jnp.add, acc_grads, grads),
                ), aux

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            micro_rngs = jax.random.split(rng, grad_accum)
            (loss_sum, grads), aux = jax.lax.scan(
                body, (jnp.zeros(()), zeros), (batch, micro_rngs)
            )
            loss = loss_sum / grad_accum
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            aux = jax.tree.map(lambda a: jnp.mean(a, axis=0), aux)

        grad_norm = optax_global_norm(grads)
        state = state.apply_gradients(grads)
        return state, {
            "loss": loss,
            "grad_norm": grad_norm,
            "finite": jnp.isfinite(loss).astype(jnp.float32),
            **aux,
        }

    return step


def optax_global_norm(tree) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree.leaves(tree))
    )


def classification_loss(params, apply_fn, batch, rngs):
    """Soft-target or integer-label CE (finetune engine's loss —
    engine_for_finetuning.py:25-100 uses SoftTargetCE with mixup)."""
    out = apply_fn(
        {"params": params}, batch["video"],
        deterministic=not rngs, rngs=rngs or None,
    )
    logits = out.logits.astype(jnp.float32)
    labels = batch["label"]
    if labels.ndim == logits.ndim:  # soft targets (mixup)
        loss = -jnp.mean(
            jnp.sum(labels * jax.nn.log_softmax(logits, -1), axis=-1)
        )
        acc = jnp.mean(
            jnp.argmax(logits, -1) == jnp.argmax(labels, -1)
        )
    else:
        loss = jnp.mean(
            -jax.nn.log_softmax(logits, -1)[
                jnp.arange(logits.shape[0]), labels
            ]
        )
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
    return loss, {"acc": acc}
