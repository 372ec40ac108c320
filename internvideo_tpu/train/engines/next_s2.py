"""InternVideo-Next stage-2 engine: two-view masked self-distillation.

Counterpart of InternVideo-Next/engines/engine_for_stage2.py:23-120: per
step, a frozen stage-1 teacher encodes the FULL clip (`embed_only`),
producing l2-normed patch features and a pooled projection; the student
runs TWO mask views (the reference draws two JEPA collator masks), predicts
the teacher's features at each view's masked positions through its
mask-token decoder, and aligns its pooled head — losses are 2−2cos, summed
over views, weighted by clip_loss_ratio.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from internvideo_tpu.train.step import make_accum_step


@dataclasses.dataclass(frozen=True)
class NextS2EngineConfig:
    mask_ratio: float = 0.75
    clip_loss_ratio: tuple[float, float] = (1.0, 1.0)  # (masked, align)
    num_views: int = 2


def _l2norm(x):
    return x / jnp.linalg.norm(
        x.astype(jnp.float32), axis=-1, keepdims=True
    ).astype(x.dtype)


def random_mask_indices(rng, batch: int, n: int, mask_ratio: float):
    """(keep (B, n_vis), pred (B, n_masked)) from a random permutation."""
    n_vis = int(round((1.0 - mask_ratio) * n))
    perm = jax.vmap(
        lambda k: jax.random.permutation(k, n)
    )(jax.random.split(rng, batch))
    keep = jnp.sort(perm[:, :n_vis], axis=-1).astype(jnp.int32)
    pred = jnp.sort(perm[:, n_vis:], axis=-1).astype(jnp.int32)
    return keep, pred


def make_next_s2_step(student, teacher, cfg: NextS2EngineConfig, *,
                      grad_accum: int = 1):
    """step(state, teacher_params, batch{"video"}, rng)."""
    n = student.config.encoder.num_patches

    def loss_fn(params, teacher_params, batch, rng):
        video = batch["video"]
        b = video.shape[0]
        # frozen stage-1 teacher, full clip (embed_only: tokens + pooled)
        t_out = teacher.apply(teacher_params, video)
        t_patch = jax.lax.stop_gradient(_l2norm(t_out.tokens[:, 1:]))
        t_pooled = jax.lax.stop_gradient(_l2norm(t_out.pooled))

        total = jnp.zeros(())
        metrics = {}
        for view in range(cfg.num_views):
            keep, pred_idx = random_mask_indices(
                jax.random.fold_in(rng, view), b, n, cfg.mask_ratio
            )
            out = student.apply(
                {"params": params}, video, keep, pred_idx,
                deterministic=False,
                rngs={"droppath": jax.random.fold_in(rng, 100 + view)},
            )
            tgt = jnp.take_along_axis(
                t_patch, pred_idx[..., None], axis=1
            )
            loss_masked = jnp.mean(
                2.0 - 2.0 * jnp.sum(
                    out.pred.astype(jnp.float32)
                    * tgt.astype(jnp.float32), axis=-1
                )
            )
            loss_align = jnp.mean(
                2.0 - 2.0 * jnp.sum(
                    out.align.astype(jnp.float32)
                    * t_pooled.astype(jnp.float32), axis=-1
                )
            )
            total = total + (
                cfg.clip_loss_ratio[0] * loss_masked
                + cfg.clip_loss_ratio[1] * loss_align
            )
            metrics[f"loss_masked_v{view}"] = loss_masked
            metrics[f"loss_align_v{view}"] = loss_align
        return total, metrics

    return make_accum_step(loss_fn, grad_accum=grad_accum)
