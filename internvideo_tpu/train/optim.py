"""Optimizer factory: AdamW + cosine schedule + ViT layer-wise LR decay.

Reference behaviors covered:
  * cosine LR/WD schedules with linear warmup
    (InternVideo2/single_modality/utils.py:468-487 cosine_scheduler,
    multi_modality/utils/scheduler.py:9-56)
  * layer-id LR decay for ViT finetuning
    (single_modality/optim_factory.py:24-100 LayerDecayValueAssigner)
  * no-weight-decay sets: norms, biases, pos_embed, cls_token, layerscale
    (optim_factory.py get_parameter_groups; internvideo2.py:no_weight_decay)

Implemented as optax transforms over the param pytree — param "groups" become
pytree masks, so the whole optimizer is one XLA-compiled update.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-4
    min_lr: float = 1e-6
    warmup_steps: int = 0
    total_steps: int = 10_000
    weight_decay: float = 0.05
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    clip_grad_norm: Optional[float] = 3.0
    layer_decay: Optional[float] = None  # e.g. 0.75 for finetune
    num_layers: Optional[int] = None  # required when layer_decay is set
    # Probing (run_linear_probing.py / internvideo2_ap.py): only params whose
    # path matches one of these regexes get updates; everything else frozen.
    trainable_patterns: Optional[tuple[str, ...]] = None
    # Per-name LR groups (utils/optimizer.py:31-112 different_lr: e.g. new
    # heads at a larger lr than the pretrained backbone): (regex, mult)
    # pairs, first match wins, default multiplier 1.0.
    lr_mult_patterns: Optional[tuple[tuple[str, float], ...]] = None


def cosine_schedule(
    base: float, final: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    if warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=base,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=final,
        )
    return optax.cosine_decay_schedule(
        base, decay_steps=total_steps, alpha=final / max(base, 1e-30)
    )


_NO_DECAY_PAT = re.compile(
    r"(bias|scale|gamma|cls_token|pos_embed|norm|ls1|ls2|logit_scale|temp)"
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def no_decay_mask(params) -> dict:
    """True where weight decay applies (2D+ kernels not in the no-decay set)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: (
            x.ndim >= 2 and not _NO_DECAY_PAT.search(_path_str(path).lower())
        ),
        params,
    )


def _layer_id_from_path(path_str: str, num_layers: int) -> int:
    """ViT layer id: embeddings -> 0, block i -> i+1, head/pooler -> last.

    Mirrors single_modality/optim_factory.py:30-43 get_num_layer_for_vit.
    """
    low = path_str.lower()
    if any(t in low for t in ("cls_token", "pos_embed", "patch_embed")):
        return 0
    m = re.search(r"blocks[._](\d+)", low)
    if m:
        return int(m.group(1)) + 1
    return num_layers + 1


def layer_decay_scales(params, decay: float, num_layers: int):
    """Per-param multiplicative LR scale: decay^(max_layer - layer_id)."""
    max_id = num_layers + 1

    def scale(path, x):
        lid = _layer_id_from_path(_path_str(path), num_layers)
        return decay ** (max_id - lid)

    return jax.tree_util.tree_map_with_path(scale, params)


def _scale_by_tree(scales):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    config: OptimizerConfig, params_example
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Build the full update chain. Returns (optimizer, lr_schedule)."""
    lr_sched = cosine_schedule(
        config.lr, config.min_lr, config.warmup_steps, config.total_steps
    )
    chain = []
    if config.clip_grad_norm:
        chain.append(optax.clip_by_global_norm(config.clip_grad_norm))
    chain.append(
        optax.scale_by_adam(b1=config.b1, b2=config.b2, eps=config.eps)
    )
    chain.append(
        optax.add_decayed_weights(
            config.weight_decay, mask=no_decay_mask(params_example)
        )
    )
    if config.layer_decay:
        assert config.num_layers is not None
        chain.append(
            _scale_by_tree(
                layer_decay_scales(
                    params_example, config.layer_decay, config.num_layers
                )
            )
        )
    if config.lr_mult_patterns:
        pats = [(re.compile(p), float(m)) for p, m in config.lr_mult_patterns]

        def _mult(path, _):
            s = _path_str(path)
            for pat, m in pats:
                if pat.search(s):
                    return m
            return 1.0

        chain.append(_scale_by_tree(
            jax.tree_util.tree_map_with_path(_mult, params_example)
        ))
    chain.append(optax.scale_by_learning_rate(lr_sched))
    tx = optax.chain(*chain)
    if config.trainable_patterns:
        pats = [re.compile(p) for p in config.trainable_patterns]
        labels = jax.tree_util.tree_map_with_path(
            lambda path, x: (
                "train" if any(p.search(_path_str(path)) for p in pats)
                else "freeze"
            ),
            params_example,
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx, lr_sched
