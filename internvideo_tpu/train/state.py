"""Sharded train state: params + optimizer state laid out on the global mesh.

GSPMD does the work of the reference's DeepSpeed-ZeRO / FSDP2 stacks
(single_modality/utils.py:814-907, xtuner/v1/model/dense/dense.py:167-293):
parameters carry logical-axis metadata from the modules; here those are
resolved against the mesh into NamedShardings, and params/opt-state are
*created directly sharded* inside jit so no host ever holds the full model.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import linen as nn
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from internvideo_tpu.core.mesh import DEFAULT_RULES


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    # model EMA (reference: timm ModelEma in run_finetuning.py:74,520):
    # ema_params tracks decay*ema + (1-decay)*params each step when set
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                new_ema, new_params,
            )
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt,
            ema_params=new_ema,
        )


def param_shardings(abstract_boxed_params, mesh: Mesh, rules=None):
    """Logical annotations (flax boxes) -> NamedShardings on `mesh`."""
    rules = rules or DEFAULT_RULES
    specs = nn.get_partition_spec(abstract_boxed_params)
    return nn.logical_to_mesh_sharding(specs, mesh, list(rules))


def create_sharded_state(
    model: nn.Module,
    tx: optax.GradientTransformation,
    example_inputs: tuple,
    mesh: Mesh,
    rng: jax.Array,
    rules=None,
    init_kwargs: Optional[dict] = None,
    ema_decay: float = 0.0,
) -> TrainState:
    """Initialize a TrainState with every leaf born on its mesh shards."""
    init_kwargs = init_kwargs or {}

    def _init(rng):
        variables = model.init(rng, *example_inputs, **init_kwargs)
        params = nn.unbox(variables["params"])
        opt_state = tx.init(params)
        return TrainState(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            opt_state=opt_state,
            tx=tx,
            apply_fn=model.apply,
            ema_params=(
                jax.tree.map(lambda p: p, params) if ema_decay > 0 else None
            ),
            ema_decay=ema_decay,
        )

    abstract = jax.eval_shape(
        lambda r: model.init(r, *example_inputs, **init_kwargs), rng
    )
    p_shardings = param_shardings(abstract["params"], mesh, rules)

    # Optimizer-state leaves mirror the param they track (adam mu/nu etc.);
    # scalars and schedules stay replicated.
    def _like_params(abstract_opt, p_sh):
        flat_p = {
            tuple(str(getattr(k, "key", k)) for k in path): s
            for path, s in jax.tree_util.tree_flatten_with_path(p_sh)[0]
        }

        def resolve(path, leaf):
            keys = tuple(str(getattr(k, "key", k)) for k in path)
            # match the trailing param path inside the opt-state entry
            for start in range(len(keys)):
                if keys[start:] in flat_p:
                    return flat_p[keys[start:]]
            return NamedSharding(mesh, PartitionSpec())

        return jax.tree_util.tree_map_with_path(resolve, abstract_opt)

    abstract_state = jax.eval_shape(_init, rng)
    opt_shardings = _like_params(abstract_state.opt_state, p_shardings)
    state_shardings = TrainState(
        step=NamedSharding(mesh, PartitionSpec()),
        params=nn.unbox(p_shardings),
        opt_state=opt_shardings,
        tx=tx,
        apply_fn=model.apply,
        ema_params=(nn.unbox(p_shardings) if ema_decay > 0 else None),
        ema_decay=ema_decay,
    )
    with mesh:
        state = jax.jit(_init, out_shardings=state_shardings)(rng)
    return state


def sharded_frozen_variables(
    model: nn.Module,
    example_inputs: tuple,
    mesh: Mesh,
    rng: jax.Array,
    *,
    rules=None,
    checkpoint: Optional[str] = None,
    init_kwargs: Optional[dict] = None,
):
    """Frozen (teacher) variables born on their mesh shards.

    Teachers ride the train step as jit constants or arguments; either
    way their params must be sharded by the same logical rules as the
    student's — a plain `.init()` materializes the whole tower on the
    default device (OOM for the 6B CLIP teacher) and replicates it.

    `checkpoint`: path to a flat converted npz (tools/convert_cli
    output) — loads REAL teacher weights instead of random init (random
    teachers make UMT pretraining distill noise).
    """
    import numpy as np

    init_kwargs = init_kwargs or {}
    abstract = jax.eval_shape(
        lambda r: model.init(r, *example_inputs, **init_kwargs), rng
    )
    shardings = {}
    for coll, sub in abstract.items():
        if coll == "params":
            shardings[coll] = nn.unbox(param_shardings(sub, mesh, rules))
        else:  # aux collections (stats etc.): replicated
            shardings[coll] = jax.tree.map(
                lambda _: NamedSharding(mesh, PartitionSpec()),
                nn.unbox(sub),
            )
    if checkpoint is not None:
        from internvideo_tpu.tools.convert_cli import load_flat_params

        if set(abstract) != {"params"}:
            raise NotImplementedError(
                "checkpoint loading covers params-only teachers; got "
                f"collections {sorted(abstract)}"
            )
        loaded = load_flat_params(checkpoint)["params"]
        return {
            "params": jax.tree.map(
                lambda a, s, x: jax.device_put(
                    np.asarray(x).astype(a.dtype), s
                ),
                nn.unbox(abstract["params"]), shardings["params"], loaded,
            )
        }
    return jax.jit(
        lambda r: nn.unbox(model.init(r, *example_inputs, **init_kwargs)),
        out_shardings=shardings,
    )(rng)
