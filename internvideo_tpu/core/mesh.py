"""Global device mesh and logical-axis sharding rules.

The reference reaches scale with a zoo of backends — DDP, DeepSpeed ZeRO-1/2/3
(InternVideo2/single_modality/utils.py:814-907), FSDP2/HSDP + a 3-axis
(dp, sp, tp) data mesh (InternVideo3_sft/xtuner/v1/train/trainer.py:953-986),
Ulysses SP all-to-alls and an EP dispatcher. On TPU all of those collapse into
ONE `jax.sharding.Mesh` with named axes and GSPMD partition specs; XLA inserts
the collectives.

Axes of the global mesh (any of them may have size 1):

  replica  pure data parallelism across slices — rides DCN in multi-slice pods
  fsdp     parameter/optimizer sharding (ZeRO-3 / FSDP equivalent) — ICI
  seq      sequence parallelism (Ulysses all-to-all / context parallel) — ICI
  tensor   tensor parallelism (megatron-style col/row sharding) — ICI
  expert   expert parallelism for MoE layers — ICI

Model code never names mesh axes directly. Modules annotate parameters and
activations with *logical* axis names ('embed', 'mlp', 'heads', ...) and the
rules in `logical_axis_rules()` map those to mesh axes — flipping a model from
pure-DP to FSDP+TP is a config change, not a code change.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

# Canonical mesh axis names, outermost (DCN) to innermost (ICI).
MESH_AXES = ("replica", "fsdp", "seq", "tensor", "expert")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Sizes for each mesh axis. -1 means "absorb all remaining devices"."""

    replica: int = 1
    fsdp: int = -1
    seq: int = 1
    tensor: int = 1
    expert: int = 1

    def resolve(self, n_devices: int) -> dict[str, int]:
        sizes = {a: getattr(self, a) for a in MESH_AXES}
        fixed = math.prod(v for v in sizes.values() if v != -1)
        free = [a for a, v in sizes.items() if v == -1]
        if len(free) > 1:
            raise ValueError(f"at most one mesh axis may be -1, got {free}")
        if free:
            if n_devices % fixed != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes product {fixed}"
                )
            sizes[free[0]] = n_devices // fixed
        elif fixed != n_devices:
            raise ValueError(f"mesh sizes {sizes} != {n_devices} devices")
        return sizes


def create_mesh(
    config: MeshConfig | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the global mesh.

    Axis order follows MESH_AXES so that `replica` strides across the
    slowest-varying (DCN-adjacent) dimension of the device array and the
    communication-heavy axes (tensor/expert) land on nearest-neighbor ICI.
    """
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    config = config or MeshConfig()
    sizes = config.resolve(len(devices))
    shape = tuple(sizes[a] for a in MESH_AXES)
    if not explicit:
        # physical-locality-aware assignment: on a 3-D torus the naive
        # flat reshape puts tensor groups across the torus instead of on
        # nearest-neighbor ICI
        from jax.experimental import mesh_utils

        try:
            device_array = mesh_utils.create_device_mesh(shape)
            return Mesh(device_array, MESH_AXES)
        except (ValueError, NotImplementedError):
            pass  # exotic topologies: fall through to enumeration order
    device_array = np.asarray(devices).reshape(shape)
    return Mesh(device_array, MESH_AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(MeshConfig(fsdp=1), devices=jax.devices()[:1])


# ---------------------------------------------------------------------------
# Logical axis rules
# ---------------------------------------------------------------------------

# Each rule maps a logical axis name to one or more mesh axes (first rule whose
# mesh axes are all unused by earlier matches of the same spec wins — flax
# `logical_to_mesh` semantics).
DEFAULT_RULES: tuple[tuple[str, str | tuple[str, ...] | None], ...] = (
    # batch-like dims: data parallel over replica+fsdp (+seq when it exists)
    ("batch", ("replica", "fsdp")),
    # sequence/token dim of activations: sequence parallel
    ("seq_act", "seq"),
    # embedding (model) dim of parameters: FSDP-shard
    ("embed", "fsdp"),
    # ffn hidden / attention head dims of parameters: tensor parallel
    ("mlp", "tensor"),
    ("heads", "tensor"),
    ("kv_heads", "tensor"),
    # vocab / class dims
    ("vocab", "tensor"),
    # MoE
    ("expert", "expert"),
    ("expert_mlp", "tensor"),
    # dims that must stay replicated
    ("norm", None),
    ("qkv3", None),
    ("stack", None),
    ("kernel_spatial", None),
)


def logical_axis_rules(
    overrides: Sequence[tuple[str, str | tuple[str, ...] | None]] = (),
) -> tuple:
    """Default logical→mesh rules, with optional per-config overrides."""
    rules = dict(DEFAULT_RULES)
    rules.update(dict(overrides))
    return tuple(rules.items())


def logical_to_spec(logical_axes: Sequence[Optional[str]], rules=None) -> PartitionSpec:
    """Translate a tuple of logical axis names into a PartitionSpec.

    Matches flax `logical_to_mesh` semantics: a rule applies ALL of its
    mesh axes or none (a partially-free composite rule would silently
    shard a dim differently than the flax rule engine the Trainer uses).
    """
    rules = dict(rules or DEFAULT_RULES)
    parts = []
    used: set[str] = set()
    for name in logical_axes:
        mesh_axes = rules.get(name) if name is not None else None
        if mesh_axes is None:
            parts.append(None)
            continue
        if isinstance(mesh_axes, str):
            mesh_axes = (mesh_axes,)
        if any(a in used for a in mesh_axes):
            parts.append(None)  # all-or-nothing, like flax
            continue
        used.update(mesh_axes)
        parts.append(mesh_axes if len(mesh_axes) > 1 else mesh_axes[0])
    return PartitionSpec(*parts)


def logical_to_sharding(
    logical_axes: Sequence[Optional[str]], mesh: Mesh, rules=None
) -> NamedSharding:
    return NamedSharding(mesh, logical_to_spec(logical_axes, rules))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for host-fed batches: batch dim over all data-parallel axes."""
    return NamedSharding(mesh, PartitionSpec(("replica", "fsdp")))


def current_mesh() -> Optional[Mesh]:
    """The mesh active at trace time, from either mesh-context flavor:
    `jax.sharding.set_mesh`/`use_mesh` (abstract mesh) or the legacy
    `with mesh:` (thread-resources physical mesh). None if neither."""
    m = jax.sharding.get_abstract_mesh()
    if m is not None and not m.empty:
        return m
    try:
        from jax._src.mesh import thread_resources

        pm = thread_resources.env.physical_mesh
        if not pm.empty:
            return pm
    except Exception:
        pass
    return None


def constrain(x: jax.Array, logical_axes: Sequence[Optional[str]]) -> jax.Array:
    """Activation sharding constraint by LOGICAL axis names; no-op outside a
    mesh + flax logical-axis-rules context.

    flax's `nn.with_logical_constraint` silently no-ops under the legacy
    `with mesh:` context on jax>=0.8 (it only looks at the abstract mesh
    that `jax.sharding.set_mesh` installs), so model code that must pin an
    activation layout — e.g. to stop GSPMD's involuntary-full-remat fallback
    on batched gathers — goes through this helper instead."""
    from flax.linen import spmd

    rules = spmd.get_logical_axis_rules()
    if not rules:
        return x
    mesh = current_mesh()
    if mesh is None:
        return x
    spec = logical_to_spec(logical_axes, rules)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
