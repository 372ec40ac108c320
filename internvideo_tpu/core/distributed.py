"""Multi-host bootstrap and per-host data/eval sharding.

Counterpart of the reference's process bootstrap and rank plumbing:
  * rank discovery from OMPI/SLURM/torchrun env + init_process_group
    (InternVideo2/single_modality/utils.py:332-375,
    multi_modality/utils/distributed.py:69)
  * per-rank dataset sharding (DistributedSampler,
    dataset/__init__.py:409) and eval row sharding
    (tasks/retrieval_utils.py:371-379)

TPU-native shape: one `jax.distributed.initialize` handshake replaces the
env-var zoo; data-parallel input becomes a GLOBAL jax.Array assembled from
per-host shards (`jax.make_array_from_process_local_data`) so the same pjit
train step runs unchanged on 1 or N hosts; host-side merges ride
`multihost_utils.process_allgather` instead of gloo gathers.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list[int]] = None,
) -> bool:
    """Idempotent multi-process bootstrap. Returns True if distributed mode
    was initialized.

    Explicit args win; otherwise standard env vars are honored
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, which
    `jax.distributed.initialize` auto-detects, plus cloud-TPU metadata).
    A plain single-process run (no args, no env) is a no-op.
    """
    if jax.distributed.is_initialized():
        return True
    # NOTE: must run before anything touches the XLA backend (jax.devices
    # etc.) — hence the CLI calls this before building any model.
    explicit = any(
        a is not None for a in
        (coordinator_address, num_processes, process_id, local_device_ids)
    )
    has_env = any(
        k in os.environ
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "JAX_NUM_PROCESSES")
    )
    # cloud-TPU pod slices carry no JAX_* env vars — the coordinator is
    # auto-detected from TPU metadata; skipping initialize there would
    # silently run N independent un-synced copies
    pod_env = any(
        k in os.environ
        for k in ("TPU_WORKER_HOSTNAMES", "TPU_PROCESS_BOUNDS",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not (explicit or has_env or pod_env):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def host_shard_slice(n_items: int) -> slice:
    """Balanced contiguous [start, stop) of a length-n global list owned by
    this host (eval row sharding: retrieval_utils.py:371-379 equivalent)."""
    p, i = jax.process_count(), jax.process_index()
    start = (n_items * i) // p
    stop = (n_items * (i + 1)) // p
    return slice(start, stop)


def host_shard_indices(n_items: int) -> np.ndarray:
    s = host_shard_slice(n_items)
    return np.arange(s.start, s.stop)


def make_global_batch(local_batch, mesh: Mesh, spec: PartitionSpec = None):
    """Per-host local batch pytree -> global jax.Arrays sharded on batch.

    Each host passes ITS batch rows; the result is a global array whose
    leading dim is host-count × local-batch, laid out on the mesh's
    data-parallel axes. This is the TPU equivalent of DistributedSampler:
    hosts read disjoint data, the global array glues the shards.
    """
    if spec is None:
        # single source of truth for the dp batch spec
        from internvideo_tpu.core.mesh import batch_sharding

        sharding = batch_sharding(mesh)
    else:
        sharding = NamedSharding(mesh, spec)

    def leaf(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )

    return jax.tree.map(leaf, local_batch)


def process_allgather(x):
    """Gather host-local numpy values across processes (gloo-gather
    equivalent; eval merges, metric sync)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x)
