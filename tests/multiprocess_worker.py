"""Worker for the 2-process multi-host test (spawned by
test_multiprocess.py). Runs a tiny fsdp-sharded step over a global batch
assembled from per-host rows and prints the (identical) global loss."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
try:  # cross-process CPU collectives
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from internvideo_tpu.core import distributed as D

    assert D.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from internvideo_tpu.core.mesh import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig(replica=1, fsdp=-1))

    # each host contributes different rows; the global loss sees all of them
    local = np.full((2, 4), pid + 1.0, np.float32)
    gb = D.make_global_batch({"x": local}, mesh)
    assert gb["x"].shape == (2 * nproc, 4)

    w = jax.device_put(jnp.ones((4, 1)), NamedSharding(mesh, P()))

    @jax.jit
    def step(w, x):
        return jnp.mean(jnp.square(x @ w))

    loss = float(step(w, gb["x"]))
    sl = D.host_shard_slice(10)
    gathered = D.process_allgather(np.asarray([pid], np.int32))
    print(f"LOSS {loss}")
    print(f"SHARD {sl.start} {sl.stop}")
    print(f"GATHER {gathered.reshape(-1).tolist()}")


if __name__ == "__main__":
    main()
