"""Multi-host bootstrap: two REAL processes (not virtual devices) form a
global mesh, assemble a global batch from per-host shards, and agree on the
global loss — the TPU analogue of the reference's MultiProcessTestCase
harness (xtuner/_testing/testcase.py:15)."""

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_stateful_iterator_host_sharding():
    """Two shards cover the dataset disjointly and resume mid-epoch."""
    from internvideo_tpu.data.loader import StatefulIterator

    a = StatefulIterator(10, seed=3, num_shards=2, shard_id=0)
    b = StatefulIterator(10, seed=3, num_shards=2, shard_id=1)
    ia, ib = iter(a), iter(b)
    rows_a = [next(ia) for _ in range(5)]
    rows_b = [next(ib) for _ in range(5)]
    assert sorted(rows_a + rows_b) == list(range(10))

    # resume: a fresh iterator with the saved state continues the shard
    c = StatefulIterator(10, seed=3, num_shards=2, shard_id=0)
    ic = iter(c)
    first3 = [next(ic) for _ in range(3)]
    state = c.state_dict()
    d = StatefulIterator(10, seed=3, num_shards=2, shard_id=0)
    d.load_state_dict(state)
    rest = [next(iter(d)) for _ in range(2)]
    assert first3 + rest == rows_a


def test_two_process_fsdp_step():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multiprocess_worker.py")
    env = dict(
        os.environ,
        PYTHONPATH=repo,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses, shards, gathers = [], [], []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSS "):
                losses.append(float(line.split()[1]))
            if line.startswith("SHARD "):
                shards.append(tuple(int(v) for v in line.split()[1:]))
            if line.startswith("GATHER "):
                gathers.append(line.split(" ", 1)[1])

    # both hosts computed the same GLOBAL loss over the union of their rows:
    # host0 rows of 1.0 -> (1*4)^2 = 16, host1 rows of 2.0 -> 64; mean = 40
    assert losses == [40.0, 40.0], losses
    # balanced disjoint host shards covering 10 eval rows
    assert sorted(shards) == [(0, 5), (5, 10)], shards
    # process_allgather saw both hosts
    assert all(g == "[0, 1]" for g in gathers), gathers
