"""Multiprocess decode worker pool: ordering, collate, parallelism."""

import os
import time

import numpy as np

from internvideo_tpu.data.workers import WorkerPool, default_collate


class _Dataset:
    def __len__(self):
        return 20

    def __getitem__(self, i):
        return {
            "x": np.full((3,), i, np.float32),
            "idx": np.int32(i),
            "pid": np.int64(os.getpid()),
        }


def test_default_collate_nested():
    items = [{"a": np.ones((2,)), "b": (np.int32(1), np.zeros((1,)))}] * 3
    out = default_collate(items)
    assert out["a"].shape == (3, 2)
    assert out["b"][0].shape == (3,)
    assert out["b"][1].shape == (3, 1)


def test_worker_pool_ordered_batches():
    pool = WorkerPool(_Dataset(), batch_size=4, num_workers=2, prefetch=2)
    batches = list(pool.iterate())
    assert len(batches) == 5
    got = np.concatenate([b["idx"] for b in batches])
    np.testing.assert_array_equal(got, np.arange(20))
    # work actually ran in child processes
    pids = set(int(p) for b in batches for p in b["pid"])
    assert os.getpid() not in pids
    assert len(pids) >= 1


def test_worker_pool_inprocess_and_drop_last():
    pool = WorkerPool(_Dataset(), batch_size=6, num_workers=0,
                      drop_last=False)
    batches = list(pool.iterate())
    assert [len(b["idx"]) for b in batches] == [6, 6, 6, 2]


def test_worker_pool_custom_indices_resume():
    # resumable iteration: the caller passes the index stream (e.g. from
    # StatefulIterator), the pool only maps and orders
    pool = WorkerPool(_Dataset(), batch_size=2, num_workers=2)
    batches = list(pool.iterate([5, 3, 9, 1]))
    got = np.concatenate([b["idx"] for b in batches]).tolist()
    assert got == [5, 3, 9, 1]


class _SlowDataset(_Dataset):
    def __getitem__(self, i):
        t0 = time.time()
        time.sleep(0.2)
        out = super().__getitem__(i)
        out["t0"] = np.float64(t0)
        out["t1"] = np.float64(time.time())
        return out


def test_worker_pool_runs_in_parallel():
    """Items decoded by different workers overlap in time (wall-clock
    ratios flake under CI load; interval overlap does not — the 0.2 s
    sleeps must interleave across the 4 worker processes)."""
    batches = list(WorkerPool(_SlowDataset(), batch_size=5, num_workers=4,
                              prefetch=4).iterate())
    spans = [
        (float(b["t0"][j]), float(b["t1"][j]), int(b["pid"][j]))
        for b in batches for j in range(len(b["pid"]))
    ]
    overlaps = sum(
        1
        for i, (s1, e1, p1) in enumerate(spans)
        for (s2, e2, p2) in spans[i + 1:]
        if p1 != p2 and s1 < e2 and s2 < e1
    )
    assert overlaps >= 5, (overlaps, spans[:4])


def test_worker_pool_to_trainer_pipeline():
    """Full host pipeline: WorkerPool decode -> prefetch_to_device ->
    Trainer.fit on the finetune engine (the reference's DataLoader ->
    H2D -> engine loop, end to end)."""
    import jax
    import jax.numpy as jnp

    from internvideo_tpu.core.mesh import MeshConfig
    from internvideo_tpu.data.loader import prefetch_to_device
    from internvideo_tpu.models.internvideo2 import InternVideo2Config
    from internvideo_tpu.train.engines.finetune import (
        FinetuneConfig,
        make_finetune_step,
    )
    from internvideo_tpu.train.optim import OptimizerConfig
    from internvideo_tpu.train.trainer import Trainer, TrainerConfig
    from internvideo_tpu.models.internvideo2 import InternVideo2

    class _VideoDs:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return {
                "video": rng.normal(size=(2, 28, 28, 3)).astype(np.float32),
                "label": np.int32(i % 5),
            }

    cfg = InternVideo2Config(
        embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0, patch_size=14,
        img_size=28, num_frames=2, tubelet_size=1, clip_embed_dim=16,
        num_classes=5, attn_impl="xla",
    )
    model = InternVideo2(cfg)
    video = jnp.zeros((8, 2, 28, 28, 3))
    batch = {"video": video, "label": jnp.zeros((8,), jnp.int32)}
    trainer = Trainer(
        TrainerConfig(
            total_steps=4, log_every=2,
            mesh=MeshConfig(replica=1, fsdp=-1, seq=1, tensor=1),
            optimizer=OptimizerConfig(lr=1e-3, total_steps=4),
        ),
        model,
        lambda m, mesh, grad_accum=1: make_finetune_step(
            m, FinetuneConfig(mixup=None, num_classes=5), mesh,
            grad_accum=grad_accum,
        ),
        example_batch=batch,
        example_inputs=(video,),
    )
    pool = WorkerPool(_VideoDs(), batch_size=8, num_workers=2, prefetch=2)
    stream = prefetch_to_device(pool.iterate())
    trainer.fit(stream, steps=4)
    assert int(trainer.state.step) == 4
