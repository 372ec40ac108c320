"""Host decode-pipeline throughput: can decode feed the chip?

Measures WorkerPool decode clips/s for 16f@224 sampled from synthetic
mp4/avi clips (written with cv2 — this box has no ffmpeg binary or PyAV;
the av backend is exercised in CI images that ship it). Run:

  PYTHONPATH=/root/repo python -u tools_r3/decode_bench.py [workers]
"""

import os
import sys
import time

import cv2
import numpy as np

from internvideo_tpu.data.video import read_video
from internvideo_tpu.data.workers import WorkerPool

ROOT = "/tmp/decbench_pool"
N_VIDEOS = 16
FRAMES = 96
SIZE = 224
CLIP_FRAMES = 16


def make_corpus():
    os.makedirs(ROOT, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(N_VIDEOS):
        p = os.path.join(ROOT, f"v{i}.mp4")
        if not os.path.exists(p):
            w = cv2.VideoWriter(
                p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (SIZE, SIZE))
            for _ in range(FRAMES):
                w.write(rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8))
            w.release()
        paths.append(p)
    return paths


class ClipDataset:
    def __init__(self, paths):
        self.paths = paths

    def __len__(self):
        return 10_000

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        v = read_video(
            self.paths[i % len(self.paths)], CLIP_FRAMES, sample="rand",
            rng=rng,
        )
        return {"video": v.astype(np.float32) / 255.0}


def main():
    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    paths = make_corpus()
    ds = ClipDataset(paths)
    pool = WorkerPool(ds, batch_size=8, num_workers=workers, prefetch=4)
    n_batches = 12
    it = pool.iterate(range(8 * (n_batches + 2)))
    next(it)  # warm the workers
    t0 = time.perf_counter()
    n = 0
    for b in it:
        n += b["video"].shape[0]
        if n >= 8 * n_batches:
            break
    dt = time.perf_counter() - t0
    print(f"workers={workers}: {n / dt:6.1f} clips/s "
          f"({n} clips in {dt:.2f}s, 16f@{SIZE} mp4)")


if __name__ == "__main__":
    main()
