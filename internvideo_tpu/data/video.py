"""Host-side video decode + frame sampling.

Replaces the reference's decord/PyAV readers
(multi_modality/dataset/video_utils.py:91-166) and the kinetics dense/sparse
samplers (single_modality/datasets/kinetics.py / kinetics_sparse.py). The
image is decord-free; the reader registry covers OpenCV-decodable video,
GIFs, image directories, and raw .npy clips, all returning uint8
(T, H, W, 3) RGB.

Frame samplers are pure index math (host numpy) so they are unit-testable
and identical across readers:
  * rand:    uniform index inside each of `num_frames` equal bins (train)
  * middle:  bin centers (eval)                 [video_utils.py:50-88]
  * dense:   fixed-fps window sampling with multi-clip test offsets
  * sparse:  TSN-style segment sampling         [kinetics_sparse.py]
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------


def sample_frame_indices(
    num_frames: int,
    vlen: int,
    *,
    sample: str = "rand",
    fix_start: Optional[int] = None,
    input_fps: float = 30.0,
    max_num_frames: int = -1,
    clip_idx: int = 0,
    num_clips: int = 1,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    rng = rng or np.random.default_rng()
    if sample in ("rand", "middle"):
        acc_samples = min(num_frames, vlen)
        # split [0, vlen) into acc_samples bins, pick in-bin position
        edges = np.linspace(0, vlen, acc_samples + 1).astype(int)
        starts, ends = edges[:-1], np.maximum(edges[1:], edges[:-1] + 1)
        if sample == "rand":
            idx = np.array(
                [rng.integers(s, e) for s, e in zip(starts, ends)]
            )
        elif fix_start is not None:
            idx = np.minimum(starts + fix_start, vlen - 1)
        else:
            idx = (starts + ends) // 2
        idx = np.minimum(idx, vlen - 1)
        if len(idx) < num_frames:  # loop-pad short videos
            idx = np.resize(idx, num_frames)
        return idx
    if sample == "dense":
        # fixed-duration window; one of `num_clips` temporal offsets
        span = min(vlen, int(num_frames * input_fps / 30.0 * 2))
        max_start = max(vlen - span, 0)
        start = (
            int(max_start * clip_idx / max(num_clips - 1, 1))
            if num_clips > 1
            else (rng.integers(0, max_start + 1) if max_start else 0)
        )
        return np.linspace(start, start + span - 1, num_frames).astype(int)
    if sample == "sparse":
        # TSN segments; per-clip deterministic offset at test time
        edges = np.linspace(0, vlen, num_frames + 1)
        if num_clips > 1:
            frac = clip_idx / max(num_clips - 1, 1)
            idx = edges[:-1] + (edges[1:] - edges[:-1] - 1) * frac
            return idx.astype(int)
        return np.array(
            [rng.integers(int(s), max(int(e), int(s) + 1))
             for s, e in zip(edges[:-1], edges[1:])]
        ).clip(0, vlen - 1)
    raise ValueError(f"unknown sampling {sample!r}")


# ---------------------------------------------------------------------------
# Readers
# ---------------------------------------------------------------------------


def read_frames_npy(path: str, indices: np.ndarray) -> np.ndarray:
    arr = np.load(path, mmap_mode="r")
    return np.asarray(arr[indices])


try:
    import av as _av  # PyAV: frame-accurate decode (preferred backend)

    HAVE_AV = True
except ImportError:  # this image ships without PyAV; cv2 is the fallback
    _av = None
    HAVE_AV = False


def read_frames_av(path: str, indices: np.ndarray) -> np.ndarray:
    """PyAV sequential decode of explicit `indices` (frame-accurate).

    The preferred container backend, mirroring the reference's
    `read_frames_av` (multi_modality/dataset/video_utils.py:91-128): one
    sequential decode pass collecting wanted frames, stopping at the last.
    Unlike cv2's CAP_PROP_POS_FRAMES seek (keyframe-inaccurate on long-GOP
    streams), decoded frame order is exact.
    """
    if _av is None:
        raise ImportError("PyAV is not installed")
    want = set(int(i) for i in indices)
    last_want = max(want)
    frames = {}
    with _av.open(path) as container:
        stream = container.streams.video[0]
        stream.thread_type = "AUTO"  # frame+slice threading in ffmpeg
        for i, frame in enumerate(container.decode(stream)):
            if i in want:
                frames[i] = frame.to_ndarray(format="rgb24")
            if i >= last_want:
                break
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    last = frames[max(frames)]
    return np.stack([frames.get(int(i), last) for i in indices])


def _av_video_length(path: str) -> int:
    with _av.open(path) as container:
        stream = container.streams.video[0]
        if stream.frames:  # container metadata when present
            return int(stream.frames)
        return sum(1 for _ in container.decode(stream))


def read_frames_cv2(path: str, indices: np.ndarray) -> np.ndarray:
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    frames = {}
    want = sorted(set(int(i) for i in indices))
    pos = 0
    for target in want:
        if target != pos:
            cap.set(cv2.CAP_PROP_POS_FRAMES, target)
            pos = target
        ok, frame = cap.read()
        pos += 1
        if not ok:
            break
        frames[target] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    last = frames[max(frames)]
    return np.stack([frames.get(int(i), last) for i in indices])


def read_frames_gif(path: str, indices: np.ndarray) -> np.ndarray:
    from PIL import Image, ImageSequence

    img = Image.open(path)
    all_frames = [
        np.asarray(f.convert("RGB")) for f in ImageSequence.Iterator(img)
    ]
    return np.stack([all_frames[min(int(i), len(all_frames) - 1)] for i in indices])


def read_frames_imgdir(path: str, indices: np.ndarray) -> np.ndarray:
    from PIL import Image

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    return np.stack([
        np.asarray(Image.open(files[min(int(i), len(files) - 1)]).convert("RGB"))
        for i in indices
    ])


def video_length(path: str) -> int:
    if path.endswith(".npy"):
        return np.load(path, mmap_mode="r").shape[0]
    if os.path.isdir(path):
        return len([
            f for f in os.listdir(path)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        ])
    if path.lower().endswith(".gif"):
        from PIL import Image, ImageSequence

        return sum(1 for _ in ImageSequence.Iterator(Image.open(path)))
    if HAVE_AV:
        try:
            return _av_video_length(path)
        except Exception:  # noqa: BLE001 — corrupt container: try cv2
            pass
    import cv2

    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n


def read_frames(path: str, indices: np.ndarray) -> np.ndarray:
    """Decode explicit frame `indices` as (T, H, W, 3) uint8 RGB — the
    tokenize-fn path, where the frame plan is computed ahead of decode."""
    indices = np.asarray(indices)
    if path.endswith(".npy"):
        return read_frames_npy(path, indices)
    if os.path.isdir(path):
        return read_frames_imgdir(path, indices)
    if path.lower().endswith(".gif"):
        return read_frames_gif(path, indices)
    # container fallback chain like the reference's video_utils.py:91-166:
    # PyAV (frame-accurate) first, cv2 seek otherwise
    if HAVE_AV:
        try:
            return read_frames_av(path, indices)
        except Exception:  # noqa: BLE001
            pass
    return read_frames_cv2(path, indices)


def read_video(
    path: str,
    num_frames: int,
    *,
    sample: str = "rand",
    clip_idx: int = 0,
    num_clips: int = 1,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Decode `num_frames` RGB frames (T, H, W, 3) uint8 from any source."""
    vlen = video_length(path)
    idx = sample_frame_indices(
        num_frames, vlen, sample=sample, clip_idx=clip_idx,
        num_clips=num_clips, rng=rng,
    )
    if path.endswith(".npy"):
        return read_frames_npy(path, idx)
    if os.path.isdir(path):
        return read_frames_imgdir(path, idx)
    if path.lower().endswith(".gif"):
        return read_frames_gif(path, idx)
    if HAVE_AV:
        try:
            return read_frames_av(path, idx)
        except Exception:  # noqa: BLE001
            pass
    return read_frames_cv2(path, idx)
