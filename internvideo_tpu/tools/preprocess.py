"""Dataset preprocessing tools (SURVEY M15).

Counterpart of multi_modality/preprocess/: sqlite annotation databases
(create_sqlite_db.py:9-41 — random-access caption lookup for huge corpora
without loading a json into every worker) and batch video compression
(compress.py — fps/short-side re-encode). ffmpeg is invoked when present;
cv2 is the fallback decoder/encoder so the tool runs in hermetic images.
"""

from __future__ import annotations

import json
import os
import sqlite3
import subprocess
from typing import Iterable, Optional


# ---------------------------------------------------------------------------
# sqlite annotation db  (create_sqlite_db.py equivalent)
# ---------------------------------------------------------------------------


def convert_to_sqlite_db(
    src_path: str, dst_path: str, media_type: str = "video"
) -> int:
    """(json OR jsonl) annotation file -> sqlite db with an `annos` table
    (id, <media_type>, caption). Returns the number of rows written."""
    rows = []
    with open(src_path) as f:
        head = f.read(1)
        f.seek(0)
        if head == "[":
            annos = json.load(f)
        else:
            annos = [json.loads(line) for line in f if line.strip()]
    for i, a in enumerate(annos):
        rows.append((i, a[media_type], a["caption"]))

    con = sqlite3.connect(dst_path)
    cur = con.cursor()
    cur.execute("DROP TABLE IF EXISTS annos")
    cur.execute(
        f"CREATE TABLE annos (id integer PRIMARY KEY, "
        f"`{media_type}` text, caption text)"
    )
    cur.executemany(
        f"INSERT INTO annos (id, `{media_type}`, caption) VALUES (?,?,?)",
        rows,
    )
    con.commit()
    con.close()
    return len(rows)


class SqliteAnnotations:
    """Read-only random-access view over a converted annotation db —
    the dataset-side consumer (pt_dataset's sqlite path)."""

    def __init__(self, db_path: str, media_type: str = "video"):
        self.con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
        self.media_type = media_type
        self._len = self.con.execute("SELECT COUNT(*) FROM annos").fetchone()[0]

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, idx: int) -> dict:
        row = self.con.execute(
            f"SELECT `{self.media_type}`, caption FROM annos WHERE id = ?",
            (int(idx),),
        ).fetchone()
        if row is None:
            raise IndexError(idx)
        return {self.media_type: row[0], "caption": row[1]}

    def close(self):
        self.con.close()


# ---------------------------------------------------------------------------
# video compression  (compress.py equivalent)
# ---------------------------------------------------------------------------


def _have_ffmpeg() -> bool:
    try:
        subprocess.run(
            ["ffmpeg", "-version"], capture_output=True, check=True
        )
        return True
    except Exception:
        return False


def compress_video(
    src: str, dst: str, *, fps: Optional[int] = 3, short_side: int = 224
) -> None:
    """Re-encode one video to `fps` and `short_side` (compress.py ffmpeg
    recipe); falls back to cv2 frame-by-frame when ffmpeg is absent."""
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    if _have_ffmpeg():
        scale = (
            f"scale='if(gt(iw,ih),-2,{short_side})':"
            f"'if(gt(iw,ih),{short_side},-2)'"
        )
        cmd = ["ffmpeg", "-y", "-i", src, "-vf", scale, "-max_muxing_queue_size", "9999"]
        if fps:
            cmd += ["-r", str(fps)]
        cmd += [dst, "-loglevel", "error"]
        subprocess.run(cmd, check=True)
        return

    import cv2

    cap = cv2.VideoCapture(src)
    in_fps = cap.get(cv2.CAP_PROP_FPS) or 30
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    if w > h:
        nh, nw = short_side, max(2, int(round(w * short_side / h / 2)) * 2)
    else:
        nw, nh = short_side, max(2, int(round(h * short_side / w / 2)) * 2)
    out_fps = fps or in_fps
    step = max(in_fps / out_fps, 1.0)
    wr = cv2.VideoWriter(
        dst, cv2.VideoWriter_fourcc(*"mp4v"), out_fps, (nw, nh)
    )
    i, nxt = 0, 0.0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i >= nxt:
            wr.write(cv2.resize(frame, (nw, nh)))
            nxt += step
        i += 1
    cap.release()
    wr.release()


def compress_tree(
    src_root: str, dst_root: str, *, exts=(".mp4", ".avi", ".mkv", ".webm"),
    fps: Optional[int] = 3, short_side: int = 224,
) -> list[str]:
    """Walk src_root, re-encode every video into the mirrored dst tree."""
    done = []
    for dirpath, _, files in os.walk(src_root):
        for name in files:
            if not name.lower().endswith(exts):
                continue
            src = os.path.join(dirpath, name)
            rel = os.path.relpath(src, src_root)
            dst = os.path.join(dst_root, os.path.splitext(rel)[0] + ".mp4")
            compress_video(src, dst, fps=fps, short_side=short_side)
            done.append(dst)
    return done


def diversity_sample(
    annotations: list[dict],
    n: int,
    *,
    key=lambda a: a["video"].rsplit("/", 1)[-1][:11],
    seed: int = 42,
) -> list[dict]:
    """Source-diversity subsampling of a video-text corpus.

    InternVid's curation downsamples over-represented source videos by
    weighting each annotation with the inverse frequency of its video id
    (Data/InternVid/div_sampling.py) — clips from videos with many captions
    get proportionally lower keep probability. Sampling is without
    replacement.
    """
    import collections

    import numpy as np

    ids = [key(a) for a in annotations]
    counts = collections.Counter(ids)
    w = np.array([1.0 / counts[i] for i in ids], dtype=np.float64)
    w /= w.sum()
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(annotations), min(n, len(annotations)),
                     replace=False, p=w)
    return [annotations[i] for i in idx]
