"""Preprocess tooling (M15): sqlite annotation db round-trip + cv2 video
compression."""

import json
import os

import numpy as np

from internvideo_tpu.tools.preprocess import (
    SqliteAnnotations,
    compress_video,
    convert_to_sqlite_db,
)


def test_sqlite_db_roundtrip(tmp_path):
    annos = [
        {"video": f"clips/{i}.mp4", "caption": f"caption {i}"}
        for i in range(20)
    ]
    src = tmp_path / "annos.json"
    src.write_text(json.dumps(annos))
    db = str(tmp_path / "annos.db")
    n = convert_to_sqlite_db(str(src), db, "video")
    assert n == 20

    view = SqliteAnnotations(db, "video")
    assert len(view) == 20
    assert view[7] == {"video": "clips/7.mp4", "caption": "caption 7"}
    view.close()

    # jsonl input too
    src2 = tmp_path / "annos.jsonl"
    src2.write_text("\n".join(json.dumps(a) for a in annos[:5]))
    assert convert_to_sqlite_db(str(src2), db, "video") == 5


def test_compress_video_cv2(tmp_path, monkeypatch):
    cv2 = __import__("cv2")
    monkeypatch.setattr(
        "internvideo_tpu.tools.preprocess._have_ffmpeg", lambda: False
    )
    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(30):
        w.write(np.full((48, 64, 3), i * 8, np.uint8))
    w.release()

    dst = str(tmp_path / "out" / "out.mp4")
    compress_video(src, dst, fps=3, short_side=32)
    cap = cv2.VideoCapture(dst)
    nf = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    assert h == 32  # short side resized
    assert 2 <= nf <= 5  # ~1 s at 3 fps


def test_diversity_sample_balances_sources():
    # 90 clips from one video, 10 from another: inverse-frequency weights
    # should pull the sample toward balance.
    anns = [{"video": f"a/AAAAAAAAAAA_{i}.mp4", "caption": str(i)}
            for i in range(90)]
    anns += [{"video": f"b/BBBBBBBBBBB_{i}.mp4", "caption": str(i)}
             for i in range(10)]
    from internvideo_tpu.tools.preprocess import diversity_sample

    out = diversity_sample(anns, 20, seed=0)
    assert len(out) == 20
    n_b = sum(a["video"].startswith("b/") for a in out)
    assert n_b >= 6, n_b  # ~half in expectation vs 2 under uniform sampling
    # deterministic given seed
    again = diversity_sample(anns, 20, seed=0)
    assert [a["caption"] for a in again] == [a["caption"] for a in out]
