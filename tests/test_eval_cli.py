"""Eval CLI smoke: retrieval + classification tiny configs end-to-end."""

import contextlib
import io
import json
import os

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _run(config, *overrides):
    from internvideo_tpu.cli.eval import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--config", os.path.join(CFG_DIR, config), *overrides])
    assert rc == 0
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def test_eval_cli_retrieval():
    out = _run("eval_retrieval_tiny.py")
    assert out["task"] == "retrieval"
    for k in ("v2t_r1", "t2v_r1", "r_mean"):
        assert k in out and 0 <= out[k] <= 100 or k == "r_mean"


def test_eval_cli_classification():
    out = _run("eval_classification_tiny.py")
    assert out["task"] == "classification"
    assert 0 <= out["top1"] <= 100 and 0 <= out["top5"] <= 100


def test_eval_cli_mcqa():
    out = _run("eval_mcqa_tiny.py")
    assert out["task"] == "mcqa"
    assert 0.0 <= out["accuracy"] <= 100.0 and out["num"] == 6


def test_mcqa_map_metric():
    import numpy as np

    from internvideo_tpu.eval.mcqa import multiple_choice_map

    # perfect scores: answer option always ranked first -> mAP 100
    scores = np.eye(4) * 5 + np.random.RandomState(0).randn(4, 4) * 0.01
    answers = np.arange(4)
    assert multiple_choice_map(scores, answers) > 99.0
    # anti-correlated scores -> low mAP
    bad = -np.eye(4) * 5
    assert multiple_choice_map(bad, answers) < 60.0


def test_eval_cli_zeroshot():
    out = _run("eval_zeroshot_tiny.py")
    assert out["task"] == "zeroshot"
    assert 0 <= out["top1"] <= 100 and out["n"] == 6


def test_eval_cli_temporal_detection():
    out = _run("eval_temporal_detection_tiny.py")
    assert out["task"] == "temporal_detection"
    # exact anchor-free regression at every event center -> perfect mAP
    assert out["average_mAP"] > 0.9 and out["mAP@0.7"] > 0.9


def test_eval_cli_openset():
    out = _run("eval_openset_tiny.py")
    assert out["task"] == "openset"
    # far-from-every-mean samples must land in the unknown bucket
    assert out["unknown_detection_rate"] > 0.8
    assert out["closed_acc"] > 0.7 and out["open_acc"] > 0.7


def test_eval_cli_spatiotemporal():
    out = _run("eval_spatiotemporal_tiny.py")
    assert out["task"] == "spatiotemporal"
    # class signature embedded in each box region -> perfect frame mAP
    assert out["frame_mAP@0.5"] > 0.9
