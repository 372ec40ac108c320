"""MLLM MCQ benchmark driver: prompts, option parsing, sharded aggregate."""

import json

import pytest

import numpy as np

from internvideo_tpu.eval.mllm_benchmark import (
    build_mcq_prompt,
    load_benchmark_items,
    parse_option_letter,
    run_mcq_benchmark,
)


def test_prompt_and_parse():
    p = build_mcq_prompt("What happens?", ["A. runs", "B. sits"])
    assert "Question: What happens?" in p and "A. runs\nB. sits" in p
    assert "Subtitles" not in p
    ps = build_mcq_prompt("Q?", ["A. x"], subtitles="hello world")
    assert "Subtitles:\nhello world" in ps
    # parser: reference fallback chain (eval_videommev2.py:42-53)
    assert parse_option_letter("B") == "B"
    assert parse_option_letter("b. because ...") == "B"
    assert parse_option_letter("The answer is C") == "C"
    assert parse_option_letter("answer: d") == "D"
    assert parse_option_letter("") == ""


def test_load_and_run(tmp_path):
    items = []
    rng = np.random.default_rng(0)
    for i in range(12):
        ans = "ABCD"[int(rng.integers(0, 4))]
        items.append({
            "question": f"q{i}",
            "options": [f"{letter}. opt" for letter in "ABCD"],
            "answer": ans,
            "category": "short" if i % 2 == 0 else "long",
            "video": f"v{i}.mp4",
        })
    path = tmp_path / "bench.jsonl"
    with open(path, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    loaded = load_benchmark_items(str(path))
    assert loaded == items

    # oracle answers 'Answer is X' for even items, garbage for odd ones
    def gen(prompt, video):
        i = int(video[1:-4])
        if i % 2 == 0:
            return f"The answer is {items[i]['answer']}"
        return "Z unknowable"

    out = run_mcq_benchmark(
        loaded, gen, predictions_path=str(tmp_path / "preds.jsonl")
    )
    assert out["n"] == 12
    assert out["per_category"]["short"] == 100.0
    assert out["per_category"]["long"] < 100.0
    assert 0 < out["overall"] < 100
    preds = [json.loads(l) for l in open(tmp_path / "preds.jsonl")]
    assert len(preds) == 12


def test_run_sharded_single_process():
    # shard_hosts on a 1-process CPU run reduces to the plain path but
    # exercises the fixed-shape allgather merge
    items = [{
        "question": "q", "options": ["A. x", "B. y"], "answer": "A",
        "category": "c",
    }] * 4
    out = run_mcq_benchmark(items, lambda p, v: "A", shard_hosts=True)
    assert out["overall"] == 100.0 and out["n"] == 4


def test_grounding_eval(tmp_path):
    from internvideo_tpu.eval.grounding import (
        grounding_metrics,
        parse_time_span,
        run_grounding_eval,
        span_iou,
    )

    assert parse_time_span("from 3.5 to 10 seconds") == (3.5, 10.0)
    assert parse_time_span("no numbers here") == (None, None)
    assert span_iou((0, 10), (0, 10)) == 1.0
    assert span_iou((0, 5), (5, 10)) == 0.0
    assert abs(span_iou((0, 6), (4, 10)) - 0.2) < 1e-9
    assert span_iou((None, None), (0, 10)) == 0.0
    # swapped order is normalized
    assert span_iou((10, 0), (0, 10)) == 1.0

    queries = [
        {"video": "a.mp4", "query": "x", "span": (2.0, 8.0)},
        {"video": "b.mp4", "query": "y", "span": (0.0, 4.0)},
        {"video": "c.mp4", "query": "z", "span": (5.0, 9.0)},
    ]

    def gen(prompt, video):
        return {"a.mp4": "2.0 to 8.0", "b.mp4": "0 4.4",
                "c.mp4": "maybe never"}[video]

    out = run_grounding_eval(
        queries, gen, results_path=str(tmp_path / "res.jsonl")
    )
    assert out["n"] == 3
    assert out["R@0.7"] == pytest.approx(100 * 2 / 3, abs=1e-6)
    assert 0 < out["mIoU"] < 1
    import json as _json

    recs = [_json.loads(l) for l in open(tmp_path / "res.jsonl")]
    assert recs[2]["iou"] == 0.0
