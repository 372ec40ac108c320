"""lmms-eval-compatible adapter: harness interface + results artifacts."""

import json
import os

from internvideo_tpu.eval.lmms_adapter import (
    InternVideoTPULmms,
    _FakeInstance,
    run_offline,
)

ITEMS = [
    {"question": "What color is the ball?",
     "options": ["A. red", "B. blue", "C. green", "D. black"],
     "answer": "B", "video": "/fake/v0.mp4", "category": "color"},
    {"question": "How many people appear?",
     "options": ["A. one", "B. two", "C. three", "D. four"],
     "answer": "C", "video": "/fake/v1.mp4", "category": "count"},
    {"question": "What happens last?",
     "options": ["A. jump", "B. run", "C. sit", "D. fall"],
     "answer": "D", "category": "temporal"},
]

ANSWERS = {"ball": "B", "people": "C", "last": "A"}  # last one wrong


def _stub_generate(prompt, video):
    for key, letter in ANSWERS.items():
        if key in prompt:
            return f"{letter}. because"
    return "A"


def test_generate_until_contract():
    adapter = InternVideoTPULmms(generate_fn=_stub_generate)
    seen_visuals = []

    def doc_to_visual(doc_id):
        seen_visuals.append(doc_id)
        return ["/fake/path.mp4"]

    reqs = [
        _FakeInstance(args=(
            "What color is the ball?", {"max_new_tokens": 8},
            doc_to_visual, i, "videomme", "test",
        ))
        for i in range(2)
    ]
    outs = adapter.generate_until(reqs)
    assert outs == ["B. because", "B. because"]
    assert seen_visuals == [0, 1]


def test_loglikelihood_contract():
    adapter = InternVideoTPULmms(generate_fn=_stub_generate)
    reqs = [
        _FakeInstance(args=("What color is the ball?", "b. because")),
        _FakeInstance(args=("What color is the ball?", "nothing")),
    ]
    out = adapter.loglikelihood(reqs)
    assert out[0][1] is True and out[1][1] is False


def test_run_offline_writes_harness_artifacts(tmp_path):
    adapter = InternVideoTPULmms(generate_fn=_stub_generate)
    res = run_offline(
        adapter, ITEMS, task="videomme_smoke", output_dir=str(tmp_path))
    # 2/3 correct
    acc = res["results"]["videomme_smoke"]["exact_match,none"]
    assert abs(acc - 2 / 3) < 1e-9

    with open(os.path.join(tmp_path, "results.json")) as f:
        disk = json.load(f)
    assert disk["results"]["videomme_smoke"]["exact_match,none"] == acc
    assert disk["configs"]["videomme_smoke"]["output_type"] == "generate_until"

    samples = [
        json.loads(line)
        for line in open(os.path.join(tmp_path, "videomme_smoke_samples.jsonl"))
    ]
    assert len(samples) == 3
    assert samples[0]["filtered_resps"] == ["B"]
    assert samples[2]["exact_match"] == 0.0
