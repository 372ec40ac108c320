"""MLLM MCQ benchmark driver (VideoMME / MVBench-class suites).

Mirrors the reference's eval scripts
(InternVideo3_eval/scripts/eval_videommev2.py and the lmms-eval shell
suite): build the MCQ prompt (with optional subtitles), generate, parse
the option letter, shard items across processes, aggregate accuracy
overall and per category.

The generation backend is any callable (prompt, video_path) -> text —
wire `models/generation.generate` + a tokenizer + the tokenize-fn's frame
sampling (data/mllm_tokenize.py) for the real model, or a stub for tests.
"""

from __future__ import annotations

import collections
import json
import os
import re
from typing import Callable, Iterable, Optional, Sequence

# eval_videommev2.py:18-23 — the prompt templates, verbatim semantics
MCQ_PROMPT = (
    "Select the best answer to the following multiple-choice question "
    "based on the video.\n"
    "Question: {question}\nOptions:\n{options}\n"
    "Answer with the option letter only."
)

MCQ_PROMPT_WITH_SUB = (
    "Select the best answer to the following multiple-choice question "
    "based on the video. "
    "The subtitles of the video are also provided below.\n"
    "Subtitles:\n{subtitles}\n\n"
    "Question: {question}\nOptions:\n{options}\n"
    "Answer with the option letter only."
)


def build_mcq_prompt(
    question: str,
    options: Sequence[str],
    subtitles: Optional[str] = None,
) -> str:
    opts = "\n".join(options)
    if subtitles:
        return MCQ_PROMPT_WITH_SUB.format(
            subtitles=subtitles, question=question, options=opts
        )
    return MCQ_PROMPT.format(question=question, options=opts)


def parse_option_letter(text: str, letters: str = "ABCDEFGH") -> str:
    """Reference parse_answer (eval_videommev2.py:42-53): leading letter,
    'answer is X' patterns, then first character. One deviation: the
    reference's optional answer-prefix makes its regex match stray vowels
    inside words ("The ..." -> E); here the explicit prefix is required
    before falling back to a standalone letter."""
    text = text.strip()
    m = re.match(rf"^([{letters}])\b", text.upper())
    if m:
        return m.group(1)
    m = re.search(
        rf"(?:answer is|answer:)\s*\(?([{letters}])\b", text, re.IGNORECASE
    )
    if m:
        return m.group(1).upper()
    m = re.search(rf"\b([{letters}])\b", text.upper())
    if m:
        return m.group(1)
    return text[0].upper() if text else ""


def load_benchmark_items(path: str) -> list[dict]:
    """Items from jsonl / json-list / parquet. Expected fields per item:
    question, options (list of 'A. ...' strings), answer (letter), and
    optionally video (path), category/duration, subtitles."""
    if path.endswith(".parquet"):
        import pandas as pd

        return pd.read_parquet(path).to_dict("records")
    with open(path) as f:
        if path.endswith(".jsonl"):
            return [json.loads(line) for line in f if line.strip()]
        return json.load(f)


def run_mcq_benchmark(
    items: Iterable[dict],
    generate_fn: Callable[[str, Optional[str]], str],
    *,
    category_key: Optional[str] = "category",
    use_subtitles: bool = False,
    shard_hosts: bool = False,
    predictions_path: Optional[str] = None,
) -> dict:
    """-> {"overall": acc%, "n": N, "per_category": {...}}.

    With shard_hosts, each jax process evaluates its row stride and
    partial counts merge with a host allgather (the reference shards by
    rank the same way, eval_videommev2.py:34-39)."""
    items = list(items)
    idx = range(len(items))
    if shard_hosts:
        import jax

        idx = range(jax.process_index(), len(items), jax.process_count())

    counts = collections.Counter()
    correct = collections.Counter()
    preds = []
    for i in idx:
        it = items[i]
        prompt = build_mcq_prompt(
            it["question"], it["options"],
            it.get("subtitles") if use_subtitles else None,
        )
        out = generate_fn(prompt, it.get("video"))
        pred = parse_option_letter(out)
        cat = str(it.get(category_key, "all")) if category_key else "all"
        counts[cat] += 1
        correct[cat] += int(pred == str(it["answer"]).strip().upper())
        preds.append({"index": i, "pred": pred, "answer": it["answer"]})

    if shard_hosts:
        # every host holds the full item list (only generation is
        # sharded), so the category axis is globally known and the merge
        # is a fixed-shape integer allgather+sum
        import numpy as np

        from internvideo_tpu.core.distributed import process_allgather

        all_cats = sorted({
            str(it.get(category_key, "all")) if category_key else "all"
            for it in items
        })
        local = np.array(
            [[counts[c] for c in all_cats],
             [correct[c] for c in all_cats]], np.int64,
        )
        merged = np.sum(np.asarray(process_allgather(local)), axis=0)
        counts = collections.Counter(dict(zip(all_cats, merged[0])))
        correct = collections.Counter(dict(zip(all_cats, merged[1])))

    if predictions_path:
        import jax

        if jax.process_count() > 1:
            # each host holds only its shard's preds — write per-rank
            # files (the reference's convention) instead of letting every
            # process truncate the same path
            root, ext = os.path.splitext(predictions_path)
            predictions_path = f"{root}.rank{jax.process_index()}{ext}"
        os.makedirs(os.path.dirname(predictions_path) or ".", exist_ok=True)
        with open(predictions_path, "w") as f:
            for p in preds:
                f.write(json.dumps(p) + "\n")

    total = sum(counts.values())
    result = {
        "overall": 100.0 * sum(correct.values()) / max(total, 1),
        "n": total,
        "per_category": {
            c: 100.0 * correct[c] / counts[c] for c in sorted(counts)
        },
    }
    return result
