"""Vendored minimal lmms-eval harness: the task->Instance->model loop.

The reference's MLLM benchmarks run through the lmms-eval package
(`accelerate launch -m lmms_eval --model internvideo3 ...`,
InternVideo3/InternVideo3_eval/scripts/eval_videomme.sh:17-31). That
package cannot be installed in this image (no pip, zero egress), so this
module is a from-scratch reimplementation of the minimal harness surface
our adapter plugs into — enough to RUN a task end-to-end the way lmms-eval
does, not just to mock its types:

  * `Instance` — the request object: `request_type`, `arguments` tuple
    (exposed as `.args`), `idx`, and `(task, doc_id, split)` metadata.
    For generate_until the arguments tuple is
    (contexts, gen_kwargs, doc_to_visual, doc_id, task, split) — the
    contract `InternVideoTPULmms.generate_until` consumes.
  * `LmmsTask` — a task definition: docs + doc_to_text / doc_to_visual /
    doc_to_target + process_results + aggregation, the same hooks a
    lmms-eval task YAML resolves to.
  * `evaluate(model, tasks)` — the driving loop: builds all Instances,
    installs `model.task_dict[task][split][doc_id] -> doc` (the harness
    side-channel the model uses to resolve docs), dispatches request
    batches by type, scores with process_results, aggregates, and writes
    `results.json` + per-task `*_samples.jsonl` in the layout lmms-eval's
    `--log_samples` produces.
  * `register_model` / `get_model` — the registry the real package keeps
    in lmms_eval.api.registry.

When the real lmms_eval IS importable, `eval/lmms_adapter.py` registers
against it and this module is bypassed — the adapter prefers the genuine
harness and falls back to this vendored loop.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Iterable, Optional, Sequence

MODEL_REGISTRY: dict[str, type] = {}


def register_model(*names: str):
    """lmms_eval.api.registry.register_model equivalent."""

    def deco(cls):
        for name in names:
            MODEL_REGISTRY[name] = cls
        return cls

    return deco


def get_model(name: str) -> type:
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"model {name!r} not registered; have {sorted(MODEL_REGISTRY)}"
        ) from None


@dataclasses.dataclass
class Instance:
    """lmms_eval.api.instance.Instance equivalent (the .args contract)."""

    request_type: str  # "generate_until" | "loglikelihood"
    arguments: tuple
    idx: int = 0
    task: str = ""
    doc_id: int = 0
    split: str = "test"

    @property
    def args(self) -> tuple:
        return self.arguments


@dataclasses.dataclass
class LmmsTask:
    """A resolved task (what a lmms-eval task YAML becomes at runtime).

    output_type follows the lmms-eval task schema: "generate_until" scores
    free generations; "loglikelihood" (a.k.a. multiple_choice) builds one
    request per (doc, choice) continuation from `doc_to_choice` and hands
    process_results the per-choice [(loglikelihood, is_greedy)] list —
    MCQ-by-likelihood, half of lmms-eval's video benchmarks."""

    name: str
    docs: Sequence[dict]
    doc_to_text: Callable[[dict], str]
    doc_to_visual: Callable[[dict], list]
    doc_to_target: Callable[[dict], str]
    # generate_until: process_results(doc, [prediction]) -> {metric: value}
    # loglikelihood: process_results(doc, [(ll, is_greedy), ...]) -> same
    process_results: Callable[[dict, Sequence], dict]
    gen_kwargs: dict = dataclasses.field(
        default_factory=lambda: {"max_new_tokens": 16, "temperature": 0.0}
    )
    split: str = "test"
    version: str = "0.0"
    # metric_name -> aggregation over per-doc values (default: mean)
    aggregation: Optional[dict[str, Callable[[list], float]]] = None
    output_type: str = "generate_until"  # | "loglikelihood"
    # loglikelihood tasks: doc -> list of continuation strings (choices)
    doc_to_choice: Optional[Callable[[dict], Sequence[str]]] = None


def _mean(xs: list) -> float:
    return float(sum(xs) / max(len(xs), 1))


def _dispatch_generate_until(model: Any, task: "LmmsTask") -> list[list]:
    """One generate_until Instance per doc; returns [[prediction]] per doc."""
    instances = [
        Instance(
            request_type="generate_until",
            arguments=(
                task.doc_to_text(doc),
                dict(task.gen_kwargs),
                task.doc_to_visual,
                i,
                task.name,
                task.split,
            ),
            idx=i,
            task=task.name,
            doc_id=i,
            split=task.split,
        )
        for i, doc in enumerate(task.docs)
    ]
    preds = model.generate_until(instances)
    assert len(preds) == len(instances), (
        f"model returned {len(preds)} predictions for "
        f"{len(instances)} requests"
    )
    return [[p] for p in preds]


def _dispatch_loglikelihood(model: Any, task: "LmmsTask") -> list[list]:
    """One loglikelihood Instance per (doc, choice); returns the per-doc
    [(ll, is_greedy), ...] lists — the multiple_choice contract lmms-eval
    hands process_results (evaluator regroups requests by doc)."""
    assert task.doc_to_choice is not None, (
        f"loglikelihood task {task.name!r} needs doc_to_choice"
    )
    instances, counts = [], []
    for i, doc in enumerate(task.docs):
        ctx = task.doc_to_text(doc)
        choices = list(task.doc_to_choice(doc))
        counts.append(len(choices))
        for j, continuation in enumerate(choices):
            instances.append(Instance(
                request_type="loglikelihood",
                arguments=(
                    ctx,
                    continuation,
                    task.doc_to_visual,
                    i,
                    task.name,
                    task.split,
                ),
                idx=len(instances),
                task=task.name,
                doc_id=i,
                split=task.split,
            ))
    resps = model.loglikelihood(instances)
    assert len(resps) == len(instances), (
        f"model returned {len(resps)} loglikelihoods for "
        f"{len(instances)} requests"
    )
    per_doc, k = [], 0
    for n in counts:
        per_doc.append([tuple(r) for r in resps[k:k + n]])
        k += n
    return per_doc


def evaluate(
    model: Any,
    tasks: Iterable[LmmsTask],
    *,
    output_dir: Optional[str] = None,
    log_samples: bool = True,
) -> dict:
    """Run every task through the model; return the lmms-eval results dict.

    Mirrors lmms_eval.evaluator.simple_evaluate's phases: build instances,
    install task_dict, dispatch per request type, score, aggregate, log.
    """
    results: dict = {"results": {}, "versions": {}, "configs": {}}
    task_dict: dict = {}
    all_samples: dict[str, list] = {}

    task_list = list(tasks)
    for task in task_list:
        task_dict[task.name] = {
            task.split: {i: doc for i, doc in enumerate(task.docs)}
        }
    # the harness attaches the doc lookup to the model before dispatch
    model.task_dict = task_dict

    for task in task_list:
        if task.output_type == "loglikelihood":
            per_doc = _dispatch_loglikelihood(model, task)
        else:
            per_doc = _dispatch_generate_until(model, task)

        per_metric: dict[str, list] = {}
        samples = []
        for doc_id, resps in enumerate(per_doc):
            doc = task.docs[doc_id]
            scored = task.process_results(doc, resps)
            for metric, value in scored.items():
                per_metric.setdefault(metric, []).append(value)
            samples.append({
                "doc_id": doc_id,
                "doc": {k: v for k, v in doc.items()
                        if isinstance(v, (str, int, float, list, bool))},
                "target": task.doc_to_target(doc),
                "resps": [[r] for r in resps],
                "filtered_resps": list(resps),
                **{k: v for k, v in scored.items()},
            })

        agg = task.aggregation or {}
        results["results"][task.name] = {
            f"{metric},none": (agg.get(metric, _mean))(values)
            for metric, values in per_metric.items()
        }
        results["versions"][task.name] = task.version
        results["configs"][task.name] = {
            "task": task.name,
            "test_split": task.split,
            "output_type": task.output_type,
            "generation_kwargs": task.gen_kwargs,
        }
        all_samples[task.name] = samples

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "results.json"), "w") as f:
            json.dump(results, f, indent=2, default=str)
        if log_samples:
            for name, samples in all_samples.items():
                path = os.path.join(output_dir, f"{name}_samples.jsonl")
                with open(path, "w") as f:
                    for row in samples:
                        f.write(json.dumps(row, default=str) + "\n")
    return results
