"""Prober: per-module activation capture for numeric cross-checking.

TPU port of xtuner's Prober (xtuner/v1/profiler/prober.py:29-966), the
reference's de-facto correctness tool for parallelism changes: dump chosen
modules' outputs at chosen steps and diff them against another
implementation (e.g. the PyTorch reference, ≤1e-2 rel err per
BASELINE.json).

Uses flax's capture_intermediates — no hooks to wire into each module.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import jax
import numpy as np


def capture_activations(
    model,
    variables,
    *args,
    filter_patterns: Optional[Sequence[str]] = None,
    method=None,
    **kwargs,
):
    """Run apply with intermediates captured.

    Returns (output, {path: ndarray}) where path is 'a/b/c' of module scope.
    """
    pats = [re.compile(p) for p in (filter_patterns or [".*"])]

    def keep(mdl, name):
        path = "/".join(mdl.scope.path) if mdl.scope else ""
        return any(p.search(path or name) for p in pats)

    out, state = model.apply(
        variables, *args,
        capture_intermediates=keep, mutable=["intermediates"],
        method=method, **kwargs,
    )
    flat = {}

    dropped = []

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, (tuple, list)):  # deepstack taps are lists
            for i, v in enumerate(node):
                suffix = "" if len(node) == 1 else f"#{i}"
                rec(v, prefix + suffix)
        else:
            try:
                flat[prefix] = np.asarray(jax.device_get(node))
            except Exception:
                # a parity tool must not pass vacuously — record what it
                # could not capture so compare_activations can flag it
                dropped.append(prefix)

    rec(state["intermediates"], "")
    if dropped:
        flat["__dropped__"] = np.asarray(dropped)
    return out, flat


def dump_activations(acts: dict, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{k: v for k, v in acts.items()})


def compare_activations(
    a: dict, b: dict, *, rtol: float = 1e-2, atol: float = 1e-4
) -> dict:
    """Per-tensor max relative error between two dumps; flags mismatches."""
    report = {}
    for k in sorted(set(a) & set(b)):
        x, y = np.asarray(a[k], np.float32), np.asarray(b[k], np.float32)
        if x.shape != y.shape:
            report[k] = {"shape_mismatch": (x.shape, y.shape)}
            continue
        denom = np.maximum(np.abs(y), atol)
        rel = float(np.max(np.abs(x - y) / denom)) if x.size else 0.0
        report[k] = {"max_rel_err": rel, "ok": rel <= rtol}
    report["__missing__"] = sorted(set(a) ^ set(b))
    return report


# ---------------------------------------------------------------------------
# Step-scoped dump-to-disk workflow (xtuner prober.py:29-966 parity):
# capture chosen steps/micro-batches, write per-rank npz dumps + a
# manifest.jsonl of summary stats, diff whole dump trees across
# implementations without holding 40 layers of activations in memory.
# ---------------------------------------------------------------------------

import dataclasses
import json


@dataclasses.dataclass(frozen=True)
class ProberConfig:
    dump_dir: str
    steps: Sequence[int] = ()  # global steps to capture (empty = never)
    filter_patterns: Optional[Sequence[str]] = None
    rank: int = 0  # process index in multi-host runs
    save_tensors: bool = True  # False: manifest stats only (cheap sweeps)


class Prober:
    """Numeric-debug workflow driver.

    Usage (cross-impl diffing, the reference's Prober loop):

        prober = Prober(ProberConfig("/dumps/jax", steps=(0, 100)))
        ...inside the debug loop...
        if prober.should_capture(step):
            prober.capture(model, {"params": params}, batch["x"],
                           step=step, tag="micro0")
        # later: compare_dumps("/dumps/jax", "/dumps/torch", step=100)
    """

    def __init__(self, config: ProberConfig):
        self.config = config

    def should_capture(self, step: int) -> bool:
        return step in set(self.config.steps)

    def capture(
        self, model, variables, *args,
        step: int, tag: str = "fwd", method=None, **kwargs,
    ):
        """Run the forward with intermediates captured and dump them.

        `tag` scopes within a step (micro-batch index, 'fwd'/'ref', ...).
        Returns the model output so the caller's control flow is unchanged.
        """
        out, acts = capture_activations(
            model, variables, *args,
            filter_patterns=self.config.filter_patterns,
            method=method, **kwargs,
        )
        self.dump(step, tag, acts)
        return out

    def dump(self, step: int, tag: str, acts: dict) -> str:
        cfg = self.config
        step_dir = os.path.join(cfg.dump_dir, f"step_{step:06d}")
        os.makedirs(step_dir, exist_ok=True)
        base = f"{tag}_rank{cfg.rank}"
        entries = []
        for k, v in acts.items():
            arr = np.asarray(v)
            ent = {"path": k, "shape": list(arr.shape),
                   "dtype": str(arr.dtype)}
            if arr.dtype != object and np.issubdtype(arr.dtype, np.number):
                f = arr.astype(np.float64)
                ent.update(
                    mean=float(f.mean()) if f.size else 0.0,
                    std=float(f.std()) if f.size else 0.0,
                    absmax=float(np.abs(f).max()) if f.size else 0.0,
                    nan=int(np.isnan(f).sum()),
                    inf=int(np.isinf(f).sum()),
                )
            entries.append(ent)
        if cfg.save_tensors:
            np.savez(os.path.join(step_dir, base + ".npz"), **acts)
        manifest = os.path.join(step_dir, base + "_manifest.jsonl")
        with open(manifest, "w") as fh:
            for ent in entries:
                fh.write(json.dumps(ent) + "\n")
        return manifest


def load_dump(dump_dir: str, step: int, tag: str = "fwd", rank: int = 0):
    path = os.path.join(
        dump_dir, f"step_{step:06d}", f"{tag}_rank{rank}.npz"
    )
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def load_manifest(dump_dir: str, step: int, tag: str = "fwd", rank: int = 0):
    path = os.path.join(
        dump_dir, f"step_{step:06d}", f"{tag}_rank{rank}_manifest.jsonl"
    )
    return [json.loads(line) for line in open(path)]


def compare_dumps(
    dir_a: str, dir_b: str, *,
    step: int, tag: str = "fwd", rank: int = 0,
    rtol: float = 1e-2, atol: float = 1e-4,
) -> dict:
    """Diff two implementations' dumps of the same step/tag/rank.

    Tensor-level compare when both sides saved tensors; falls back to
    manifest summary-stat compare (mean/std/absmax within rtol) when
    either side ran stats-only. Returns the compare_activations report
    (plus 'stats_only': True in the fallback)."""
    try:
        a, b = load_dump(dir_a, step, tag, rank), load_dump(
            dir_b, step, tag, rank
        )
        return compare_activations(a, b, rtol=rtol, atol=atol)
    except FileNotFoundError:
        ma = {e["path"]: e for e in load_manifest(dir_a, step, tag, rank)}
        mb = {e["path"]: e for e in load_manifest(dir_b, step, tag, rank)}
        report: dict = {"stats_only": True}
        for k in sorted(set(ma) & set(mb)):
            ea, eb = ma[k], mb[k]
            if ea["shape"] != eb["shape"]:
                report[k] = {"shape_mismatch": (ea["shape"], eb["shape"])}
                continue
            errs = {}
            for stat in ("mean", "std", "absmax"):
                if stat in ea and stat in eb:
                    denom = max(abs(eb[stat]), atol)
                    errs[stat] = abs(ea[stat] - eb[stat]) / denom
            report[k] = {
                "stat_rel_err": errs,
                "ok": all(e <= rtol for e in errs.values()),
                "nan": ea.get("nan", 0) + eb.get("nan", 0),
            }
        report["__missing__"] = sorted(set(ma) ^ set(mb))
        return report
