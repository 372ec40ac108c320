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
