"""Profiling helpers: xplane traces + step annotation + wall/flops timing.

TPU equivalent of the reference's step-scoped torch-profiler wrappers
(xtuner/v1/profiler/cuda_profile.py) and profile_time_and_memory contexts:
`trace()` wraps jax.profiler for a window of steps, `annotate()` names
regions in the trace, `timed()` measures wall time with a device sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an xplane trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed(name: str, results: Optional[dict] = None, sync=None):
    """Wall-clock a block; `sync` is a zero-arg device-sync callable."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            sync()
        dt = time.perf_counter() - t0
        if results is not None:
            results[name] = dt
        else:
            print(f"[timed] {name}: {dt * 1000:.2f} ms")


class StepProfiler:
    """Trace exactly steps [start, stop) of a training loop."""

    def __init__(self, logdir: str, start: int, stop: int):
        self.logdir = logdir
        self.start, self.stop = start, stop
        self._active = False

    def step(self, i: int):
        if i == self.start and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif i == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
