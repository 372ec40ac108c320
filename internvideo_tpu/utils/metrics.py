"""Training metrics: smoothed values, structured step logs, jsonl tracker.

Equivalent of the reference's MetricLogger/SmoothedValue
(single_modality/utils.py:30-235) and xtuner's jsonl/tensorboard exp
trackers (xtuner/v1/_writer). Distributed synchronization is unnecessary on
the host side — metrics come out of jit already globally reduced.
"""

from __future__ import annotations

import collections
import json
import os
import time
from typing import Optional


class SmoothedValue:
    def __init__(self, window: int = 20, fmt: str = "{avg:.4f}"):
        self.window = collections.deque(maxlen=window)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.window.append(value)
        self.total += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return sum(self.window) / max(len(self.window), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def value(self) -> float:
        return self.window[-1] if self.window else 0.0

    def __str__(self):
        return self.fmt.format(
            avg=self.avg, global_avg=self.global_avg, value=self.value
        )


# bf16 peak FLOPs by TPU generation (public spec numbers)
_PEAK_BF16 = {
    "v4": 275e12,
    "v5 lite": 197e12, "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12, "v6e": 918e12,
}


def _device_peak_flops() -> Optional[float]:
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # noqa: BLE001
        return None
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak
    return None


class MetricLogger:
    def __init__(
        self,
        jsonl_path: Optional[str] = None,
        log_every: int = 10,
        print_fn=print,
        tensorboard_dir: Optional[str] = None,
    ):
        self.meters: dict[str, SmoothedValue] = collections.defaultdict(
            SmoothedValue
        )
        self.log_every = log_every
        self.print_fn = print_fn
        self._jsonl = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._jsonl = open(jsonl_path, "a")
        self._tb = None
        if tensorboard_dir:
            # xtuner _writer/ tensorboard tracker equivalent (trainer.py:949)
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(tensorboard_dir)
        self._t_last = time.perf_counter()
        self._tokens_since = 0
        self._flops_since = 0.0
        self._peak_flops = None

    def set_peak_flops(self, peak: Optional[float] = None):
        """Enable MFU reporting. peak=None autodetects the chip's bf16 peak
        from the device kind (fallback: report achieved TFLOPs only)."""
        self._peak_flops = peak if peak is not None else _device_peak_flops()

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def add_tokens(self, n: int):
        self._tokens_since += int(n)

    def add_flops(self, n: float):
        """Model FLOPs spent this window (e.g. flops_per_step each step)."""
        self._flops_since += float(n)

    def log_step(self, step: int, extra: Optional[dict] = None,
                 *, window_steps: Optional[int] = None):
        """`window_steps` = steps actually covered since the last log
        (defaults to log_every; the final window can be partial)."""
        now = time.perf_counter()
        dt = now - self._t_last
        steps_in_window = window_steps or self.log_every
        record = {
            "step": step,
            "time_per_step": dt / max(steps_in_window, 1),
            **{k: m.avg for k, m in self.meters.items()},
        }
        if self._tokens_since:
            record["tokens_per_sec"] = self._tokens_since / dt
            self._tokens_since = 0
        if self._flops_since:
            achieved = self._flops_since / dt
            record["tflops_per_sec"] = achieved / 1e12
            if self._peak_flops:
                # MFU: achieved model FLOPs (global batch) over the
                # FLEET's peak — per-chip peak × device_count, else an
                # 8-chip run at true 40% would log mfu=3.2
                import jax as _jax

                fleet_peak = self._peak_flops * _jax.device_count()
                record["mfu"] = achieved / fleet_peak
            self._flops_since = 0.0
        if extra:
            record.update(extra)
        self._t_last = now
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            for k, v in record.items():
                if k != "step" and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, float(v), step)
        msg = "  ".join(
            f"{k}: {v:.5g}" if isinstance(v, float) else f"{k}: {v}"
            for k, v in record.items()
        )
        self.print_fn(msg)
        return record

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
