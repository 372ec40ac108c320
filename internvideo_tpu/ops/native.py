"""ctypes bindings for the C++ host ops (+ pure-numpy fallbacks).

The sequential/numeric host-side pieces the reference implements natively —
temporal NMS (nms_cpu.cpp) and libMR Weibull meta-recognition — live in
native/*.cpp, built into libivt_native.so by `make -C native` (done lazily
here on first use). Every entry point has a numpy fallback so the framework
functions without a toolchain; parity between the two is unit-tested.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_NATIVE_DIR, "libivt_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.temporal_nms.restype = ctypes.c_int
    lib.soft_temporal_nms.restype = ctypes.c_int
    lib.mr_fit_high.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def _cptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


# ---------------------------------------------------------------------------
# Temporal NMS
# ---------------------------------------------------------------------------


def temporal_nms(
    segments: np.ndarray,  # (N, 2) [start, end]
    scores: np.ndarray,  # (N,)
    iou_threshold: float = 0.5,
    max_keep: Optional[int] = None,
) -> np.ndarray:
    """Indices of kept segments, score-descending."""
    segments = np.ascontiguousarray(segments, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(scores)
    max_keep = max_keep or n
    lib = _load()
    if lib is not None:
        keep = np.empty(n, np.int32)
        m = lib.temporal_nms(
            _cptr(segments, ctypes.c_float), _cptr(scores, ctypes.c_float),
            n, ctypes.c_float(iou_threshold), max_keep,
            _cptr(keep, ctypes.c_int),
        )
        return keep[:m].copy()
    return _temporal_nms_np(segments, scores, iou_threshold, max_keep)


def _temporal_nms_np(segments, scores, iou_threshold, max_keep):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_keep:
            break
        s1, e1 = segments[i]
        s2, e2 = segments[:, 0], segments[:, 1]
        inter = np.maximum(0, np.minimum(e1, e2) - np.maximum(s1, s2))
        union = (e1 - s1) + (e2 - s2) - inter
        iou = np.where(union > 0, inter / union, 0)
        suppressed |= iou > iou_threshold
        suppressed[i] = True
    return np.asarray(keep, np.int32)


def soft_temporal_nms(
    segments: np.ndarray,
    scores: np.ndarray,
    iou_threshold: float = 0.5,
    sigma: float = 0.5,
    min_score: float = 1e-3,
    method: str = "gaussian",
) -> tuple[np.ndarray, np.ndarray]:
    """(kept_indices, decayed_scores)."""
    segments = np.ascontiguousarray(segments, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(scores)
    lib = _load()
    m_code = 1 if method == "gaussian" else 0
    if lib is not None:
        out_s = np.empty(n, np.float32)
        out_i = np.empty(n, np.int32)
        m = lib.soft_temporal_nms(
            _cptr(segments, ctypes.c_float), _cptr(scores, ctypes.c_float),
            n, ctypes.c_float(iou_threshold), ctypes.c_float(sigma),
            ctypes.c_float(min_score), m_code,
            _cptr(out_s, ctypes.c_float), _cptr(out_i, ctypes.c_int),
        )
        return out_i[:m].copy(), out_s[:m].copy()
    # numpy fallback
    s = scores.copy()
    done = np.zeros(n, bool)
    idxs, vals = [], []
    for _ in range(n):
        cand = np.where(~done & (s > min_score))[0]
        if len(cand) == 0:
            break
        best = cand[np.argmax(s[cand])]
        done[best] = True
        idxs.append(best)
        vals.append(s[best])
        s1, e1 = segments[best]
        s2, e2 = segments[:, 0], segments[:, 1]
        inter = np.maximum(0, np.minimum(e1, e2) - np.maximum(s1, s2))
        union = (e1 - s1) + (e2 - s2) - inter
        iou = np.where(union > 0, inter / union, 0)
        live = ~done
        if method == "gaussian":
            s[live] *= np.exp(-iou[live] ** 2 / sigma)
        else:
            dec = iou > iou_threshold
            s[live & dec] *= 1 - iou[live & dec]
    return np.asarray(idxs, np.int32), np.asarray(vals, np.float32)


# ---------------------------------------------------------------------------
# libMR Weibull meta-recognition
# ---------------------------------------------------------------------------


class MetaRecognition:
    """Extreme-value Weibull model over tail distances (libMR equivalent)."""

    def __init__(self):
        self.shape = None
        self.scale = None
        self.translate = 0.0

    def fit_high(self, data: np.ndarray, tail_size: int = 20) -> bool:
        data = np.ascontiguousarray(data, np.float64)
        lib = _load()
        if lib is not None:
            shape = ctypes.c_double()
            scale = ctypes.c_double()
            trans = ctypes.c_double()
            ok = lib.mr_fit_high(
                _cptr(data, ctypes.c_double), len(data), tail_size,
                ctypes.byref(shape), ctypes.byref(scale), ctypes.byref(trans),
            )
            if ok:
                self.shape, self.scale = shape.value, scale.value
                self.translate = trans.value
            return bool(ok)
        return self._fit_high_np(data, tail_size)

    def _fit_high_np(self, data, tail_size):
        tail = np.sort(data)[-tail_size:]
        t = 1.0 - tail[0] if tail[0] <= 0 else 0.0
        tail = tail + t
        # Newton on the Weibull profile likelihood
        lx = np.log(tail)
        k = 1.0
        for _ in range(100):
            xk = tail ** k
            a, b, c = (xk * lx).sum(), xk.sum(), (xk * lx * lx).sum()
            f = a / b - 1.0 / k - lx.mean()
            fp = (c * b - a * a) / (b * b) + 1.0 / k**2
            step = f / fp
            k -= step
            k = max(k, 1e-6)
            if abs(step) < 1e-10:
                break
        self.shape = k
        self.scale = float((tail**k).mean() ** (1.0 / k))
        self.translate = t
        return np.isfinite(k)

    def w_score(self, x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float64)
        lib = _load()
        if lib is not None:
            out = np.empty_like(x)
            lib.mr_w_score(
                _cptr(x, ctypes.c_double), len(x),
                ctypes.c_double(self.shape), ctypes.c_double(self.scale),
                ctypes.c_double(self.translate),
                _cptr(out, ctypes.c_double),
            )
            return out
        v = x + self.translate
        return np.where(
            v <= 0, 0.0, 1.0 - np.exp(-((np.maximum(v, 0) / self.scale) ** self.shape))
        )
