"""Checkpointing: orbax sharded save/restore + HF safetensors bridge.

Covers the reference's three checkpoint generations (SURVEY §5.4):
  * torch.save dicts w/ model/optimizer/epoch (single_modality/utils.py:488)
  * DeepSpeed tagged dirs (tasks/pretrain.py:404-434)
  * xtuner DCP sharded save/load + HF safetensors export with full-param
    gathering and multithreaded shard writes (engine/train_engine.py:423-514,
    model/base.py:547-814)

TPU-natively all three collapse into orbax: async, sharded, step-tagged,
with retention. The HF bridge reads/writes safetensors shards so published
reference checkpoints load, and our checkpoints can be exported for HF
consumers.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: save(step, state), restore latest, retention."""

    def __init__(
        self,
        directory: str,
        *,
        max_to_keep: int = 3,
        save_interval_steps: int = 1,
        async_save: bool = True,
    ):
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state: Any, *, force: bool = False) -> bool:
        return self._mngr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            return None
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()


# ---------------------------------------------------------------------------
# safetensors bridge (no torch required)
# ---------------------------------------------------------------------------

_DTYPES = {
    "F32": np.float32, "F16": np.float16, "BF16": None, "I64": np.int64,
    "I32": np.int32, "I16": np.int16, "I8": np.int8, "U8": np.uint8,
    "U16": np.uint16, "U32": np.uint32, "U64": np.uint64,
    "BOOL": np.bool_, "F64": np.float64,
}
# ml_dtypes-backed entries (BF16 handled inline; fp8 appears in published
# quantized checkpoints)
_ML_DTYPES = {"F8_E4M3": "float8_e4m3fn", "F8_E5M2": "float8_e5m2"}


def _dtype_for(tag: str, tensor_name: str):
    import ml_dtypes

    if tag in _ML_DTYPES:
        return getattr(ml_dtypes, _ML_DTYPES[tag])
    try:
        return _DTYPES[tag]
    except KeyError:
        raise ValueError(
            f"unsupported safetensors dtype {tag!r} for tensor "
            f"{tensor_name!r}"
        ) from None


def read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Minimal safetensors reader (header + raw little-endian buffers)."""
    import ml_dtypes

    out = {}
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n))
        base = 8 + n
        data = f.read()
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        start, end = meta["data_offsets"]
        buf = data[start:end]
        if meta["dtype"] == "BF16":
            arr = np.frombuffer(buf, dtype=ml_dtypes.bfloat16)
        else:
            arr = np.frombuffer(buf, dtype=_dtype_for(meta["dtype"], name))
        out[name] = arr.reshape(meta["shape"])
    return out


def write_safetensors(path: str, tensors: dict[str, np.ndarray]):
    import ml_dtypes

    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype == ml_dtypes.bfloat16:
            dt = "BF16"
        else:
            rev = {v: k for k, v in _DTYPES.items() if v is not None}
            rev.update({
                getattr(ml_dtypes, v): k for k, v in _ML_DTYPES.items()
            })
            try:
                dt = rev[arr.dtype.type]
            except KeyError:
                raise ValueError(
                    f"cannot serialize dtype {arr.dtype} of tensor "
                    f"{name!r} to safetensors"
                ) from None
        blob = arr.tobytes()
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(blob)],
        }
        offset += len(blob)
        blobs.append(blob)
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(len(hdr).to_bytes(8, "little"))
        f.write(hdr)
        for b in blobs:
            f.write(b)


def load_hf_checkpoint(directory: str) -> dict[str, np.ndarray]:
    """Load all safetensors shards in an HF checkpoint dir (index-aware)."""
    index = os.path.join(directory, "model.safetensors.index.json")
    tensors: dict[str, np.ndarray] = {}
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            tensors.update(
                read_safetensors(os.path.join(directory, shard))
            )
    else:
        for fn in sorted(os.listdir(directory)):
            if fn.endswith(".safetensors"):
                tensors.update(
                    read_safetensors(os.path.join(directory, fn))
                )
    return tensors


def save_hf_checkpoint(
    directory: str,
    tensors: dict[str, np.ndarray],
    *,
    shard_size_bytes: int = 4 * 1024**3,
):
    """Write tensors as sharded safetensors + index (HF layout)."""
    os.makedirs(directory, exist_ok=True)
    # drop stale artifacts from a previous (larger) export: the loader
    # prefers the index, so a leftover index + old shards would shadow a
    # fresh single-file export entirely
    for fn in os.listdir(directory):
        if fn == "model.safetensors.index.json" or (
            fn.startswith("model") and fn.endswith(".safetensors")
        ):
            os.remove(os.path.join(directory, fn))
    shards: list[dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for name, arr in tensors.items():
        nbytes = arr.nbytes
        if sizes[-1] + nbytes > shard_size_bytes and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][name] = arr
        sizes[-1] += nbytes
    total = len(shards)
    weight_map = {}
    for i, shard in enumerate(shards):
        fn = (
            "model.safetensors" if total == 1
            else f"model-{i + 1:05d}-of-{total:05d}.safetensors"
        )
        write_safetensors(os.path.join(directory, fn), shard)
        for k in shard:
            weight_map[k] = fn
    if total > 1:
        with open(
            os.path.join(directory, "model.safetensors.index.json"), "w"
        ) as f:
            json.dump(
                {
                    "metadata": {
                        "total_size": int(sum(a.nbytes for a in tensors.values()))
                    },
                    "weight_map": weight_map,
                },
                f,
            )


def flatten_params(params, prefix="") -> dict[str, np.ndarray]:
    """flax param tree -> flat {dotted.name: ndarray} (for HF export)."""
    out = {}
    for k, v in params.items():
        name = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(flatten_params(v, name))
        else:
            out[name] = np.asarray(jax.device_get(v))
    return out


def unflatten_params(flat: dict[str, np.ndarray]) -> dict:
    out: dict = {}
    for name, arr in flat.items():
        parts = name.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return out
