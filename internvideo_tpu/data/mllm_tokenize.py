"""MLLM multimodal tokenize-fn: jsonl sample → packed token/vision batch.

Host-side (numpy) counterpart of the reference's InternVideoTokenizeFunction
(InternVideo3_sft/xtuner/v1/datasets/mllm_tokenize_fn/
internvideo_tokenize_fn.py, 948 LoC) and its Qwen3-VL rope helper
(qwenvl_rope2d.py:get_rope_index_3):

  * fps-driven frame sampling with min/max frame clamps (sample_frames :94)
  * pixel-budget smart resize — round (T,H,W) to patch/merge multiples and
    scale down/up so T·H·W fits [min_pixels, max_pixels]
    (video_smart_resize :58)
  * per-frame timestamps averaged over the temporal merge window
    (calculate_timestamps :115)
  * placeholder expansion: each <VIDEO_CONTEXT> marker becomes, per merged
    frame, "<ts> <vision_start> <video_pad>*frame_seqlen <vision_end>"
    (replace_video_token :133)
  * 3D mRoPE position grids: text runs advance all three axes together,
    vision runs get (t, h, w) grid coordinates; videos are split per-frame
    with grid_t=1 because timestamps separate frames (get_rope_index_3)
  * chatml-style supervision: only assistant spans (+ their <im_end>)
    carry labels
  * pack integration: soft-pack items to `pack_max_length` and emit static
    (P, L) batches (+ (3, P, L) position ids) for the SFT engine

TPU-first deviation: the device path wants ONE static video shape per batch,
so `plan_video` supports `fixed_grid` — the fps/pixel budget still chooses
the frames, then the clip is resized to the pinned grid. Free-grid planning
(exact reference math) is used for token counting and packing.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Callable, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Frame sampling / pixel budgets (internvideo_tokenize_fn.py:58-130)
# ---------------------------------------------------------------------------


def video_smart_resize(
    num_frames: int,
    height: int,
    width: int,
    *,
    temporal_factor: int = 2,
    factor: int = 28,  # patch_size * merge_size
    min_pixels: int = 128 * 128,
    max_pixels: int = 16 * 16 * 2 * 2 * 2 * 6144,
) -> tuple[int, int]:
    """Round (H, W) to `factor` multiples, scaled so T·H·W fits the budget."""
    if num_frames < temporal_factor:
        raise ValueError(f"t={num_frames} < temporal_factor={temporal_factor}")
    if height < factor or width < factor:
        raise ValueError(f"height/width must be >= {factor}")
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio over 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    t_bar = round(num_frames / temporal_factor) * temporal_factor
    if t_bar * h_bar * w_bar > max_pixels:
        beta = math.sqrt((num_frames * height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif t_bar * h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (num_frames * height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def sample_frames(
    origin_total_num_frames: int,
    origin_fps: float,
    *,
    num_frames: Optional[int] = None,
    fps: float = 2.0,
    min_frames: int = 4,
    max_frames: int = 768,
) -> np.ndarray:
    """Uniform indices at ~`fps` sampled frames/sec, clamped to budgets."""
    total = origin_total_num_frames
    if num_frames is None:
        num_frames = int(total / origin_fps * fps)
        num_frames = min(max(num_frames, min_frames), max_frames, total)
    num_frames = max(num_frames, min_frames)
    return np.linspace(0, total - 1, num_frames).round().astype(int)


def calculate_timestamps(
    indices: Sequence[int],
    video_fps: float,
    *,
    merge_size: int = 2,
    timestamps: Optional[list[float]] = None,
) -> tuple[list[int], list[float]]:
    """Pad indices to a merge multiple; average timestamps per merge window."""
    indices = list(indices)
    if len(indices) % merge_size != 0:
        pad = merge_size - len(indices) % merge_size
        indices.extend(indices[-1] for _ in range(pad))
        if timestamps is not None:
            timestamps.extend(timestamps[-1] for _ in range(pad))
    if timestamps is None:
        timestamps = [i / video_fps for i in indices]
    assert len(timestamps) == len(indices)
    timestamps = [
        (timestamps[i] + timestamps[i + merge_size - 1]) / 2
        for i in range(0, len(timestamps), merge_size)
    ]
    return indices, timestamps


# ---------------------------------------------------------------------------
# Config / data items
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MLLMTokenizeConfig:
    # vision geometry — must match the VisionTowerConfig in use
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    # frame / pixel budgets (internvideo_tokenize_fn.py defaults)
    fps: float = 2.0
    min_frames: int = 4
    max_frames: int = 768
    rand_video_max_frames: int = 512
    video_min_total_pixels: int = 4 * 4 * 32 * 28
    video_max_total_pixels: int = 20480 * 4 * 32 * 28
    # special token ids (MLLMConfig defaults / Qwen3 family)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    im_start_token_id: int = 151644
    im_end_token_id: int = 151645
    pad_token_id: int = 0
    max_length: Optional[int] = None
    add_timestamps: bool = True
    # pin the device grid (gt, gh, gw): frames/resolution resized to match.
    # None = free grid (reference-exact budgets; used for token counting)
    fixed_grid: Optional[tuple[int, int, int]] = None

    @property
    def merge_length(self) -> int:
        return self.spatial_merge_size ** 2

    @property
    def resize_factor(self) -> int:
        return self.patch_size * self.spatial_merge_size


@dataclasses.dataclass
class MediaPlan:
    """Decode/resize instructions for one video (host loader executes)."""

    path: str
    frame_indices: list[int]  # into the source video
    resize_hw: tuple[int, int]  # target (H, W) after smart resize
    grid_thw: tuple[int, int, int]  # (gt, gh, gw) BEFORE spatial merge
    timestamps: list[float]  # one per merged frame (len == gt)
    merge_length: int = 4  # spatial_merge_size**2

    @property
    def frame_seqlen(self) -> int:
        _, gh, gw = self.grid_thw
        return gh * gw // self.merge_length

    @property
    def num_llm_tokens(self) -> int:
        gt, _, _ = self.grid_thw
        return gt * self.frame_seqlen


@dataclasses.dataclass
class MLLMDataItem:
    input_ids: np.ndarray  # (L,) int32
    labels: np.ndarray  # (L,) int32, -100 unsupervised
    position_ids: np.ndarray  # (3, L) int32 mrope grids
    media: list[MediaPlan]

    @property
    def num_tokens(self) -> int:
        return int(self.input_ids.shape[0])


# ---------------------------------------------------------------------------
# 3D mRoPE grids (qwenvl_rope2d.py get_rope_index_3)
# ---------------------------------------------------------------------------


def get_rope_index_3d(
    input_ids: np.ndarray,  # (L,) int32
    video_grid_thw: Optional[np.ndarray],  # (n, 3) per VISION RUN (t=1 rows)
    *,
    image_token_id: int = 151655,
    video_token_id: int = 151656,
    vision_start_token_id: int = 151652,
    spatial_merge_size: int = 2,
) -> np.ndarray:
    """(3, L) position ids: text advances all axes together; each vision run
    gets (t, h, w) grid coordinates starting at the running offset. Videos
    arrive pre-split per merged frame (grid_t == 1 rows) because timestamps
    separate the frames (Qwen3-VL convention, qwenvl_rope2d.py:21-27)."""
    ids = list(input_ids.tolist())
    L = len(ids)
    pos = np.zeros((3, L), np.int64)
    m = spatial_merge_size

    runs = []  # (start, end) of vision-token runs
    i = 0
    while i < L:
        if ids[i] == vision_start_token_id and i + 1 < L and ids[i + 1] in (
            image_token_id, video_token_id
        ):
            j = i + 1
            while j < L and ids[j] in (image_token_id, video_token_id):
                j += 1
            runs.append((i + 1, j))
            i = j
        else:
            i += 1
    n_runs = len(runs)
    if video_grid_thw is None:
        assert n_runs == 0, "vision tokens present but no grids given"
        pos[:] = np.arange(L)[None]
        return pos.astype(np.int32)
    assert n_runs == video_grid_thw.shape[0], (
        f"{n_runs} vision runs != {video_grid_thw.shape[0]} grid rows"
    )

    cursor = 0  # text position cursor
    prev_end = 0
    for run_idx, (s, e) in enumerate(runs):
        # text span before the run (includes the vision_start token)
        span = s - prev_end
        pos[:, prev_end:s] = cursor + np.arange(span)[None]
        cursor += span
        gt, gh, gw = (int(x) for x in video_grid_thw[run_idx])
        lh, lw = gh // m, gw // m
        n = gt * lh * lw
        assert e - s == n, f"run length {e - s} != grid tokens {n}"
        t_idx = np.repeat(np.arange(gt), lh * lw)
        h_idx = np.tile(np.repeat(np.arange(lh), lw), gt)
        w_idx = np.tile(np.arange(lw), gt * lh)
        pos[0, s:e] = cursor + t_idx
        pos[1, s:e] = cursor + h_idx
        pos[2, s:e] = cursor + w_idx
        cursor += int(max(gt, lh, lw))
        prev_end = e
    span = L - prev_end
    pos[:, prev_end:] = cursor + np.arange(span)[None]
    return pos.astype(np.int32)


# ---------------------------------------------------------------------------
# The tokenize function
# ---------------------------------------------------------------------------

VIDEO_MARKER = "<VIDEO_CONTEXT>"


class MLLMTokenizeFunction:
    """sample dict → MLLMDataItem.

    sample format (jsonl row):
      {"messages": [{"role": "system|user|assistant|pretrain",
                     "content": "text possibly containing <VIDEO_CONTEXT>"}],
       "videos": [{"path": ..., "width": W, "height": H,
                   "origin_fps": f, "origin_video_length": n,
                   "frames_timestamp": [...]?}]}

    `text_encode` is any str -> list[int] encoder WITHOUT special tokens
    (e.g. `lambda t: hf_tok(t, add_special_tokens=False)["input_ids"]`).
    """

    def __init__(
        self,
        text_encode: Callable[[str], list[int]],
        cfg: MLLMTokenizeConfig,
    ):
        self.encode = text_encode
        self.cfg = cfg

    # -- planning ------------------------------------------------------------

    def plan_video(self, video_info: dict) -> MediaPlan:
        cfg = self.cfg
        origin_fps = float(video_info.get("origin_fps", 30.0))
        vlen = int(video_info["origin_video_length"])
        height = int(video_info.get("height", 224))
        width = int(video_info.get("width", 224))

        if cfg.fixed_grid is not None:
            gt, gh, gw = cfg.fixed_grid
            n_frames = gt * cfg.temporal_patch_size
            indices = sample_frames(
                vlen, origin_fps, num_frames=n_frames,
                min_frames=n_frames, max_frames=n_frames,
            )
            ts = video_info.get("frames_timestamp")
            if ts is not None:
                ts = [ts[i] for i in indices]
            indices, timestamps = calculate_timestamps(
                indices, origin_fps, merge_size=cfg.temporal_patch_size,
                timestamps=ts,
            )
            rh, rw = gh * cfg.patch_size, gw * cfg.patch_size
            return MediaPlan(
                path=video_info.get("path", ""),
                frame_indices=indices,
                resize_hw=(rh, rw),
                grid_thw=(gt, gh, gw),
                timestamps=timestamps,
                merge_length=cfg.merge_length,
            )

        indices = sample_frames(
            vlen, origin_fps, fps=cfg.fps,
            min_frames=cfg.min_frames, max_frames=cfg.max_frames,
        )
        ts = video_info.get("frames_timestamp")
        if ts is not None:
            ts = [ts[i] for i in indices]
        indices, timestamps = calculate_timestamps(
            indices, origin_fps, merge_size=cfg.temporal_patch_size,
            timestamps=ts,
        )
        rh, rw = video_smart_resize(
            len(indices), height, width,
            temporal_factor=cfg.temporal_patch_size,
            factor=cfg.resize_factor,
            min_pixels=cfg.video_min_total_pixels,
            max_pixels=cfg.video_max_total_pixels,
        )
        grid = (
            len(indices) // cfg.temporal_patch_size,
            rh // cfg.patch_size,
            rw // cfg.patch_size,
        )
        return MediaPlan(
            path=video_info.get("path", ""),
            frame_indices=indices,
            resize_hw=(rh, rw),
            grid_thw=grid,
            timestamps=timestamps,
            merge_length=cfg.merge_length,
        )

    # -- rendering -----------------------------------------------------------

    def _render_video_placeholder(self, plan: MediaPlan) -> list[int]:
        """Per merged frame: [ts text] <vision_start> <pad>*seqlen <vision_end>
        (replace_video_token :133-216 — each frame individually wrapped)."""
        cfg = self.cfg
        out: list[int] = []
        for ft in range(plan.grid_thw[0]):
            if cfg.add_timestamps:
                out += self.encode(f"<{plan.timestamps[ft]:.1f} seconds>")
            out.append(cfg.vision_start_token_id)
            out += [cfg.video_token_id] * plan.frame_seqlen
            out.append(cfg.vision_end_token_id)
        return out

    def _render_message(
        self, role: str, content: str, plans: list[MediaPlan], media_cursor: int
    ) -> tuple[list[int], int, list[tuple[int, int]]]:
        """Returns (ids, new_media_cursor, supervised_spans)."""
        cfg = self.cfg
        ids: list[int] = [cfg.im_start_token_id]
        ids += self.encode(role + "\n")
        body_start = len(ids)
        parts = content.split(VIDEO_MARKER)
        for pi, part in enumerate(parts):
            if pi > 0:
                ids += self._render_video_placeholder(plans[media_cursor])
                media_cursor += 1
            if part:
                ids += self.encode(part)
        ids.append(cfg.im_end_token_id)
        spans = []
        if role == "assistant":
            spans.append((body_start, len(ids)))  # content + im_end
        return ids, media_cursor, spans

    def __call__(self, sample: dict) -> MLLMDataItem:
        cfg = self.cfg
        plans = [self.plan_video(v) for v in sample.get("videos", [])]
        ids: list[int] = []
        label_spans: list[tuple[int, int]] = []
        cursor = 0
        for msg in sample["messages"]:
            base = len(ids)
            mids, cursor, spans = self._render_message(
                msg["role"], msg["content"], plans, cursor
            )
            ids += mids
            label_spans += [(base + a, base + b) for a, b in spans]
        assert cursor == len(plans), (
            f"{len(plans)} videos but {cursor} markers consumed"
        )

        input_ids = np.asarray(ids, np.int32)
        if cfg.max_length is not None and len(ids) > cfg.max_length:
            input_ids = input_ids[: cfg.max_length]
            # a truncated vision run would desync placeholders ↔ pixels
            n_expected = sum(p.num_llm_tokens for p in plans)
            n_have = int((input_ids == cfg.video_token_id).sum())
            if n_have != n_expected:
                raise ValueError(
                    "max_length truncation cut a vision run; drop this sample"
                )
        labels = np.full_like(input_ids, -100)
        for a, b in label_spans:
            labels[a : min(b, len(labels))] = input_ids[a : min(b, len(labels))]
        # pre-shift to next-token targets (the engine contract —
        # sequence_context.py: labels are "(B, L) shifted targets"; the
        # loss scores hidden[i] directly against labels[i]); shifting per
        # item BEFORE packing keeps targets from leaking across segments
        labels = np.concatenate([labels[1:], [-100]]).astype(labels.dtype)

        # per merged frame the grid row is (1, gh, gw):
        # _render_video_placeholder wraps EVERY frame in its own
        # vision_start/end run (with or without timestamp text), so rope
        # grid rows must match run-for-run
        grid_rows = []
        for p in plans:
            gt, gh, gw = p.grid_thw
            grid_rows += [(1, gh, gw)] * gt
        grids = (
            np.asarray(grid_rows, np.int32).reshape(-1, 3)
            if grid_rows else None
        )
        position_ids = get_rope_index_3d(
            input_ids,
            grids,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            spatial_merge_size=cfg.spatial_merge_size,
        )
        return MLLMDataItem(
            input_ids=input_ids,
            labels=labels,
            position_ids=position_ids,
            media=plans,
        )


# ---------------------------------------------------------------------------
# Media loading + pack integration
# ---------------------------------------------------------------------------


def load_media(plan: MediaPlan, reader=None) -> np.ndarray:
    """Execute a MediaPlan: decode frames, bilinear-resize, normalize to
    float32 in [-1, 1]. Returns (T, H, W, 3)."""
    from internvideo_tpu.data.video import read_frames

    if reader is None:
        reader = read_frames
    frames = reader(plan.path, np.asarray(plan.frame_indices))
    t = frames.shape[0]
    rh, rw = plan.resize_hw
    if frames.shape[1:3] != (rh, rw):
        frames = _bilinear_resize_batch(frames, rh, rw)
    x = frames.astype(np.float32) / 127.5 - 1.0
    return x


def _bilinear_resize_batch(frames: np.ndarray, rh: int, rw: int) -> np.ndarray:
    """Vectorized bilinear resize, (T, H, W, C) uint8/float → (T, rh, rw, C)."""
    t, h, w, c = frames.shape
    ys = (np.arange(rh) + 0.5) * h / rh - 0.5
    xs = (np.arange(rw) + 0.5) * w / rw - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[None, :, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, None, :, None]
    f = frames.astype(np.float32)
    top = f[:, y0][:, :, x0] * (1 - wx) + f[:, y0][:, :, x1] * wx
    bot = f[:, y1][:, :, x0] * (1 - wx) + f[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def _pack_one_video_per_row(
    items: Sequence[MLLMDataItem], pack_max_length: int
):
    """Greedy packing that puts at most ONE video-bearing sample per pack
    (the static device path carries one clip tensor per row); text-only
    samples fill the remaining space best-fit."""
    from internvideo_tpu.data.packing import PackingResult

    vid = [i for i, it in enumerate(items)
           if it.media and it.num_tokens <= pack_max_length]
    txt = [i for i, it in enumerate(items)
           if not it.media and it.num_tokens <= pack_max_length]
    dropped = [i for i, it in enumerate(items)
               if it.num_tokens > pack_max_length]
    packs = [[i] for i in vid]
    remaining = [pack_max_length - items[i].num_tokens for i in vid]
    for i in sorted(txt, key=lambda i: -items[i].num_tokens):
        n = items[i].num_tokens
        best, best_left = None, None
        for pi in range(len(packs)):
            left = remaining[pi] - n
            if left >= 0 and (best_left is None or left < best_left):
                best, best_left = pi, left
        if best is None:
            packs.append([i])
            remaining.append(pack_max_length - n)
        else:
            packs[best].append(i)
            remaining[best] = best_left
    used = sum(items[i].num_tokens for p in packs for i in p)
    eff = used / max(len(packs) * pack_max_length, 1)
    return PackingResult(packs=packs, efficiency=eff, dropped=dropped)


def pack_mllm_items(
    items: Sequence[MLLMDataItem],
    pack_max_length: int,
    *,
    pad_token_id: int = 0,
    one_video_per_pack: bool = False,
) -> dict:
    """Soft-pack tokenized items into static (P, L) arrays for the SFT step.

    Returns {"input_ids", "labels", "segment_ids", "position_ids", "packs"}:
    segment_ids number the samples within each pack (pad = -1), position_ids
    stack to (3, P, L), and "packs" lists the item indices per row so the
    caller can assemble the matching media batch.
    """
    from internvideo_tpu.data.packing import soft_pack

    if one_video_per_pack:
        res = _pack_one_video_per_row(items, pack_max_length)
    else:
        lengths = [it.num_tokens for it in items]
        res = soft_pack(lengths, pack_max_length)
    P, L = len(res.packs), pack_max_length
    input_ids = np.full((P, L), pad_token_id, np.int32)
    labels = np.full((P, L), -100, np.int32)
    segment_ids = np.full((P, L), -1, np.int32)
    position_ids = np.zeros((3, P, L), np.int32)
    for pi, pack in enumerate(res.packs):
        off = 0
        for si, idx in enumerate(pack):
            it = items[idx]
            n = it.num_tokens
            input_ids[pi, off : off + n] = it.input_ids
            labels[pi, off : off + n] = it.labels
            segment_ids[pi, off : off + n] = si
            position_ids[:, pi, off : off + n] = it.position_ids
            off += n
    return {
        "input_ids": input_ids,
        "labels": labels,
        "segment_ids": segment_ids,
        "position_ids": position_ids,
        "packs": res.packs,
        "efficiency": res.efficiency,
        "dropped": res.dropped,
    }


def mllm_sft_batches(
    jsonl_path: str,
    tokenize_fn: MLLMTokenizeFunction,
    *,
    pack_max_length: int,
    media_root: str = "",
    reader=None,
    loop: bool = True,
    batch_size: Optional[int] = None,
):
    """(jsonl + video files) → packed multimodal batches, streaming.

    Requires cfg.fixed_grid so every pack row carries one static-shape video
    (the TPU path needs static shapes; rows with != 1 video are skipped).
    Yields dicts matching the SFT engine's batch contract. With batch_size
    set, rows are re-chunked into fixed-size batches across packing rounds
    (static batch dim for jit).
    """
    cfg = tokenize_fn.cfg
    assert cfg.fixed_grid is not None, "device batching needs a fixed grid"
    with open(jsonl_path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    import os as _os

    # tokenize ONCE — items are deterministic, only packing + media decode
    # re-run per round; malformed rows (bad marker/video counts raise
    # Assertion/IndexError, truncation raises ValueError) are skipped, not
    # allowed to kill the stream
    items = []
    for row in rows:
        for v in row.get("videos", []):
            if media_root and not _os.path.isabs(v.get("path", "")):
                v["path"] = _os.path.join(media_root, v["path"])
        try:
            items.append(tokenize_fn(row))
        except (ValueError, IndexError, AssertionError):
            continue

    def round_rows():
        """One packing round → list of per-row dicts."""
        packed = pack_mllm_items(
            items, pack_max_length, pad_token_id=cfg.pad_token_id,
            one_video_per_pack=True,
        )
        gt, gh, gw = cfg.fixed_grid
        dummy_shape = (
            gt * cfg.temporal_patch_size,
            gh * cfg.patch_size, gw * cfg.patch_size, 3,
        )
        out = []
        for pi, pack in enumerate(packed["packs"]):
            plans = [p for idx in pack for p in items[idx].media]
            if len(plans) > 1:
                continue  # the video-aware packer should prevent this
            video = (
                load_media(plans[0], reader=reader) if plans
                # text-only rows ride with a dummy clip (no placeholders →
                # the scatter mask is empty and the tower output is unused)
                else np.zeros(dummy_shape, np.float32)
            )
            out.append({
                "input_ids": packed["input_ids"][pi],
                "labels": packed["labels"][pi],
                "segment_ids": packed["segment_ids"][pi],
                "position_ids": packed["position_ids"][:, pi],
                "video": video,
            })
        if not out:
            raise ValueError(
                "no usable pack rows (every sample longer than "
                f"pack_max_length={pack_max_length}?)"
            )
        return out

    def stack(buf):
        return {
            "input_ids": np.stack([b["input_ids"] for b in buf]),
            "labels": np.stack([b["labels"] for b in buf]),
            "segment_ids": np.stack([b["segment_ids"] for b in buf]),
            "position_ids": np.stack(
                [b["position_ids"] for b in buf], axis=1
            ),
            "video": np.stack([b["video"] for b in buf]),
        }

    buf: list[dict] = []
    while True:
        for r in round_rows():
            buf.append(r)
            if batch_size is not None and len(buf) == batch_size:
                yield stack(buf)
                buf = []
        if batch_size is None and buf:
            yield stack(buf)
            buf = []
        if not loop:
            if buf:  # flush the final partial batch — don't drop rows
                yield stack(buf)
            return
