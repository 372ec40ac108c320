"""MLLM tokenize-fn: frame planning, placeholder expansion, 3D-RoPE grids,
pack integration, and the full (jsonl + video file) → SFT-step path.

Parity target: internvideo_tokenize_fn.py (948 LoC) + qwenvl_rope2d.py."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from internvideo_tpu.data.mllm_tokenize import (
    MLLMDataItem,
    MLLMTokenizeConfig,
    MLLMTokenizeFunction,
    calculate_timestamps,
    get_rope_index_3d,
    load_media,
    mllm_sft_batches,
    pack_mllm_items,
    sample_frames,
    video_smart_resize,
)

# small special ids so tests use a tiny vocab
IDS = dict(
    image_token_id=250, video_token_id=251, vision_start_token_id=247,
    vision_end_token_id=248, im_start_token_id=245, im_end_token_id=246,
    pad_token_id=0,
)


def _encode(text: str) -> list[int]:
    return [1 + (ord(c) % 200) for c in text]


def test_sample_frames_and_budget():
    # 30s @ 30fps, fps=2 → 60 frames, capped at max
    idx = sample_frames(900, 30.0, fps=2.0, min_frames=4, max_frames=16)
    assert len(idx) == 16 and idx[0] == 0 and idx[-1] == 899
    idx = sample_frames(6, 30.0, fps=2.0, min_frames=4, max_frames=16)
    assert len(idx) == 4  # min clamp

    # pixel budget shrinks large clips
    h, w = video_smart_resize(
        64, 640, 480, temporal_factor=2, factor=16,
        min_pixels=4 * 16 * 16, max_pixels=64 * 32 * 32,
    )
    assert h % 16 == 0 and w % 16 == 0
    assert 64 * h * w <= 64 * 32 * 32
    # and grows tiny ones
    h, w = video_smart_resize(
        2, 32, 32, temporal_factor=2, factor=16,
        min_pixels=2 * 64 * 64, max_pixels=2 ** 30,
    )
    assert 2 * h * w >= 2 * 64 * 64


def test_calculate_timestamps_merge():
    indices, ts = calculate_timestamps([0, 10, 20, 30], 10.0, merge_size=2)
    assert indices == [0, 10, 20, 30]
    # merged pairs averaged: (0+1)/2, (2+3)/2 seconds
    np.testing.assert_allclose(ts, [0.5, 2.5])
    # odd count pads with the last index
    indices, ts = calculate_timestamps([0, 10, 20], 10.0, merge_size=2)
    assert indices == [0, 10, 20, 20]


def test_rope_index_3d_layout():
    vs, vid = IDS["vision_start_token_id"], IDS["video_token_id"]
    # text(3) + start + 4 vision (grid 1x4x4 merged 2x2 → 4 tokens) + text(2)
    ids = np.array([5, 6, 7, vs, vid, vid, vid, vid, 9, 9], np.int32)
    grids = np.array([[1, 4, 4]], np.int32)
    pos = get_rope_index_3d(ids, grids, **{
        k: IDS[k] for k in
        ("image_token_id", "video_token_id", "vision_start_token_id")
    }, spatial_merge_size=2)
    assert pos.shape == (3, 10)
    # text prefix: all axes equal 0,1,2 and the start token gets 3
    np.testing.assert_array_equal(pos[:, :4], np.tile(np.arange(4), (3, 1)))
    # vision run at cursor 4: t=4 constant; h,w walk the 2x2 llm grid
    np.testing.assert_array_equal(pos[0, 4:8], [4, 4, 4, 4])
    np.testing.assert_array_equal(pos[1, 4:8], [4, 4, 5, 5])
    np.testing.assert_array_equal(pos[2, 4:8], [4, 5, 4, 5])
    # text resumes at cursor + max(1, 2, 2) = 6
    np.testing.assert_array_equal(pos[:, 8], [6, 6, 6])
    np.testing.assert_array_equal(pos[:, 9], [7, 7, 7])


def _tiny_cfg(**kw):
    return MLLMTokenizeConfig(
        patch_size=8, temporal_patch_size=2, spatial_merge_size=2,
        fps=2.0, min_frames=4, max_frames=16,
        video_min_total_pixels=4 * 32 * 32,
        video_max_total_pixels=16 * 32 * 32,
        **IDS, **kw,
    )


def _sample(path="", n_videos=1):
    marker = "<VIDEO_CONTEXT>"
    return {
        "messages": [
            {"role": "user", "content": f"what happens {marker} here?"},
            {"role": "assistant", "content": "a cat jumps"},
        ],
        "videos": [
            {"path": path, "width": 48, "height": 64,
             "origin_fps": 10.0, "origin_video_length": 20}
        ] * n_videos,
    }


def test_tokenize_placeholders_and_labels():
    cfg = _tiny_cfg(fixed_grid=(2, 4, 4))
    fn = MLLMTokenizeFunction(_encode, cfg)
    item = fn(_sample())
    # fixed grid (2,4,4): 2 merged frames x (4*4/4)=4 tokens each
    n_vid = int((item.input_ids == IDS["video_token_id"]).sum())
    assert n_vid == item.media[0].num_llm_tokens == 8
    # one vision_start/end pair per merged frame
    assert int((item.input_ids == IDS["vision_start_token_id"]).sum()) == 2
    assert int((item.input_ids == IDS["vision_end_token_id"]).sum()) == 2
    # labels: only the assistant body + its im_end are supervised
    sup = item.labels != -100
    assert sup.sum() > 0
    assert item.labels[sup][-1] == IDS["im_end_token_id"]
    # labels are PRE-SHIFTED next-token targets (the engine scores
    # hidden[i] against labels[i] with no further shift): every
    # supervised position predicts the NEXT input token
    pos = np.nonzero(sup)[0]
    np.testing.assert_array_equal(item.labels[pos], item.input_ids[pos + 1])
    assert not sup[-1]  # last position has no next token
    # no vision token is supervised
    assert not np.any(item.labels[item.input_ids == IDS["video_token_id"]] != -100)
    # position ids: every vision token's t-coord is constant per frame
    vpos = item.position_ids[:, item.input_ids == IDS["video_token_id"]]
    t0 = vpos[0, :4]
    assert np.all(t0 == t0[0])


def test_free_grid_budget_math():
    """Free-grid planning reproduces the reference num-token calculation."""
    cfg = _tiny_cfg()
    fn = MLLMTokenizeFunction(_encode, cfg)
    plan = fn.plan_video(
        {"width": 48, "height": 64, "origin_fps": 10.0,
         "origin_video_length": 20}
    )
    # fps=2 @10fps over 20 frames → 4 sampled frames (20/10*2=4)
    assert len(plan.frame_indices) == 4
    gt, gh, gw = plan.grid_thw
    assert gt == 2  # temporal merge 2
    assert plan.resize_hw == (gh * 8, gw * 8)
    assert gt * gh * gw * 8 * 8 * 2 <= cfg.video_max_total_pixels * 2


def test_pack_and_sft_step(tmp_path):
    """jsonl + real video file → packed batch → one SFT train step, with the
    placeholder count matching the vision tower's actual token output."""
    from internvideo_tpu.models.llm import LLMConfig
    from internvideo_tpu.models.mllm import MLLMConfig, VideoMLLM
    from internvideo_tpu.models.vision_tower import VisionTowerConfig
    from internvideo_tpu.nn.mla import MLAConfig
    from internvideo_tpu.train.engines.sft import SFTConfig, make_sft_step
    from internvideo_tpu.train.state import TrainState

    rng = np.random.default_rng(0)
    vid_path = os.path.join(tmp_path, "clip.npy")
    np.save(vid_path, rng.integers(0, 255, (20, 64, 48, 3), dtype=np.uint8))
    jsonl_path = os.path.join(tmp_path, "data.jsonl")
    with open(jsonl_path, "w") as f:
        for _ in range(3):
            f.write(json.dumps(_sample(path=vid_path)) + "\n")

    cfg = _tiny_cfg(fixed_grid=(2, 4, 4))
    fn = MLLMTokenizeFunction(_encode, cfg)
    stream = mllm_sft_batches(
        jsonl_path, fn, pack_max_length=96, loop=True
    )
    batch = next(stream)
    b, l = batch["input_ids"].shape
    assert l == 96 and batch["position_ids"].shape == (3, b, 96)
    assert batch["video"].shape == (b, 4, 32, 32, 3)  # fixed grid 2x4x4

    vis_cfg = VisionTowerConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        patch_size=8, temporal_patch_size=2, spatial_merge_size=2,
        pos_embed_grid=6, deepstack_indexes=(1,), text_hidden_size=48,
        attn_impl="xla",
    )
    llm_cfg = LLMConfig(
        vocab_size=260, hidden_size=48, num_layers=2, intermediate_size=96,
        mrope_section=(2, 1, 1),
        mla=MLAConfig(
            hidden_size=48, num_heads=2, kv_lora_rank=24, qk_rope_head_dim=8,
            qk_nope_head_dim=8, v_head_dim=8,
        ),
        attn_impl="xla",
    )
    model = VideoMLLM(MLLMConfig(
        vision=vis_cfg, text=llm_cfg,
        image_token_id=IDS["image_token_id"],
        video_token_id=IDS["video_token_id"],
        vision_start_token_id=IDS["vision_start_token_id"],
        vision_end_token_id=IDS["vision_end_token_id"],
    ))
    from flax import linen as nn

    ids = jnp.asarray(batch["input_ids"])
    video = jnp.asarray(batch["video"], jnp.float32)
    params = nn.unbox(model.init(jax.random.key(0), ids, video)["params"])

    # placeholder count == the tower's real token output per video
    visual, _ = model.apply(
        {"params": params}, video, method="encode_video"
    )
    n_placeholder = int((ids[0] == IDS["video_token_id"]).sum())
    assert visual.shape[1] == n_placeholder, (visual.shape, n_placeholder)

    tx = optax.adamw(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )
    step = make_sft_step(model, SFTConfig(ce_chunk_size=32))
    state, metrics = jax.jit(step)(
        state, {
            "input_ids": ids,
            "labels": jnp.asarray(batch["labels"]),
            "segment_ids": jnp.asarray(batch["segment_ids"]),
            "position_ids": jnp.asarray(batch["position_ids"]),
            "video": video,
        }, jax.random.key(1),
    )
    assert bool(metrics["finite"]) and float(metrics["tokens"]) > 0
    # a second batch from the stream keeps the same static shapes
    batch2 = next(stream)
    assert batch2["input_ids"].shape == batch["input_ids"].shape
