"""Real-shape checkpoint bridge: a synthetically-written 1B-width reference
state dict (full 1408/6144 dims, reduced depth to keep CI memory sane)
survives torch-naming -> flax conversion, a sharded safetensors export, and
a reload — byte-exact. Pins the weight-bridge path at production tensor
shapes rather than toy dims."""

import numpy as np

from internvideo_tpu.core.checkpoint import (
    load_hf_checkpoint,
    save_hf_checkpoint,
)
from internvideo_tpu.models.convert import convert_internvideo2_encoder

D, DEPTH, HEADS, MLP = 1408, 3, 16, 6144  # 1B-width dims, shallow depth
PATCH, FRAMES, IMG = 14, 8, 224


def _synthetic_reference_sd(rng) -> dict:
    """State dict with the reference's exact names/shapes
    (single_modality/models/internvideo2.py) at 1B width."""
    n_patches = (IMG // PATCH) ** 2 * FRAMES
    sd = {
        "patch_embed.proj.weight": rng.standard_normal(
            (D, 3, 1, PATCH, PATCH), dtype=np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(D, np.float32),
        "cls_token": rng.standard_normal((1, 1, D), dtype=np.float32) * 0.02,
        "pos_embed": rng.standard_normal(
            (1, 1 + n_patches, D), dtype=np.float32) * 0.02,
    }
    for i in range(DEPTH):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = np.ones(D, np.float32)
        sd[f"{b}.norm2.weight"] = np.ones(D, np.float32)
        sd[f"{b}.attn.qkv.weight"] = rng.standard_normal(
            (3 * D, D), dtype=np.float32) * 0.02
        sd[f"{b}.attn.proj.weight"] = rng.standard_normal(
            (D, D), dtype=np.float32) * 0.02
        sd[f"{b}.attn.proj.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.attn.q_norm.weight"] = np.ones(D, np.float32)
        sd[f"{b}.attn.k_norm.weight"] = np.ones(D, np.float32)
        sd[f"{b}.ls1.gamma"] = np.full(D, 0.1, np.float32)
        sd[f"{b}.ls2.gamma"] = np.full(D, 0.1, np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.standard_normal(
            (MLP, D), dtype=np.float32) * 0.02
        sd[f"{b}.mlp.fc1.bias"] = np.zeros(MLP, np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.standard_normal(
            (D, MLP), dtype=np.float32) * 0.02
        sd[f"{b}.mlp.fc2.bias"] = np.zeros(D, np.float32)
    return sd


def test_1b_width_convert_export_reload(tmp_path):
    rng = np.random.default_rng(0)
    sd = _synthetic_reference_sd(rng)
    params = convert_internvideo2_encoder(sd, depth=DEPTH)["params"]

    # shapes land exactly where the flax model expects them
    assert params["patch_embed"]["proj"]["kernel"].shape == (
        1 * PATCH * PATCH * 3, D)
    assert params["blocks_0"]["attn"]["qkv"]["kernel"].shape == (D, 3 * D)
    assert params["blocks_0"]["mlp"]["fc1"]["kernel"].shape == (D, MLP)
    # conversion is a layout transform, not a numeric one
    np.testing.assert_array_equal(
        params["blocks_1"]["mlp"]["fc2"]["kernel"],
        np.ascontiguousarray(sd["blocks.1.mlp.fc2.weight"].T),
    )

    # sharded safetensors export (multiple shards at real widths) + reload
    from internvideo_tpu.core.checkpoint import flatten_params

    flat_in = flatten_params(params)
    out = tmp_path / "hf"
    save_hf_checkpoint(
        str(out), flat_in, shard_size_bytes=64 * 1024 * 1024
    )
    import os

    shards = [f for f in os.listdir(out) if f.endswith(".safetensors")]
    assert len(shards) >= 2, shards  # ~180MB of weights across >=2 shards

    flat = load_hf_checkpoint(str(out))
    assert set(flat) == set(flat_in)
    for key, val in flat_in.items():
        np.testing.assert_array_equal(flat[key], np.asarray(val))
