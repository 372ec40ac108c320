"""Checkpointing: orbax save/restore round trip + safetensors bridge."""

import os

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from internvideo_tpu.core.checkpoint import (
    CheckpointManager,
    flatten_params,
    load_hf_checkpoint,
    read_safetensors,
    save_hf_checkpoint,
    unflatten_params,
    write_safetensors,
)


def test_safetensors_roundtrip(tmp_path):
    tensors = {
        "a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b.bias": np.ones(5, dtype=ml_dtypes.bfloat16),
        "c": np.array([1, 2, 3], dtype=np.int32),
    }
    p = str(tmp_path / "x.safetensors")
    write_safetensors(p, tensors)
    back = read_safetensors(p)
    for k in tensors:
        np.testing.assert_array_equal(
            np.asarray(back[k], np.float32), np.asarray(tensors[k], np.float32)
        )
        assert back[k].dtype == tensors[k].dtype


def test_hf_checkpoint_sharding(tmp_path):
    d = str(tmp_path / "ckpt")
    tensors = {
        f"layer{i}.w": np.random.rand(64, 64).astype(np.float32)
        for i in range(6)
    }
    save_hf_checkpoint(d, tensors, shard_size_bytes=40_000)
    assert os.path.exists(os.path.join(d, "model.safetensors.index.json"))
    back = load_hf_checkpoint(d)
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])


def test_flatten_unflatten():
    tree = {"a": {"b": np.zeros(2), "c": {"d": np.ones(3)}}}
    flat = flatten_params(tree)
    assert set(flat) == {"a.b", "a.c.d"}
    back = unflatten_params(flat)
    np.testing.assert_array_equal(back["a"]["c"]["d"], np.ones(3))


def test_orbax_roundtrip(tmp_path):
    state = {
        "step": jnp.asarray(7),
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
    }
    mngr = CheckpointManager(str(tmp_path / "orbax"), async_save=False)
    assert mngr.save(7, state)
    mngr.wait()
    assert mngr.latest_step() == 7
    like = jax.tree.map(lambda x: jnp.zeros_like(x), state)
    restored = mngr.restore(like)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert int(restored["step"]) == 7
    mngr.close()
