"""Global-batch contrastive under GSPMD: dp-sharded == single-device.

The reference implements global-batch VTC with an explicit NCCL
allgather-with-grad (multi_modality/models/criterions.py `get_sim` over
gathered features + GatherLayer). TPU-native, the same global similarity
matrix falls out of GSPMD: the jitted step sees the full batch sharded
over the data axis and XLA inserts the gathers. This test proves the
semantics: losses and the updated params of a stage-2 step over an
8-way-sharded batch match the unsharded step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from internvideo_tpu.core.mesh import (
    MeshConfig,
    create_mesh,
    logical_axis_rules,
)
from internvideo_tpu.models.bert import BertConfig
from internvideo_tpu.models.internvideo2 import InternVideo2Config
from internvideo_tpu.models.videoclip import VideoCLIP, VideoCLIPConfig
from internvideo_tpu.train.engines.clip import (
    CLIPLossConfig,
    make_clip_train_step,
)
from internvideo_tpu.train.state import TrainState

BERT_TINY = BertConfig(
    vocab_size=128, hidden_size=32, num_layers=4, num_heads=2,
    intermediate_size=64, fusion_layer=2, dropout=0.0, attn_impl="xla",
)
VIS_TINY = InternVideo2Config(
    embed_dim=48, depth=2, num_heads=2, mlp_ratio=4.0,
    patch_size=14, img_size=56, num_frames=2, tubelet_size=1,
    clip_embed_dim=32, num_classes=0, attn_impl="xla",
)


def _setup():
    model = VideoCLIP(VideoCLIPConfig(
        vision=VIS_TINY, text=BERT_TINY, embed_dim=16,
    ))
    b = 8
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(
            rng.standard_normal((b, 2, 56, 56, 3)), jnp.float32
        ),
        "input_ids": jnp.asarray(rng.integers(4, 120, (b, 10)), jnp.int32),
        "attention_mask": jnp.ones((b, 10), jnp.int32),
        "idx": jnp.arange(b),
    }
    params = model.init(
        jax.random.key(2), batch["video"], batch["input_ids"],
        batch["attention_mask"], init_all_branches=True,
    )["params"]
    # SGD, not adam: a first adam step is ±lr·sign(grad), so fp32
    # reduction-order noise on near-zero grads flips update signs and
    # masks the real comparison. SGD keeps param deltas ∝ grads.
    tx = optax.sgd(1e-2)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )
    step = make_clip_train_step(
        model, CLIPLossConfig(vocab_size=128, mlm_probability=0.3)
    )
    return step, state, batch


def test_dp_sharded_contrastive_matches_single_device():
    step, state, batch = _setup()
    key = jax.random.key(3)

    state_ref, metrics_ref = jax.jit(step)(state, batch, key)

    mesh = create_mesh(
        MeshConfig(replica=1, fsdp=-1, seq=1, tensor=1, expert=1),
        devices=jax.devices()[:8],
    )
    shardings = {
        k: NamedSharding(mesh, P(("replica", "fsdp")))
        for k in batch
    }
    sharded_batch = {
        k: jax.device_put(v, shardings[k]) for k, v in batch.items()
    }
    with mesh, nn.logical_axis_rules(list(logical_axis_rules())):
        state_sh, metrics_sh = jax.jit(
            step, in_shardings=(None, shardings, None)
        )(state, sharded_batch, key)
        jax.block_until_ready(metrics_sh)

    for k in ("loss", "loss_vtc", "loss_vtm", "loss_mlm"):
        np.testing.assert_allclose(
            float(metrics_sh[k]), float(metrics_ref[k]), rtol=2e-5,
            err_msg=k,
        )
    # updated parameters agree: the global-batch gradient (incl. the
    # cross-shard similarity terms) survived the sharding
    flat_ref = jax.tree_util.tree_leaves(state_ref.params)
    flat_sh = jax.tree_util.tree_leaves(state_sh.params)
    for a, b_ in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=1e-6, rtol=1e-4
        )
