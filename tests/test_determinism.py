"""Golden determinism + sharding parity (DeterministicDDPTestCase analogue).

The reference asserts loss-curve similarity between runs to validate
parallelism changes (xtuner/_testing/testcase.py:77 _check_loss_curve,
sim_tol=0.01). Here:
  * same seed → bit-identical loss curves (XLA determinism)
  * fsdp-sharded training on 8 virtual devices → same loss curve as
    single-device training (GSPMD must not change the math)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec

from internvideo_tpu.core.mesh import MeshConfig, create_mesh, logical_axis_rules
from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.train.optim import OptimizerConfig, build_optimizer
from internvideo_tpu.train.state import create_sharded_state
from internvideo_tpu.train.step import classification_loss, make_train_step

TINY = InternVideo2Config(
    embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
    patch_size=14, img_size=28, num_frames=2, tubelet_size=1,
    clip_embed_dim=16, num_classes=4, attn_impl="xla",
)


def _run_curve(mesh_cfg: MeshConfig, steps=4) -> list[float]:
    model = InternVideo2(TINY)
    n_dev = (
        mesh_cfg.replica * mesh_cfg.fsdp * mesh_cfg.seq
        * mesh_cfg.tensor * mesh_cfg.expert
    )
    mesh = create_mesh(mesh_cfg, devices=jax.devices()[:n_dev])
    rules = logical_axis_rules()
    video = jax.random.normal(jax.random.key(10), (8, 2, 28, 28, 3))
    labels = jax.random.randint(jax.random.key(11), (8,), 0, 4)
    opt_cfg = OptimizerConfig(lr=1e-3, total_steps=steps, warmup_steps=0)
    abstract = jax.eval_shape(model.init, jax.random.key(0), video)
    tx, _ = build_optimizer(opt_cfg, nn.unbox(abstract["params"]))
    with mesh, nn.logical_axis_rules(list(rules)):
        state = create_sharded_state(
            model, tx, (video,), mesh, jax.random.key(0), rules=rules
        )
        step = jax.jit(make_train_step(classification_loss))
        dp = NamedSharding(mesh, PartitionSpec(("replica", "fsdp")))
        batch = {
            "video": jax.device_put(video, dp),
            "label": jax.device_put(labels, dp),
        }
        losses = []
        for _ in range(steps):
            state, m = step(state, batch, jax.random.key(1))
            losses.append(float(m["loss"]))
    return losses


def test_same_seed_identical_curves():
    c1 = _run_curve(MeshConfig(replica=1, fsdp=1, seq=1, tensor=1))
    c2 = _run_curve(MeshConfig(replica=1, fsdp=1, seq=1, tensor=1))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert c1[-1] < c1[0]  # it actually learns


def test_sharded_matches_single_device_curve():
    single = _run_curve(MeshConfig(replica=1, fsdp=1, seq=1, tensor=1))
    fsdp = _run_curve(MeshConfig(replica=1, fsdp=4, seq=1, tensor=2))
    # loss-curve similarity tolerance mirrors the reference's sim_tol
    np.testing.assert_allclose(single, fsdp, rtol=1e-2, atol=1e-4)
    dp = _run_curve(MeshConfig(replica=2, fsdp=2, seq=1, tensor=1))
    np.testing.assert_allclose(single, dp, rtol=1e-2, atol=1e-4)
