"""Fused rmsnorm kernel, grad-accum scan path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from internvideo_tpu.ops.rmsnorm import fused_add_rms_norm, rms_norm
from internvideo_tpu.train.state import TrainState
from internvideo_tpu.train.step import make_train_step


def test_fused_add_rms_norm_matches_xla():
    x = jax.random.normal(jax.random.key(0), (4, 16, 64))
    res = jax.random.normal(jax.random.key(1), (4, 16, 64))
    w = jax.random.normal(jax.random.key(2), (64,)) * 0.1 + 1.0
    y, newres = fused_add_rms_norm(x, res, w, interpret=True, block_rows=32)
    ref = rms_norm(x, w, residual=res)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(newres), np.asarray(x + res), atol=1e-6)


def test_grad_accum_matches_full_batch():
    """scan-accumulated micro-batch grads == one big batch (linear model)."""

    def loss_fn(params, apply_fn, batch, rngs):
        pred = batch["x"] @ params["w"]
        return jnp.mean(jnp.square(pred - batch["y"])), {}

    w = jnp.ones((4, 2))
    x = jax.random.normal(jax.random.key(0), (8, 4))
    y = jax.random.normal(jax.random.key(1), (8, 2))
    tx = optax.sgd(0.1)

    def make_state():
        params = {"w": w}
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), tx=tx, apply_fn=None,
        )

    full_step = make_train_step(loss_fn)
    s1, m1 = full_step(make_state(), {"x": x, "y": y}, jax.random.key(2))

    accum_step = make_train_step(loss_fn, grad_accum=4)
    micro = {
        "x": x.reshape(4, 2, 4),
        "y": y.reshape(4, 2, 2),
    }
    s2, m2 = accum_step(make_state(), micro, jax.random.key(2))
    np.testing.assert_allclose(
        np.asarray(s2.params["w"]), np.asarray(s1.params["w"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)


def test_lora_dense():
    from flax import linen as nn
    from internvideo_tpu.nn.lora import LoRADense
    from internvideo_tpu.train.optim import OptimizerConfig, build_optimizer

    model = LoRADense(8, rank=2, alpha=4.0)
    x = jax.random.normal(jax.random.key(0), (4, 16))
    params = nn.unbox(model.init(jax.random.key(1), x))
    # lora_b zero-init: output equals the base dense at init
    y = model.apply(params, x)
    base = x @ params["params"]["kernel"] + params["params"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(base), atol=1e-6)

    # freezing everything but lora_* leaves the base kernel untouched
    cfg = OptimizerConfig(lr=1e-2, total_steps=5,
                          trainable_patterns=(r"lora_",))
    tx, _ = build_optimizer(cfg, params["params"])
    st = tx.init(params["params"])
    g = jax.tree.map(jnp.ones_like, params["params"])
    up, _ = tx.update(g, st, params["params"])
    assert float(jnp.sum(jnp.abs(up["kernel"]))) == 0
    assert float(jnp.sum(jnp.abs(up["lora_a"]))) > 0


def test_merge_lora_requires_and_uses_scale():
    """merge_lora must use the true alpha/rank scale (ADVICE r1 finding #2)."""
    import pytest
    from internvideo_tpu.nn.lora import LoRADense, merge_lora

    rank, alpha = 4, 16.0
    m = LoRADense(features=8, rank=rank, alpha=alpha)
    x = jax.random.normal(jax.random.key(0), (2, 6))
    from flax import linen as nn
    params = nn.unbox(m.init(jax.random.key(1), x)["params"])
    # give lora_b nonzero values so the adapter actually contributes
    params = dict(params)
    params["lora_b"] = jax.random.normal(jax.random.key(2), params["lora_b"].shape) * 0.1
    y = m.apply({"params": params}, x)

    with pytest.raises(ValueError):
        merge_lora(params)
    merged = merge_lora(params, alpha=alpha, rank=rank)
    assert "lora_a" not in merged
    y_merged = (
        x @ merged["kernel"] + merged["bias"]
    )
    np.testing.assert_allclose(
        np.asarray(y_merged), np.asarray(y), atol=1e-5, rtol=1e-5
    )


def test_flops_estimator_and_mfu_logging():
    from internvideo_tpu.models.internvideo2 import make_config
    from internvideo_tpu.utils.flops import (
        encoder_forward_flops,
        train_step_flops,
    )
    from internvideo_tpu.utils.metrics import MetricLogger

    cfg = make_config("1B", num_frames=16, img_size=224, num_classes=0)
    fwd = encoder_forward_flops(cfg)
    # the 1B 16f@224 dense forward is ~12 TFLOP/clip (PERF.md accounting)
    assert 9e12 < fwd < 15e12, fwd
    assert train_step_flops(fwd) == 3 * fwd

    logs = []
    m = MetricLogger(log_every=1, print_fn=lambda s: logs.append(s))
    m.set_peak_flops(100e12)
    import time

    m.add_flops(5e12)
    time.sleep(0.05)  # give dt a real value so the rates are sane
    rec = m.log_step(1)
    assert "mfu" in rec and rec["mfu"] > 0
    assert rec["tflops_per_sec"] > 0
    # 5 TF over >=50 ms at 100 TF peak -> mfu <= 1.0
    assert rec["mfu"] <= 1.0, rec


def test_fused_ls_add_rms_norm_matches_composition():
    """Fused LayerScale+add+RMSNorm vs the unfused chain: near-bitwise in
    f32; bf16 differs only by excess-precision elision in the unfused
    XLA fusion (1-2 ulps fwd, ~2% rel grads)."""
    from internvideo_tpu.ops.rmsnorm import (
        _fused_ls_add_rms_norm,
        _ls_add_norm_ref,
    )

    rng = np.random.default_rng(11)
    for dt, ytol, gtol in ((jnp.float32, 1e-6, 1e-5),
                           (jnp.bfloat16, 5e-2, 2e-1)):
        shape = (2, 123, 64)
        h = jnp.asarray(rng.standard_normal(shape), dt)
        x = jnp.asarray(rng.standard_normal(shape), dt)
        g = jnp.asarray(rng.standard_normal(shape[-1]) * 0.01, jnp.float32)
        w = jnp.asarray(rng.standard_normal(shape[-1]) * 0.1 + 1, jnp.float32)
        y1, r1 = _fused_ls_add_rms_norm(h, x, g, w, 1e-6, True)
        y2, r2 = _ls_add_norm_ref(h, x, g, w, 1e-6)
        np.testing.assert_allclose(
            np.asarray(y1, np.float32), np.asarray(y2, np.float32),
            atol=ytol, rtol=ytol)
        np.testing.assert_allclose(
            np.asarray(r1, np.float32), np.asarray(r2, np.float32),
            atol=1e-6, rtol=1e-6)

        def loss(f):
            return lambda *a: jnp.sum(
                jnp.asarray(f(*a)[0], jnp.float32) ** 2)

        g1 = jax.grad(loss(lambda *a: _fused_ls_add_rms_norm(*a, 1e-6, True)),
                      argnums=(0, 1, 2, 3))(h, x, g, w)
        g2 = jax.grad(loss(lambda *a: _ls_add_norm_ref(*a, 1e-6)),
                      argnums=(0, 1, 2, 3))(h, x, g, w)
        for a, b, name in zip(g1, g2, ("h", "x", "gamma", "w")):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
            assert rel < gtol, f"{name} rel={rel} dt={dt}"
