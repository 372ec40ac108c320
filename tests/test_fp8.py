"""float8 path (X8): quantization modes, matmul accuracy, training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from internvideo_tpu.ops.fp8 import (
    Fp8Dense,
    fp8_matmul,
    quantize_fp8,
)


def test_quantize_modes():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    q, s = quantize_fp8(x)
    deq = q.astype(jnp.float32) * s
    # e4m3 keeps 3 mantissa bits: worst-case step near amax is amax/16
    amax = float(jnp.max(jnp.abs(x)))
    assert float(jnp.max(jnp.abs(deq - x))) < amax / 14
    assert float(jnp.mean(jnp.abs(deq - x))) < 0.02
    q, s = quantize_fp8(x, axis=1)
    assert s.shape == (1, 256)
    q, s = quantize_fp8(x, axis=1, tile=128)
    assert s.shape[1] == 2  # two tiles of 128


def test_tilewise_beats_tensorwise_on_outliers():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 64)).astype(np.float32)
    # e4m3 is floating point (~2^17 dynamic range): the tensor-wise scale
    # only hurts when outliers push the rest toward denormal/underflow
    w[:128] *= 1e5

    def err(axis, tile):
        q, s = quantize_fp8(jnp.asarray(w), axis=axis, tile=tile)
        if tile:
            deq = (
                q.reshape(2, 128, 64).astype(jnp.float32) * s
            ).reshape(256, 64)
        elif axis is not None:
            deq = q.astype(jnp.float32) * s
        else:
            deq = q.astype(jnp.float32) * s
        # relative error on the small-magnitude block
        d = np.asarray(deq)[128:] - w[128:]
        return float(np.linalg.norm(d) / np.linalg.norm(w[128:]))

    e_tensor = err(None, None)
    e_tile = err(0, 128)
    assert e_tile < e_tensor * 0.1, (e_tensor, e_tile)


def test_fp8_matmul_accuracy():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)) * 0.1, jnp.float32)
    wq, ws = quantize_fp8(w, axis=1)
    out = fp8_matmul(x, wq, ws)
    ref = x @ w
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.06, rel


def test_fp8_dense_trains():
    model = Fp8Dense(8)
    x = jax.random.normal(jax.random.key(0), (16, 32))
    params = model.init(jax.random.key(1), x)
    y = jax.random.normal(jax.random.key(2), (16, 8))

    def loss(p):
        return jnp.mean(jnp.square(model.apply(p, x) - y))

    tx = optax.adam(1e-2)
    st = tx.init(params)
    l0 = float(loss(params))
    step = jax.jit(
        lambda p, s: (lambda g: (optax.apply_updates(p, (
            tx.update(g, s, p)[0]
        )), tx.update(g, s, p)[1]))(jax.grad(loss)(p))
    )
    for _ in range(30):
        params, st = step(params, st)
    assert float(loss(params)) < l0 * 0.5
