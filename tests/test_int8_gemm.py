"""Fused dynamic-int8 GEMM (ops/int8_gemm.py) vs the unfused XLA path.

The kernel's contract: numerics identical to ops/quant.quantize_int8 +
int8 dot + rescale (per-row full-K activation scales), any leading batch
shape, ragged M tails, and the straight-through backward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internvideo_tpu.ops import int8_gemm
from internvideo_tpu.ops.quant import int8_matmul, quantize_int8


def _mk(m_shape, k, n, xdtype, seed=0):
    x = jax.random.normal(jax.random.key(seed), (*m_shape, k), xdtype)
    w = jax.random.normal(jax.random.key(seed + 1), (k, n), jnp.float32)
    w = w * 0.05
    w_q, w_s = quantize_int8(w, axis=0)
    return x, w_q, w_s


@pytest.mark.parametrize(
    "m_shape,k,n,bm,bn",
    [
        ((256,), 256, 384, 128, 128),     # divisible everywhere
        ((3, 170), 256, 384, 128, 128),   # ragged M tail + batch dims
        ((130,), 384, 200, 128, 128),     # ragged M and N tails
        ((64,), 128, 128, 128, 128),      # M smaller than the block
    ],
)
def test_fused_matches_unfused(m_shape, k, n, bm, bn):
    x, w_q, w_s = _mk(m_shape, k, n, jnp.bfloat16)
    ref = int8_matmul(x, w_q, w_s, dynamic_activations=True, fused="xla")
    got = int8_gemm.int8_matmul_fused(x, w_q, w_s, jnp.float32, bm, bn, True)
    assert got.shape == ref.shape
    # same quantize + int32 dot + f32 rescale — bit-exact up to f32 rescale
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_f32_input_and_out_dtype():
    x, w_q, w_s = _mk((192,), 256, 256, jnp.float32, seed=7)
    ref = int8_matmul(x, w_q, w_s, fused="xla", out_dtype=jnp.bfloat16)
    got = int8_gemm.int8_matmul_fused(
        x, w_q, w_s, jnp.bfloat16, 128, 128, True
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_fused_gradient_is_straight_through():
    x, w_q, w_s = _mk((2, 130), 256, 384, jnp.bfloat16, seed=3)

    def loss(x):
        y = int8_gemm.int8_matmul_fused(
            x, w_q, w_s, jnp.float32, 128, 128, True
        )
        return jnp.sum(y * y)

    g = jax.grad(loss)(x)
    y = int8_matmul(x, w_q, w_s, fused="xla")
    gs = (2 * y * w_s.reshape(1, 1, -1)).astype(jnp.bfloat16)
    dx_ref = jnp.einsum(
        "bmn,kn->bmk", gs.astype(jnp.float32),
        w_q.astype(jnp.float32),
    ).astype(x.dtype)
    np.testing.assert_allclose(
        np.asarray(g, np.float32), np.asarray(dx_ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_int8_matmul_interpret_routing():
    # fused="pallas_interpret" drives the kernel through the public entry
    x, w_q, w_s = _mk((300,), 256, 384, jnp.bfloat16, seed=5)
    ref = int8_matmul(x, w_q, w_s, fused="xla")
    got = int8_matmul(x, w_q, w_s, fused="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_eligibility_gate():
    x, w_q, _ = _mk((512,), 256, 256, jnp.bfloat16)
    assert int8_gemm.fused_eligible(x, w_q)
    x_small, w_small, _ = _mk((8,), 256, 256, jnp.bfloat16)
    assert not int8_gemm.fused_eligible(x_small, w_small)  # tiny M
    x_odd, w_odd, _ = _mk((512,), 200, 256, jnp.bfloat16)
    assert not int8_gemm.fused_eligible(x_odd, w_odd)  # K not lane-aligned


def test_pick_blocks_measured_policy():
    m = 16 * 4097
    # the three dense-encoder shapes all take full-N blocks at bm=512
    assert int8_gemm.pick_blocks(m, 1408, 4224) == (512, 4224)
    assert int8_gemm.pick_blocks(m, 1408, 5632) == (512, 5632)
    assert int8_gemm.pick_blocks(m, 5632, 1408) == (512, 1408)
    # a shape whose full-N blocks can't fit falls back to blocked-N only
    # at large K (where it still beats the unfused quant pass)
    assert int8_gemm.pick_blocks(m, 5632, 65536) == (512, 512)
    assert int8_gemm.pick_blocks(m, 1408, 65536) is None


def test_fused_full_n_block_matches_unfused():
    # the production config: bn == N (single n-step per m block)
    x, w_q, w_s = _mk((2, 170), 256, 384, jnp.bfloat16, seed=11)
    ref = int8_matmul(x, w_q, w_s, fused="xla")
    got = int8_gemm.int8_matmul_fused(x, w_q, w_s, jnp.float32, 128, 384,
                                      True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
