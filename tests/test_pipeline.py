"""GPipe-style pipeline parallelism (parallel/pp.py) vs sequential.

PP is a TPU-native bonus the reference lacks (SURVEY §2f). These tests
prove the schedule on a real 4-rank mesh axis: forward equals applying
the stages sequentially on one device, and reverse-mode AD through the
scan + ppermute produces the correct stage-sharded gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from internvideo_tpu.parallel.pp import pipeline_apply

S, D = 4, 8


def _stage_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < S:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.asarray(jax.devices()[:S]), ("pipe",))
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.standard_normal((S, D, D)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((S, D)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((8, D)), jnp.float32)
    return mesh, params, x


def _sequential(params, x):
    for s in range(S):
        x = _stage_fn(jax.tree.map(lambda p: p[s], params), x)
    return x


@pytest.mark.parametrize("m", [1, 2, 8])
def test_pipeline_forward_matches_sequential(setup, m):
    mesh, params, x = setup
    want = _sequential(params, x)
    got = jax.jit(
        lambda p, xx: pipeline_apply(
            _stage_fn, p, xx, mesh=mesh, axis="pipe", num_microbatches=m
        )
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pipeline_backward_matches_sequential(setup):
    mesh, params, x = setup

    def loss_pp(p):
        out = pipeline_apply(
            _stage_fn, p, x, mesh=mesh, axis="pipe", num_microbatches=4
        )
        return jnp.sum(out ** 2)

    def loss_seq(p):
        return jnp.sum(_sequential(p, x) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_seq = jax.grad(loss_seq)(params)
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(g_pp[k]), np.asarray(g_seq[k]), atol=1e-5, rtol=1e-4,
            err_msg=k,
        )


def test_pipeline_remat_stage(setup):
    """jax.checkpoint composes (the GPipe memory knob)."""
    mesh, params, x = setup
    ck = jax.checkpoint(_stage_fn)
    g = jax.jit(jax.grad(lambda p: jnp.sum(pipeline_apply(
        ck, p, x, mesh=mesh, axis="pipe", num_microbatches=2
    ) ** 2)))(params)
    g_ref = jax.grad(lambda p: jnp.sum(_sequential(p, x) ** 2))(params)
    np.testing.assert_allclose(
        np.asarray(g["w"]), np.asarray(g_ref["w"]), atol=1e-5, rtol=1e-4
    )


def test_pipeline_rejects_bad_microbatching(setup):
    mesh, params, x = setup
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(
            _stage_fn, params, x, mesh=mesh, axis="pipe", num_microbatches=3
        )
