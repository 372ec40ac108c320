"""Stage-2 criterion parity: our VTC / get_sim / UTA math vs the reference
criterions.py module itself (multi_modality/models/criterions.py), loaded
with its cross-package imports stubbed."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference_module_nested  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from internvideo_tpu.train.engines.clip import (  # noqa: E402
    _align_loss,
    get_sim,
    vtc_loss,
)

PARENT_STUBS = {
    "utils.distributed": (
        "def get_rank():\n    return 0\n"
        "def get_world_size():\n    return 1\n"
    ),
    "utils.easydict": (
        "class EasyDict(dict):\n"
        "    def __getattr__(self, k):\n"
        "        try:\n"
        "            return self[k]\n"
        "        except KeyError as e:\n"
        "            raise AttributeError(k) from e\n"
        "    def __setattr__(self, k, v):\n"
        "        self[k] = v\n"
    ),
}


@pytest.fixture(scope="module")
def ref():
    return load_reference_module_nested(
        "InternVideo2/multi_modality/models/criterions.py",
        extra_siblings=("utils.py",),
        parent_stub_sources=PARENT_STUBS,
    )


def test_get_sim_parity(ref):
    rng = np.random.RandomState(0)
    v3 = rng.randn(4, 3, 8).astype(np.float32)  # (B, T, C) frame features
    t = rng.randn(4, 8).astype(np.float32)
    for agg in ("mean", "max"):
        r_v2t, r_t2v = ref.get_sim(
            torch.from_numpy(v3), torch.from_numpy(t), temp=0.07,
            agg_method=agg,
        )
        o_v2t, o_t2v = get_sim(jnp.asarray(v3), jnp.asarray(t), 0.07, agg)
        np.testing.assert_allclose(
            np.asarray(o_v2t), r_v2t.numpy(), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(o_t2v), r_t2v.numpy(), atol=1e-5, rtol=1e-5
        )
    # 2-D vision path
    v2 = rng.randn(4, 8).astype(np.float32)
    r_v2t, _ = ref.get_sim(torch.from_numpy(v2), torch.from_numpy(t), 0.07)
    o_v2t, _ = get_sim(jnp.asarray(v2), jnp.asarray(t), 0.07)
    np.testing.assert_allclose(
        np.asarray(o_v2t), r_v2t.numpy(), atol=1e-5, rtol=1e-5
    )


def test_vtc_loss_parity(ref):
    rng = np.random.RandomState(1)
    v = rng.randn(6, 2, 8).astype(np.float32)
    t = rng.randn(6, 8).astype(np.float32)
    idx = np.asarray([0, 1, 2, 2, 3, 4])  # duplicated positives

    crit = ref.VTC_VTM_Loss(vtm_hard_neg=True)
    r = crit.vtc_loss(
        torch.from_numpy(v), torch.from_numpy(t),
        torch.from_numpy(idx), temp=0.07, all_gather=False,
    )
    o = vtc_loss(jnp.asarray(v), jnp.asarray(t), jnp.asarray(idx), 0.07)
    np.testing.assert_allclose(float(o), float(r), atol=1e-5, rtol=1e-5)

    # idx=None → identity targets
    r = crit.vtc_loss(
        torch.from_numpy(v), torch.from_numpy(t), None, temp=0.07,
        all_gather=False,
    )
    o = vtc_loss(jnp.asarray(v), jnp.asarray(t), None, 0.07)
    np.testing.assert_allclose(float(o), float(r), atol=1e-5, rtol=1e-5)


def test_uta_loss_parity(ref):
    rng = np.random.RandomState(2)
    k, b, n, c = 2, 3, 5, 8
    stu = rng.randn(k, b, n, c).astype(np.float32)
    stu /= np.linalg.norm(stu, axis=-1, keepdims=True)
    tgt = rng.randn(k, b, n, c).astype(np.float32)
    tgt /= np.linalg.norm(tgt, axis=-1, keepdims=True)
    stu_f = rng.randn(b, c).astype(np.float32)
    stu_f /= np.linalg.norm(stu_f, axis=-1, keepdims=True)
    tgt_f = rng.randn(b, c).astype(np.float32)
    tgt_f /= np.linalg.norm(tgt_f, axis=-1, keepdims=True)

    crit = ref.new_UTA_Loss(
        distill_final_features=True, clip_loss_ratio=[1.0, 0.5]
    )
    r = crit.uta_loss(
        torch.from_numpy(stu), torch.from_numpy(stu_f),
        torch.from_numpy(tgt), torch.from_numpy(tgt_f),
    )
    o = (
        1.0 * _align_loss(jnp.asarray(stu), jnp.asarray(tgt))
        + 0.5 * _align_loss(jnp.asarray(stu_f), jnp.asarray(tgt_f))
    )
    np.testing.assert_allclose(float(o), float(r), atol=1e-5, rtol=1e-5)
