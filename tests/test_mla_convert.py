"""Dense GQA/MQA → M²LA conversion: full-rank MQA conversion is exact; GQA
low-rank conversion stays a close approximation."""

import jax
import jax.numpy as jnp
import numpy as np

from internvideo_tpu.models.mla_convert import dense_gqa_to_mla, mla_rank_for_exact
from internvideo_tpu.nn.mla import MLAConfig, MLAttention
from internvideo_tpu.nn.rope import apply_rope, rope_cos_sin


def _dense_reference(x, cos, sin, w_q, b_q, w_k, b_k, w_v, b_v, w_o, nope):
    """Dense MQA attention with the MLA conventions: per-head [nope|rope]
    split, rope applied to the rope branch, scale = q_head_dim^-0.5."""
    d, hq, hd = w_q.shape
    b, s, _ = x.shape
    q = np.einsum("bsd,dhe->bshe", x, w_q) + b_q
    k = np.einsum("bsd,dhe->bshe", x, w_k) + b_k  # (B,S,1,hd)
    v = np.einsum("bsd,dhe->bshe", x, w_v) + b_v
    q_pe = np.asarray(apply_rope(jnp.asarray(q[..., nope:]), cos, sin))
    k_pe = np.asarray(apply_rope(jnp.asarray(k[..., nope:]), cos, sin))
    q = np.concatenate([q[..., :nope], q_pe], -1)
    k = np.concatenate([k[..., :nope], k_pe], -1)
    k = np.broadcast_to(k, q.shape)
    vdim = w_v.shape[-1]
    v = np.broadcast_to(v, (b, s, hq, vdim))
    scores = np.einsum("bqhe,bkhe->bhqk", q, k) / np.sqrt(hd)
    mask = np.tril(np.ones((s, s), bool))
    scores = np.where(mask, scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ctx = np.einsum("bhqk,bkhe->bqhe", p, v).reshape(b, s, hq * vdim)
    return ctx @ w_o


def test_mqa_full_rank_conversion_exact():
    rng = np.random.default_rng(0)
    d, hq, nope, rope, vdim, s = 24, 4, 8, 8, 8, 6
    hd = nope + rope
    cfg = MLAConfig(
        hidden_size=d, num_heads=hq, qk_nope_head_dim=nope,
        qk_rope_head_dim=rope, v_head_dim=vdim,
        kv_lora_rank=mla_rank_for_exact(
            MLAConfig(qk_nope_head_dim=nope, v_head_dim=vdim), d, hq
        ),
    )
    w_q = rng.standard_normal((d, hq, hd)).astype(np.float32) * 0.2
    b_q = rng.standard_normal((hq, hd)).astype(np.float32) * 0.1
    w_k = rng.standard_normal((d, 1, hd)).astype(np.float32) * 0.2
    b_k = rng.standard_normal((1, hd)).astype(np.float32) * 0.1
    w_v = rng.standard_normal((d, 1, vdim)).astype(np.float32) * 0.2
    b_v = rng.standard_normal((1, vdim)).astype(np.float32) * 0.1
    w_o = rng.standard_normal((hq * vdim, d)).astype(np.float32) * 0.2

    params = dense_gqa_to_mla(
        w_q, w_k, w_v, w_o, cfg, b_q=b_q, b_k=b_k, b_v=b_v
    )
    model = MLAttention(cfg, attn_impl="xla")
    x = rng.standard_normal((2, s, d)).astype(np.float32)
    cos, sin = rope_cos_sin(jnp.arange(s)[None], rope)
    cos = jnp.broadcast_to(cos, (2, s, rope))
    sin = jnp.broadcast_to(sin, (2, s, rope))
    out = model.apply(params, jnp.asarray(x), cos, sin)

    ref = _dense_reference(
        x, cos, sin, w_q, b_q, w_k, b_k, w_v, b_v, w_o, nope
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_gqa_low_rank_conversion_approximates():
    rng = np.random.default_rng(1)
    d, hq, hkv, nope, rope, vdim = 32, 8, 2, 8, 8, 8
    hd = nope + rope
    full = min(d, hq * (nope + vdim))
    w_k = rng.standard_normal((d, hkv, hd)).astype(np.float32) * 0.2
    w_v = rng.standard_normal((d, hkv, vdim)).astype(np.float32) * 0.2
    w_q = rng.standard_normal((d, hq, hd)).astype(np.float32) * 0.2
    w_o = rng.standard_normal((hq * vdim, d)).astype(np.float32) * 0.2

    def convert(r):
        cfg = MLAConfig(
            hidden_size=d, num_heads=hq, qk_nope_head_dim=nope,
            qk_rope_head_dim=rope, v_head_dim=vdim, kv_lora_rank=r,
            qkv_bias=False,
        )
        p = dense_gqa_to_mla(w_q, w_k, w_v, w_o, cfg)
        kv_a = p["params"]["kv_a_proj_with_mqa"]["kernel"][:, :r]
        kv_b = p["params"]["kv_b_proj_kernel"].reshape(r, -1)
        k_nope = np.repeat(w_k[..., :nope], hq // hkv, 1)
        v_exp = np.repeat(w_v, hq // hkv, 1)
        target = np.concatenate([k_nope, v_exp], -1).reshape(d, -1)
        err = np.linalg.norm(kv_a @ kv_b - target) / np.linalg.norm(target)
        return err

    # reconstruction error shrinks with rank and vanishes at full rank
    errs = [convert(r) for r in (8, 16, full)]
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-5
