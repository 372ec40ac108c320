"""Dense GQA/MQA attention → M²LA latent attention weight conversion.

Counterpart of the reference's M²LA conversion target
(InternVideo3_sft/xtuner/v1/model/compose/qwen3_vl_mla/, the MLA-converted
Qwen3-VL — the reference ships the converted architecture but not the
converter). The transform:

  * per-head split: the last `qk_rope_head_dim` dims of each dense K/Q head
    are the rotary branch, the first `qk_nope_head_dim` the content branch
  * the per-q-head K-nope and V up-projections (GQA groups expanded) are
    jointly factorized with a truncated SVD:
        W_kv (D, H·(nope+v)) ≈ kv_a_nope (D, R) @ kv_b (R, H·(nope+v))
    giving the latent down-projection and the shared up-projection — exact
    when R ≥ rank(W_kv), a least-squares compression otherwise
  * the shared rotary key is the mean of the per-KV-head rotary branches
    (exact for MQA, Hkv == 1)
  * K/V biases become a constant latent offset solved by least squares
    against kv_b (exact at full rank)

With Hkv == 1 and R = min(D, H·(nope+v)) the converted MLAttention
reproduces the dense attention bit-for-bit (up to fp error) — pinned by
tests/test_mla_convert.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from internvideo_tpu.nn.mla import MLAConfig


def dense_gqa_to_mla(
    w_q: np.ndarray,  # (D, Hq, hd) per-head layout [nope | rope]
    w_k: np.ndarray,  # (D, Hkv, hd)
    w_v: np.ndarray,  # (D, Hkv, v)
    w_o: np.ndarray,  # (Hq * v, D)
    cfg: MLAConfig,
    *,
    b_q: Optional[np.ndarray] = None,  # (Hq, hd)
    b_k: Optional[np.ndarray] = None,  # (Hkv, hd)
    b_v: Optional[np.ndarray] = None,  # (Hkv, v)
    b_o: Optional[np.ndarray] = None,  # (D,)
    rank: Optional[int] = None,
) -> dict:
    """Returns a params dict for `MLAttention` (flax tree under "params")."""
    d, hq, hd = w_q.shape
    _, hkv, _ = w_k.shape
    nope, rope = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    vdim = cfg.v_head_dim
    if nope + rope != hd:
        raise ValueError(
            f"qk_nope({nope}) + qk_rope({rope}) must equal the dense head "
            f"dim ({hd})"
        )
    if vdim != w_v.shape[-1]:
        raise ValueError("v_head_dim mismatch")
    if hq % hkv:
        raise ValueError("Hq must be a multiple of Hkv")
    group = hq // hkv
    r = rank or cfg.kv_lora_rank

    # expand GQA groups to per-q-head K-nope / V up-projections
    k_nope = np.repeat(w_k[..., :nope], group, axis=1)  # (D, Hq, nope)
    v_exp = np.repeat(w_v, group, axis=1)  # (D, Hq, v)
    w_kv = np.concatenate([k_nope, v_exp], axis=-1).reshape(
        d, hq * (nope + vdim)
    )
    u, s, vt = np.linalg.svd(w_kv, full_matrices=False)
    r_eff = min(r, s.shape[0])
    kv_a_nope = u[:, :r_eff] * s[:r_eff]  # (D, r_eff)
    kv_b_flat = vt[:r_eff]  # (r_eff, Hq*(nope+v))
    if r_eff < r:  # pad latent channels up to the configured rank
        kv_a_nope = np.pad(kv_a_nope, ((0, 0), (0, r - r_eff)))
        kv_b_flat = np.pad(kv_b_flat, ((0, r - r_eff), (0, 0)))
    kv_b = kv_b_flat.reshape(r, hq, nope + vdim)

    # shared rotary key: mean over KV heads (exact for MQA)
    w_kpe = w_k[..., nope:].mean(axis=1)  # (D, rope)
    kv_a_kernel = np.concatenate([kv_a_nope, w_kpe], axis=1)  # (D, r+rope)

    kv_a_bias = None
    if b_k is not None or b_v is not None:
        bk = b_k if b_k is not None else np.zeros((hkv, hd), w_k.dtype)
        bv = b_v if b_v is not None else np.zeros((hkv, vdim), w_v.dtype)
        t = np.concatenate(
            [np.repeat(bk[:, :nope], group, 0), np.repeat(bv, group, 0)],
            axis=-1,
        ).reshape(-1)  # (Hq*(nope+v),)
        # constant latent offset c with c @ kv_b ≈ t
        c = np.linalg.lstsq(
            kv_b.reshape(r, -1).T, t, rcond=None
        )[0]
        kv_a_bias = np.concatenate([c, bk[:, nope:].mean(axis=0)])

    q = {"kernel": np.ascontiguousarray(w_q.reshape(d, hq * hd))}
    if b_q is not None:
        q["bias"] = np.ascontiguousarray(b_q.reshape(-1))
    kv_a = {"kernel": np.ascontiguousarray(kv_a_kernel)}
    if kv_a_bias is not None:
        kv_a["bias"] = np.ascontiguousarray(kv_a_bias)
    o = {"kernel": np.ascontiguousarray(w_o)}
    if b_o is not None:
        o["bias"] = b_o
    return {
        "params": {
            "q_proj": q,
            "kv_a_proj_with_mqa": kv_a,
            "kv_b_proj_kernel": np.ascontiguousarray(kv_b),
            "o_proj": o,
        }
    }


def mla_rank_for_exact(cfg: MLAConfig, hidden_size: int, num_heads: int) -> int:
    """Smallest latent rank at which the SVD factorization is lossless."""
    return min(
        hidden_size, num_heads * (cfg.qk_nope_head_dim + cfg.v_head_dim)
    )
