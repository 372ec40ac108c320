"""Torch-numerics parity: nn/mla.MLAttention vs the reference xtuner MLA.

Targets (VERDICT r2 item 3):
  * train forward vs mla_raw.py forward_training (DeepSeek-style MLA with
    kv_a_layernorm, InternVideo3_sft/xtuner/v1/module/attention/
    mla_raw.py:277-346) — packed varlen causal, q-LoRA and full-q variants
  * the M²LA variant (mla.py:281-350, no kv-norm). mla.py:303 references
    `self.compressed_kv`, an attribute the method never sets (a reference
    bug — the working training path is mla_raw); the test pre-sets that
    attribute to the value the surrounding code computes so the intended
    math runs unmodified.
  * absorbed-decode equivalence: our decode (cache of latents, kv_b
    absorbed into q/out — mla.py:453-560) reproduces the torch-verified
    train forward token-by-token.

The rope convention check matters: the reference permutes rope dims from
interleaved pairs to half-split inside mla_apply_rotary_pos_emb
(mla.py:136-168 view/transpose trick). Our kernels are half-split native,
so the weight bridge must permute the rope rows of q/kv projections
(convert._mla_rope_input_permutation).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference_module_nested  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from internvideo_tpu.models.convert import (  # noqa: E402
    convert_xtuner_mla_attention,
    torch_state_dict_to_numpy,
)
from internvideo_tpu.nn.mla import MLAConfig, MLAttention  # noqa: E402
from internvideo_tpu.nn.rope import rope_cos_sin  # noqa: E402

HIDDEN, HEADS = 48, 4
KV_RANK, ROPE_D, NOPE_D, V_D = 32, 16, 32, 32


def _varlen_flash_stub():
    """flash_attn_varlen_func over packed segments (fp32 torch)."""

    def fn(q, k, v, cu_seqlens_q, cu_seqlens_k, max_seqlen_q=None,
           max_seqlen_k=None, dropout_p=0.0, softmax_scale=None,
           causal=True, window_size=(-1, -1), deterministic=False):
        out = torch.empty_like(q)
        for i in range(len(cu_seqlens_q) - 1):
            s, e = int(cu_seqlens_q[i]), int(cu_seqlens_q[i + 1])
            qs, ks, vs = q[s:e].float(), k[s:e].float(), v[s:e].float()
            logits = torch.einsum("qhd,khd->hqk", qs, ks) * softmax_scale
            if causal:
                n = e - s
                mask = torch.ones(n, n, dtype=torch.bool).tril()
                logits = logits.masked_fill(~mask, float("-inf"))
            p = logits.softmax(-1)
            out[s:e] = torch.einsum("hqk,khd->qhd", p, vs).to(q.dtype)
        return out

    return fn


@pytest.fixture(scope="module")
def ref_mods():
    """Load mla_raw.py and mla.py with their xtuner deps stubbed."""
    import sys
    import types

    def smod(name, **attrs):
        # update attrs even when another parity fixture already stubbed
        # this dotted name (the fixtures share the xtuner.* namespace and
        # run in whatever order the suite schedules them)
        m = sys.modules.setdefault(name, types.ModuleType(name))
        for k, v in attrs.items():
            setattr(m, k, v)
        return m

    class _Param:  # cyclopts.Parameter used inside Annotated[...]
        def __init__(self, *a, **k):
            pass

    smod("cyclopts", Parameter=_Param)
    smod("xtuner")
    smod("xtuner.v1")
    smod("xtuner.v1.config", GenerateConfig=object)
    smod("xtuner.v1.data_proto", SequenceContext=object)
    smod("xtuner.v1.float8")
    smod("xtuner.v1.float8.config", Float8Config=object)
    smod("xtuner.v1.module")
    smod("xtuner.v1.module.rope", RopeScalingConfig=object)
    ops = smod("xtuner.v1.ops", flash_attn_varlen_func=_varlen_flash_stub())
    ops.__path__ = []
    smod("xtuner.v1.ops.comm").__path__ = []
    smod(
        "xtuner.v1.ops.comm.all_to_all",
        ulysses_all_to_all=lambda *a, **k: None,
    )
    import logging
    smod(
        "xtuner.v1.utils",
        XTUNER_DETERMINISTIC=False,
        get_logger=lambda *a, **k: logging.getLogger("ref_mla"),
    )

    # ..linear / ..rms_norm relative imports: stub with the reference
    # semantics (linear/linear.py:36 plain nn.Linear when no float8;
    # ops/rms_norm fp32-variance math, gpu.py:164 rms_norm_ref)
    linear_src = (
        "from torch import nn\n"
        "def build_linear(i, o, bias=True, device=None, dtype=None,"
        " float8_cfg=None):\n"
        "    return nn.Linear(i, o, bias=bias)\n"
    )
    rms_src = (
        "import torch\nfrom torch import nn\n"
        "class RMSNorm(nn.Module):\n"
        "    def __init__(self, hidden_size, eps=1e-6):\n"
        "        super().__init__()\n"
        "        self.weight = nn.Parameter(torch.ones(hidden_size))\n"
        "        self.variance_epsilon = eps\n"
        "    def forward(self, x):\n"
        "        xf = x.float()\n"
        "        var = xf.pow(2).mean(-1, keepdim=True)\n"
        "        xf = xf * torch.rsqrt(var + self.variance_epsilon)\n"
        "        return (self.weight * xf).to(x.dtype)\n"
    )
    raw = load_reference_module_nested(
        "InternVideo3/InternVideo3_sft/xtuner/v1/module/attention/mla_raw.py",
        extra_siblings=("attn_outputs.py",),
        parent_stub_sources={"linear": linear_src, "rms_norm": rms_src},
    )
    m2 = load_reference_module_nested(
        "InternVideo3/InternVideo3_sft/xtuner/v1/module/attention/mla.py",
        extra_siblings=("attn_outputs.py",),
        parent_stub_sources={"linear": linear_src, "rms_norm": rms_src},
    )
    return raw, m2


class _SeqCtx:
    def __init__(self, lens):
        cu = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        self.cu_seq_lens_q = torch.from_numpy(cu)
        self.cu_seq_lens_k = torch.from_numpy(cu)
        self.max_length_q = int(max(lens))
        self.max_length_k = int(max(lens))


def _build_pair(ref_cls, *, q_lora_rank, kv_norm, seed=0, q_bias=False,
                nope_d=NOPE_D, rope_d=ROPE_D):
    torch.manual_seed(seed)
    ref = ref_cls(
        head_dim=nope_d, hidden_size=HIDDEN, num_attention_heads=HEADS,
        kv_lora_rank=KV_RANK, qk_rope_head_dim=rope_d,
        qk_nope_head_dim=nope_d, v_head_dim=V_D, q_lora_rank=q_lora_rank,
        qkv_bias=True,
    ).eval()
    cfg = MLAConfig(
        hidden_size=HIDDEN, num_heads=HEADS, kv_lora_rank=KV_RANK,
        q_lora_rank=q_lora_rank, qk_rope_head_dim=rope_d,
        qk_nope_head_dim=nope_d, v_head_dim=V_D, qkv_bias=True,
        kv_norm=kv_norm, q_bias=q_bias,
    )
    ours = MLAttention(cfg, attn_impl="xla")
    params = convert_xtuner_mla_attention(
        torch_state_dict_to_numpy(ref.state_dict()), cfg
    )
    return ref, ours, params


def _ref_cos_sin(lens):
    pos = np.concatenate([np.arange(n) for n in lens])
    cos, sin = rope_cos_sin(jnp.asarray(pos)[None], ROPE_D)
    return np.asarray(cos), np.asarray(sin)  # (1, S, ROPE_D)


def _run_ref_training(ref, x, lens):
    cos, sin = _ref_cos_sin(lens)
    with torch.no_grad():
        return ref.forward_training(
            torch.from_numpy(x),
            (torch.from_numpy(cos), torch.from_numpy(sin)),
            _SeqCtx(lens),
        ).numpy()


def _run_ours(ours, params, x, lens):
    cos, sin = _ref_cos_sin(lens)
    seg = jnp.asarray(
        np.concatenate([[i + 1] * n for i, n in enumerate(lens)])
    )[None]
    out = ours.apply(
        params, jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin),
        q_segment_ids=seg, kv_segment_ids=seg, causal=True,
    )
    return np.asarray(out)


@pytest.mark.parametrize("q_lora", [None, 24])
def test_mla_raw_training_parity(ref_mods, q_lora):
    raw, _ = ref_mods
    ref, ours, params = _build_pair(
        raw.MultiLatentAttention, q_lora_rank=q_lora, kv_norm=True
    )
    lens = [7, 5]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, sum(lens), HIDDEN)).astype(np.float32) * 0.5
    r = _run_ref_training(ref, x, lens)
    o = _run_ours(ours, params, x, lens)
    np.testing.assert_allclose(o, r, atol=2e-5)


def test_m2la_training_parity(ref_mods):
    """The no-kv-norm M²LA variant (mla.py), compressed_kv bug worked
    around by pre-setting the attribute to the value mla.py:300 computes."""
    _, m2 = ref_mods
    # mla.py:257 sizes kv_b_proj as H*(qk_ROPE+v) where the forward's split
    # (:308) needs H*(qk_NOPE+v) — consistent only when nope == rope, which
    # holds for the production M²LA configs; mirror that here.
    ref, ours, params = _build_pair(
        m2.MultiLatentAttention, q_lora_rank=None, kv_norm=False, seed=1,
        q_bias=True, nope_d=16, rope_d=16,
    )
    lens = [6, 6]
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, sum(lens), HIDDEN)).astype(np.float32) * 0.5
    with torch.no_grad():
        ckv = ref.kv_a_proj_with_mqa(torch.from_numpy(x))
        ref.compressed_kv = ckv[..., :KV_RANK]  # what mla.py:300 intends
    r = _run_ref_training(ref, x, lens)
    o = _run_ours(ours, params, x, lens)
    np.testing.assert_allclose(o, r, atol=2e-5)


def test_absorbed_decode_matches_torch_training(ref_mods):
    """Decode path: prefill 0 tokens then decode one-by-one must equal the
    torch-verified train forward's last-token outputs (absorbed-weight
    equivalence, mla.py:453-560 vs mla_raw decompressed math)."""
    raw, _ = ref_mods
    ref, ours, params = _build_pair(
        raw.MultiLatentAttention, q_lora_rank=24, kv_norm=True, seed=2
    )
    n = 6
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, n, HIDDEN)).astype(np.float32) * 0.5
    r = _run_ref_training(ref, x, [n])  # (1, n, HIDDEN)

    cache = jnp.zeros((1, n + 2, KV_RANK + ROPE_D), jnp.float32)
    outs = []
    for t in range(n):
        pos = jnp.asarray([[t]])
        cos, sin = rope_cos_sin(pos, ROPE_D)
        out, cache = ours.apply(
            params, jnp.asarray(x[:, t:t + 1]), cos, sin, cache,
            jnp.asarray(t), method=MLAttention.decode,
        )
        outs.append(np.asarray(out)[:, 0])
    o = np.stack(outs, axis=1)
    np.testing.assert_allclose(o, r, atol=3e-5)
