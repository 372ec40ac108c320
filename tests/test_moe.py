"""MoE: routing correctness, capacity, EP sharding, bias balancing."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from internvideo_tpu.core.mesh import MeshConfig, create_mesh, logical_axis_rules
from internvideo_tpu.nn.moe import MoEConfig, MoEMlp, update_router_bias
from flax import linen as nn


def test_moe_forward_and_grads():
    cfg = MoEConfig(num_experts=4, top_k=2, intermediate_size=32,
                    capacity_factor=2.0)
    model = MoEMlp(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 8, 16))
    params = model.init(jax.random.key(1), x)
    out = model.apply(params, x)
    assert out.output.shape == (2, 8, 16)
    assert np.isfinite(float(out.aux_loss))
    np.testing.assert_allclose(float(out.expert_load.sum()), 1.0, rtol=1e-5)

    def loss(p):
        o = model.apply(p, x)
        return jnp.sum(jnp.square(o.output)) + o.aux_loss

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_moe_capacity_drops():
    """With capacity factor ~0, (almost) everything drops -> output ~ 0."""
    cfg = MoEConfig(num_experts=4, top_k=1, intermediate_size=8,
                    capacity_factor=0.01)
    model = MoEMlp(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 16, 8))
    params = model.init(jax.random.key(1), x)
    out = model.apply(params, x)
    # cap = 1 slot per expert -> at most 4 of 16 tokens routed
    nonzero_rows = int(jnp.sum(jnp.any(out.output[0] != 0, axis=-1)))
    assert nonzero_rows <= 4


def test_moe_ep_sharded_matches_single_device():
    cfg = MoEConfig(num_experts=8, top_k=2, intermediate_size=16,
                    capacity_factor=2.0)
    model = MoEMlp(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 16, 8))
    params = model.init(jax.random.key(1), x)
    ref = model.apply(params, x).output

    mesh = create_mesh(MeshConfig(replica=1, fsdp=1, seq=1, tensor=1, expert=8))
    rules = logical_axis_rules()
    with mesh, nn.logical_axis_rules(list(rules)):
        out = jax.jit(lambda p, x: model.apply(p, x).output)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_moe_dropless_matches_dense_reference():
    """Dropless (ragged_dot) output == per-expert dense computation, and no
    token is ever dropped even at capacity_factor -> 0."""
    cfg = MoEConfig(num_experts=4, top_k=2, intermediate_size=16,
                    capacity_factor=0.01, dispatch="dropless")
    model = MoEMlp(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 8, 12))
    params = model.init(jax.random.key(1), x)
    out = model.apply(params, x)
    # every token keeps its full top-k contribution: recompute densely
    from flax.core import meta
    p = meta.unbox(params)["params"]
    xt = np.asarray(x.reshape(-1, 12))
    logits = xt @ np.asarray(p["router"]["kernel"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    top_idx = np.argsort(-logits, axis=-1)[:, :2]
    ref = np.zeros_like(xt)
    for t in range(xt.shape[0]):
        gts = probs[t, top_idx[t]]
        gts = gts / gts.sum()
        for j, e_id in enumerate(top_idx[t]):
            h = xt[t] @ np.asarray(p["w_gate"])[e_id]
            u = xt[t] @ np.asarray(p["w_up"])[e_id]
            y = (h / (1 + np.exp(-h)) * u) @ np.asarray(p["w_down"])[e_id]
            ref[t] += gts[j] * y
    np.testing.assert_allclose(
        np.asarray(out.output.reshape(-1, 12)), ref, atol=1e-4, rtol=1e-4
    )
    # all rows active (dropless), unlike the capacity path at cf=0.01
    assert int(jnp.sum(jnp.any(out.output[0] != 0, axis=-1))) == 8

    def loss(pp):
        o = model.apply(pp, x)
        return jnp.sum(jnp.square(o.output)) + o.aux_loss

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_moe_dropless_ep_matches_dropless():
    """dispatch='dropless_ep' (ragged a2a over the expert axis) matches the
    single-shard dropless path bit-for-bit at fp32 tolerances."""
    mesh = create_mesh(MeshConfig(replica=1, fsdp=1, seq=1, tensor=1,
                                  expert=8))
    base = MoEConfig(num_experts=8, top_k=2, intermediate_size=16,
                     dispatch="dropless")
    m1 = MoEMlp(base)
    x = jax.random.normal(jax.random.key(0), (2, 16, 12))
    params = m1.init(jax.random.key(1), x)
    ref = m1.apply(params, x).output

    ep = MoEMlp(
        MoEConfig(num_experts=8, top_k=2, intermediate_size=16,
                  dispatch="dropless_ep", ep_buffer_factor=8.0),
        mesh=mesh,
    )
    rules = logical_axis_rules()
    with mesh, nn.logical_axis_rules(list(rules)):
        out = jax.jit(lambda p, x: ep.apply(p, x).output)(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_router_bias_update():
    bias = jnp.zeros(4)
    load = jnp.array([0.7, 0.1, 0.1, 0.1])
    new = update_router_bias(bias, load, speed=0.1)
    assert float(new[0]) < 0  # overloaded expert pushed down
    assert float(new[1]) > 0


# --- DeepSeek-V3 router parity vs the reference implementation -------------


def _load_reference_noaux_router():
    """Import the reference NoAuxRouter (xtuner module/router/noaux_router
    .py) with its CLI/device deps stubbed; returns the module."""
    from tests.reference_loader import load_reference_module

    class _Param:  # cyclopts.Parameter used only inside Annotated metadata
        def __init__(self, *a, **k):
            pass

    return load_reference_module(
        "InternVideo3/InternVideo3_sft/xtuner/v1/module/router/"
        "noaux_router.py",
        extra_siblings=("protocol.py",),
        stub_modules={
            "cyclopts": {"Parameter": _Param},
            "xtuner": {},
            "xtuner.v1": {},
            "xtuner.v1.utils": {},
            "xtuner.v1.utils.device": {"get_device": lambda: "cpu"},
        },
    )


def test_noaux_sigmoid_router_matches_reference():
    """route_tokens(scoring_func="sigmoid") vs the reference NoAuxRouter
    (noaux_router.py:79-140): sigmoid scores, e-score correction bias for
    choice only, node-limited grouping (top-2 group scores), gates from the
    unbiased scores normalized with the 1e-20 epsilon, scaled by 2.5."""
    import torch

    from internvideo_tpu.nn.moe import route_tokens

    mod = _load_reference_noaux_router()
    n, e, k = 64, 16, 4
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((n, e)).astype(np.float32)
    bias = (rng.standard_normal(e) * 0.1).astype(np.float32)

    for n_group, topk_group in ((4, 2), (1, 1)):
        ref = mod.NoAuxRouter(
            n_routed_experts=e, num_experts_per_tok=k,
            router_scaling_factor=2.5, scoring_func="sigmoid",
            n_group=n_group, topk_group=topk_group, norm_topk_prob=True,
        )
        ref.e_score_correction_bias.data = torch.from_numpy(bias.copy())
        # torch.histc is unimplemented for int64 on CPU (the reference runs
        # on accelerators); it only feeds the tokens_per_expert diagnostic
        orig_histc = torch.histc
        torch.histc = lambda t, *a, **k: orig_histc(t.float(), *a, **k)
        try:
            with torch.no_grad():
                out = ref.forward(torch.from_numpy(logits.copy()))
        finally:
            torch.histc = orig_histc
        ref_ids = out["topk_ids"].numpy()
        ref_w = out["topk_weights"].numpy()

        cfg = MoEConfig(
            num_experts=e, top_k=k, scoring_func="sigmoid",
            router_scaling_factor=2.5, norm_topk_prob=True,
            n_group=n_group, topk_group=topk_group,
        )
        idx, gate, _ = jax.jit(
            lambda lg: route_tokens(lg, cfg, jnp.asarray(bias))
        )(jnp.asarray(logits))
        idx, gate = np.asarray(idx), np.asarray(gate)

        # compare as (expert -> weight) maps per token: top-k tie order may
        # legitimately differ between torch.topk and lax.top_k
        for t in range(n):
            ref_pairs = dict(zip(ref_ids[t].tolist(), ref_w[t].tolist()))
            got_pairs = dict(zip(idx[t].tolist(), gate[t].tolist()))
            assert set(ref_pairs) == set(got_pairs), (
                t, n_group, ref_pairs, got_pairs,
            )
            for eid, w in ref_pairs.items():
                np.testing.assert_allclose(
                    got_pairs[eid], w, rtol=1e-5, atol=1e-6,
                    err_msg=f"token {t} expert {eid} (groups {n_group})",
                )


def test_greedy_softmax_router_matches_reference():
    """route_tokens(scoring_func="softmax") vs the reference GreedyRouter
    (greedy.py:47-101) with norm_topk_prob + scaling."""
    import torch

    from internvideo_tpu.nn.moe import route_tokens
    from tests.reference_loader import load_reference_module

    class _Param:
        def __init__(self, *a, **k):
            pass

    mod = load_reference_module(
        "InternVideo3/InternVideo3_sft/xtuner/v1/module/router/greedy.py",
        extra_siblings=("protocol.py",),
        stub_modules={"cyclopts": {"Parameter": _Param}},
    )
    n, e, k = 64, 8, 2
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((n, e)).astype(np.float32)
    ref = mod.GreedyRouter(
        n_routed_experts=e, num_experts_per_tok=k, norm_topk_prob=True,
        scoring_func="softmax", router_scaling_factor=1.5,
    )
    orig_histc = torch.histc
    torch.histc = lambda t, *a, **k: orig_histc(t.float(), *a, **k)
    try:
        with torch.no_grad():
            out = ref.forward(torch.from_numpy(logits.copy()))
    finally:
        torch.histc = orig_histc
    cfg = MoEConfig(
        num_experts=e, top_k=k, scoring_func="softmax",
        router_scaling_factor=1.5, norm_topk_prob=True,
    )
    idx, gate, _ = jax.jit(lambda lg: route_tokens(lg, cfg, None))(
        jnp.asarray(logits)
    )
    np.testing.assert_array_equal(np.asarray(idx), out["topk_ids"].numpy())
    np.testing.assert_allclose(
        np.asarray(gate), out["topk_weights"].numpy(), rtol=1e-5, atol=1e-6
    )


def test_shared_experts_add_to_routed_output():
    """num_shared_experts adds an always-on SwiGLU: zeroing the shared
    projections reproduces the shared-free output exactly, and the shared
    branch contributes for every token (DeepSeek-V3 semantics)."""
    cfg = MoEConfig(
        num_experts=4, top_k=2, intermediate_size=32,
        num_shared_experts=2, dispatch="dropless",
    )
    m = MoEMlp(cfg)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 8, 16)), jnp.float32
    )
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)

    zeroed = jax.tree.map(lambda a: a, params)  # shallow copy
    p = dict(zeroed["params"])
    for name in ("shared_gate_proj", "shared_up_proj", "shared_down_proj"):
        p[name] = jax.tree.map(jnp.zeros_like, p[name])
    out_nosh = m.apply({"params": p}, x)
    base_cfg = MoEConfig(
        num_experts=4, top_k=2, intermediate_size=32, dispatch="dropless"
    )
    p_base = {
        k: v for k, v in zeroed["params"].items()
        if not k.startswith("shared_")
    }
    out_base = MoEMlp(base_cfg).apply({"params": p_base}, x)
    np.testing.assert_allclose(
        np.asarray(out_nosh.output), np.asarray(out_base.output), atol=1e-6
    )
    assert float(jnp.max(jnp.abs(out.output - out_base.output))) > 1e-4


def test_clipped_swiglu_and_expert_bias():
    """GPT-OSS expert math (ops/act_fn.py:18-24 + gpt_oss.py moe_bias):
    clipped SwiGLU matches the reference formula; per-expert biases change
    the output and match between dropless and capacity dispatch."""
    import torch

    from internvideo_tpu.nn.moe import moe_act

    gate = np.linspace(-12, 12, 37, dtype=np.float32)
    up = np.linspace(9, -11, 37, dtype=np.float32)
    got = np.asarray(
        moe_act(
            MoEConfig(act_fn="clipped_swiglu", clip_alpha=1.702,
                      clip_limit=7.0),
            jnp.asarray(gate), jnp.asarray(up),
        )
    )
    tg = torch.from_numpy(gate).clamp(max=7.0)
    tu = torch.from_numpy(up).clamp(min=-7.0, max=7.0)
    want = ((tu + 1) * (tg * torch.sigmoid(tg * 1.702))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    cfg_d = MoEConfig(
        num_experts=4, top_k=2, intermediate_size=32,
        act_fn="clipped_swiglu", expert_bias=True, dispatch="dropless",
    )
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 8, 16)), jnp.float32
    )
    m_d = MoEMlp(cfg_d)
    params = nn.unbox(m_d.init(jax.random.key(1), x))
    # give the biases real values (init may be ~0-mean small): overwrite
    p = dict(params["params"])
    rng = np.random.default_rng(4)
    for name in ("b_gate", "b_up", "b_down"):
        p[name] = jnp.asarray(
            rng.standard_normal(p[name].shape), jnp.float32
        )
    out_d = m_d.apply({"params": p}, x)
    cfg_c = MoEConfig(
        num_experts=4, top_k=2, intermediate_size=32,
        act_fn="clipped_swiglu", expert_bias=True, dispatch="capacity",
        capacity_factor=8.0,  # high: no drops, outputs must agree
    )
    out_c = MoEMlp(cfg_c).apply({"params": p}, x)
    np.testing.assert_allclose(
        np.asarray(out_d.output), np.asarray(out_c.output),
        rtol=1e-4, atol=1e-5,
    )
    pz = dict(p)
    for name in ("b_gate", "b_up", "b_down"):
        pz[name] = jnp.zeros_like(pz[name])
    out_z = m_d.apply({"params": pz}, x)
    assert float(jnp.max(jnp.abs(out_d.output - out_z.output))) > 1e-4


def test_deepseek_v3_preset_builds():
    from internvideo_tpu.models.presets import deepseek_v3, gpt_oss_moe_text

    cfg = deepseek_v3()
    assert cfg.moe.num_experts == 256 and cfg.moe.top_k == 8
    assert cfg.moe.n_group == 8 and cfg.moe.topk_group == 4
    assert cfg.moe.scoring_func == "sigmoid"
    assert cfg.moe.num_shared_experts == 1
    assert cfg.moe_first_k_dense == 3
    assert cfg.rope_scaling.factor == 40.0
    g = gpt_oss_moe_text()
    assert g.moe.act_fn == "clipped_swiglu" and g.moe.expert_bias


def test_yarn_rope_matches_hf():
    """YaRN frequency rescaling (nn/rope.py YarnConfig) vs HuggingFace's
    _compute_yarn_parameters — the scheme DeepSeek-V3 ships
    (reference deepseek_v3.py:66-74). Compares inverse freqs and the
    resulting cos/sin (incl. the mscale attention factor)."""
    import torch
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from internvideo_tpu.nn.rope import YarnConfig, rope_cos_sin, rope_freqs

    dim, theta = 64, 10000.0
    yarn = YarnConfig(
        factor=40.0, original_max_position_embeddings=512,
        beta_fast=32.0, beta_slow=1.0, mscale=1.0, mscale_all_dim=1.0,
    )

    class _Cfg:
        rope_theta = theta
        head_dim = dim
        hidden_size = dim
        num_attention_heads = 1
        max_position_embeddings = 512 * 40
        rope_scaling = {
            "rope_type": "yarn", "factor": 40.0,
            "original_max_position_embeddings": 512,
            "beta_fast": 32.0, "beta_slow": 1.0,
            "mscale": 1.0, "mscale_all_dim": 1.0,
        }

    inv_hf, mscale_hf = ROPE_INIT_FUNCTIONS["yarn"](_Cfg(), "cpu")
    inv = np.asarray(rope_freqs(dim, theta, yarn))
    np.testing.assert_allclose(inv, inv_hf.numpy(), rtol=1e-5, atol=1e-8)

    pos = jnp.arange(0, 2048, 97)
    cos, sin = rope_cos_sin(pos, dim, theta, yarn)
    ang = torch.outer(torch.from_numpy(np.asarray(pos, np.float32)), inv_hf)
    ang = torch.cat([ang, ang], dim=-1)
    np.testing.assert_allclose(
        np.asarray(cos), (ang.cos() * mscale_hf).numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sin), (ang.sin() * mscale_hf).numpy(),
        rtol=1e-5, atol=1e-5,
    )


def test_moe_dropless_ep_deepseek_routing_matches_dropless():
    """EP dispatch with the full DeepSeek-V3 routing stack (sigmoid NoAux
    scores + correction bias + node-limited groups + scaling + shared
    expert): the expert-parallel path must match single-shard dropless —
    routing is computed before dispatch, shared experts are dense."""
    mesh = create_mesh(MeshConfig(replica=1, fsdp=1, seq=1, tensor=1,
                                  expert=8))
    kw = dict(
        num_experts=8, top_k=3, intermediate_size=16,
        scoring_func="sigmoid", router_scaling_factor=2.5,
        norm_topk_prob=True, n_group=4, topk_group=2,
        num_shared_experts=1, router_bias_balancing=True,
    )
    bias = jnp.asarray(
        np.random.default_rng(7).standard_normal(8) * 0.05, jnp.float32
    )
    m1 = MoEMlp(MoEConfig(dispatch="dropless", **kw))
    x = jax.random.normal(jax.random.key(0), (2, 16, 12))
    params = m1.init(jax.random.key(1), x, bias)
    ref = m1.apply(params, x, bias)

    ep = MoEMlp(
        MoEConfig(dispatch="dropless_ep", ep_buffer_factor=8.0, **kw),
        mesh=mesh,
    )
    rules = logical_axis_rules()
    with mesh, nn.logical_axis_rules(list(rules)):
        out = jax.jit(
            lambda p, x, b: ep.apply(p, x, b).output
        )(params, x, bias)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.output), atol=2e-5, rtol=2e-5
    )
    # routing actually used the groups: every token's experts live in at
    # most topk_group groups of size 2
    from internvideo_tpu.nn.moe import route_tokens

    logits = jax.random.normal(jax.random.key(3), (64, 8))
    idx, _, _ = route_tokens(logits, MoEConfig(dispatch="dropless", **kw), bias)
    groups = np.asarray(idx) // 2  # 8 experts / 4 groups
    assert all(len(set(g.tolist())) <= 2 for g in groups)
