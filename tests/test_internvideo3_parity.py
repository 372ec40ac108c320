"""Torch parity: InternVideo3 vision tower + projector + compose bridge.

Targets (VERDICT r2 item 2): modeling_vision.py:372-529 (pos-embed
bilinear interpolate, 2D rot_pos_emb, blocks, deepstack taps) and
modeling_projector.py (merger + postshuffle deepstack mergers), through
the convert_internvideo3* weight bridges; plus the placeholder-scatter
semantics of modeling_internvideo3.py:120-177 (inputs_embeds[mask] =
visual) against our static-shape scatter_visual.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference_module  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from internvideo_tpu.models.convert import (  # noqa: E402
    convert_internvideo3_projector,
    convert_internvideo3_vision,
    torch_state_dict_to_numpy,
)
from internvideo_tpu.models.vision_tower import (  # noqa: E402
    PatchMerger,
    VisionTower,
    VisionTowerConfig,
)

D, HEADS, LAYERS, INTER = 32, 2, 3, 64
P, TP, M, POSGRID = 4, 2, 2, 6
TEXT_D = 24
DEEPSTACK = (1, 2)


def _eager_varlen_attn(q, k, v, cu_seqlens_q=None, cu_seqlens_k=None,
                       max_seqlen_q=None, max_seqlen_k=None, dropout_p=0.0,
                       softmax_scale=None, causal=False, deterministic=False):
    # q: (b=1, H, S, hd) -> raw_output (b, S, H, hd); full attn per segment
    b, h, s, hd = q.shape
    out = torch.empty(b, s, h, hd, dtype=q.dtype)
    bounds = [int(x) for x in cu_seqlens_q]
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        qs = q[0, :, lo:hi].float()
        ks = k[0, :, lo:hi].float()
        vs = v[0, :, lo:hi].float()
        logits = torch.einsum("hqd,hkd->hqk", qs, ks) * softmax_scale
        p = logits.softmax(-1)
        out[0, lo:hi] = torch.einsum(
            "hqk,hkd->qhd", p, vs
        ).to(q.dtype)
    return {"raw_output": out}


@pytest.fixture(scope="module")
def ref_vision_mod():
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

    import logging

    from torch import nn

    class _BaseModel(nn.Module):
        def __init__(self, config=None):
            super().__init__()
            self.config = config

        def _init_load_spec(self):
            pass

        def _clean_param_name(self, name):
            return name

    def get_act_fn(name):
        return {
            "gelu_pytorch_tanh": nn.GELU(approximate="tanh"),
            "gelu": nn.GELU(),
        }[name]

    smod("xtuner")
    smod("xtuner.v1")
    smod("xtuner.v1.ops").__path__ = []
    smod("xtuner.v1.ops.act_fn", get_act_fn=get_act_fn)
    smod(
        "xtuner.v1.utils",
        XTUNER_DETERMINISTIC=False,
        get_device=lambda: "cpu",
        get_torch_device_module=lambda: torch.cpu,
        init_params=lambda p, fn: fn(p),
        get_logger=lambda *a, **k: logging.getLogger("ref_iv3"),
    )
    smod(
        "xtuner.v1.ops.attn_imp",
        attn_impl_mapping={
            "eager_attention": _eager_varlen_attn,
            "flash_attention": _eager_varlen_attn,
            "flex_attention": _eager_varlen_attn,
        },
        AttnOpOutputs=dict,
    )
    smod("xtuner.v1.model", BaseModel=_BaseModel)
    smod("xtuner.v1.config", FSDPConfig=object, GenerateConfig=object)
    smod("xtuner.v1.float8")
    smod("xtuner.v1.float8.float8_handler", Float8Handler=object)
    smod("xtuner.v1.utils.compile",
         maybe_compile=lambda *a, **k: (lambda f: f))
    smod("xtuner.v1.model.utils")
    smod("xtuner.v1.model.utils.checkpointing",
         checkpoint_wrapper=lambda m, *a, **k: m)
    smod("xtuner.v1.module", AttnOutputs=dict)
    smod("xtuner.v1.ops.comm").__path__ = []
    smod("xtuner.v1.ops.comm.all_to_all",
         ulysses_all_to_all=lambda *a, **k: None)
    smod("xtuner.v1.data_proto")
    smod("xtuner.v1.data_proto.utils",
         pad_to_multiple_of=lambda *a, **k: None,
         split_for_sequence_parallel=lambda *a, **k: None)

    class _VisCfg:
        in_channels = 3
        depth = LAYERS
        hidden_size = D
        num_attention_heads = HEADS
        intermediate_size = INTER
        hidden_act = "gelu_pytorch_tanh"
        patch_size = P
        spatial_merge_size = M
        temporal_patch_size = TP
        num_position_embeddings = POSGRID * POSGRID
        deepstack_visual_indexes = list(DEEPSTACK)
        initializer_range = 0.02
        attn_impl = "eager_attention"

    class _ProjCfg:
        vision_hidden_size = D
        text_hidden_size = TEXT_D
        spatial_merge_size = M
        deepstack_visual_indexes = list(DEEPSTACK)

    # the config sibling import is satisfied with these stand-ins
    smod(
        "_iv3_cfg_stub",
        InternVideo3VisionConfig=_VisCfg,
        InternVideo3ProjectorConfig=_ProjCfg,
    )
    vis = load_reference_module(
        "InternVideo3/InternVideo3_sft/xtuner/v1/model/compose/"
        "internvideo3/modeling_vision.py",
        sibling_mods={"internvideo3_config": "_iv3_cfg_stub"},
    )
    proj = load_reference_module(
        "InternVideo3/InternVideo3_sft/xtuner/v1/model/compose/"
        "internvideo3/modeling_projector.py",
        sibling_mods={
            "internvideo3_config": "_iv3_cfg_stub",
            "modeling_vision": vis,
        },
    )
    return vis, proj, _VisCfg, _ProjCfg


def _our_cfg():
    return VisionTowerConfig(
        hidden_size=D, num_layers=LAYERS, num_heads=HEADS,
        intermediate_size=INTER, patch_size=P, temporal_patch_size=TP,
        spatial_merge_size=M, pos_embed_grid=POSGRID,
        deepstack_indexes=DEEPSTACK, text_hidden_size=TEXT_D,
        attn_impl="xla",
    )


def _make_video(gt=2, gh=4, gw=4, seed=0):
    rng = np.random.default_rng(seed)
    video = rng.normal(size=(1, gt * TP, gh * P, gw * P, 3)).astype(
        np.float32
    )
    # flat pixel rows the reference consumes: merge-block token order,
    # (C, tp, p, p) within a token (modeling_vision.py:69-74 view)
    x = video[0].reshape(gt, TP, gh // M, M, P, gw // M, M, P, 3)
    x = x.transpose(0, 2, 5, 3, 6, 1, 4, 7, 8)  # gt, gh/m, gw/m, m, m, tp, p, p, c
    x = np.moveaxis(x.reshape(-1, TP, P, P, 3), -1, 1)  # (S, C, tp, p, p)
    pixels = x.reshape(x.shape[0], -1)
    grid = np.array([[gt, gh, gw]], dtype=np.int64)
    return video, pixels, grid


def test_vision_tower_parity(ref_vision_mod):
    vis_mod, _, VisCfg, _ = ref_vision_mod
    torch.manual_seed(0)
    ref = vis_mod.InternVideo3VisionModel(VisCfg()).eval()
    cfg = _our_cfg()
    params = convert_internvideo3_vision(
        torch_state_dict_to_numpy(ref.state_dict()), cfg
    )
    video, pixels, grid = _make_video()
    with torch.no_grad():
        r_tokens, r_deep = ref(
            torch.from_numpy(pixels), torch.from_numpy(grid)
        )
    tower = VisionTower(cfg)
    o_tokens, o_deep = tower.apply(params, jnp.asarray(video))
    np.testing.assert_allclose(
        np.asarray(o_tokens)[0], r_tokens.numpy(), atol=5e-5
    )
    assert len(o_deep) == len(r_deep) == len(DEEPSTACK)
    for o, r in zip(o_deep, r_deep):
        np.testing.assert_allclose(np.asarray(o)[0], r.numpy(), atol=5e-5)


def test_projector_parity(ref_vision_mod):
    _, proj_mod, _, ProjCfg = ref_vision_mod
    torch.manual_seed(1)
    ref = proj_mod.InternVideo3Projector(ProjCfg()).eval()
    cfg = _our_cfg()
    params = convert_internvideo3_projector(
        torch_state_dict_to_numpy(ref.state_dict()),
        num_deepstack=len(DEEPSTACK),
    )
    rng = np.random.default_rng(3)
    s = 16  # merge-block-ordered token count, divisible by M*M
    tokens = rng.normal(size=(s, D)).astype(np.float32)
    deeps = [rng.normal(size=(s, D)).astype(np.float32) for _ in DEEPSTACK]
    with torch.no_grad():
        r_main, r_deep = ref(
            torch.from_numpy(tokens),
            [torch.from_numpy(d) for d in deeps],
        )
    main = PatchMerger(cfg).apply(
        {"params": params["merger"]}, jnp.asarray(tokens)[None]
    )
    np.testing.assert_allclose(
        np.asarray(main)[0], r_main.numpy(), atol=5e-5
    )
    for i, d in enumerate(deeps):
        o = PatchMerger(cfg, use_postshuffle_norm=True).apply(
            {"params": params[f"deepstack_merger_{i}"]},
            jnp.asarray(d)[None],
        )
        np.testing.assert_allclose(
            np.asarray(o)[0], r_deep[i].numpy(), atol=5e-5
        )


def test_placeholder_scatter_parity():
    """scatter_visual vs the reference's boolean-mask assignment
    (modeling_internvideo3.py:177 inputs_embeds[mask] = visual)."""
    from internvideo_tpu.models.mllm import scatter_visual

    rng = np.random.default_rng(4)
    b, l, nv, d = 2, 11, 4, 8
    embeds = rng.normal(size=(b, l, d)).astype(np.float32)
    visual = rng.normal(size=(b * nv, d)).astype(np.float32)
    mask = np.zeros((b, l), bool)
    mask[0, 2:6] = True
    mask[1, [0, 3, 7, 10]] = True

    t_embeds = torch.from_numpy(embeds.copy())
    t_embeds[torch.from_numpy(mask)] = torch.from_numpy(visual)

    # ours scatters per-sample (B, Nv, D)
    ours = scatter_visual(
        jnp.asarray(embeds),
        jnp.asarray(visual.reshape(b, nv, d)),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(ours), t_embeds.numpy(), atol=0)


def test_full_compose_convert_and_generate(ref_vision_mod):
    """convert_internvideo3 on a synthetic full HF checkpoint (reference
    torch vision+projector state dicts under model.visual., an MLA text
    model under model.language_model.) -> VideoMLLM forward + greedy
    generate run; the vision half's numerics are the torch modules'."""
    from internvideo_tpu.models.convert import (
        convert_internvideo3,
        export_mla_llm_hf,
    )
    from internvideo_tpu.models.llm import LLMConfig, MLATransformer
    from internvideo_tpu.models.mllm import MLLMConfig, VideoMLLM
    from internvideo_tpu.nn.mla import MLAConfig

    vis_mod, proj_mod, VisCfg, ProjCfg = ref_vision_mod
    torch.manual_seed(7)
    ref_vis = vis_mod.InternVideo3VisionModel(VisCfg()).eval()
    ref_proj = proj_mod.InternVideo3Projector(ProjCfg()).eval()

    text_cfg = LLMConfig(
        vocab_size=300, hidden_size=TEXT_D, num_layers=2,
        intermediate_size=48, mrope_section=(2, 1, 1),
        mla=MLAConfig(
            hidden_size=TEXT_D, num_heads=2, kv_lora_rank=16,
            q_lora_rank=None, qk_rope_head_dim=8, qk_nope_head_dim=8,
            v_head_dim=8,
        ),
    )
    cfg = MLLMConfig(
        vision=_our_cfg(), text=text_cfg,
        video_token_id=290, image_token_id=291,
    )
    model = VideoMLLM(cfg)

    # synthesize the llm half by exporting a random init of our own model
    lm = MLATransformer(text_cfg)
    ids0 = jnp.ones((1, 4), jnp.int32)
    from flax import linen as fnn
    lm_params = fnn.unbox(
        jax.jit(lm.init)(jax.random.key(0), ids0)["params"]
    )
    sd = {}
    for k_, v_ in torch_state_dict_to_numpy(ref_vis.state_dict()).items():
        sd["model.visual." + k_] = v_
    for k_, v_ in torch_state_dict_to_numpy(ref_proj.state_dict()).items():
        sd["model.visual." + k_] = v_
    for k_, v_ in export_mla_llm_hf(lm_params, text_cfg).items():
        sd[k_.replace("model.", "model.language_model.", 1)
           if k_.startswith("model.") else k_] = v_

    params = convert_internvideo3(sd, cfg)

    gt, gh, gw = 2, 4, 4
    video, pixels, grid = _make_video(gt, gh, gw, seed=8)
    n_visual = gt * gh * gw // (M * M)
    ids = np.full((1, n_visual + 4), 5, np.int64)
    ids[0, 2:2 + n_visual] = 290
    pos = np.broadcast_to(np.arange(ids.shape[1]), (3, 1, ids.shape[1]))
    out = model.apply(
        params, jnp.asarray(ids), jnp.asarray(video),
        position_ids=jnp.asarray(pos),
    )
    assert out.logits.shape == (1, ids.shape[1], 300)
    assert np.isfinite(np.asarray(out.logits)).all()

    # visual scatter used the torch-parity-tested tower: check the scattered
    # rows equal projector(reference tower outputs)
    with torch.no_grad():
        r_tokens, r_deep = ref_vis(
            torch.from_numpy(pixels), torch.from_numpy(grid)
        )
        r_merged, _ = ref_proj(r_tokens, r_deep)
    o_visual, _ = model.apply(
        params, jnp.asarray(video), method=VideoMLLM.encode_video
    )
    np.testing.assert_allclose(
        np.asarray(o_visual)[0], r_merged.numpy(), atol=5e-5
    )
