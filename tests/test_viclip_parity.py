"""ViCLIP torch parity: vision tower, text tower, full converted model.

References: Data/InternVid/viclip/viclip_vision.py:105-199 (CLIP ViT with
ln_pre, spatial+temporal pos embeds, cls+proj pooling, quick-gelu),
viclip_text.py:81-178 (CLIP_TEXT, eot-argmax pooling), viclip.py:17-90
(temp parameter)."""

import dataclasses
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))
from reference_loader import load_reference_module  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from internvideo_tpu.models.convert import (  # noqa: E402
    convert_clip_text,
    convert_viclip,
    convert_viclip_vision,
    torch_state_dict_to_numpy,
)
from internvideo_tpu.models.internvideo2 import InternVideo2  # noqa: E402
from internvideo_tpu.models.text_encoders import CLIPTextEncoder  # noqa: E402
from internvideo_tpu.models.viclip import (  # noqa: E402
    ViCLIP,
    ViCLIPConfig,
    viclip_text_config,
    viclip_vision_config,
)

import packaging  # noqa: E402

FTFY_STUB = {
    "ftfy": {"fix_text": lambda s: s},
    # this image has no setuptools pkg_resources shim; viclip_text.py only
    # uses it for `packaging.version.parse`
    "pkg_resources": {"packaging": packaging},
}

VIS_KW = dict(embed_dim=32, depth=2, num_heads=2, patch_size=14,
              img_size=28, num_frames=2, clip_embed_dim=16, attn_impl="xla")
TXT_KW = dict(width=32, num_heads=2, num_layers=2, embed_dim=16,
              vocab_size=50, context_length=12, attn_impl="xla")


@pytest.fixture(scope="module")
def ref_vision():
    vm = load_reference_module(
        "Data/InternVid/viclip/viclip_vision.py", stub_modules=FTFY_STUB
    )
    torch.manual_seed(0)
    m = vm.VisionTransformer(
        input_resolution=28, patch_size=14, width=32, layers=2, heads=2,
        output_dim=16, kernel_size=1, num_frames=2,
    ).eval()
    # torch.empty leaves proj uninitialized — set it deterministically
    with torch.no_grad():
        m.proj.normal_(0, 0.125)
        m.temporal_positional_embedding.normal_(0, 0.02)
    return m


@pytest.fixture(scope="module")
def ref_text():
    tm = load_reference_module(
        "Data/InternVid/viclip/viclip_text.py", stub_modules=FTFY_STUB
    )
    torch.manual_seed(1)
    m = tm.CLIP_TEXT(
        embed_dim=16, context_length=12, vocab_size=50,
        transformer_width=32, transformer_heads=2, transformer_layers=2,
        checkpoint_num=0,
    ).eval()
    with torch.no_grad():
        m.positional_embedding.normal_(0, 0.01)
        m.text_projection.normal_(0, 0.176)
    return m


def test_viclip_vision_parity(ref_vision):
    x_t = torch.randn(2, 3, 2, 28, 28)
    with torch.no_grad():
        want = ref_vision(x_t).numpy()  # (2, 16) projected cls

    cfg = viclip_vision_config("l", **VIS_KW)
    params = convert_viclip_vision(
        torch_state_dict_to_numpy(ref_vision.state_dict()), depth=2
    )
    video = jnp.asarray(x_t.permute(0, 2, 3, 4, 1).numpy())
    out = InternVideo2(cfg).apply(params, video)
    np.testing.assert_allclose(
        np.asarray(out.pooled), want, atol=2e-5, rtol=1e-4
    )


def test_viclip_text_parity(ref_text):
    ids_t = torch.randint(1, 49, (3, 12))
    ids_t[:, -1] = 49  # pseudo-eot: highest id -> argmax pooling position
    with torch.no_grad():
        want = ref_text(ids_t).numpy()

    cfg = viclip_text_config("l", **TXT_KW)
    params = convert_clip_text(
        torch_state_dict_to_numpy(ref_text.state_dict()), num_layers=2
    )
    _, pooled = CLIPTextEncoder(cfg).apply(params, jnp.asarray(ids_t.numpy()))
    np.testing.assert_allclose(
        np.asarray(pooled), want, atol=2e-5, rtol=1e-4
    )


def test_viclip_full_convert(ref_vision, ref_text):
    """Composite checkpoint (vision_encoder.* / text_encoder.* / temp) ->
    full ViCLIP params; projections and logit scale match end to end."""
    sd = {}
    for k, v in torch_state_dict_to_numpy(ref_vision.state_dict()).items():
        sd[f"vision_encoder.{k}"] = v
    for k, v in torch_state_dict_to_numpy(ref_text.state_dict()).items():
        sd[f"text_encoder.{k}"] = v
    sd["temp"] = np.asarray(0.02, np.float32)

    cfg = ViCLIPConfig(
        vision=viclip_vision_config("l", **VIS_KW),
        text=viclip_text_config("l", **TXT_KW),
        embed_dim=16, use_vision_proj=False,
    )
    params = convert_viclip(sd, depth=2, text_layers=2)

    x_t = torch.randn(2, 3, 2, 28, 28)
    ids_t = torch.randint(1, 49, (2, 12))
    ids_t[:, -1] = 49
    with torch.no_grad():
        want_v = ref_vision(x_t).numpy()
        want_t = ref_text(ids_t).numpy()

    out = ViCLIP(cfg).apply(
        params,
        jnp.asarray(x_t.permute(0, 2, 3, 4, 1).numpy()),
        jnp.asarray(ids_t.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out.video_proj), want_v, atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.text_proj), want_t, atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(float(out.logit_scale), 1 / 0.02, rtol=1e-5)


def test_viclip_config_presets():
    from internvideo_tpu.models.viclip import viclip_config

    cfg = viclip_config("l")
    assert cfg.vision.depth == 24 and cfg.vision.pool_type == "cls_proj"
    assert cfg.text.num_layers == 12 and not cfg.use_vision_proj
    assert abs(cfg.logit_scale_init - 4.60517) < 1e-4  # ln(1/temp_min)
    # overrides must actually apply (and not need a live backend)
    assert viclip_config("b", embed_dim=256).embed_dim == 256


def test_viclip_convert_infers_depths(ref_vision, ref_text):
    """convert_viclip reads tower depths off the checkpoint keys."""
    sd = {}
    for k, v in torch_state_dict_to_numpy(ref_vision.state_dict()).items():
        sd[f"vision_encoder.{k}"] = v
    for k, v in torch_state_dict_to_numpy(ref_text.state_dict()).items():
        sd[f"text_encoder.{k}"] = v
    sd["temp"] = np.asarray(0.01, np.float32)
    params = convert_viclip(sd)  # no explicit depth/text_layers
    assert "blocks_1" in params["params"]["vision_encoder"]
    assert "blocks_2" not in params["params"]["vision_encoder"]
    assert "attn_qkv_1" in params["params"]["text_encoder"]
    assert "attn_qkv_2" not in params["params"]["text_encoder"]


def test_cls_proj_rejects_pool_attn():
    """Attention-guided masking needs the attn-pooled head — fail fast."""
    cfg = viclip_vision_config("l", **VIS_KW)
    model = InternVideo2(cfg)
    video = jax.random.normal(jax.random.key(0), (1, 2, 28, 28, 3))
    with pytest.raises(ValueError, match="pool_type"):
        model.init(jax.random.key(1), video, return_pool_attn=True)


def test_viclip_frame_surgery(ref_vision):
    """num_frames != checkpoint T: temporal rows interpolate (reference
    interpolate_pos_embed_vit, add_zero=False) and the 4-frame tower runs."""
    sd = torch_state_dict_to_numpy(ref_vision.state_dict())
    p2 = convert_viclip_vision(sd, depth=2)["params"]
    p4 = convert_viclip_vision(sd, depth=2, num_frames=4)["params"]
    n = 4  # patches per frame at 28/14
    assert p4["pos_embed"].shape[0] == 1 + 4 * n
    # endpoint frames keep the checkpoint's first/last temporal rows
    np.testing.assert_allclose(
        p4["pos_embed"][1:1 + n], p2["pos_embed"][1:1 + n], atol=1e-6
    )
    np.testing.assert_allclose(
        p4["pos_embed"][1 + 3 * n:], p2["pos_embed"][1 + n:], atol=1e-6
    )
    cfg = viclip_vision_config("l", **{**VIS_KW, "num_frames": 4})
    video = jax.random.normal(jax.random.key(0), (1, 4, 28, 28, 3))
    out = InternVideo2(cfg).apply({"params": p4}, video)
    assert out.pooled.shape == (1, 16)
    assert bool(jnp.isfinite(out.pooled).all())


def test_viclip_masked_forward_runs():
    """keep_indices (masked-token eval, viclip_vision.py:146-160 semantics)
    composes with the cls_proj/ln_pre path."""
    cfg = ViCLIPConfig(
        vision=viclip_vision_config("l", **VIS_KW),
        text=viclip_text_config("l", **TXT_KW),
        embed_dim=16, use_vision_proj=False,
    )
    model = ViCLIP(cfg)
    video = jax.random.normal(jax.random.key(0), (2, 2, 28, 28, 3))
    keep = jnp.tile(jnp.array([[0, 2, 5]]), (2, 1))
    params = model.init(jax.random.key(1), video, jnp.ones((2, 12), jnp.int32))
    out = model.apply(
        params, video, method="encode_video", keep_indices=keep
    )
    assert out.shape == (2, 16) and bool(jnp.isfinite(out).all())
