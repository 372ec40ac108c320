"""InternViT converter parity vs transformers' InternVLVisionModel (the
exact class the reference compose vision subclasses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_internvit_converter_parity():
    from transformers.models.internvl.configuration_internvl import (
        InternVLVisionConfig,
    )
    from transformers.models.internvl.modeling_internvl import (
        InternVLVisionModel,
    )

    from internvideo_tpu.models.convert import (
        convert_internvit,
        torch_state_dict_to_numpy,
    )
    from internvideo_tpu.models.internvideo2 import (
        InternVideo2, InternVideo2Config,
    )

    torch.manual_seed(0)
    hcfg = InternVLVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, patch_size=[8, 8], image_size=[32, 32],
        use_absolute_position_embeddings=True, use_mean_pooling=True,
        attention_bias=True, hidden_dropout_prob=0.0,
        attention_dropout=0.0, projection_dropout=0.0,
        layer_scale_init_value=0.5, use_qk_norm=False,
    )
    ref = InternVLVisionModel(hcfg).eval()

    cfg = InternVideo2Config(
        embed_dim=32, depth=2, num_heads=4, mlp_ratio=2.0, patch_size=8,
        img_size=32, num_frames=1, tubelet_size=1, num_classes=0,
        qkv_bias=True, qk_normalization=False, norm_type="layernorm",
        init_values=0.5, attn_impl="xla", mlp_act="gelu",
        clip_embed_dim=16,
    )
    model = InternVideo2(cfg)
    converted = convert_internvit(
        torch_state_dict_to_numpy(ref.state_dict()), depth=2)["params"]

    rng = np.random.RandomState(1)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    video = jnp.asarray(img)[:, None]  # T=1
    # the InternViT checkpoint has no attention-pooling projector; graft
    # the converted tower over an init tree (the compose path only
    # consumes .tokens)
    init = model.init(jax.random.key(0), video)["params"]
    params = {"params": {**init, **converted}}
    with torch.no_grad():
        # HF takes channels-first pixel_values
        r = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    out = model.apply(params, video)
    np.testing.assert_allclose(
        np.asarray(out.tokens), r.last_hidden_state.numpy(),
        atol=2e-5, rtol=1e-4,
    )


def test_convert_internvl_projector_mapping():
    """model.multi_modal_projector.* maps onto mlp1_* and the vision
    prefix routes through convert_internvit."""
    from transformers.models.internvl.configuration_internvl import (
        InternVLVisionConfig,
    )
    from transformers.models.internvl.modeling_internvl import (
        InternVLVisionModel,
    )

    from internvideo_tpu.models.convert import (
        convert_internvl,
        torch_state_dict_to_numpy,
    )
    from internvideo_tpu.models.internvl import InternVLChat, InternVLConfig
    from internvideo_tpu.models.internvideo2 import InternVideo2Config
    from internvideo_tpu.models.llm import LLMConfig
    from internvideo_tpu.nn.mla import MLAConfig

    torch.manual_seed(1)
    hcfg = InternVLVisionConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, patch_size=[8, 8], image_size=[32, 32],
        attention_bias=True, hidden_dropout_prob=0.0,
        layer_scale_init_value=0.5, use_qk_norm=False,
    )
    vis = InternVLVisionModel(hcfg).eval()
    text_hidden = 48
    # pixel-shuffled channel dim = hidden * (1/0.5)^2
    proj = torch.nn.ModuleDict({
        "layer_norm": torch.nn.LayerNorm(32 * 4),
        "linear_1": torch.nn.Linear(32 * 4, text_hidden),
        "linear_2": torch.nn.Linear(text_hidden, text_hidden),
    })
    sd = {f"model.vision_tower.{k}": v for k, v in vis.state_dict().items()}
    sd.update({
        f"model.multi_modal_projector.{k}": v
        for k, v in proj.state_dict().items()
    })

    cfg = InternVLConfig(
        vision=InternVideo2Config(
            embed_dim=32, depth=1, num_heads=4, mlp_ratio=2.0,
            patch_size=8, img_size=32, num_frames=1, tubelet_size=1,
            num_classes=0, qkv_bias=True, qk_normalization=False,
            norm_type="layernorm", init_values=0.5, attn_impl="xla",
            clip_embed_dim=16,
        ),
        text=LLMConfig(
            vocab_size=64, hidden_size=text_hidden, num_layers=1,
            intermediate_size=96, mrope_section=None,
            mla=MLAConfig(hidden_size=text_hidden, num_heads=4,
                          kv_lora_rank=16, qk_rope_head_dim=8,
                          qk_nope_head_dim=8, v_head_dim=8),
            attn_impl="xla",
        ),
        image_token_id=60,
    )
    model = InternVLChat(cfg)
    converted = convert_internvl(torch_state_dict_to_numpy(sd), cfg)
    # no language_model keys in sd -> converted carries vision + projector
    assert "language_model" not in converted["params"]

    # graft random-but-consistent LLM params and run the compose fwd
    ids = jnp.full((1, 8), 5, jnp.int32).at[0, 2:6].set(60)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    init = model.init(jax.random.key(0), ids, img)["params"]
    merged = {**init, **converted["params"]}
    # deep-merge the tower: the checkpoint has no pooling projector
    merged["vision_tower"] = {
        **init["vision_tower"], **converted["params"]["vision_tower"]}
    params = {"params": merged}
    out = model.apply(params, ids, img)
    assert out.logits.shape == (1, 8, 64)
    assert bool(jnp.all(jnp.isfinite(out.logits)))

    # projector numerics: converted mlp1 matches the torch projector
    x = np.random.RandomState(2).randn(3, 128).astype(np.float32)
    with torch.no_grad():
        want = proj["linear_2"](torch.nn.functional.gelu(
            proj["linear_1"](proj["layer_norm"](torch.from_numpy(x)))))
    p = converted["params"]
    h = jnp.asarray(x)
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    h = (h - mean) / jnp.sqrt(var + 1e-5) * p["mlp1_norm"]["scale"] \
        + p["mlp1_norm"]["bias"]
    h = h @ p["mlp1_fc1"]["kernel"] + p["mlp1_fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["mlp1_fc2"]["kernel"] + p["mlp1_fc2"]["bias"]
    np.testing.assert_allclose(np.asarray(h), want.numpy(), atol=2e-5,
                               rtol=1e-4)
