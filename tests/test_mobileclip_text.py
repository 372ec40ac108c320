"""MobileCLIP text tower (CLIP-small family, M6): config factory, weight
bridge, and torch parity vs mobileclip/text_encoder.py TextTransformer."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference_module  # noqa: E402

from internvideo_tpu.models.convert import (  # noqa: E402
    convert_mobileclip_text,
    torch_state_dict_to_numpy,
)
from internvideo_tpu.models.text_encoders import (  # noqa: E402
    CLIPTextEncoder,
    mobileclip_text_config,
)

TEXT_CFG = {
    "context_length": 16,
    "vocab_size": 50,
    "dim": 32,
    "ffn_multiplier_per_layer": 4.0,
    "n_heads_per_layer": 2,
    "n_transformer_layers": 2,
    "norm_layer": "layer_norm_fp32",
    "causal_masking": True,
    "model_name": "base",
}


def test_mobileclip_text_parity():
    ref_mod = load_reference_module(
        "InternVideo2/multi_modality/models/backbones/internvideo2/"
        "mobileclip/text_encoder.py",
        extra_siblings=("transformer.py",),
    )
    torch.manual_seed(0)
    ref = ref_mod.TextTransformer(TEXT_CFG, projection_dim=24).eval()

    cfg = mobileclip_text_config(TEXT_CFG, projection_dim=24, attn_impl="xla")
    assert cfg.act == "gelu" and cfg.causal
    model = CLIPTextEncoder(cfg)
    params = convert_mobileclip_text(
        torch_state_dict_to_numpy(ref.state_dict()), num_layers=2
    )

    rng = np.random.RandomState(1)
    ids = rng.randint(1, 50, size=(3, 16)).astype(np.int32)
    ids[:, -1] = 49  # EOT = largest id
    with torch.no_grad():
        r_pooled = ref(torch.from_numpy(ids).long())
        r_tokens = ref(torch.from_numpy(ids).long(), return_all_tokens=True)
    x, pooled = model.apply(params, ids)
    np.testing.assert_allclose(
        np.asarray(x), r_tokens.numpy(), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), r_pooled.numpy(), atol=1e-5, rtol=1e-4
    )


def test_mobileclip_config_rejects_mct():
    with pytest.raises(NotImplementedError):
        mobileclip_text_config({**TEXT_CFG, "model_name": "mct"})
