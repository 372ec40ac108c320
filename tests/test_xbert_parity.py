"""Torch-numerics parity: our BERT fusion tower vs the reference xbert.py.

Loads the reference's modified HF-BERT (multi_modality/models/backbones/
bert/xbert.py:599-1013: fusion_layer splitting, text/fusion/multi_modal
modes, cross-attention with encoder_width, cls MLM head), bridges its
randomly-initialized weights through convert_hf_bert, and compares every
mode's hidden states plus MLM logits. fp32 CPU target ≤1e-5.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference_module  # noqa: E402

from internvideo_tpu.models.bert import BertConfig, BertModel  # noqa: E402
from internvideo_tpu.models.convert import (  # noqa: E402
    convert_hf_bert,
    torch_state_dict_to_numpy,
)

H, LAYERS, HEADS, INTER, FUSION, VOCAB, EW = 32, 4, 2, 48, 2, 64, 40


@pytest.fixture(scope="module")
def pair():
    xbert = load_reference_module(
        "InternVideo2/multi_modality/models/backbones/bert/xbert.py"
    )
    torch.manual_seed(0)
    rcfg = xbert.BertConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        fusion_layer=FUSION, encoder_width=EW,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    ref = xbert.BertForMaskedLM(rcfg).eval()
    params = convert_hf_bert(
        torch_state_dict_to_numpy(ref.state_dict()), num_layers=LAYERS
    )
    model = BertModel(BertConfig(
        vocab_size=VOCAB, hidden_size=H, num_layers=LAYERS, num_heads=HEADS,
        intermediate_size=INTER, fusion_layer=FUSION, dropout=0.0,
        attn_impl="xla",
    ))
    return ref, model, params


def _inputs(seed=0, b=2, l=9, lv=5):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, VOCAB, (b, l)).astype(np.int64)
    mask = np.ones((b, l), np.int64)
    mask[1, -2:] = 0  # real padding exercises the additive bias path
    vis = rng.normal(size=(b, lv, EW)).astype(np.float32)
    vmask = np.ones((b, lv), np.int64)
    vmask[0, -1] = 0
    return ids, mask, vis, vmask


def test_text_mode_parity(pair):
    ref, model, params = pair
    ids, mask, _, _ = _inputs()
    with torch.no_grad():
        r = ref.bert(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
            mode="text",
        ).last_hidden_state.numpy()
    ours = np.asarray(model.apply(params, ids, mask, mode="text")
                      .last_hidden_state)
    np.testing.assert_allclose(ours, r, atol=2e-5)


def test_multimodal_mode_parity(pair):
    ref, model, params = pair
    ids, mask, vis, vmask = _inputs(1)
    with torch.no_grad():
        r = ref.bert(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=torch.from_numpy(vis),
            encoder_attention_mask=torch.from_numpy(vmask),
            mode="multi_modal",
        ).last_hidden_state.numpy()
    ours = np.asarray(model.apply(
        params, ids, mask, vision_embeds=vis, vision_mask=vmask,
        mode="multimodal",
    ).last_hidden_state)
    np.testing.assert_allclose(ours, r, atol=2e-5)


def test_fusion_mode_parity(pair):
    """Fusion: precomputed embeds enter at fusion_layer (xbert.py:727-729)."""
    ref, model, params = pair
    ids, mask, vis, vmask = _inputs(2)
    rng = np.random.default_rng(3)
    embeds = rng.normal(size=(2, 9, H)).astype(np.float32)
    with torch.no_grad():
        r = ref.bert(
            encoder_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=torch.from_numpy(vis),
            encoder_attention_mask=torch.from_numpy(vmask),
            mode="fusion",
        ).last_hidden_state.numpy()
    ours = np.asarray(model.apply(
        params, None, mask, encoder_embeds=embeds, vision_embeds=vis,
        vision_mask=vmask, mode="fusion",
    ).last_hidden_state)
    np.testing.assert_allclose(ours, r, atol=2e-5)


def test_mlm_head_parity(pair):
    """Full BertForMaskedLM logits through the cls.predictions head."""
    ref, model, params = pair
    ids, mask, vis, vmask = _inputs(4)
    with torch.no_grad():
        r = ref(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=torch.from_numpy(vis),
            encoder_attention_mask=torch.from_numpy(vmask),
            return_logits=True,
        ).numpy()
    ours = np.asarray(model.apply(
        params, ids, mask, vision_embeds=vis, vision_mask=vmask,
        mode="multimodal", with_mlm_logits=True,
    ).mlm_logits)
    np.testing.assert_allclose(ours, r, atol=5e-5)
