"""HF-BERT weight bridge: export -> import round trip preserves outputs."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from internvideo_tpu.models.bert import BertConfig, BertModel
from internvideo_tpu.models.convert import convert_hf_bert, export_bert_to_hf

CFG = BertConfig(
    vocab_size=64, hidden_size=32, num_layers=3, num_heads=2,
    intermediate_size=48, fusion_layer=1, dropout=0.0, attn_impl="xla",
)


def test_bert_hf_roundtrip():
    model = BertModel(CFG)
    ids = jax.random.randint(jax.random.key(0), (2, 9), 1, 60)
    mask = jnp.ones((2, 9), jnp.int32)
    vis = jax.random.normal(jax.random.key(1), (2, 4, 32))
    variables = model.init(
        jax.random.key(2), ids, mask, vision_embeds=vis, mode="multimodal"
    )
    params = nn.unbox(variables["params"])
    ref = model.apply(
        {"params": params}, ids, mask, vision_embeds=vis, mode="multimodal"
    )

    sd = export_bert_to_hf(params, num_layers=CFG.num_layers)
    assert "bert.encoder.layer.0.attention.self.query.weight" in sd
    # fusion layers carry crossattention blocks
    assert "bert.encoder.layer.1.crossattention.self.query.weight" in sd
    assert "bert.encoder.layer.0.crossattention.self.query.weight" not in sd

    back = convert_hf_bert(sd, num_layers=CFG.num_layers)
    out = model.apply(back, ids, mask, vision_embeds=vis, mode="multimodal")
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state),
        np.asarray(ref.last_hidden_state),
        atol=1e-6,
    )
