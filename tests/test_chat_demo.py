"""VideoChat (QFormer bridge) + demo retrieve_text."""

import jax
import jax.numpy as jnp
import numpy as np

from internvideo_tpu.models.bert import BertConfig
from internvideo_tpu.models.chat import QFormerConfig, VideoChat, VideoChatConfig
from internvideo_tpu.models.internvideo2 import InternVideo2Config
from internvideo_tpu.models.llm import LLMConfig
from internvideo_tpu.nn.mla import MLAConfig
from internvideo_tpu.eval.demo import retrieve_text

CFG = VideoChatConfig(
    vision=InternVideo2Config(
        embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0,
        patch_size=14, img_size=28, num_frames=2, tubelet_size=1,
        clip_embed_dim=16, attn_impl="xla",
    ),
    qformer=QFormerConfig(
        num_queries=4,
        bert=BertConfig(
            vocab_size=16, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, fusion_layer=0, dropout=0.0,
            attn_impl="xla",
        ),
    ),
    llm=LLMConfig(
        vocab_size=120, hidden_size=48, num_layers=2, intermediate_size=96,
        mrope_section=None,
        mla=MLAConfig(
            hidden_size=48, num_heads=2, kv_lora_rank=24,
            qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8,
        ),
        attn_impl="xla",
    ),
)


def test_chat_forward_and_cached_decode():
    model = VideoChat(CFG)
    video = jax.random.normal(jax.random.key(0), (1, 2, 28, 28, 3))
    ids = jnp.array([[5, 9, 11]])
    params = model.init(jax.random.key(1), ids, video)
    out = model.apply(params, ids, video)
    nq = CFG.qformer.num_queries
    assert out.logits.shape == (1, nq + 3, 120)

    # cached prefill matches teacher-forcing logits at the last position
    caches = model.apply(params, 1, nq + 8, jnp.float32, method="init_cache")
    pre = model.apply(params, ids, video, caches, method="prefill")
    np.testing.assert_allclose(
        np.asarray(pre.logits[:, 0]), np.asarray(out.logits[:, -1]),
        atol=2e-4, rtol=1e-3,
    )
    # decode one step == full forward with one more token
    step = model.apply(
        params, jnp.array([[7]]), pre.caches, jnp.int32(nq + 3),
        method="decode_step",
    )
    full = model.apply(params, jnp.array([[5, 9, 11, 7]]), video)
    np.testing.assert_allclose(
        np.asarray(step.logits[:, 0]), np.asarray(full.logits[:, -1]),
        atol=2e-4, rtol=1e-3,
    )


def test_retrieve_text():
    frames = (np.random.rand(4, 40, 40, 3) * 255).astype(np.uint8)
    texts = ["a", "b", "c"]
    emb = {"a": [1, 0], "b": [0.9, 0.1], "c": [0, 1]}

    def encode_video(clip):
        return jnp.array([[1.0, 0.0]])

    def tokenize(ts):
        return ts

    def encode_text(ts):
        return jnp.array([emb[t] for t in ts], jnp.float32)

    top, probs = retrieve_text(
        frames, texts, encode_video=encode_video, encode_text=encode_text,
        tokenize=tokenize, topk=2, img_size=28,
    )
    assert top[0] == "a" and top[1] == "b"
    assert probs[0] > probs[1]


def test_videoqa_scoring():
    from internvideo_tpu.eval.videoqa import (
        evaluate_videoqa,
        exact_match,
        mcq_option,
        substring_match,
    )

    assert exact_match("The Cat!", ["the cat"])
    assert substring_match("i think it is a red car.", ["red car"])
    assert not exact_match("blue", ["red"])
    assert mcq_option("The answer is (B).") == "B"
    assert mcq_option("C") == "C"
    assert mcq_option("no option here") is None

    data = [{
        "answers": [["red car"], ["dog"]],
        "prompt": None,
    }]
    m = evaluate_videoqa(
        lambda b: ["a red car driving", "a cat"], data, matcher="substring"
    )
    assert m["accuracy"] == 50.0 and m["num"] == 2

    mcq_data = [{"option": ["a", "b"]}]
    m = evaluate_videoqa(
        lambda b: ["A", "the answer is B"], mcq_data, matcher="mcq"
    )
    assert m["accuracy"] == 100.0
