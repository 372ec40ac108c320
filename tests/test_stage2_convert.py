"""Full stage-2 VideoCLIP checkpoint bridge: a torch-named state dict
(vision_encoder pretrain tower + text_encoder HF-BERT + heads + temp)
converts to a tree that matches VideoCLIP's init structure exactly and
runs the model."""

import jax
import jax.numpy as jnp
import numpy as np
from flax.core import meta

from internvideo_tpu.models.bert import BertConfig
from internvideo_tpu.models.convert import convert_internvideo2_stage2
from internvideo_tpu.models.internvideo2 import InternVideo2Config
from internvideo_tpu.models.pretrain import PretrainConfig
from internvideo_tpu.models.videoclip import VideoCLIP, VideoCLIPConfig

D, DEPTH, HEADS = 32, 2, 2
TD, TL, TH, TI = 32, 2, 2, 64
CLIP_K, CLIP_OUT, CLIP_FIN = 2, 20, 16
EMBED = 16
PATCH, IMG, FRAMES = 8, 16, 2
VOCAB = 50


def _vision_sd(rng):
    n = (IMG // PATCH) ** 2 * FRAMES  # 8 patches
    sd = {
        "patch_embed.proj.weight": rng.standard_normal(
            (D, 3, 1, PATCH, PATCH)).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(D, np.float32),
        "cls_token": rng.standard_normal((1, 1, D)).astype(np.float32) * 0.02,
        "pos_embed": rng.standard_normal((1, 1 + n, D)).astype(np.float32),
        "clip_pos_embed": rng.standard_normal(
            (1, 1 + n, D)).astype(np.float32),
    }
    for i in range(DEPTH):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = np.ones(D, np.float32)
        sd[f"{b}.norm2.weight"] = np.ones(D, np.float32)
        sd[f"{b}.attn.qkv.weight"] = rng.standard_normal(
            (3 * D, D)).astype(np.float32) * 0.02
        sd[f"{b}.attn.proj.weight"] = rng.standard_normal(
            (D, D)).astype(np.float32) * 0.02
        sd[f"{b}.attn.proj.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.attn.q_norm.weight"] = np.ones(D, np.float32)
        sd[f"{b}.attn.k_norm.weight"] = np.ones(D, np.float32)
        sd[f"{b}.ls1.gamma"] = np.full(D, 0.1, np.float32)
        sd[f"{b}.ls2.gamma"] = np.full(D, 0.1, np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.standard_normal(
            (2 * D, D)).astype(np.float32) * 0.02
        sd[f"{b}.mlp.fc1.bias"] = np.zeros(2 * D, np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.standard_normal(
            (D, 2 * D)).astype(np.float32) * 0.02
        sd[f"{b}.mlp.fc2.bias"] = np.zeros(D, np.float32)
    # attention pooling projector
    cp = "clip_projector"
    for nm in ("q", "k", "v"):
        sd[f"{cp}.cross_attn.{nm}.weight"] = rng.standard_normal(
            (D, D)).astype(np.float32) * 0.02
        sd[f"{cp}.cross_attn.{nm}_bias"] = np.zeros(D, np.float32)
    sd[f"{cp}.cross_attn.proj.weight"] = rng.standard_normal(
        (CLIP_FIN, D)).astype(np.float32) * 0.02
    sd[f"{cp}.cross_attn.proj.bias"] = np.zeros(CLIP_FIN, np.float32)
    for nm in ("norm1_q", "norm1_k", "norm1_v"):
        sd[f"{cp}.{nm}.weight"] = np.ones(D, np.float32)
        sd[f"{cp}.{nm}.bias"] = np.zeros(D, np.float32)
    # CLIP-align decoders (stage-2 tower keeps them)
    for j in range(CLIP_K):
        sd[f"clip_decoder.{j}.head.weight"] = rng.standard_normal(
            (CLIP_OUT, D)).astype(np.float32) * 0.02
        sd[f"clip_decoder.{j}.head.bias"] = np.zeros(CLIP_OUT, np.float32)
        sd[f"clip_decoder.{j}.norm.weight"] = np.ones(CLIP_OUT, np.float32)
        sd[f"clip_decoder.{j}.norm.bias"] = np.zeros(CLIP_OUT, np.float32)
    sd["final_clip_decoder.head.weight"] = rng.standard_normal(
        (CLIP_FIN, CLIP_FIN)).astype(np.float32) * 0.02
    sd["final_clip_decoder.head.bias"] = np.zeros(CLIP_FIN, np.float32)
    sd["final_clip_decoder.norm.weight"] = np.ones(CLIP_FIN, np.float32)
    sd["final_clip_decoder.norm.bias"] = np.zeros(CLIP_FIN, np.float32)
    return sd


def _bert_sd(rng, fusion_layer=1):
    def lin(o, i):
        return rng.standard_normal((o, i)).astype(np.float32) * 0.02

    sd = {
        "bert.embeddings.word_embeddings.weight": lin(VOCAB, TD).copy(),
        "bert.embeddings.position_embeddings.weight": lin(64, TD),
        "bert.embeddings.token_type_embeddings.weight": lin(2, TD),
        "bert.embeddings.LayerNorm.weight": np.ones(TD, np.float32),
        "bert.embeddings.LayerNorm.bias": np.zeros(TD, np.float32),
    }
    for i in range(TL):
        b = f"bert.encoder.layer.{i}"
        for part in ("attention.self.query", "attention.self.key",
                     "attention.self.value", "attention.output.dense"):
            sd[f"{b}.{part}.weight"] = lin(TD, TD)
            sd[f"{b}.{part}.bias"] = np.zeros(TD, np.float32)
        sd[f"{b}.attention.output.LayerNorm.weight"] = np.ones(TD, np.float32)
        sd[f"{b}.attention.output.LayerNorm.bias"] = np.zeros(TD, np.float32)
        if i >= fusion_layer:
            for part in ("crossattention.self.query",
                         "crossattention.self.key",
                         "crossattention.self.value",
                         "crossattention.output.dense"):
                o, inn = (TD, TD)
                sd[f"{b}.{part}.weight"] = lin(o, inn)
                sd[f"{b}.{part}.bias"] = np.zeros(o, np.float32)
            sd[f"{b}.crossattention.output.LayerNorm.weight"] = np.ones(
                TD, np.float32)
            sd[f"{b}.crossattention.output.LayerNorm.bias"] = np.zeros(
                TD, np.float32)
        sd[f"{b}.intermediate.dense.weight"] = lin(TI, TD)
        sd[f"{b}.intermediate.dense.bias"] = np.zeros(TI, np.float32)
        sd[f"{b}.output.dense.weight"] = lin(TD, TI)
        sd[f"{b}.output.dense.bias"] = np.zeros(TD, np.float32)
        sd[f"{b}.output.LayerNorm.weight"] = np.ones(TD, np.float32)
        sd[f"{b}.output.LayerNorm.bias"] = np.zeros(TD, np.float32)
    sd["cls.predictions.transform.dense.weight"] = lin(TD, TD)
    sd["cls.predictions.transform.dense.bias"] = np.zeros(TD, np.float32)
    sd["cls.predictions.transform.LayerNorm.weight"] = np.ones(TD, np.float32)
    sd["cls.predictions.transform.LayerNorm.bias"] = np.zeros(TD, np.float32)
    sd["cls.predictions.decoder.weight"] = lin(VOCAB, TD)
    sd["cls.predictions.bias"] = np.zeros(VOCAB, np.float32)
    return sd


def test_stage2_checkpoint_converts_and_runs():
    rng = np.random.default_rng(0)
    sd = {}
    for k, v in _vision_sd(rng).items():
        sd[f"vision_encoder.{k}"] = v
    for k, v in _bert_sd(rng).items():
        sd[f"text_encoder.{k}"] = v
    sd["vision_proj.weight"] = rng.standard_normal(
        (EMBED, CLIP_FIN)).astype(np.float32) * 0.02
    sd["vision_proj.bias"] = np.zeros(EMBED, np.float32)
    sd["text_proj.weight"] = rng.standard_normal(
        (EMBED, TD)).astype(np.float32) * 0.02
    sd["text_proj.bias"] = np.zeros(EMBED, np.float32)
    sd["itm_head.weight"] = rng.standard_normal(
        (2, TD)).astype(np.float32) * 0.02
    sd["itm_head.bias"] = np.zeros(2, np.float32)
    sd["temp"] = np.asarray(0.07, np.float32)

    params = convert_internvideo2_stage2(
        sd, depth=DEPTH, clip_return_layers=CLIP_K, text_layers=TL
    )

    enc = InternVideo2Config(
        embed_dim=D, depth=DEPTH, num_heads=HEADS, mlp_ratio=2.0,
        patch_size=PATCH, img_size=IMG, num_frames=FRAMES, tubelet_size=1,
        clip_embed_dim=CLIP_FIN, num_classes=0, attn_impl="xla",
    )
    cfg = VideoCLIPConfig(
        vision=enc,
        pretrain=PretrainConfig(
            encoder=enc, clip_output_dim=CLIP_OUT,
            clip_final_output_dim=CLIP_FIN, clip_return_layers=CLIP_K,
            mae_return_layers=0,
        ),
        text=BertConfig(
            vocab_size=VOCAB, hidden_size=TD, num_layers=TL, num_heads=TH,
            intermediate_size=TI, fusion_layer=1,
            max_position_embeddings=64,
        ),
        embed_dim=EMBED,
    )
    model = VideoCLIP(cfg)
    video = jnp.zeros((2, FRAMES, IMG, IMG, 3))
    ids = jnp.zeros((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    expected = meta.unbox(
        model.init(
            jax.random.key(0), video, ids, mask, init_all_branches=True
        )
    )

    # structural equality: every expected leaf exists with the right shape
    exp_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(expected)[0]
    }
    got_paths = {
        jax.tree_util.keystr(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    missing = set(exp_paths) - set(got_paths)
    extra = set(got_paths) - set(exp_paths)
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]
    for k in exp_paths:
        assert exp_paths[k] == got_paths[k], (k, exp_paths[k], got_paths[k])

    out = model.apply(params, video, ids, mask)
    assert out.vision_proj.shape == (2, EMBED)
    assert np.isfinite(float(jnp.sum(out.text_proj)))
