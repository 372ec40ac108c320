"""Synthetic reference-named stage-2 state dicts (test + verify fixture)."""

import numpy as np


def make_stage2_state_dict(
    rng, *, d, depth, patch, img, frames, clip_k, clip_out, clip_fin,
    td, tl, ti, fusion_layer, vocab, embed, max_pos=512,
):
    sd = {}
    n = (img // patch) ** 2 * frames

    def lin(o, i):
        return rng.standard_normal((o, i)).astype(np.float32) * 0.02

    v = {
        "patch_embed.proj.weight": rng.standard_normal(
            (d, 3, 1, patch, patch)).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(d, np.float32),
        "cls_token": rng.standard_normal((1, 1, d)).astype(np.float32) * 0.02,
        "pos_embed": rng.standard_normal((1, 1 + n, d)).astype(np.float32),
        "clip_pos_embed": rng.standard_normal(
            (1, 1 + n, d)).astype(np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        v[f"{b}.norm1.weight"] = np.ones(d, np.float32)
        v[f"{b}.norm2.weight"] = np.ones(d, np.float32)
        v[f"{b}.attn.qkv.weight"] = lin(3 * d, d)
        v[f"{b}.attn.proj.weight"] = lin(d, d)
        v[f"{b}.attn.proj.bias"] = np.zeros(d, np.float32)
        v[f"{b}.attn.q_norm.weight"] = np.ones(d, np.float32)
        v[f"{b}.attn.k_norm.weight"] = np.ones(d, np.float32)
        v[f"{b}.ls1.gamma"] = np.full(d, 0.1, np.float32)
        v[f"{b}.ls2.gamma"] = np.full(d, 0.1, np.float32)
        v[f"{b}.mlp.fc1.weight"] = lin(2 * d, d)
        v[f"{b}.mlp.fc1.bias"] = np.zeros(2 * d, np.float32)
        v[f"{b}.mlp.fc2.weight"] = lin(d, 2 * d)
        v[f"{b}.mlp.fc2.bias"] = np.zeros(d, np.float32)
    cp = "clip_projector"
    for nm in ("q", "k", "v"):
        v[f"{cp}.cross_attn.{nm}.weight"] = lin(d, d)
        v[f"{cp}.cross_attn.{nm}_bias"] = np.zeros(d, np.float32)
    v[f"{cp}.cross_attn.proj.weight"] = lin(clip_fin, d)
    v[f"{cp}.cross_attn.proj.bias"] = np.zeros(clip_fin, np.float32)
    for nm in ("norm1_q", "norm1_k", "norm1_v"):
        v[f"{cp}.{nm}.weight"] = np.ones(d, np.float32)
        v[f"{cp}.{nm}.bias"] = np.zeros(d, np.float32)
    for j in range(clip_k):
        v[f"clip_decoder.{j}.head.weight"] = lin(clip_out, d)
        v[f"clip_decoder.{j}.head.bias"] = np.zeros(clip_out, np.float32)
        v[f"clip_decoder.{j}.norm.weight"] = np.ones(clip_out, np.float32)
        v[f"clip_decoder.{j}.norm.bias"] = np.zeros(clip_out, np.float32)
    v["final_clip_decoder.head.weight"] = lin(clip_fin, clip_fin)
    v["final_clip_decoder.head.bias"] = np.zeros(clip_fin, np.float32)
    v["final_clip_decoder.norm.weight"] = np.ones(clip_fin, np.float32)
    v["final_clip_decoder.norm.bias"] = np.zeros(clip_fin, np.float32)
    for k, val in v.items():
        sd[f"vision_encoder.{k}"] = val

    t = {
        "bert.embeddings.word_embeddings.weight": lin(vocab, td),
        "bert.embeddings.position_embeddings.weight": lin(max_pos, td),
        "bert.embeddings.token_type_embeddings.weight": lin(2, td),
        "bert.embeddings.LayerNorm.weight": np.ones(td, np.float32),
        "bert.embeddings.LayerNorm.bias": np.zeros(td, np.float32),
    }
    for i in range(tl):
        b = f"bert.encoder.layer.{i}"
        for part in ("attention.self.query", "attention.self.key",
                     "attention.self.value", "attention.output.dense"):
            t[f"{b}.{part}.weight"] = lin(td, td)
            t[f"{b}.{part}.bias"] = np.zeros(td, np.float32)
        t[f"{b}.attention.output.LayerNorm.weight"] = np.ones(td, np.float32)
        t[f"{b}.attention.output.LayerNorm.bias"] = np.zeros(td, np.float32)
        if i >= fusion_layer:
            for part in ("crossattention.self.query",
                         "crossattention.self.key",
                         "crossattention.self.value",
                         "crossattention.output.dense"):
                t[f"{b}.{part}.weight"] = lin(td, td)
                t[f"{b}.{part}.bias"] = np.zeros(td, np.float32)
            t[f"{b}.crossattention.output.LayerNorm.weight"] = np.ones(
                td, np.float32)
            t[f"{b}.crossattention.output.LayerNorm.bias"] = np.zeros(
                td, np.float32)
        t[f"{b}.intermediate.dense.weight"] = lin(ti, td)
        t[f"{b}.intermediate.dense.bias"] = np.zeros(ti, np.float32)
        t[f"{b}.output.dense.weight"] = lin(td, ti)
        t[f"{b}.output.dense.bias"] = np.zeros(td, np.float32)
        t[f"{b}.output.LayerNorm.weight"] = np.ones(td, np.float32)
        t[f"{b}.output.LayerNorm.bias"] = np.zeros(td, np.float32)
    t["cls.predictions.transform.dense.weight"] = lin(td, td)
    t["cls.predictions.transform.dense.bias"] = np.zeros(td, np.float32)
    t["cls.predictions.transform.LayerNorm.weight"] = np.ones(td, np.float32)
    t["cls.predictions.transform.LayerNorm.bias"] = np.zeros(td, np.float32)
    t["cls.predictions.decoder.weight"] = lin(vocab, td)
    t["cls.predictions.bias"] = np.zeros(vocab, np.float32)
    for k, val in t.items():
        sd[f"text_encoder.{k}"] = val

    sd["vision_proj.weight"] = lin(embed, clip_fin)
    sd["vision_proj.bias"] = np.zeros(embed, np.float32)
    sd["text_proj.weight"] = lin(embed, td)
    sd["text_proj.bias"] = np.zeros(embed, np.float32)
    sd["itm_head.weight"] = lin(2, td)
    sd["itm_head.bias"] = np.zeros(2, np.float32)
    sd["temp"] = np.asarray(0.07, np.float32)
    return sd
