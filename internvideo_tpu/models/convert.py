"""Weight bridge: reference PyTorch state_dicts → flax param pytrees.

Covers the InternVideo2 single-modality encoder naming scheme
(InternVideo2/single_modality/models/internvideo2.py) so published
checkpoints load directly. Tensors arrive as numpy arrays (from
`torch.Tensor.numpy()` or a safetensors reader) — torch itself is only
needed by the caller.

Key layout translations (torch → flax):
  * Linear weight (out, in)            → kernel (in, out)       [transpose]
  * fused qkv weight (3D, D)           → flat Dense kernel (D, 3D)
  * Conv3d patchify (D, C, kt, kh, kw) → Dense ((kt kh kw C), D)
    with patch-content flattened in (kt, kh, kw, C) order to match
    PatchEmbed3D's reshape.
  * LayerNorm weight/bias              → scale/bias
"""

from __future__ import annotations

from typing import Callable, Mapping

import numpy as np


def _linear(sd, prefix):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _rmsnorm(sd, prefix):
    return {"weight": sd[f"{prefix}.weight"]}


def convert_internvideo2_encoder(
    sd: Mapping[str, np.ndarray],
    *,
    depth: int,
    prefix: str = "",
) -> dict:
    """Convert a reference InternVideo2 encoder state_dict to flax params."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    p: dict = {}

    w = sd["patch_embed.proj.weight"]  # (D, C, kt, kh, kw)
    d = w.shape[0]
    kernel = np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0).reshape(-1, d))
    p["patch_embed"] = {"proj": {"kernel": kernel}}
    if "patch_embed.proj.bias" in sd:
        p["patch_embed"]["proj"]["bias"] = sd["patch_embed.proj.bias"]

    p["cls_token"] = sd["cls_token"]
    if "pos_embed" in sd:
        p["pos_embed"] = sd["pos_embed"][0]  # drop leading broadcast dim

    for i in range(depth):
        b = f"blocks.{i}"
        blk = {
            "norm1": _rmsnorm(sd, f"{b}.norm1"),
            "norm2": _rmsnorm(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            },
        }
        qkv_w = sd[f"{b}.attn.qkv.weight"]  # (3D, D)
        attn = {
            "qkv": {"kernel": np.ascontiguousarray(qkv_w.T)},  # (D, 3D) flat
            "proj": _linear(sd, f"{b}.attn.proj"),
        }
        if f"{b}.attn.qkv.bias" in sd:
            attn["qkv"]["bias"] = sd[f"{b}.attn.qkv.bias"]
        if f"{b}.attn.q_norm.weight" in sd:
            attn["q_norm"] = _rmsnorm(sd, f"{b}.attn.q_norm")
            attn["k_norm"] = _rmsnorm(sd, f"{b}.attn.k_norm")
        blk["attn"] = attn
        if f"{b}.ls1.gamma" in sd:
            blk["ls1"] = {"gamma": sd[f"{b}.ls1.gamma"]}
            blk["ls2"] = {"gamma": sd[f"{b}.ls2.gamma"]}
        p[f"blocks_{i}"] = blk

    if "clip_projector.norm1_q.weight" in sd:
        cp = "clip_projector"
        cross = {
            "q": _linear(sd, f"{cp}.cross_attn.q"),
            "k": _linear(sd, f"{cp}.cross_attn.k"),
            "v": _linear(sd, f"{cp}.cross_attn.v"),
            "proj": _linear(sd, f"{cp}.cross_attn.proj"),
        }
        # reference keeps q/k/v biases as separate Parameters (q_bias, ...)
        for name in ("q", "k", "v"):
            bias_key = f"{cp}.cross_attn.{name}_bias"
            if bias_key in sd:
                cross[name]["bias"] = sd[bias_key]
        p["clip_projector"] = {
            "norm1_q": _layernorm(sd, f"{cp}.norm1_q"),
            "norm1_k": _layernorm(sd, f"{cp}.norm1_k"),
            "norm1_v": _layernorm(sd, f"{cp}.norm1_v"),
            "cross_attn": cross,
        }

    if "fc_norm.weight" in sd:
        p["fc_norm"] = _layernorm(sd, "fc_norm")
    if "head.weight" in sd:
        p["head"] = _linear(sd, "head")
    return {"params": p}


def torch_state_dict_to_numpy(state_dict) -> dict[str, np.ndarray]:
    """Detach a torch state_dict to fp32 numpy (host-side, no device deps)."""
    return {
        k: v.detach().to("cpu").float().numpy() for k, v in state_dict.items()
    }


# ---------------------------------------------------------------------------
# Frozen teachers (UMT masked-distillation pretraining)
# ---------------------------------------------------------------------------


def convert_internvl_clip_teacher(
    sd: Mapping[str, np.ndarray], *, depth: int
) -> dict:
    """internvl_clip_vision.py InternVL_CLIP state_dict -> CLIPTeacher params.

    The torch teacher shares the InternVideo2 encoder naming (patch_embed /
    blocks.N / clip_projector), so this nests the encoder conversion under
    CLIPTeacher's `encoder` submodule.
    """
    enc = convert_internvideo2_encoder(sd, depth=depth)["params"]
    return {"params": {"encoder": enc}}


def convert_videomae_teacher(
    sd: Mapping[str, np.ndarray], *, depth: int,
    num_patches: "int | None" = None,
) -> dict:
    """videomae.py VisionTransformer state_dict -> MAETeacher params.

    Layout notes: no cls token; `pos_embed` is the (1, N, D) sinusoid table;
    attention bias is the reference's (q_bias, zeros, v_bias) trick
    (videomae.py:86-91) reassembled into the fused (3, D) qkv bias;
    gamma_1/gamma_2 map to ls1/ls2 LayerScale.
    """
    p: dict = {}
    w = sd["patch_embed.proj.weight"]  # (D, C, kt, kh, kw)
    d = w.shape[0]
    kernel = np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0).reshape(-1, d))
    p["patch_embed"] = {"proj": {"kernel": kernel}}
    if "patch_embed.proj.bias" in sd:
        p["patch_embed"]["proj"]["bias"] = sd["patch_embed.proj.bias"]
    if "pos_embed" in sd:
        p["pos_embed"] = sd["pos_embed"][0]  # drop leading broadcast dim
    elif num_patches is not None:
        # when the checkpoint grid matches the pre-computed table the torch
        # module keeps a plain (non-state-dict) tensor == the raw sinusoid
        from internvideo_tpu.models.teachers import sinusoid_table_1d

        p["pos_embed"] = np.asarray(sinusoid_table_1d(num_patches, d))

    for i in range(depth):
        b = f"blocks.{i}"
        qkv_w = sd[f"{b}.attn.qkv.weight"]  # (3D, D)
        attn = {
            "qkv": {"kernel": np.ascontiguousarray(qkv_w.T)},  # (D, 3D) flat
            "proj": _linear(sd, f"{b}.attn.proj"),
        }
        if f"{b}.attn.q_bias" in sd:
            attn["qkv"]["bias"] = np.concatenate(
                [
                    sd[f"{b}.attn.q_bias"],
                    np.zeros_like(sd[f"{b}.attn.q_bias"]),
                    sd[f"{b}.attn.v_bias"],
                ]
            )
        blk = {
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "attn": attn,
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            },
        }
        if f"{b}.gamma_1" in sd:
            blk["ls1"] = {"gamma": sd[f"{b}.gamma_1"]}
            blk["ls2"] = {"gamma": sd[f"{b}.gamma_2"]}
        p[f"blocks_{i}"] = blk

    p["norm"] = _layernorm(sd, "norm")
    return {"params": p}


# ---------------------------------------------------------------------------
# Stage-2 VideoCLIP full checkpoint -> models/videoclip.VideoCLIP
# ---------------------------------------------------------------------------


def convert_internvideo2_stage2(
    sd: Mapping[str, np.ndarray],
    *,
    depth: int,
    clip_return_layers: int,
    text_layers: int,
) -> dict:
    """Full stage-2 checkpoint (internvideo2_stage2_visual.py:32-44 naming:
    vision_encoder.* masked pretrain tower, text_encoder.* HF-BERT fusion
    tower, vision_proj/text_proj/itm_head linears, temp scalar) -> VideoCLIP
    params. Published Stage2-1B/6B checkpoints load through this."""
    vis_sd = {
        k[len("vision_encoder."):]: v
        for k, v in sd.items() if k.startswith("vision_encoder.")
    }
    txt_sd = {
        k[len("text_encoder."):]: v
        for k, v in sd.items() if k.startswith("text_encoder.")
    }
    p: dict = {
        "vision_encoder": convert_internvideo2_pretrain(
            vis_sd, depth=depth, clip_return_layers=clip_return_layers,
            mae_return_layers=0,
        )["params"],
        "text_encoder": convert_hf_bert(
            txt_sd, num_layers=text_layers, prefix="bert."
        )["params"],
        "vision_proj": _linear(sd, "vision_proj"),
        "text_proj": _linear(sd, "text_proj"),
        "itm_head": _linear(sd, "itm_head"),
        "temp": np.asarray(sd["temp"]),
    }
    return {"params": p}


# ---------------------------------------------------------------------------
# MobileCLIP text tower -> models/text_encoders.CLIPTextEncoder
# ---------------------------------------------------------------------------


def convert_mobileclip_text(
    sd: Mapping[str, np.ndarray], *, num_layers: int,
) -> dict:
    """mobileclip/text_encoder.py TextTransformer state_dict (base variant)
    -> CLIPTextEncoder params. Naming: pre_norm_mha.0 = LN, .1 = MHA with
    fused qkv_proj; pre_norm_ffn.0/.1/.4 = LN/fc1/fc2; the learnable pos
    table lives at positional_embedding.pos_embed.pos_embed (1,1,CL,D)."""
    d = sd["embedding_layer.weight"].shape[1]
    p: dict = {
        "token_embedding": {"embedding": sd["embedding_layer.weight"]},
        "positional_embedding": sd[
            "positional_embedding.pos_embed.pos_embed"
        ].reshape(-1, d),
        "ln_final": _layernorm(sd, "final_layer_norm"),
        "text_projection": sd["projection_layer"],
    }
    for i in range(num_layers):
        b = f"transformer.{i}"
        qkv_w = sd[f"{b}.pre_norm_mha.1.qkv_proj.weight"]  # (3D, D)
        p[f"attn_qkv_{i}"] = {
            "kernel": np.ascontiguousarray(qkv_w.T).reshape(d, 3, d),
            "bias": sd[f"{b}.pre_norm_mha.1.qkv_proj.bias"].reshape(3, d),
        }
        p[f"ln_1_{i}"] = _layernorm(sd, f"{b}.pre_norm_mha.0")
        p[f"attn_proj_{i}"] = _linear(sd, f"{b}.pre_norm_mha.1.out_proj")
        p[f"ln_2_{i}"] = _layernorm(sd, f"{b}.pre_norm_ffn.0")
        p[f"mlp_fc_{i}"] = _linear(sd, f"{b}.pre_norm_ffn.1")
        p[f"mlp_proj_{i}"] = _linear(sd, f"{b}.pre_norm_ffn.4")
    return {"params": p}


# ---------------------------------------------------------------------------
# ViCLIP (Data/InternVid/viclip) -> models/viclip.ViCLIP
# ---------------------------------------------------------------------------


def _interp_rows(table: np.ndarray, new_len: int) -> np.ndarray:
    """Linear interpolation along axis 0 (reference
    load_temp_embed_with_mismatch add_zero=False, viclip_vision.py:18-42)."""
    old = table.shape[0]
    if old == new_len:
        return table
    pos = np.linspace(0, old - 1, new_len)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, old - 1)
    frac = (pos - lo)[:, None]
    return (1 - frac) * table[lo] + frac * table[hi]


def convert_viclip_vision(
    sd: Mapping[str, np.ndarray], *, depth: int, prefix: str = "",
    num_frames: int | None = None,
) -> dict:
    """viclip_vision.py VisionTransformer state_dict -> InternVideo2 params
    (viclip preset: ln_pre, cls_proj pool, no LayerScale/qk-norm).

    Pos embed: the reference adds spatial PE per frame and temporal PE per
    patch (viclip_vision.py:162-180); both fold into our single
    (1 + T*N, D) table — row[1 + t*N + n] = spatial[1+n] + temporal[t]
    (our token order is time-major; joint attention is order-invariant,
    so only the table layout must match our own ordering). `num_frames`
    interpolates the temporal rows when the target frame budget differs
    from the checkpoint's (interpolate_pos_embed_vit surgery,
    viclip_vision.py:316-326).
    """
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    w = sd["conv1.weight"]  # (D, 3, kt, p, p), bias-free in the reference
    d = w.shape[0]
    p: dict = {
        "patch_embed": {"proj": {
            "kernel": np.ascontiguousarray(
                w.transpose(2, 3, 4, 1, 0).reshape(-1, d)
            ),
            "bias": np.zeros(d, w.dtype),
        }},
        "cls_token": sd["class_embedding"].reshape(1, 1, d),
        "ln_pre": _layernorm(sd, "ln_pre"),
        "ln_post": _layernorm(sd, "ln_post"),
        "proj": sd["proj"],  # used as x @ proj in both frameworks
    }
    spatial = sd["positional_embedding"]  # (N+1, D)
    temporal = sd["temporal_positional_embedding"][0]  # (T, D)
    if num_frames is not None:
        temporal = _interp_rows(temporal, num_frames)
    grid = spatial[None, 1:, :] + temporal[:, None, :]  # (T, N, D)
    p["pos_embed"] = np.concatenate(
        [spatial[:1], grid.reshape(-1, d)], axis=0
    )
    for i in range(depth):
        b = f"transformer.resblocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{b}.ln_1"),
            "norm2": _layernorm(sd, f"{b}.ln_2"),
            "attn": {
                "qkv": {
                    "kernel": np.ascontiguousarray(
                        sd[f"{b}.attn.in_proj_weight"].T
                    ),
                    "bias": sd[f"{b}.attn.in_proj_bias"],
                },
                "proj": _linear(sd, f"{b}.attn.out_proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.c_fc"),
                "fc2": _linear(sd, f"{b}.mlp.c_proj"),
            },
        }
    return {"params": p}


def convert_clip_text(
    sd: Mapping[str, np.ndarray], *, num_layers: int, prefix: str = "",
) -> dict:
    """OpenAI-CLIP text transformer state_dict (viclip_text.py CLIP_TEXT)
    -> CLIPTextEncoder params."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    w = sd["token_embedding.weight"]
    d = w.shape[1]
    p: dict = {
        "token_embedding": {"embedding": w},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": _layernorm(sd, "ln_final"),
        "text_projection": sd["text_projection"],
    }
    for i in range(num_layers):
        b = f"transformer.resblocks.{i}"
        p[f"attn_qkv_{i}"] = {
            "kernel": np.ascontiguousarray(
                sd[f"{b}.attn.in_proj_weight"].T
            ).reshape(d, 3, d),
            "bias": sd[f"{b}.attn.in_proj_bias"].reshape(3, d),
        }
        p[f"attn_proj_{i}"] = _linear(sd, f"{b}.attn.out_proj")
        p[f"ln_1_{i}"] = _layernorm(sd, f"{b}.ln_1")
        p[f"ln_2_{i}"] = _layernorm(sd, f"{b}.ln_2")
        p[f"mlp_fc_{i}"] = _linear(sd, f"{b}.mlp.c_fc")
        p[f"mlp_proj_{i}"] = _linear(sd, f"{b}.mlp.c_proj")
    return {"params": p}


def _count_resblocks(sd: Mapping, prefix: str) -> int:
    import re

    pat = re.compile(re.escape(prefix) + r"transformer\.resblocks\.(\d+)\.")
    idx = [int(m.group(1)) for k in sd for m in [pat.match(k)] if m]
    if not idx:
        raise KeyError(f"no {prefix}transformer.resblocks.* keys in checkpoint")
    return max(idx) + 1


def convert_viclip(
    sd: Mapping[str, np.ndarray],
    *,
    depth: int | None = None,
    text_layers: int | None = None,
    num_frames: int | None = None,
) -> dict:
    """Full ViCLIP checkpoint (viclip.py:17-90 `state_dict['model']`) ->
    models/viclip.ViCLIP params (viclip_config preset, use_vision_proj=
    False). Tower depths are inferred from the checkpoint's resblock keys
    unless given. `temp` is a plain temperature clamped at 1/100; our
    model stores log-scale, so logit_scale = ln(1/temp)."""
    if depth is None:
        depth = _count_resblocks(sd, "vision_encoder.")
    if text_layers is None:
        text_layers = _count_resblocks(sd, "text_encoder.")
    p = {
        "vision_encoder": convert_viclip_vision(
            sd, depth=depth, prefix="vision_encoder.",
            num_frames=num_frames,
        )["params"],
        "text_encoder": convert_clip_text(
            sd, num_layers=text_layers, prefix="text_encoder."
        )["params"],
        "logit_scale": np.log(1.0 / np.asarray(sd["temp"], np.float32)),
    }
    return {"params": p}


# ---------------------------------------------------------------------------
# BERT (HF naming) -> models/bert.BertModel
# ---------------------------------------------------------------------------


def convert_hf_bert(
    sd: Mapping[str, np.ndarray],
    *,
    num_layers: int,
    prefix: str = "bert.",
) -> dict:
    """HF bert-base-style state_dict -> flax params for BertModel.

    Handles the fusion variants' crossattention weights (the reference's
    xbert checkpoints use standard HF naming with `crossattention` blocks).
    MLM heads live under `cls.predictions.*` at the top level.
    """
    def g(key):
        for cand in (prefix + key, key):
            if cand in sd:
                return sd[cand]
        raise KeyError(prefix + key)

    def has(key):
        return (prefix + key) in sd or key in sd

    p: dict = {
        "word_embeddings": {
            "embedding": g("embeddings.word_embeddings.weight")
        },
        "position_embeddings": {
            "embedding": g("embeddings.position_embeddings.weight")
        },
        "token_type_embeddings": {
            "embedding": g("embeddings.token_type_embeddings.weight")
        },
        "embeddings_norm": {
            "scale": g("embeddings.LayerNorm.weight"),
            "bias": g("embeddings.LayerNorm.bias"),
        },
    }
    for i in range(num_layers):
        b = f"encoder.layer.{i}"
        layer = {
            "attention": {
                "query": _linear_hf(g, f"{b}.attention.self.query"),
                "key": _linear_hf(g, f"{b}.attention.self.key"),
                "value": _linear_hf(g, f"{b}.attention.self.value"),
                "proj": _linear_hf(g, f"{b}.attention.output.dense"),
            },
            "attention_norm": {
                "scale": g(f"{b}.attention.output.LayerNorm.weight"),
                "bias": g(f"{b}.attention.output.LayerNorm.bias"),
            },
            "intermediate": _linear_hf(g, f"{b}.intermediate.dense"),
            "output": _linear_hf(g, f"{b}.output.dense"),
            "output_norm": {
                "scale": g(f"{b}.output.LayerNorm.weight"),
                "bias": g(f"{b}.output.LayerNorm.bias"),
            },
        }
        if has(f"{b}.crossattention.self.query.weight"):
            layer["crossattention"] = {
                "query": _linear_hf(g, f"{b}.crossattention.self.query"),
                "key": _linear_hf(g, f"{b}.crossattention.self.key"),
                "value": _linear_hf(g, f"{b}.crossattention.self.value"),
                "proj": _linear_hf(g, f"{b}.crossattention.output.dense"),
            }
            layer["crossattention_norm"] = {
                "scale": g(f"{b}.crossattention.output.LayerNorm.weight"),
                "bias": g(f"{b}.crossattention.output.LayerNorm.bias"),
            }
        p[f"layer_{i}"] = layer

    if "cls.predictions.transform.dense.weight" in sd:
        p["mlm_transform"] = _linear_hf(
            lambda k: sd[k], "cls.predictions.transform.dense"
        )
        p["mlm_norm"] = {
            "scale": sd["cls.predictions.transform.LayerNorm.weight"],
            "bias": sd["cls.predictions.transform.LayerNorm.bias"],
        }
        dec = {"kernel": np.ascontiguousarray(
            sd["cls.predictions.decoder.weight"].T
        )}
        if "cls.predictions.bias" in sd:
            dec["bias"] = sd["cls.predictions.bias"]
        elif "cls.predictions.decoder.bias" in sd:
            dec["bias"] = sd["cls.predictions.decoder.bias"]
        p["mlm_decoder"] = dec
    return {"params": p}


def _linear_hf(g, key):
    out = {"kernel": np.ascontiguousarray(g(f"{key}.weight").T)}
    try:
        out["bias"] = g(f"{key}.bias")
    except KeyError:
        pass
    return out


def export_bert_to_hf(params: Mapping, num_layers: int, prefix: str = "bert."):
    """Inverse of convert_hf_bert (for HF-format checkpoint export)."""
    p = params.get("params", params)
    sd: dict[str, np.ndarray] = {}

    def put_linear(key, node):
        sd[key + ".weight"] = np.ascontiguousarray(np.asarray(node["kernel"]).T)
        if "bias" in node:
            sd[key + ".bias"] = np.asarray(node["bias"])

    sd[prefix + "embeddings.word_embeddings.weight"] = np.asarray(
        p["word_embeddings"]["embedding"])
    sd[prefix + "embeddings.position_embeddings.weight"] = np.asarray(
        p["position_embeddings"]["embedding"])
    sd[prefix + "embeddings.token_type_embeddings.weight"] = np.asarray(
        p["token_type_embeddings"]["embedding"])
    sd[prefix + "embeddings.LayerNorm.weight"] = np.asarray(
        p["embeddings_norm"]["scale"])
    sd[prefix + "embeddings.LayerNorm.bias"] = np.asarray(
        p["embeddings_norm"]["bias"])
    for i in range(num_layers):
        lp = p[f"layer_{i}"]
        b = f"{prefix}encoder.layer.{i}"
        put_linear(f"{b}.attention.self.query", lp["attention"]["query"])
        put_linear(f"{b}.attention.self.key", lp["attention"]["key"])
        put_linear(f"{b}.attention.self.value", lp["attention"]["value"])
        put_linear(f"{b}.attention.output.dense", lp["attention"]["proj"])
        sd[f"{b}.attention.output.LayerNorm.weight"] = np.asarray(
            lp["attention_norm"]["scale"])
        sd[f"{b}.attention.output.LayerNorm.bias"] = np.asarray(
            lp["attention_norm"]["bias"])
        if "crossattention" in lp:
            put_linear(f"{b}.crossattention.self.query",
                       lp["crossattention"]["query"])
            put_linear(f"{b}.crossattention.self.key",
                       lp["crossattention"]["key"])
            put_linear(f"{b}.crossattention.self.value",
                       lp["crossattention"]["value"])
            put_linear(f"{b}.crossattention.output.dense",
                       lp["crossattention"]["proj"])
            sd[f"{b}.crossattention.output.LayerNorm.weight"] = np.asarray(
                lp["crossattention_norm"]["scale"])
            sd[f"{b}.crossattention.output.LayerNorm.bias"] = np.asarray(
                lp["crossattention_norm"]["bias"])
        put_linear(f"{b}.intermediate.dense", lp["intermediate"])
        put_linear(f"{b}.output.dense", lp["output"])
        sd[f"{b}.output.LayerNorm.weight"] = np.asarray(
            lp["output_norm"]["scale"])
        sd[f"{b}.output.LayerNorm.bias"] = np.asarray(
            lp["output_norm"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# PretrainInternVideo2 (UMT student) — encoder + align decoders
# ---------------------------------------------------------------------------


def convert_internvideo2_pretrain(
    sd: Mapping[str, np.ndarray],
    *,
    depth: int,
    clip_return_layers: int,
    mae_return_layers: int,
) -> dict:
    """Reference internvideo2_pretrain.py state_dict -> flax params."""
    enc = convert_internvideo2_encoder(sd, depth=depth)["params"]
    p: dict = {"encoder": enc}
    p["clip_pos_embed"] = sd["clip_pos_embed"][0]
    for j in range(clip_return_layers):
        p[f"clip_decoder_{j}"] = {
            "head": _linear(sd, f"clip_decoder.{j}.head"),
            "norm": _layernorm(sd, f"clip_decoder.{j}.norm"),
        }
    if "final_clip_decoder.head.weight" in sd:
        p["final_clip_decoder"] = {
            "head": _linear(sd, "final_clip_decoder.head"),
            "norm": _layernorm(sd, "final_clip_decoder.norm"),
        }
    if mae_return_layers:
        p["mae_pos_embed"] = sd["mae_pos_embed"][0]
        for j in range(mae_return_layers):
            p[f"mae_decoder_{j}"] = {
                "head_0": _linear(sd, f"mae_decoder.{j}.head.0"),
                "head_2": _linear(sd, f"mae_decoder.{j}.head.2"),
                "norm": _layernorm(sd, f"mae_decoder.{j}.norm"),
            }
    return {"params": p}


# ---------------------------------------------------------------------------
# BEATs audio encoder -> models/beats.BEATsEncoder
# ---------------------------------------------------------------------------


def convert_beats(sd, num_layers: int = 12) -> dict:
    """BEATs torch state dict (backbones/beats/BEATs.py) -> flax params.

    Handles: Conv2d patch embed (OIHW -> HWIO), the weight-normed pos_conv
    (weight_g/weight_v folded into a plain kernel, norm over (out, in) per
    tap as torch's dim=2 weight_norm does), T5 relative-bias table (layer 0
    only — later layers share it), and the GRU-gate parameters.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = {
        "patch_embedding": {
            # (512, 1, 16, 16) OIHW -> (16, 16, 1, 512) HWIO
            "kernel": sd["patch_embedding.weight"].transpose(2, 3, 1, 0),
        },
        "layer_norm": _layernorm(sd, "layer_norm"),
        "post_extract_proj": _linear(sd, "post_extract_proj"),
        "encoder_layer_norm": _layernorm(sd, "encoder.layer_norm"),
    }
    # weight_norm(dim=2): w[:, :, j] = g[0, 0, j] * v[:, :, j] / ||v[:, :, j]||
    g = sd["encoder.pos_conv.0.weight_g"]  # (1, 1, k)
    v = sd["encoder.pos_conv.0.weight_v"]  # (Cout, Cin/groups, k)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)
    p["pos_conv"] = {
        # torch conv1d (Cout, Cin/g, k) -> flax (k, Cin/g, Cout)
        "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
        "bias": sd["encoder.pos_conv.0.bias"],
    }
    for i in range(num_layers):
        b = f"encoder.layers.{i}"
        attn = {
            "q_proj": _linear(sd, f"{b}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{b}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{b}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{b}.self_attn.out_proj"),
            "grep_linear": _linear(sd, f"{b}.self_attn.grep_linear"),
            "grep_a": sd[f"{b}.self_attn.grep_a"],
        }
        if i == 0:
            attn["relative_attention_bias"] = sd[
                f"{b}.self_attn.relative_attention_bias.weight"
            ]
        p[f"layers_{i}"] = {
            "self_attn": attn,
            "self_attn_layer_norm": _layernorm(sd, f"{b}.self_attn_layer_norm"),
            "fc1": _linear(sd, f"{b}.fc1"),
            "fc2": _linear(sd, f"{b}.fc2"),
            "final_layer_norm": _layernorm(sd, f"{b}.final_layer_norm"),
        }
    return {"params": p}


def convert_internvit(sd, *, depth: int, prefix: str = "") -> dict:
    """InternViT vision checkpoint (HF `InternVLVisionModel` naming, which
    the reference's compose vision subclasses —
    xtuner/v1/model/compose/intern_s1/modeling_vision.py:57-275 /
    compose/internvl/modeling_vision.py) -> our InternVideo2 encoder
    params (T=1). Handles both norm flavors: InternVL's layer_norm blocks
    (no qk-norm) and Intern-S1's rms_norm + use_qk_norm=True.

    The model-level final `layernorm` is Identity under use_mean_pooling
    (the compose default); a non-identity final norm is rejected loudly.
    """
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if "layernorm.weight" in sd:
        raise NotImplementedError(
            "InternViT with a final layernorm (use_mean_pooling=False) is "
            "not supported by the compose path"
        )
    p: dict = {}
    w = sd["embeddings.patch_embeddings.projection.weight"]  # (D, 3, p, p)
    d = w.shape[0]
    kernel = np.ascontiguousarray(
        w[:, :, None].transpose(2, 3, 4, 1, 0).reshape(-1, d))
    p["patch_embed"] = {"proj": {"kernel": kernel}}
    if "embeddings.patch_embeddings.projection.bias" in sd:
        p["patch_embed"]["proj"]["bias"] = sd[
            "embeddings.patch_embeddings.projection.bias"]
    p["cls_token"] = sd["embeddings.cls_token"]
    if "embeddings.position_embeddings" in sd:
        p["pos_embed"] = sd["embeddings.position_embeddings"][0]

    for i in range(depth):
        b = f"encoder.layer.{i}"
        if f"{b}.attention.q_proj.weight" not in sd and \
                f"layer.{i}.attention.q_proj.weight" in sd:
            b = f"layer.{i}"  # the xtuner subclass flattens `encoder.`
        ln = f"{b}.layernorm_before.bias" in sd
        norm = _layernorm if ln else _rmsnorm
        qw = sd[f"{b}.attention.q_proj.weight"]
        kw = sd[f"{b}.attention.k_proj.weight"]
        vw = sd[f"{b}.attention.v_proj.weight"]
        attn = {
            # separate q/k/v projections fold into our flat (D, 3D) qkv
            "qkv": {"kernel": np.ascontiguousarray(
                np.concatenate([qw.T, kw.T, vw.T], axis=1))},
            "proj": _linear(sd, f"{b}.attention.projection_layer"),
        }
        if f"{b}.attention.q_proj.bias" in sd:
            attn["qkv"]["bias"] = np.concatenate([
                sd[f"{b}.attention.q_proj.bias"],
                sd[f"{b}.attention.k_proj.bias"],
                sd[f"{b}.attention.v_proj.bias"],
            ])
        if f"{b}.attention.q_norm.weight" in sd:
            attn["q_norm"] = _rmsnorm(sd, f"{b}.attention.q_norm")
            attn["k_norm"] = _rmsnorm(sd, f"{b}.attention.k_norm")
        p[f"blocks_{i}"] = {
            "attn": attn,
            "norm1": norm(sd, f"{b}.layernorm_before"),
            "norm2": norm(sd, f"{b}.layernorm_after"),
            "ls1": {"gamma": sd[f"{b}.lambda_1"]},
            "ls2": {"gamma": sd[f"{b}.lambda_2"]},
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            },
        }
    return {"params": p}


def convert_internvl(sd, cfg) -> dict:
    """Full InternVL/Intern-S1 compose checkpoint -> InternVLChat params:
    model.vision_tower.* via convert_internvit, model.multi_modal_projector.*
    (layer_norm + linear_1/linear_2 -> mlp1_*), model.language_model.* via
    the MLA LLM bridge (an M2LA-converted text dict; use
    models/mla_convert.dense_gqa_to_mla first for stock GQA checkpoints).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    vt = "model.vision_tower."
    pj = "model.multi_modal_projector."
    params = convert_internvit(
        sd, depth=cfg.vision.depth, prefix=vt)["params"]
    out = {
        "vision_tower": params,
        "mlp1_norm": _layernorm(sd, pj + "layer_norm"),
        "mlp1_fc1": _linear(sd, pj + "linear_1"),
        "mlp1_fc2": _linear(sd, pj + "linear_2"),
    }
    if any(k.startswith("model.language_model.") for k in sd):
        out["language_model"] = convert_hf_mla_llm(sd, cfg.text)["params"]
    return {"params": out}


def convert_beats_tokenizer(sd, num_layers: int = 12) -> dict:
    """BEATs acoustic-tokenizer state dict (backbones/beats/Tokenizers.py)
    -> flax variables: params (encoder + quantize_layer projections) plus
    the "quantizer" collection (codebook weight / cluster_size / initted)
    consumed by models.beats.NormEMAVectorQuantizer."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc = convert_beats(sd, num_layers)["params"]
    params = {
        "encoder": enc,
        "quantize_layer_0": _linear(sd, "quantize_layer.0"),
        "quantize_layer_2": _linear(sd, "quantize_layer.2"),
    }
    n = sd["quantize.embedding.weight"].shape[0]
    quantizer = {
        "quantize": {
            "weight": sd["quantize.embedding.weight"].astype(np.float32),
            "cluster_size": sd.get(
                "quantize.embedding.cluster_size",
                sd.get("quantize.cluster_size", np.zeros(n, np.float32)),
            ).astype(np.float32),
            "initted": np.asarray(True),
        }
    }
    return {"params": params, "quantizer": quantizer}


# ---------------------------------------------------------------------------
# HF-layout MLA LLM (Qwen3-VL-MLA / DeepSeek-style naming) <-> MLATransformer
# ---------------------------------------------------------------------------


def _strip_llm_prefix(sd: dict) -> dict:
    # model.language_model. is the Qwen3-VL-style composed-MLLM layout
    # (visual under model.visual., text under model.language_model.)
    for pref in ("language_model.model.", "model.language_model.",
                 "model.", ""):
        if any(k.startswith(pref + "layers.0.") for k in sd):
            out = {
                k[len(pref):]: v for k, v in sd.items() if k.startswith(pref)
            }
            # lm_head sits outside the model.* scope in HF layouts
            for k in ("lm_head.weight",):
                if k in sd:
                    out[k] = sd[k]
            return out
    raise KeyError("no '<prefix>layers.0.' keys found in state dict")


def _mla_rope_input_permutation(p_dim: int) -> np.ndarray:
    """Interleaved -> half-split rope-row permutation.

    The reference applies rope after permuting pairs to halves inside the
    forward (mla.py:136-168: q.view(b,h,s,d/2,2).transpose(4,3)); our
    kernels are half-split native, so the bridge permutes the projection
    rows that produce rope dims instead — free at convert time, removes a
    per-layer gather from the forward. out[t] = raw[2*(t%h) + t//h].
    """
    half = p_dim // 2
    t = np.arange(p_dim)
    return 2 * (t % half) + (t // half)


def _mla_permute_q_rows_with(w: np.ndarray, num_heads: int, nope: int,
                             rope: int, perm: np.ndarray) -> np.ndarray:
    qd = nope + rope
    w = w.reshape(num_heads, qd, *w.shape[1:]).copy()
    w[:, nope:] = w[:, nope:][:, perm]
    return w.reshape(num_heads * qd, *w.shape[2:])


def _mla_permute_q_rows(w: np.ndarray, num_heads: int, nope: int,
                        rope: int) -> np.ndarray:
    """Permute each head's rope rows of a (H*(nope+rope), ...) q weight."""
    return _mla_permute_q_rows_with(
        w, num_heads, nope, rope, _mla_rope_input_permutation(rope)
    )


def _mla_permute_kva_rows(w: np.ndarray, kv_lora_rank: int,
                          rope: int) -> np.ndarray:
    """Permute the trailing rope rows of kv_a_proj_with_mqa's weight."""
    perm = _mla_rope_input_permutation(rope)
    w = w.copy()
    w[kv_lora_rank:] = w[kv_lora_rank:][perm]
    return w


def convert_xtuner_mla_attention(sd, cfg, prefix: str = "") -> dict:
    """xtuner MLA module state dict -> nn/mla.MLAttention flax params.

    Handles both variants: mla_raw.py (kv_a_layernorm present, DeepSeek
    style) and mla.py M²LA (no kv norm), q-LoRA or full q. Rope rows are
    permuted to our half-split convention (_mla_rope_input_permutation).
    """
    g = lambda k: np.asarray(sd[prefix + k])
    has = lambda k: (prefix + k) in sd
    H, NOPE, ROPE = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim

    def lin(key, row_perm=None):
        w = g(f"{key}.weight")
        out = {}
        if row_perm is not None:
            w = row_perm(w)
        out["kernel"] = np.ascontiguousarray(w.T)
        if has(f"{key}.bias"):
            b = g(f"{key}.bias")
            if row_perm is not None:
                b = row_perm(b)
            out["bias"] = b
        return out

    qperm = lambda w: _mla_permute_q_rows(w, H, NOPE, ROPE)
    kperm = lambda w: _mla_permute_kva_rows(w, cfg.kv_lora_rank, ROPE)

    p = {
        "kv_a_proj_with_mqa": lin("kv_a_proj_with_mqa", kperm),
        "o_proj": lin("o_proj"),
        "kv_b_proj_kernel": np.ascontiguousarray(
            g("kv_b_proj.weight").T
        ).reshape(cfg.kv_lora_rank, H, NOPE + cfg.v_head_dim),
    }
    if has("q_proj.weight"):
        p["q_proj"] = lin("q_proj", qperm)
    else:
        p["q_a_proj"] = lin("q_a_proj")
        p["q_a_layernorm"] = {"weight": g("q_a_layernorm.weight")}
        p["q_b_proj"] = lin("q_b_proj", qperm)
    if has("kv_a_layernorm.weight"):
        p["kv_a_layernorm"] = {"weight": g("kv_a_layernorm.weight")}
    return {"params": p}


def convert_hf_mla_llm(sd, cfg) -> dict:
    """HF/xtuner MLA checkpoint (xtuner v1 module/attention/mla.py naming:
    q_proj | q_a/q_b+q_a_layernorm, kv_a_proj_with_mqa, kv_b_proj, o_proj;
    SwiGLU gate/up/down) -> models/llm.MLATransformer params."""
    sd = _strip_llm_prefix({k: np.asarray(v) for k, v in sd.items()})
    mla = cfg.mla
    p = {
        "embed_tokens": {"embedding": sd["embed_tokens.weight"]},
        "norm": _rmsnorm(sd, "norm"),
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = {"kernel": np.ascontiguousarray(sd["lm_head.weight"].T)}
    for i in range(cfg.num_layers):
        b = f"layers.{i}"
        a = f"{b}.self_attn"
        # shared attention bridge (incl. interleaved->half-split rope-row
        # permutation, torch-parity-tested in tests/test_mla_parity.py)
        attn = convert_xtuner_mla_attention(sd, mla, prefix=a + ".")["params"]
        if cfg.moe is not None:
            # Qwen3-MoE expert layout: mlp.gate (router, (E, D)) +
            # mlp.experts.{j}.{gate,up,down}_proj -> stacked (E, D, I) /
            # (E, I, D) grouped-GEMM weights (nn/moe.MoEMlp)
            e = cfg.moe.num_experts
            mlp = {
                "router": {
                    "kernel": np.ascontiguousarray(
                        sd[f"{b}.mlp.gate.weight"].T
                    )
                },
                "w_gate": np.stack([
                    sd[f"{b}.mlp.experts.{j}.gate_proj.weight"].T
                    for j in range(e)
                ]),
                "w_up": np.stack([
                    sd[f"{b}.mlp.experts.{j}.up_proj.weight"].T
                    for j in range(e)
                ]),
                "w_down": np.stack([
                    sd[f"{b}.mlp.experts.{j}.down_proj.weight"].T
                    for j in range(e)
                ]),
            }
        else:
            mlp = {
                "gate_proj": _linear(sd, f"{b}.mlp.gate_proj"),
                "up_proj": _linear(sd, f"{b}.mlp.up_proj"),
                "down_proj": _linear(sd, f"{b}.mlp.down_proj"),
            }
        p[f"layers_{i}"] = {
            "input_layernorm": _rmsnorm(sd, f"{b}.input_layernorm"),
            "post_attention_layernorm": _rmsnorm(
                sd, f"{b}.post_attention_layernorm"
            ),
            "self_attn": attn,
            "mlp": mlp,
        }
    return {"params": p}


def export_mla_llm_hf(params, cfg) -> dict:
    """MLATransformer params -> HF-layout numpy state dict (inverse of
    convert_hf_mla_llm; the X2 HF-safetensors-export surface for the LLM)."""
    p = params.get("params", params)
    unbox = lambda t: np.asarray(getattr(t, "value", t))
    sd = {"model.embed_tokens.weight": unbox(p["embed_tokens"]["embedding"]),
          "model.norm.weight": unbox(p["norm"]["weight"])}
    if "lm_head" in p:
        sd["lm_head.weight"] = np.ascontiguousarray(
            unbox(p["lm_head"]["kernel"]).T
        )

    def put_linear(dst, node):
        sd[f"{dst}.weight"] = np.ascontiguousarray(unbox(node["kernel"]).T)
        if "bias" in node:
            sd[f"{dst}.bias"] = unbox(node["bias"])

    mla = cfg.mla
    for i in range(cfg.num_layers):
        lp = p[f"layers_{i}"]
        b = f"model.layers.{i}"
        sd[f"{b}.input_layernorm.weight"] = unbox(
            lp["input_layernorm"]["weight"]
        )
        sd[f"{b}.post_attention_layernorm.weight"] = unbox(
            lp["post_attention_layernorm"]["weight"]
        )
        attn = lp["self_attn"]
        inv = np.argsort(_mla_rope_input_permutation(mla.qk_rope_head_dim))

        def put_rows(dst, node, row_perm):
            w = np.ascontiguousarray(unbox(node["kernel"]).T)
            sd[f"{dst}.weight"] = np.ascontiguousarray(row_perm(w))
            if "bias" in node:
                sd[f"{dst}.bias"] = np.ascontiguousarray(
                    row_perm(unbox(node["bias"]))
                )

        def q_inv(w):
            return _mla_permute_q_rows_with(
                w, mla.num_heads, mla.qk_nope_head_dim,
                mla.qk_rope_head_dim, inv,
            )

        def kva_inv(w):
            w = w.copy()
            w[mla.kv_lora_rank:] = w[mla.kv_lora_rank:][inv]
            return w

        put_rows(f"{b}.self_attn.kv_a_proj_with_mqa",
                 attn["kv_a_proj_with_mqa"], kva_inv)
        put_linear(f"{b}.self_attn.o_proj", attn["o_proj"])
        kvb = unbox(attn["kv_b_proj_kernel"]).reshape(
            mla.kv_lora_rank,
            mla.num_heads * (mla.qk_nope_head_dim + mla.v_head_dim),
        )
        sd[f"{b}.self_attn.kv_b_proj.weight"] = np.ascontiguousarray(kvb.T)
        if "kv_a_layernorm" in attn:
            sd[f"{b}.self_attn.kv_a_layernorm.weight"] = unbox(
                attn["kv_a_layernorm"]["weight"]
            )
        if "q_proj" in attn:
            put_rows(f"{b}.self_attn.q_proj", attn["q_proj"], q_inv)
        else:
            put_linear(f"{b}.self_attn.q_a_proj", attn["q_a_proj"])
            sd[f"{b}.self_attn.q_a_layernorm.weight"] = unbox(
                attn["q_a_layernorm"]["weight"]
            )
            put_rows(f"{b}.self_attn.q_b_proj", attn["q_b_proj"], q_inv)
        if cfg.moe is not None:
            sd[f"{b}.mlp.gate.weight"] = np.ascontiguousarray(
                unbox(lp["mlp"]["router"]["kernel"]).T
            )
            for j in range(cfg.moe.num_experts):
                for hf, ours in (("gate_proj", "w_gate"), ("up_proj", "w_up"),
                                 ("down_proj", "w_down")):
                    sd[f"{b}.mlp.experts.{j}.{hf}.weight"] = (
                        np.ascontiguousarray(unbox(lp["mlp"][ours])[j].T)
                    )
        else:
            for name in ("gate_proj", "up_proj", "down_proj"):
                put_linear(f"{b}.mlp.{name}", lp["mlp"][name])
    return sd


def convert_hf_gqa_llm(sd, cfg) -> dict:
    """Stock HF GQA checkpoint (Qwen3/LLaMA naming) ->
    models/llm_gqa.GQATransformer params."""
    sd = _strip_llm_prefix({k: np.asarray(v) for k, v in sd.items()})
    p = {
        "embed_tokens": {"embedding": sd["embed_tokens.weight"]},
        "norm": _rmsnorm(sd, "norm"),
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = {"kernel": np.ascontiguousarray(sd["lm_head.weight"].T)}
    for i in range(cfg.num_layers):
        b = f"layers.{i}"
        a = f"{b}.self_attn"
        attn = {
            "q_proj": _linear(sd, f"{a}.q_proj"),
            "k_proj": _linear(sd, f"{a}.k_proj"),
            "v_proj": _linear(sd, f"{a}.v_proj"),
            "o_proj": _linear(sd, f"{a}.o_proj"),
        }
        if f"{a}.q_norm.weight" in sd:  # Qwen3 per-head qk-norm
            attn["q_norm"] = _rmsnorm(sd, f"{a}.q_norm")
            attn["k_norm"] = _rmsnorm(sd, f"{a}.k_norm")
        p[f"layers_{i}"] = {
            "input_layernorm": _rmsnorm(sd, f"{b}.input_layernorm"),
            "post_attention_layernorm": _rmsnorm(
                sd, f"{b}.post_attention_layernorm"
            ),
            "self_attn": attn,
            "mlp": {
                "gate_proj": _linear(sd, f"{b}.mlp.gate_proj"),
                "up_proj": _linear(sd, f"{b}.mlp.up_proj"),
                "down_proj": _linear(sd, f"{b}.mlp.down_proj"),
            },
        }
    return {"params": p}


def export_gqa_llm_hf(params, cfg) -> dict:
    """GQATransformer params -> HF-layout state dict (inverse bridge)."""
    p = params.get("params", params)
    unbox = lambda t: np.asarray(getattr(t, "value", t))
    sd = {"model.embed_tokens.weight": unbox(p["embed_tokens"]["embedding"]),
          "model.norm.weight": unbox(p["norm"]["weight"])}
    if "lm_head" in p:
        sd["lm_head.weight"] = np.ascontiguousarray(
            unbox(p["lm_head"]["kernel"]).T
        )

    def put_linear(dst, node):
        sd[f"{dst}.weight"] = np.ascontiguousarray(unbox(node["kernel"]).T)
        if "bias" in node:
            sd[f"{dst}.bias"] = unbox(node["bias"])

    for i in range(cfg.num_layers):
        lp = p[f"layers_{i}"]
        b = f"model.layers.{i}"
        sd[f"{b}.input_layernorm.weight"] = unbox(
            lp["input_layernorm"]["weight"]
        )
        sd[f"{b}.post_attention_layernorm.weight"] = unbox(
            lp["post_attention_layernorm"]["weight"]
        )
        attn = lp["self_attn"]
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            put_linear(f"{b}.self_attn.{name}", attn[name])
        for name in ("q_norm", "k_norm"):
            if name in attn:
                sd[f"{b}.self_attn.{name}.weight"] = unbox(
                    attn[name]["weight"]
                )
        for name in ("gate_proj", "up_proj", "down_proj"):
            put_linear(f"{b}.mlp.{name}", lp["mlp"][name])
    return sd


# ---------------------------------------------------------------------------
# UniFormerV2 (InternVideo1) -> models/uniformerv2.UniFormerV2
# ---------------------------------------------------------------------------


def _conv3d(sd, key):
    # torch (O, I, T, H, W) -> flax (T, H, W, I, O)
    out = {"kernel": np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _mha(sd, prefix):
    """torch nn.MultiheadAttention -> _CLIPAttention params."""
    return {
        "in_proj": {
            "kernel": np.ascontiguousarray(
                np.asarray(sd[f"{prefix}.in_proj_weight"]).T
            ),
            "bias": np.asarray(sd[f"{prefix}.in_proj_bias"]),
        },
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def convert_uniformerv2(sd, *, layers: int, n_global: int) -> dict:
    """UniFormerV2 torch state dict (uniformerv2_model.py VisionTransformer;
    keys under `transformer.`) -> flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = {
        "conv1": {"kernel": sd["conv1.weight"].transpose(2, 3, 4, 1, 0)},
        "class_embedding": sd["class_embedding"],
        "positional_embedding": sd["positional_embedding"],
        "ln_pre": _layernorm(sd, "ln_pre"),
        "temporal_cls_token": sd["transformer.temporal_cls_token"],
        "proj_norm": _layernorm(sd, "transformer.proj.0"),
        "proj": _linear(sd, "transformer.proj.2"),
    }
    if "transformer.balance" in sd:
        p["balance"] = sd["transformer.balance"]

    def lmhra(prefix):
        return {
            "bn": {
                "scale": sd[f"{prefix}.pos_embed.0.weight"],
                "bias": sd[f"{prefix}.pos_embed.0.bias"],
                "mean": sd[f"{prefix}.pos_embed.0.running_mean"],
                "var": sd[f"{prefix}.pos_embed.0.running_var"],
            },
            "reduce": _conv3d(sd, f"{prefix}.pos_embed.1"),
            "dw": _conv3d(sd, f"{prefix}.pos_embed.2"),
            "expand": _conv3d(sd, f"{prefix}.pos_embed.3"),
        }

    for i in range(layers):
        b = f"transformer.resblocks.{i}"
        blk = {
            "attn": _mha(sd, f"{b}.attn"),
            "ln_1": _layernorm(sd, f"{b}.ln_1"),
            "ln_2": _layernorm(sd, f"{b}.ln_2"),
            "c_fc": _linear(sd, f"{b}.mlp.c_fc"),
            "c_proj": _linear(sd, f"{b}.mlp.c_proj"),
        }
        if f"{b}.lmhra1.pos_embed.0.weight" in sd:
            blk["lmhra1"] = lmhra(f"{b}.lmhra1")
        if f"{b}.lmhra2.pos_embed.0.weight" in sd:
            blk["lmhra2"] = lmhra(f"{b}.lmhra2")
        p[f"resblocks_{i}"] = blk
    for j in range(n_global):
        p[f"dpe_{j}"] = _conv3d(sd, f"transformer.dpe.{j}")
        d = f"transformer.dec.{j}"
        p[f"dec_{j}"] = {
            "attn": _mha(sd, f"{d}.attn"),
            "ln_1": _layernorm(sd, f"{d}.ln_1"),
            "ln_2": _layernorm(sd, f"{d}.ln_2"),
            "ln_3": _layernorm(sd, f"{d}.ln_3"),
            "c_fc": _linear(sd, f"{d}.mlp.c_fc"),
            "c_proj": _linear(sd, f"{d}.mlp.c_proj"),
        }
    return {"params": p}


# ---------------------------------------------------------------------------
# InternVideo3 MLLM compose: vision tower + projector + LLM (HF layout)
# ---------------------------------------------------------------------------


def convert_internvideo3_vision(sd, cfg, prefix: str = "") -> dict:
    """xtuner InternVideo3VisionModel state dict -> VisionTower params.

    Naming per modeling_vision.py (patch_embed.proj Conv3d, pos_embed
    Embedding, blocks.i.{norm1,attn.qkv,attn.proj,norm2,mlp.linear_fc1,
    mlp.linear_fc2}); the Conv3d kernel (D, C, tp, p, p) becomes our
    patchify GEMM kernel with input dims ordered (tp, p, p, C) — the order
    VisionTower flattens video patches in.
    """
    g = lambda k: np.asarray(sd[prefix + k])
    w = g("patch_embed.proj.weight")  # (D, C, tp, p, p)
    d = w.shape[0]
    p: dict = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                w.transpose(2, 3, 4, 1, 0).reshape(-1, d)
            ),
            "bias": g("patch_embed.proj.bias"),
        },
        "pos_embed": g("pos_embed.weight"),
    }
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": _layernorm(sd_prefixed(sd, prefix), f"{b}.norm1"),
            "norm2": _layernorm(sd_prefixed(sd, prefix), f"{b}.norm2"),
            "qkv": _linear(sd_prefixed(sd, prefix), f"{b}.attn.qkv"),
            "proj": _linear(sd_prefixed(sd, prefix), f"{b}.attn.proj"),
            "fc1": _linear(sd_prefixed(sd, prefix), f"{b}.mlp.linear_fc1"),
            "fc2": _linear(sd_prefixed(sd, prefix), f"{b}.mlp.linear_fc2"),
        }
    return {"params": p}


class sd_prefixed(dict):
    """Read-through view adding a key prefix (keeps _linear/_layernorm
    helpers usable against prefixed reference state dicts)."""

    def __init__(self, sd, prefix):
        self._sd, self._prefix = sd, prefix

    def __getitem__(self, k):
        return np.asarray(self._sd[self._prefix + k])

    def __contains__(self, k):
        return (self._prefix + k) in self._sd


def _patch_merger(sdp, prefix: str) -> dict:
    return {
        "norm": _layernorm(sdp, f"{prefix}.norm"),
        "linear_fc1": _linear(sdp, f"{prefix}.linear_fc1"),
        "linear_fc2": _linear(sdp, f"{prefix}.linear_fc2"),
    }


def convert_internvideo3_projector(sd, num_deepstack: int,
                                   prefix: str = "") -> dict:
    """InternVideo3Projector (modeling_projector.py: merger +
    deepstack_merger_list) -> {merger, deepstack_merger_i} param subtrees."""
    sdp = sd_prefixed(sd, prefix)
    out = {"merger": _patch_merger(sdp, "merger")}
    for i in range(num_deepstack):
        out[f"deepstack_merger_{i}"] = _patch_merger(
            sdp, f"deepstack_merger_list.{i}"
        )
    return out


def convert_internvideo3(sd, cfg) -> dict:
    """Full InternVideo3ForConditionalGeneration HF checkpoint ->
    models/mllm.VideoMLLM params.

    Key layout (modeling_vision.py:255 _hf_prefix / internvideo3_config.py
    :88 language_model_hf_prefix): vision tower AND projector under
    `model.visual.`, the text model under `model.language_model.` (or
    `model.` directly). cfg is MLLMConfig; the text flavor picks
    convert_hf_mla_llm vs convert_hf_gqa_llm.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    vis_prefix = None
    for cand in ("model.visual.", "visual."):
        if any(k.startswith(cand + "blocks.0.") for k in sd):
            vis_prefix = cand
            break
    if vis_prefix is None:
        raise KeyError("no '<prefix>visual.blocks.0.' keys found")
    n_ds = len(cfg.vision.deepstack_indexes)
    params = {
        "vision_tower": convert_internvideo3_vision(
            sd, cfg.vision, prefix=vis_prefix
        )["params"],
        **convert_internvideo3_projector(sd, n_ds, prefix=vis_prefix),
    }
    lm_sd = {
        k: v for k, v in sd.items()
        if not k.startswith(vis_prefix)
    }
    if hasattr(cfg.text, "num_kv_heads"):
        lm = convert_hf_gqa_llm(lm_sd, cfg.text)
    else:
        lm = convert_hf_mla_llm(lm_sd, cfg.text)
    params["language_model"] = lm["params"]
    return {"params": params}
