"""Checkpoint conversion CLI: reference torch checkpoints <-> this framework.

    # reference InternVideo2 encoder (.pth/.npz/.safetensors) -> flax npz
    python -m internvideo_tpu.tools.convert_cli \
        --kind internvideo2_encoder --depth 40 --src 1B_ft.pth --dst enc.npz

    # stage-2 VideoCLIP full checkpoint
    python -m internvideo_tpu.tools.convert_cli --kind internvideo2_stage2 \
        --depth 40 --clip-return-layers 6 --text-layers 24 \
        --src stage2.pth --dst stage2.npz

    # HF MLA LLM (Qwen3-VL-MLA-class) safetensors dir -> flax npz
    python -m internvideo_tpu.tools.convert_cli --kind hf_mla_llm \
        --preset qwen3_8b_mla --src /hf/ckpt_dir --dst llm.npz

Output is a flat .npz of flax params ('/'-joined paths) loadable with
`load_flat_params` below or fed to Trainer.load_params / cli eval
`--checkpoint`. This is the user-facing face of models/convert.py —
the reference's setup_model checkpoint-surgery entry
(tasks/shared_utils.py:57) as a standalone tool.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def load_state_dict(path: str) -> dict:
    """torch .pth / .npz / .safetensors (file or HF dir) -> numpy dict."""
    if os.path.isdir(path):
        from internvideo_tpu.core.checkpoint import load_hf_checkpoint

        return load_hf_checkpoint(path)
    if path.endswith(".safetensors"):
        from internvideo_tpu.core.checkpoint import read_safetensors

        return read_safetensors(path)
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("model", "module", "state_dict"):
        if isinstance(raw, dict) and key in raw and isinstance(raw[key], dict):
            raw = raw[key]
    return {k: np.asarray(v) for k, v in raw.items()}


def flatten_params(tree, prefix="") -> dict:
    out = {}
    node = tree.get("params", tree) if isinstance(tree, dict) and not prefix \
        else tree
    for k, v in node.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def load_flat_params(path: str) -> dict:
    """Inverse of the CLI output: flat npz -> nested {'params': ...}."""
    flat = dict(np.load(path))
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return {"params": tree}


def convert(kind: str, sd: dict, args) -> dict:
    from internvideo_tpu.models import convert as C

    if kind == "internvideo2_encoder":
        return C.convert_internvideo2_encoder(sd, depth=args.depth)
    if kind == "internvideo2_pretrain":
        return C.convert_internvideo2_pretrain(sd, depth=args.depth)
    if kind == "internvideo2_stage2":
        return C.convert_internvideo2_stage2(
            sd, depth=args.depth,
            clip_return_layers=args.clip_return_layers,
            text_layers=args.text_layers,
        )
    if kind == "internvl_clip_teacher":
        return C.convert_internvl_clip_teacher(sd, depth=args.depth)
    if kind == "videomae_teacher":
        return C.convert_videomae_teacher(sd, depth=args.depth)
    if kind == "hf_bert":
        return C.convert_hf_bert(sd, num_layers=args.text_layers)
    if kind == "mobileclip_text":
        return C.convert_mobileclip_text(sd, num_layers=args.text_layers)
    if kind == "beats":
        return C.convert_beats(sd, num_layers=args.depth)
    if kind == "beats_tokenizer":
        return C.convert_beats_tokenizer(sd, num_layers=args.depth)
    if kind == "internvit":
        return C.convert_internvit(sd, depth=args.depth)
    if kind == "internvideo3":
        from internvideo_tpu.models import presets

        return C.convert_internvideo3(sd, getattr(presets, args.preset)())
    if kind == "internvl":
        from internvideo_tpu.models import presets

        return C.convert_internvl(sd, getattr(presets, args.preset)())
    if kind == "viclip":
        # tower depths are read off the checkpoint's resblock keys (the
        # argparse --depth/--text-layers defaults are 1B-encoder values)
        return C.convert_viclip(sd)
    if kind == "hf_mla_llm":
        from internvideo_tpu.models import presets

        cfg = getattr(presets, args.preset)()
        return C.convert_hf_mla_llm(sd, cfg)
    if kind == "hf_gqa_llm":
        from internvideo_tpu.models import presets

        cfg = getattr(presets, args.preset)()
        return C.convert_hf_gqa_llm(sd, cfg)
    raise SystemExit(f"unknown --kind {kind!r}")


KINDS = (
    "internvideo2_encoder", "internvideo2_pretrain", "internvideo2_stage2",
    "internvl_clip_teacher", "videomae_teacher", "hf_bert",
    "mobileclip_text", "beats", "beats_tokenizer", "internvit",
    "internvideo3", "internvl", "viclip", "hf_mla_llm", "hf_gqa_llm",
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True, choices=KINDS)
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True, help=".npz output path")
    ap.add_argument("--depth", type=int, default=40)
    ap.add_argument("--clip-return-layers", type=int, default=6)
    ap.add_argument("--text-layers", type=int, default=24)
    ap.add_argument("--preset", default="qwen3_8b_mla",
                    help="models/presets name (hf_mla_llm / internvideo3 /"
                         " internvl kinds)")
    args = ap.parse_args(argv)

    sd = load_state_dict(args.src)
    params = convert(args.kind, sd, args)
    flat = flatten_params(params)
    os.makedirs(os.path.dirname(args.dst) or ".", exist_ok=True)
    np.savez(args.dst, **flat)
    total = sum(v.size for v in flat.values())
    print(f"wrote {args.dst}: {len(flat)} tensors, {total/1e6:.1f}M params")
    return 0


if __name__ == "__main__":
    sys.exit(main())
