"""Inference/serving CLI: prompt -> generated tokens on a checkpointed LLM.

    # token-id mode (no tokenizer dependency):
    python -m internvideo_tpu.cli.generate --preset qwen3_8b_mla \
        --checkpoint ckpt.safetensors --ids 1,2,3 --max-new-tokens 32 --paged

    # text mode (HF tokenizer directory via transformers, which is baked in):
    python -m internvideo_tpu.cli.generate --preset qwen3_8b_mla \
        --checkpoint ckpt.safetensors --tokenizer /path/to/tok \
        --prompt "hello" --temperature 0.7 --top-p 0.9

Counterpart of the reference's lmdeploy/vLLM-served deploy path
(InternVideo3 rollout engines): same params, same mesh, one compiled
generate program with the Pallas paged-decode kernel (`--paged`).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_model(args):
    from internvideo_tpu.models import presets
    from internvideo_tpu.models.llm import MLATransformer

    if not hasattr(presets, args.preset):
        raise SystemExit(f"unknown preset {args.preset!r}; see models/presets.py")
    cfg = getattr(presets, args.preset)()
    if hasattr(cfg, "mla"):  # a bare LLMConfig
        return MLATransformer(cfg)
    if hasattr(cfg, "num_kv_heads"):  # dense-GQA flavor
        from internvideo_tpu.models.llm_gqa import GQATransformer

        return GQATransformer(cfg)
    raise SystemExit(
        f"preset {args.preset!r} is not a text-LLM config; generate currently "
        "serves the LLM flavors (use eval/demo.py for retrieval serving)"
    )


def load_params(model, args, ids):
    import jax
    import jax.numpy as jnp

    if args.checkpoint:
        import os

        from internvideo_tpu.core.checkpoint import (
            load_hf_checkpoint,
            read_safetensors,
        )
        from internvideo_tpu.models.convert import convert_hf_mla_llm

        sd = (
            load_hf_checkpoint(args.checkpoint)
            if os.path.isdir(args.checkpoint)
            else read_safetensors(args.checkpoint)
        )
        if hasattr(model.cfg, "num_kv_heads"):
            from internvideo_tpu.models.convert import convert_hf_gqa_llm

            return convert_hf_gqa_llm(sd, model.cfg)
        return convert_hf_mla_llm(sd, model.cfg)
    # no checkpoint: random init (smoke/serving-bringup mode)
    return jax.jit(model.init)(jax.random.key(0), jnp.asarray(ids))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="qwen3_8b_mla")
    ap.add_argument("--checkpoint", default=None,
                    help="safetensors path (HF layout, converted on load); "
                    "omit for random-init smoke")
    ap.add_argument("--tokenizer", default=None,
                    help="HF tokenizer dir (enables --prompt text mode)")
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--ids", default=None,
                    help="comma-separated prompt token ids")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=None)
    ap.add_argument("--top-p", type=float, default=None)
    ap.add_argument("--eos-token-id", type=int, default=None)
    ap.add_argument("--paged", action="store_true",
                    help="page-pool decode via the Pallas paged kernel")
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    tok = None
    if args.ids:
        ids = [[int(t) for t in args.ids.split(",")]]
    elif args.prompt is not None:
        if not args.tokenizer:
            raise SystemExit("--prompt needs --tokenizer (or pass --ids)")
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer)
        ids = [tok(args.prompt)["input_ids"]]
        if args.eos_token_id is None:
            args.eos_token_id = tok.eos_token_id
    else:
        raise SystemExit("pass --ids or --prompt")

    from internvideo_tpu.models.generation import generate

    model = build_model(args)
    params = load_params(model, args, ids)
    out = generate(
        model, params, jnp.asarray(ids, jnp.int32),
        max_new_tokens=args.max_new_tokens,
        eos_token_id=args.eos_token_id,
        temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p,
        rng=jax.random.key(args.seed),
        paged=args.paged, page_size=args.page_size,
        cache_dtype=jnp.dtype(model.cfg.dtype),
    )
    tokens = jax.device_get(out)[0].tolist()
    if tok is not None:
        print(tok.decode(tokens, skip_special_tokens=True))
    else:
        print(json.dumps({"tokens": tokens}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
