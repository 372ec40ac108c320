"""ViCLIP text-video retrieval demo (Data/InternVid/demo.ipynb parity).

Decode a video, rank candidate captions with ViCLIP + the CLIP BPE
tokenizer, print top-k with probabilities — the reference's
`retrieve_text(frames, text_candidates, models=model_l, topk=5)` flow.

    python examples/viclip_demo.py --video clip.mp4 \
        --checkpoint ViClip-InternVid-10M-FLT.npz \
        --bpe bpe_simple_vocab_16e6.txt.gz \
        "a dog chasing a toy" "a man shoveling snow" ...

Without --checkpoint it runs random weights (pipeline smoke). Convert the
released .pth first:
    python -m internvideo_tpu.tools.convert_cli --kind viclip \
        --src ViClip-InternVid-10M-FLT.pth --dst viclip_l.npz
"""

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", required=True)
    ap.add_argument("--checkpoint", default=None, help="converted flax .npz")
    ap.add_argument("--bpe", default=None, help="bpe_simple_vocab_16e6.txt.gz")
    ap.add_argument("--size", default="l", choices=("l", "b"))
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("texts", nargs="+")
    args = ap.parse_args(argv)

    import jax

    from internvideo_tpu.data.video import read_video
    from internvideo_tpu.eval.demo import retrieve_text
    from internvideo_tpu.models.viclip import ViCLIP, viclip_config

    import dataclasses

    cfg = viclip_config(args.size)
    if args.frames != cfg.vision.num_frames:
        # the released recipe is 8-frame; other budgets reuse the weights
        # (temporal pos rows are folded per frame, so the table is sliced
        # by checkpoint surgery — random-weight smoke just rebuilds it)
        cfg = dataclasses.replace(
            cfg,
            vision=dataclasses.replace(cfg.vision, num_frames=args.frames),
        )
    model = ViCLIP(cfg)
    frames = read_video(args.video, args.frames, sample="middle")

    if args.bpe:
        from internvideo_tpu.data.clip_bpe import ClipBpeTokenizer

        tok = ClipBpeTokenizer(args.bpe)
        tokenize = lambda ts: tok.tokenize(ts)  # noqa: E731
    else:  # smoke mode without the vocab asset
        from internvideo_tpu.data.tokenizer import ToyTokenizer

        toy = ToyTokenizer()
        tokenize = lambda ts: toy(ts, max_length=77)["input_ids"]  # noqa: E731

    clip0 = np.zeros((1, args.frames, 224, 224, 3), np.float32)
    ids0 = np.ones((1, 77), np.int32)
    params = jax.jit(model.init)(jax.random.key(0), clip0, ids0)
    if args.checkpoint:
        from internvideo_tpu.tools.convert_cli import load_flat_params

        params = load_flat_params(args.checkpoint)

    encode_video = jax.jit(
        lambda v: model.apply(params, v, method="encode_video")
    )
    encode_text = jax.jit(
        lambda ids: model.apply(params, ids, method="encode_text")
    )
    texts, probs = retrieve_text(
        frames, args.texts, encode_video=encode_video,
        encode_text=encode_text, tokenize=lambda ts: np.asarray(tokenize(ts)),
        topk=min(args.topk, len(args.texts)),
    )
    for t, p in zip(texts, probs):
        print(f"{p:6.1%}  {t}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
