"""Evaluation CLI: one typed entry for the benchmark suites.

    python -m internvideo_tpu.cli.eval --config configs/eval_retrieval_tiny.py \
        options.k_test=8

The config file defines `config = EvalRunConfig(...)`; dotlist overrides
follow. Replaces the reference's per-benchmark eval scripts
(tasks_clip/retrieval.py, engine_for_finetuning final_test + merge,
retrieval_mc.py, InternVideo3_eval shell suite).

Tasks:
  retrieval       VideoCLIP ITC + cross-encoder rerank -> R@K/mdR/mnR
  zeroshot        prompt-ensembled zero-shot action classification
  classification  encoder multi-view softmax-ensemble -> top-1/top-5
  mcqa            multiple-choice retrieval accuracy
  videoqa         generation-based QA accuracy (eval/videoqa.py scorers)
  mcq_benchmark   VideoMME/MVBench-class generation MCQ suites
  grounding       temporal grounding mIoU / R@{0.3,0.5,0.7}
  temporal_detection  TAL decode+NMS -> mAP@tIoU (ANETdetection)
  openset         OpenMax recalibration -> open-set accuracy
  spatiotemporal  STAL ROI head -> AVA frame mAP

`data` is a zero-arg callable returning the task's inputs (plug real
dataset loaders; tiny configs ship synthetic ones for smoke/CI).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Callable, Optional


@dataclasses.dataclass(frozen=True)
class EvalRunConfig:
    task: str = "retrieval"  # retrieval | classification | mcqa | videoqa
    model: object = None  # task-appropriate model config
    # orbax checkpoint dir, safetensors file (converted via the stage-2 /
    # encoder bridges), or None for random init (smoke)
    checkpoint: Optional[str] = None
    data: Optional[Callable] = None  # () -> task inputs
    options: dict = dataclasses.field(default_factory=dict)


def _load_params(model, init_params, checkpoint, convert):
    if checkpoint is None:
        return init_params
    import os

    if os.path.isdir(checkpoint) and not os.path.exists(
        os.path.join(checkpoint, "model.safetensors.index.json")
    ):
        from internvideo_tpu.core.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint)
        restored = mgr.restore(init_params)
        return restored if restored is not None else init_params
    from internvideo_tpu.core.checkpoint import (
        load_hf_checkpoint,
        read_safetensors,
    )

    sd = (
        load_hf_checkpoint(checkpoint) if os.path.isdir(checkpoint)
        else read_safetensors(checkpoint)
    )
    return convert(sd)


def run_retrieval(run: EvalRunConfig) -> dict:
    import jax

    from internvideo_tpu.eval.retrieval import itm_eval, retrieval_evaluation
    from internvideo_tpu.models.convert import convert_internvideo2_stage2
    from internvideo_tpu.models.videoclip import VideoCLIP

    model = VideoCLIP(run.model)
    videos, texts, gt_v, gt_t = run.data()
    params = jax.jit(
        lambda v, i, m: model.init(
            jax.random.key(0), v, i, m, init_all_branches=True
        )
    )(videos["video"][:1], texts["input_ids"][:1],
      texts["attention_mask"][:1])
    params = _load_params(
        model, params, run.checkpoint,
        lambda sd: convert_internvideo2_stage2(
            sd, depth=run.model.vision.depth,
            clip_return_layers=(
                run.model.pretrain.clip_return_layers
                if run.model.pretrain is not None else 0
            ),
            text_layers=run.model.text.num_layers,
        ),
    )

    @jax.jit
    def encode_video(batch):
        out = model.apply(params, batch["video"], method="encode_vision")
        return out[0], model.apply(
            params, out[1], method=lambda m, x: m.vision_proj(x)
        )

    @jax.jit
    def encode_text(batch):
        tokens, pooled = model.apply(
            params, batch["input_ids"], batch["attention_mask"],
            method="encode_text",
        )
        return tokens, model.apply(
            params, pooled, method=lambda m, x: m.text_proj(x)
        )

    @jax.jit
    def rerank(vis_embeds, txt_embeds, txt_mask):
        fused = model.apply(
            params, txt_embeds, txt_mask, vis_embeds, method="fusion"
        )
        logits = model.apply(params, fused.pooled, method="itm_logits")
        return logits[:, 1] - logits[:, 0]

    opts = dict(run.options)
    s_v2t, s_t2v = retrieval_evaluation(
        encode_video=encode_video, encode_text=encode_text,
        rerank_score=None if opts.pop("no_rerank", False) else rerank,
        videos=videos, texts=texts, **opts,
    )
    return itm_eval(s_v2t, s_t2v, gt_v, gt_t)


def run_zeroshot(run: EvalRunConfig) -> dict:
    """Zero-shot action classification: prompt-template text ensembling
    against a stage-2 VideoCLIP (reference text_prompt.py templates +
    zero-shot demo flow). `run.data()` -> (class_names, tokenize_fn,
    batches); tokenize_fn(texts) -> {"input_ids", "attention_mask"}."""
    import jax

    from internvideo_tpu.eval.zeroshot import (
        build_zero_shot_classifier,
        zero_shot_eval,
    )
    from internvideo_tpu.models.convert import convert_internvideo2_stage2
    from internvideo_tpu.models.videoclip import VideoCLIP

    model = VideoCLIP(run.model)
    class_names, tokenize_fn, batches = run.data()
    sample = tokenize_fn(["a"])
    init = jax.jit(
        lambda v, i, m: model.init(
            jax.random.key(0), v, i, m, init_all_branches=True
        )
    )
    first = next(iter(batches))
    params = init(first["video"][:1], sample["input_ids"],
                  sample["attention_mask"])
    params = _load_params(
        model, params, run.checkpoint,
        lambda sd: convert_internvideo2_stage2(
            sd, depth=run.model.vision.depth,
            clip_return_layers=(
                run.model.pretrain.clip_return_layers
                if run.model.pretrain is not None else 0
            ),
            text_layers=run.model.text.num_layers,
        ),
    )

    @jax.jit
    def _txt(ids, mask):
        _, pooled = model.apply(params, ids, mask, method="encode_text")
        return model.apply(params, pooled, method=lambda m, x: m.text_proj(x))

    def encode_texts(texts):
        t = tokenize_fn(texts)
        return _txt(t["input_ids"], t["attention_mask"])

    @jax.jit
    def encode_video(video):
        out = model.apply(params, video, method="encode_vision")
        return model.apply(params, out[1],
                           method=lambda m, x: m.vision_proj(x))

    classifier = build_zero_shot_classifier(
        encode_texts, class_names,
        **{k: v for k, v in run.options.items() if k == "templates"},
    )
    import itertools

    return zero_shot_eval(
        encode_video, classifier, itertools.chain([first], batches))


def run_classification(run: EvalRunConfig) -> dict:
    import jax

    from internvideo_tpu.eval.classification import final_test
    from internvideo_tpu.models.convert import convert_internvideo2_encoder
    from internvideo_tpu.models.internvideo2 import InternVideo2

    model = InternVideo2(run.model)
    data = run.data()  # iterable of {"video", "label", "clip_id"}
    first = next(iter(data))
    params = jax.jit(model.init)(jax.random.key(0), first["video"])
    params = _load_params(
        model, params, run.checkpoint,
        lambda sd: convert_internvideo2_encoder(sd, depth=run.model.depth),
    )

    @jax.jit
    def forward(video):
        return model.apply(params, video).logits

    return final_test(lambda v: forward(v), data, **run.options)


def run_mcqa(run: EvalRunConfig) -> dict:
    import jax

    from internvideo_tpu.eval.mcqa import mcqa_accuracy
    from internvideo_tpu.models.videoclip import VideoCLIP

    model = VideoCLIP(run.model)
    data = run.data()
    first = next(iter(data))
    b, k, length = first["choice_ids"].shape
    import jax.numpy as jnp

    mask1 = jnp.ones((1, length), jnp.int32)
    params = model.init(
        jax.random.key(0), first["video"][:1], first["choice_ids"][:1, 0],
        mask1, init_all_branches=True,
    )
    params = _load_params(model, params, run.checkpoint, lambda sd: sd)

    @jax.jit
    def encode_video(video):
        out = model.apply(params, video, method="encode_vision")
        return model.apply(
            params, out[1], method=lambda m, x: m.vision_proj(x)
        )

    @jax.jit
    def encode_choices(ids):
        import jax.numpy as jnp

        _, pooled = model.apply(
            params, ids, jnp.ones_like(ids), method="encode_text"
        )
        return model.apply(
            params, pooled, method=lambda m, x: m.text_proj(x)
        )

    return mcqa_accuracy(encode_video, encode_choices, data, **run.options)


def run_videoqa(run: EvalRunConfig) -> dict:
    from internvideo_tpu.eval.videoqa import evaluate_videoqa

    generate_answer, data = run.data()
    return evaluate_videoqa(generate_answer, data, **run.options)


def run_mcq_benchmark(run: EvalRunConfig) -> dict:
    """VideoMME/MVBench-class MCQ suites: data() -> (items, generate_fn)."""
    from internvideo_tpu.eval.mllm_benchmark import run_mcq_benchmark as _run

    items, generate_fn = run.data()
    return _run(items, generate_fn, **run.options)


def run_grounding(run: EvalRunConfig) -> dict:
    """Temporal grounding: data() -> (queries, generate_fn)."""
    from internvideo_tpu.eval.grounding import run_grounding_eval

    queries, generate_fn = run.data()
    return run_grounding_eval(queries, generate_fn, **run.options)


def run_temporal_detection(run: EvalRunConfig) -> dict:
    """TAL suite (ANETdetection protocol): data() -> (raw_outputs, gt);
    raw_outputs: vid -> (scores (T,C), left (T,), right (T,)) anchor-free
    head outputs; decode -> per-class NMS -> mAP@tIoU."""
    import numpy as np

    from internvideo_tpu.eval.temporal_detection import (
        decode_proposals,
        detection_map,
        nms_proposals,
    )

    raw, gt = run.data()
    opts = dict(run.options)
    dec = {k: opts.pop(k) for k in
           ("stride", "score_threshold", "max_per_class") if k in opts}
    nms = {k: opts.pop(k) for k in
           ("iou_threshold", "soft", "sigma", "max_keep") if k in opts}
    preds = {}
    for vid, (scores, left, right) in raw.items():
        segs, sc, labs = decode_proposals(
            np.asarray(scores), np.asarray(left), np.asarray(right), **dec
        )
        preds[vid] = nms_proposals(segs, sc, labs, **nms)
    return detection_map(preds, gt, **opts)


def run_openset(run: EvalRunConfig) -> dict:
    """Open-set AR (OpenMax over the libMR port): data() ->
    (train_feats, train_labels, train_logits, test_feats, test_logits,
    test_labels) with -1 test labels marking unknown-class samples."""
    from internvideo_tpu.eval.openset import OpenMax, openset_metrics

    tr_f, tr_y, tr_z, te_f, te_z, te_y = run.data()
    om = OpenMax(**run.options).fit(tr_f, tr_y, tr_z)
    return openset_metrics(om.recalibrate(te_f, te_z), te_y)


def run_spatiotemporal(run: EvalRunConfig) -> dict:
    """STAL frame-mAP (AVA protocol): data() -> (apply_head,
    features_by_frame, boxes_by_frame, ground_truth)."""
    from internvideo_tpu.eval.spatiotemporal import evaluate_action_detector

    apply_head, feats, boxes, gt = run.data()
    return evaluate_action_detector(
        apply_head, feats, boxes, gt, **run.options
    )


TASKS = {
    "retrieval": run_retrieval,
    "zeroshot": run_zeroshot,
    "classification": run_classification,
    "mcqa": run_mcqa,
    "videoqa": run_videoqa,
    "mcq_benchmark": run_mcq_benchmark,
    "grounding": run_grounding,
    "temporal_detection": run_temporal_detection,
    "openset": run_openset,
    "spatiotemporal": run_spatiotemporal,
}


def main(argv=None):
    from internvideo_tpu.core.config import apply_overrides, load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    run = load_config(args.config)
    if args.overrides:
        run = apply_overrides(run, args.overrides)
    if run.task not in TASKS:
        raise SystemExit(f"unknown task {run.task!r}; one of {list(TASKS)}")
    metrics = TASKS[run.task](run)
    print(json.dumps({"task": run.task, **{
        k: (round(float(v), 4) if hasattr(v, "__float__") else v)
        for k, v in metrics.items()
    }}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
