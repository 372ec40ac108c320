"""lmms-eval-compatible model adapter.

The reference's MLLM eval surface is the lmms-eval harness: its scripts run
`accelerate launch -m lmms_eval --model internvideo3 --model_args
pretrained=...` against a registered model class
(InternVideo3/InternVideo3_eval/scripts/eval_videomme.sh:17-31). This module
exposes the same surface for this framework:

* `InternVideoTPULmms` implements the lmms-eval model contract —
  `generate_until(requests)` / `loglikelihood(requests)` over Instance
  objects whose `.args` are `(contexts, gen_kwargs, doc_to_visual, doc_id,
  task, split)`. When the `lmms_eval` package is importable it subclasses
  `lmms_eval.api.model.lmms` and registers under the name
  ``internvideo_tpu`` so harness configs can select it with
  `--model internvideo_tpu --model_args pretrained=...`; without the
  package the same class works standalone (offline runner below).
* `run_offline(...)` drives a VideoMME/MVBench-style MCQ item list through
  the adapter and writes harness-format artifacts: a `results.json`
  (results/versions/configs keyed by task) and a `*_samples.jsonl` log —
  the files lmms-eval's own logger produces with --log_samples.

The generation backend is injected as `generate_fn(prompt, video) -> str`
(the same callable `eval/mllm_benchmark.py` consumes); `from_generate_cli`
builds one from the generate CLI's model machinery.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Iterable, Optional, Sequence

from internvideo_tpu.eval.mllm_benchmark import (
    build_mcq_prompt,
    parse_option_letter,
)

try:  # pragma: no cover - exercised only when lmms_eval is installed
    from lmms_eval.api.model import lmms as _LmmsBase
    from lmms_eval.api.registry import register_model as _register_model

    _HAVE_LMMS_EVAL = True
except ImportError:
    # vendored harness (eval/lmms_harness.py): the same Instance/task_dict/
    # registry contract, runnable end-to-end in this image — see
    # tests/test_lmms_adapter.py::test_vendored_harness_end_to_end
    from internvideo_tpu.eval.lmms_harness import (
        register_model as _register_model,
    )

    _HAVE_LMMS_EVAL = False

    class _LmmsBase:  # harness model base: rank/world for sharded eval
        def __init__(self) -> None:
            self._rank = 0
            self._world_size = 1


@dataclasses.dataclass
class _FakeInstance:
    """Offline stand-in for lmms_eval.api.instance.Instance (same .args)."""

    args: tuple


@_register_model("internvideo_tpu")
class InternVideoTPULmms(_LmmsBase):
    """lmms-eval model wrapper over a (prompt, video) -> text backend.

    Mirrors the contract of the reference's `internvideo3` model family
    registration (its lmms-eval fork; invocation in eval_videomme.sh):
    batch_size 1, visuals resolved per-doc via doc_to_visual, generation
    controlled by each request's gen_kwargs.
    """

    def __init__(
        self,
        pretrained: str = "",
        generate_fn: Optional[Callable[[str, Optional[str]], str]] = None,
        loglikelihood_fn: Optional[
            Callable[[str, str, Optional[str]], tuple]
        ] = None,
        max_num_frames: int = 1024,
        fps: int = 4,
        batch_size: int = 1,
        **kwargs: Any,
    ) -> None:
        super().__init__()
        if generate_fn is None:
            generate_fn = self._build_backend(pretrained, **kwargs)
        self.generate_fn = generate_fn
        # real continuation scorer: (context, continuation, video) ->
        # (loglikelihood, is_greedy). from_mllm attaches one; without it
        # loglikelihood falls back to a generate-and-match heuristic.
        self.loglikelihood_fn = loglikelihood_fn or getattr(
            generate_fn, "loglikelihood_fn", None
        )
        self.max_num_frames = max_num_frames
        self.fps = fps
        self.batch_size_per_gpu = int(batch_size)

    # -- harness API --------------------------------------------------

    def generate_until(self, requests: Sequence[Any]) -> list[str]:
        out = []
        for req in requests:
            contexts, gen_kwargs, doc_to_visual, doc_id, task, split = (
                req.args
            )
            # the harness contract resolves visuals from the doc dict:
            # doc_to_visual(self.task_dict[task][split][doc_id]); the
            # offline runner has no task_dict and keys by index directly
            doc = doc_id
            task_dict = getattr(self, "task_dict", None)
            if task_dict and task in task_dict:
                doc = task_dict[task][split][doc_id]
            visuals = doc_to_visual(doc) if callable(doc_to_visual) else []
            video = None
            if visuals:
                first = visuals[0] if isinstance(visuals, (list, tuple)) \
                    else visuals
                video = first
            out.append(self.generate_fn(contexts, video))
        return out

    def generate_until_multi_round(self, requests):  # pragma: no cover
        raise NotImplementedError(
            "multi-round generation is not part of the MCQ eval surface"
        )

    def loglikelihood(self, requests: Sequence[Any]):
        """(ll, is_greedy) per request — MCQ-by-likelihood scoring.

        Request args are (context, continuation[, doc_to_visual, doc_id,
        task, split]); the long form resolves visuals through task_dict
        exactly like generate_until. With a real `loglikelihood_fn`
        backend (from_mllm provides one) the continuation is scored by
        summed next-token log-probs under the model; without one a
        generate-and-match heuristic keeps text-only backends usable."""
        res = []
        for req in requests:
            contexts, continuation = req.args[0], req.args[1]
            video = None
            if len(req.args) >= 6:
                _, _, doc_to_visual, doc_id, task, split = req.args[:6]
                doc = doc_id
                task_dict = getattr(self, "task_dict", None)
                if task_dict and task in task_dict:
                    doc = task_dict[task][split][doc_id]
                visuals = doc_to_visual(doc) if callable(doc_to_visual) \
                    else []
                if visuals:
                    video = visuals[0] if isinstance(
                        visuals, (list, tuple)) else visuals
            if self.loglikelihood_fn is not None:
                res.append(tuple(
                    self.loglikelihood_fn(contexts, continuation, video)
                ))
            else:
                pred = self.generate_fn(contexts, video)
                match = continuation.strip().lower() in pred.strip().lower()
                res.append((0.0 if match else -1.0, match))
        return res

    # -- backend ------------------------------------------------------

    @staticmethod
    def _build_backend(pretrained: str, **kwargs):
        from internvideo_tpu.eval.lmms_adapter import from_generate_cli

        return from_generate_cli(pretrained, **kwargs)


def from_generate_cli(
    checkpoint: str,
    preset: str = "qwen3_8b_mla",
    max_new_tokens: int = 16,
    **_: Any,
) -> Callable[[str, Optional[str]], str]:
    """(prompt, video) -> text over the generate CLI's TEXT-LLM machinery.

    Loads the preset + checkpoint exactly as
    `python -m internvideo_tpu.cli.generate --preset ... --checkpoint ...`
    does and returns a greedy-decode callable. The generate CLI presets
    are text-only LLMs — a request carrying a video path raises instead
    of silently answering from text alone; use `from_mllm` for the
    video-consuming compose backend. The checkpoint is loaded ONCE and
    cached across requests.
    """
    import types

    from internvideo_tpu.cli import generate as gen_cli

    args = types.SimpleNamespace(preset=preset, checkpoint=checkpoint or None)
    model = gen_cli.build_model(args)

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(checkpoint) if checkpoint else None
    cache: dict = {}

    def generate_fn(prompt: str, video: Optional[str]) -> str:
        if video is not None:
            raise ValueError(
                "from_generate_cli wraps a text-only LLM preset; video "
                "benchmarks need the from_mllm backend (a text-only "
                "answer would silently score the benchmark without "
                "looking at the videos)"
            )
        import jax.numpy as jnp

        from internvideo_tpu.models.generation import generate

        if tok is None:
            raise RuntimeError("a tokenizer checkpoint is required")
        ids = tok(prompt, return_tensors="np")["input_ids"]
        if "params" not in cache:  # load the checkpoint once, not per req
            cache["params"] = gen_cli.load_params(model, args, ids)
        out_ids = generate(  # returns only the new tokens
            model, cache["params"], jnp.asarray(ids),
            max_new_tokens=max_new_tokens, temperature=0.0,
        )
        return tok.decode(out_ids[0], skip_special_tokens=True)

    return generate_fn


def from_mllm(
    model,
    params,
    tokenizer,  # callable texts -> {"input_ids"} or an HF tokenizer
    *,
    num_frames: int = 8,
    max_new_tokens: int = 16,
    eos_token_id: Optional[int] = None,
) -> Callable[[str, Optional[str]], str]:
    """(prompt, video_path) -> text over a VideoMLLM compose.

    Decodes `num_frames` frames with the production reader chain
    (data/video.py), resizes to the vision tower's grid, prepends a
    video-placeholder run sized to the tower's merged token count, and
    runs the cached-generate path with the pixels attached — the actual
    eval surface the reference's lmms-eval fork wraps
    (InternVideo3_eval scripts)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from internvideo_tpu.data import transforms
    from internvideo_tpu.data.video import read_video
    from internvideo_tpu.models.generation import generate

    vis = model.config.vision
    tps = vis.temporal_patch_size
    frames = max(num_frames - num_frames % tps, tps)
    side = vis.patch_size * vis.spatial_merge_size * 2  # minimal 2x2 grid
    grid = (side // vis.patch_size) // vis.spatial_merge_size
    n_vis = (frames // tps) * grid * grid

    def _tok_ids(text: str) -> np.ndarray:
        try:  # HF-style tokenizer
            return np.asarray(
                tokenizer(text, return_tensors="np")["input_ids"][0]
            )
        except TypeError:  # data/tokenizer.py-style: texts -> batch dict
            return np.asarray(tokenizer([text])["input_ids"][0])

    def _decode(ids) -> str:
        if hasattr(tokenizer, "decode"):
            return tokenizer.decode(list(ids), skip_special_tokens=True)
        return " ".join(str(int(i)) for i in ids)

    mrope = bool(getattr(model.config.text, "mrope_section", None))

    def _video_positions(n_text: int) -> np.ndarray:
        """(3, 1, L) mrope rows: grid coords for the leading vision run,
        text advancing from the run's max edge (qwenvl_rope2d convention —
        equal-coordinate text rows reduce to plain rope)."""
        gt = frames // tps
        t_idx = np.repeat(np.arange(gt), grid * grid)
        h_idx = np.tile(np.repeat(np.arange(grid), grid), gt)
        w_idx = np.tile(np.arange(grid), gt * grid)
        vis = np.stack([t_idx, h_idx, w_idx])  # (3, n_vis)
        base = int(vis.max()) + 1
        text = np.broadcast_to(
            base + np.arange(n_text), (3, n_text)
        )
        return np.concatenate([vis, text], axis=1)[:, None, :]

    def _read_pixels(video: str) -> np.ndarray:
        clip = read_video(str(video), frames, sample="middle")
        clip = transforms.center_crop(
            transforms.resize_short_side(clip, side), side
        )
        return transforms.normalize(np.ascontiguousarray(clip))[None]

    def generate_fn(prompt: str, video: Optional[str]) -> str:
        text_ids = _tok_ids(prompt)
        if video is not None:
            pixels = _read_pixels(video)
            ids = np.concatenate([
                np.full(n_vis, model.config.video_token_id, np.int64),
                text_ids,
            ])[None]
            pos = (
                jnp.asarray(_video_positions(len(text_ids)))
                if mrope else None
            )
            out = generate(
                model, params, jnp.asarray(ids),
                video=jnp.asarray(pixels), position_ids=pos,
                max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
            )
        else:
            out = generate(
                model, params, jnp.asarray(text_ids[None]),
                max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
            )
        return _decode(np.asarray(out[0]))

    def loglikelihood_fn(
        context: str, continuation: str, video: Optional[str]
    ) -> tuple:
        """(loglikelihood, is_greedy) of `continuation` given `context`
        (+ optional video) — the lm-eval continuation-scoring contract:
        the pair is tokenized JOINTLY and split at the longest common
        prefix with the context-only encoding, so the scored continuation
        ids match the joint encoding (robust to trailing pad/sep framing
        tokenizers append — a plain length split would misalign them)."""
        pad = getattr(tokenizer, "pad_token_id", None)

        def _strip(ids):
            ids = list(np.asarray(ids))
            while pad is not None and ids and ids[-1] == pad:
                ids.pop()
            return np.asarray(ids, np.int64)

        ctx_ids = _strip(_tok_ids(context))
        whole_ids = _strip(_tok_ids(context + continuation))
        n_ctx = 0
        while (
            n_ctx < min(len(ctx_ids), len(whole_ids) - 1)
            and ctx_ids[n_ctx] == whole_ids[n_ctx]
        ):
            n_ctx += 1
        if n_ctx >= len(whole_ids):  # empty continuation encoding
            return (0.0, True)
        if video is not None:
            pixels = jnp.asarray(_read_pixels(video))
            ids = np.concatenate([
                np.full(n_vis, model.config.video_token_id, np.int64),
                whole_ids,
            ])
            pos = (
                jnp.asarray(_video_positions(len(whole_ids)))
                if mrope else None
            )
            prefix = n_vis
        else:
            pixels, pos, prefix = None, None, 0
            ids = np.asarray(whole_ids)
        out = model.apply(
            params, jnp.asarray(ids[None]), pixels, position_ids=pos
        )
        logp = jax.nn.log_softmax(
            out.logits[0].astype(jnp.float32), axis=-1
        )
        start = prefix + n_ctx  # first continuation token index in ids
        tgt = jnp.asarray(ids[start:])
        rows = logp[start - 1: len(ids) - 1]  # predictors of each tgt token
        ll = float(jnp.sum(jnp.take_along_axis(rows, tgt[:, None], 1)))
        greedy = bool(jnp.all(jnp.argmax(rows, axis=-1) == tgt))
        return (ll, greedy)

    generate_fn.loglikelihood_fn = loglikelihood_fn
    return generate_fn


# ---------------------------------------------------------------------------
# Offline harness-format runner
# ---------------------------------------------------------------------------


def run_offline(
    adapter: InternVideoTPULmms,
    items: Iterable[dict],
    *,
    task: str,
    output_dir: str,
    use_subtitles: bool = False,
) -> dict:
    """Run an MCQ item list through the harness interface and write
    lmms-eval-format artifacts (results.json + samples jsonl).

    Each item: {"question", "options", "answer", "video"(opt),
    "category"(opt)}. Returns the results dict.
    """
    items = list(items)

    def doc_to_visual(doc_id):
        v = items[doc_id].get("video")
        return [v] if v else []

    requests = []
    for i, it in enumerate(items):
        prompt = build_mcq_prompt(
            it["question"], it["options"],
            it.get("subtitles") if use_subtitles else None,
        )
        requests.append(_FakeInstance(
            args=(prompt, {"max_new_tokens": 16}, doc_to_visual, i, task,
                  "test"),
        ))

    texts = adapter.generate_until(requests)

    samples = []
    n_correct = 0
    for i, (it, text) in enumerate(zip(items, texts)):
        pred = parse_option_letter(text)
        gold = str(it["answer"]).strip().upper()
        ok = pred == gold
        n_correct += int(ok)
        samples.append({
            "doc_id": i,
            "doc": {k: it[k] for k in ("question", "options") if k in it},
            "target": gold,
            "filtered_resps": [pred],
            "resps": [[text]],
            "exact_match": float(ok),
        })

    acc = n_correct / max(len(items), 1)
    results = {
        "results": {task: {"exact_match,none": acc,
                           "exact_match_stderr,none": 0.0}},
        "versions": {task: "Yaml"},
        "n-shot": {task: 0},
        "configs": {
            task: {
                "task": task,
                "output_type": "generate_until",
                "metric_list": [{"metric": "exact_match"}],
            }
        },
        "model_configs": {
            "model": "internvideo_tpu",
            "batch_size": adapter.batch_size_per_gpu,
        },
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
    }

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    with open(
        os.path.join(output_dir, f"{task}_samples.jsonl"), "w"
    ) as f:
        for s in samples:
            f.write(json.dumps(s) + "\n")
    return results
