"""Training CLI: one typed entry point for every workload.

    python -m internvideo_tpu.cli.train --config configs/finetune_tiny.py \
        trainer.total_steps=100 trainer.optimizer.lr=3e-4

The config file defines `config = RunConfig(...)`; dotlist overrides follow
(core/config.py). Replaces the reference's per-workload argparse scripts
(run_pretraining.py / run_finetuning.py / tasks/pretrain.py / xtuner sft.py).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

import jax
import numpy as np

from internvideo_tpu.core.config import apply_overrides, config_to_dict, load_config
from internvideo_tpu.train.trainer import Trainer, TrainerConfig


@dataclasses.dataclass(frozen=True)
class RunConfig:
    task: str = "finetune"  # finetune | pretrain | clip | clip_av | sft | distill
    # multi-host bootstrap: "auto" honors JAX_COORDINATOR_ADDRESS/env and
    # no-ops single-process; "off" skips entirely (core/distributed.py)
    distributed: str = "auto"
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    model: object = None  # task-specific model config
    data: object = None  # task-specific data config / factory
    engine: object = None  # task-specific engine config
    # frozen-teacher configs (pretrain: CLIP + MAE; distill: encoder;
    # stage-2 clip with engine.uta > 0: CLIP teacher)
    teacher: object = None
    mae_teacher: object = None


def build_finetune(run: RunConfig):
    import jax.numpy as jnp

    from internvideo_tpu.models.internvideo2 import InternVideo2
    from internvideo_tpu.train.engines.finetune import make_finetune_step

    model = InternVideo2(run.model)
    c = run.model
    video = jnp.zeros(
        (run.data["batch_size"], c.num_frames, c.img_size, c.img_size, 3)
    )
    batch = {"video": video, "label": jnp.zeros((run.data["batch_size"],), jnp.int32)}
    trainer = Trainer(
        run.trainer, model,
        lambda m, mesh, grad_accum=1: make_finetune_step(
            m, run.engine, mesh, grad_accum=grad_accum
        ),
        example_batch=batch,
        example_inputs=(video,),
    )
    return trainer, batch


def synthetic_stream(batch, num_classes, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield {
            "video": rng.normal(size=batch["video"].shape).astype(np.float32),
            "label": rng.integers(
                0, num_classes, size=batch["label"].shape
            ).astype(np.int32),
        }


def main(argv: Optional[list[str]] = None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    run: RunConfig = load_config(args.config)
    run = apply_overrides(run, args.overrides)
    if getattr(run, "distributed", "auto") != "off":
        from internvideo_tpu.core.distributed import initialize

        if initialize():
            print(
                f"distributed: process {jax.process_index()}/"
                f"{jax.process_count()}, {jax.device_count()} global devices"
            )
    print("config:", config_to_dict(run.trainer))

    if run.task == "finetune":
        trainer, batch = build_finetune(run)
        data = run.data.get("stream") or synthetic_stream(
            batch, run.model.num_classes
        )
        trainer.fit(data)
    elif run.task == "clip":
        trainer, batch = build_clip(run)
        data = run.data.get("stream") or _synthetic_clip_stream(
            batch, run.model.text.vocab_size
        )
        trainer.fit(data)
    elif run.task == "clip_av":
        trainer, batch = build_clip_av(run)
        data = run.data.get("stream") or _synthetic_av_stream(batch)
        trainer.fit(data)
    elif run.task == "sft":
        trainer, batch = build_sft(run)
        if run.data.get("jsonl"):
            data = _mllm_jsonl_stream(run)
        else:
            data = run.data.get("stream") or _synthetic_sft_stream(batch)
        trainer.fit(data)
    elif run.task == "pretrain":
        trainer, batch = build_pretrain(run)
        data = run.data.get("stream") or _synthetic_video_stream(batch)
        trainer.fit(data)
    elif run.task == "distill":
        trainer, batch = build_distill(run)
        data = run.data.get("stream") or _synthetic_video_stream(batch)
        trainer.fit(data)
    else:
        raise SystemExit(f"unknown task {run.task!r}")


def build_clip(run: RunConfig):
    import jax.numpy as jnp
    import numpy as np

    from internvideo_tpu.models.videoclip import VideoCLIP
    from internvideo_tpu.train.engines.clip import make_clip_train_step

    model = VideoCLIP(run.model)
    v = run.model.vision
    b, l = run.data["batch_size"], run.data.get("text_len", 32)
    batch = {
        "video": jnp.zeros((b, v.num_frames, v.img_size, v.img_size, 3)),
        "input_ids": jnp.zeros((b, l), jnp.int32),
        "attention_mask": jnp.ones((b, l), jnp.int32),
        "idx": jnp.arange(b, dtype=jnp.int32),
    }
    clip_teacher = None
    if getattr(run.engine, "uta", 0.0) > 0:
        # stage-2: frozen CLIP teacher drives masking + UTA targets
        from internvideo_tpu.models.teachers import CLIPTeacher

        clip_teacher = CLIPTeacher(run.teacher)

    def _clip_step_builder(m, mesh, grad_accum=1):
        teacher_params = None
        if clip_teacher is not None:
            from internvideo_tpu.train.state import sharded_frozen_variables

            # born sharded on the step's mesh (and loaded from a real
            # converted checkpoint when given — a random teacher trains
            # against noise)
            teacher_params = sharded_frozen_variables(
                clip_teacher, (batch["video"],), mesh,
                jax.random.key(run.trainer.seed + 1),
                checkpoint=run.data.get("teacher_checkpoint"),
            )
        return make_clip_train_step(
            m, run.engine, clip_teacher=clip_teacher,
            teacher_params=teacher_params, grad_accum=grad_accum,
        )

    trainer = Trainer(
        run.trainer, model,
        _clip_step_builder,
        example_batch=batch,
        example_inputs=(batch["video"], batch["input_ids"],
                        batch["attention_mask"]),
        init_kwargs={"init_all_branches": True},
    )
    ckpt = run.data.get("init_state_dict")
    if ckpt:
        # reference stage-2 checkpoint (torch naming) -> converted params
        trainer.load_params(_load_stage2_state_dict(ckpt, run))
    return trainer, batch


def build_clip_av(run: RunConfig):
    """Audio-visual stage-2 (M4): per-media VTC/VTM/MLM. The step is built
    for run.data["media_type"] ("video" | "audio" | "audio_video"); a
    MetaLoader schedule can alternate media types by running one task per
    media stream (the reference jits one step per media the same way)."""
    import jax.numpy as jnp

    from internvideo_tpu.models.videoclip_av import VideoCLIPAV
    from internvideo_tpu.train.engines.clip import make_av_clip_train_step

    model = VideoCLIPAV(run.model)
    v = run.model.vision
    a = run.model.audio
    b, l = run.data["batch_size"], run.data.get("text_len", 32)
    media_type = run.data.get("media_type", "audio_video")
    batch = {
        "video": jnp.zeros((b, v.num_frames, v.img_size, v.img_size, 3)),
        "audio": jnp.zeros((b, a.max_frames, a.n_mels)),
        "input_ids": jnp.zeros((b, l), jnp.int32),
        "attention_mask": jnp.ones((b, l), jnp.int32),
        "idx": jnp.arange(b, dtype=jnp.int32),
    }
    trainer = Trainer(
        run.trainer, model,
        lambda m, mesh, grad_accum=1: make_av_clip_train_step(
            m, run.engine, media_type, grad_accum=grad_accum,
        ),
        example_batch=batch,
        example_inputs=(batch["input_ids"], batch["attention_mask"]),
        init_kwargs={
            "video": batch["video"], "audio": batch["audio"],
            "media_type": media_type, "init_all_branches": True,
        },
    )
    return trainer, batch


def _synthetic_av_stream(batch, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    while True:
        yield {
            "video": rng.normal(size=batch["video"].shape).astype(np.float32),
            "audio": rng.normal(size=batch["audio"].shape).astype(np.float32),
            "input_ids": rng.integers(
                4, 40, batch["input_ids"].shape
            ).astype(np.int32),
            "attention_mask": np.ones(
                batch["attention_mask"].shape, np.int32
            ),
            "idx": np.arange(batch["idx"].shape[0], dtype=np.int32),
        }


def _load_stage2_state_dict(path: str, run: RunConfig):
    """Load a reference stage-2 state dict (.safetensors / .npz / torch
    .pth) and convert it (models/convert.convert_internvideo2_stage2)."""
    import numpy as np

    from internvideo_tpu.models.convert import convert_internvideo2_stage2

    if path.endswith(".safetensors"):
        from internvideo_tpu.core.checkpoint import read_safetensors

        sd = read_safetensors(path)
    elif path.endswith(".npz"):
        sd = dict(np.load(path))
    else:  # torch .pth
        import torch

        raw = torch.load(path, map_location="cpu")
        raw = raw.get("module", raw.get("model", raw))
        from internvideo_tpu.models.convert import torch_state_dict_to_numpy

        sd = torch_state_dict_to_numpy(raw)
    pre = run.model.pretrain
    return convert_internvideo2_stage2(
        sd,
        depth=run.model.vision.depth,
        clip_return_layers=pre.clip_return_layers if pre else 0,
        text_layers=run.model.text.num_layers,
    )


def _synthetic_video_stream(batch, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    while True:
        yield {
            "video": rng.normal(size=batch["video"].shape).astype(np.float32)
        }


def _num_visible_tokens(mask_type, mask_ratio, t_s, n_spatial):
    """Static visible count matching the engines' keep-index shapes."""
    from internvideo_tpu.data.masking import num_visible

    if mask_type in ("tube", "attention"):
        return t_s * num_visible(n_spatial, mask_ratio)
    return num_visible(t_s * n_spatial, mask_ratio)


def build_pretrain(run: RunConfig):
    """UMT dual-teacher masked pretraining (S7). Teachers are frozen; their
    params ride the step closure (random-init here — load converted
    checkpoints into `teacher_params` for real runs)."""
    import jax.numpy as jnp

    from internvideo_tpu.models.pretrain import PretrainInternVideo2
    from internvideo_tpu.models.teachers import CLIPTeacher, MAETeacher
    from internvideo_tpu.train.engines.pretrain import make_pretrain_step

    model = PretrainInternVideo2(run.model)
    clip_teacher = CLIPTeacher(run.teacher)
    mae_teacher = MAETeacher(run.mae_teacher)
    enc = run.model.encoder
    b = run.data["batch_size"]
    cfg = run.engine
    t_full = enc.num_frames * cfg.td_ratio
    video = jnp.zeros((b, t_full, enc.img_size, enc.img_size, 3))
    student_video = video[:, :: cfg.td_ratio]
    n_spatial = (enc.img_size // enc.patch_size) ** 2
    t_s = enc.num_frames // enc.tubelet_size
    n_vis = _num_visible_tokens(cfg.mask_type, cfg.mask_ratio, t_s, n_spatial)
    keep0 = jnp.zeros((b, n_vis), jnp.int32)

    rng = jax.random.key(run.trainer.seed + 1)

    def _pretrain_step_builder(m, mesh, grad_accum=1):
        from internvideo_tpu.train.state import sharded_frozen_variables

        # teachers born sharded on the step's mesh; real runs pass
        # data.clip_teacher_checkpoint / data.mae_teacher_checkpoint
        # (convert-CLI npz) — random teachers distill noise
        teacher_params = {
            "clip": sharded_frozen_variables(
                clip_teacher, (student_video,), mesh, rng,
                checkpoint=run.data.get("clip_teacher_checkpoint"),
            ),
            "mae": sharded_frozen_variables(
                mae_teacher, (video,), mesh, jax.random.fold_in(rng, 1),
                checkpoint=run.data.get("mae_teacher_checkpoint"),
            ),
        }
        raw = make_pretrain_step(
            model, clip_teacher, mae_teacher, cfg, grad_accum=grad_accum
        )
        return lambda state, batch, step_rng: raw(
            state, teacher_params, batch, step_rng
        )

    trainer = Trainer(
        run.trainer, model,
        _pretrain_step_builder,
        example_batch={"video": video},
        example_inputs=(student_video, keep0),
    )
    return trainer, {"video": video}


def build_distill(run: RunConfig):
    """Small-student distillation from a frozen encoder (S5/S9)."""
    import jax.numpy as jnp

    from internvideo_tpu.models.internvideo2 import InternVideo2
    from internvideo_tpu.models.pretrain import PretrainInternVideo2
    from internvideo_tpu.train.engines.distill import make_distill_step

    model = PretrainInternVideo2(run.model)
    teacher = InternVideo2(run.teacher)
    enc = run.model.encoder
    b = run.data["batch_size"]
    cfg = run.engine
    video = jnp.zeros((b, enc.num_frames, enc.img_size, enc.img_size, 3))
    n_spatial = (enc.img_size // enc.patch_size) ** 2
    t_s = enc.num_frames // enc.tubelet_size
    if cfg.mask_ratio > 0:
        n_vis = _num_visible_tokens(
            cfg.mask_type, cfg.mask_ratio, t_s, n_spatial
        )
    else:
        n_vis = enc.num_patches
    keep0 = jnp.zeros((b, n_vis), jnp.int32)

    def _distill_step_builder(m, mesh, grad_accum=1):
        from internvideo_tpu.train.state import sharded_frozen_variables

        teacher_params = sharded_frozen_variables(
            teacher, (video,), mesh,
            jax.random.key(run.trainer.seed + 1),
            checkpoint=run.data.get("teacher_checkpoint"),
        )
        raw = make_distill_step(model, teacher, cfg, grad_accum=grad_accum)
        return lambda state, batch, step_rng: raw(
            state, teacher_params, batch, step_rng
        )

    trainer = Trainer(
        run.trainer, model,
        _distill_step_builder,
        example_batch={"video": video},
        example_inputs=(video, keep0),
    )
    return trainer, {"video": video}


def _synthetic_clip_stream(batch, vocab_size, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    # ids must stay inside the text tower's vocab AND clear of the BERT
    # special ids mlm_corrupt writes (flax Embed fills NaN out of range)
    hi = min(1000, vocab_size)
    while True:
        yield {
            "video": rng.normal(size=batch["video"].shape).astype(np.float32),
            "input_ids": rng.integers(
                1, hi, size=batch["input_ids"].shape
            ).astype(np.int32),
            "attention_mask": np.ones_like(np.asarray(batch["attention_mask"])),
            "idx": np.arange(batch["idx"].shape[0], dtype=np.int32),
        }


def build_sft(run: RunConfig):
    import jax.numpy as jnp

    from internvideo_tpu.models.mllm import VideoMLLM
    from internvideo_tpu.train.engines.sft import make_sft_step
    from jax.sharding import PartitionSpec

    model = VideoMLLM(run.model)
    v = run.model.vision
    b = run.data["batch_size"]
    if run.data.get("jsonl"):
        # real data path: shapes follow the tokenize config's fixed grid
        tok = run.data["tokenize"]
        gt, gh, gw = tok.fixed_grid
        l = run.data["pack_max_length"]
        t = gt * tok.temporal_patch_size
        img_h, img_w = gh * tok.patch_size, gw * tok.patch_size
        pos = jnp.zeros((3, b, l), jnp.int32)
        pos_spec = PartitionSpec(None, ("replica", "fsdp"), "seq")
    else:
        l = run.data["seq_len"]
        t = run.data.get("num_frames", 2)
        img_h = img_w = run.data.get(
            "img_size", 2 * v.patch_size * v.spatial_merge_size
        )
        pos = jnp.zeros((b, l), jnp.int32)
        pos_spec = PartitionSpec(("replica", "fsdp"), "seq")
    batch = {
        "input_ids": jnp.zeros((b, l), jnp.int32),
        "segment_ids": jnp.zeros((b, l), jnp.int32),
        "position_ids": pos,
        "labels": jnp.zeros((b, l), jnp.int32),
        "video": jnp.zeros((b, t, img_h, img_w, 3)),
    }
    dp = ("replica", "fsdp")
    specs = {
        "input_ids": PartitionSpec(dp, "seq"),
        "segment_ids": PartitionSpec(dp, "seq"),
        "position_ids": pos_spec,
        "labels": PartitionSpec(dp, "seq"),
        "video": PartitionSpec(dp),
    }
    trainer = Trainer(
        run.trainer, model,
        lambda m, mesh, grad_accum=1: make_sft_step(
            m, run.engine, mesh=mesh, grad_accum=grad_accum
        ),
        example_batch=batch,
        example_inputs=(batch["input_ids"], batch["video"]),
        batch_specs=specs,
    )
    return trainer, batch


def _mllm_jsonl_stream(run: RunConfig):
    """Real SFT data path: jsonl + video files → packed multimodal batches
    (data/mllm_tokenize.py). run.data needs {"jsonl", "batch_size",
    "pack_max_length", "tokenize": MLLMTokenizeConfig with fixed_grid,
    optional "media_root", "tokenizer" (HF dir)}."""
    from internvideo_tpu.data.mllm_tokenize import (
        MLLMTokenizeFunction,
        mllm_sft_batches,
    )

    tok_cfg = run.data["tokenize"]
    if run.data.get("tokenizer"):
        from transformers import AutoTokenizer

        hf = AutoTokenizer.from_pretrained(
            run.data["tokenizer"], local_files_only=True
        )
        encode = lambda t: hf(t, add_special_tokens=False)["input_ids"]
    else:
        encode = lambda t: [1 + (ord(c) % 200) for c in t]  # byte fallback
    fn = MLLMTokenizeFunction(encode, tok_cfg)
    return mllm_sft_batches(
        run.data["jsonl"], fn,
        pack_max_length=run.data["pack_max_length"],
        media_root=run.data.get("media_root", ""),
        batch_size=run.data["batch_size"],
    )


def _synthetic_sft_stream(batch, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    while True:
        out = {
            k: np.asarray(v).copy() if k != "video"
            else rng.normal(size=v.shape).astype(np.float32)
            for k, v in batch.items()
        }
        ids = rng.integers(1, 100, size=batch["input_ids"].shape)
        out["input_ids"] = ids.astype(np.int32)
        out["labels"] = np.roll(ids, -1, axis=1).astype(np.int32)
        out["position_ids"] = np.broadcast_to(
            np.arange(ids.shape[1], dtype=np.int32), ids.shape
        ).copy()
        yield out


if __name__ == "__main__":
    main()
