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
    task: str = "finetune"  # finetune | pretrain | clip | sft | distill
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    model: object = None  # task-specific model config
    data: object = None  # task-specific data config / factory
    engine: object = None  # task-specific engine config


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
        lambda m, mesh: make_finetune_step(m, run.engine, mesh),
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
    print("config:", config_to_dict(run.trainer))

    if run.task == "finetune":
        trainer, batch = build_finetune(run)
        data = run.data.get("stream") or synthetic_stream(
            batch, run.model.num_classes
        )
        trainer.fit(data)
    else:
        raise SystemExit(
            f"task {run.task!r}: use the corresponding engine module "
            "(train/engines/) with Trainer directly; CLI wiring lands with "
            "the dataset registry"
        )


if __name__ == "__main__":
    main()
