"""InternVideo2-1B K400 finetune — production-shaped reference config.

Mirrors the reference recipe (single_modality/scripts/finetuning K400 1B:
8 frames @ 224, layer-decay 0.9, mixup+cutmix, bf16). Data wiring expects a
CSV of (path, label) clips; plug a loader into data["stream"].
"""

from internvideo_tpu.cli.train import RunConfig
from internvideo_tpu.core.mesh import MeshConfig
from internvideo_tpu.data.mixup import MixupConfig
from internvideo_tpu.models.internvideo2 import make_config
from internvideo_tpu.train.engines.finetune import FinetuneConfig
from internvideo_tpu.train.optim import OptimizerConfig
from internvideo_tpu.train.trainer import TrainerConfig

NUM_CLASSES = 400

config = RunConfig(
    task="finetune",
    trainer=TrainerConfig(
        total_steps=20_000,
        log_every=50,
        checkpoint_dir="checkpoints/k400_1b",
        checkpoint_every=1_000,
        mesh=MeshConfig(replica=1, fsdp=-1, seq=1, tensor=1),
        optimizer=OptimizerConfig(
            lr=2e-5, min_lr=1e-6, warmup_steps=1_000, total_steps=20_000,
            weight_decay=0.05, clip_grad_norm=3.0,
            layer_decay=0.9, num_layers=40,
        ),
    ),
    model=make_config(
        "1B",
        num_frames=8, img_size=224,
        num_classes=NUM_CLASSES,
        drop_path_rate=0.25,
        dtype="bfloat16", param_dtype="float32",
        attn_impl="auto", remat=True,
    ),
    data={"batch_size": 32, "stream": None},
    engine=FinetuneConfig(
        mixup=MixupConfig(
            mixup_alpha=0.8, cutmix_alpha=1.0, label_smoothing=0.1,
            num_classes=NUM_CLASSES,
        ),
        num_classes=NUM_CLASSES,
    ),
)
