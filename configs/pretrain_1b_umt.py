"""InternVideo2-1B UMT masked pretrain — production recipe.

Mirrors the reference's flagship stage-1 recipe
(single_modality/scripts/pretraining/1B_pt.sh): 16f@224 tubelet-1 student,
attention-guided masking at ratio 0.8, frozen InternVL-CLIP-6B teacher
(3200-wide, 6 return layers, final 768) + VideoMAE-g14-hybrid teacher
(1408-wide, 4 return layers, tubelet 2), both aligns l2 with ratio 1,
AdamW lr 1.5e-4 betas (0.9, 0.98) eps 1e-6 wd 0.05 clip 3.0, bf16,
drop-path 0.25, batch 32/chip, rematerialized blocks.

The reference runs 128 GPUs x bs32 for ~300 epochs of a 1.1M-clip corpus
(~10.3M clips/epoch => ~100k steps at global batch 4096); total_steps here
assumes a comparable global batch via MeshConfig(fsdp=-1) over a pod
slice. Plug a masked-video loader into data["stream"].
"""

from internvideo_tpu.cli.train import RunConfig
from internvideo_tpu.core.mesh import MeshConfig
from internvideo_tpu.models.internvideo2 import make_config
from internvideo_tpu.models.pretrain import PretrainConfig
from internvideo_tpu.models.teachers import TeacherConfig
from internvideo_tpu.train.engines.pretrain import UMTPretrainConfig
from internvideo_tpu.train.optim import OptimizerConfig
from internvideo_tpu.train.trainer import TrainerConfig

TOTAL_STEPS = 100_000

config = RunConfig(
    task="pretrain",
    trainer=TrainerConfig(
        total_steps=TOTAL_STEPS,
        log_every=100,
        checkpoint_dir="checkpoints/1b_umt_pt",
        checkpoint_every=5_000,
        mesh=MeshConfig(replica=1, fsdp=-1, seq=1, tensor=1),
        optimizer=OptimizerConfig(
            lr=1.5e-4, min_lr=1e-5,
            warmup_steps=TOTAL_STEPS // 8,  # ~40 of 300 epochs
            total_steps=TOTAL_STEPS,
            b1=0.9, b2=0.98, eps=1e-6,
            weight_decay=0.05, clip_grad_norm=3.0,
        ),
    ),
    model=PretrainConfig(
        encoder=make_config(
            "1B",
            num_frames=16, img_size=224, tubelet_size=1,
            num_classes=0, drop_path_rate=0.25,
            dtype="bfloat16", param_dtype="float32",
            attn_impl="auto", remat=True,
        ),
        clip_output_dim=3200,        # clip_teacher_embed_dim
        clip_final_output_dim=768,   # clip_teacher_final_dim
        clip_return_layers=6,
        mae_output_dim=1408,         # mae_teacher_embed_dim
        mae_return_layers=4,
    ),
    # internvl_clip_6b (internvl_clip_vision.py:513): 3200/48L/25H, returns
    # attention for attention-guided masking
    teacher=TeacherConfig(
        embed_dim=3200, depth=48, num_heads=25, mlp_ratio=4.0,
        patch_size=14, img_size=224, clip_embed_dim=768,
        return_layers=6, tubelet_size=1,
        dtype="bfloat16", param_dtype="bfloat16",
    ),
    # mae_g14_hybrid (videomae.py): 1408-wide LayerNorm tower, tubelet 2
    mae_teacher=TeacherConfig(
        embed_dim=1408, depth=40, num_heads=16, mlp_ratio=48 / 11,
        patch_size=14, img_size=224, clip_embed_dim=768,
        return_layers=4, tubelet_size=2, norm_type="layernorm",
        qk_normalization=False,
        dtype="bfloat16", param_dtype="bfloat16",
    ),
    data={"batch_size": 32, "stream": None},
    engine=UMTPretrainConfig(
        mask_type="attention", mask_ratio=0.8, td_ratio=2,
        clip_loss_ratio=(1.0, 1.0), mae_loss_ratio=1.0,
    ),
)
