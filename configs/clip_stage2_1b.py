"""InternVideo2 Stage-2 VideoCLIP-1B pretrain — production recipe.

Mirrors the reference's published stage-2 1B recipe
(multi_modality/scripts/pretraining/stage2/1B/config.py): 4f@224 masked
vision student (random masking 0.8, only_mask), bert-large text/fusion
tower (1024d, fusion_layer 19), embed 512, VTC+VTM+MLM at weight 1 with
hard negatives and MLM prob 0.5, AdamW lr 5e-5 betas (0.9, 0.98) wd 0.05
clip 3.0, bf16, batch 64/chip, cosine 10 epochs w/ 1 warmup. The published
recipe disables UTA (uta=0.0, clip_teacher=None) — the student starts from
converted stage-1 weights instead (load via --init-checkpoint / the clip
CLI's init_state_dict path); set engine.uta=1.0 plus a `teacher=` entry to
run the UTA-teacher variant (internvideo2_stage2_visual.py:107-236).

Plug a MetaLoader over (video, caption) corpora into data["stream"].
"""

from internvideo_tpu.cli.train import RunConfig
from internvideo_tpu.core.mesh import MeshConfig
from internvideo_tpu.models.bert import BertConfig
from internvideo_tpu.models.internvideo2 import make_config
from internvideo_tpu.models.pretrain import PretrainConfig
from internvideo_tpu.models.videoclip import VideoCLIPConfig
from internvideo_tpu.train.engines.clip import CLIPLossConfig
from internvideo_tpu.train.optim import OptimizerConfig
from internvideo_tpu.train.trainer import TrainerConfig

TOTAL_STEPS = 40_000  # ~10 epochs of a 25M-pair mix at global batch 4096
VIS = make_config(
    "1B",
    num_frames=4, img_size=224, tubelet_size=1, num_classes=0,
    dtype="bfloat16", param_dtype="float32",
    attn_impl="auto", remat=True,
)

config = RunConfig(
    task="clip",
    trainer=TrainerConfig(
        total_steps=TOTAL_STEPS,
        log_every=100,
        checkpoint_dir="checkpoints/stage2_1b",
        checkpoint_every=2_000,
        mesh=MeshConfig(replica=1, fsdp=-1, seq=1, tensor=1),
        optimizer=OptimizerConfig(
            lr=5e-5, min_lr=5e-7,  # min_lr_multi 0.01
            warmup_steps=TOTAL_STEPS // 10,
            total_steps=TOTAL_STEPS,
            b1=0.9, b2=0.98,
            weight_decay=0.05, clip_grad_norm=3.0,
        ),
    ),
    model=VideoCLIPConfig(
        vision=VIS,
        text=BertConfig(
            vocab_size=30522, hidden_size=1024, num_layers=24, num_heads=16,
            intermediate_size=4096, fusion_layer=19,
            dtype="bfloat16", param_dtype="float32",
        ),
        embed_dim=512,
        temp_init=0.07,
        pretrain=PretrainConfig(
            encoder=VIS,
            clip_output_dim=3200, clip_final_output_dim=768,
            clip_return_layers=6, mae_return_layers=0,
        ),
    ),
    data={"batch_size": 64, "text_len": 32, "stream": None},
    engine=CLIPLossConfig(
        vtc=1.0, vtm=1.0, mlm=1.0,
        vtm_hard_neg=True, mlm_probability=0.5,
        vocab_size=30522,
        uta=0.0,  # published recipe: masked student, no teacher branch
        mask_type="random", mask_ratio=0.8,
        clip_loss_ratio=(1.0, 1.0),
    ),
)
