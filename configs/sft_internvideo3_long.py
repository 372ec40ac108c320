"""InternVideo3-8B long-context SFT — production recipe.

Mirrors the reference's long-SFT configuration
(InternVideo3_sft/configs/internvideo3_sft_long.py): InternVideo3-8B
(SigLIP-style 1152d/24L tower + deepstack + Qwen3-8B-M²LA text), samples
hard-packed to 262,144 tokens (32768*2*4, :65), sequence parallel sp=4
(:177), global batch 8, AdamW lr 1e-5 -> 1e-6 cosine, chunked CE.

Data: point data["stream"] at a packed multimodal jsonl stream built with
data/mllm_tokenize.py (fps/pixel-budget frame sampling, placeholder
expansion, 3D-RoPE grids) + data/packing.hard_pack to PACK_LEN.
"""

from internvideo_tpu.cli.train import RunConfig
from internvideo_tpu.core.mesh import MeshConfig
from internvideo_tpu.models.presets import internvideo3_8b
from internvideo_tpu.train.engines.sft import SFTConfig
from internvideo_tpu.train.optim import OptimizerConfig
from internvideo_tpu.train.trainer import TrainerConfig

PACK_LEN = 32768 * 2 * 4  # 262,144 tokens (internvideo3_sft_long.py:65)
TOTAL_STEPS = 4_000       # ~1 epoch of the reference mix at global bs 8

config = RunConfig(
    task="sft",
    trainer=TrainerConfig(
        total_steps=TOTAL_STEPS,
        log_every=10,
        checkpoint_dir="checkpoints/iv3_sft_long",
        checkpoint_every=500,
        hf_export_every=2_000,
        # 4-way Ulysses sequence parallel (sp_size=4, :177) x fsdp for the
        # rest of the slice; global batch 8 sequences
        mesh=MeshConfig(replica=1, fsdp=-1, seq=4, tensor=1),
        optimizer=OptimizerConfig(
            lr=1e-5, min_lr=1e-6,
            warmup_steps=TOTAL_STEPS // 30,  # warmup_ratio 0.03
            total_steps=TOTAL_STEPS,
            weight_decay=0.01, clip_grad_norm=1.0,
        ),
    ),
    model=internvideo3_8b(),
    data={
        "batch_size": 8,
        "seq_len": PACK_LEN,
        "num_frames": 512,  # fps/pixel budgets cap per-video frames
        "stream": None,
    },
    engine=SFTConfig(ce_chunk_size=8192),
)
