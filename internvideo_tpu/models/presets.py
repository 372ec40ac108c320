"""Production model config presets matching the published reference models.

Each preset mirrors the reference's released configuration so that converted
checkpoints drop in (citations per preset). These are configs only — build
the module and load weights via models/convert.py + core/checkpoint.py.
"""

from __future__ import annotations

import dataclasses

from internvideo_tpu.models.bert import BertConfig
from internvideo_tpu.models.internvideo2 import InternVideo2Config, make_config
from internvideo_tpu.models.llm import LLMConfig
from internvideo_tpu.models.mllm import MLLMConfig
from internvideo_tpu.models.videoclip import VideoCLIPConfig
from internvideo_tpu.models.vision_tower import VisionTowerConfig
from internvideo_tpu.nn.mla import MLAConfig


def internvideo2_encoder(size: str = "1B", **overrides) -> InternVideo2Config:
    """S/B/L/1B/6B encoder (internvideo2.py:546-601)."""
    return make_config(size, **overrides)


def internvideo2_stage2_1b(**overrides) -> VideoCLIPConfig:
    """Stage-2 VideoCLIP-1B: 1B vision tower + bert-large fusion tower
    (multi_modality configs: bert-large d=1024, fusion_layer 19,
    embed_dim 512)."""
    cfg = VideoCLIPConfig(
        vision=make_config(
            "1B", num_frames=4, img_size=224,
            dtype="bfloat16", param_dtype="float32",
        ),
        text=BertConfig(
            vocab_size=30522, hidden_size=1024, num_layers=24, num_heads=16,
            intermediate_size=4096, fusion_layer=19,
            dtype="bfloat16", param_dtype="float32",
        ),
        embed_dim=512,
    )
    return dataclasses.replace(cfg, **overrides)


def qwen3_8b_mla(**overrides) -> LLMConfig:
    """Qwen3-8B-MLA text model (xtuner qwen3.py:377-407): 36 layers,
    hidden 4096, SwiGLU 12288, MLA kv_lora 896 / 128 rope / 128 nope /
    128 v, rope_theta 5e6, mRoPE [24,20,20]."""
    cfg = LLMConfig(
        vocab_size=151936, hidden_size=4096, num_layers=36,
        intermediate_size=12288, rope_theta=5_000_000.0,
        mrope_section=(24, 20, 20),
        mla=MLAConfig(
            hidden_size=4096, num_heads=32, kv_lora_rank=896,
            qk_rope_head_dim=128, qk_nope_head_dim=128, v_head_dim=128,
            qkv_bias=True,
        ),
        dtype="bfloat16", param_dtype="bfloat16", remat=True,
    )
    return dataclasses.replace(cfg, **overrides)


def internvideo3_8b(**overrides) -> MLLMConfig:
    """InternVideo3-8B (internvideo3_config.py:19-120): SigLIP-style tower
    1152d/24L + deepstack [8,16,24] + Qwen3-8B-MLA text."""
    cfg = MLLMConfig(
        vision=VisionTowerConfig(
            hidden_size=1152, num_layers=24, num_heads=16,
            intermediate_size=4304, patch_size=16, temporal_patch_size=2,
            spatial_merge_size=2, pos_embed_grid=48,
            deepstack_indexes=(8, 16, 24), text_hidden_size=4096,
            dtype="bfloat16", param_dtype="bfloat16",
        ),
        text=qwen3_8b_mla(),
        image_token_id=151655,
        video_token_id=151656,
        vision_start_token_id=151652,
        vision_end_token_id=151653,
    )
    return dataclasses.replace(cfg, **overrides)
