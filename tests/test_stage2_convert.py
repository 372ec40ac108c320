"""Full stage-2 VideoCLIP checkpoint bridge: a torch-named state dict
(vision_encoder pretrain tower + text_encoder HF-BERT + heads + temp)
converts to a tree that matches VideoCLIP's init structure exactly and
runs the model."""

import jax
import jax.numpy as jnp
import numpy as np
from flax.core import meta

from stage2_synth import make_stage2_state_dict

from internvideo_tpu.models.bert import BertConfig
from internvideo_tpu.models.convert import convert_internvideo2_stage2
from internvideo_tpu.models.internvideo2 import InternVideo2Config
from internvideo_tpu.models.pretrain import PretrainConfig
from internvideo_tpu.models.videoclip import VideoCLIP, VideoCLIPConfig

D, DEPTH, HEADS = 32, 2, 2
TD, TL, TH, TI = 32, 2, 2, 64
CLIP_K, CLIP_OUT, CLIP_FIN = 2, 20, 16
EMBED = 16
PATCH, IMG, FRAMES = 8, 16, 2
VOCAB = 50


def test_stage2_checkpoint_converts_and_runs():
    sd = make_stage2_state_dict(
        np.random.default_rng(0),
        d=D, depth=DEPTH, patch=PATCH, img=IMG, frames=FRAMES,
        clip_k=CLIP_K, clip_out=CLIP_OUT, clip_fin=CLIP_FIN,
        td=TD, tl=TL, ti=TI, fusion_layer=1, vocab=VOCAB, embed=EMBED,
        max_pos=64,
    )
    params = convert_internvideo2_stage2(
        sd, depth=DEPTH, clip_return_layers=CLIP_K, text_layers=TL
    )

    enc = InternVideo2Config(
        embed_dim=D, depth=DEPTH, num_heads=HEADS, mlp_ratio=2.0,
        patch_size=PATCH, img_size=IMG, num_frames=FRAMES, tubelet_size=1,
        clip_embed_dim=CLIP_FIN, num_classes=0, attn_impl="xla",
    )
    cfg = VideoCLIPConfig(
        vision=enc,
        pretrain=PretrainConfig(
            encoder=enc, clip_output_dim=CLIP_OUT,
            clip_final_output_dim=CLIP_FIN, clip_return_layers=CLIP_K,
            mae_return_layers=0,
        ),
        text=BertConfig(
            vocab_size=VOCAB, hidden_size=TD, num_layers=TL, num_heads=TH,
            intermediate_size=TI, fusion_layer=1,
            max_position_embeddings=64,
        ),
        embed_dim=EMBED,
    )
    model = VideoCLIP(cfg)
    video = jnp.zeros((2, FRAMES, IMG, IMG, 3))
    ids = jnp.zeros((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    expected = meta.unbox(
        model.init(
            jax.random.key(0), video, ids, mask, init_all_branches=True
        )
    )

    # structural equality: every expected leaf exists with the right shape
    exp_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(expected)[0]
    }
    got_paths = {
        jax.tree_util.keystr(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    missing = set(exp_paths) - set(got_paths)
    extra = set(got_paths) - set(exp_paths)
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]
    for k in exp_paths:
        assert exp_paths[k] == got_paths[k], (k, exp_paths[k], got_paths[k])

    out = model.apply(params, video, ids, mask)
    assert out.vision_proj.shape == (2, EMBED)
    assert np.isfinite(float(jnp.sum(out.text_proj)))
