"""Numerical parity: our JAX encoder vs the reference PyTorch encoder.

Loads the actual reference implementation (torch CPU, non-fused eval path),
copies its randomly-initialized weights through the convert bridge, and
compares full forward outputs. Target ≤1e-2 relative error (BASELINE.json);
fp32 CPU should give ~1e-5.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference_module  # noqa: E402

from internvideo_tpu.models.convert import (  # noqa: E402
    convert_internvideo2_encoder,
    torch_state_dict_to_numpy,
)
from internvideo_tpu.models.internvideo2 import (  # noqa: E402
    InternVideo2,
    InternVideo2Config,
)


@pytest.fixture(scope="module")
def ref_module():
    return load_reference_module(
        "InternVideo2/single_modality/models/internvideo2.py",
        extra_siblings=("pos_embed.py", "flash_attention_class.py"),
    )


def test_encoder_forward_parity(ref_module):
    torch.manual_seed(0)
    kwargs = dict(
        patch_size=14, img_size=56, num_frames=4, tubelet_size=1,
        embed_dim=64, depth=2, num_heads=2, mlp_ratio=4.0,
        attn_pool_num_heads=16, clip_embed_dim=32, num_classes=10,
        qkv_bias=False, qk_normalization=True, init_values=1e-5,
        drop_path_rate=0.0,
        use_flash_attn=False, use_fused_rmsnorm=False, use_fused_mlp=False,
    )
    ref = ref_module.InternVideo2(**kwargs).eval()

    cfg = InternVideo2Config(
        embed_dim=64, depth=2, num_heads=2, mlp_ratio=4.0,
        patch_size=14, img_size=56, num_frames=4, tubelet_size=1,
        attn_pool_num_heads=16, clip_embed_dim=32, num_classes=10,
        qkv_bias=False, qk_normalization=True, init_values=1e-5,
        attn_impl="xla",
    )
    model = InternVideo2(cfg)
    params = convert_internvideo2_encoder(
        torch_state_dict_to_numpy(ref.state_dict()), depth=cfg.depth
    )

    rng = np.random.RandomState(1)
    video = rng.randn(2, 4, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        # reference takes (B, C, T, H, W)
        ref_logits = ref(torch.from_numpy(video).permute(0, 4, 1, 2, 3))
    out = model.apply(params, video)

    np.testing.assert_allclose(
        np.asarray(out.logits), ref_logits.numpy(), atol=1e-4, rtol=1e-3
    )


def test_pos_embed_parity(ref_module):
    """Our sincos generator vs the reference's (models/pos_embed.py)."""
    ref_pe = load_reference_module(
        "InternVideo2/single_modality/models/pos_embed.py"
    )
    from internvideo_tpu.nn import embeds

    for dim, g, t in [(64, 4, 2), (128, 16, 8)]:
        ours = embeds.get_3d_sincos_pos_embed(dim, g, t, cls_token=True)
        theirs = ref_pe.get_3d_sincos_pos_embed(dim, g, t, cls_token=True)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)
    np.testing.assert_allclose(
        embeds.get_2d_sincos_pos_embed(32, 5),
        ref_pe.get_2d_sincos_pos_embed(32, 5),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        embeds.get_1d_sincos_pos_embed(32, 7),
        ref_pe.get_1d_sincos_pos_embed(32, 7),
        atol=1e-6,
    )


def test_pretrain_student_parity(ref_module):
    """Full UMT pretrain student vs the reference implementation."""
    ref_pre = load_reference_module(
        "InternVideo2/single_modality/models/internvideo2_pretrain.py",
        extra_siblings=("pos_embed.py", "flash_attention_class.py"),
    )
    from internvideo_tpu.models.convert import convert_internvideo2_pretrain
    from internvideo_tpu.models.internvideo2 import InternVideo2Config
    from internvideo_tpu.models.pretrain import (
        PretrainConfig,
        PretrainInternVideo2,
    )

    torch.manual_seed(0)
    ref = ref_pre.PretrainInternVideo2(
        patch_size=14, img_size=56, num_frames=4, tubelet_size=1,
        embed_dim=64, depth=3, num_heads=2, mlp_ratio=4.0,
        attn_pool_num_heads=16, clip_embed_dim=32,
        qkv_bias=False, qk_normalization=True, init_values=1e-5,
        drop_path_rate=0.0,
        use_flash_attn=False, use_fused_rmsnorm=False, use_fused_mlp=False,
        clip_teacher_embed_dim=48, clip_teacher_final_dim=40,
        clip_return_layer=2, clip_student_return_interval=1,
        mae_teacher_embed_dim=24, mae_return_layer=1,
    ).eval()

    cfg = PretrainConfig(
        encoder=InternVideo2Config(
            embed_dim=64, depth=3, num_heads=2, mlp_ratio=4.0,
            patch_size=14, img_size=56, num_frames=4, tubelet_size=1,
            attn_pool_num_heads=16, clip_embed_dim=32, num_classes=0,
            qkv_bias=False, qk_normalization=True, init_values=1e-5,
            attn_impl="xla",
        ),
        clip_output_dim=48, clip_final_output_dim=40, clip_return_layers=2,
        mae_output_dim=24, mae_return_layers=1,
    )
    model = PretrainInternVideo2(cfg)
    params = convert_internvideo2_pretrain(
        torch_state_dict_to_numpy(ref.state_dict()),
        depth=3, clip_return_layers=2, mae_return_layers=1,
    )

    rng = np.random.RandomState(1)
    video = rng.randn(2, 4, 56, 56, 3).astype(np.float32)
    n = cfg.encoder.num_patches  # 64
    n_vis = 16
    keep = np.stack([
        np.sort(rng.choice(n, n_vis, replace=False)) for _ in range(2)
    ]).astype(np.int32)

    # reference mask: (B, 1+N) bool, True = masked; cls never masked
    mask = np.ones((2, 1 + n), bool)
    mask[:, 0] = False
    for b in range(2):
        mask[b, 1 + keep[b]] = False

    with torch.no_grad():
        r_mid, r_final, r_mae = ref(
            torch.from_numpy(video).permute(0, 4, 1, 2, 3),
            torch.from_numpy(mask),
        )
    out = model.apply(params, video, keep)
    np.testing.assert_allclose(
        np.asarray(out.clip_middle), r_mid.numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.clip_final), r_final.numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.mae), r_mae.numpy(), atol=1e-4, rtol=1e-3
    )


def test_clip_teacher_parity(ref_module):
    """CLIPTeacher (frozen InternVL-CLIP image tower) vs
    internvl_clip_vision.py: intermediate z stack (ordering!), pooled
    projection, and the pooling attention used for attention-guided masks."""
    ref_clip = load_reference_module(
        "InternVideo2/single_modality/models/internvl_clip_vision.py",
        extra_siblings=("flash_attention_class.py",),
    )
    from internvideo_tpu.models.convert import (
        convert_internvl_clip_teacher,
    )
    from internvideo_tpu.models.teachers import CLIPTeacher, TeacherConfig

    torch.manual_seed(0)
    ref = ref_clip.InternVL_CLIP(
        patch_size=14, img_size=56, embed_dim=64, num_heads=2, mlp_ratio=4,
        init_values=0.1, qk_normalization=True, depth=3,
        use_flash_attn=False, use_fused_rmsnorm=False, use_fused_mlp=False,
        attn_pool_num_heads=16, clip_embed_dim=32, drop_path_rate=0.0,
        clip_return_layer=2, clip_return_interval=1, return_attn=True,
    ).eval()

    cfg = TeacherConfig(
        embed_dim=64, depth=3, num_heads=2, mlp_ratio=4.0,
        patch_size=14, img_size=56, clip_embed_dim=32,
        return_layers=2, return_interval=1.0,
        qk_normalization=True, init_values=0.1, attn_impl="xla",
    )
    model = CLIPTeacher(cfg)
    params = convert_internvl_clip_teacher(
        torch_state_dict_to_numpy(ref.state_dict()), depth=3
    )

    rng = np.random.RandomState(1)
    video = rng.randn(2, 4, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        r_z, r_pooled, r_attn = ref(
            torch.from_numpy(video).permute(0, 4, 1, 2, 3)
        )
    z, pooled, attn = model.apply(params, video)
    np.testing.assert_allclose(
        np.asarray(z), r_z.numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(pooled), r_pooled.numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(attn), r_attn.numpy(), atol=1e-4, rtol=1e-3
    )


def test_mae_teacher_parity(ref_module):
    """MAETeacher vs videomae.py VisionTransformer (g14-hybrid style):
    sinusoid pos table, final-norm-before-last-record, ascending z."""
    ref_mae = load_reference_module(
        "InternVideo2/single_modality/models/videomae.py",
    )
    from internvideo_tpu.models.convert import convert_videomae_teacher
    from internvideo_tpu.models.teachers import MAETeacher, TeacherConfig

    torch.manual_seed(0)
    ref = ref_mae.VisionTransformer(
        img_size=32, patch_size=16, embed_dim=48, depth=3, num_heads=2,
        mlp_ratio=4.0, qkv_bias=True, init_values=0.1,
        all_frames=4, tubelet_size=2,
        mae_return_layer=2, mae_return_interval=1,
    ).eval()

    cfg = TeacherConfig(
        embed_dim=48, depth=3, num_heads=2, mlp_ratio=4.0,
        patch_size=16, img_size=32, tubelet_size=2,
        return_layers=2, return_interval=1.0,
        init_values=0.1, norm_type="layernorm", attn_impl="xla",
    )
    model = MAETeacher(cfg)
    params = convert_videomae_teacher(
        torch_state_dict_to_numpy(ref.state_dict()), depth=3
    )

    rng = np.random.RandomState(1)
    video = rng.randn(2, 4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        r_z = ref(torch.from_numpy(video).permute(0, 4, 1, 2, 3))
    z = model.apply(params, video)
    np.testing.assert_allclose(
        np.asarray(z), r_z.numpy(), atol=1e-4, rtol=1e-3
    )


def test_beats_encoder_parity():
    """Faithful BEATs tower vs the reference torch module (random init),
    including weight-normed pos_conv, T5 relative bias and the GRU gate."""
    import torch

    ref_beats = load_reference_module(
        "InternVideo2/multi_modality/models/backbones/beats/BEATs.py",
        extra_siblings=("modules.py", "backbone.py"),
    )

    from internvideo_tpu.models.beats import BEATsConfig, BEATsEncoder
    from internvideo_tpu.models.convert import convert_beats

    layers, heads = 2, 4
    torch.manual_seed(0)
    rcfg = ref_beats.BEATsConfig({
        "input_patch_size": 8,
        "embed_dim": 24,
        "encoder_embed_dim": 32,
        "encoder_ffn_embed_dim": 64,
        "encoder_layers": layers,
        "encoder_attention_heads": heads,
        "conv_pos": 16,
        "conv_pos_groups": 4,
        "relative_position_embedding": True,
        "num_buckets": 32,
        "max_distance": 16,
        "gru_rel_pos": True,
        "deep_norm": True,
        "layer_norm_first": False,
        "dropout": 0.0,
        "attention_dropout": 0.0,
        "activation_dropout": 0.0,
        "dropout_input": 0.0,
        "encoder_layerdrop": 0.0,
    })
    ref = ref_beats.BEATs(rcfg).eval()

    cfg = BEATsConfig(
        input_patch_size=8, embed_dim=24, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_layers=layers,
        encoder_attention_heads=heads, conv_pos=16, conv_pos_groups=4,
        num_buckets=32, max_distance=16,
    )
    model = BEATsEncoder(cfg)
    params = convert_beats(
        torch_state_dict_to_numpy(ref.state_dict()), num_layers=layers
    )

    rng = np.random.RandomState(2)
    fbank = rng.randn(2, 32, 32).astype(np.float32)
    with torch.no_grad():
        r_out = ref(torch.from_numpy(fbank))
    tokens, pooled = model.apply(params, fbank)
    np.testing.assert_allclose(
        np.asarray(tokens), r_out.numpy(), atol=1e-4, rtol=1e-3
    )
    assert pooled.shape == (2, 32)


def test_training_loss_curve_vs_torch_reference(ref_module):
    """Golden loss-curve parity: identical init (converted weights),
    identical batches, plain SGD in both frameworks — per-step CE losses
    must track the torch reference (the reference's own multi-process test
    strategy asserts loss-curve similarity: _testing/testcase.py:77)."""
    import jax
    import jax.numpy as jnp
    import optax

    torch.manual_seed(0)
    kwargs = dict(
        patch_size=14, img_size=28, num_frames=2, tubelet_size=1,
        embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
        attn_pool_num_heads=4, clip_embed_dim=16, num_classes=5,
        qkv_bias=False, qk_normalization=True, init_values=1e-5,
        drop_path_rate=0.0,
        use_flash_attn=False, use_fused_rmsnorm=False, use_fused_mlp=False,
    )
    ref = ref_module.InternVideo2(**kwargs).train()

    cfg = InternVideo2Config(
        embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
        patch_size=14, img_size=28, num_frames=2, tubelet_size=1,
        attn_pool_num_heads=4, clip_embed_dim=16, num_classes=5,
        qkv_bias=False, qk_normalization=True, init_values=1e-5,
        attn_impl="xla",
    )
    model = InternVideo2(cfg)
    params = convert_internvideo2_encoder(
        torch_state_dict_to_numpy(ref.state_dict()), depth=cfg.depth
    )["params"]
    # jnp.asarray can zero-copy on CPU and the converter passes some torch
    # buffers through aliased — snapshot before torch's in-place opt steps
    params = jax.tree.map(lambda x: jnp.array(np.array(x, copy=True)), params)

    rng = np.random.RandomState(7)
    steps = 5
    videos = rng.randn(steps, 4, 2, 28, 28, 3).astype(np.float32)
    labels = rng.randint(0, 5, (steps, 4))

    lr = 0.05
    opt_t = torch.optim.SGD(ref.parameters(), lr=lr)
    ce = torch.nn.CrossEntropyLoss()
    torch_losses = []
    for s in range(steps):
        opt_t.zero_grad()
        logits = ref(torch.from_numpy(videos[s]).permute(0, 4, 1, 2, 3))
        loss = ce(logits, torch.from_numpy(labels[s]).long())
        loss.backward()
        opt_t.step()
        torch_losses.append(float(loss))

    tx = optax.sgd(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, video, label):
        def loss_fn(p):
            logits = model.apply({"params": p}, video).logits
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            return -jnp.mean(jnp.take_along_axis(logp, label[:, None], 1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for s in range(steps):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(videos[s]), jnp.asarray(labels[s])
        )
        jax_losses.append(float(loss))

    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=2e-3, atol=2e-3,
        err_msg=f"jax={jax_losses} torch={torch_losses}",
    )
    # the curves actually move (training is happening, not a frozen model)
    assert abs(torch_losses[-1] - torch_losses[0]) > 1e-3


def test_uniformerv2_parity():
    """Faithful UniFormerV2 vs the reference torch module (random init):
    Local MHRA convs + BN stats, CLIP blocks, dpe, Extractor head,
    sigmoid-balance blend."""
    import torch

    ref_mod = load_reference_module(
        "InternVideo1/Pretrain/UniFormerV2/slowfast/models/"
        "uniformerv2_model.py",
        extra_siblings=(),
        stub_modules={
            "slowfast": {}, "slowfast.utils": {},
            "slowfast.utils.logging": {
                "get_logger": lambda name: __import__("logging").getLogger(
                    name
                )
            },
        },
    )
    from internvideo_tpu.models.convert import convert_uniformerv2
    from internvideo_tpu.models.uniformerv2 import (
        UniFormerV2,
        UniFormerV2Config,
    )

    torch.manual_seed(0)
    ref = ref_mod.VisionTransformer(
        input_resolution=32, patch_size=8, width=32, layers=2, heads=2,
        output_dim=16, t_size=4, kernel_size=3, dw_reduction=2.0,
        temporal_downsample=True, no_lmhra=False, double_lmhra=True,
        return_list=[0, 1], n_layers=2, n_dim=32, n_head=2,
        mlp_factor=4.0, drop_path_rate=0.0, mlp_dropout=[0.0, 0.0],
        cls_dropout=0.0, num_classes=5, frozen=False,
    ).eval()
    # randomize BN stats + zero-init convs so the test is non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, torch.nn.Conv3d) and m.weight.abs().sum() == 0:
                m.weight.normal_(0, 0.05)
        ref.transformer.balance.normal_(0, 0.5)
        for dec in ref.transformer.dec:
            dec.attn.out_proj.weight.normal_(0, 0.05)
            for layer in (dec.mlp[-1],):
                layer.weight.normal_(0, 0.05)

    cfg = UniFormerV2Config(
        input_resolution=32, patch_size=8, width=32, layers=2, heads=2,
        t_size=4, kernel_size=3, dw_reduction=2.0, temporal_downsample=True,
        return_list=(0, 1), n_dim=32, n_head=2, num_classes=5,
    )
    model = UniFormerV2(cfg)
    params = convert_uniformerv2(
        torch_state_dict_to_numpy(ref.state_dict()), layers=2, n_global=2
    )
    rng = np.random.RandomState(3)
    video = rng.randn(2, 4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        # reference takes (B, C, T, H, W)
        r = ref(torch.from_numpy(video).permute(0, 4, 1, 2, 3))
    out = model.apply(params, video)
    np.testing.assert_allclose(
        np.asarray(out), r.numpy(), atol=1e-4, rtol=1e-3
    )


def test_beats_tokenizer_and_vq_parity():
    """Acoustic tokenizer (Tokenizers.py:73-173) + NormEMA VQ
    (quantizer.py:131-215) vs the reference torch modules: eval forward
    (codes/quantized/loss) through the converted checkpoint, and one
    training step of the EMA codebook update."""
    import sys

    import torch

    q_mod = load_reference_module(
        "InternVideo2/multi_modality/models/backbones/beats/quantizer.py")
    bb_mod = load_reference_module(
        "InternVideo2/multi_modality/models/backbones/beats/backbone.py")
    sys.modules["backbone"] = bb_mod
    sys.modules["quantizer"] = q_mod
    try:
        tok_mod = load_reference_module(
            "InternVideo2/multi_modality/models/backbones/beats/Tokenizers.py")
    finally:
        del sys.modules["backbone"], sys.modules["quantizer"]

    torch.manual_seed(0)
    layers, heads = 2, 4
    rcfg = tok_mod.TokenizersConfig({
        "input_patch_size": 8, "embed_dim": 24, "encoder_embed_dim": 32,
        "encoder_ffn_embed_dim": 64, "encoder_layers": layers,
        "encoder_attention_heads": heads, "conv_pos": 16,
        "conv_pos_groups": 4, "relative_position_embedding": True,
        "num_buckets": 32, "max_distance": 16, "gru_rel_pos": True,
        "deep_norm": True, "layer_norm_first": False, "dropout": 0.0,
        "attention_dropout": 0.0, "activation_dropout": 0.0,
        "dropout_input": 0.0, "encoder_layerdrop": 0.0,
        "quant_n": 24, "quant_dim": 8,
    })
    ref = tok_mod.Tokenizers(rcfg).eval()
    # initialize the codebook as a released checkpoint would be: l2-normed
    # random, initted
    with torch.no_grad():
        w = torch.randn(24, 8)
        w = torch.nn.functional.normalize(w, p=2, dim=-1)
        ref.quantize.embedding.weight.copy_(w)
        ref.quantize.embedding.initted.fill_(1)

    rng = np.random.RandomState(3)
    fbank = rng.randn(2, 32, 32).astype(np.float32)

    # reference extract_labels body minus the torchaudio preprocess
    # (Tokenizers.py:138-173)
    with torch.no_grad():
        t = torch.from_numpy(fbank).unsqueeze(1)
        feats = ref.patch_embedding(t)
        feats = feats.reshape(feats.shape[0], feats.shape[1], -1)
        feats = feats.transpose(1, 2)
        feats = ref.layer_norm(feats)
        feats = ref.post_extract_proj(feats)
        x, _ = ref.encoder(feats, padding_mask=None)
        qin = ref.quantize_layer(x)
        r_zq, r_loss, r_idx = ref.quantize(qin)

    from internvideo_tpu.models.beats import BEATsConfig, BEATsTokenizer
    from internvideo_tpu.models.convert import convert_beats_tokenizer

    cfg = BEATsConfig(
        input_patch_size=8, embed_dim=24, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_layers=layers,
        encoder_attention_heads=heads, conv_pos=16, conv_pos_groups=4,
        num_buckets=32, max_distance=16,
    )
    model = BEATsTokenizer(cfg, quant_n=24, quant_dim=8)
    variables = convert_beats_tokenizer(
        torch_state_dict_to_numpy(ref.state_dict()), num_layers=layers)
    zq, loss, idx = model.apply(variables, fbank)
    np.testing.assert_array_equal(np.asarray(idx), r_idx.reshape(2, -1).numpy())
    np.testing.assert_allclose(
        np.asarray(zq), r_zq.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(float(loss), float(r_loss), atol=1e-5)

    # --- EMA codebook update parity (one training forward of the VQ) ---
    import jax.numpy as jnp

    from internvideo_tpu.models.beats import NormEMAVectorQuantizer

    z = rng.randn(6, 8).astype(np.float32)
    ref_vq = q_mod.NormEMAVectorQuantizer(
        n_embed=24, embedding_dim=8, beta=1.0, kmeans_init=False,
        decay=0.9).train()
    with torch.no_grad():
        ref_vq.embedding.weight.copy_(w)
        ref_vq.embedding.initted.fill_(1)
    _ = ref_vq(torch.from_numpy(z))
    ours = NormEMAVectorQuantizer(num_tokens=24, codebook_dim=8, decay=0.9)
    state = {"quantizer": {
        "weight": jnp.asarray(w.numpy()),
        "cluster_size": jnp.zeros(24),
        "initted": jnp.asarray(True),
    }}
    (_, _, _), new_state = ours.apply(
        state, jnp.asarray(z), train=True, mutable=["quantizer"])
    np.testing.assert_allclose(
        np.asarray(new_state["quantizer"]["weight"]),
        ref_vq.embedding.weight.detach().numpy(), atol=1e-5, rtol=1e-5)
