"""ViCLIP / CLIP-flavor dual encoders, distill step, probing, MC-QA, prober."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from internvideo_tpu.eval.mcqa import mcqa_accuracy
from internvideo_tpu.models.internvideo2 import InternVideo2, InternVideo2Config
from internvideo_tpu.models.pretrain import PretrainConfig, PretrainInternVideo2
from internvideo_tpu.models.text_encoders import CLIPTextConfig, LLaMATextConfig
from internvideo_tpu.models.viclip import (
    InternVideo2CLIP,
    InternVideo2CLIPConfig,
    ViCLIP,
    ViCLIPConfig,
    clip_contrastive_loss,
)
from internvideo_tpu.train.engines.distill import DistillConfig, make_distill_step
from internvideo_tpu.train.optim import OptimizerConfig, build_optimizer
from internvideo_tpu.train.state import TrainState
from internvideo_tpu.utils.prober import (
    capture_activations,
    compare_activations,
)

VIS_TINY = InternVideo2Config(
    embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
    patch_size=14, img_size=28, num_frames=2, tubelet_size=1,
    clip_embed_dim=16, num_classes=0, attn_impl="xla",
)


def test_viclip_forward_and_loss():
    cfg = ViCLIPConfig(
        vision=dataclasses.replace(
            VIS_TINY, norm_type="layernorm", qk_normalization=False
        ),
        text=CLIPTextConfig(
            vocab_size=64, width=32, num_layers=2, num_heads=2,
            context_length=16, attn_impl="xla",
        ),
        embed_dim=24,
    )
    model = ViCLIP(cfg)
    video = jax.random.normal(jax.random.key(0), (3, 2, 28, 28, 3))
    ids = jax.random.randint(jax.random.key(1), (3, 10), 1, 60)
    params = model.init(jax.random.key(2), video, ids)
    out = model.apply(params, video, ids)
    assert out.video_proj.shape == (3, 24)
    assert out.text_proj.shape == (3, 24)
    loss = clip_contrastive_loss(out.video_proj, out.text_proj, out.logit_scale)
    assert np.isfinite(float(loss))
    # masked-token path
    keep = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (3, 4))
    out2 = model.apply(params, video, ids, keep_indices=keep)
    assert out2.video_proj.shape == (3, 24)


def test_internvideo2_clip_with_llama_text():
    cfg = InternVideo2CLIPConfig(
        vision=VIS_TINY,
        text=LLaMATextConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
            num_kv_heads=1, intermediate_size=64, attn_impl="xla",
        ),
        embed_dim=16,
    )
    model = InternVideo2CLIP(cfg)
    video = jax.random.normal(jax.random.key(0), (2, 2, 28, 28, 3))
    ids = jax.random.randint(jax.random.key(1), (2, 8), 1, 60)
    mask = jnp.ones((2, 8), jnp.int32).at[1, 5:].set(0)
    params = model.init(jax.random.key(2), video, ids, mask)
    out = model.apply(params, video, ids, mask)
    assert out.video_proj.shape == (2, 16)
    # padding must not affect the pooled text features
    ids2 = ids.at[1, 7].set(3)
    out2 = model.apply(params, video, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(out.text_proj[1]), np.asarray(out2.text_proj[1]), atol=1e-5
    )


def test_distill_step():
    teacher_cfg = dataclasses.replace(VIS_TINY, embed_dim=48, num_heads=2)
    teacher = InternVideo2(teacher_cfg)
    pre_cfg = PretrainConfig(
        encoder=VIS_TINY,
        clip_output_dim=48, clip_final_output_dim=16, clip_return_layers=2,
        mae_return_layers=0,
    )
    student = PretrainInternVideo2(pre_cfg)
    video = jax.random.normal(jax.random.key(0), (2, 2, 28, 28, 3))
    n = VIS_TINY.num_patches
    keep = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (2, n))
    t_params = teacher.init(jax.random.key(1), video)
    s_params = student.init(jax.random.key(2), video, keep)["params"]
    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=s_params,
        opt_state=tx.init(s_params), tx=tx, apply_fn=student.apply,
    )
    cfg = DistillConfig(
        teacher_layer_indices=(1, 0), mask_type="tube", mask_ratio=0.5,
    )
    step = jax.jit(make_distill_step(student, teacher, cfg))
    st, m = step(state, t_params, {"video": video}, jax.random.key(3))
    assert bool(m["finite"])
    losses = [float(m["loss"])]
    for _ in range(3):
        st, m = step(st, t_params, {"video": video}, jax.random.key(3))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_probing_freezes_backbone():
    model = InternVideo2(dataclasses.replace(VIS_TINY, num_classes=5))
    video = jax.random.normal(jax.random.key(0), (2, 2, 28, 28, 3))
    params = nn.unbox(model.init(jax.random.key(1), video)["params"])
    cfg = OptimizerConfig(
        lr=1e-2, total_steps=10,
        trainable_patterns=(r"head", r"fc_norm", r"clip_projector"),
    )
    tx, _ = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.sum(jnp.abs(updates["head"]["kernel"]))) > 0
    assert float(jnp.sum(jnp.abs(updates["blocks_0"]["mlp"]["fc1"]["kernel"]))) == 0


def test_mcqa():
    def ev(v):
        return v  # videos already "embedded" (B, E)

    def et(ids):
        return ids.astype(jnp.float32)

    videos = jnp.eye(2, 4)
    choices = jnp.stack([
        jnp.eye(3, 4),  # choice 0 matches video 0
        jnp.roll(jnp.eye(3, 4), 1, axis=1),  # choice 0 matches video 1
    ])
    data = [{"video": videos, "choice_ids": choices,
             "answer": np.array([0, 0])}]
    m = mcqa_accuracy(ev, et, data)
    assert m["accuracy"] == 100.0 and m["num"] == 2


def test_prober_capture_and_compare():
    model = InternVideo2(VIS_TINY)
    video = jax.random.normal(jax.random.key(0), (1, 2, 28, 28, 3))
    params = model.init(jax.random.key(1), video)
    _, acts = capture_activations(
        model, params, video, filter_patterns=[r"blocks_\d+$"]
    )
    assert any("blocks_0" in k for k in acts)
    report = compare_activations(acts, acts)
    assert all(
        v.get("ok", True) for k, v in report.items() if k != "__missing__"
    )
    # perturbed copy is flagged
    acts2 = {k: v + 1.0 for k, v in acts.items()}
    report = compare_activations(acts, acts2)
    assert any(
        not v.get("ok", True) for k, v in report.items() if k != "__missing__"
    )


def test_prober_step_scoped_dump_and_compare(tmp_path):
    """Step-scoped Prober workflow (xtuner prober.py parity): capture at
    chosen steps with micro-batch tags, per-rank npz + manifest.jsonl on
    disk, tensor-level and stats-only cross-impl diffing."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from internvideo_tpu.utils.prober import (
        Prober,
        ProberConfig,
        compare_dumps,
        load_dump,
        load_manifest,
    )

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(8, name="fc1")(x)
            x = nn.silu(x)
            return nn.Dense(4, name="fc2")(x)

    m = M()
    x = jnp.ones((2, 8))
    params = m.init(jax.random.key(0), x)

    pr_a = Prober(ProberConfig(str(tmp_path / "a"), steps=(0, 5)))
    assert pr_a.should_capture(5) and not pr_a.should_capture(3)
    out = pr_a.capture(m, params, x, step=5, tag="micro0")
    assert out.shape == (2, 4)

    # same params -> identical dump from a "second implementation"
    pr_b = Prober(ProberConfig(str(tmp_path / "b"), steps=(5,)))
    pr_b.capture(m, params, x, step=5, tag="micro0")

    dump = load_dump(str(tmp_path / "a"), 5, "micro0")
    assert any("fc1" in k for k in dump)
    man = load_manifest(str(tmp_path / "a"), 5, "micro0")
    assert all({"path", "shape", "dtype"} <= set(e) for e in man)
    assert all(e["nan"] == 0 for e in man if "nan" in e)

    rep = compare_dumps(str(tmp_path / "a"), str(tmp_path / "b"), step=5,
                        tag="micro0")
    assert all(v["ok"] for k, v in rep.items()
               if isinstance(v, dict) and "ok" in v)
    assert rep["__missing__"] == []

    # perturbed params -> flagged mismatch
    bad = jax.tree.map(lambda p: p + 0.5, params)
    pr_c = Prober(ProberConfig(str(tmp_path / "c"), steps=(5,)))
    pr_c.capture(m, bad, x, step=5, tag="micro0")
    rep = compare_dumps(str(tmp_path / "a"), str(tmp_path / "c"), step=5,
                        tag="micro0")
    assert any(not v["ok"] for k, v in rep.items()
               if isinstance(v, dict) and "ok" in v)

    # stats-only mode: manifest written, no npz, compare falls back
    pr_d = Prober(ProberConfig(str(tmp_path / "d"), steps=(5,),
                               save_tensors=False))
    pr_d.capture(m, params, x, step=5, tag="micro0")
    assert not (tmp_path / "d" / "step_000005" / "micro0_rank0.npz").exists()
    rep = compare_dumps(str(tmp_path / "a"), str(tmp_path / "d"), step=5,
                        tag="micro0")
    assert rep.get("stats_only") is True
    assert all(v["ok"] for k, v in rep.items()
               if isinstance(v, dict) and "ok" in v)
