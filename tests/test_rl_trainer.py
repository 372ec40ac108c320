"""RLTrainer: rollout↔GRPO alternation on a toy task — reward goes up,
KL stays bounded (xtuner rl_trainer.py:510/534 loop-closure parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from internvideo_tpu.models.llm import LLMConfig, MLATransformer
from internvideo_tpu.nn.mla import MLAConfig
from internvideo_tpu.train.rl import GRPOConfig
from internvideo_tpu.train.rl_trainer import ReplayBuffer, RLTrainer, RLTrainerConfig

TARGET = 3  # reward = fraction of generated tokens equal to this id


def _tiny_model():
    cfg = LLMConfig(
        vocab_size=16, hidden_size=32, num_layers=2, intermediate_size=64,
        mrope_section=None,
        mla=MLAConfig(
            hidden_size=32, num_heads=2, kv_lora_rank=16, q_lora_rank=None,
            qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8,
        ),
        attn_impl="xla",
    )
    model = MLATransformer(cfg)
    ids = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    return model, params


def test_replay_buffer():
    buf = ReplayBuffer()
    buf.add({"a": np.ones(2)})
    buf.add({"a": np.zeros(2)})
    assert len(buf) == 2
    items = buf.drain()
    assert len(items) == 2 and len(buf) == 0


def test_rl_reward_improves():
    model, params = _tiny_model()
    cfg = RLTrainerConfig(
        grpo=GRPOConfig(group_size=4, kl_beta=0.01),
        max_new_tokens=8, rollout_temperature=1.0, ppo_epochs=2, lr=3e-2,
    )

    def reward_fn(prompt_ids, response_ids):
        return float(np.mean(response_ids == TARGET))

    trainer = RLTrainer(model, params, cfg, reward_fn)
    prompts = np.tile(np.arange(4, dtype=np.int32)[None], (4, 1))  # (4, 4)
    history = trainer.fit(lambda i: prompts, iterations=12, seed=0)

    first = np.mean([h["reward_mean"] for h in history[:3]])
    last = np.mean([h["reward_mean"] for h in history[-3:]])
    assert last > first + 0.1, (first, last)
    # KL against the frozen reference stays finite and bounded
    kls = [h["kl"] for h in history if "kl" in h]
    assert all(np.isfinite(k) for k in kls)
    assert max(kls) < 50.0


def test_rl_eos_mask():
    """eos truncation: mask covers response tokens up to and incl. eos."""
    model, params = _tiny_model()
    cfg = RLTrainerConfig(
        grpo=GRPOConfig(group_size=2, kl_beta=0.0),
        max_new_tokens=6, eos_token_id=0, lr=1e-3,
    )
    trainer = RLTrainer(model, params, cfg, lambda p, r: 1.0)
    prompts = np.ones((2, 3), np.int32)
    trainer.rollout_step(prompts, jax.random.key(1))
    batch = trainer.buffer.items[0]
    lp = 3
    for row in range(batch["full_ids"].shape[0]):
        gen = batch["full_ids"][row, lp:]
        hits = np.nonzero(gen == 0)[0]
        end = (int(hits[0]) + 1) if hits.size else len(gen)
        expect = np.zeros(batch["mask"].shape[1], np.float32)
        expect[lp - 1 : lp - 1 + end] = 1.0
        np.testing.assert_array_equal(batch["mask"][row], expect)


def test_rl_trainer_with_gqa_model():
    """The rollout<->train loop drives the dense-GQA flavor unchanged
    (same init_cache/prefill/decode_step surface)."""
    import jax

    from internvideo_tpu.models.llm_gqa import GQAConfig, GQATransformer

    cfg = GQAConfig(
        vocab_size=32, hidden_size=32, num_layers=1, num_heads=2,
        num_kv_heads=1, intermediate_size=64, qk_norm=True, attn_impl="xla",
    )
    model = GQATransformer(cfg)
    ids = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.key(0), ids)

    rl_cfg = RLTrainerConfig(
        grpo=GRPOConfig(group_size=2, kl_beta=0.01),
        max_new_tokens=4, rollout_temperature=1.0, ppo_epochs=1, lr=1e-2,
    )
    trainer = RLTrainer(model, params, rl_cfg, lambda p, r: 1.0)
    prompts = np.tile(np.arange(4, dtype=np.int32)[None], (2, 1))
    history = trainer.fit(lambda i: prompts, iterations=2, seed=0)
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])


def test_rl_engine_rollout_reward_improves():
    """ServingEngine-backed rollout (continuous batching over paged KV,
    the production serving path — reference routes rollouts to vLLM,
    ray/rollout/controller.py:163): reward still improves, weight sync is
    the trainer->engine pointer swap."""
    from internvideo_tpu.serve import ServingEngine

    model, params = _tiny_model()
    cfg = RLTrainerConfig(
        grpo=GRPOConfig(group_size=4, kl_beta=0.01),
        max_new_tokens=8, rollout_temperature=1.0, ppo_epochs=2, lr=3e-2,
    )
    eng = ServingEngine(
        model, params, max_batch=4, page_size=4, num_pages=64,
        max_len=16, prompt_buckets=(4,), temperature=1.0, seed=7,
    )

    def reward_fn(prompt_ids, response_ids):
        return float(np.mean(response_ids == TARGET))

    trainer = RLTrainer(model, params, cfg, reward_fn, engine=eng)
    prompts = np.tile(np.arange(4, dtype=np.int32)[None], (4, 1))
    history = trainer.fit(lambda i: prompts, iterations=10, seed=0)

    first = np.mean([h["reward_mean"] for h in history[:3]])
    last = np.mean([h["reward_mean"] for h in history[-3:]])
    assert last > first + 0.1, (first, last)


def test_rl_engine_temperature_mismatch_rejected():
    from internvideo_tpu.serve import ServingEngine

    model, params = _tiny_model()
    eng = ServingEngine(
        model, params, max_batch=2, page_size=4, num_pages=16,
        max_len=16, prompt_buckets=(4,), temperature=0.7,
    )
    cfg = RLTrainerConfig(rollout_temperature=1.0)
    with np.testing.assert_raises(ValueError):
        RLTrainer(model, params, cfg, lambda p, r: 1.0, engine=eng)


def test_rl_sharded_update_parity():
    """One GRPO update sharded over the 8-device mesh (dp batch, replicated
    params) matches the single-device update — VERDICT r3 done-criterion."""
    from internvideo_tpu.core.mesh import MeshConfig, create_mesh

    model, params = _tiny_model()
    cfg = RLTrainerConfig(
        grpo=GRPOConfig(group_size=2, kl_beta=0.05),
        max_new_tokens=6, rollout_temperature=1.0, lr=1e-2,
    )

    def reward_fn(prompt_ids, response_ids):
        return float(np.mean(response_ids == TARGET))

    single = RLTrainer(model, params, cfg, reward_fn)
    prompts = np.tile(np.arange(4, dtype=np.int32)[None], (4, 1))  # 4x2=8
    single.rollout_step(prompts, jax.random.key(3))
    batch = {k: v.copy() for k, v in single.buffer.items[0].items()}

    mesh = create_mesh(
        MeshConfig(replica=1, fsdp=-1, seq=1, tensor=1, expert=1),
        devices=jax.devices()[:8],
    )
    sharded = RLTrainer(model, params, cfg, reward_fn, mesh=mesh)
    sharded.buffer.add(batch)

    m_single = single.train_step()
    m_sharded = sharded.train_step()
    assert abs(m_single["loss"] - m_sharded["loss"]) < 1e-5, (
        m_single["loss"], m_sharded["loss"],
    )
    for a, b in zip(
        jax.tree.leaves(single.params), jax.tree.leaves(sharded.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
        )


def test_rl_sharded_engine_reward_improves():
    """Multi-device RL loop closure: engine rollout + dp-sharded GRPO
    updates on the 8-device mesh; reward goes up."""
    from internvideo_tpu.core.mesh import MeshConfig, create_mesh
    from internvideo_tpu.serve import ServingEngine

    model, params = _tiny_model()
    cfg = RLTrainerConfig(
        grpo=GRPOConfig(group_size=4, kl_beta=0.01),
        max_new_tokens=8, rollout_temperature=1.0, ppo_epochs=2, lr=3e-2,
    )
    eng = ServingEngine(
        model, params, max_batch=4, page_size=4, num_pages=64,
        max_len=16, prompt_buckets=(4,), temperature=1.0, seed=11,
    )
    mesh = create_mesh(
        MeshConfig(replica=1, fsdp=-1, seq=1, tensor=1, expert=1),
        devices=jax.devices()[:8],
    )

    def reward_fn(prompt_ids, response_ids):
        return float(np.mean(response_ids == TARGET))

    trainer = RLTrainer(
        model, params, cfg, reward_fn, mesh=mesh, engine=eng
    )
    prompts = np.tile(np.arange(4, dtype=np.int32)[None], (4, 1))
    history = trainer.fit(lambda i: prompts, iterations=8, seed=0)
    first = np.mean([h["reward_mean"] for h in history[:3]])
    last = np.mean([h["reward_mean"] for h in history[-3:]])
    assert last > first + 0.05, (first, last)


def test_rl_video_grpo_smoke():
    """Video-prompt GRPO (VideoMLLM policy through the multimodal engine
    prefill): loop closes, loss finite, buffer batches carry pixels."""
    from internvideo_tpu.models.llm import LLMConfig
    from internvideo_tpu.models.mllm import MLLMConfig, VideoMLLM
    from internvideo_tpu.models.vision_tower import VisionTowerConfig
    from internvideo_tpu.nn.mla import MLAConfig
    from internvideo_tpu.serve import ServingEngine

    cfg = MLLMConfig(
        vision=VisionTowerConfig(
            hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=32, patch_size=8, temporal_patch_size=2,
            spatial_merge_size=2, pos_embed_grid=4,
            deepstack_indexes=(0,), text_hidden_size=32, attn_impl="xla",
        ),
        text=LLMConfig(
            vocab_size=32, hidden_size=32, num_layers=1,
            intermediate_size=64, mrope_section=None,
            mla=MLAConfig(
                hidden_size=32, num_heads=2, kv_lora_rank=16,
                qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8,
            ),
            attn_impl="xla",
        ),
        image_token_id=30, video_token_id=31,
    )
    model = VideoMLLM(cfg)
    videos = np.random.default_rng(0).standard_normal(
        (2, 2, 16, 16, 3)
    ).astype(np.float32)
    # 4 merged visual tokens -> 4 placeholders per prompt
    prompts = np.full((2, 6), 5, np.int32)
    prompts[:, 1:5] = 31
    params = model.init(
        jax.random.key(0), jnp.asarray(prompts), jnp.asarray(videos)
    )

    rl_cfg = RLTrainerConfig(
        grpo=GRPOConfig(group_size=2, kl_beta=0.0),
        max_new_tokens=4, rollout_temperature=1.0, lr=1e-2,
    )
    eng = ServingEngine(
        model, params, max_batch=2, page_size=4, num_pages=32,
        max_len=16, prompt_buckets=(8,), temperature=1.0, seed=5,
    )
    trainer = RLTrainer(
        model, params, rl_cfg, lambda p, r: float(np.mean(r == TARGET)),
        engine=eng,
    )
    history = trainer.fit(
        lambda i: (prompts, videos), iterations=2, seed=0
    )
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])


def test_rl_grad_accum_exact_parity():
    """grad_accum=4 must produce EXACTLY the unaccumulated update: the
    mask-weighted gradient combine reconstructs the token-mean loss's
    whole-batch gradient (VERDICT r4 item 7 — minibatched PPO updates)."""
    import copy

    model, params = _tiny_model()

    def reward_fn(prompt_ids, response_ids):
        return float(np.mean(response_ids == TARGET))

    base_cfg = dict(
        grpo=GRPOConfig(group_size=4, kl_beta=0.05),
        max_new_tokens=6, rollout_temperature=1.0, lr=1e-2,
    )
    a = RLTrainer(model, params, RLTrainerConfig(**base_cfg), reward_fn)
    b = RLTrainer(
        model, params, RLTrainerConfig(**base_cfg, grad_accum=4), reward_fn
    )
    prompts = np.tile(np.arange(4, dtype=np.int32)[None], (4, 1))  # 16 rows
    a.rollout_step(prompts, jax.random.key(1))
    b.buffer.add(copy.deepcopy(a.buffer.items[0]))

    ma = a.train_step()
    mb = b.train_step()
    assert abs(ma["loss"] - mb["loss"]) < 1e-6, (ma["loss"], mb["loss"])
    # exact in real arithmetic; f32 summation-order rounding leaves ~1e-6
    # per-element noise that adam's normalizer amplifies slightly
    for pa, pb in zip(
        jax.tree.leaves(a.params), jax.tree.leaves(b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), atol=1e-5, rtol=1e-4
        )


def test_rl_minibatch_updates():
    """minibatch_size splits one rollout batch into several sequential
    optimizer updates (PPO minibatching): 16 rows / minibatch 8 = 2 updates
    per epoch, and a bad split is rejected."""
    import pytest

    model, params = _tiny_model()

    def reward_fn(prompt_ids, response_ids):
        return float(np.mean(response_ids == TARGET))

    cfg = RLTrainerConfig(
        grpo=GRPOConfig(group_size=4, kl_beta=0.0),
        max_new_tokens=6, lr=1e-2, minibatch_size=8,
    )
    tr = RLTrainer(model, params, cfg, reward_fn)
    calls = []
    orig = tr._minibatch_update

    def spy(sub):
        calls.append(sub["full_ids"].shape[0])
        return orig(sub)

    tr._minibatch_update = spy
    prompts = np.tile(np.arange(4, dtype=np.int32)[None], (4, 1))  # 16 rows
    tr.rollout_step(prompts, jax.random.key(1))
    tr.train_step()
    assert calls == [8, 8]

    bad = RLTrainer(
        model, params,
        RLTrainerConfig(
            grpo=GRPOConfig(group_size=4), max_new_tokens=6,
            minibatch_size=5,
        ),
        reward_fn,
    )
    bad.rollout_step(prompts, jax.random.key(1))
    with pytest.raises(ValueError, match="minibatch_size"):
        bad.train_step()


def test_rl_checkpoint_resume_mid_run(tmp_path):
    """Kill-and-resume: fit() with checkpoint_dir saves (params, opt_state,
    iter, rng); a FRESH trainer resuming from the checkpoint finishes the
    schedule with bit-identical results to an uninterrupted run (VERDICT r4
    item 7 — RL state checkpoint/resume)."""
    model, params = _tiny_model()

    def reward_fn(prompt_ids, response_ids):
        return float(np.mean(response_ids == TARGET))

    def cfg():
        return RLTrainerConfig(
            grpo=GRPOConfig(group_size=4, kl_beta=0.01),
            max_new_tokens=6, rollout_temperature=1.0, lr=1e-2,
        )

    prompts = np.tile(np.arange(4, dtype=np.int32)[None], (4, 1))
    ckpt = str(tmp_path / "rl_ckpt")

    # interrupted run: 2 of 4 iterations, checkpoint every iteration
    tr1 = RLTrainer(model, params, cfg(), reward_fn)
    h1 = tr1.fit(lambda i: prompts, iterations=2, seed=0,
                 checkpoint_dir=ckpt, checkpoint_every=1)
    assert len(h1) == 2 and tr1._iter == 2

    # fresh process stand-in: new trainer, same init — resumes at iter 2
    tr2 = RLTrainer(model, params, cfg(), reward_fn)
    h2 = tr2.fit(lambda i: prompts, iterations=4, seed=0,
                 checkpoint_dir=ckpt)
    assert [h["iter"] for h in h2] == [2, 3]
    assert tr2._iter == 4

    # uninterrupted reference run
    tr3 = RLTrainer(model, params, cfg(), reward_fn)
    h3 = tr3.fit(lambda i: prompts, iterations=4, seed=0)
    for pa, pb in zip(
        jax.tree.leaves(tr2.params), jax.tree.leaves(tr3.params)
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), atol=1e-6, rtol=1e-6
        )
    assert abs(h2[-1]["reward_mean"] - h3[-1]["reward_mean"]) < 1e-9
