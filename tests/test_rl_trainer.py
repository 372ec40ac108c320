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
