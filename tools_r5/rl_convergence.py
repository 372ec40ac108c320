"""Longer-horizon GRPO convergence (VERDICT r4 item 7): 64 new tokens,
24 iterations, minibatched updates with grad accumulation — the reward
curve must improve monotonically-ish (first-5 mean vs last-5 mean) and
the KL against the frozen reference stays bounded.

Task: reward = fraction of generated tokens equal to TARGET id. A tiny
MLA policy must shift its unconditional distribution toward TARGET under
clipped-ratio GRPO with a KL leash.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools_r5/rl_convergence.py
Writes tools_r5/rl_convergence_history.json for the record.
"""

import json
import os
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from internvideo_tpu.models.llm import LLMConfig, MLATransformer
from internvideo_tpu.nn.mla import MLAConfig
from internvideo_tpu.train.rl import GRPOConfig
from internvideo_tpu.train.rl_trainer import RLTrainer, RLTrainerConfig

TARGET = 3


def main():
    cfg = LLMConfig(
        vocab_size=16, hidden_size=32, num_layers=2, intermediate_size=64,
        mrope_section=None,
        mla=MLAConfig(
            hidden_size=32, num_heads=2, kv_lora_rank=16,
            qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8,
        ),
        attn_impl="xla",
    )
    model = MLATransformer(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((2, 4), jnp.int32))
    tcfg = RLTrainerConfig(
        grpo=GRPOConfig(group_size=8, kl_beta=0.005),
        max_new_tokens=64,  # the longer horizon the smoke tests lacked
        rollout_temperature=1.0, ppo_epochs=2, lr=2e-2,
        minibatch_size=16, grad_accum=2,
    )

    def reward_fn(prompt_ids, response_ids):
        return float(np.mean(response_ids == TARGET))

    trainer = RLTrainer(model, params, tcfg, reward_fn)
    prompts = np.tile(np.arange(4, dtype=np.int32)[None], (4, 1))
    t0 = time.perf_counter()
    history = trainer.fit(lambda i: prompts, iterations=24, seed=0)
    dt = time.perf_counter() - t0

    rewards = [h["reward_mean"] for h in history]
    kls = [h.get("kl", 0.0) for h in history]
    first5, last5 = float(np.mean(rewards[:5])), float(np.mean(rewards[-5:]))
    print(f"rewards: {['%.3f' % r for r in rewards]}")
    print(f"first5={first5:.3f}  last5={last5:.3f}  max_kl={max(kls):.2f}  "
          f"({dt:.0f}s)")
    assert last5 > first5 + 0.3, (first5, last5)
    assert all(np.isfinite(k) for k in kls) and max(kls) < 100.0
    out = os.path.join(os.path.dirname(__file__),
                       "rl_convergence_history.json")
    with open(out, "w") as f:
        json.dump({"history": history, "seconds": dt,
                   "config": {"max_new_tokens": 64, "iterations": 24,
                              "group_size": 8, "minibatch_size": 16,
                              "grad_accum": 2}}, f, indent=2)
    print(f"wrote {out}: converged (last5 {last5:.3f} > first5 "
          f"{first5:.3f} + 0.3)")


if __name__ == "__main__":
    main()
