"""RL trainer: rollout ↔ GRPO-train alternation with a replay buffer.

Counterpart of xtuner's RLTrainer (InternVideo3_sft/xtuner/v1/train/
rl_trainer.py:122, alternating `_rollout_step`:510 / `_train_step`:534) and
its ray dataflow/replay plumbing (ray/rollout/controller.py:163, dataflow,
judger). TPU-native restructuring: the rollout "engine" is not a separate
vLLM/SGLang process pool — the policy itself runs a compiled
prefill + lax.scan sample-decode loop on the same mesh, so the reference's
trainer↔rollout weight synchronization step is free (one params pytree),
and the replay buffer is plain host numpy (allocation decisions are control
flow, not compute).

Loop shape per iteration:
  1. rollout: each prompt is expanded into `group_size` samples, decoded
     with temperature sampling; behavior log-probs are recorded under the
     rollout-time params
  2. reward: host `reward_fn(prompt_ids, response_ids) -> float` (the
     "judger" seam — plug rule-based or model judges here)
  3. advantages: group-relative normalization (GRPO)
  4. train: `ppo_epochs` GRPO updates over the buffer (clipped IS ratios,
     optional k3 KL against the frozen initial policy)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from internvideo_tpu.train.rl import (
    GRPOConfig,
    group_relative_advantages,
    grpo_policy_loss,
    token_logprobs,
)


@dataclasses.dataclass(frozen=True)
class RLTrainerConfig:
    grpo: GRPOConfig = GRPOConfig()
    max_new_tokens: int = 16
    rollout_temperature: float = 1.0
    ppo_epochs: int = 1
    lr: float = 1e-3
    eos_token_id: Optional[int] = None
    cache_dtype: str = "float32"


class ReplayBuffer:
    """Host-side rollout storage (xtuner dataflow/replay equivalent)."""

    def __init__(self):
        self.items: list[dict[str, np.ndarray]] = []

    def add(self, batch: dict[str, np.ndarray]):
        self.items.append(batch)

    def drain(self) -> list[dict[str, np.ndarray]]:
        out, self.items = self.items, []
        return out

    def __len__(self):
        return len(self.items)


class RLTrainer:
    """model: an LM module exposing __call__/init_cache/prefill/decode_step
    (models/llm.MLATransformer interface). reward_fn runs on host."""

    def __init__(
        self,
        model,
        params,
        cfg: RLTrainerConfig,
        reward_fn: Callable[[np.ndarray, np.ndarray], float],
        optimizer: Optional[optax.GradientTransformation] = None,
    ):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.reward_fn = reward_fn
        self.tx = optimizer or optax.adam(cfg.lr)
        self.opt_state = self.tx.init(params)
        # frozen reference policy for the KL penalty (rl_trainer keeps a
        # separate ref worker; here it is just the initial params pytree)
        self.ref_params = params if cfg.grpo.kl_beta > 0 else None
        self.buffer = ReplayBuffer()

        self._rollout = jax.jit(self._rollout_fn)
        self._logp = jax.jit(self._logp_fn)
        self._update = jax.jit(self._update_fn)

    # ---- compiled pieces -------------------------------------------------

    def _rollout_fn(self, params, prompt_ids, rng):
        """(B, Lp) prompts -> (B, T) sampled tokens, one XLA program."""
        cfg = self.cfg
        b, lp = prompt_ids.shape
        caches = self.model.apply(
            params, b, lp + cfg.max_new_tokens,
            jnp.dtype(cfg.cache_dtype), method="init_cache",
        )
        emb = self.model.apply(
            params, prompt_ids, method=lambda m, ids: m.embed_tokens(ids)
        )
        out = self.model.apply(params, emb, caches, method="prefill")
        caches = out.caches

        def sample(logits, key):
            logits = logits[:, -1].astype(jnp.float32)
            if cfg.rollout_temperature > 0:
                return jax.random.categorical(
                    key, logits / cfg.rollout_temperature, axis=-1
                )
            return jnp.argmax(logits, axis=-1)

        rng, sub = jax.random.split(rng)
        first = sample(out.logits, sub)

        def body(carry, step):
            token, caches, key = carry
            key, sub = jax.random.split(key)
            out = self.model.apply(
                params, token[:, None], caches, lp + step,
                method="decode_step",
            )
            nxt = sample(out.logits, sub)
            return (nxt, out.caches, key), token

        (_, _, _), tokens = jax.lax.scan(
            body, (first, caches, rng), jnp.arange(1, cfg.max_new_tokens)
        )
        return jnp.concatenate([first[None], tokens]).T  # (B, T)

    def _logp_fn(self, params, full_ids):
        """(B, L) -> (B, L-1) next-token log-probs under `params`."""
        out = self.model.apply(params, full_ids, with_logits=True)
        return token_logprobs(out.logits[:, :-1], full_ids[:, 1:])

    def _update_fn(self, params, opt_state, batch, ref_params):
        def loss_fn(p):
            logp = self._logp_fn(p, batch["full_ids"])
            logp_ref = None
            if ref_params is not None:
                logp_ref = jax.lax.stop_gradient(
                    self._logp_fn(ref_params, batch["full_ids"])
                )
            return grpo_policy_loss(
                logp, batch["logp_old"], batch["advantages"],
                batch["mask"], self.cfg.grpo, logp_ref=logp_ref,
            )

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    # ---- host orchestration ----------------------------------------------

    def rollout_step(self, prompt_ids: np.ndarray, rng) -> dict:
        """Expand prompts × group_size, sample, judge, store in the buffer.

        prompt_ids: (P, Lp) int32. Returns summary metrics (mean reward).
        """
        cfg = self.cfg
        g = cfg.grpo.group_size
        p, lp = prompt_ids.shape
        expanded = jnp.asarray(np.repeat(prompt_ids, g, axis=0))  # (P*G, Lp)
        gen = np.asarray(self._rollout(self.params, expanded, rng))

        # response mask over next-token positions (L-1 slots): slot i
        # predicts full_ids[i+1], so response slots start at lp-1; truncate
        # after the first eos (inclusive).
        t = gen.shape[1]
        mask = np.zeros((p * g, lp + t - 1), np.float32)
        for row in range(p * g):
            end = t
            if cfg.eos_token_id is not None:
                hits = np.nonzero(gen[row] == cfg.eos_token_id)[0]
                if hits.size:
                    end = int(hits[0]) + 1
            mask[row, lp - 1 : lp - 1 + end] = 1.0

        full_ids = np.concatenate([np.asarray(expanded), gen], axis=1)
        logp_old = np.asarray(self._logp(self.params, jnp.asarray(full_ids)))
        rewards = np.asarray(
            [
                self.reward_fn(np.asarray(prompt_ids[row // g]), gen[row])
                for row in range(p * g)
            ],
            np.float32,
        )
        advantages = np.asarray(
            group_relative_advantages(
                jnp.asarray(rewards), g, cfg.grpo.adv_eps
            )
        )
        self.buffer.add(
            {
                "full_ids": full_ids,
                "logp_old": logp_old,
                "advantages": advantages,
                "mask": mask,
            }
        )
        return {"reward_mean": float(rewards.mean())}

    def train_step(self) -> dict:
        """ppo_epochs GRPO updates over the drained buffer."""
        batches = self.buffer.drain()
        metrics = {}
        for _ in range(self.cfg.ppo_epochs):
            for b in batches:
                jb = {k: jnp.asarray(v) for k, v in b.items()}
                self.params, self.opt_state, m = self._update(
                    self.params, self.opt_state, jb, self.ref_params
                )
                metrics = {k: float(v) for k, v in m.items()}
        return metrics

    def fit(self, prompt_batches, iterations: int, *, seed: int = 0):
        """Alternate rollout/train (rl_trainer.py fit:652). prompt_batches:
        callable(i) -> (P, Lp) prompts for iteration i. Returns history."""
        history = []
        rng = jax.random.key(seed)
        for i in range(iterations):
            rng, sub = jax.random.split(rng)
            r = self.rollout_step(np.asarray(prompt_batches(i)), sub)
            m = self.train_step()
            history.append({**r, **m, "iter": i})
        return history
