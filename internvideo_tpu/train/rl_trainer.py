"""RL trainer: rollout ↔ GRPO-train alternation with a replay buffer.

Counterpart of xtuner's RLTrainer (InternVideo3_sft/xtuner/v1/train/
rl_trainer.py:122, alternating `_rollout_step`:510 / `_train_step`:534) and
its ray dataflow/replay plumbing (ray/rollout/controller.py:163, dataflow,
judger). TPU-native restructuring: the rollout "engine" is not a separate
vLLM/SGLang process pool — rollouts run on the SAME params pytree the
trainer updates, so the reference's trainer↔rollout weight-synchronization
step (controller.py NCCL broadcast of every tensor) is a host pointer
assignment, and the replay buffer is plain host numpy (allocation decisions
are control flow, not compute).

Two rollout backends:

  * compiled (default): one XLA program — prefill + lax.scan sample-decode
    over a dense cache. Lowest overhead for fixed-shape, text-only groups.
  * ServingEngine (pass `engine=`): continuous batching over the paged KV
    pool (serve/engine.py), the production serving path — ragged prompt
    lengths, eos early-exit recycling pages mid-wave, and video prompts
    (VideoMLLM policies) via the engine's multimodal prefill. This is the
    counterpart of the reference's vLLM-backed rollout controller
    (ray/rollout/controller.py:163-500) collapsed onto the training chips.

Sharding: pass `mesh=` to run rollout/logp/update as GSPMD programs over
the step mesh — the batch dimension shards over the data-parallel axes
(replica, fsdp) and params take `param_shardings` (default: replicated =
DDP; pass train/state.param_shardings(...) output for FSDP). Parity of the
sharded update with the single-device update is pinned by
tests/test_rl_trainer.py and the driver dryrun (__graft_entry__._dryrun_rl).

Loop shape per iteration:
  1. rollout: each prompt is expanded into `group_size` samples, decoded
     with temperature sampling; behavior log-probs are recorded under the
     rollout-time params (teacher-forced — exact trainer numerics, so the
     reference's rollout-vs-trainer importance correction, rollout_is.py,
     is unnecessary by construction)
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
from jax.sharding import NamedSharding, PartitionSpec

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
    pad_token_id: int = 0  # pads ragged engine responses to max_new_tokens
    cache_dtype: str = "float32"
    # PPO minibatching: rows per optimizer update (None = the whole rollout
    # batch in one update — reference rl_trainer takes the same
    # global-batch/minibatch split). Must divide the rollout batch and stay
    # divisible by the data-parallel size under a mesh.
    minibatch_size: Optional[int] = None
    # grad accumulation within one update: the minibatch is split into this
    # many microbatches whose gradients are combined mask-weighted, so the
    # accumulated update is EXACTLY the unaccumulated one (token-mean loss)
    # at 1/grad_accum the activation memory.
    grad_accum: int = 1


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
    (models/llm.MLATransformer interface) or a VideoMLLM (video prompts
    need `engine=`). reward_fn runs on host.

    mesh: optional jax.sharding.Mesh — rollout, logp and update become
      GSPMD programs with the batch sharded over (replica, fsdp).
    param_shardings: pytree of NamedShardings for params/opt-state leaves
      (default: fully replicated on `mesh`).
    engine: optional serve.ServingEngine built on the SAME model; must be
      constructed with temperature == cfg.rollout_temperature. The trainer
      points engine.params at its own updated pytree before each wave.
    """

    def __init__(
        self,
        model,
        params,
        cfg: RLTrainerConfig,
        reward_fn: Callable[[np.ndarray, np.ndarray], float],
        optimizer: Optional[optax.GradientTransformation] = None,
        *,
        mesh=None,
        param_shardings=None,
        engine=None,
    ):
        self.model = model
        self.cfg = cfg
        self.reward_fn = reward_fn
        self.tx = optimizer or optax.adam(cfg.lr)
        self.mesh = mesh
        self.engine = engine
        if engine is not None and (
            abs(engine.temperature - cfg.rollout_temperature) > 1e-9
        ):
            raise ValueError(
                f"engine.temperature ({engine.temperature}) must match "
                f"cfg.rollout_temperature ({cfg.rollout_temperature})"
            )
        if mesh is not None:
            replicated = NamedSharding(mesh, PartitionSpec())
            self._param_sh = param_shardings if param_shardings is not None \
                else jax.tree.map(lambda _: replicated, params)
            params = jax.device_put(params, self._param_sh)
            # opt-state leaves inherit their params' shardings via GSPMD
            # propagation through the jitted init
            self.opt_state = jax.jit(self.tx.init)(params)
            self._batch_sh = NamedSharding(
                mesh, PartitionSpec(("replica", "fsdp"))
            )
        else:
            self.opt_state = self.tx.init(params)
            self._batch_sh = None
        self.params = params
        # frozen reference policy for the KL penalty (rl_trainer keeps a
        # separate ref worker; here it is just the initial params pytree)
        self.ref_params = params if cfg.grpo.kl_beta > 0 else None
        self.buffer = ReplayBuffer()

        self._rollout = jax.jit(self._rollout_fn)
        self._logp = jax.jit(self._logp_fn, static_argnames=("has_video",))
        self._update = jax.jit(self._update_fn)
        self._grads = jax.jit(self._grads_fn)
        self._apply = jax.jit(self._apply_fn, donate_argnums=(2,))
        self._iter = 0  # fit() iteration counter (checkpoint/resume state)
        self._rng = None  # set by fit(); saved/restored with checkpoints

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

    def _logp_fn(self, params, full_ids, video=None, *, has_video=False):
        """(B, L) -> (B, L-1) next-token log-probs under `params`."""
        if has_video:
            out = self.model.apply(
                params, full_ids, video, with_logits=True
            )
        else:
            out = self.model.apply(params, full_ids, with_logits=True)
        return token_logprobs(out.logits[:, :-1], full_ids[:, 1:])

    def _update_fn(self, params, opt_state, batch, ref_params):
        (loss, metrics), grads = jax.value_and_grad(
            self._loss_of, has_aux=True
        )(params, batch, ref_params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    def _loss_of(self, params, batch, ref_params):
        has_video = "video" in batch
        video = batch.get("video")
        logp = self._logp_fn(
            params, batch["full_ids"], video, has_video=has_video
        )
        logp_ref = None
        if ref_params is not None:
            logp_ref = jax.lax.stop_gradient(
                self._logp_fn(
                    ref_params, batch["full_ids"], video,
                    has_video=has_video,
                )
            )
        return grpo_policy_loss(
            logp, batch["logp_old"], batch["advantages"],
            batch["mask"], self.cfg.grpo, logp_ref=logp_ref,
        )

    def _grads_fn(self, params, batch, ref_params):
        """Mask-weighted gradient microstep for exact grad accumulation.

        grpo_policy_loss is token-mean normalized, so the whole-minibatch
        gradient equals sum_k(denom_k * grad_k) / sum_k(denom_k) over
        microbatches — this returns the denom-scaled grads + denom so the
        host loop can combine them exactly."""
        (loss, metrics), grads = jax.value_and_grad(
            self._loss_of, has_aux=True
        )(params, batch, ref_params)
        # raw token count (not clamped): a zero-mask microbatch contributes
        # zero weight, keeping the combine identical to the whole batch
        denom = jnp.sum(batch["mask"])
        scaled = jax.tree.map(lambda g: g * denom, grads)
        smetrics = {
            k: v * denom for k, v in dict(metrics, loss=loss).items()
        }
        return scaled, denom, smetrics

    def _apply_fn(self, params, opt_state, grads_scaled, total_denom):
        total = jnp.maximum(total_denom, 1.0)
        grads = jax.tree.map(lambda g: g / total, grads_scaled)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    # ---- host orchestration ----------------------------------------------

    def _put_batch(self, arr):
        """Shard a rollout array over the data-parallel mesh axes."""
        arr = jnp.asarray(arr)
        if self._batch_sh is None:
            return arr
        dp = int(np.prod([
            self.mesh.shape[a] for a in ("replica", "fsdp")
        ]))
        if arr.shape[0] % dp:
            raise ValueError(
                f"rollout batch {arr.shape[0]} (prompts x group_size) must "
                f"be divisible by the data-parallel size {dp}"
            )
        return jax.device_put(arr, self._batch_sh)

    def _engine_rollout(self, expanded: np.ndarray, videos) -> np.ndarray:
        """Continuous-batching rollout: submit every (prompt, video) sample
        to the ServingEngine, drain, pad ragged responses (eos early-exits)
        to max_new_tokens with pad_token_id."""
        cfg = self.cfg
        eng = self.engine
        eng.params = self.params  # weight sync = pointer swap (same chips)
        eng.reset()
        rids = [
            eng.submit(
                expanded[i], cfg.max_new_tokens,
                video=None if videos is None else videos[i],
            )
            for i in range(expanded.shape[0])
        ]
        outs = eng.run()
        gen = np.full(
            (expanded.shape[0], cfg.max_new_tokens), cfg.pad_token_id,
            np.int32,
        )
        lengths = np.zeros(expanded.shape[0], np.int32)
        for i, rid in enumerate(rids):
            toks = outs[rid]
            gen[i, : len(toks)] = toks
            lengths[i] = len(toks)
        return gen, lengths

    def rollout_step(self, prompt_ids: np.ndarray, rng, videos=None) -> dict:
        """Expand prompts × group_size, sample, judge, store in the buffer.

        prompt_ids: (P, Lp) int32. videos: optional (P, T, H, W, 3) pixels
        aligned with prompts (VideoMLLM policies; needs `engine=`).
        Returns summary metrics (mean reward).
        """
        cfg = self.cfg
        g = cfg.grpo.group_size
        p, lp = prompt_ids.shape
        expanded = np.repeat(np.asarray(prompt_ids), g, axis=0)  # (P*G, Lp)
        vid_expanded = None
        if videos is not None:
            if self.engine is None:
                raise ValueError(
                    "video prompts need the ServingEngine rollout backend "
                    "(pass engine=)"
                )
            vid_expanded = np.repeat(np.asarray(videos), g, axis=0)
        lengths = None
        if self.engine is not None:
            gen, lengths = self._engine_rollout(expanded, vid_expanded)
        else:
            gen = np.asarray(
                self._rollout(
                    self.params, self._put_batch(expanded), rng
                )
            )

        # response mask over next-token positions (L-1 slots): slot i
        # predicts full_ids[i+1], so response slots start at lp-1; truncate
        # after the first eos (inclusive). Engine responses carry their true
        # lengths (already eos-truncated, pad_token_id-padded).
        t = gen.shape[1]
        mask = np.zeros((p * g, lp + t - 1), np.float32)
        for row in range(p * g):
            end = t if lengths is None else int(lengths[row])
            if lengths is None and cfg.eos_token_id is not None:
                hits = np.nonzero(gen[row] == cfg.eos_token_id)[0]
                if hits.size:
                    end = int(hits[0]) + 1
            mask[row, lp - 1 : lp - 1 + end] = 1.0

        full_ids = np.concatenate([expanded, gen], axis=1)
        logp_args = (self._put_batch(full_ids),)
        if vid_expanded is not None:
            logp_args += (self._put_batch(vid_expanded),)
        logp_old = np.asarray(
            self._logp(
                self.params, *logp_args, has_video=vid_expanded is not None
            )
        )
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
        batch = {
            "full_ids": full_ids,
            "logp_old": logp_old,
            "advantages": advantages,
            "mask": mask,
        }
        if vid_expanded is not None:
            batch["video"] = vid_expanded
        self.buffer.add(batch)
        return {"reward_mean": float(rewards.mean())}

    def train_step(self) -> dict:
        """ppo_epochs GRPO updates over the drained buffer.

        With `minibatch_size` set, each rollout batch is split into
        minibatches that each take one optimizer update (PPO minibatching,
        reference rl_trainer global-batch/minibatch split); `grad_accum`
        further splits each minibatch into microbatches whose gradients
        combine mask-weighted into an update EXACTLY equal to the
        unaccumulated one (parity test: tests/test_rl_trainer.py)."""
        cfg = self.cfg
        batches = self.buffer.drain()
        metrics = {}
        for _ in range(cfg.ppo_epochs):
            for b in batches:
                rows = b["full_ids"].shape[0]
                mb = cfg.minibatch_size or rows
                if rows % mb:
                    raise ValueError(
                        f"minibatch_size {mb} must divide the rollout "
                        f"batch {rows}"
                    )
                for start in range(0, rows, mb):
                    sub = {k: v[start:start + mb] for k, v in b.items()}
                    metrics = self._minibatch_update(sub)
        return metrics

    def _minibatch_update(self, sub: dict) -> dict:
        cfg = self.cfg
        if cfg.grad_accum <= 1:
            jb = {k: self._put_batch(v) for k, v in sub.items()}
            self.params, self.opt_state, m = self._update(
                self.params, self.opt_state, jb, self.ref_params
            )
            return {k: float(v) for k, v in m.items()}
        rows = sub["full_ids"].shape[0]
        if rows % cfg.grad_accum:
            raise ValueError(
                f"grad_accum {cfg.grad_accum} must divide the minibatch "
                f"{rows}"
            )
        micro = rows // cfg.grad_accum
        acc_grads, total_denom, acc_metrics = None, 0.0, None
        for start in range(0, rows, micro):
            jb = {
                k: self._put_batch(v[start:start + micro])
                for k, v in sub.items()
            }
            grads, denom, sm = self._grads(self.params, jb, self.ref_params)
            if acc_grads is None:
                acc_grads, acc_metrics = grads, sm
            else:
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                acc_metrics = {
                    k: acc_metrics[k] + v for k, v in sm.items()
                }
            total_denom = total_denom + denom
        self.params, self.opt_state = self._apply(
            self.params, self.opt_state, acc_grads, total_denom
        )
        td = float(jnp.maximum(total_denom, 1.0))
        return {k: float(v) / td for k, v in acc_metrics.items()}

    # ---- checkpoint/resume (reference rl_trainer.py resume machinery) ----

    def _ckpt_state(self):
        rng = self._rng if self._rng is not None else jax.random.key(0)
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "iter": jnp.asarray(self._iter, jnp.int32),
            "rng": jax.random.key_data(rng),
        }

    def save_checkpoint(self, directory: str):
        """Orbax-save the full RL state (params, opt_state, iteration,
        sampling rng) so a killed run resumes mid-schedule."""
        from internvideo_tpu.core.checkpoint import CheckpointManager

        mngr = CheckpointManager(directory, async_save=False)
        mngr.save(self._iter, self._ckpt_state(), force=True)
        mngr.wait()
        mngr.close()

    def restore_checkpoint(self, directory: str) -> bool:
        """Restore the latest checkpoint in `directory`; returns True if
        one was found. ref_params (the frozen KL reference) is NOT part of
        the state — it is the pre-training policy, reconstructed by the
        caller the same way on every run."""
        from internvideo_tpu.core.checkpoint import CheckpointManager

        mngr = CheckpointManager(directory, async_save=False)
        restored = mngr.restore(self._ckpt_state())
        mngr.close()
        if restored is None:
            return False
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self._iter = int(restored["iter"])
        self._rng = jax.random.wrap_key_data(restored["rng"])
        return True

    def fit(self, prompt_batches, iterations: int, *, seed: int = 0,
            checkpoint_dir: Optional[str] = None,
            checkpoint_every: int = 0):
        """Alternate rollout/train (rl_trainer.py fit:652). prompt_batches:
        callable(i) -> (P, Lp) prompts, or (prompts, videos) for VideoMLLM
        policies, for iteration i. Returns history.

        With checkpoint_dir set, auto-resumes from the latest checkpoint
        (same iteration counter and sampling stream, so the resumed run
        continues the schedule) and saves every `checkpoint_every`
        iterations plus at the end."""
        history = []
        if self._rng is None:
            self._rng = jax.random.key(seed)
        saved_at = None
        if checkpoint_dir and self.restore_checkpoint(checkpoint_dir):
            saved_at = self._iter
        while self._iter < iterations:
            i = self._iter
            self._rng, sub = jax.random.split(self._rng)
            batch = prompt_batches(i)
            videos = None
            if isinstance(batch, tuple):
                batch, videos = batch
            r = self.rollout_step(np.asarray(batch), sub, videos=videos)
            m = self.train_step()
            history.append({**r, **m, "iter": i})
            self._iter = i + 1
            if checkpoint_dir and checkpoint_every and (
                self._iter % checkpoint_every == 0
            ):
                self.save_checkpoint(checkpoint_dir)
                saved_at = self._iter
        if checkpoint_dir and saved_at != self._iter:
            self.save_checkpoint(checkpoint_dir)
        return history
