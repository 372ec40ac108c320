"""Trainer: mesh + sharded state + step loop + checkpoints + metrics.

Class-based orchestration in the style of xtuner's Trainer
(InternVideo3_sft/xtuner/v1/train/trainer.py:372-1100) covering what the
reference spreads across three generations of loops (function engines,
task scripts, xtuner fit):

  * global mesh construction (MeshConfig — the (dp, sp, tp) data mesh and
    FSDP model mesh collapse into one)
  * sharded TrainState creation (GSPMD ≙ ZeRO/FSDP2)
  * jitted step with batch shardings; host-side NaN guard (the reference
    all-gathers losses and sys.exits — engine_for_pretraining.py:153-163)
  * orbax auto-resume + interval saves (xtuner auto_resume / _maybe_save)
  * MetricLogger step records incl. tokens/s (trainer.py:786-800)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec

from internvideo_tpu.core.checkpoint import CheckpointManager
from internvideo_tpu.core.mesh import (
    MESH_AXES,
    MeshConfig,
    create_mesh,
    logical_axis_rules,
)
from internvideo_tpu.train.optim import OptimizerConfig, build_optimizer
from internvideo_tpu.train.state import TrainState, create_sharded_state
from internvideo_tpu.utils.metrics import MetricLogger


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    total_steps: int = 1000
    seed: int = 0
    log_every: int = 10
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 500
    max_checkpoints: int = 3
    auto_resume: bool = True
    halt_on_nan: bool = True
    # on auto-resume, consume the already-trained number of batches from
    # the data iterator so the stream continues where it left off (the
    # xtuner reference resumes its dataloader position; a plain generator
    # can only be skipped forward). Set False for stateful iterators that
    # restore their own position (data/loader.py StatefulIterator).
    resume_fast_forward: bool = True
    # save an HF-format export every N steps (0 = never); needs export_fn
    hf_export_every: int = 0
    # save + stop cleanly on SIGTERM/SIGINT (preemption-aware, SURVEY §5.3)
    save_on_preemption: bool = True
    # micro-batch gradient accumulation: incoming batches of size B are
    # reshaped to (grad_accum, B // grad_accum, ...) and scanned
    grad_accum: int = 1
    # tensorboard event-file directory (xtuner _writer/ equivalent)
    tensorboard_dir: Optional[str] = None
    # run a cross-device collective probe every N steps (0 = never) —
    # xtuner trainer.py:1080 _maybe_check_health equivalent
    health_check_every: int = 0
    # model FLOPs per global batch (fwd+bwd); > 0 enables tflops_per_sec
    # and, when the chip's peak is known, MFU in the step log
    flops_per_batch: float = 0.0
    # model EMA (reference timm ModelEma, run_finetuning.py:74): > 0 keeps
    # an exponential average of params in state.ema_params (eval with it
    # via trainer.state.ema_params)
    ema_decay: float = 0.0
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=OptimizerConfig
    )


class Trainer:
    def __init__(
        self,
        config: TrainerConfig,
        model: nn.Module,
        step_builder: Callable,  # (model, mesh) -> step(state, batch, rng)
        example_batch: dict,
        *,
        example_inputs: Optional[tuple] = None,  # model.init args
        batch_specs: Optional[dict] = None,  # name -> PartitionSpec
        init_kwargs: Optional[dict] = None,
        jsonl_path: Optional[str] = None,
        export_fn: Optional[Callable] = None,  # (state, step) -> None
    ):
        self.export_fn = export_fn
        self._preempted = False
        self.config = config
        self.model = model
        self.mesh = create_mesh(config.mesh)
        self.rules = logical_axis_rules()
        self.rng = jax.random.key(config.seed)

        if example_inputs is None:
            example_inputs = tuple(example_batch.values())
        abstract = jax.eval_shape(
            lambda r: model.init(r, *example_inputs, **(init_kwargs or {})),
            self.rng,
        )
        tx, self.lr_schedule = build_optimizer(
            config.optimizer, nn.unbox(abstract["params"])
        )
        with self.mesh, nn.logical_axis_rules(list(self.rules)):
            self.state = create_sharded_state(
                model, tx, example_inputs, self.mesh, self.rng,
                rules=self.rules, init_kwargs=init_kwargs,
                ema_decay=config.ema_decay,
            )

        import inspect

        ga = config.grad_accum
        if ga > 1 and "grad_accum" in inspect.signature(step_builder).parameters:
            step_fn = step_builder(model, self.mesh, grad_accum=ga)
        elif ga > 1:
            raise ValueError(
                "grad_accum > 1 but the step builder does not accept a "
                "grad_accum kwarg"
            )
        else:
            step_fn = step_builder(model, self.mesh)
        dp = ("replica", "fsdp")
        if batch_specs is None:
            batch_specs = {k: PartitionSpec(dp) for k in example_batch}
        if ga > 1:
            # leading micro-batch axis is scanned, never sharded
            batch_specs = {
                k: PartitionSpec(None, *spec) for k, spec in batch_specs.items()
            }
        self.batch_shardings = {
            k: NamedSharding(self.mesh, spec) for k, spec in batch_specs.items()
        }
        self._step = jax.jit(
            step_fn, in_shardings=(None, self.batch_shardings, None),
            donate_argnums=(0,),
        )

        self.ckpt = None
        if config.checkpoint_dir:
            self.ckpt = CheckpointManager(
                config.checkpoint_dir,
                max_to_keep=config.max_checkpoints,
                save_interval_steps=config.checkpoint_every,
            )
            if config.auto_resume and self.ckpt.latest_step() is not None:
                restored = self.ckpt.restore(self.state)
                if restored is not None:
                    self.state = restored
        self.metrics = MetricLogger(
            jsonl_path=jsonl_path, log_every=config.log_every,
            tensorboard_dir=config.tensorboard_dir,
        )
        if config.flops_per_batch:
            self.metrics.set_peak_flops()

    def load_params(self, params) -> None:
        """Replace the model params with a CONVERTED checkpoint (host
        pytree from models/convert.py bridges), device_put per the
        existing shardings — the setup_model ckpt-surgery entry point
        (tasks/shared_utils.py:57 equivalent). Tree structure must match
        the model's init tree (the converters' tests pin this)."""
        inner = params.get("params", params) if isinstance(params, dict) else params
        new = jax.tree.map(
            lambda cur, v: jax.device_put(
                jnp.asarray(v, cur.dtype), cur.sharding
            ),
            self.state.params,
            inner,
        )
        self.state = self.state.replace(params=new)

    def check_health(self) -> float:
        """Cross-device collective probe: a replicated-sum over every mesh
        device must return the device count. Raises RuntimeError on
        mismatch; the wall time is returned for goodput logging (a slow
        probe flags a sick interconnect before the step stalls)."""
        import time as _time

        n = self.mesh.devices.size
        spec = PartitionSpec(MESH_AXES)
        x = jax.device_put(
            np.ones((n,), np.float32), NamedSharding(self.mesh, spec)
        )
        t0 = _time.perf_counter()
        total = float(jax.device_get(jnp.sum(x)))
        dt = _time.perf_counter() - t0
        if total != float(n):
            raise RuntimeError(
                f"health probe failed: collective sum {total} != {n} devices"
            )
        return dt

    def put_batch(self, batch: dict) -> dict:
        ga = self.config.grad_accum
        if ga > 1:
            # mrope position_ids lead with the axis dim (3, B, L) — swap
            # the batch dim forward for the micro-split, then restore the
            # engine's (ga, 3, micro, L) layout (matches the prepended-
            # None sharding spec)
            def _is_mrope(k, v):
                return k == "position_ids" and v.ndim == 3 and v.shape[0] == 3

            arrs = {k: np.asarray(v) for k, v in batch.items()}
            lead = {
                k: (np.moveaxis(v, 0, 1) if _is_mrope(k, v) else v)
                for k, v in arrs.items()
            }
            dims = {v.shape[0] for v in lead.values()}
            if len(dims) != 1:
                raise ValueError(
                    "grad_accum requires every batch leaf to lead with the "
                    f"batch dim; got leading dims {sorted(dims)}"
                )
            batch = {}
            for k, v in lead.items():
                v = np.reshape(v, (ga, -1) + v.shape[1:])
                if _is_mrope(k, arrs[k]):
                    v = np.moveaxis(v, 2, 1)  # (ga, 3, micro, L)
                batch[k] = v
        return {
            k: jax.device_put(v, self.batch_shardings[k])
            for k, v in batch.items()
        }

    def _install_preemption_handler(self):
        """SIGTERM/SIGINT set a flag; fit() saves and stops at the next step
        boundary (preemption-aware checkpointing, SURVEY §5.3 TPU equiv of
        xtuner's snapshot-on-exit)."""
        import signal

        def _handler(signum, frame):
            self._preempted = True

        old = {}
        try:  # signal.signal only works on the main thread
            for sig in (signal.SIGTERM, signal.SIGINT):
                old[sig] = signal.signal(sig, _handler)
        except ValueError:
            pass
        return old

    def _restore_signal_handlers(self, old):
        import signal

        for sig, h in old.items():
            signal.signal(sig, h)

    def _flush_metrics(self, pending, *, halt_on_nan: bool):
        """One batched device_get for the whole window (the axon tunnel makes
        per-step host syncs catastrophically slow — fetch every log_every)."""
        if not pending:
            return
        host = jax.device_get(list(pending))
        # release the device references (keeps donation effective and makes
        # the next flush fetch only its own window)
        pending.clear()
        bad = None  # halt on ANY non-finite step in the window, not just
        # the last one (reference: engine_for_pretraining.py:153-163
        # aborts on any non-finite loss)
        for st, hm in host:
            scalars = {
                k: float(v) for k, v in hm.items() if np.ndim(v) == 0
            }
            self.metrics.update(
                **{k: v for k, v in scalars.items() if k != "finite"}
            )
            if "tokens" in scalars:
                self.metrics.add_tokens(int(scalars["tokens"]))
            if self.config.flops_per_batch:
                self.metrics.add_flops(self.config.flops_per_batch)
            if bad is None and not scalars.get("finite", 1.0):
                bad = (st, scalars)
        if halt_on_nan and bad is not None:
            raise FloatingPointError(
                f"non-finite loss at step {bad[0]}: {bad[1]}"
            )

    def fit(self, data: Iterable[dict], steps: Optional[int] = None):
        cfg = self.config
        steps = steps or cfg.total_steps
        start = int(jax.device_get(self.state.step))
        it = iter(data)
        if start and cfg.resume_fast_forward:
            # replaying batches 0..start-1 at steps start.. would diverge
            # from an uninterrupted run — skip them instead
            for _ in range(start):
                next(it)
        old_handlers = (
            self._install_preemption_handler()
            if cfg.save_on_preemption else {}
        )
        pending: list[tuple[int, dict]] = []  # (step, device metrics)
        try:
            for step in range(start, steps):
                if self._preempted:
                    if self.ckpt is not None:
                        self.ckpt.save(step, self.state, force=True)
                        self.ckpt.wait()
                    break
                batch = self.put_batch(next(it))
                with self.mesh, nn.logical_axis_rules(list(self.rules)):
                    self.state, m = self._step(self.state, batch, self.rng)
                # Metrics stay on device; the host never blocks on the step.
                pending.append((step, m))
                if (step + 1) % cfg.log_every == 0:
                    self._flush_metrics(
                        pending, halt_on_nan=cfg.halt_on_nan
                    )
                    lr = float(self.lr_schedule(step))
                    self.metrics.log_step(step + 1, extra={"lr": lr})
                if self.ckpt is not None:
                    self.ckpt.save(step + 1, self.state)
                if (
                    cfg.health_check_every
                    and (step + 1) % cfg.health_check_every == 0
                ):
                    self.check_health()
                if (
                    self.export_fn is not None
                    and cfg.hf_export_every
                    and (step + 1) % cfg.hf_export_every == 0
                ):
                    self.export_fn(self.state, step + 1)
            if pending:  # emit the final partial window to every sink
                last_step = pending[-1][0]
                n_window = len(pending)
                self._flush_metrics(pending, halt_on_nan=cfg.halt_on_nan)
                self.metrics.log_step(
                    last_step + 1,
                    extra={"lr": float(self.lr_schedule(last_step))},
                    window_steps=n_window,
                )
        finally:
            self._restore_signal_handlers(old_handlers)
        if self.ckpt is not None:
            if not self._preempted and self.ckpt.latest_step() != steps:
                self.ckpt.save(steps, self.state, force=True)
            self.ckpt.wait()
        return self.state
