"""Mixture-of-Experts: top-k router + static-capacity expert dispatch.

Capability parity with xtuner's MoE stack (SURVEY X7 —
xtuner/v1/module/router/*, dispatcher/base.py:70-190, torch_all2all.py,
ops/moe/cuda/group_gemm.py, model/moe/moe.py):

  * top-k softmax router with (a) switch-style load-balancing auxiliary loss
    and (b) DeepSeek-V3 no-aux-loss *bias balancing* — a non-gradient bias
    added to routing scores only, updated from expert load each step
    (router bias update hook in xtuner's TrainEngine)
  * two dispatch modes:
      - "capacity": expert compute as batched GEMMs over a static capacity;
        the dispatch/combine one-hot contraction is the GSPMD MoE pattern —
        sharding experts over the `expert` mesh axis makes XLA emit exactly
        the all-to-alls the reference implements by hand (DeepEP /
        torch all2all). Over-capacity tokens drop (pass through residual).
      - "dropless": sort-based dispatch + `jax.lax.ragged_dot` grouped
        GEMMs (megablox-style) — NO tokens are ever dropped, matching the
        reference's DeepEP semantics, and the O(N·E) one-hot cumsum is
        replaced by an argsort. ("dropless_ep" bounds its receive buffer
        at buffer_factor·n·k and CAN drop under extreme routing skew —
        watch MoEOutput.dropped_fraction.)
  * SwiGLU experts (DeepSeek/Qwen3-MoE shape)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    num_experts: int = 8
    top_k: int = 2
    intermediate_size: int = 1024
    capacity_factor: float = 1.25
    router_bias_balancing: bool = False  # DeepSeek-V3 style
    aux_loss_weight: float = 0.01
    router_dtype: str = "float32"
    # "capacity": GSPMD static-capacity dispatch (EP-shardable)
    # "dropless": single-shard sort + lax.ragged_dot (zero drops)
    # "dropless_ep": ragged_all_to_all expert-parallel dispatch over the
    #   `expert` mesh axis (parallel/ep.py, DeepEP semantics) — the module
    #   needs `mesh` set
    dispatch: str = "capacity"
    ep_buffer_factor: float = 2.0


@struct.dataclass
class MoEOutput:
    output: jax.Array
    aux_loss: jax.Array  # load-balancing loss (0 when bias balancing)
    expert_load: jax.Array  # (E,) fraction of tokens routed per expert
    # fraction of (token, slot) assignments dropped by the dispatcher:
    # 0 for 'dropless'; capacity overflow for 'capacity'; receive-buffer
    # overflow for 'dropless_ep' (ep.py drops past buffer_factor·n·k) —
    # monitor it, routing collapse degrades quality silently otherwise
    dropped_fraction: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros(())
    )


class MoEMlp(nn.Module):
    cfg: MoEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    mesh: Optional[object] = None  # jax Mesh, required for dispatch="dropless_ep"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, S, D)
        router_bias: Optional[jax.Array] = None,  # (E,) non-grad balancing
    ) -> MoEOutput:
        cfg = self.cfg
        b, s, d = x.shape
        n = b * s
        e, k = cfg.num_experts, cfg.top_k
        cap = max(int(cfg.capacity_factor * n * k / e), 1)
        xt = x.reshape(n, d)

        router_logits = nn.Dense(
            e, use_bias=False,
            dtype=jnp.dtype(cfg.router_dtype),
            param_dtype=jnp.float32,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), ("embed", None)
            ),
            name="router",
        )(xt.astype(jnp.dtype(cfg.router_dtype)))  # (N, E)
        probs = jax.nn.softmax(router_logits, axis=-1)

        scores = router_logits
        if router_bias is not None:
            scores = scores + jax.lax.stop_gradient(router_bias)[None, :]
        _, top_idx = jax.lax.top_k(scores, k)  # (N, k)
        top_gate = jnp.take_along_axis(probs, top_idx, axis=-1)
        top_gate = top_gate / jnp.maximum(
            jnp.sum(top_gate, axis=-1, keepdims=True), 1e-9
        )

        def expert_param(name, shape, logical):
            return self.param(
                name,
                nn.with_logical_partitioning(
                    nn.initializers.truncated_normal(0.02), logical
                ),
                shape,
                self.param_dtype,
            ).astype(self.dtype)

        i = cfg.intermediate_size
        w_gate = expert_param("w_gate", (e, d, i), ("expert", "embed", "expert_mlp"))
        w_up = expert_param("w_up", (e, d, i), ("expert", "embed", "expert_mlp"))
        w_down = expert_param("w_down", (e, i, d), ("expert", "expert_mlp", "embed"))

        if cfg.dispatch == "dropless_ep":
            from internvideo_tpu.parallel.ep import ep_dropless_moe

            if self.mesh is None:
                raise ValueError("dispatch='dropless_ep' needs mesh=")
            out, dropped = ep_dropless_moe(
                xt, top_idx, top_gate, w_gate, w_up, w_down,
                mesh=self.mesh, axis="expert",
                buffer_factor=cfg.ep_buffer_factor,
            )
        elif cfg.dispatch == "dropless":
            # Sort-based dispatch + grouped ragged GEMMs (no token drops;
            # megablox / lax.ragged_dot — the DeepEP-semantics path).
            flat_e = top_idx.reshape(-1)  # (N*k,) expert per slot
            order = jnp.argsort(flat_e)  # stable: ties keep token order
            src_tok = order // k  # token index feeding each sorted slot
            xs = xt[src_tok]  # (N*k, D) sorted by expert
            group_sizes = jnp.bincount(flat_e, length=e)
            h = jax.lax.ragged_dot(xs, w_gate, group_sizes)
            u = jax.lax.ragged_dot(xs, w_up, group_sizes)
            ys = jax.lax.ragged_dot(nn.silu(h) * u, w_down, group_sizes)
            gate_sorted = top_gate.reshape(-1)[order]
            out = jnp.zeros((n, d), ys.dtype).at[src_tok].add(
                ys * gate_sorted[:, None]
            )
            dropped = jnp.zeros(())
        else:
            # position of each (token, slot) within its expert's capacity.
            # CHOICE-major priority (Switch/GSPMD convention): every
            # token's 1st choice is ranked before any token's 2nd choice,
            # so under capacity pressure secondary assignments are the
            # ones dropped — token-major cumsum would let early tokens'
            # spillover slots evict later tokens' primary experts.
            onehot = jax.nn.one_hot(top_idx, e, dtype=jnp.int32)  # (N, k, E)
            flat = onehot.transpose(1, 0, 2).reshape(n * k, e)  # choice-major
            pos_in_expert = jnp.cumsum(flat, axis=0) * flat - 1  # (N*k, E)
            pos = (
                jnp.max(pos_in_expert, axis=-1)
                .reshape(k, n).transpose(1, 0)  # back to (N, k)
            )
            keep = pos < cap

            # dispatch: (N, k) -> (E, cap, D) via scatter-add
            expert_idx = top_idx  # (N, k)
            combine_w = jnp.where(keep, top_gate, 0.0)  # (N, k)
            disp = jnp.zeros((e, cap, d), xt.dtype)
            tok = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
            safe_pos = jnp.where(keep, pos, cap - 1)
            disp = disp.at[
                expert_idx.reshape(-1), safe_pos.reshape(-1)
            ].add(
                jnp.where(keep.reshape(-1, 1), xt[tok.reshape(-1)], 0.0)
            )
            disp = nn.with_logical_constraint(disp, ("expert", None, "embed"))

            # expert SwiGLU, batched over E — one grouped GEMM per projection
            h = jnp.einsum("ecd,edi->eci", disp, w_gate)
            u = jnp.einsum("ecd,edi->eci", disp, w_up)
            out_e = jnp.einsum("eci,eid->ecd", nn.silu(h) * u, w_down)
            out_e = nn.with_logical_constraint(out_e, ("expert", None, "embed"))

            # combine: gather back each token's k slots
            gathered = out_e[expert_idx.reshape(-1), safe_pos.reshape(-1)]
            gathered = gathered.reshape(n, k, d)
            out = jnp.sum(gathered * combine_w[..., None], axis=1)
            dropped = 1.0 - jnp.mean(keep.astype(jnp.float32))

        # load-balancing aux loss (Switch): E * Σ_e f_e · p_e
        load = jnp.mean(
            jax.nn.one_hot(top_idx, e).sum(1), axis=0
        ) / k  # (E,) routed fraction
        if cfg.router_bias_balancing:
            aux = jnp.zeros(())
        else:
            imp = jnp.mean(probs, axis=0)
            aux = cfg.aux_loss_weight * e * jnp.sum(load * imp)

        return MoEOutput(
            output=out.reshape(b, s, d).astype(x.dtype),
            aux_loss=aux,
            expert_load=load,
            dropped_fraction=jnp.asarray(dropped, jnp.float32),
        )


def update_router_bias(
    router_bias: jax.Array,  # (E,)
    expert_load: jax.Array,  # (E,) last-step routed fraction
    *,
    speed: float = 1e-3,
) -> jax.Array:
    """DeepSeek-V3 no-aux-loss balancing: push bias against overload.

    Matches xtuner's per-step MoE bias update (train_engine.py MoE hook):
    overloaded experts (load > mean) get bias decreased, underloaded
    increased, by a fixed speed.
    """
    err = jnp.mean(expert_load) - expert_load
    return router_bias + speed * jnp.sign(err)
