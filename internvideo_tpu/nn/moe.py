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
    # --- router scoring (xtuner module/router/{greedy,noaux_router}.py) ---
    # "softmax": greedy router (Qwen3-MoE / GPT-OSS). "sigmoid": the
    # DeepSeek-V3 NoAux router — sigmoid scores, correction bias added for
    # CHOICE only, gates taken from the unbiased scores.
    scoring_func: str = "softmax"
    router_scaling_factor: float = 1.0  # multiplies the final gates
    norm_topk_prob: bool = True  # normalize gates over the chosen k
    # node-limited (grouped) routing, noaux_router.py:96-115: experts are
    # split into n_group groups, each token may only use experts from its
    # topk_group best groups (group score = sum of the group's top-2
    # choice scores). n_group == topk_group disables the restriction.
    n_group: int = 1
    topk_group: int = 1
    # always-on shared experts (DeepSeek-V3: one SwiGLU of
    # num_shared_experts * intermediate_size added to the routed output —
    # moe_decoder_layer.py:224-237,386-394)
    num_shared_experts: int = 0
    # expert activation (xtuner ops/act_fn.py): "swiglu" or GPT-OSS's
    # "clipped_swiglu" (gate clamped to <=limit, up to [-limit,limit],
    # glu = gate*sigmoid(alpha*gate), out = (up+1)*glu)
    act_fn: str = "swiglu"
    clip_alpha: float = 1.702
    clip_limit: float = 7.0
    # per-expert biases on the three projections (GPT-OSS moe_bias=True)
    expert_bias: bool = False


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


def route_tokens(
    router_logits: jax.Array,  # (N, E) float
    cfg: MoEConfig,
    router_bias: Optional[jax.Array] = None,  # (E,) non-grad balancing
):
    """Token routing for both reference router families.

    Returns (top_idx (N, k), top_gate (N, k), router_weights (N, E)) where
    router_weights is the normalized per-expert distribution used by the
    balancing loss.

    scoring_func="softmax" — greedy router (xtuner module/router/greedy.py:
    66-99): softmax scores, top-k, gates normalized over the chosen k.
    scoring_func="sigmoid" — DeepSeek-V3 NoAux router (noaux_router.py:
    79-140): sigmoid scores; the e-score correction bias biases the CHOICE
    only, gates come from the unbiased scores; optional node-limited
    grouping masks all but the topk_group best groups (group score = sum of
    the group's top-2 biased scores); gates are normalized with the
    reference's 1e-20 epsilon and multiplied by router_scaling_factor.
    """
    e, k = cfg.num_experts, cfg.top_k
    n = router_logits.shape[0]
    if cfg.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(router_logits)
        choice = scores
        if router_bias is not None:
            choice = choice + jax.lax.stop_gradient(router_bias)[None, :]
        if cfg.n_group > 1 and cfg.topk_group < cfg.n_group:
            g = cfg.n_group
            if e % g:
                raise ValueError(f"num_experts {e} % n_group {g} != 0")
            cg = choice.reshape(n, g, e // g)
            group_scores = jnp.sum(
                jax.lax.top_k(cg, min(2, e // g))[0], axis=-1
            )  # (N, g)
            _, gidx = jax.lax.top_k(group_scores, cfg.topk_group)
            gmask = jnp.sum(jax.nn.one_hot(gidx, g), axis=1) > 0  # (N, g)
            choice = jnp.where(gmask[..., None], cg, 0.0).reshape(n, e)
        _, top_idx = jax.lax.top_k(choice, k)
        top_gate = jnp.take_along_axis(scores, top_idx, axis=-1)
        if cfg.norm_topk_prob and k > 1:
            top_gate = top_gate / (
                jnp.sum(top_gate, axis=-1, keepdims=True) + 1e-20
            )
        top_gate = top_gate * cfg.router_scaling_factor
        router_weights = choice / jnp.maximum(
            jnp.sum(choice, axis=-1, keepdims=True), 1e-20
        )
        return top_idx, top_gate, router_weights

    probs = jax.nn.softmax(router_logits, axis=-1)
    scores = router_logits
    if router_bias is not None:
        scores = scores + jax.lax.stop_gradient(router_bias)[None, :]
    _, top_idx = jax.lax.top_k(scores, k)
    top_gate = jnp.take_along_axis(probs, top_idx, axis=-1)
    if cfg.norm_topk_prob:
        top_gate = top_gate / jnp.maximum(
            jnp.sum(top_gate, axis=-1, keepdims=True), 1e-9
        )
    top_gate = top_gate * cfg.router_scaling_factor
    return top_idx, top_gate, probs


def moe_act(cfg: MoEConfig, gate: jax.Array, up: jax.Array) -> jax.Array:
    """Expert activation (xtuner ops/act_fn.py:7-24): SwiGLU, or GPT-OSS
    clipped SwiGLU — gate clamped above, up clamped both sides, and the
    (up + 1) form."""
    if cfg.act_fn == "clipped_swiglu":
        gate = jnp.minimum(gate, cfg.clip_limit)
        up = jnp.clip(up, -cfg.clip_limit, cfg.clip_limit)
        return (up + 1.0) * (gate * jax.nn.sigmoid(cfg.clip_alpha * gate))
    if cfg.act_fn != "swiglu":
        raise ValueError(f"unknown act_fn {cfg.act_fn}")
    return nn.silu(gate) * up


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
        top_idx, top_gate, router_weights = route_tokens(
            router_logits, cfg, router_bias
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
        if cfg.expert_bias:  # GPT-OSS moe_bias=True (gpt_oss.py:121-125)
            b_gate = expert_param("b_gate", (e, i), ("expert", "expert_mlp"))
            b_up = expert_param("b_up", (e, i), ("expert", "expert_mlp"))
            b_down = expert_param("b_down", (e, d), ("expert", "embed"))

        if cfg.dispatch == "dropless_ep":
            from internvideo_tpu.parallel.ep import ep_dropless_moe

            if self.mesh is None:
                raise ValueError("dispatch='dropless_ep' needs mesh=")
            if cfg.expert_bias or cfg.act_fn != "swiglu":
                raise NotImplementedError(
                    "dropless_ep supports bias-free SwiGLU experts only"
                )
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
            if cfg.expert_bias:
                slot_e = flat_e[order]  # expert id per sorted slot
                h = h + b_gate[slot_e]
                u = u + b_up[slot_e]
            ys = jax.lax.ragged_dot(moe_act(cfg, h, u), w_down, group_sizes)
            if cfg.expert_bias:
                ys = ys + b_down[slot_e]
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
            if cfg.expert_bias:
                h = h + b_gate[:, None, :]
                u = u + b_up[:, None, :]
            out_e = jnp.einsum("eci,eid->ecd", moe_act(cfg, h, u), w_down)
            if cfg.expert_bias:
                out_e = out_e + b_down[:, None, :]
            out_e = nn.with_logical_constraint(out_e, ("expert", None, "embed"))

            # combine: gather back each token's k slots
            gathered = out_e[expert_idx.reshape(-1), safe_pos.reshape(-1)]
            gathered = gathered.reshape(n, k, d)
            out = jnp.sum(gathered * combine_w[..., None], axis=1)
            dropped = 1.0 - jnp.mean(keep.astype(jnp.float32))

        # always-on shared experts (DeepSeek-V3 n_shared_experts: one SwiGLU
        # of num_shared * intermediate_size whose output is ADDED to the
        # routed output — moe_decoder_layer.py:69-77,224-237,386-394)
        if cfg.num_shared_experts > 0:
            i_sh = cfg.intermediate_size * cfg.num_shared_experts

            def shared_dense(feats, name, logical):
                return nn.Dense(
                    feats, use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    kernel_init=nn.with_logical_partitioning(
                        nn.initializers.truncated_normal(0.02), logical
                    ),
                    name=name,
                )

            sg = shared_dense(i_sh, "shared_gate_proj", ("embed", "mlp"))(xt)
            su = shared_dense(i_sh, "shared_up_proj", ("embed", "mlp"))(xt)
            sh_out = shared_dense(d, "shared_down_proj", ("mlp", "embed"))(
                moe_act(cfg, sg, su)
            )
            out = out + sh_out.astype(out.dtype)

        # load-balancing aux loss (Switch): E * Σ_e f_e · p_e
        load = jnp.mean(
            jax.nn.one_hot(top_idx, e).sum(1), axis=0
        ) / k  # (E,) routed fraction
        if cfg.router_bias_balancing:
            aux = jnp.zeros(())
        else:
            imp = jnp.mean(router_weights, axis=0)
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
