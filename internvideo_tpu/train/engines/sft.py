"""SFT engine: packed multimodal next-token training for the VideoMLLM.

Mirrors the xtuner fit step (trainer.py:693-818 + train_engine.py:226):
packed SequenceContext batch → MLLM forward (vision tower + projector +
MLA LLM, Ulysses SP injected via ops.attention.ulysses_context when the
mesh has a seq axis) → chunked CE with a global token normalizer → adamw.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from internvideo_tpu.ops.attention import sequence_parallel_context
from internvideo_tpu.train.chunked_ce import chunked_cross_entropy
from internvideo_tpu.train.step import make_accum_step


@dataclasses.dataclass(frozen=True)
class SFTConfig:
    ce_chunk_size: int = 2048
    # sequence-parallel attention over the mesh's `seq` axis: "ulysses"
    # (all-to-all; full-sequence KV per rank during attention) or "ring"
    # (parallel/ring.py; O(S/sp) memory — contexts beyond Ulysses' reach)
    sp_impl: str = "ulysses"


def make_sft_step(model, cfg: SFTConfig, mesh=None, *, grad_accum: int = 1):
    """step(state, batch, rng); batch carries a packed SequenceContext:
    {"input_ids", "segment_ids", "position_ids", "labels", "video"(opt)}.
    """

    def loss_fn(params, batch, rng):
        def run():
            out = model.apply(
                {"params": params},
                batch["input_ids"],
                batch.get("video"),
                position_ids=batch.get("position_ids"),
                segment_ids=batch["segment_ids"],
                with_logits=False,
            )
            return out.hidden

        if mesh is not None and "seq" in mesh.axis_names and mesh.shape["seq"] > 1:
            with sequence_parallel_context(mesh, "seq", cfg.sp_impl):
                hidden = run()
        else:
            hidden = run()

        lm = params["language_model"]
        if "lm_head" in lm:
            lm_head = lm["lm_head"]["kernel"]
        else:  # tie_word_embeddings: the head IS the embedding matrix
            lm_head = lm["embed_tokens"]["embedding"].T
        labels = batch["labels"]
        # with grad_accum the wrapper injects the FULL batch's valid-token
        # count; per-microbatch losses then sum to the globally-normalized
        # loss after make_accum_step's /grad_accum (xtuner's global
        # denominator, loss/ce_loss.py)
        total = batch.get("total_valid")
        loss = chunked_cross_entropy(
            hidden, lm_head, labels, chunk_size=cfg.ce_chunk_size,
            total_valid=(total / grad_accum if total is not None else None),
        )
        n_tok = jnp.sum(labels != -100)
        return loss, {"tokens": n_tok}

    inner = make_accum_step(loss_fn, grad_accum=grad_accum)
    if grad_accum == 1:
        return inner

    def step(state, batch, rng):
        total = jnp.sum(batch["labels"] != -100).astype(jnp.float32)
        batch = dict(batch, total_valid=jnp.full((grad_accum,), total))
        return inner(state, batch, rng)

    return step
