"""Open-ended VQA as answer-vocabulary classification (CoTrain parity).

The reference's InternVideo1 multi-modalities-downstream suite trains an
answer-vocab classifier over concatenated video+text features
(multi-modalities-downstream/CoTrain/modules/clip_module.py:144-172
`vqa_classifier`, qa_type="vtc") with plain cross-entropy and top-1
accuracy (modules/objectives.py:704-775 `compute_openend_vqa`). This is
the classification flavor of video QA (MSRVTT-QA / MSVD-QA label spaces),
complementary to the generation-based `eval/videoqa.py`.

TPU-native shape: the classifier is a small flax module applied to pooled
dual-encoder features (any of our CLIP-style models provides them:
ViCLIP / InternVideo2CLIP `encode_video` + `encode_text`); the train step
is a pure jittable function.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class VQAClassifier(nn.Module):
    """Dropout -> Dense(2h) -> LayerNorm -> GELU -> Dropout -> Dense(vocab)
    (clip_module.py:161-172)."""

    answer_vocab_size: int
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, deterministic: bool = True):
        h = feats.shape[-1]
        x = nn.Dropout(self.dropout, deterministic=deterministic)(feats)
        x = nn.Dense(2 * h, dtype=self.dtype, name="fc1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.answer_vocab_size, dtype=self.dtype,
                        name="fc2")(x)


def vqa_features(video_feats: jax.Array, text_feats: jax.Array) -> jax.Array:
    """qa_type="vtc": concatenated pooled video and question features
    (objectives.py:713-715)."""
    return jnp.concatenate([video_feats, text_feats], axis=-1)


def make_vqa_train_step(classifier: VQAClassifier, optimizer):
    """Returns a jittable (params, opt_state, batch, rng) -> updated step.

    batch: {"video_feats": (B, Dv), "text_feats": (B, Dt),
            "label": (B,) int32 answer ids}.
    Loss = CE over the answer vocabulary (objectives.py:762).
    """

    def step(params, opt_state, batch, rng):
        feats = vqa_features(batch["video_feats"], batch["text_feats"])

        def loss_fn(p):
            logits = classifier.apply(
                p, feats, deterministic=False, rngs={"dropout": rng}
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            loss = -jnp.mean(
                jnp.take_along_axis(logp, batch["label"][:, None], -1)
            )
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32)
            )
            return loss, acc

        import optax

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "acc": acc}

    return step


def evaluate_openend_vqa(
    encode_batch: Callable,  # batch -> (video_feats, text_feats)
    classifier_apply: Callable,  # feats -> logits
    data: Iterable[dict],  # {"...media/question...", "label": (B,)}
    *,
    answer_names: Optional[list] = None,
) -> dict:
    """Top-1 accuracy over an answer vocabulary (objectives.py:770-774)."""
    correct, total = 0, 0
    for batch in data:
        vf, tf = encode_batch(batch)
        logits = classifier_apply(vqa_features(vf, tf))
        pred = jax.device_get(jnp.argmax(logits, -1))
        gold = jax.device_get(batch["label"])
        correct += int((pred == gold).sum())
        total += int(gold.shape[0])
    out = {"acc": correct / max(total, 1), "n": total}
    return out
