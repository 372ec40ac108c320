"""CLIP BPE tokenizer parity vs the reference ViCLIP SimpleTokenizer.

Loads `Data/InternVid/viclip/simple_tokenizer.py` (ftfy stubbed to
identity — it is absent from this image, and fix_text is the identity
on the clean strings below) and checks id-level equality of encode(),
round-trip decode(), and the 77-token tokenize() contract of
viclip_text.py:124-160."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_loader import REFERENCE_ROOT, load_reference_module  # noqa: E402

from internvideo_tpu.data.clip_bpe import ClipBpeTokenizer  # noqa: E402

BPE_GZ = os.path.join(
    REFERENCE_ROOT, "Data/InternVid/viclip/bpe_simple_vocab_16e6.txt.gz"
)

needs_vocab = pytest.mark.skipif(
    not os.path.exists(BPE_GZ), reason="CLIP bpe vocab asset not present"
)

TEXTS = [
    "a person is feeding ducks by the lake",
    "Doing Brazilian jiu-jitsu, GRAPPLING!",
    "it's 42 degrees; we're melting...",
    "划独木舟",  # CJK goes through the byte fallback path
    "café au lait & croissants <3",
    "a photo of a dog <|endoftext|>",  # literal specials -> single ids
    "",
    "supercalifragilisticexpialidocious " * 20,  # forces truncation at 77
]


@pytest.fixture(scope="module")
def tokenizers():
    ref_mod = load_reference_module(
        "Data/InternVid/viclip/simple_tokenizer.py",
        stub_modules={"ftfy": {"fix_text": lambda s: s}},
    )
    ref = ref_mod.SimpleTokenizer(BPE_GZ)
    ours = ClipBpeTokenizer(BPE_GZ)
    return ref, ours


@needs_vocab
def test_encode_parity(tokenizers):
    ref, ours = tokenizers
    for t in TEXTS:
        assert ours.encode(t) == ref.encode(t), t


@needs_vocab
def test_vocab_layout_and_specials(tokenizers):
    ref, ours = tokenizers
    assert ours.vocab_size == len(ref.encoder) == 49408
    assert ours.sot_id == ref.encoder["<|startoftext|>"]
    assert ours.eot_id == ref.encoder["<|endoftext|>"]
    # spot-check id agreement across the whole table
    for tok in ("!", "!</w>", "the</w>", "ing</w>"):
        assert ours.encoder[tok] == ref.encoder[tok]


@needs_vocab
def test_decode_roundtrip(tokenizers):
    ref, ours = tokenizers
    for t in TEXTS[:5]:
        ids = ours.encode(t)
        assert ours.decode(ids) == ref.decode(ids)


@needs_vocab
def test_tokenize_contract(tokenizers):
    """sot/eot wrap + zero pad + truncate-keeping-eot, viclip_text.py:141."""
    ref, ours = tokenizers
    out = ours.tokenize(TEXTS, context_length=77)
    assert out.shape == (len(TEXTS), 77) and out.dtype == np.int32
    for i, t in enumerate(TEXTS):
        ids = [ours.sot_id] + ref.encode(t) + [ours.eot_id]
        if len(ids) > 77:
            ids = ids[:77]
            ids[-1] = ours.eot_id
        np.testing.assert_array_equal(out[i, : len(ids)], ids)
        assert (out[i, len(ids):] == 0).all()
    # the long text actually truncated and still ends in eot
    assert out[-1, -1] == ours.eot_id

    batch = ours(TEXTS[:3], max_length=16)
    assert batch["input_ids"].shape == (3, 16)
    assert (batch["attention_mask"].sum(-1) >= 2).all()
