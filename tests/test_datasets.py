"""Dataset classes + tokenizer: csv clips, jsonl pairs with tokenize cache."""

import json
import os

import numpy as np

from internvideo_tpu.data.datasets import CsvVideoDataset, JsonlVideoTextDataset
from internvideo_tpu.data.tokenizer import ToyTokenizer


def _make_clips(tmp_path, n=3):
    paths = []
    for i in range(n):
        vid = (np.random.rand(12, 36, 36, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"clip{i}.npy")
        np.save(p, vid)
        paths.append(p)
    return paths


def test_toy_tokenizer():
    tok = ToyTokenizer()
    out = tok(["hello world", "hello"], max_length=8)
    assert out["input_ids"].shape == (2, 8)
    assert out["input_ids"][0, 0] == tok.cls_token_id
    # same word -> same id, deterministic
    assert out["input_ids"][0, 1] == out["input_ids"][1, 1]
    assert out["attention_mask"][1].sum() == 3  # cls + hello + sep


def test_csv_dataset_train_and_views(tmp_path):
    paths = _make_clips(tmp_path)
    csv = tmp_path / "train.csv"
    csv.write_text("\n".join(f"{p},{i % 2}" for i, p in enumerate(paths)))
    ds = CsvVideoDataset(
        str(csv), num_frames=4, img_size=28, train=True,
        use_rand_augment=True, use_erasing=True,
    )
    assert len(ds) == 3
    batch = next(ds.train_batches(2))
    assert batch["video"].shape == (2, 4, 28, 28, 3)
    assert batch["video"].dtype == np.float32
    assert batch["label"].shape == (2,)

    ds_eval = CsvVideoDataset(str(csv), num_frames=4, img_size=28, train=False)
    views = list(ds_eval.eval_views(4, num_clips=2))
    total = sum(v["video"].shape[0] for v in views)
    assert total == 3 * 2
    ids = [i for v in views for i in v["video_id"]]
    assert len(set(ids)) == 3


def test_jsonl_dataset_with_cache(tmp_path):
    paths = _make_clips(tmp_path)
    jsonl = tmp_path / "pairs.jsonl"
    jsonl.write_text("\n".join(
        json.dumps({"video": p, "caption": f"a video number {i}"})
        for i, p in enumerate(paths)
    ))
    tok = ToyTokenizer()
    cache = str(tmp_path / "cache")
    ds = JsonlVideoTextDataset(
        str(jsonl), tok, num_frames=4, img_size=28, max_length=8,
        cache_dir=cache,
    )
    batch = next(ds.batches(2))
    assert batch["video"].shape == (2, 4, 28, 28, 3)
    assert batch["input_ids"].shape == (2, 8)
    assert os.listdir(cache)  # tokenize cache written

    # second construction loads the cache
    ds2 = JsonlVideoTextDataset(
        str(jsonl), tok, num_frames=4, img_size=28, max_length=8,
        cache_dir=cache,
    )
    np.testing.assert_array_equal(
        ds.tokens([0, 2])["input_ids"], ds2.tokens([0, 2])["input_ids"]
    )
