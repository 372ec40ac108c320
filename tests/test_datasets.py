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


def test_corpus_registry(tmp_path, monkeypatch):
    from internvideo_tpu.data import corpus

    # reference-named corpora present (configs/data.py:8)
    assert "webvid" in corpus.available_corpora()
    assert "msrvtt_ret_test1k" in corpus.available_corpora()
    spec = corpus.get_corpus("didemo_ret_train")
    assert spec.is_paragraph_retrieval and spec.max_txt_l == 64
    # compositions resolve to member specs
    comp = corpus.get_composition("pretrain_example_data_1B")
    assert [s.name for s in comp] == ["cc3m", "webvid"]
    # env-var data root resolution
    monkeypatch.setenv("IVT_DATA_PATH", "/data")
    assert corpus.get_corpus("webvid").anno() == "/data/anno/webvid.jsonl"
    # unknown name errors helpfully
    try:
        corpus.get_corpus("nope")
        raise AssertionError("should raise")
    except KeyError:
        pass


def test_corpus_build_datasets(tmp_path, monkeypatch):
    from internvideo_tpu.data import corpus

    # lay out a fake data root with relative media paths
    root = tmp_path / "dataroot"
    (root / "anno").mkdir(parents=True)
    media = root / "media" / "toy"
    media.mkdir(parents=True)
    vid = (np.random.rand(8, 36, 36, 3) * 255).astype(np.uint8)
    np.save(str(media / "c0.npy"), vid)
    (root / "anno" / "toy.jsonl").write_text(
        json.dumps({"video": "c0.npy", "caption": "hello"}) + "\n")
    monkeypatch.setenv("IVT_DATA_PATH", str(root))
    corpus.register_corpus(corpus.CorpusSpec(
        name="toy", anno_path="anno/toy.jsonl", media_root="media/toy",
    ), overwrite=True)
    ds = corpus.build_datasets("toy", ToyTokenizer(), num_frames=4,
                              img_size=28)["toy"]
    batch = next(ds.batches(1))
    assert batch["video"].shape == (1, 4, 28, 28, 3)


def test_video_qa_dataset_and_weights(tmp_path):
    import json

    import numpy as np

    from internvideo_tpu.data.datasets import (
        VideoQADataset,
        answers_with_weights,
    )

    # answer aggregation matches qa_dataset.py semantics
    answers, weights = answers_with_weights(["cat", "cat", "dog"])
    assert answers == ["cat [SEP]", "dog [SEP]"]
    np.testing.assert_allclose(weights, [2 / 3, 1 / 3])
    a1, w1 = answers_with_weights("yes")
    assert a1 == ["yes [SEP]"] and w1 == [1.0]

    vid = tmp_path / "v.npy"
    np.save(vid, np.zeros((6, 32, 32, 3), np.uint8))
    ann = tmp_path / "qa.jsonl"
    rows = [
        {"video": str(vid), "question": "what  is this?",
         "answer": ["a cat", "a cat", "a dog"]},
        {"video": str(vid), "question": "how many?", "answer": "two",
         "question_id": 7},
    ]
    ann.write_text("\n".join(json.dumps(r) for r in rows))

    train = VideoQADataset(str(ann), num_frames=2, img_size=16)
    item = train[0]
    assert item["video"].shape == (2, 16, 16, 3)
    assert item["question"] == "what is this?"
    assert item["answers"] == ["a cat [SEP]", "a dog [SEP]"]

    ev = VideoQADataset(str(ann), num_frames=2, img_size=16, mode="eval",
                        answer_list=["a cat", "a dog", "two"])
    assert ev[1]["question_id"] == 7
    assert ev.answer_list == ["a cat", "a dog", "two"]


def test_weighted_concat_dataset():
    from internvideo_tpu.data.datasets import WeightedConcatDataset

    a = [f"a{i}" for i in range(3)]
    b = [f"b{i}" for i in range(2)]
    ds = WeightedConcatDataset([a, b], [2, 3])
    assert len(ds) == 3 * 2 + 2 * 3
    got = [ds[i] for i in range(len(ds))]
    # resampled regions: first 6 from a (cycled), last 6 from b (cycled)
    assert got[:6] == ["a0", "a1", "a2", "a0", "a1", "a2"]
    assert got[6:] == ["b0", "b1", "b0", "b1", "b0", "b1"]
