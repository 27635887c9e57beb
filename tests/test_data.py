"""Data layer: loaders over synthetic fixtures in every pickle schema,
static-shape batch invariants, preprocessing math."""

import numpy as np
import pytest

from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.data.pipeline import ArrayDataset, BatchPipeline
from mimrl_tpu.data.preprocess import log_scale, minmax_normalize
from mimrl_tpu.data.sdk import mosi_r2c_7, pom_r2c_7
from mimrl_tpu.data.local import r2c_2, r2c_7
from mimrl_tpu.data.synthetic import (
    make_avec_fixture,
    make_dec_fixture,
    make_local_fixture,
    make_sdk_fixture,
)
from mimrl_tpu.data.tokenizer import build_tokenizer
from mimrl_tpu.data.universal import get_data_loader


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    """Per-family subdirectories, mirroring the reference's separate
    dataset roots (SDK vs DeclareLab vs local trees share file names)."""
    root = tmp_path_factory.mktemp("data")
    sdk, dec, local = root / "sdk", root / "dec", root / "local"
    make_sdk_fixture(str(sdk), "mosi", d_text=16, d_audio=8, d_video=6)
    make_sdk_fixture(str(sdk), "mosei", d_text=16, d_audio=8, d_video=6)
    make_sdk_fixture(str(sdk), "pom", d_text=16, d_audio=8, d_video=6)
    make_dec_fixture(str(dec), "mosi", d_audio=5, d_video=20)
    make_dec_fixture(str(dec), "mosei", d_audio=5, d_video=20)
    make_avec_fixture(str(local), d_mfcc=8, d_au=6)
    make_local_fixture(str(local), "mosi_20", dims=(12, 5, 8), time_len=10)
    return str(root)


def _family_dir(root, dataset):
    if "SDK" in dataset:
        return root + "/sdk"
    if "Dec" in dataset:
        return root + "/dec"
    return root + "/local"


def _cfg(root, **kw):
    base = dict(batch_size=4, time_len=16, num_workers=0)
    base.update(kw)
    base["data_dir"] = _family_dir(root, base.get("dataset", "mosi_SDK"))
    return MimrlConfig(**base)


def test_preprocess_log_scale():
    feats = [np.asarray([[1.0, 2.0]]), np.asarray([[3.0, -1.0]])]
    out = log_scale(feats, scale_min=-1.0)
    assert np.allclose(out[0], np.log(np.asarray([[1.0, 2.0]]) + 2 + 1e-6))


def test_preprocess_minmax():
    feats = [np.asarray([0.0, 5.0]), np.asarray([10.0])]
    out = minmax_normalize(feats)
    assert np.isclose(min(o.min() for o in out), -1.0)
    assert np.isclose(max(o.max() for o in out), 1.0)


def test_r2c_bucketers():
    assert r2c_2(0.5) == 1 and r2c_2(-0.5) == 0 and r2c_2(0.0) == 0
    assert r2c_7(5.0) == 6 and r2c_7(-5.0) == 0 and r2c_7(0.4) == 3
    assert mosi_r2c_7(2.6) == 6 and mosi_r2c_7(-3.0) == 0
    assert pom_r2c_7(1.0) == 0 and pom_r2c_7(4.5) == 3 and pom_r2c_7(7.5) == 6


@pytest.mark.parametrize("dataset,text", [
    ("mosi_SDK", "text"), ("mosi_SDK", "glove"), ("mosei_SDK", "text"),
    ("pom_SDK", "text"),
])
def test_sdk_pipelines(fixture_root, dataset, text):
    cfg = _cfg(fixture_root, dataset=dataset, text=text, audio="covarep",
               video="facet42" if dataset != "mosi_SDK" else "facet41",
               normalize=[False, True, True], log_scale=[False, False, False])
    train, valid, test, d_t, d_a, d_v = get_data_loader(cfg)
    batch = next(iter(train))
    assert batch["audio"].shape == (4, 16, 8)
    assert batch["video"].shape == (4, 16, 6)
    if text == "text":
        assert batch["bert_sentences"].shape == (4, 16)
        assert batch["bert_sentence_att_mask"].max() == 1
    else:
        assert batch["text"].shape == (4, 16, 16)
    n_labels = 2 if dataset == "pom_SDK" else 3
    assert len(batch["labels"]) == n_labels


def test_dec_pipeline(fixture_root):
    cfg = _cfg(fixture_root, dataset="mosi_Dec")
    train, valid, test, d_t, d_a, d_v = get_data_loader(cfg)
    assert (d_t, d_a, d_v) == (768, 5, 20)
    batch = next(iter(train))
    assert batch["audio"].shape == (4, 16, 5)
    assert batch["video"].shape == (4, 16, 20)
    assert batch["bert_sentences"].shape == (4, 16)
    assert batch["labels"][0].shape == (4, 1)


def test_dec_mosei_label_first_column(fixture_root):
    cfg = _cfg(fixture_root, dataset="mosei_Dec")
    train, *_ = get_data_loader(cfg)
    batch = next(iter(train))
    # 7-column MOSEI labels collapse to 1 (ref: DataLoaderCMUDeclareLab.py:388)
    assert batch["labels"][0].shape == (4, 1)


def test_avec_pipeline_random_word_augmentation(fixture_root):
    cfg = _cfg(fixture_root, dataset="avec2019", text="text", audio="mfcc",
               video="au")
    train, *_ = get_data_loader(cfg)
    b1 = next(iter(train))  # epoch 1
    b2 = next(iter(train))  # epoch 2 (new rng + reshuffle)
    assert b1["bert_sentences"].shape == (4, 16)
    assert not np.array_equal(b1["bert_sentences"], b2["bert_sentences"])


def test_local_pipeline(fixture_root):
    cfg = _cfg(fixture_root, dataset="mosi_20")
    train, valid, test, d_t, d_a, d_v = get_data_loader(cfg)
    batch = next(iter(train))
    assert batch["text"].shape == (4, 16, 12)
    assert len(batch["labels"]) == 3


def test_partial_batch_cycle_pad_and_mask(fixture_root):
    ds = ArrayDataset(
        text_feat=[np.ones((3, 2), np.float32)] * 10,
        audio=[np.ones((3, 2), np.float32)] * 10,
        video=[np.ones((3, 2), np.float32)] * 10,
        labels=[np.arange(10, dtype=np.float32)],
    )
    pipe = BatchPipeline(ds, batch_size=4, time_len=5, shuffle=False)
    batches = list(pipe)
    assert len(batches) == 3
    last = batches[-1]
    assert last["sample_mask"].tolist() == [1, 1, 0, 0]
    assert last["audio"].shape == (4, 5, 2)
    # total real samples across masks == dataset size
    total = sum(b["sample_mask"].sum() for b in batches)
    assert total == 10


def test_drop_last(fixture_root):
    ds = ArrayDataset(
        audio=[np.ones((3, 2), np.float32)] * 10,
        video=[np.ones((3, 2), np.float32)] * 10,
        labels=[np.arange(10, dtype=np.float32)],
    )
    pipe = BatchPipeline(ds, batch_size=4, time_len=5, shuffle=True,
                         drop_last=True)
    assert len(list(pipe)) == 2


def test_shuffle_changes_across_epochs():
    ds = ArrayDataset(
        audio=[np.full((2, 2), i, np.float32) for i in range(16)],
        video=[np.full((2, 2), i, np.float32) for i in range(16)],
        labels=[np.arange(16, dtype=np.float32)],
    )
    pipe = BatchPipeline(ds, batch_size=8, time_len=2, shuffle=True)
    e1 = np.concatenate([b["labels"][0] for b in pipe])
    e2 = np.concatenate([b["labels"][0] for b in pipe])
    assert sorted(e1.tolist()) == sorted(e2.tolist()) == list(range(16))
    assert not np.array_equal(e1, e2)


def test_tokenizer_hash_fallback_deterministic():
    tok = build_tokenizer(None, vocab_size=1000)
    ids1, types1, mask1 = tok.encode("Hello world!", 8)
    ids2, _, _ = tok.encode("Hello world!", 8)
    assert ids1 == ids2
    assert ids1[0] == tok.cls_id
    assert mask1[:4] == [1, 1, 1, 1]
    assert len(ids1) == 8


def test_tokenizer_vocab_file(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "hello", "world", "##ly", "quick"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    tok = build_tokenizer(str(p))
    ids, _, _ = tok.encode("hello quickly", 8)
    assert ids[:5] == [2, 5, 8, 7, 3]  # [CLS] hello quick ##ly [SEP]


def test_get_dataset_scales_and_smoke(fixture_root, tmp_path):
    """Maintenance utilities (ref: DataLoaderUniversal.py:98-152)."""
    from mimrl_tpu.data.universal import get_dataset_scales, test_all_dataset

    sdk = _family_dir(fixture_root, "mosi_SDK")
    scales = get_dataset_scales(datasets=["mosi_SDK"], data_dir=sdk,
                                time_len=16, batch_size=8)
    mins, maxs = scales["mosi_SDK"]
    assert len(mins) == len(maxs) == 3
    assert all(np.isfinite(m) for m in mins[1:])  # audio/video scanned
    assert maxs[1] > mins[1]

    # the smoke checker asserts against registry dims -> needs a
    # registry-dim-matched fixture (covarep=74, facet42=35)
    make_sdk_fixture(str(tmp_path), "mosi", n_per_split=(6, 2, 2),
                     d_text=16, d_audio=74, d_video=35, seed=3)
    test_all_dataset(datasets=["mosi_SDK"], data_dir=str(tmp_path),
                     batch_size=4)
