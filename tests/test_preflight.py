"""Real-data preflight validation (data/preflight.py): every failure
mode raises an actionable error on fixtures that mimic the real file
layout (docs/RUNBOOK.md)."""

import os
import pickle

import numpy as np
import pytest

from mimrl_tpu.data.preflight import (check_bert_weights, check_vocab,
                                      run_preflight)
from mimrl_tpu.data.synthetic import (make_avec_fixture, make_dec_fixture,
                                      make_sdk_fixture)


def codes(findings, level=None):
    return [f.code for f in findings
            if level is None or f.level == level]


@pytest.fixture(scope="module")
def dec_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pf_dec"))
    make_dec_fixture(root, "mosi", n_per_split=(8, 4, 4), d_audio=5,
                     d_video=20, seed=0)
    return root


@pytest.fixture(scope="module")
def sdk_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pf_sdk"))
    make_sdk_fixture(root, "mosi", n_per_split=(8, 4, 4), d_audio=74,
                     d_video=35, seed=0)
    return root


def test_clean_dec_passes(dec_root):
    f = run_preflight("mosi_Dec", dec_root)
    assert not codes(f, "error")
    # no vocab/weights -> warnings, not errors (hermetic runs allowed)
    assert "vocab_missing" in codes(f)
    assert "weights_missing" in codes(f)


def test_missing_dir_and_files(tmp_path, dec_root):
    assert codes(run_preflight("mosi_Dec", str(tmp_path / "nope")),
                 "error") == ["data_dir_not_found"]
    partial = tmp_path / "partial"
    partial.mkdir()
    os.link(os.path.join(dec_root, "mosi_train.pkl"),
            str(partial / "mosi_train.pkl"))
    errs = codes(run_preflight("mosi_Dec", str(partial)), "error")
    assert errs.count("pickle_missing") == 2


def test_corrupt_pickle(tmp_path):
    (tmp_path / "mosi_train.pkl").write_bytes(b"not a pickle")
    (tmp_path / "mosi_valid.pkl").write_bytes(b"junk")
    (tmp_path / "mosi_test.pkl").write_bytes(b"junk")
    errs = codes(run_preflight("mosi_Dec", str(tmp_path)), "error")
    assert "pickle_unreadable" in errs


def test_dec_wrong_dims_and_labels(tmp_path):
    # MOSI Dec with MOSEI dims + 7-col labels: both flagged
    make_dec_fixture(str(tmp_path), "mosi", n_per_split=(4, 2, 2),
                     d_audio=74, d_video=35, seed=0)
    errs = codes(run_preflight("mosi_Dec", str(tmp_path)), "error")
    assert "dec_audio_dim" in errs and "dec_video_dim" in errs


def test_dec_label_cols(tmp_path):
    make_dec_fixture(str(tmp_path), "mosi", n_per_split=(4, 2, 2),
                     d_audio=5, d_video=20, seed=0)
    # rewrite train with 3-col labels
    path = str(tmp_path / "mosi_train.pkl")
    with open(path, "rb") as f:
        data = pickle.load(f)
    bad = [(e[0], np.zeros((1, 3), np.float32), e[2]) for e in data]
    with open(path, "wb") as f:
        pickle.dump(bad, f)
    assert "dec_label_cols" in codes(
        run_preflight("mosi_Dec", str(tmp_path)), "error")


def test_sdk_passes_and_bad_feature_name(sdk_root):
    ok = run_preflight("mosi_SDK", sdk_root, text="text", audio="covarep",
                       video="facet42")
    assert not codes(ok, "error")
    bad = run_preflight("mosi_SDK", sdk_root, text="text",
                        audio="not_a_feature", video="facet42")
    assert "sdk_feature_name" in codes(bad, "error")


def test_sdk_wrong_dims(tmp_path):
    # covarep must be 74-dim for mosi_SDK (registry table)
    make_sdk_fixture(str(tmp_path), "mosi", n_per_split=(4, 2, 2),
                     d_audio=10, d_video=35, seed=0)
    errs = codes(run_preflight("mosi_SDK", str(tmp_path), text="text",
                               audio="covarep", video="facet42"), "error")
    assert "sdk_feature_dim" in errs


def test_avec_layout(tmp_path):
    make_avec_fixture(str(tmp_path), n_per_split=(4, 2, 2), seed=0)
    assert not codes(run_preflight("avec2019", str(tmp_path),
                                   text="mfcc"), "error")


def test_vocab_checks(tmp_path):
    good = tmp_path / "vocab.txt"
    good.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]",
                               "[MASK]", "the", "a"]) + "\n")
    f = check_vocab(str(good))
    assert not [x for x in f if x.level == "error"]
    assert "vocab_small" in [x.code for x in f]
    bad = tmp_path / "notvocab.txt"
    bad.write_text("\n".join(f"w{i}" for i in range(2000)))
    assert "vocab_specials" in [x.code for x in check_vocab(str(bad))]
    assert "vocab_not_found" in [
        x.code for x in check_vocab(str(tmp_path / "missing.txt"))]


def test_bert_weights_checks(tmp_path):
    import torch

    good = tmp_path / "bert.bin"
    torch.save({"bert.embeddings.word_embeddings.weight":
                torch.zeros(100, 768)}, str(good))
    assert check_bert_weights(str(good), 768) == []
    assert "weights_hidden_mismatch" in [
        f.code for f in check_bert_weights(str(good), 512)]
    bad = tmp_path / "notbert.bin"
    torch.save({"some.other.key": torch.zeros(3)}, str(bad))
    assert "weights_schema" in [
        f.code for f in check_bert_weights(str(bad), 768)]
    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"xx")
    assert "weights_unreadable" in [
        f.code for f in check_bert_weights(str(junk), 768)]
    assert "weights_not_found" in [
        f.code for f in check_bert_weights(str(tmp_path / "no.bin"), 768)]


def test_parity_harness_refuses_on_preflight_errors(tmp_path):
    """The parity harness must refuse a real-data run whose inputs fail
    preflight (before building any model/solver)."""
    from mimrl_tpu.tools import parity

    with pytest.raises(SystemExit) as e:
        parity.main(["--data_dir", str(tmp_path / "nothing_here"),
                     "--allow_hermetic"])
    assert "preflight" in str(e.value)


def test_cli_exit_code(tmp_path, dec_root, capsys):
    from mimrl_tpu.data import preflight

    preflight.main(["--dataset", "mosi_Dec", "--data_dir", dec_root])
    assert "preflight: OK" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        preflight.main(["--dataset", "mosi_Dec",
                        "--data_dir", str(tmp_path / "none")])
