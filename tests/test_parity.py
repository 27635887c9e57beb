"""Parity-protocol harness (mimrl_tpu/tools/parity.py): refusal
semantics and the hermetic synthetic-fixture smoke (BASELINE.md
protocol; ref recipe README.md:17-24)."""

import json

import numpy as np
import pytest

from mimrl_tpu.tools import parity


def test_canonical_config_matches_reference_recipe():
    cfg = parity.canonical_config()
    assert cfg.batch_size == 128 and cfg.time_len == 100
    assert cfg.bound_type == "infonce" and cfg.critic_type == "separate"
    assert cfg.stage1_n == 2 and cfg.learning_rate == 4e-3
    assert cfg.lr_decrease == "multi_step" and cfg.lr_decrease_iter == "9-60"
    assert cfg.loss_mi_coefficient2 == [0.01] * 8
    assert cfg.epochs_num == 70 and cfg.gradient_clip == 1.5


def test_refuses_hermetic_without_optin(tmp_path):
    """No vocab/weights and no --allow_hermetic: hard failure with a
    clear message (the hash-tokenizer/random-BERT footgun)."""
    with pytest.raises(SystemExit) as e:
        parity.main(["--synthetic", "--epochs_num", "1",
                     "--task_dir", str(tmp_path)])
    assert "REFUSING" in str(e.value)


@pytest.mark.slow
def test_hermetic_smoke(tmp_path):
    """--synthetic --allow_hermetic runs the canonical recipe shape
    end-to-end at tiny sizes and emits the full report schema."""
    out = tmp_path / "parity.json"
    report = parity.main([
        "--synthetic", "--allow_hermetic", "--epochs_num", "2",
        "--task_dir", str(tmp_path), "--out", str(out),
        "--compute_dtype", "float32"])
    assert report["hermetic"] is True
    assert np.isfinite(report["best_valid_score"]["mae"])
    assert np.isfinite(report["samples_per_sec"])
    # 8 MI channels for each of Train/Val/Test
    tags = set(report["mi_channels"])
    for split in ("Train", "Val", "Test"):
        present = [t for t in tags if t.startswith(split + "/")]
        assert len(present) == 8, (split, present)
    # epoch-0 zeros, epoch-1 active (ref: Customization.py:97-98)
    ft = report["mi_channels"]["Train/MI_ft"]
    assert ft[0] == 0.0 and ft[1] != 0.0
    on_disk = json.load(open(out))
    assert on_disk["best_valid_score"] == report["best_valid_score"]


def test_compare_reports_pass_and_fail(tmp_path):
    """--compare: per-metric relative deltas, pass/fail vs --rel_tol,
    accepting both full reports and flat reference dicts."""
    ours = {"test_score_at_best_valid": {"mae": 0.700, "corr": 0.790},
            "hermetic": False}
    ref_flat = {"mae": 0.703, "corr": 0.792}   # within 1%
    res = parity.compare_reports(ours, ref_flat, rel_tol=0.01)
    assert res["pass"] is True
    assert set(res["compared"]) == {"mae", "corr"}
    assert res["metrics"]["mae"]["ok"] and res["metrics"]["corr"]["ok"]

    ref_far = {"mae": 0.650, "corr": 0.792}    # mae off by ~7.7%
    res2 = parity.compare_reports(ours, ref_far, rel_tol=0.01)
    assert res2["pass"] is False
    assert not res2["metrics"]["mae"]["ok"]
    assert res2["metrics"]["corr"]["ok"]

    # full-report-vs-full-report and the CLI path (exit 1 on fail)
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(json.dumps(ours))
    b.write_text(json.dumps({"test_score_at_best_valid": ref_far}))
    res3 = parity.main(["--compare", str(a), str(b), "--rel_tol", "0.2"])
    assert res3["pass"] is True
    with pytest.raises(SystemExit):
        parity.main(["--compare", str(a), str(b), "--rel_tol", "0.001"])


def test_compare_reports_no_shared_keys():
    with pytest.raises(SystemExit):
        parity.compare_reports({"test_score_at_best_valid": {"mae": 1.0}},
                               {"accuracy": 0.5}, rel_tol=0.01)
