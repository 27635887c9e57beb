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
