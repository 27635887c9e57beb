"""End-to-end Solver tests on synthetic Dec fixtures: the full two-stage
loop runs, losses decrease on learnable synthetic data, checkpoints
resume, artifacts are written. (The reference has no equivalent —
SURVEY.md §4 implication (e).)"""

import glob
import os

import numpy as np
import pytest

from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.data.synthetic import make_dec_fixture
from mimrl_tpu.train.solver import Solver

pytestmark = pytest.mark.slow  # full-solver e2e: excluded from the fast lane


@pytest.fixture(scope="module")
def dec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dec")
    make_dec_fixture(str(root), "mosi", n_per_split=(32, 8, 8), d_audio=5,
                     d_video=20, seed=3)
    return str(root)


def tiny_cfg(root, task_dir, **kw):
    base = dict(
        task_name="t", task_dir=task_dir, dataset="mosi_Dec", data_dir=root,
        batch_size=8, time_len=12, d_common=16, encoders="gru",
        d_hiddens=[[12, 2, 16], [4, 2, 16]], d_outs=[[12, 2, 16], [4, 2, 16]],
        dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
        bias=True, res_project=[True, True], loss="MAE", epochs_num=2,
        learning_rate=2e-3, lr_decrease="step", lr_decrease_iter="60",
        stage1_n=1, k_neighbor=2,
        loss_mi_coefficient1=[1.0] * 11, loss_mi_coefficient2=[0.01] * 8,
        bert_layers=2, bert_heads=2, bert_hidden=32,
        num_workers=0, seed=0,
    )
    base.update(kw)
    return MimrlConfig(**base)


@pytest.fixture(scope="module")
def solved(dec_root, tmp_path_factory):
    """Run 2 epochs once; several tests inspect the artifacts."""
    task_dir = str(tmp_path_factory.mktemp("runs"))
    cfg = tiny_cfg(dec_root, task_dir)
    solver = Solver(cfg)
    best = solver.solve()
    return solver, best, task_dir


def test_two_stage_loop_runs(solved):
    solver, best, _ = solved
    assert best[0] is not None and "mae" in best[0]
    assert np.isfinite(best[0]["mae"])


def test_feature_bank_filled(solved):
    solver, _, _ = solved
    bank = solver.bank
    n_valid = int(np.sum(np.asarray(bank.valid)))
    assert n_valid == 32
    # bank rows must be non-zero after a full stage-2 epoch
    assert float(np.abs(np.asarray(bank.T)[:n_valid]).sum()) > 0
    assert float(np.abs(np.asarray(bank.C)[:n_valid]).sum()) > 0


def test_artifacts_written(solved):
    _, _, task_dir = solved
    run = os.path.join(task_dir, "t")
    for f in ("predictions_val.npy", "predictions_test.npy", "targets_val.npy",
              "targets_test.npy", "Running.log", "scalars.jsonl",
              "config.json", "latest_model.msgpack",
              "best_valid_model.msgpack"):
        assert os.path.exists(os.path.join(run, f)), f
    preds = np.load(os.path.join(run, "predictions_val.npy"))
    assert preds.shape[0] == 8  # n_valid samples, mask-filtered


def test_mi_telemetry_nonzero_after_epoch0(solved):
    solver, _, task_dir = solved
    import json

    scalars = [json.loads(l) for l in
               open(os.path.join(task_dir, "t", "scalars.jsonl"))]
    mi_ft = [s for s in scalars if s["tag"] == "Train/MI_ft"]
    assert len(mi_ft) == 2
    assert mi_ft[0]["value"] == 0.0          # epoch 0: no banks
    assert mi_ft[1]["value"] != 0.0          # epoch 1: MI active


def test_resume(dec_root, tmp_path_factory):
    task_dir = str(tmp_path_factory.mktemp("resume"))
    cfg = tiny_cfg(dec_root, task_dir, epochs_num=1, task_name="r")
    Solver(cfg).solve()
    run_dir = os.path.join(task_dir, "r")
    cfg2 = tiny_cfg(dec_root, task_dir, epochs_num=2, task_name="r",
                    resume=run_dir)
    solver2 = Solver(cfg2)
    assert solver2.start_epoch == 1
    assert solver2.have_bank  # banks restored -> MI losses active
    best = solver2.solve()
    assert best[0] is not None


def test_fast_stage1_mode(dec_root, tmp_path_factory):
    """--fast_stage1 runs the cached-features critic path and still
    produces active MI telemetry after epoch 0."""
    import json

    task_dir = str(tmp_path_factory.mktemp("fast"))
    cfg = tiny_cfg(dec_root, task_dir, epochs_num=2, task_name="f",
                   fast_stage1=True, stage1_n=2)
    best = Solver(cfg).solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])
    scalars = [json.loads(l) for l in
               open(os.path.join(task_dir, "f", "scalars.jsonl"))]
    mi_ft = [s for s in scalars if s["tag"] == "Train/MI_ft"]
    assert mi_ft[1]["value"] != 0.0


def test_loss_decreases_on_learnable_synthetic(dec_root, tmp_path_factory):
    """Convergence: labels correlate with audio features, so 4 epochs of
    task-loss training must beat the epoch-0 loss."""
    import json

    task_dir = str(tmp_path_factory.mktemp("conv"))
    cfg = tiny_cfg(dec_root, task_dir, epochs_num=4, task_name="c",
                   learning_rate=5e-3,
                   loss_mi_coefficient2=[0.0] * 8)
    Solver(cfg).solve()
    scalars = [json.loads(l) for l in
               open(os.path.join(task_dir, "c", "scalars.jsonl"))]
    train_loss = [s["value"] for s in scalars if s["tag"] == "Train/Loss"]
    assert len(train_loss) == 4
    assert train_loss[-1] < train_loss[0], train_loss


def test_bank_dtype_bf16(dec_root, tmp_path_factory):
    """--bank_dtype bfloat16: the feature banks are stored in bf16
    (halving bank HBM + kNN distance traffic) and the run still
    produces finite metrics and active MI telemetry."""
    import json

    import jax.numpy as jnp

    task_dir = str(tmp_path_factory.mktemp("bankdt"))
    cfg = tiny_cfg(dec_root, task_dir, epochs_num=2, task_name="b",
                   bank_dtype="bfloat16")
    solver = Solver(cfg)
    assert solver.bank.F.dtype == jnp.bfloat16
    best = solver.solve()
    assert solver.bank.F.dtype == jnp.bfloat16  # post-epoch banks too
    assert best[0] is not None and np.isfinite(best[0]["mae"])
    scalars = [json.loads(l) for l in
               open(os.path.join(task_dir, "b", "scalars.jsonl"))]
    mi_ft = [s for s in scalars if s["tag"] == "Train/MI_ft"]
    assert mi_ft[1]["value"] != 0.0 and np.isfinite(mi_ft[1]["value"])
