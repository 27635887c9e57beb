"""Pin the eval-bank TIMING semantics: evaluate() must consume the
feature bank written by THIS epoch's stage 2 — the reference's behavior
(`Solver.py:46-49`: `self.train(...)` returns the `*_F_all` banks its
stage-2 loop just wrote, and both `self.evaluate(...)` calls consume
exactly those same-epoch banks). Bank staleness is the subtlest
semantic in the design (SURVEY.md appendix); this test intercepts the
bank arguments actually handed to the eval programs and diffs them
against the bank each train epoch wrote, for both the per-epoch scan
path and the per-batch default path. The grouped (--epoch_group) path
is pinned transitively by tests/test_epoch_group.py's G=2 == G=1
equality."""

import numpy as np
import pytest

from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.data.synthetic import make_dec_fixture
from mimrl_tpu.train.solver import Solver


@pytest.fixture(scope="module")
def dec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dec")
    make_dec_fixture(str(root), "mosi", n_per_split=(16, 8, 8), d_audio=5,
                     d_video=20, seed=11)
    return str(root)


def tiny_cfg(root, task_dir, **kw):
    base = dict(
        task_name="bt", task_dir=task_dir, dataset="mosi_Dec",
        data_dir=root, batch_size=8, time_len=12, d_common=16,
        encoders="gru",
        d_hiddens=[[12, 2, 16], [4, 2, 16]],
        d_outs=[[12, 2, 16], [4, 2, 16]],
        dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
        bias=True, res_project=[True, True], loss="MAE", epochs_num=2,
        learning_rate=2e-3, lr_decrease="step", lr_decrease_iter="60",
        stage1_n=1, k_neighbor=2,
        loss_mi_coefficient1=[1.0] * 11,
        loss_mi_coefficient2=[0.01] * 8,
        bert_layers=2, bert_heads=2, bert_hidden=32,
        num_workers=0, seed=0, save_latest_every=0, save_models=False,
    )
    base.update(kw)
    return MimrlConfig(**base)


def _np_bank(bank):
    return {k: np.asarray(getattr(bank, k))
            for k in ("C", "F", "T", "A", "V")}


def _same(a, b):
    return all(np.array_equal(a[k], b[k]) for k in a)


def test_scan_path_evals_use_this_epochs_bank(dec_root, tmp_path_factory):
    """--epoch_scan: each epoch's two eval dispatches must receive the
    bank train_epoch just returned (same-epoch, ref Solver.py:47-49),
    not the previous epoch's."""
    cfg = tiny_cfg(dec_root, str(tmp_path_factory.mktemp("runs")),
                   epoch_scan=True)
    solver = Solver(cfg)

    written = []      # per-epoch: the bank stage 2 wrote
    eval_banks = []   # (epoch index at call time, bank passed to eval)

    orig_train_epoch = solver.steps.train_epoch
    orig_eval_epoch = solver.steps.eval_epoch

    def train_epoch_rec(*a, **k):
        out = orig_train_epoch(*a, **k)
        written.append(_np_bank(out[-1]))  # new_bank is the last element
        return out

    def eval_epoch_rec(*a, **k):
        eval_banks.append((len(written) - 1, _np_bank(a[5])))
        return orig_eval_epoch(*a, **k)

    solver.steps.train_epoch = train_epoch_rec
    solver.steps.eval_epoch = eval_epoch_rec
    solver.solve()

    assert len(written) == cfg.epochs_num
    assert len(eval_banks) == 2 * cfg.epochs_num  # valid + test per epoch
    for epoch_idx, bank in eval_banks:
        assert epoch_idx >= 0
        assert _same(bank, written[epoch_idx]), (
            f"eval in epoch {epoch_idx} saw a bank != the one this "
            f"epoch's stage 2 wrote")
        if epoch_idx >= 1:
            # the stale (previous-epoch) bank must be distinguishable,
            # otherwise the assertion above is vacuous
            assert not _same(bank, written[epoch_idx - 1])


def test_per_batch_path_evals_use_this_epochs_bank(dec_root,
                                                   tmp_path_factory):
    """Default per-batch schedule: every eval_step batch must see the
    bank left by this epoch's train() (same-epoch semantics)."""
    cfg = tiny_cfg(dec_root, str(tmp_path_factory.mktemp("runs")),
                   epoch_scan=False)
    solver = Solver(cfg)

    after_train = []  # self.bank snapshot when each train() returns
    eval_banks = []

    orig_train = solver.train
    orig_eval_step = solver.steps.eval_step

    def train_rec(epoch):
        out = orig_train(epoch)
        after_train.append(_np_bank(solver.bank))
        return out

    def eval_step_rec(*a, **k):
        eval_banks.append((len(after_train) - 1, _np_bank(a[5])))
        return orig_eval_step(*a, **k)

    solver.train = train_rec
    solver.steps.eval_step = eval_step_rec
    solver.solve()

    assert len(after_train) == cfg.epochs_num
    assert len(eval_banks) >= 2 * cfg.epochs_num
    for epoch_idx, bank in eval_banks:
        assert epoch_idx >= 0
        assert _same(bank, after_train[epoch_idx])
        if epoch_idx >= 1:
            assert not _same(bank, after_train[epoch_idx - 1])
