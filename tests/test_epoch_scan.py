"""--epoch_scan: whole-epoch scanned programs must train end-to-end and
produce equivalent artifacts to the per-batch path."""

import json
import os

import jax
import numpy as np
import pytest

from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.data.synthetic import make_dec_fixture
from mimrl_tpu.train.solver import Solver

pytestmark = pytest.mark.slow  # full-solver e2e: excluded from the fast lane


@pytest.fixture(scope="module")
def dec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dec_scan")
    make_dec_fixture(str(root), "mosi", n_per_split=(32, 8, 8), d_audio=5,
                     d_video=20, seed=7)
    return str(root)


def cfg_for(root, task_dir, **kw):
    base = dict(
        task_name="s", task_dir=task_dir, dataset="mosi_Dec", data_dir=root,
        batch_size=8, time_len=12, d_common=16, encoders="gru",
        d_hiddens=[[12, 2, 16], [4, 2, 16]], d_outs=[[12, 2, 16], [4, 2, 16]],
        dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
        bias=True, res_project=[True, True], loss="MAE", epochs_num=2,
        learning_rate=2e-3, stage1_n=2, k_neighbor=2,
        loss_mi_coefficient1=[1.0] * 11, loss_mi_coefficient2=[0.01] * 8,
        bert_layers=2, bert_heads=2, bert_hidden=32, num_workers=0, seed=0,
        epoch_scan=True,
    )
    base.update(kw)
    return MimrlConfig(**base)


def test_epoch_scan_trains(dec_root, tmp_path_factory):
    task_dir = str(tmp_path_factory.mktemp("runs"))
    solver = Solver(cfg_for(dec_root, task_dir))
    best = solver.solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])
    # banks filled by the scanned stage 2
    n_valid = int(np.sum(np.asarray(solver.bank.valid)))
    assert n_valid == 32
    assert float(np.abs(np.asarray(solver.bank.T)[:n_valid]).sum()) > 0
    # MI telemetry: zero at epoch 0, active after
    scalars = [json.loads(l) for l in
               open(os.path.join(task_dir, "s", "scalars.jsonl"))]
    mi_ft = [x for x in scalars if x["tag"] == "Train/MI_ft"]
    assert mi_ft[0]["value"] == 0.0
    assert mi_ft[1]["value"] != 0.0


def test_epoch_scan_with_features(dec_root, tmp_path_factory):
    task_dir = str(tmp_path_factory.mktemp("runs2"))
    solver = Solver(cfg_for(dec_root, task_dir, save_best_features=True,
                            epochs_num=1, task_name="f"))
    solver.solve()
    import pickle

    with open(os.path.join(task_dir, "f", "features_val.pkl"), "rb") as f:
        feats = pickle.load(f)
    assert len(feats) == 1  # one eval batch of 8
    assert feats[0][0].shape == (8, 16)  # F_F mask-filtered


def test_epoch_scan_tracks_per_batch_trajectory(dec_root,
                                                tmp_path_factory):
    """Trajectory consistency: with every noise source off (dropout 0
    everywhere, MI coefficients zeroed so kNN-keyed critic training
    can't reach the task objective), the scanned-epoch path must follow
    the per-batch path's train-loss trajectory. Exact equality is not
    achievable — MAE's subgradient flips sign on bitwise-level
    prediction differences, so XLA re-association inside lax.scan
    diverges the two runs at the 1e-3 level after an epoch — but a
    misrouted label stack / shifted batch order / dropped optimizer
    carry shows up at the 1e-1 level, which is what this pins."""
    import json

    def losses(task_dir, **kw):
        cfg = cfg_for(dec_root, task_dir, epochs_num=2, task_name="tr",
                      loss_mi_coefficient2=[0.0] * 8, bert_dropout=0.0,
                      **kw)
        Solver(cfg).solve()
        scal = [json.loads(l) for l in
                open(os.path.join(task_dir, "tr", "scalars.jsonl"))]
        return [s["value"] for s in scal if s["tag"] == "Train/Loss"]

    per_batch = losses(str(tmp_path_factory.mktemp("pb")),
                       epoch_scan=False)
    scanned = losses(str(tmp_path_factory.mktemp("sc")), epoch_scan=True)
    assert len(per_batch) == len(scanned) == 2
    # epoch 1 precedes any update divergence: near-exact
    assert abs(per_batch[0] - scanned[0]) < 1e-3, (per_batch, scanned)
    assert abs(per_batch[1] - scanned[1]) < 5e-2, (per_batch, scanned)


def test_pipelined_epochs_bit_identical(dec_root, tmp_path_factory):
    """--no_pipeline_epochs vs the (default) pipelined loop: dispatch
    order, RNG stream, and LR application points are identical — only
    host sync ordering changes — so every logged scalar, the best
    scores, and the saved best-state params must match BITWISE. Any
    drift means the pipelined loop reordered a device program or
    snapshotted after a donation."""
    import json

    def run(task_dir, **kw):
        cfg = cfg_for(dec_root, task_dir, task_name="pl", epochs_num=3,
                      save_latest_every=2, **kw)
        solver = Solver(cfg)
        best = solver.solve()
        scal = [json.loads(l) for l in
                open(os.path.join(task_dir, "pl", "scalars.jsonl"))]
        return solver, best, scal

    s0, b0, sc0 = run(str(tmp_path_factory.mktemp("seq")),
                      pipeline_epochs=False)
    s1, b1, sc1 = run(str(tmp_path_factory.mktemp("pipe")),
                      pipeline_epochs=True)
    assert [ (x["tag"], x["step"], x["value"]) for x in sc0 ] == \
           [ (x["tag"], x["step"], x["value"]) for x in sc1 ]
    assert b0[0] == b1[0] and b0[1] == b1[1] and b0[2] == b1[2]
    # final live params identical (same epoch count, same updates)
    p0 = jax.tree_util.tree_leaves(s0.params_main)
    p1 = jax.tree_util.tree_leaves(s1.params_main)
    for a, b in zip(p0, p1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the pipelined checkpoint-cadence save (from the dispatch-time
    # snapshot) restores into a new solver exactly like the sync one
    from mimrl_tpu.core.checkpoint import CheckpointManager
    for s in (s0, s1):
        mgr = CheckpointManager(os.path.join(s.opt.task_dir, "pl"))
        state = mgr.restore("latest", s._state_dict(0))
        assert state is not None and int(state["epoch"]) == 2


def test_epoch_scan_sharded_matches_unsharded(dec_root, tmp_path_factory):
    """--epoch_scan under an 8-virtual-device data mesh: the sharded
    _stack_epoch branch + bank writes under data sharding must reproduce
    the unsharded run — same bank rows (same sample routing) and the
    same metric trajectory. Gross mismatch here means misrouted shards
    or a corrupted bank scatter; small drift is XLA reduction-order."""
    def run(task_dir, **kw):
        cfg = cfg_for(dec_root, task_dir, task_name="sh", epochs_num=2,
                      bert_dropout=0.0, **kw)
        solver = Solver(cfg)
        best = solver.solve()
        return solver, best

    s0, b0 = run(str(tmp_path_factory.mktemp("uns")))
    s1, b1 = run(str(tmp_path_factory.mktemp("shd")), mesh_data=8,
                 parallel=True)
    assert s1.mesh is not None
    # same samples marked valid in the bank
    v0, v1 = np.asarray(s0.bank.valid), np.asarray(s1.bank.valid)
    np.testing.assert_array_equal(v0, v1)
    n = int(v0.sum())
    assert n == 32
    # bank feature rows match per-sample (atol covers 2 epochs of
    # reduction-order drift; a shard/routing bug is O(1) wrong)
    for name in ("T", "A", "V", "C", "F"):
        r0 = np.asarray(getattr(s0.bank, name))[:n]
        r1 = np.asarray(getattr(s1.bank, name))[:n]
        assert float(np.abs(r0).sum()) > 0
        np.testing.assert_allclose(r0, r1, atol=5e-2,
                                   err_msg=f"bank.{name}")
    # final valid metrics agree
    assert abs(b0[0]["mae"] - b1[0]["mae"]) < 5e-2, (b0[0], b1[0])


def test_device_shuffle_stack_matches_host_stack(dec_root,
                                                 tmp_path_factory):
    """The device-side-shuffle fast path (_stack_epoch_device_shuffle:
    dataset tensors cached on device, per-epoch [NB, bs] gather plan)
    must produce BIT-IDENTICAL epoch stacks to the host restack it
    replaces — same loader rng, same cycle-pad, two consecutive epochs
    (distinct shuffles). MIMRL_HOST_STACK=1 is the slow-path escape
    hatch used for the reference side."""
    import os as _os

    import numpy as np

    def stacks(task_dir, host: bool, n_epochs=2):
        solver = Solver(cfg_for(dec_root, task_dir, task_name="ds"))
        out = []
        if host:
            _os.environ["MIMRL_HOST_STACK"] = "1"
        try:
            for _ in range(n_epochs):
                out.append(solver._stack_epoch(solver.train_loader))
        finally:
            _os.environ.pop("MIMRL_HOST_STACK", None)
        return out

    fast = stacks(str(tmp_path_factory.mktemp("f")), host=False)
    slow = stacks(str(tmp_path_factory.mktemp("s")), host=True)
    for (bf, lf, lnf, mf), (bs_, ls, lns, ms) in zip(fast, slow):
        assert set(bf) == set(bs_)
        for k in bf:
            np.testing.assert_array_equal(np.asarray(bf[k]),
                                          np.asarray(bs_[k]), err_msg=k)
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(ls))
        for a, b in zip(lnf, lns):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(mf, ms):
            np.testing.assert_array_equal(a, b)
    # the two epochs really differ (shuffle active)
    assert not np.array_equal(np.asarray(fast[0][1]),
                              np.asarray(fast[1][1]))


def test_check_gradient_per_parameter_lines(dec_root, tmp_path_factory):
    """--check_gradient emits per-PARAMETER name/para/grad_value lines
    with bert params skipped (ref print_gradient, Utils.py:11-19)."""
    task_dir = str(tmp_path_factory.mktemp("cg"))
    cfg = cfg_for(dec_root, task_dir, task_name="cg", epochs_num=2,
                  epoch_scan=False, check_gradient=True)
    Solver(cfg).solve()
    log = open(os.path.join(task_dir, "cg", "Running.log")).read()
    names = [l.split("-->name: ", 1)[1] for l in log.splitlines()
             if "-->name: " in l]
    assert len(names) > 20  # per-leaf, not per-top-level-module
    assert not any("bert" in n for n in names)
    # leaf-level paths (nested module names), value lines present
    assert any("kernel" in n for n in names)
    assert "-->grad_value: " in log and "-->para: " in log
