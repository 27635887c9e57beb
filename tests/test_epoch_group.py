"""--epoch_group: G whole epochs fused into one dispatched program must
reproduce the per-epoch scan path (same RNG stream, same LR points, same
batch plans) and persist the in-graph-selected best states."""

import json
import os

import numpy as np
import pytest

from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.data.synthetic import make_dec_fixture
from mimrl_tpu.train.solver import Solver


@pytest.fixture(scope="module")
def dec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dec_group")
    make_dec_fixture(str(root), "mosi", n_per_split=(32, 8, 8), d_audio=5,
                     d_video=20, seed=7)
    return str(root)


def cfg_for(root, task_dir, **kw):
    base = dict(
        task_name="g", task_dir=task_dir, dataset="mosi_Dec", data_dir=root,
        batch_size=8, time_len=12, d_common=16, encoders="gru",
        d_hiddens=[[12, 2, 16], [4, 2, 16]], d_outs=[[12, 2, 16], [4, 2, 16]],
        dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
        bias=True, res_project=[True, True], loss="MAE", epochs_num=5,
        learning_rate=2e-3, stage1_n=2, k_neighbor=2,
        loss_mi_coefficient1=[1.0] * 11, loss_mi_coefficient2=[0.01] * 8,
        bert_layers=2, bert_heads=2, bert_hidden=32, num_workers=0, seed=0,
        epoch_scan=True, save_latest_every=0,
        # the grouped path is single-device (device-side shuffle gathers
        # from unsharded flats); pin mesh off under the 8-virtual-device
        # test environment so G=1 and G=2 run the same unsharded path
        mesh_data=1,
    )
    base.update(kw)
    return MimrlConfig(**base)


def _series(task_dir, name, tag):
    scalars = [json.loads(l) for l in
               open(os.path.join(task_dir, name, "scalars.jsonl"))]
    return [s["value"] for s in scalars if s["tag"] == tag]


def test_epoch_group_matches_per_epoch(dec_root, tmp_path_factory):
    """G=2 grouped run vs the per-epoch scan path: identical RNG/LR/plan
    streams, so the trajectories must agree to float-reassociation
    tolerance and the best scores must match."""
    d1 = str(tmp_path_factory.mktemp("runs_g1"))
    s1 = Solver(cfg_for(dec_root, d1, task_name="g1", epoch_group=1))
    best1 = s1.solve()
    d2 = str(tmp_path_factory.mktemp("runs_g2"))
    s2 = Solver(cfg_for(dec_root, d2, task_name="g2", epoch_group=2))
    assert s2._group_supported()
    best2 = s2.solve()

    for tag in ("Train/Loss", "Val/Loss", "Val/mae", "Test/mae", "Lr"):
        a = np.asarray(_series(d1, "g1", tag))
        b = np.asarray(_series(d2, "g2", tag))
        assert a.shape == b.shape, tag
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-3, err_msg=tag)
    # same model-selection outcome (scores computed from the same
    # predictions; decisions made on-device in the grouped run)
    assert abs(best1[0]["mae"] - best2[0]["mae"]) < 5e-3
    assert abs(best1[2]["mae"] - best2[2]["mae"]) < 5e-3
    # bank filled by the grouped stage 2
    n_valid = int(np.sum(np.asarray(s2.bank.valid)))
    assert n_valid == 32
    assert float(np.abs(np.asarray(s2.bank.T)[:n_valid]).sum()) > 0


def test_epoch_group_saves_device_best(dec_root, tmp_path_factory):
    """The device-tracked best-valid state is persisted in the
    checkpoint schema and its epoch is a real epoch of the run."""
    d = str(tmp_path_factory.mktemp("runs_gb"))
    s = Solver(cfg_for(dec_root, d, task_name="gb", epoch_group=2,
                       epochs_num=4))
    s.solve()
    from mimrl_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.join(d, "gb"))
    template = s._state_dict(0)
    state = mgr.restore("best_valid", template)
    assert state is not None
    assert 0 <= int(state["epoch"]) < 4
    # params in the snapshot are real trained arrays
    leaf = next(iter(jax_leaves(state["params_main"])))
    assert np.isfinite(np.asarray(leaf)).all()


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_epoch_group_plateau_matches_per_epoch(dec_root,
                                               tmp_path_factory):
    """Round-5: the plateau LR schedule runs IN-SCAN (factor carried in
    the group carry, updated from each epoch's valid loss — ref
    Solver.py:52-57) instead of forcing the per-epoch fallback. G=2 must
    reproduce the per-epoch plateau run: same Lr series, same losses."""
    kw = dict(lr_decrease="plateau", lr_decrease_iter="1",
              lr_decrease_rate=0.5, epochs_num=6)
    d1 = str(tmp_path_factory.mktemp("runs_p1"))
    s1 = Solver(cfg_for(dec_root, d1, task_name="p1", epoch_group=1, **kw))
    best1 = s1.solve()
    d2 = str(tmp_path_factory.mktemp("runs_p2"))
    s2 = Solver(cfg_for(dec_root, d2, task_name="p2", epoch_group=2, **kw))
    assert s2._group_supported()
    best2 = s2.solve()

    for tag in ("Train/Loss", "Val/Loss", "Val/mae", "Lr"):
        a = np.asarray(_series(d1, "p1", tag))
        b = np.asarray(_series(d2, "p2", tag))
        assert a.shape == b.shape, tag
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-3,
                                   err_msg=tag)
    # the schedule must actually have decayed at least once in 6 epochs
    # with patience 1, otherwise this cell proves nothing
    lr = _series(d2, "p2", "Lr")
    assert min(lr) < max(lr)
    # host schedule state synced back from the device at run end
    assert abs(s2.lr_schedule.factor - s1.lr_schedule.factor) < 1e-6
    assert abs(best1[0]["mae"] - best2[0]["mae"]) < 5e-3


def test_epoch_group_mesh_data_matches_per_epoch_mesh(dec_root,
                                                      tmp_path_factory):
    """Round-5: grouped dispatch on a data-parallel mesh (batch pinned
    over the `data` axis in-graph) must reproduce the per-epoch scan
    path ON THE SAME MESH — identical sharding, RNG and plan streams,
    so only the grouped-program fusion differs. (Sharded-vs-UNsharded
    trajectory equality is NOT the claim here: per-step reduction-order
    deltas compound through Adam over epochs; the one-step sharded ==
    single-device certificate lives in test_distributed.py /
    dryrun_multichip.)"""
    d1 = str(tmp_path_factory.mktemp("runs_m1"))
    s1 = Solver(cfg_for(dec_root, d1, task_name="m1", epoch_group=1,
                        mesh_data=2))
    assert s1.mesh is not None, "mesh_data=2 needs the 8-device conftest"
    best1 = s1.solve()
    d2 = str(tmp_path_factory.mktemp("runs_m2"))
    s2 = Solver(cfg_for(dec_root, d2, task_name="m2", epoch_group=2,
                        mesh_data=2))
    assert s2.mesh is not None
    assert s2._group_supported()
    best2 = s2.solve()

    for tag in ("Train/Loss", "Val/Loss", "Val/mae", "Test/mae"):
        a = np.asarray(_series(d1, "m1", tag))
        b = np.asarray(_series(d2, "m2", tag))
        assert a.shape == b.shape, tag
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-3, err_msg=tag)
    assert abs(best1[0]["mae"] - best2[0]["mae"]) < 5e-3


def test_epoch_group_avec_matches_per_epoch(tmp_path_factory):
    """Round-5: AVEC's per-epoch random-word text (ref
    Customization.py:66-76) is pre-drawn into token plans with the
    loaders' own RNG streams, so grouped == per-epoch on AVEC too —
    including the CCC-based in-graph selection (ref Solver.py:431-434)."""
    from mimrl_tpu.data.synthetic import make_avec_fixture

    root = tmp_path_factory.mktemp("avec_g")
    make_avec_fixture(str(root), n_per_split=(16, 8, 8), d_mfcc=39,
                      d_au=49, seed=5)
    kw = dict(dataset="avec2019", data_dir=str(root), text="text",
              audio="mfcc", video="au", loss="CCC", epochs_num=5)
    d1 = str(tmp_path_factory.mktemp("runs_a1"))
    s1 = Solver(cfg_for(str(root), d1, task_name="a1", epoch_group=1,
                        **kw))
    best1 = s1.solve()
    d2 = str(tmp_path_factory.mktemp("runs_a2"))
    s2 = Solver(cfg_for(str(root), d2, task_name="a2", epoch_group=2,
                        **kw))
    assert s2._group_supported()
    best2 = s2.solve()

    for tag in ("Train/Loss", "Val/Loss", "Val/ccc", "Test/ccc"):
        a = np.asarray(_series(d1, "a1", tag))
        b = np.asarray(_series(d2, "a2", tag))
        assert a.shape == b.shape, tag
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-3,
                                   err_msg=tag)
    assert abs(best1[0]["ccc"] - best2[0]["ccc"]) < 5e-3


@pytest.mark.slow
def test_epoch_group_save_best_features(dec_root, tmp_path_factory):
    """Round-5: --save_best_features streams the winning epochs' eval
    features from the device snapshots at group end; the pickles must
    match the per-epoch path's (ref Solver.py:514-531 artifacts)."""
    import pickle

    kw = dict(save_best_features=True, epochs_num=4)
    d1 = str(tmp_path_factory.mktemp("runs_f1"))
    Solver(cfg_for(dec_root, d1, task_name="f1", epoch_group=1,
                   **kw)).solve()
    d2 = str(tmp_path_factory.mktemp("runs_f2"))
    s2 = Solver(cfg_for(dec_root, d2, task_name="f2", epoch_group=2,
                        **kw))
    assert s2._group_supported()
    s2.solve()

    for name in ("features_val", "features_test",
                 "features_test_for_valid"):
        with open(os.path.join(d1, "f1", f"{name}.pkl"), "rb") as f:
            a = pickle.load(f)
        with open(os.path.join(d2, "f2", f"{name}.pkl"), "rb") as f:
            b = pickle.load(f)
        assert len(a) == len(b), name
        for ba, bb in zip(a, b):
            for fa, fb in zip(ba, bb):
                np.testing.assert_allclose(
                    np.asarray(fa, np.float32),
                    np.asarray(fb, np.float32),
                    rtol=1e-3, atol=5e-3, err_msg=name)


def test_epoch_group_stage1_cached(dec_root, tmp_path_factory):
    """Grouped dispatch composes with --stage1_cached (the headline
    bench rung) and still learns: the final-epoch train MAE must improve
    on the first epoch's."""
    d = str(tmp_path_factory.mktemp("runs_gc"))
    s = Solver(cfg_for(dec_root, d, task_name="gc", epoch_group=3,
                       epochs_num=7, stage1_cached=True))
    best = s.solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])
    maes = _series(d, "gc", "Train/mae")
    assert len(maes) == 7
    assert maes[-1] < maes[0]
    # MI telemetry active after epoch 0 (critics trained from the bank)
    mi_ft = _series(d, "gc", "Train/MI_ft")
    assert mi_ft[0] == 0.0 and any(v != 0.0 for v in mi_ft[1:])
