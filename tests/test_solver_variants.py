"""Solver variants: classification task, AVEC CCC selection + plateau
schedule, conv encoders, mesh-sharded (8-virtual-device) training loop."""

import os

import numpy as np
import pytest

from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.data.synthetic import make_avec_fixture, make_dec_fixture
from mimrl_tpu.train.solver import Solver

pytestmark = pytest.mark.slow  # full-solver e2e: excluded from the fast lane


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    dec = tmp_path_factory.mktemp("dec2")
    make_dec_fixture(str(dec), "mosi", n_per_split=(24, 8, 8), d_audio=5,
                     d_video=20, seed=5)
    avec = tmp_path_factory.mktemp("avec2")
    # dims must match the registry (avec mfcc=39, au=49) since the model
    # is sized from registry.dataset_dimensions
    make_avec_fixture(str(avec), n_per_split=(16, 8, 8), d_mfcc=39, d_au=49,
                      seed=5)
    return str(dec), str(avec)


def base_cfg(**kw):
    cfg = dict(
        batch_size=8, time_len=12, d_common=16, encoders="gru",
        d_hiddens=[[12, 2, 16], [4, 2, 16]], d_outs=[[12, 2, 16], [4, 2, 16]],
        dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
        bias=True, res_project=[True, True], epochs_num=2,
        learning_rate=2e-3, stage1_n=1, k_neighbor=2,
        loss_mi_coefficient1=[1.0] * 11, loss_mi_coefficient2=[0.01] * 8,
        bert_layers=2, bert_heads=2, bert_hidden=32, num_workers=0, seed=0,
    )
    cfg.update(kw)
    return MimrlConfig(**cfg)


def test_avec_ccc_selection_and_plateau(roots, tmp_path_factory):
    """AVEC2019: CCC-based model selection (ref: Solver.py:431-434),
    plateau LR schedule, random-word text augmentation."""
    _, avec = roots
    cfg = base_cfg(
        task_name="avec", task_dir=str(tmp_path_factory.mktemp("r")),
        dataset="avec2019", data_dir=avec, text="text", audio="mfcc",
        video="au", loss="CCC", lr_decrease="plateau", lr_decrease_iter="1",
    )
    best = Solver(cfg).solve()
    assert best[0] is not None
    assert set(best[0]) == {"mae", "ccc", "rmse"}
    assert np.isfinite(best[0]["ccc"])


def test_classification_ce(roots, tmp_path_factory):
    """2-class classification over Dec labels is not routed (Dec is
    regression-only in the reference); use the local dense dataset which
    carries a 2-class label column. Dense (glove) text now trains
    end-to-end — the reference's feature-text path is dead code, ours is
    functional (see tests/test_dense_text.py)."""
    from mimrl_tpu.data.synthetic import make_local_fixture

    root = str(tmp_path_factory.mktemp("local2"))
    # dims must match the registry table for mosi_20 (300, 5, 20) — the
    # loader reports dims from the registry, not from the pickles
    make_local_fixture(root, "mosi_20", n_per_split=(16, 8, 8),
                       dims=(300, 5, 20), time_len=10, seed=2)
    cfg = base_cfg(
        task_name="cls", task_dir=str(tmp_path_factory.mktemp("r2")),
        dataset="mosi_20", data_dir=root, task="classification",
        num_class=2, loss="CE", text="glove",
    )
    solver = Solver(cfg)
    assert not solver.raw_text and solver.params_bert == {}
    best = solver.solve()
    assert best[0] is not None
    assert np.isfinite(best[0]["2-class_acc"])


def test_conv_encoders_and_classification_dec(roots, tmp_path_factory):
    """Conv encoder path + CE classification loss through the full loop
    (Dec regression labels bucketed to {0,1} via synthetic ints)."""
    dec, _ = roots
    cfg = base_cfg(
        task_name="conv", task_dir=str(tmp_path_factory.mktemp("r3")),
        dataset="mosi_Dec", data_dir=dec, encoders="conv", loss="MAE",
    )
    best = Solver(cfg).solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])


def test_mesh_sharded_training_loop(roots, tmp_path_factory):
    """Full two-stage loop with the batch sharded over all 8 virtual
    devices (the DataParallel replacement, SURVEY.md §2.8)."""
    dec, _ = roots
    cfg = base_cfg(
        task_name="mesh", task_dir=str(tmp_path_factory.mktemp("r4")),
        dataset="mosi_Dec", data_dir=dec, mesh_data=8, parallel=True,
    )
    solver = Solver(cfg)
    assert solver.mesh is not None
    best = solver.solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])


def test_sdk_text_mode_solver(tmp_path_factory):
    """CMU-SDK raw-text path through the full loop: host tokenization of
    word lists (ref: Customization.py:59-84) + SDK label routing
    (ref: Solver.py:279-287)."""
    from mimrl_tpu.data.synthetic import make_sdk_fixture

    root = str(tmp_path_factory.mktemp("sdk_e2e"))
    make_sdk_fixture(root, "mosi", n_per_split=(24, 8, 8), d_text=16,
                     d_audio=74, d_video=47, seed=9)
    cfg = base_cfg(
        task_name="sdk", task_dir=str(tmp_path_factory.mktemp("rsdk")),
        dataset="mosi_SDK", data_dir=root, text="text", audio="covarep",
        video="facet41", normalize=[False, True, True], loss="MAE",
        epochs_num=2,
    )
    best = Solver(cfg).solve()
    assert best[0] is not None
    # full MOSI metric battery from the SDK route
    assert "2(pos/neg)-class_f1" in best[0]
    assert np.isfinite(best[0]["mae"])


def test_pom_sdk_label_routing(tmp_path_factory):
    """POM: 18-column label matrix, regression takes column 0
    (ref: Solver.py:288-294), POM metric battery."""
    from mimrl_tpu.data.synthetic import make_sdk_fixture

    root = str(tmp_path_factory.mktemp("pom_e2e"))
    # registry dims for pom: covarep=43, facet42=35 (ref: Config.py:66-69)
    make_sdk_fixture(root, "pom", n_per_split=(24, 8, 8), d_text=16,
                     d_audio=43, d_video=35, seed=11)
    cfg = base_cfg(
        task_name="pom", task_dir=str(tmp_path_factory.mktemp("rpom")),
        dataset="pom_SDK", data_dir=root, text="text", audio="covarep",
        video="facet42", loss="MAE", epochs_num=1,
    )
    best = Solver(cfg).solve()
    assert best[0] is not None
    assert set(best[0]) == {"mae", "corr", "2(pos/neg)-class_acc",
                            "2(nneg/neg)-class_acc", "2(pos/neg)-class_f1",
                            "2(nneg/neg)-class_f1"}


def test_pipeline_parallel_solver_loop(roots, tmp_path_factory):
    """Full two-stage loop with the BERT stack pipelined over a
    (data=2, pipe=2) mesh through the CLI config surface
    (--mesh_pipe/--pipe_microbatches)."""
    dec, _ = roots
    cfg = base_cfg(
        task_name="pp", task_dir=str(tmp_path_factory.mktemp("rpp")),
        dataset="mosi_Dec", data_dir=dec, mesh_data=2, mesh_pipe=2,
        pipe_microbatches=2, parallel=True,
    )
    solver = Solver(cfg)
    assert solver.mesh is not None and solver.mesh.shape["pipe"] == 2
    best = solver.solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])


def test_seq_shard_solver_loop(roots, tmp_path_factory):
    """Full loop with Megatron-style sequence sharding of the BERT
    activations over a (data=2, model=2) mesh (--seq_shard)."""
    dec, _ = roots
    cfg = base_cfg(
        task_name="sp", task_dir=str(tmp_path_factory.mktemp("rsp")),
        dataset="mosi_Dec", data_dir=dec, mesh_data=2, mesh_model=2,
        seq_shard=True, parallel=True,
    )
    solver = Solver(cfg)
    assert solver.model.bert_config.seq_sharding is not None
    best = solver.solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])


def test_moe_fusion_solver_loop(roots, tmp_path_factory):
    """Full loop with the expert-parallel MoE fusion encoder over a
    (data=2, model=2) mesh (--fusion moe)."""
    dec, _ = roots
    cfg = base_cfg(
        task_name="moe", task_dir=str(tmp_path_factory.mktemp("rmoe")),
        dataset="mosi_Dec", data_dir=dec, mesh_data=2, mesh_model=2,
        fusion="moe", fusion_layers=1, fusion_heads=2, moe_experts=2,
        moe_topk=1, parallel=True,
    )
    solver = Solver(cfg)
    assert solver.model.moe_ep_sharding is not None
    best = solver.solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])


def test_quant_int8_converges(roots, tmp_path_factory):
    """Metric-parity guard for --quant int8 (an opt-in knob: measured
    slower than bf16 end-to-end on v5e at canonical shapes, see
    docs/PERFORMANCE.md): the synthetic convergence suite must still
    learn — final train loss beats epoch-0 by a clear margin, and metrics
    stay finite. Guards the int8 BERT GEMM path (ops/quant.py) against
    silent numeric damage."""
    import json

    dec, _ = roots
    task_dir = str(tmp_path_factory.mktemp("q8"))
    cfg = base_cfg(
        task_name="q8", task_dir=task_dir, dataset="mosi_Dec", data_dir=dec,
        loss="MAE", lr_decrease="step", lr_decrease_iter="60",
        epochs_num=4, learning_rate=5e-3,
        loss_mi_coefficient2=[0.0] * 8,
        quant="int8", compute_dtype="bfloat16",
    )
    best = Solver(cfg).solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])
    scalars = [json.loads(l) for l in
               open(os.path.join(task_dir, "q8", "scalars.jsonl"))]
    train_loss = [s["value"] for s in scalars if s["tag"] == "Train/Loss"]
    assert len(train_loss) == 4
    assert train_loss[-1] < train_loss[0], train_loss
