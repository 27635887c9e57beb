"""Failure containment and graceful preemption (SURVEY.md §5.3 — the
reference has no retry, preemption, or NaN handling of any kind)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mimrl_tpu.core.checkpoint import CheckpointManager
from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.data.synthetic import make_dec_fixture
from mimrl_tpu.train.solver import Solver


@pytest.fixture(scope="module")
def dec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dec")
    make_dec_fixture(str(root), "mosi", n_per_split=(32, 8, 8), d_audio=5,
                     d_video=20, seed=3)
    return str(root)


def _cfg(root, task_dir, **kw):
    base = dict(
        task_name="t", task_dir=task_dir, dataset="mosi_Dec", data_dir=root,
        batch_size=8, time_len=12, d_common=16, encoders="gru",
        d_hiddens=[[12, 2, 16], [4, 2, 16]], d_outs=[[12, 2, 16], [4, 2, 16]],
        dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
        bias=True, res_project=[True, True], loss="MAE", epochs_num=3,
        learning_rate=2e-3, lr_decrease="step", lr_decrease_iter="60",
        stage1_n=1, k_neighbor=2,
        loss_mi_coefficient1=[1.0] * 11, loss_mi_coefficient2=[0.01] * 8,
        bert_layers=2, bert_heads=2, bert_hidden=32,
        num_workers=0, seed=0,
    )
    base.update(kw)
    return MimrlConfig(**base)


@pytest.mark.slow
def test_skip_nonfinite_updates_guards_params():
    """A poisoned batch (NaN labels -> NaN loss) must leave params
    bit-identical with the guard on. Subtlety the guard covers: XLA
    lowers the abs/max backwards to NaN-swallowing comparisons, so NaN
    labels produce a NaN LOSS but finite *garbage* gradients — the guard
    therefore checks the loss as well as the grads. With the guard off,
    the step applies the garbage update."""
    import __graft_entry__ as ge
    from mimrl_tpu.models.model import init_full
    from mimrl_tpu.train.optim import (
        make_main_optimizer, make_vmi_optimizer, merge_params,
        partition_params)
    from mimrl_tpu.train.steps import FeatureBank, StepFactory

    bs, time_len, d_a, d_v, d_common = 4, 8, 6, 4, 16
    cfg, model = ge._build(bs, time_len, d_a, d_v, d_common=d_common,
                           bert_layers=2, bert_hidden=32, bert_heads=2,
                           cube_l=4)
    inputs = ge._inputs(bs, time_len, d_a, d_v)
    params = init_full(model, {"params": jax.random.PRNGKey(0)},
                       *inputs)["params"]
    batch = {
        "bert_sentences": inputs[0], "bert_sentence_types": inputs[1],
        "bert_sentence_att_mask": inputs[2], "audio": inputs[3],
        "video": inputs[4], "sample_mask": jnp.ones((bs,), jnp.float32),
    }
    nan_labels = jnp.full((bs,), jnp.nan, jnp.float32)
    bank = FeatureBank.create(2 * bs, 2 * bs, d_common)
    rng = jax.random.PRNGKey(1)

    def run(guard):
        c = cfg.replace(skip_nonfinite_updates=guard)
        p_main, p_bert, p_vmi = partition_params(params)
        opt_main = make_main_optimizer(c, p_main, p_bert)
        opt_vmi = make_vmi_optimizer(c)
        oms = opt_main.init(merge_params(p_main, p_bert))
        steps = StepFactory(model, c, opt_main, opt_vmi)
        new_bank = FeatureBank.create(2 * bs, 2 * bs, d_common)
        (p_main2, p_bert2, _, loss, _, _, new_bank) = steps.train_step(
            p_main, p_bert, p_vmi, oms, batch, nan_labels, bank, new_bank,
            0, rng, use_mi=False)
        return jax.device_get(merge_params(p_main2, p_bert2)), new_bank

    before = jax.device_get(params)
    guarded, bank_g = run(True)
    for path, leaf in jax.tree_util.tree_leaves_with_path(guarded):
        np.testing.assert_array_equal(leaf, _lookup(before, path),
                                      err_msg=jax.tree_util.keystr(path))
    # the feature-bank write is guarded too: the NaN labels must NOT
    # reach bank.C (a poisoned bank would NaN every future kNN sample)
    assert np.isfinite(np.asarray(bank_g.C)).all()
    assert np.asarray(bank_g.C).sum() == 0.0
    unguarded, bank_u = run(False)
    assert not np.isfinite(np.asarray(bank_u.C)).all()
    changed = any(
        not np.array_equal(leaf, _lookup(before, path))
        for path, leaf in jax.tree_util.tree_leaves_with_path(unguarded))
    assert changed  # garbage update applied without the guard


@pytest.mark.slow
def test_guard_covers_critic_paths():
    """The guard must also protect the critic updates (per-batch AND
    epoch-scan stage-1 bodies): poisoned features -> critic params
    unchanged."""
    import __graft_entry__ as ge
    from mimrl_tpu.models.model import init_full
    from mimrl_tpu.train.optim import (
        make_main_optimizer, make_vmi_optimizer, merge_params,
        partition_params)
    from mimrl_tpu.train.steps import FeatureBank, StepFactory

    bs, time_len, d_a, d_v, d_common = 4, 8, 6, 4, 16
    cfg, model = ge._build(bs, time_len, d_a, d_v, d_common=d_common,
                           bert_layers=2, bert_hidden=32, bert_heads=2,
                           cube_l=4)
    cfg = cfg.replace(skip_nonfinite_updates=True)
    inputs = ge._inputs(bs, time_len, d_a, d_v)
    params = init_full(model, {"params": jax.random.PRNGKey(0)},
                       *inputs)["params"]
    p_main, p_bert, p_vmi = partition_params(params)
    opt_main = make_main_optimizer(cfg, p_main, p_bert)
    opt_vmi = make_vmi_optimizer(cfg)
    ovs = opt_vmi.init(p_vmi)
    steps = StepFactory(model, cfg, opt_main, opt_vmi)
    bank = FeatureBank.create(2 * bs, 2 * bs, d_common)
    labels = jnp.zeros((bs,), jnp.float32)
    nan_feat = jnp.full((bs, d_common), jnp.nan, jnp.float32)
    feats = (nan_feat, nan_feat, nan_feat, nan_feat)
    before = jax.device_get(p_vmi)

    p_vmi2, _, loss, _ = steps.critic_update(
        p_main, p_bert, p_vmi, ovs, feats, labels, bank,
        jax.random.PRNGKey(1))
    after = jax.device_get(p_vmi2)
    for path, leaf in jax.tree_util.tree_leaves_with_path(after):
        np.testing.assert_array_equal(leaf, _lookup(before, path),
                                      err_msg=jax.tree_util.keystr(path))


def _lookup(tree, path):
    node = tree
    for p in path:
        node = node[getattr(p, "key", p)]
    return node


@pytest.mark.slow
def test_preemption_graceful_checkpoint(dec_root, tmp_path_factory):
    """request_preemption() (the SIGTERM handler's body) finishes the
    epoch, writes a resumable `latest`, and stops; --resume continues
    from the next epoch."""
    task_dir = str(tmp_path_factory.mktemp("runs"))
    cfg = _cfg(dec_root, task_dir, epochs_num=4)
    solver = Solver(cfg)

    orig_train = solver.train

    def train_then_preempt(epoch):
        out = orig_train(epoch)
        solver.request_preemption()
        return out

    solver.train = train_then_preempt
    solver.solve()

    mgr = CheckpointManager(f"{task_dir}/t")
    assert mgr.exists("latest")
    template = solver._state_dict(0)
    state = mgr.restore("latest", template)
    assert state["epoch"] == 0  # stopped after the first epoch

    # resume picks up at epoch 1 and completes the remaining epochs
    cfg2 = _cfg(dec_root, task_dir, epochs_num=2,
                resume=f"{task_dir}/t")
    solver2 = Solver(cfg2)
    assert solver2.start_epoch == 1
    best = solver2.solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])
