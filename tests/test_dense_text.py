"""Dense (feature-mode) text path: glove-style [bs, T, d_t] text feeds
W_t directly with NO BERT tower. The reference's feature-text path is
dead code (Customization.py:86 references undefined opt.mask); this
framework makes the LocalDataset family (mosi_50 etc.) and SDK/AVEC
feature-text modes trainable end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.data.synthetic import make_local_fixture
from mimrl_tpu.train.solver import Solver


@pytest.mark.slow
def test_model_dense_text_no_bert_params():
    import __graft_entry__ as ge
    from mimrl_tpu.models.model import init_full

    bs, time_len, d_a, d_v = 4, 8, 6, 4
    _, model = ge._build(bs, time_len, d_a, d_v, d_common=16,
                         bert_layers=2, bert_hidden=32, bert_heads=2,
                         cube_l=4)
    inputs = ge._inputs(bs, time_len, d_a, d_v)
    text = jnp.asarray(
        np.random.default_rng(0).normal(size=(bs, time_len, 300)),
        jnp.float32)
    params = init_full(model, {"params": jax.random.PRNGKey(0)}, *inputs,
                       text_features=text)["params"]
    # dense mode: the BERT tower is never traced -> no params exist
    assert "bertmodel" not in params
    assert "W_t" in params
    assert params["W_t"]["kernel"].shape == (300, 16)

    out = model.apply({"params": params}, *inputs, text_features=text,
                      deterministic=True, return_features=True)
    assert out[0].shape[0] == bs
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_uses_raw_text_routing():
    from mimrl_tpu.data.universal import uses_raw_text

    mk = lambda **kw: MimrlConfig(
        loss_mi_coefficient1=[1.0] * 11, loss_mi_coefficient2=[0.01] * 8,
        **kw)
    assert uses_raw_text(mk(dataset="mosi_Dec"))
    assert not uses_raw_text(mk(dataset="mosi_50"))
    assert uses_raw_text(mk(dataset="mosi_SDK", text="text"))
    assert not uses_raw_text(mk(dataset="mosi_SDK", text="glove"))


@pytest.mark.slow
@pytest.mark.parametrize("epoch_scan", [False, True])
def test_local_dataset_end_to_end(tmp_path, epoch_scan):
    """mosi_50 (reconstructed LocalDataset, dense glove text) trains the
    full two-stage loop, both per-batch and epoch-scan modes."""
    root = tmp_path / "local"
    make_local_fixture(str(root), "mosi_50", n_per_split=(16, 6, 6),
                       dims=(300, 5, 20), time_len=14, seed=3)
    cfg = MimrlConfig(
        task_name="t", task_dir=str(tmp_path / "runs"), dataset="mosi_50",
        data_dir=str(root), batch_size=8, time_len=12, d_common=16,
        encoders="gru",
        d_hiddens=[[12, 2, 16], [4, 2, 16]],
        d_outs=[[12, 2, 16], [4, 2, 16]],
        dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
        bias=True, res_project=[True, True], loss="MAE", epochs_num=2,
        learning_rate=2e-3, lr_decrease="step", lr_decrease_iter="60",
        stage1_n=1, k_neighbor=2,
        loss_mi_coefficient1=[1.0] * 11, loss_mi_coefficient2=[0.01] * 8,
        bert_layers=2, bert_heads=2, bert_hidden=32,
        num_workers=0, seed=0, epoch_scan=epoch_scan,
    )
    solver = Solver(cfg)
    assert not solver.raw_text
    assert solver.params_bert == {}
    best = solver.solve()
    assert best[0] is not None and np.isfinite(best[0]["mae"])
    # MI telemetry flows after epoch 0 (banks filled from dense-text runs)
    assert solver.have_bank
