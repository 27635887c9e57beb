"""Full-model assembly: forward shapes, stage-1/stage-2 losses with
gradients restricted to the right parameter groups (the smoke test the
reference runs by hand at Model.py:543-617, as real assertions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.models.bert import BertConfig
from mimrl_tpu.models.model import (
    MimrlModel,
    apply_orthogonal_whh,
    get_output_dim,
    init_full,
)
from mimrl_tpu.train.optim import merge_params, partition_params
from mimrl_tpu.train.steps import FeatureBank, sample_all_knn

BS, T, D_A, D_V, D_C = 8, 10, 6, 4, 16


def tiny_model(**kw):
    defaults = dict(
        d_t=32, d_a=D_A, d_v=D_V, d_common=D_C, encoders="gru",
        num_class=1, activate="gelu", time_len=T,
        d_hiddens=((T, 2, D_C), (4, 2, D_C)),
        d_outs=((T, 2, D_C), (4, 2, D_C)),
        dropout_mlp=(0.0, 0.0, 0.0), dropout=(0.0, 0.0, 0.0, 0.0),
        bias=True, ln_first=False, res_project=(True, True),
        critic_type="separate", baseline_type="constant",
        bound_type="infonce", k_neighbor=2, radius=1.0,
        cmi_last_acticate="sigmoid",
        bert_config=BertConfig.tiny(),
    )
    defaults.update(kw)
    return MimrlModel(**defaults)


def batch_inputs(key=0):
    rng = np.random.default_rng(key)
    return (
        jnp.asarray(rng.integers(0, 100, (BS, T)), jnp.int32),
        jnp.zeros((BS, T), jnp.int32),
        jnp.asarray((rng.uniform(size=(BS, T)) > 0.3).astype(np.int32)),
        jnp.asarray(rng.normal(size=(BS, T, D_A)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(BS, T, D_V)).astype(np.float32)),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    params = init_full(model, {"params": jax.random.PRNGKey(0)},
                       *batch_inputs())
    return model, params["params"]


def test_get_output_dim():
    assert get_output_dim("mean", "mean", 128, 10, 3) == 128
    assert get_output_dim("mean", "cat", 128, 10, 3) == 384
    assert get_output_dim("cat", "cat", 64, 10, 3) == 64 * 3 * 10
    with pytest.raises(NotImplementedError):
        get_output_dim("mean", "max", 1, 1, 1)


@pytest.mark.parametrize("encoders", ["gru", "lstm", "conv"])
def test_forward_shapes(encoders):
    model = tiny_model(encoders=encoders)
    inputs = batch_inputs()
    params = model.init({"params": jax.random.PRNGKey(0)}, *inputs)
    out, F_F, T_F, A_F, V_F = model.apply(params, *inputs)
    assert out.shape == (BS, 1)
    for f in (F_F, T_F, A_F, V_F):
        assert f.shape == (BS, D_C)
        assert np.isfinite(np.asarray(f)).all()


@pytest.mark.parametrize("compose_t,compose_k", [
    ("mean", "mean"), ("sum", "sum"), ("cat", "cat"), ("mean", "cat"),
])
def test_compose_variants(compose_t, compose_k):
    model = tiny_model(features_compose_t=compose_t,
                       features_compose_k=compose_k)
    inputs = batch_inputs()
    params = model.init({"params": jax.random.PRNGKey(0)}, *inputs)
    out = model.apply(params, *inputs)[0]
    assert out.shape == (BS, 1)


def test_param_partition(model_and_params):
    _, params = model_and_params
    main, bert, vmi = partition_params(params)
    assert set(bert) == {"bertmodel"}
    assert all(k.startswith(("vmi_", "vcmi_")) for k in vmi)
    assert len(vmi) == 11  # 5 VMI + 6 VCMI estimators
    assert "mlp_encoder" in main and "W_t" in main and "classifier" in main
    merged = merge_params(main, bert, vmi)
    assert set(merged) == set(params)


def test_stage_losses_and_grad_isolation(model_and_params):
    model, params = model_and_params
    inputs = batch_inputs()
    out, F_F, T_F, A_F, V_F = model.apply({"params": params}, *inputs)
    labels = jnp.asarray(np.random.default_rng(0).normal(size=(BS,)),
                         jnp.float32)

    bank = FeatureBank.create(32, 32, D_C)
    bank = bank.replace(
        C=jax.random.normal(jax.random.PRNGKey(1), (32, 1)),
        F=jax.random.normal(jax.random.PRNGKey(2), (32, D_C)),
        T=jax.random.normal(jax.random.PRNGKey(3), (32, D_C)),
        A=jax.random.normal(jax.random.PRNGKey(4), (32, D_C)),
        V=jax.random.normal(jax.random.PRNGKey(5), (32, D_C)),
    )
    knn = sample_all_knn(jax.random.PRNGKey(6), bank, BS, 2, 1.0)

    mis1, losses1 = model.apply(
        {"params": params}, labels, F_F, T_F, A_F, V_F, knn,
        method=MimrlModel.compute_vmi_loss_stage1)
    assert len(mis1) == len(losses1) == 11
    mis2, losses2 = model.apply(
        {"params": params}, labels, F_F, T_F, A_F, V_F, knn,
        method=MimrlModel.compute_vmi_loss_stage2)
    assert len(mis2) == len(losses2) == 8
    for v in mis1 + losses1 + mis2 + losses2:
        assert np.isfinite(float(v))

    # derived stage-2 quantities (ref: Model.py:381-385)
    m = {k: float(v) for k, v in zip(
        ("f_t", "f_a", "f_v", "t_a", "t_v", "ac_t", "ta_c", "vc_t", "tv_c",
         "tc_a", "tc_v"), mis1)}
    assert np.isclose(float(mis2[3]), m["t_a"] + m["t_v"], atol=1e-5)
    assert np.isclose(float(mis2[7]), m["ta_c"] + m["tv_c"], atol=1e-5)
    assert np.isclose(float(mis2[5]), m["ac_t"] - m["ta_c"], atol=1e-5)

    # stage-1 grads wrt vmi params only must be nonzero; features constant
    main, bert, vmi = partition_params(params)

    def stage1_loss(p_vmi):
        merged = merge_params(main, bert, p_vmi)
        _, losses = model.apply({"params": merged}, labels, F_F, T_F, A_F,
                                V_F, knn,
                                method=MimrlModel.compute_vmi_loss_stage1)
        return sum(losses)

    g = jax.grad(stage1_loss)(vmi)
    norms = [float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g)]
    assert sum(norms) > 0


def test_orthogonal_whh(model_and_params):
    _, params = model_and_params
    new = apply_orthogonal_whh(params, jax.random.PRNGKey(0))
    w = new["rnn_a"]["l0_fwd"]["w_hh"]  # [H, 3H]
    # rows of the [H, 3H] kernel need not be orthonormal, but each [H, H]
    # gate block of an orthogonal-initialized matrix has orthonormal cols
    wtw = np.asarray(w.T @ w)
    assert w.shape == (D_C, 3 * D_C)
    # unchanged elsewhere
    assert np.allclose(np.asarray(new["W_t"]["kernel"]),
                       np.asarray(params["W_t"]["kernel"]))
    assert not np.allclose(np.asarray(w),
                           np.asarray(params["rnn_a"]["l0_fwd"]["w_hh"]))


def test_return_features_false(model_and_params):
    model, params = model_and_params
    out = model.apply({"params": params}, *batch_inputs(),
                      return_features=False)
    assert len(out) == 1 and out[0].shape == (BS, 1)


@pytest.mark.parametrize("encoders", ["gru", "lstm"])
def test_fused_av_scan_matches_separate(encoders):
    """--fused_av_scan (one scan chain for both towers) must reproduce
    the separate rnn_a/rnn_v execution through the full model."""
    sep = tiny_model(encoders=encoders, fused_av_scan=False)
    fused = tiny_model(encoders=encoders, fused_av_scan=True)
    inputs = batch_inputs()
    params = init_full(sep, {"params": jax.random.PRNGKey(0)}, *inputs)
    outs_s = sep.apply(params, *inputs)
    outs_f = fused.apply(params, *inputs)
    for a, b in zip(outs_s, outs_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
