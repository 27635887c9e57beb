"""--fused_estimators: vmap-batched execution of the 11 MI/CMI
estimators must be numerically equivalent to the sequential path (same
params, same inputs — the fusion is a pure execution-order change) and
must leave the parameter tree untouched."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.models.bert import BertConfig
from mimrl_tpu.models.model import CMI_KEYS, MimrlModel, init_full
from mimrl_tpu.train.steps import FeatureBank, sample_all_knn

BS, T, D_A, D_V, D_C = 8, 10, 6, 4, 16


def model_pair(**kw):
    defaults = dict(
        d_t=32, d_a=D_A, d_v=D_V, d_common=D_C, encoders="gru",
        num_class=1, activate="gelu", time_len=T,
        d_hiddens=((T, 2, D_C), (4, 2, D_C)),
        d_outs=((T, 2, D_C), (4, 2, D_C)),
        dropout_mlp=(0.0, 0.0, 0.0), dropout=(0.0, 0.0, 0.0, 0.0),
        bias=True, ln_first=False, res_project=(True, True),
        critic_type="separate", baseline_type="constant",
        bound_type="infonce", k_neighbor=2, radius=1.0,
        cmi_last_acticate="sigmoid", bert_config=BertConfig.tiny(),
    )
    defaults.update(kw)
    seq = MimrlModel(**defaults, fused_estimators=False)
    fused = MimrlModel(**defaults, fused_estimators=True)
    return seq, fused


def batch_inputs(key=0):
    rng = np.random.default_rng(key)
    return (
        jnp.asarray(rng.integers(0, 100, (BS, T)), jnp.int32),
        jnp.zeros((BS, T), jnp.int32),
        jnp.asarray((rng.uniform(size=(BS, T)) > 0.3).astype(np.int32)),
        jnp.asarray(rng.normal(size=(BS, T, D_A)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(BS, T, D_V)).astype(np.float32)),
    )


def _features_and_knn(seed=0):
    rng = np.random.default_rng(seed)
    feats = tuple(jnp.asarray(rng.normal(size=(BS, D_C)), jnp.float32)
                  for _ in range(4))
    labels = jnp.asarray(rng.normal(size=(BS,)), jnp.float32)
    n_bank = 64
    bank = FeatureBank.create(n_bank, n_bank, D_C).replace(
        C=jnp.asarray(rng.normal(size=(n_bank, 1)), jnp.float32),
        F=jnp.asarray(rng.normal(size=(n_bank, D_C)), jnp.float32),
        T=jnp.asarray(rng.normal(size=(n_bank, D_C)), jnp.float32),
        A=jnp.asarray(rng.normal(size=(n_bank, D_C)), jnp.float32),
        V=jnp.asarray(rng.normal(size=(n_bank, D_C)), jnp.float32))
    knn = sample_all_knn(jax.random.PRNGKey(7), bank, BS, 2, 1.0)
    return labels, feats, knn


@pytest.mark.parametrize("bound_type,baseline_type", [
    ("infonce", "constant"),
    pytest.param("nwj", "constant", marks=pytest.mark.slow),
    # tuba/unnormalized exercises the vmapped BaselineModel MLP
    pytest.param("tuba", "unnormalized", marks=pytest.mark.slow),
])
def test_fused_matches_sequential(bound_type, baseline_type):
    seq, fused = model_pair(bound_type=bound_type,
                            baseline_type=baseline_type)
    params = init_full(seq, {"params": jax.random.PRNGKey(0)},
                       *batch_inputs())["params"]
    labels, feats, knn = _features_and_knn()

    for stage in (1, 2):
        method = (MimrlModel.compute_vmi_loss_stage1 if stage == 1
                  else MimrlModel.compute_vmi_loss_stage2)
        mis_s, ls_s = seq.apply({"params": params}, labels, *feats, knn,
                                method=method)
        mis_f, ls_f = fused.apply({"params": params}, labels, *feats, knn,
                                  method=method)
        np.testing.assert_allclose(np.asarray(jnp.stack(mis_s)),
                                   np.asarray(jnp.stack(mis_f)),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(jnp.stack(ls_s)),
                                   np.asarray(jnp.stack(ls_f)),
                                   rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_gradients_match_sequential():
    """Gradients wrt the estimator params must flow back identically
    through the per-call stack."""
    seq, fused = model_pair()
    params = init_full(seq, {"params": jax.random.PRNGKey(0)},
                       *batch_inputs())["params"]
    labels, feats, knn = _features_and_knn()

    def stage1_total(model, p):
        _, losses = model.apply({"params": p}, labels, *feats, knn,
                                method=MimrlModel.compute_vmi_loss_stage1)
        return sum(losses)

    g_s = jax.grad(lambda p: stage1_total(seq, p))(params)
    g_f = jax.grad(lambda p: stage1_total(fused, p))(params)
    # same tree structure, same names
    assert (jax.tree_util.tree_structure(g_s)
            == jax.tree_util.tree_structure(g_f))
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g_s)[0],
                            jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_club_falls_back_to_sequential():
    """The CLUB bound uses a structurally different critic; fused mode
    must transparently fall back and still work."""
    seq, fused = model_pair(bound_type="club")
    params = init_full(seq, {"params": jax.random.PRNGKey(0)},
                       *batch_inputs())["params"]
    labels, feats, knn = _features_and_knn()
    mis_s, _ = seq.apply({"params": params}, labels, *feats, knn,
                         method=MimrlModel.compute_vmi_loss_stage1)
    mis_f, _ = fused.apply({"params": params}, labels, *feats, knn,
                           method=MimrlModel.compute_vmi_loss_stage1)
    np.testing.assert_allclose(np.asarray(jnp.stack(mis_s)),
                               np.asarray(jnp.stack(mis_f)), rtol=1e-6)
