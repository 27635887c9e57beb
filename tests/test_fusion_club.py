"""Extended capabilities: alternative fusion encoders (transformer, TFN)
and the CLUB upper bound."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.mi import bounds
from mimrl_tpu.mi.critics import ClubCritic
from mimrl_tpu.mi.estimators import VMIEstimator
from mimrl_tpu.mi.standalone import compute_mi, sample_correlated_gaussian, rho_to_mi
from mimrl_tpu.models.fusion import TFNFusion, TransformerFusion


def test_transformer_fusion_shape_preserving():
    f = TransformerFusion(d_model=16, time_len=10, num_layers=2, num_heads=2,
                          dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 3, 16))
    params = f.init(jax.random.PRNGKey(1), x)
    y = f.apply(params, x, deterministic=True)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_tfn_fusion_shape_and_fusion():
    f = TFNFusion(d_model=16, rank=4, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 3, 16))
    params = f.init(jax.random.PRNGKey(1), x)
    y = f.apply(params, x, deterministic=True)
    assert y.shape == (4, 10, 3, 16)
    # fused representation is broadcast over the modality axis
    assert np.allclose(np.asarray(y[:, :, 0]), np.asarray(y[:, :, 1]))


@pytest.mark.parametrize("fusion", [
    pytest.param("transformer", marks=pytest.mark.slow), "tfn"])
def test_model_with_alternative_fusion(fusion):
    from tests.test_model import BS, batch_inputs, tiny_model

    model = tiny_model(fusion=fusion, fusion_layers=1, fusion_heads=2)
    inputs = batch_inputs()
    params = model.init({"params": jax.random.PRNGKey(0)}, *inputs)
    out, F_F, T_F, A_F, V_F = model.apply(params, *inputs)
    assert out.shape == (BS, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_club_bound_math():
    """With q(y|x) = N(y_true, 1) the positive term is maximal; the bound
    must be positive for dependent data and ~0 for self-comparison of
    identical rows."""
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    mu = y  # oracle conditional mean
    logvar = jnp.zeros_like(y)
    mi, nll = bounds.club_bound_and_nll(mu, logvar, y)
    assert float(mi) > 0  # joint pairs score higher than cross pairs
    # nll of oracle predictor = 0.5*E||y-mu||^2 + 0.5*sum(logvar) = 0
    assert abs(float(nll)) < 1e-5


def test_club_critic_module():
    c = ClubCritic(y_dim=6, hidden_dim=16, layers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
    params = c.init(jax.random.PRNGKey(1), x)
    mu, logvar = c.apply(params, x)
    assert mu.shape == (8, 6) and logvar.shape == (8, 6)
    assert float(jnp.max(jnp.abs(logvar))) <= 5.0


def test_club_in_vmi_estimator():
    est = VMIEstimator("separate", "constant", "club", hidden_dim=16,
                       embed_dim=8, layers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    params = est.init(jax.random.PRNGKey(2), x, y)
    mi, nll = est.apply(params, x, y)
    assert np.isfinite(float(mi)) and np.isfinite(float(nll))

    grads = jax.grad(lambda p: est.apply(p, x, y)[1])(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


@pytest.mark.slow
def test_club_upper_bounds_gaussian_mi():
    """CLUB is an UPPER bound: trained on correlated Gaussians the
    estimate should sit at or above ~the true MI, and near 0 for
    independent data."""
    dim, rho = 5, 0.7
    true_mi = rho_to_mi(dim, rho)
    key = jax.random.PRNGKey(0)
    kd, kt = jax.random.split(key)
    x, y = sample_correlated_gaussian(kd, rho=rho, dim=dim, num_samples=2048)
    mi_score, _ = compute_mi(
        kt, "separate", "constant", "club", np.asarray(x), np.asarray(y),
        epochs=60, batch_size=256, lr=2e-3, estimation="mean",
        weight_decay=0.9)
    assert mi_score > 0.6 * true_mi, (mi_score, true_mi)

    y_ind = jax.random.normal(jax.random.PRNGKey(9), (2048, dim))
    mi0, _ = compute_mi(
        kt, "separate", "constant", "club", np.asarray(x), np.asarray(y_ind),
        epochs=30, batch_size=256, lr=2e-3, estimation="mean",
        weight_decay=0.9)
    assert abs(mi0) < 0.4, mi0
