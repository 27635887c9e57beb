"""VMI / VCMI estimator modules: shapes, gradients, critic parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.mi.critics import BaselineModel, CriticModel
from mimrl_tpu.mi.estimators import VCMIEstimator, VMIEstimator, _binary_cross_entropy


def test_separate_critic_orientation():
    critic = CriticModel("separate", hidden_dim=16, embed_dim=8, layers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 4))
    y = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
    params = critic.init(jax.random.PRNGKey(2), x, y)
    scores = critic.apply(params, x, y)
    assert scores.shape == (5, 5)
    # scores[i, j] = h(y_i) . g(x_j): column j must depend only on x_j
    x2 = x.at[0].set(0.0)
    scores2 = critic.apply(params, x2, y)
    assert np.allclose(np.asarray(scores[:, 1:]), np.asarray(scores2[:, 1:]))
    assert not np.allclose(np.asarray(scores[:, 0]), np.asarray(scores2[:, 0]))


def test_concat_critic_orientation():
    critic = CriticModel("concat", hidden_dim=16, embed_dim=8, layers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    params = critic.init(jax.random.PRNGKey(2), x, y)
    scores = critic.apply(params, x, y)
    # scores[i, j] = f(x_i, y_j) (ref: VMI.py:65 transposes)
    x2 = x.at[0].set(9.0)
    scores2 = critic.apply(params, x2, y)
    assert np.allclose(np.asarray(scores[1:, :]), np.asarray(scores2[1:, :]))
    assert not np.allclose(np.asarray(scores[0, :]), np.asarray(scores2[0, :]))


@pytest.mark.parametrize("btype", ["constant", "unnormalized", "gaussain"])
def test_baselines(btype):
    m = BaselineModel(btype, hidden_dim=8, layers=1)
    y = jax.random.normal(jax.random.PRNGKey(0), (6, 3))
    params = m.init(jax.random.PRNGKey(1), y)
    out = m.apply(params, y)
    assert out.shape == (6, 1)
    if btype == "constant":
        assert np.allclose(np.asarray(out), 0.0)
    if btype == "gaussain":
        from scipy.stats import norm

        expected = norm.logpdf(np.asarray(y)).sum(-1, keepdims=True)
        assert np.allclose(np.asarray(out), expected, atol=1e-5)


@pytest.mark.parametrize("bound", ["infonce", "mine", "tuba", "interpolate"])
def test_vmi_estimator_runs_and_differentiates(bound):
    est = VMIEstimator("separate", "unnormalized", bound, hidden_dim=16,
                       embed_dim=8, layers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    params = est.init(jax.random.PRNGKey(2), x, y)

    def loss_fn(p):
        mi, mi_loss = est.apply(p, x, y)
        return mi_loss, mi

    (loss, mi), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert np.isfinite(float(mi))


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    p = rng.uniform(0.01, 0.99, size=(10, 2)).astype(np.float32)
    t = (rng.uniform(size=(10, 2)) > 0.5).astype(np.float32)
    ours = float(_binary_cross_entropy(jnp.asarray(p), jnp.asarray(t)))
    theirs = float(torch.nn.functional.binary_cross_entropy(
        torch.tensor(p), torch.tensor(t)))
    assert np.allclose(ours, theirs, atol=1e-6)


def test_vcmi_estimator_full_path():
    est = VCMIEstimator(embed_dim=16, hidden_dim=32)
    bs, d = 8, 16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    fx = jax.random.normal(ks[0], (bs, d))
    fy = jax.random.normal(ks[1], (bs, 1))  # label-like, tiled to embed
    fz = jax.random.normal(ks[2], (bs, d))
    kx = jax.random.normal(ks[3], (bs, d))
    ky = jax.random.normal(ks[4], (bs, d))
    kz = jax.random.normal(ks[5], (bs, d))
    fy_tiled = jnp.tile(fy, (1, d))
    params = est.init(ks[6], fx, fy_tiled, fz, kx, ky, kz)
    cmi, loss = est.apply(params, fx, fy_tiled, fz, kx, ky, kz)
    assert np.isfinite(float(cmi)) and np.isfinite(float(loss))
    assert float(loss) > 0

    def loss_fn(p):
        _, l = est.apply(p, fx, fy_tiled, fz, kx, ky, kz)
        return l

    grads = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_vcmi_truncates_when_bs_not_divisible():
    """bs % k != 0 -> joint truncated to product size (ref: Model.py:180-187)."""
    est = VCMIEstimator(embed_dim=8, hidden_dim=16)
    bs, d, k = 7, 8, 2
    m = bs // k  # 3 -> product size 6
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    fx = jax.random.normal(ks[0], (bs, d))
    fy = jax.random.normal(ks[1], (bs, d))
    fz = jax.random.normal(ks[2], (bs, d))
    kx = jax.random.normal(ks[3], (m * k, d))
    ky = jax.random.normal(ks[4], (m * k, d))
    kz = jax.random.normal(ks[5], (m * k, d))
    params = est.init(ks[6], fx, fy, fz, kx, ky, kz)
    cmi, loss = est.apply(params, fx, fy, fz, kx, ky, kz)
    assert np.isfinite(float(cmi)) and np.isfinite(float(loss))
