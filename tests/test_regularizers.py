"""Regularizer toolkit parity vs direct numpy/torch formulations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.train.regularizers import (
    aug_temporal,
    cmd,
    diff_loss,
    masked_mean,
    mean_temporal,
    multivariate_kld,
    reverse_gradient,
    univariate_kld,
)


def test_cmd_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)),
                    jnp.float32)
    assert float(cmd(x, x, 5)) < 1e-5
    y = x + 2.0
    assert float(cmd(x, y, 5)) > 1.0


def test_diff_loss_orthogonal_vs_identical():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 8)), jnp.float32)
    assert float(diff_loss(x, x)) > float(
        diff_loss(x, jnp.asarray(rng.normal(size=(32, 8)), jnp.float32)))


def test_gradient_reversal():
    x = jnp.asarray([1.0, 2.0])
    g = jax.grad(lambda v: jnp.sum(reverse_gradient(v, 0.5) * 3.0))(x)
    assert np.allclose(np.asarray(g), -1.5)  # -p * upstream (3.0)


def test_univariate_kld_zero_same_dist():
    mu = jnp.zeros((4, 3))
    var = jnp.ones((4, 3))
    assert float(univariate_kld(mu, mu, var, var)) < 1e-7
    assert float(univariate_kld(mu + 1, mu, var, var, "sum")) > 0


def test_multivariate_kld_matches_univariate_sum_for_diagonal():
    rng = np.random.default_rng(0)
    mu1 = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    mu2 = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    v1 = jnp.asarray(rng.uniform(0.5, 2, size=(4, 3)), jnp.float32)
    v2 = jnp.asarray(rng.uniform(0.5, 2, size=(4, 3)), jnp.float32)
    mv = float(multivariate_kld(mu1, mu2, v1, v2, "sum"))
    uv = float(univariate_kld(mu1, mu2, v1, v2, "sum"))
    assert np.isclose(mv, uv, rtol=1e-4)


def test_aug_temporal_matches_torch_std():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 5, 3)).astype(np.float32)
    ours = np.asarray(aug_temporal(jnp.asarray(x), 1))
    xt = torch.tensor(x)
    theirs = torch.cat([xt.mean(1), xt.std(1), xt.min(1)[0], xt.max(1)[0]],
                       dim=-1).numpy()
    assert np.allclose(ours, theirs, atol=1e-5)
    assert np.allclose(np.asarray(mean_temporal(jnp.asarray(x), 1)),
                       x.mean(1), atol=1e-6)


def test_masked_mean():
    x = jnp.asarray([[1.0, 2.0], [3.0, 100.0]])
    m = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
    out = masked_mean(x, m, 1)
    assert np.allclose(np.asarray(out), [1.5, 3.0])
