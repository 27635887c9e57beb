"""MI bound correctness: every bound must (a) run under jit/grad with
static shapes, (b) recover the analytic MI of correlated Gaussians within
tolerance when trained (the reference only eyeballed this via plots,
ref: VMI.py:409-447; here it is a real assertion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.mi import bounds
from mimrl_tpu.mi.standalone import (
    compute_mi,
    rho_to_mi,
    sample_correlated_gaussian,
)

ALL_BOUNDS = list(bounds.SCORE_BOUND_NAMES)  # club has no score matrix


def _scores(n=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))


def test_logmeanexp_helpers():
    s = _scores(8)
    n = 8
    diag = np.diagonal(np.asarray(s))
    expected = np.log(np.mean(np.exp(diag)))
    assert np.allclose(bounds.logmeanexp_diag(s), expected, atol=1e-5)

    off = np.asarray(s)[~np.eye(n, dtype=bool)]
    expected_nd = np.log(np.mean(np.exp(off)))
    assert np.allclose(bounds.logmeanexp_nodiag(s), expected_nd, atol=1e-5)


def test_exp_nodiag_zero_diag():
    s = _scores(8)
    e = np.asarray(bounds.exp_nodiag(s))
    assert np.allclose(np.diagonal(e), 0.0)
    assert np.allclose(e[0, 1], np.exp(np.asarray(s)[0, 1]), atol=1e-5)


@pytest.mark.parametrize("bound", ALL_BOUNDS)
def test_bounds_scalar_and_differentiable(bound):
    s = _scores(16)
    baseline = jnp.zeros((16, 1))

    def f(s):
        mi, loss = bounds.mi_and_loss(bound, s, log_baseline=baseline)
        return loss, mi

    (loss, mi), grad = jax.jit(jax.value_and_grad(f, has_aux=True))(s)
    assert np.isfinite(float(loss)) and np.isfinite(float(mi))
    assert np.isfinite(np.asarray(grad)).all()
    assert grad.shape == s.shape


def test_nwj_equals_tuba_shifted():
    s = _scores(16)
    assert np.allclose(
        bounds.nwj_lower_bound(s), bounds.tuba_lower_bound(s - 1.0), atol=1e-6
    )


def test_js_value_matches_nwj_grad_matches_jsfgan():
    s = _scores(16)
    # value equals nwj
    assert np.allclose(
        bounds.js_lower_bound(s), bounds.nwj_lower_bound(s), atol=1e-6
    )
    # gradient equals js_fgan's gradient (straight-through trick)
    g_js = jax.grad(lambda x: bounds.js_lower_bound(x))(s)
    g_fg = jax.grad(lambda x: bounds.js_fgan_lower_bound(x))(s)
    assert np.allclose(np.asarray(g_js), np.asarray(g_fg), atol=1e-6)


def test_smile_value_is_clipped_dv():
    s = _scores(16)
    clipped = jnp.clip(s, -1, 1)
    dv_clip = jnp.mean(jnp.diagonal(s)) - bounds.logmeanexp_nodiag(clipped)
    assert np.allclose(bounds.smile_lower_bound(s), dv_clip, atol=1e-6)


def test_infonce_upper_bounded_by_log_bs():
    s = _scores(32)
    assert float(bounds.infonce_lower_bound(s)) <= np.log(32) + 1e-5


def test_mine_parts():
    s = _scores(8)
    mi, t, et = bounds.mine_lower_bound_parts(s)
    assert np.allclose(np.asarray(t), np.diagonal(np.asarray(s)))
    assert np.allclose(float(mi), float(bounds.dv_lower_bound(s)), atol=1e-6)


def test_interpolate_loomean_finite():
    s = _scores(16)
    loo = bounds.compute_log_loomean(s)
    assert np.isfinite(np.asarray(loo)).all()


@pytest.mark.parametrize(
    "bound,critic,baseline",
    [
        ("infonce", "separate", "constant"),
        ("nwj", "separate", "constant"),
        ("js", "separate", "constant"),
        ("smile", "concat", "constant"),
        ("tuba", "separate", "unnormalized"),
        ("mine", "separate", "constant"),
        ("dv", "separate", "constant"),
    ],
)
@pytest.mark.slow
def test_gaussian_mi_recovery(bound, critic, baseline):
    """Train each MI-scale bound on correlated Gaussians; the estimate
    must land in a loose but meaningful window around the analytic MI."""
    dim, rho = 5, 0.7
    true_mi = rho_to_mi(dim, rho)  # ~1.68 nats
    key = jax.random.PRNGKey(0)
    kd, kt = jax.random.split(key)
    x, y = sample_correlated_gaussian(kd, rho=rho, dim=dim, num_samples=2048)

    mi_score, history = compute_mi(
        kt, critic, baseline, bound, np.asarray(x), np.asarray(y),
        epochs=60, batch_size=256, lr=2e-3, estimation="max",
        weight_decay=0.9,
    )
    # lower-bound-ish estimators under-shoot; all must clearly separate
    # dependent data (MI ~1.68) from independence (MI 0).
    assert mi_score > 0.35 * true_mi, (bound, mi_score, true_mi)
    assert mi_score < 2.5 * true_mi, (bound, mi_score, true_mi)


@pytest.mark.slow
def test_run_sweep_smoke():
    """The executable calibration sweep (python -m mimrl_tpu.mi.standalone,
    the reference's VMI.py __main__) returns (rho, true, est) rows."""
    from mimrl_tpu.mi.standalone import run_sweep

    res = run_sweep(bound_types=["infonce"], rhos=(0.7,), n=512, epochs=8)
    rows = res["infonce"]
    assert len(rows) == 1
    rho, true_mi, est = rows[0]
    assert rho == 0.7 and true_mi > 1.5 and np.isfinite(est)


@pytest.mark.slow
def test_gaussian_js_fgan_signal():
    """js_fgan maximizes a Jensen-Shannon objective, NOT an MI-scale
    quantity: its optimum is <= 0 and its value at an uninformative
    critic is -2 log 2 ~ -1.386. Dependent data must push it clearly
    above that floor."""
    key = jax.random.PRNGKey(0)
    kd, kt = jax.random.split(key)
    x, y = sample_correlated_gaussian(kd, rho=0.7, dim=5, num_samples=2048)
    mi_score, _ = compute_mi(
        kt, "separate", "constant", "js_fgan", np.asarray(x), np.asarray(y),
        epochs=60, batch_size=256, lr=2e-3, estimation="max",
        weight_decay=0.9)
    assert -1.0 < mi_score <= 0.05, mi_score


@pytest.mark.slow
def test_gaussian_interpolate_recovery():
    """The interpolated bound is high-variance early in training
    (exp of unclipped scores); estimate from the smoothed tail instead
    of the max (its intended usage per VMI.py:360: 'For MI estimation
    purpose, use interpolated bound with a low alpha').

    Hyperparameters retuned in round 5: the round-3 diagonal-broadcast
    fix (commit 90f7422, pinned vs the executed reference in
    tests/test_bounds_ref_parity.py) changed the bound's optimization
    landscape, and the original (lr=5e-4, 60 epochs) seeded run no
    longer converges. At lr=5e-3 x 150 epochs the CORRECTED bound
    recovers the analytic MI to within ~10% across seeds (1.73 / 1.55
    vs true 1.683)."""
    dim, rho = 5, 0.7
    true_mi = rho_to_mi(dim, rho)
    key = jax.random.PRNGKey(0)
    kd, kt = jax.random.split(key)
    x, y = sample_correlated_gaussian(kd, rho=rho, dim=dim, num_samples=2048)
    mi_score, history = compute_mi(
        kt, "separate", "unnormalized", "interpolate", np.asarray(x),
        np.asarray(y), epochs=150, batch_size=256, lr=5e-3,
        alpha_logit=-2.0, estimation="mean", weight_decay=0.98)
    assert mi_score > 0.3 * true_mi, (mi_score, true_mi)
    assert mi_score < 3.0 * true_mi, (mi_score, true_mi)


@pytest.mark.slow
def test_independent_gaussian_mi_near_zero():
    key = jax.random.PRNGKey(1)
    kd, kt = jax.random.split(key)
    x, _ = sample_correlated_gaussian(kd, rho=0.5, dim=5, num_samples=2048)
    y = jax.random.normal(jax.random.PRNGKey(7), (2048, 5))
    mi_score, _ = compute_mi(
        kt, "separate", "constant", "infonce", np.asarray(x), np.asarray(y),
        epochs=30, batch_size=256, lr=2e-3, estimation="mean",
        weight_decay=0.9,
    )
    assert abs(mi_score) < 0.35, mi_score
