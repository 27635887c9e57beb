"""Task loss parity vs torch + mask correctness."""

import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.train.losses import (
    bce_with_logits_loss,
    ccc_loss,
    compute_task_loss,
    cross_entropy_loss,
    focal_loss,
    mae_loss,
    mse_loss,
    rmse_loss,
    simse_loss,
)


def _pair(n=16, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n,)).astype(np.float32),
            rng.normal(size=(n,)).astype(np.float32))


def test_regression_losses_match_torch():
    torch = pytest.importorskip("torch")
    p, t = _pair()
    tp, tt = torch.tensor(p), torch.tensor(t)
    assert np.isclose(float(mae_loss(jnp.asarray(p), jnp.asarray(t))),
                      float(torch.nn.L1Loss()(tp, tt)), atol=1e-6)
    assert np.isclose(float(mse_loss(jnp.asarray(p), jnp.asarray(t))),
                      float(torch.nn.MSELoss()(tp, tt)), atol=1e-6)
    assert np.isclose(float(rmse_loss(jnp.asarray(p), jnp.asarray(t))),
                      float(((tp - tt) ** 2).mean() ** 0.5), atol=1e-6)
    # SIMSE (ref: Utils.py:459-468)
    simse_ref = float((tt - tp).sum() ** 2 / (16 * 16))
    assert np.isclose(float(simse_loss(jnp.asarray(p), jnp.asarray(t))),
                      simse_ref, atol=1e-6)


def test_ccc_loss_matches_reference_formula():
    p, t = _pair()
    out_mean, tgt_mean = p.mean(), t.mean()
    cov = ((p - out_mean) * (t - tgt_mean)).mean()
    ccc = 2 * cov / (np.var(t) + np.var(p) + (tgt_mean - out_mean) ** 2 + 1e-10)
    assert np.isclose(float(ccc_loss(jnp.asarray(p), jnp.asarray(t))),
                      1 - ccc, atol=1e-5)


def test_ce_and_focal_match_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(10, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 10)
    ce_ref = float(torch.nn.CrossEntropyLoss()(
        torch.tensor(logits), torch.tensor(labels)))
    assert np.isclose(float(cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(labels))), ce_ref, atol=1e-6)
    # focal (ref: Utils.py:638-649): (1 - exp(-CE))^2 * CE on the mean CE
    focal_ref = (1 - np.exp(-ce_ref)) ** 2 * ce_ref
    assert np.isclose(float(focal_loss(jnp.asarray(logits),
                                       jnp.asarray(labels))),
                      focal_ref, atol=1e-5)


def test_bce_with_logits_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(12,)).astype(np.float32)
    targets = (rng.uniform(size=12) > 0.5).astype(np.float32)
    ref = float(torch.nn.BCEWithLogitsLoss()(
        torch.tensor(logits), torch.tensor(targets)))
    assert np.isclose(float(bce_with_logits_loss(
        jnp.asarray(logits), jnp.asarray(targets))), ref, atol=1e-6)


def test_masked_loss_ignores_padded_rows():
    p = jnp.asarray([1.0, 2.0, 100.0])
    t = jnp.asarray([1.5, 2.5, -100.0])
    mask = jnp.asarray([1.0, 1.0, 0.0])
    assert np.isclose(float(mae_loss(p, t, mask)), 0.5, atol=1e-6)
    full = compute_task_loss("MAE", 1, p[:2], t[:2])
    masked = compute_task_loss("MAE", 1, p, t, mask)
    assert np.isclose(float(full), float(masked), atol=1e-6)


@pytest.mark.parametrize("name", ["Focal", "CE", "BCE", "RMSE", "MAE", "MSE",
                                  "SIMSE", "CCC"])
def test_dispatch_all_losses(name):
    rng = np.random.default_rng(3)
    if name in ("Focal", "CE"):
        preds = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 3, 8))
        v = compute_task_loss(name, 3, preds, labels)
    elif name == "BCE":
        preds = jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 2, 8))
        v = compute_task_loss(name, 2, preds, labels)
    else:
        preds = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        labels = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        v = compute_task_loss(name, 1, preds, labels)
    assert np.isfinite(float(v))
