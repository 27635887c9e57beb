"""Standalone MI estimation harness.

Reusable toolkit equivalent of the reference's `train_MINE` /
`compute_MI` (ref: VMI.py:253-396): train a fresh critic (+ baseline) on
a pair of feature sets and read an MI estimate off the training history,
validated against correlated Gaussians with analytic ground truth.

TPU re-design: the whole (step + EMA) update is one jitted function
scanned over the epoch's batches; the EMA follows the reference exactly —
after every optimizer step the parameters are *replaced* by their EMA
shadow (ref: VMI.py:338-340 calls update() then apply_shadow() and never
restore()).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mimrl_tpu.mi import bounds
from mimrl_tpu.mi.critics import BaselineModel, CriticModel

Array = jax.Array


def sample_correlated_gaussian(
    key: Array, rho: float = 0.5, dim: int = 20, num_samples: int = 1000
) -> Tuple[Array, Array]:
    """Correlated Gaussian pair with known MI (ref: VMI.py:389-393)."""
    kx, ke = jax.random.split(key)
    x = jax.random.normal(kx, (num_samples, dim))
    eps = jax.random.normal(ke, (num_samples, dim))
    y = rho * x + jnp.sqrt(1.0 - rho**2) * eps
    return x, y


def rho_to_mi(dim: int, rho: float) -> float:
    """Analytic MI of the correlated Gaussian (ref: VMI.py:395-396)."""
    return -0.5 * np.log(1 - rho**2) * dim


def _loss_fn(params, apply_critic, apply_baseline, bound_type, alpha_logit,
             ma_et, ma_rate, x, y):
    if bound_type == "club":
        mu, logvar = apply_critic(params["critic"], x, y)
        mi, nll = bounds.club_bound_and_nll(mu, logvar, y)
        return nll, (mi, ma_et)
    scores = apply_critic(params["critic"], x, y)
    log_baseline = None
    if apply_baseline is not None:
        log_baseline = apply_baseline(params["baseline"], y)

    if bound_type == "mine":
        mi, t, et = bounds.mine_lower_bound_parts(scores)
        ma_et_new = (1.0 - ma_rate) * ma_et + ma_rate * jnp.mean(et)
        # standalone path negates (ref: VMI.py:311), unlike the in-model one
        mi_loss = -(jnp.mean(t)
                    - jax.lax.stop_gradient(1.0 / ma_et_new) * jnp.mean(et))
        return mi_loss, (mi, ma_et_new)

    mi, mi_loss = bounds.mi_and_loss(bound_type, scores,
                                     log_baseline=log_baseline,
                                     alpha_logit=alpha_logit)
    return mi_loss, (mi, ma_et)


def train_mine(
    key: Array,
    critic_type: str,
    baseline_type: str,
    bound_type: str,
    features_x: np.ndarray,
    features_y: np.ndarray,
    epochs: int = 100,
    batch_size: int = 128,
    lr: float = 5e-4,
    alpha_logit: float = 0.0,
    hidden_dim: int = 256,
    embed_dim: int = 128,
    layers: int = 2,
    activation: str = "relu",
    mu: float = 0.0,
    rho: float = 1.0,
    ma_et: float = 1.0,
    ma_rate: float = 0.01,
    weight_decay: float = 0.999,  # EMA decay, named as in VMI.py:287
    log: bool = False,
) -> np.ndarray:
    """Train a critic and return the per-epoch MI history
    (ref: VMI.py:287-347). Adamax optimizer + post-step weight EMA."""
    if bound_type == "interpolated" or bound_type == "interpolate":
        assert baseline_type != "constant", (
            "If using Interpolate bound, baseline should not be none!"
        )

    x = jnp.asarray(features_x, jnp.float32)
    y = jnp.asarray(features_y, jnp.float32)
    n = x.shape[0]
    n_batches = max(n // batch_size, 1)
    n_used = n_batches * batch_size

    use_baseline = bound_type in ("tuba", "interpolate")
    baseline = (
        BaselineModel(baseline_type, hidden_dim=hidden_dim, layers=layers,
                      activation=activation, mu=mu, rho=rho)
        if use_baseline else None
    )

    key, k_init_c, k_init_b = jax.random.split(key, 3)
    if bound_type == "club":
        from mimrl_tpu.mi.critics import ClubCritic

        critic = ClubCritic(y_dim=int(y.shape[-1]), hidden_dim=hidden_dim,
                            layers=layers, activation=activation)
        params = {"critic": critic.init(k_init_c, x[:2])}
        apply_critic = lambda p, xx, yy: critic.apply(p, xx)
    else:
        critic = CriticModel(critic_type, hidden_dim=hidden_dim,
                             embed_dim=embed_dim, layers=layers,
                             activation=activation)
        params = {"critic": critic.init(k_init_c, x[:2], y[:2])}
        apply_critic = lambda p, xx, yy: critic.apply(p, xx, yy)
    apply_baseline = None
    if baseline is not None:
        params["baseline"] = baseline.init(k_init_b, y[:2])
        apply_baseline = lambda p, yy: baseline.apply(p, yy)

    tx = optax.adamax(lr)
    opt_state = tx.init(params)
    ema = jax.tree_util.tree_map(jnp.asarray, params)
    decay = weight_decay

    loss_grad = jax.value_and_grad(
        functools.partial(_loss_fn, apply_critic=apply_critic,
                          apply_baseline=apply_baseline,
                          bound_type=bound_type, alpha_logit=alpha_logit,
                          ma_rate=ma_rate),
        has_aux=True,
    )

    @jax.jit
    def epoch_step(carry, xb_yb):
        params, opt_state, ema, ma_et = carry

        def body(inner, batch):
            params, opt_state, ema, ma_et = inner
            xb, yb = batch
            (loss, (mi, ma_et)), grads = loss_grad(
                params, ma_et=ma_et, x=xb, y=yb)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # EMA shadow update then overwrite params with the shadow
            # (ref: VMI.py:265-277 + call sites 338-340)
            ema = jax.tree_util.tree_map(
                lambda p, s: (1.0 - decay) * p + decay * s, params, ema)
            params = ema
            return (params, opt_state, ema, ma_et), mi

        (params, opt_state, ema, ma_et), mis = jax.lax.scan(
            body, (params, opt_state, ema, ma_et), xb_yb)
        return (params, opt_state, ema, ma_et), jnp.mean(mis)

    history = []
    carry = (params, opt_state, ema, jnp.float32(ma_et))
    xb = x[:n_used].reshape(n_batches, batch_size, -1)
    yb = y[:n_used].reshape(n_batches, batch_size, -1)
    for epoch in range(epochs):
        carry, mi_epoch = epoch_step(carry, (xb, yb))
        history.append(float(mi_epoch))
        if log and epoch % 50 == 0:
            print("Epoch", epoch, ":", np.round(history[-1], 3))
    return np.asarray(history)


def compute_mi(
    key: Array,
    critic_type: str,
    baseline_type: str,
    bound_type: str,
    features_x: np.ndarray,
    features_y: np.ndarray,
    estimation: str = "mean",
    **kwargs,
):
    """Train a fresh estimator and distill a scalar MI estimate from the
    history by max / mean-of-last-50 / savgol smoothing
    (ref: VMI.py:350-378)."""
    history_mi = train_mine(
        key, critic_type, baseline_type, bound_type, features_x, features_y,
        **kwargs,
    )
    if estimation == "max":
        mi_score = float(np.max(history_mi))
    elif estimation == "mean":
        mi_score = float(np.mean(history_mi[-50:-1])) if len(history_mi) > 1 \
            else float(history_mi[-1])
    elif estimation == "smooth":
        from scipy.signal import savgol_filter

        smoothed = savgol_filter(history_mi, min(51, len(history_mi) | 1), 3)
        mi_score = float(np.mean(smoothed[-50:-1]))
    else:
        raise NotImplementedError(estimation)
    return mi_score, history_mi


class EMA:
    """Weight EMA over a params pytree (toolkit parity with the
    reference's EMA class, ref: VMI.py:253-284). Functional: returns new
    pytrees instead of mutating module state.

    shadow = register(params); shadow = update(params, shadow);
    params' = shadow (apply_shadow); restore is the caller keeping its
    pre-apply params."""

    def __init__(self, decay: float):
        self.decay = decay

    def register(self, params):
        return jax.tree_util.tree_map(jnp.asarray, params)

    def update(self, params, shadow):
        return jax.tree_util.tree_map(
            lambda p, s: (1.0 - self.decay) * p + self.decay * s,
            params, shadow)


def show_history_mi(history_mi, mi_score, true_mi):
    """Plot an MI training history against the estimate and ground truth
    (ref: VMI.py:381-387). Requires matplotlib; display-only utility."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.plot(history_mi)
    plt.hlines(mi_score, 0, len(history_mi))
    plt.text(10, mi_score + np.max(history_mi) / 50,
             str(np.round(mi_score, 2)))
    plt.title("Mutual information estimation, true MI is "
              + str(np.round(true_mi, 2)))
    return plt.gcf()


def run_sweep(bound_types=None, rhos=(0.3, 0.6, 0.9), dim=5, n=2048,
              epochs=60, seed=0, critic_type="separate",
              baseline_type="constant", estimation="max", plot_dir=None,
              batch_size=256, lr=2e-3, weight_decay=0.9):
    """Estimate MI for correlated Gaussians across bounds x correlations
    and report against the analytic truth — the calibration sweep the
    reference sketches in (dead, immediately-exiting) __main__ code
    (VMI.py:409-461). Defaults match the settings the test suite
    validates recovery at (tests/test_bounds.py::test_gaussian_mi_recovery
    uses estimation="max", as here; the CLI below exposes the same
    default). Returns {bound: [(rho, true_mi, estimate), ...]}."""
    bound_types = bound_types or [
        "dv", "mine", "tuba", "nwj", "infonce", "js", "js_fgan", "smile"]
    key = jax.random.PRNGKey(seed)
    results = {}
    for b_idx, bound in enumerate(bound_types):
        rows = []
        for i, rho in enumerate(rhos):
            # deterministic fold (python hash() is salted per process,
            # which would defeat --seed)
            k_data, k_train = jax.random.split(
                jax.random.fold_in(key, b_idx * 1000 + i))
            x, y = sample_correlated_gaussian(k_data, rho=rho, dim=dim,
                                              num_samples=n)
            true = rho_to_mi(dim, rho)
            base = ("unnormalized"
                    if bound in ("interpolate",) else baseline_type)
            score, hist = compute_mi(
                k_train, critic_type, base, bound, np.asarray(x),
                np.asarray(y), estimation=estimation, epochs=epochs,
                batch_size=batch_size, lr=lr, weight_decay=weight_decay)
            rows.append((rho, true, score))
            print(f"{bound:10s} rho={rho:.2f} true={true:6.3f} "
                  f"est={score:6.3f}")
            if plot_dir is not None:
                import os

                os.makedirs(plot_dir, exist_ok=True)
                fig = show_history_mi(hist, score, true)
                fig.savefig(
                    os.path.join(plot_dir, f"{bound}_rho{rho:.2f}.png"))
                fig.clf()
        results[bound] = rows
    return results


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="MI-estimator calibration sweep vs analytic Gaussians")
    ap.add_argument("--bounds", nargs="*", default=None)
    ap.add_argument("--rhos", nargs="*", type=float, default=[0.3, 0.6, 0.9])
    ap.add_argument("--dim", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--critic_type", default="separate")
    ap.add_argument("--baseline_type", default="constant")
    ap.add_argument("--estimation", default="max",
                    choices=["max", "mean", "smooth"])
    ap.add_argument("--plot_dir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    run_sweep(a.bounds, tuple(a.rhos), a.dim, epochs=a.epochs, seed=a.seed,
              critic_type=a.critic_type, baseline_type=a.baseline_type,
              estimation=a.estimation, plot_dir=a.plot_dir)
