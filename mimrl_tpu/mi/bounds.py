"""Variational mutual-information lower bounds.

Pure functions mapping a critic score matrix ``scores[i, j] = f(x_j, y_i)``
(shape ``[bs, bs]``, diagonal = joint samples, off-diagonal = product of
marginals) to a scalar MI lower bound. Functional re-design of the
reference bound zoo (ref: VMI.py:113-250); gradient tricks that the
reference implements with ``.detach()`` use ``jax.lax.stop_gradient``.

All bounds are jit/grad-compatible with static shapes — the score matrix
is one MXU matmul upstream, so the whole MI stack fuses into a handful of
XLA ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _diag_mask(n: int, dtype=jnp.float32) -> Array:
    return jnp.eye(n, dtype=dtype)


def logmeanexp_diag(scores: Array) -> Array:
    """logmeanexp over the diagonal (ref: VMI.py:113-118)."""
    n = scores.shape[0]
    return jax.nn.logsumexp(jnp.diagonal(scores)) - jnp.log(jnp.float32(n))


def logmeanexp_nodiag(scores: Array) -> Array:
    """logmeanexp over off-diagonal elements (ref: VMI.py:121-126).

    The diagonal is excluded with a where-mask: the reference's
    ``x - diag(inf)`` trick would put 0*inf = NaN on the off-diagonal
    under IEEE semantics when expressed as ``eye * inf``."""
    n = scores.shape[0]
    masked = jnp.where(jnp.eye(n, dtype=bool), -jnp.inf, scores)
    lse = jax.nn.logsumexp(masked)
    return lse - jnp.log(jnp.float32(n) * (n - 1.0))


def exp_nodiag(scores: Array) -> Array:
    """exp with the diagonal zeroed (ref: VMI.py:129-133)."""
    n = scores.shape[0]
    return jnp.exp(jnp.where(jnp.eye(n, dtype=bool), -jnp.inf, scores))


def dv_lower_bound(scores: Array) -> Array:
    """Donsker–Varadhan (ref: VMI.py:136-139)."""
    return jnp.mean(jnp.diagonal(scores)) - logmeanexp_nodiag(scores)


def mine_lower_bound_parts(scores: Array):
    """MINE: returns (mi, t, et) where t = diagonal scores and et = exp of
    off-diagonal scores, for the caller's EMA bias correction
    (ref: VMI.py:142-145)."""
    mi = dv_lower_bound(scores)
    return mi, jnp.diagonal(scores), exp_nodiag(scores)


def tuba_lower_bound(scores: Array, log_baseline: Array | None = None) -> Array:
    """TUBA; with log-baseline a(y) subtracted row-wise (ref: VMI.py:148-154)."""
    if log_baseline is not None:
        scores = scores - log_baseline  # [bs,1] broadcasts over rows (y index)
    joint_term = jnp.mean(jnp.diagonal(scores))
    marg_term = jnp.exp(logmeanexp_nodiag(scores))
    return 1.0 + joint_term - marg_term


def nwj_lower_bound(scores: Array) -> Array:
    """NWJ = TUBA with log-baseline 1 (ref: VMI.py:157-159)."""
    return tuba_lower_bound(scores - 1.0)


def infonce_lower_bound(scores: Array) -> Array:
    """InfoNCE (ref: VMI.py:162-166)."""
    n = scores.shape[0]
    nll = jnp.mean(jnp.diagonal(scores) - jax.nn.logsumexp(scores, axis=1))
    return jnp.log(jnp.float32(n)) + nll


def js_fgan_lower_bound(scores: Array) -> Array:
    """Jensen-Shannon f-GAN (ref: VMI.py:169-174)."""
    n = scores.shape[0]
    f_diag = jnp.diagonal(scores)
    first_term = jnp.mean(-jax.nn.softplus(-f_diag))
    second_term = (
        jnp.sum(jax.nn.softplus(scores)) - jnp.sum(jax.nn.softplus(f_diag))
    ) / (n * (n - 1.0))
    return first_term - second_term


def js_lower_bound(scores: Array) -> Array:
    """NWJ value with JS gradients (ref: VMI.py:177-182)."""
    nwj = nwj_lower_bound(scores)
    js = js_fgan_lower_bound(scores)
    return js + jax.lax.stop_gradient(nwj - js)


def smile_lower_bound(scores: Array, clip: float = 1.0) -> Array:
    """SMILE with clip=1 (the reference hard-codes clip=1 even when passed
    None, ref: VMI.py:185-198)."""
    f_clipped = jnp.clip(scores, -clip, clip)
    z = logmeanexp_nodiag(f_clipped)
    dv = jnp.mean(jnp.diagonal(scores)) - z
    js = js_fgan_lower_bound(scores)
    return js + jax.lax.stop_gradient(dv - js)


def log_interpolate(log_a: Array, log_b: Array, alpha_logit: float) -> Array:
    """Numerically stable log(alpha*a + (1-alpha)*b) (ref: VMI.py:201-210)."""
    alpha_logit = jnp.float32(alpha_logit)
    log_alpha = -jax.nn.softplus(-alpha_logit)
    log_1_minus_alpha = -jax.nn.softplus(alpha_logit)
    return jax.nn.logsumexp(
        jnp.stack([log_alpha + log_a, log_1_minus_alpha + log_b]), axis=0
    )


def compute_log_loomean(scores: Array) -> Array:
    """Log leave-one-out mean of exponentiated scores (ref: VMI.py:213-226)."""
    max_scores = jnp.max(scores, axis=1, keepdims=True)
    lse_minus_max = jax.nn.logsumexp(scores - max_scores, axis=1, keepdims=True)
    d = lse_minus_max + (max_scores - scores)
    d_ok = jnp.not_equal(d, 0.0)
    safe_d = jnp.where(d_ok, d, jnp.ones_like(d))
    # stable softplus-inverse: log(-expm1(-d)) + d
    loo_lse = scores + safe_d + jnp.log(-jnp.expm1(-safe_d))
    return loo_lse - jnp.log(scores.shape[1] - 1.0)


def interp_lower_bound(scores: Array, baseline: Array, alpha_logit: float) -> Array:
    """Interpolated bound of Poole et al. (ref: VMI.py:229-250).

    ``baseline`` is the learned log-baseline a(y) with shape [bs, 1].
    """
    n = scores.shape[0]
    nce_baseline = compute_log_loomean(scores)
    interpolated_baseline = log_interpolate(
        nce_baseline, jnp.tile(baseline, (1, n)), alpha_logit
    )
    # marginal term: the reference's ``torch.diag(M)`` on a 2-D matrix
    # extracts the diagonal VECTOR, which then broadcasts across rows
    # (ref: VMI.py:244-245) — NOT a diagonal matrix.
    critic_marg = scores - jnp.diagonal(interpolated_baseline)[None, :]
    marg_term = jnp.exp(logmeanexp_nodiag(critic_marg))
    # joint term: diagonal vector of scores broadcast against the full
    # interpolated-baseline matrix (ref: VMI.py:248-249).
    critic_joint = jnp.diagonal(scores)[None, :] - interpolated_baseline
    joint_term = (jnp.sum(critic_joint) - jnp.sum(jnp.diagonal(critic_joint))) / (
        n * (n - 1.0)
    )
    return 1.0 + joint_term - marg_term


# ---------------------------------------------------------------------------
# Dispatch table + the in-model (mi, mi_loss) semantics
# ---------------------------------------------------------------------------

# score-matrix bounds (critic -> [bs, bs] scores); CLUB is separate
# (variational conditional critic, see club_bound_and_nll)
SCORE_BOUND_NAMES = (
    "dv", "mine", "tuba", "nwj", "infonce", "js", "js_fgan", "smile",
    "interpolate",
)
BOUND_NAMES = SCORE_BOUND_NAMES + ("club",)


def club_bound_and_nll(mu: Array, logvar: Array, y: Array):
    """CLUB (Contrastive Log-ratio Upper Bound, Cheng et al. 2020):
    I(X;Y) <= E_joint[log q(y|x)] - E_prod[log q(y|x)] with a variational
    conditional q. Returns (mi_upper_bound, nll) where nll is the
    critic-training objective (negative conditional log-likelihood).

    Extension beyond the reference's lower-bound zoo (VMI.py has no
    upper bound); paired with ClubCritic in mimrl_tpu.mi.critics."""
    inv_var = jnp.exp(-logvar)
    # positive pairs: diagonal (x_i, y_i)
    pos = -0.5 * jnp.sum(
        jnp.square(y - mu) * inv_var + logvar, axis=-1)  # [bs]
    # all-pairs negative: E_i E_j log q(y_j | x_i)
    diff = y[None, :, :] - mu[:, None, :]  # [bs_x, bs_y, d]
    neg_all = -0.5 * jnp.sum(
        jnp.square(diff) * inv_var[:, None, :] + logvar[:, None, :], axis=-1)
    mi = jnp.mean(pos) - jnp.mean(neg_all)
    nll = -jnp.mean(pos)
    return mi, nll


def mi_and_loss(
    bound_type: str,
    scores: Array,
    log_baseline: Array | None = None,
    alpha_logit: float = 0.01,
    ma_rate: float = 0.01,
):
    """Return (mi, mi_loss) exactly as the in-model estimator does
    (ref: Model.py:115-148).

    Parity notes:
    - the reference resets MINE's EMA accumulator to 1 on every forward
      (``ma_et, ma_rate = 1, 0.01`` at Model.py:116), so the 'EMA' is a
      one-step update; reproduced here without carried state.
    - the reference's in-model MINE `mi_loss` is NOT negated
      (Model.py:124, unlike the standalone path VMI.py:311); reproduced.
    """
    if bound_type == "mine":
        mi, t, et = mine_lower_bound_parts(scores)
        ma_et = (1.0 - ma_rate) * 1.0 + ma_rate * jnp.mean(et)
        mi_loss = jnp.mean(t) - jax.lax.stop_gradient(1.0 / ma_et) * jnp.mean(et)
        return mi, mi_loss
    if bound_type == "dv":
        mi = dv_lower_bound(scores)
    elif bound_type == "tuba":
        mi = tuba_lower_bound(scores, log_baseline)
    elif bound_type == "nwj":
        mi = nwj_lower_bound(scores)
    elif bound_type == "infonce":
        mi = infonce_lower_bound(scores)
    elif bound_type == "js":
        mi = js_lower_bound(scores)
    elif bound_type == "js_fgan":
        mi = js_fgan_lower_bound(scores)
    elif bound_type == "smile":
        mi = smile_lower_bound(scores)
    elif bound_type == "interpolate":
        assert log_baseline is not None
        mi = interp_lower_bound(scores, log_baseline, alpha_logit)
    else:
        raise NotImplementedError(bound_type)
    return mi, -mi
