"""Research-spare losses/regularizers the reference toolkit carries
(SURVEY.md §2.7): CMD, DiffLoss, gradient-reversal, uni/multivariate
Gaussian KLD, temporal summary augmentation, masked mean. All pure jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cmd(x1: Array, x2: Array, n_moments: int = 5) -> Array:
    """Central Moment Discrepancy (ref: Utils.py:374-403)."""
    mx1 = jnp.mean(x1, axis=0)
    mx2 = jnp.mean(x2, axis=0)
    sx1 = x1 - mx1
    sx2 = x2 - mx2

    def matchnorm(a, b):
        return jnp.sqrt(jnp.sum(jnp.square(a - b)))

    scms = matchnorm(mx1, mx2)
    for i in range(n_moments - 1):
        k = i + 2
        ss1 = jnp.mean(jnp.power(sx1, k), axis=0)
        ss2 = jnp.mean(jnp.power(sx2, k), axis=0)
        scms = scms + matchnorm(ss1, ss2)
    return scms


def diff_loss(input1: Array, input2: Array) -> Array:
    """Orthogonality penalty between two feature spaces
    (ref: Utils.py:406-430)."""
    bs = input1.shape[0]
    x1 = input1.reshape(bs, -1)
    x2 = input2.reshape(bs, -1)
    x1 = x1 - jnp.mean(x1, axis=0, keepdims=True)
    x2 = x2 - jnp.mean(x2, axis=0, keepdims=True)
    n1 = jax.lax.stop_gradient(
        jnp.linalg.norm(x1, axis=1, keepdims=True))
    n2 = jax.lax.stop_gradient(
        jnp.linalg.norm(x2, axis=1, keepdims=True))
    x1 = x1 / (n1 + 1e-6)
    x2 = x2 / (n2 + 1e-6)
    return jnp.mean(jnp.square(x1.T @ x2))


@jax.custom_vjp
def reverse_gradient(x: Array, p: float = 1.0) -> Array:
    """Gradient reversal layer (ref: Utils.py:433-444)."""
    return x


def _rg_fwd(x, p):
    return x, p


def _rg_bwd(p, g):
    return (-g * p, None)


reverse_gradient.defvjp(_rg_fwd, _rg_bwd)


def univariate_kld(mu1: Array, mu2: Array, var_1: Array, var_2: Array,
                   reduction: str = "mean") -> Array:
    """KL(N(mu1, var_1) || N(mu2, var_2)) elementwise
    (ref: Utils.py:557-586)."""
    term_1 = jnp.log(jnp.sqrt(var_2) / jnp.sqrt(var_1))
    term_2 = (var_1 + jnp.square(mu1 - mu2)) / (2 * var_2)
    kl = term_1 + term_2 - 0.5
    if reduction == "mean":
        return jnp.mean(kl)
    if reduction == "sum":
        return jnp.sum(kl)
    raise NotImplementedError(reduction)


def multivariate_kld(mu1: Array, mu2: Array, sigma_1: Array, sigma_2: Array,
                     reduction: str = "mean") -> Array:
    """Diagonal-covariance multivariate KLD (ref: Utils.py:589-635);
    sigma_* are per-dimension (diagonal) entries [bs, n]."""
    n = mu1.shape[1]
    term_1 = jnp.log(jnp.prod(sigma_2, axis=-1) / jnp.prod(sigma_1, axis=-1))
    term_2 = jnp.sum(sigma_1 / sigma_2, axis=-1)
    term_3 = jnp.sum(jnp.square(mu2 - mu1) / sigma_2, axis=-1)
    kl = 0.5 * (term_1 - n + term_2 + term_3)
    if reduction == "mean":
        return jnp.mean(kl)
    if reduction == "sum":
        return jnp.sum(kl)
    raise NotImplementedError(reduction)


def aug_temporal(data: Array, aug_dim: int = 1) -> Array:
    """[mean, std, min, max] summary over a temporal axis
    (ref: Utils.py:541-549)."""
    return jnp.concatenate(
        [jnp.mean(data, axis=aug_dim),
         jnp.std(data, axis=aug_dim, ddof=1),
         jnp.min(data, axis=aug_dim),
         jnp.max(data, axis=aug_dim)],
        axis=-1,
    )


def mean_temporal(data: Array, aug_dim: int = 1) -> Array:
    return jnp.mean(data, axis=aug_dim)


def masked_mean(tensor: Array, mask: Array, dim: int) -> Array:
    """(ref: Utils.py:339-342)"""
    masked = tensor * mask
    return jnp.sum(masked, axis=dim) / jnp.sum(mask, axis=dim)
