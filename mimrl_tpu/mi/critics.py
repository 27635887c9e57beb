"""Critic and baseline networks for variational MI estimation.

Flax re-design of the reference critic zoo (ref: VMI.py:25-110).

TPU notes:
- the `separate` critic's score matrix is a single ``[bs, embed] x
  [embed, bs]`` matmul — an MXU-native op; under a data-sharded mesh the
  activations are all-gathered by GSPMD so the scores stay *global*.
- the `concat` critic materializes all (x_i, y_j) pairs as a
  ``[bs, bs, dx+dy]`` tensor; the pair MLP batches over both leading axes
  (O(bs^2) memory, as in the reference).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mimrl_tpu.utils.activations import get_activation_fn


class MLPStack(nn.Module):
    """[Linear+act] x (layers+1) followed by a final Linear
    (ref: VMI.py:13-22). Biases init to zero (ref: VMI.py:47-51)."""

    hidden_dim: int
    output_dim: int
    layers: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = get_activation_fn(self.activation)
        x = act(nn.Dense(self.hidden_dim, name="fc_in")(x))
        for i in range(self.layers):
            x = act(nn.Dense(self.hidden_dim, name=f"fc_{i}")(x))
        return nn.Dense(self.output_dim, name="fc_out")(x)


class CriticModel(nn.Module):
    """Pair-score critic f(x, y) -> scores[bs, bs] (ref: VMI.py:25-69).

    Orientation parity with the reference:
    - separate: ``scores[i, j] = h(y_i) . g(x_j)``        (VMI.py:57)
    - concat:   ``scores[i, j] = MLP_f(concat(x_i, y_j))`` (VMI.py:59-65)
    The diagonal holds joint samples either way.
    """

    critic_type: str  # 'separate' | 'concat'
    hidden_dim: int = 256
    embed_dim: int = 128
    layers: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, y):
        if self.critic_type == "separate":
            g = MLPStack(self.hidden_dim, self.embed_dim, self.layers,
                         self.activation, name="MLP_g")(x)
            h = MLPStack(self.hidden_dim, self.embed_dim, self.layers,
                         self.activation, name="MLP_h")(y)
            scores = jnp.matmul(h, g.T,
                                preferred_element_type=jnp.promote_types(
                                    h.dtype, jnp.float32))
        elif self.critic_type == "concat":
            bs = x.shape[0]
            xx = jnp.broadcast_to(x[None, :, :], (bs, bs, x.shape[-1]))  # [a,b]=x_b
            yy = jnp.broadcast_to(y[:, None, :], (bs, bs, y.shape[-1]))  # [a,b]=y_a
            pairs = jnp.concatenate([xx, yy], axis=-1)
            raw = MLPStack(self.hidden_dim, 1, self.layers, self.activation,
                           name="MLP_f")(pairs)[..., 0]  # raw[a,b]=f(x_b,y_a)
            scores = raw.T  # scores[i,j]=f(x_i,y_j), matching VMI.py:65's .t()
        else:
            raise NotImplementedError(self.critic_type)
        return scores


class ClubCritic(nn.Module):
    """Variational conditional net q(y|x) = N(mu(x), exp(logvar(x))) for
    the CLUB upper bound (Cheng et al., ICML 2020). Not present in the
    reference repo; part of this framework's extended bound zoo."""

    y_dim: int
    hidden_dim: int = 256
    layers: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        mu = MLPStack(self.hidden_dim, self.y_dim, self.layers,
                      self.activation, name="mu")(x)
        logvar = jnp.tanh(
            MLPStack(self.hidden_dim, self.y_dim, self.layers,
                     self.activation, name="logvar")(x)) * 5.0
        return mu, logvar


class BaselineModel(nn.Module):
    """Log-baseline a(y) -> [bs, 1] (ref: VMI.py:72-110).

    'gaussain' [sic] is part of the public flag surface
    (ref: Parameters.py:42); it is the sum of Normal(mu, rho) log-probs.
    """

    baseline_type: str  # 'unnormalized' | 'constant' | 'gaussain'
    hidden_dim: int = 256
    layers: int = 2
    activation: str = "relu"
    mu: float = 0.0
    rho: float = 1.0

    @nn.compact
    def __call__(self, y):
        bs = y.shape[0]
        if self.baseline_type == "unnormalized":
            return MLPStack(self.hidden_dim, 1, self.layers, self.activation,
                            name="MLP")(y).reshape(bs, 1)
        if self.baseline_type == "constant":
            return jnp.zeros((bs, 1), dtype=y.dtype)
        if self.baseline_type == "gaussain":
            log_prob = (
                -0.5 * jnp.log(2.0 * jnp.pi)
                - jnp.log(self.rho)
                - 0.5 * jnp.square((y - self.mu) / self.rho)
            )
            return jnp.sum(log_prob, axis=-1).reshape(bs, 1)
        raise NotImplementedError(self.baseline_type)
