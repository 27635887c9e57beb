"""In-model MI / conditional-MI estimators.

Flax modules mirroring the estimator surface the model embeds
(ref: Model.py:108-225): `VMIEstimator` wraps a critic + baseline +
bound; `VCMIEstimator` is the classifier-based conditional-MI estimator
trained against kNN conditional-product negatives.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mimrl_tpu.mi import bounds
from mimrl_tpu.mi.critics import BaselineModel, ClubCritic, CriticModel
from mimrl_tpu.utils.activations import get_activation_fn

Array = jax.Array


class VMIEstimator(nn.Module):
    """(features_x, features_y) -> (mi, mi_loss) (ref: Model.py:108-148)."""

    critic_type: str
    baseline_type: str
    bound_type: str
    hidden_dim: int = 256
    embed_dim: int = 128
    layers: int = 2
    activation: str = "relu"
    mu: float = 0.0
    rho: float = 1.0
    alpha_logit: float = 0.01  # hard-coded in the reference (Model.py:117)
    ma_rate: float = 0.01

    @nn.compact
    def __call__(self, features_x: Array, features_y: Array):
        if self.bound_type == "club":
            # CLUB is an UPPER bound trained by conditional MLE: mi_loss
            # is the critic's NLL (stage 1 trains q), and the mi value is
            # the log-ratio estimate. With positive loss_mi_coefficient2
            # stage 2 then maximizes likelihood of y given x; to use CLUB
            # for MI *minimization* flip the coefficient sign.
            mu, logvar = ClubCritic(
                features_y.shape[-1], hidden_dim=self.hidden_dim,
                layers=self.layers, activation=self.activation,
                name="critic_model")(features_x)
            mi, nll = bounds.club_bound_and_nll(mu, logvar, features_y)
            return mi, nll
        scores = CriticModel(
            self.critic_type,
            hidden_dim=self.hidden_dim,
            embed_dim=self.embed_dim,
            layers=self.layers,
            activation=self.activation,
            name="critic_model",
        )(features_x, features_y)

        log_baseline = None
        if self.bound_type in ("tuba", "interpolate"):
            log_baseline = BaselineModel(
                self.baseline_type,
                hidden_dim=self.hidden_dim,
                layers=self.layers,
                activation=self.activation,
                mu=self.mu,
                rho=self.rho,
                name="baseline_model",
            )(features_y)

        return bounds.mi_and_loss(
            self.bound_type,
            scores,
            log_baseline=log_baseline,
            alpha_logit=self.alpha_logit,
            ma_rate=self.ma_rate,
        )


class MLPForCMI(nn.Module):
    """3-hidden-layer MLP -> clamp(-10, 10) -> sigmoid/hardtanh head
    (ref: Model.py:47-72)."""

    hidden_dim: int
    output_dim: int
    activation: str = "relu"
    last_activate: str = "sigmoid"  # 'hardtanh' | 'sigmoid'

    @nn.compact
    def __call__(self, features: Array) -> Array:
        act = get_activation_fn(self.activation)
        x = act(nn.Dense(self.hidden_dim, name="fc0")(features))
        x = act(nn.Dense(self.hidden_dim, name="fc1")(x))
        x = act(nn.Dense(self.hidden_dim, name="fc2")(x))
        x = nn.Dense(self.output_dim, name="fc_out")(x)
        x = jnp.clip(x, -10.0, 10.0)
        if self.last_activate == "hardtanh":
            return jnp.clip(x, 1e-4, 1.0 - 1e-4)
        if self.last_activate == "sigmoid":
            return jax.nn.sigmoid(x)
        raise NotImplementedError(self.last_activate)


def _binary_cross_entropy(probs: Array, targets: Array) -> Array:
    """torch F.binary_cross_entropy on probabilities, mean reduction,
    with torch's log clamp at -100 (ref: Model.py:198)."""
    eps_log = -100.0
    log_p = jnp.maximum(jnp.log(probs), eps_log)
    log_1p = jnp.maximum(jnp.log1p(-probs), eps_log)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_1p)


class VCMIEstimator(nn.Module):
    """Classifier-based conditional MI I(X;Y|Z) (ref: Model.py:150-225).

    Joint samples (x, y, z) from the current batch vs conditional-product
    samples from `prod_knn_sample`; a 2-way classifier is trained with BCE
    and the CMI estimate is the NWJ log-ratio of its outputs.
    """

    embed_dim: int = 128
    hidden_dim: int = 256
    activation: str = "relu"
    last_activate: str = "sigmoid"
    cmi_type: str = "nwj"  # 'nwj' | 'dv' (ref: Model.py:218-223)

    def _tile_to_embed(self, f: Array) -> Array:
        d = f.shape[1]
        if d != self.embed_dim:
            assert self.embed_dim % d == 0
            f = jnp.tile(f, (1, self.embed_dim // d))
        return f

    @nn.compact
    def __call__(
        self,
        features_x: Array,
        features_y: Array,
        features_z: Array,
        knn_x: Array,
        knn_y: Array,
        knn_z: Array,
    ):
        classifier = MLPForCMI(
            self.hidden_dim, 2, self.activation, self.last_activate,
            name="classifier",
        )

        fx = self._tile_to_embed(features_x)
        fy = self._tile_to_embed(features_y)
        fz = self._tile_to_embed(features_z)
        joint = jnp.concatenate([fx, fy, fz], axis=1)
        # knn samples are tiled to the banks' max dim (= d_common) by
        # prod_knn_sample; tile them on to embed_dim as well. For the
        # reference's only working configuration (d_common == 128 ==
        # embed_dim) this is the identity, and it generalizes the
        # estimator to d_common | 128 instead of crashing like the
        # reference would (Model.py:153 vs :98-104 dim mismatch).
        kx = self._tile_to_embed(knn_x)
        ky = self._tile_to_embed(knn_y)
        kz = self._tile_to_embed(knn_z)
        prod = jnp.concatenate([kx, ky, kz], axis=1)

        # When bs % k != 0 the product set is smaller; truncate the joint
        # set to match (ref: Model.py:180-187). Shapes are static.
        n = prod.shape[0]
        if joint.shape[0] != n:
            joint = joint[:n]

        batch = jnp.concatenate([joint, prod], axis=0)  # [2n, 3*embed]
        targets = jnp.concatenate(
            [
                jnp.tile(jnp.array([[1.0, 0.0]], batch.dtype), (n, 1)),
                jnp.tile(jnp.array([[0.0, 1.0]], batch.dtype), (n, 1)),
            ],
            axis=0,
        )

        out = classifier(batch)
        loss = _binary_cross_entropy(out, targets)
        cmi = self._estimate_cmi(out)
        return cmi, loss

    def _estimate_cmi(self, gamma: Array) -> Array:
        """NWJ/DV ratio estimate from classifier outputs on the combined
        batch (ref: Model.py:203-225). The reference re-runs the
        classifier on the same batch; the outputs are identical, so we
        reuse them (same values, same gradients, half the FLOPs)."""
        batch_size = gamma.shape[0]  # = 2n, matching Model.py:204
        half = batch_size // 2
        gamma_joint = gamma[:half, 0:1]
        gamma_prod = gamma[half:, 0:1]
        sum1 = jnp.sum(jnp.log(gamma_joint / (1.0 - gamma_joint + 1e-6)))
        sum2 = jnp.sum(jnp.log(gamma_prod / (1.0 - gamma_prod + 1e-6)))
        if self.cmi_type == "nwj":
            return 1.0 + (sum1 - sum2) / batch_size
        if self.cmi_type == "dv":
            return sum1 / batch_size - jnp.log(sum2 / batch_size)
        raise NotImplementedError(self.cmi_type)
