"""Task losses.

jnp re-implementations of the reference loss zoo (ref: Solver.py:172-192,
Utils.py:22-49, :270-279, :447-468, :638-649), all mask-aware: each takes
an optional ``sample_mask`` so cycle-padded batch rows contribute zero —
the reference never pads batches, so with a full mask these reduce to the
exact reference math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(x: Array, mask: Array | None) -> Array:
    if mask is None:
        return jnp.mean(x)
    mask = mask.reshape(x.shape[0], *([1] * (x.ndim - 1)))
    return jnp.sum(x * mask) / (jnp.sum(mask) * (x.size / x.shape[0]))


def mae_loss(pred: Array, target: Array, mask: Array | None = None) -> Array:
    return _masked_mean(jnp.abs(pred - target), mask)


def mse_loss(pred: Array, target: Array, mask: Array | None = None) -> Array:
    return _masked_mean(jnp.square(pred - target), mask)


def rmse_loss(pred: Array, target: Array, mask: Array | None = None) -> Array:
    """(ref: Utils.py:270-275)"""
    return jnp.sqrt(mse_loss(pred, target, mask))


def simse_loss(pred: Array, target: Array, mask: Array | None = None) -> Array:
    """Scale-invariant MSE: (sum of diffs)^2 / n^2 (ref: Utils.py:459-468)."""
    diffs = target - pred
    if mask is not None:
        diffs = diffs * mask.reshape(-1)
        n = jnp.sum(mask)
    else:
        n = diffs.size
    return jnp.square(jnp.sum(diffs)) / (n * n)


def ccc_loss(pred: Array, target: Array, mask: Array | None = None) -> Array:
    """1 - concordance correlation coefficient (ref: Utils.py:22-34)."""
    pred, target = pred.reshape(-1), target.reshape(-1)
    if mask is not None:
        m = mask.reshape(-1)
        n = jnp.sum(m)
        pm = jnp.sum(pred * m) / n
        tm = jnp.sum(target * m) / n
        cov = jnp.sum((pred - pm) * (target - tm) * m) / n
        pv = jnp.sum(jnp.square(pred - pm) * m) / n
        tv = jnp.sum(jnp.square(target - tm) * m) / n
    else:
        pm, tm = jnp.mean(pred), jnp.mean(target)
        cov = jnp.mean((pred - pm) * (target - tm))
        pv = jnp.mean(jnp.square(pred - pm))
        tv = jnp.mean(jnp.square(target - tm))
    ccc = 2.0 * cov / (tv + pv + jnp.square(tm - pm) + 1e-10)
    return 1.0 - ccc


def cross_entropy_loss(logits: Array, labels: Array,
                       mask: Array | None = None) -> Array:
    """torch CrossEntropyLoss (logits [n, C], int labels [n])."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels.reshape(-1, 1), axis=1).reshape(-1)
    if mask is not None:
        return jnp.sum(nll * mask) / jnp.sum(mask)
    return jnp.mean(nll)


def focal_loss(logits: Array, labels: Array, mask: Array | None = None,
               gamma: float = 2.0) -> Array:
    """Focal loss as the reference computes it: a scalar CE re-weighted by
    (1 - exp(-CE))^gamma (ref: Utils.py:638-649 applies the focal factor
    to the *mean* CE, not per-sample; reproduced)."""
    logp = cross_entropy_loss(logits, labels, mask)
    p = jnp.exp(-logp)
    return jnp.power(1.0 - p, gamma) * logp


def bce_with_logits_loss(logits: Array, targets: Array,
                         mask: Array | None = None) -> Array:
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return _masked_mean(per, mask)


def compute_task_loss(loss_name: str, num_class: int, predictions: Array,
                      labels: Array, mask: Array | None = None) -> Array:
    """Loss dispatch incl. the reference's reshape conventions
    (ref: Solver.py:317-342)."""
    if loss_name in ("Focal", "CE"):
        logits = predictions.reshape(-1, num_class)
        labels_i = labels.reshape(-1).astype(jnp.int32)
        fn = focal_loss if loss_name == "Focal" else cross_entropy_loss
        return fn(logits, labels_i, mask)
    if loss_name == "BCE" and num_class == 2:
        logits = predictions.reshape(-1, num_class)
        one_hot = jax.nn.one_hot(labels.reshape(-1).astype(jnp.int32),
                                 num_class)
        return bce_with_logits_loss(logits, one_hot, mask)
    if loss_name == "BCE":
        return bce_with_logits_loss(predictions.reshape(-1),
                                    labels.reshape(-1).astype(jnp.float32),
                                    mask)
    reg = {"RMSE": rmse_loss, "MAE": mae_loss, "MSE": mse_loss,
           "SIMSE": simse_loss, "CCC": ccc_loss}
    if loss_name in reg:
        return reg[loss_name](predictions.reshape(-1), labels.reshape(-1),
                              mask)
    raise NotImplementedError(loss_name)
