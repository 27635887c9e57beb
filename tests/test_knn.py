"""On-device kNN conditional-product sampler vs sklearn ground truth
(the reference's implementation, ref: Model.py:75-106)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.mi.knn import prod_knn_sample


def _banks(N=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N, d)).astype(np.float32)
    Y = rng.normal(size=(N, d)).astype(np.float32)
    Z = rng.normal(size=(N, d)).astype(np.float32)
    return X, Y, Z


def test_shapes_and_dim_tiling():
    X, Y, Z = _banks()
    C = np.random.default_rng(1).normal(size=(64, 1)).astype(np.float32)
    bs, k = 16, 2
    x, y, z = prod_knn_sample(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(C), jnp.asarray(Z),
        batch_size=bs, k_neighbor=k)
    m = bs // k
    assert x.shape == (m * k, 16)
    assert y.shape == (m * k, 16)  # C tiled from 1 -> 16 (ref: Model.py:100-104)
    assert z.shape == (m * k, 16)


def test_neighbors_match_sklearn():
    """For a fixed anchor set, the selected x rows must be the anchors'
    k nearest neighbors in Z-space among non-anchor rows — exactly what
    sklearn computes in the reference."""
    from sklearn.neighbors import NearestNeighbors

    X, Y, Z = _banks(N=48, d=8)
    bs, k = 12, 3
    m = bs // k
    key = jax.random.PRNGKey(3)
    x, y, z = prod_knn_sample(
        key, jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z),
        batch_size=bs, k_neighbor=k)
    x, y, z = map(np.asarray, (x, y, z))

    # Recover the anchors from z (tiled k times per anchor)
    anchors_z = z[::k]
    anchor_idx = []
    for az in anchors_z:
        matches = np.where((Z == az).all(axis=1))[0]
        assert len(matches) == 1
        anchor_idx.append(matches[0])
    anchor_idx = np.asarray(anchor_idx)
    assert len(np.unique(anchor_idx)) == m  # without replacement

    # sklearn on the complement, as the reference does (Model.py:82-86)
    keep = np.setdiff1d(np.arange(48), anchor_idx)
    neigh = NearestNeighbors(n_neighbors=k, metric="euclidean")
    neigh.fit(Z[keep])
    nbr = neigh.kneighbors(Z[anchor_idx], return_distance=False)
    expected_rows = X[keep][nbr.reshape(-1)]
    # same multiset of neighbor rows per anchor (tie order may differ)
    for i in range(m):
        got = np.sort(x[i * k:(i + 1) * k], axis=0)
        want = np.sort(expected_rows[i * k:(i + 1) * k], axis=0)
        assert np.allclose(got, want, atol=1e-5)

    # y tiled from anchors
    assert np.allclose(y[::k], Y[anchor_idx])


def test_valid_mask_excludes_rows():
    X, Y, Z = _banks(N=32, d=4)
    valid = np.zeros(32, bool)
    valid[:16] = True
    x, y, z = prod_knn_sample(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z),
        batch_size=8, k_neighbor=2, valid=jnp.asarray(valid))
    # every returned row must come from the valid region
    for row in np.asarray(z):
        assert any(np.allclose(row, Z[i]) for i in range(16))


def test_jittable():
    X, Y, Z = _banks(N=32, d=4)
    f = jax.jit(lambda key: prod_knn_sample(
        key, jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z),
        batch_size=8, k_neighbor=2))
    x, y, z = f(jax.random.PRNGKey(0))
    assert x.shape == (8, 4)
