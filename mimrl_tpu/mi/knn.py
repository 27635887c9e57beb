"""On-device kNN conditional-product sampling.

The reference builds conditional-product negatives for classifier-based
CMI estimation by round-tripping the epoch-wide feature bank to the host
and running sklearn NearestNeighbors *six times per batch per stage*
(ref: Model.py:75-106) — its worst serialization point. Here the whole
thing is a few XLA ops that stay in HBM:

  1. sample m = bs // k anchor rows (without replacement, valid rows only)
  2. a [m, N] squared-euclidean distance matrix (one MXU matmul)
  3. mask out anchors + invalid rows, `lax.top_k` for the k nearest
  4. gather x from neighbors, tile (y, z) from anchors

Semantics parity notes:
- the reference's `radius` argument is dead: sklearn's `kneighbors` does
  not use the radius (only `radius_neighbors` would). Accepted + ignored.
- the reference physically removes anchor rows before fitting
  (Model.py:83-85); masking them to +inf distance selects the identical
  data rows.
- dimension harmonization by channel-tiling to the max dim
  (Model.py:98-104) is reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _tile_to(x: Array, dim: int) -> Array:
    """torch's ``tensor.repeat(1, dim // d)`` (ref: Model.py:100-104)."""
    d = x.shape[1]
    if d != dim:
        assert dim % d == 0, f"cannot tile dim {d} to {dim}"
        x = jnp.tile(x, (1, dim // d))
    return x


def prod_knn_sample(
    key: Array,
    X: Array,
    Y: Array,
    Z: Array,
    batch_size: int,
    k_neighbor: int,
    radius: float = 1.0,  # accepted for parity; unused (see module docstring)
    valid: Array | None = None,
):
    """Sample conditional-product triples from epoch feature banks.

    Args:
      key: PRNG key.
      X, Y, Z: ``[N, d_*]`` feature banks (epoch-stale, non-differentiable).
      batch_size: current batch size; m = batch_size // k_neighbor anchors.
      k_neighbor: neighbors per anchor.
      valid: optional ``[N]`` bool mask of filled bank rows.

    Returns:
      (x, y, z): each ``[m * k_neighbor, max_dim]`` — x gathered from the
      anchors' nearest neighbors in Z-space, (y, z) tiled from the anchors
      (ref: Model.py:88-97).
    """
    del radius
    N = X.shape[0]
    m = batch_size // k_neighbor
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)
    valid = valid.astype(jnp.float32)

    # 1. anchors without replacement among valid rows (ref: Model.py:81)
    probs = valid / jnp.sum(valid)
    idx_yz = jax.random.choice(key, N, shape=(m,), replace=False, p=probs)

    # 2. [m, N] squared distances in Z-space (euclidean ordering is
    #    preserved under squaring) — one matmul on the MXU.
    Zq = Z[idx_yz]  # [m, d]
    d2 = (
        jnp.sum(Zq * Zq, axis=1, keepdims=True)
        - 2.0 * jnp.matmul(Zq, Z.T,
                           preferred_element_type=jnp.promote_types(
                               Zq.dtype, jnp.float32))
        + jnp.sum(Z * Z, axis=1)[None, :]
    )

    # 3. exclude anchors and invalid rows from the candidate pool
    excluded = jnp.zeros((N,), dtype=bool).at[idx_yz].set(True)
    excluded = jnp.logical_or(excluded, valid < 0.5)
    d2 = jnp.where(excluded[None, :], jnp.inf, d2)
    _, nbr_idx = jax.lax.top_k(-d2, k_neighbor)  # ascending distance

    # 4. gather / tile (ref: Model.py:88-97)
    index_x = nbr_idx.reshape(-1)  # [m*k]
    index_yz = jnp.repeat(idx_yz, k_neighbor)  # [m*k]
    batch_x, batch_y, batch_z = X[index_x], Y[index_yz], Z[index_yz]

    max_dim = max(batch_x.shape[1], batch_y.shape[1], batch_z.shape[1])
    return (
        _tile_to(batch_x, max_dim),
        _tile_to(batch_y, max_dim),
        _tile_to(batch_z, max_dim),
    )
