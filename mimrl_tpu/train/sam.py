"""Sharpness-Aware Minimization (library parity with Utils.py:471-538).

The reference ships a SAM optimizer class that its solver never wires up
(``--optm SAM`` raises, ref: Solver.py:150-151). Here SAM is a proper
functional two-step update usable with any optax base optimizer:

    state = sam_init(params)
    e_w   = sam_first_step(grads, rho)          # ascent to w + e(w)
    ...recompute grads at (params + e_w)...
    updates, opt_state = base.update(grads2, opt_state, params)
    params = optax.apply_updates(params, updates)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def global_grad_norm(grads) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def sam_ascent(grads, rho: float = 0.05):
    """e(w) = rho * g / ||g|| (ref: Utils.py:482-495)."""
    scale = rho / (global_grad_norm(grads) + 1e-12)
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def sam_step(loss_fn, params, opt, opt_state, rho: float = 0.05):
    """Full SAM step: perturb, re-evaluate, update (ref: Utils.py:497-521).

    `loss_fn(params) -> scalar`; returns (params, opt_state, loss)."""
    loss, grads = jax.value_and_grad(loss_fn)(params)
    e_w = sam_ascent(grads, rho)
    perturbed = optax.apply_updates(params, e_w)
    grads2 = jax.grad(loss_fn)(perturbed)
    updates, opt_state = opt.update(grads2, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
