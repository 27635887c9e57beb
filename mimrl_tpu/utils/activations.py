"""Activation registry (ref: Utils.py:70-97).

All activations are pure jnp functions (VPU elementwise ops that XLA fuses
into adjacent matmuls). Notes vs the reference:

- ``gelu`` uses the exact (erf) form to match ``torch.nn.GELU``'s default.
- ``prelu`` in torch is learnable (init slope 0.25); here it is the fixed
  0.25-slope leaky form — the reference only ever instantiates critics
  with 'relu' and CubeMLP with 'gelu', so this is surface parity.
- ``rrelu`` uses the deterministic eval-mode slope (lower+upper)/2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hardshrink(x, lambd=0.5):
    return jnp.where(jnp.abs(x) > lambd, x, 0.0)


def _hardtanh(x, min_val=-1.0, max_val=1.0):
    return jnp.clip(x, min_val, max_val)


_ACTIVATIONS = {
    "elu": jax.nn.elu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "hardshrink": _hardshrink,
    "hardtanh": _hardtanh,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "prelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.25),
    "relu": jax.nn.relu,
    "rrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=(1 / 8 + 1 / 3) / 2),
    "tanh": jnp.tanh,
}


def get_activation_fn(name: str):
    return _ACTIVATIONS[name]
