"""User loss extension point (--custom_loss).

The reference ships ``get_customized_loss(opt)`` as the documented hook
for adding a user-defined term to the training objective, but its body
is a dead placeholder (``lambda a: a + 1``, ref: Customization.py:40-41)
that the loss composer never calls. This module makes the hook
functional and TPU-native: the user names a *factory* with an import
path (``--custom_loss my_pkg.losses:my_factory``); the factory receives
the full ``MimrlConfig`` once at solver build time (mirroring the
reference's ``get_customized_loss(opt)`` shape) and returns a jittable
function

    fn(out, labels, feats) -> scalar

- ``out``      — the classifier output, ``[bs, num_class]``
- ``labels``   — the routed labels for the task (``[bs]`` or ``[bs, k]``)
- ``feats``    — ``(F, T, A, V)`` fused + per-modality features,
                 each ``[bs, d_common]``

whose return value is ADDED to the stage-2 objective (task loss +
weighted MI losses + custom). Because the returned fn is traced into
the jitted train/eval steps, it must be a pure jax function: no Python
side effects, no data-dependent control flow, static shapes. It runs
under the same mesh/sharding as the rest of the step — batch-dim
reductions see the per-device shard inside shard-parallel programs and
the global batch under GSPMD, exactly like the built-in task losses.

Resolution happens once, at ``StepFactory`` construction; a bad path or
a non-callable fails fast with a clear error rather than mid-epoch.
"""

from __future__ import annotations

import importlib
from typing import Callable, Optional

import jax.numpy as jnp


def load_custom_loss(spec: Optional[str], cfg) -> Optional[Callable]:
    """Resolve ``--custom_loss module.path:factory`` -> fn(out, labels, feats).

    Returns None when the flag is unset. Raises ValueError with the
    offending spec for malformed paths, import failures, missing
    attributes, or factories that don't return a callable.
    """
    if not spec:
        return None
    if ":" not in spec:
        raise ValueError(
            f"--custom_loss {spec!r}: expected 'module.path:factory'")
    mod_name, _, attr = spec.partition(":")
    try:
        mod = importlib.import_module(mod_name)
    except ImportError as e:
        raise ValueError(f"--custom_loss {spec!r}: cannot import "
                         f"{mod_name!r} ({e})") from e
    try:
        factory = getattr(mod, attr)
    except AttributeError as e:
        raise ValueError(f"--custom_loss {spec!r}: module {mod_name!r} "
                         f"has no attribute {attr!r}") from e
    fn = factory(cfg)
    if not callable(fn):
        raise ValueError(f"--custom_loss {spec!r}: factory returned "
                         f"non-callable {type(fn).__name__}")
    return fn


# ---------------------------------------------------------------------------
# Example factories — usable directly as
#   --custom_loss mimrl_tpu.train.custom:l2_output
#   --custom_loss mimrl_tpu.train.custom:feature_decorrelation
# and doubling as the documented template for user-defined ones.
# ---------------------------------------------------------------------------

def l2_output(cfg):
    """Small L2 penalty on the classifier output (output-confidence
    regularizer); scale chosen so it perturbs rather than dominates."""
    del cfg

    def fn(out, labels, feats):
        del labels, feats
        return 1e-3 * jnp.mean(jnp.square(out))

    return fn


def feature_decorrelation(cfg):
    """Penalize cross-correlation between the fused features and each
    modality-specific feature — the same flavour of representation
    shaping the MI objectives perform, expressed as a cheap covariance
    penalty (an example of a hook that uses the feats tuple)."""
    del cfg

    def fn(out, labels, feats):
        del out, labels
        F, T, A, V = feats
        Fc = F - jnp.mean(F, axis=0, keepdims=True)
        pen = 0.0
        for X in (T, A, V):
            Xc = X - jnp.mean(X, axis=0, keepdims=True)
            pen = pen + jnp.mean(jnp.square(Fc.T @ Xc / Fc.shape[0]))
        return 1e-2 * pen

    return fn
