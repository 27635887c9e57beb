"""Numeric parity of every score-matrix bound against the ACTUAL
reference torch implementation (/root/reference/VMI.py:113-250).

The identity/Gaussian-recovery tests in test_bounds.py cannot pin the
reference's exact numerics (a subtly different interpolated bound still
"recovers" Gaussian MI); these tests import the reference module itself
(CPU-safe: to_gpu is a no-op without CUDA) and assert agreement <=1e-4
on random score matrices across batch sizes.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "VMI.py")),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)
import VMI as ref_vmi  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from mimrl_tpu.mi import bounds  # noqa: E402

BATCH_SIZES = (4, 8, 64)
ATOL = 1e-4


def _scores(bs, seed):
    rng = np.random.default_rng(seed)
    # spread wide enough to stress the exp/logsumexp paths
    return (2.0 * rng.standard_normal((bs, bs))).astype(np.float32)


def _baseline(bs, seed):
    rng = np.random.default_rng(1000 + seed)
    return rng.standard_normal((bs, 1)).astype(np.float32)


def _t(x):
    return torch.from_numpy(np.asarray(x))


@pytest.mark.parametrize("bs", BATCH_SIZES)
@pytest.mark.parametrize(
    "name",
    ["dv", "nwj", "infonce", "js_fgan", "js", "smile"],
)
def test_plain_bounds_match_reference(name, bs):
    s = _scores(bs, seed=bs)
    ref_fn = getattr(ref_vmi, f"{name}_lower_bound")
    ours_fn = getattr(bounds, f"{name}_lower_bound")
    ref_val = float(ref_fn(_t(s)))
    our_val = float(ours_fn(jnp.asarray(s)))
    assert abs(ref_val - our_val) <= ATOL, (name, bs, ref_val, our_val)


@pytest.mark.parametrize("bs", BATCH_SIZES)
@pytest.mark.parametrize("with_baseline", [False, True])
def test_tuba_matches_reference(bs, with_baseline):
    s = _scores(bs, seed=10 + bs)
    b = _baseline(bs, seed=bs) if with_baseline else None
    ref_val = float(
        ref_vmi.tuba_lower_bound(_t(s), None if b is None else _t(b))
    )
    our_val = float(
        bounds.tuba_lower_bound(jnp.asarray(s), None if b is None else jnp.asarray(b))
    )
    assert abs(ref_val - our_val) <= ATOL, (bs, with_baseline, ref_val, our_val)


@pytest.mark.parametrize("bs", BATCH_SIZES)
def test_mine_parts_match_reference(bs):
    s = _scores(bs, seed=20 + bs)
    ref_mi, ref_t, ref_et = ref_vmi.mine_lower_bound_test(_t(s))
    our_mi, our_t, our_et = bounds.mine_lower_bound_parts(jnp.asarray(s))
    assert abs(float(ref_mi) - float(our_mi)) <= ATOL
    np.testing.assert_allclose(ref_t.numpy(), np.asarray(our_t), atol=ATOL)
    np.testing.assert_allclose(ref_et.numpy(), np.asarray(our_et), atol=ATOL)


@pytest.mark.parametrize("bs", BATCH_SIZES)
@pytest.mark.parametrize("alpha_logit", [-2.0, 0.01, 1.5])
def test_interpolate_matches_reference(bs, alpha_logit):
    """The round-2 parity bug lived here: torch.diag(M) extracts the
    diagonal VECTOR (broadcast), not a diagonal matrix (VMI.py:244-249)."""
    s = _scores(bs, seed=30 + bs)
    b = _baseline(bs, seed=30 + bs)
    ref_val = float(ref_vmi.interp_lower_bound(_t(s), _t(b), alpha_logit))
    our_val = float(
        bounds.interp_lower_bound(jnp.asarray(s), jnp.asarray(b), alpha_logit)
    )
    assert abs(ref_val - our_val) <= ATOL, (bs, alpha_logit, ref_val, our_val)


@pytest.mark.parametrize("bs", BATCH_SIZES)
def test_loomean_and_log_interpolate_match_reference(bs):
    s = _scores(bs, seed=40 + bs)
    ref_loo = ref_vmi.compute_log_loomean(_t(s)).numpy()
    our_loo = np.asarray(bounds.compute_log_loomean(jnp.asarray(s)))
    np.testing.assert_allclose(ref_loo, our_loo, atol=ATOL)

    b = np.tile(_baseline(bs, seed=bs), (1, bs)).astype(np.float32)
    ref_li = ref_vmi.log_interpolate(_t(s), _t(b), 0.3).numpy()
    our_li = np.asarray(bounds.log_interpolate(jnp.asarray(s), jnp.asarray(b), 0.3))
    np.testing.assert_allclose(ref_li, our_li, atol=ATOL)


@pytest.mark.parametrize("bs", BATCH_SIZES)
def test_helper_functions_match_reference(bs):
    s = _scores(bs, seed=50 + bs)
    assert abs(float(ref_vmi.logmeanexp_diag(_t(s)))
               - float(bounds.logmeanexp_diag(jnp.asarray(s)))) <= ATOL
    assert abs(float(ref_vmi.logmeanexp_nodiag(_t(s)))
               - float(bounds.logmeanexp_nodiag(jnp.asarray(s)))) <= ATOL
    np.testing.assert_allclose(
        ref_vmi.exp_nodiag(_t(s)).numpy(),
        np.asarray(bounds.exp_nodiag(jnp.asarray(s))),
        atol=ATOL,
    )
