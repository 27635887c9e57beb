"""Weight-exact numeric parity against the ACTUAL reference torch code:
forward 5-tuple, all stage-1/stage-2 MI losses with identical injected
kNN samples, and a short training trajectory (tools/ref_compare.py —
the executable second half of the BASELINE.md protocol)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.skipif(not os.path.exists(os.path.join(REF, "Model.py")),
                       reason="reference checkout not available"),
    pytest.mark.slow,  # builds a 768-hidden BERT pair; ~1-2 min on CPU
]

pytest.importorskip("torch")
pytest.importorskip("transformers")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def pair():
    from tools import ref_compare as rc
    ref, opt, ref_model, model, params = rc.build_pair()
    return rc, ref, opt, ref_model, model, params


def test_forward_five_tuple_matches_reference(pair):
    rc, ref, opt, ref_model, model, params = pair
    deltas = rc.compare_forward(ref_model, model, params, rc.make_inputs())
    assert max(deltas.values()) <= 2e-4, deltas


def test_all_stage_losses_match_reference(pair):
    rc, ref, opt, ref_model, model, params = pair
    bank = rc.make_bank()
    knn = rc.sample_knn_with_reference(ref, bank, seed=7)
    d = rc.compare_losses(ref, ref_model, model, params, rc.make_inputs(),
                          bank, knn)
    worst = max(max(v.values()) for v in d.values())
    assert worst <= 1e-3, d


def test_short_trajectory_tracks_reference(pair):
    rc, ref, opt, ref_model, model, params = pair
    bank = rc.make_bank()
    t = rc.compare_step_trajectory(ref, opt, ref_model, model, params,
                                   rc.make_inputs(), bank, n_steps=3)
    assert np.isfinite(t["ref_losses"]).all()
    # step 0 is pre-divergence (pure loss parity); later steps compound
    # optimizer round-off
    assert t["per_step_abs_delta"][0] <= 1e-3, t
    assert max(t["per_step_abs_delta"]) <= 2e-2, t
