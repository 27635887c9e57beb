"""Metric battery: values vs an independent computation + routing."""

import numpy as np
import pytest

from mimrl_tpu.eval.metrics import (
    calc_metrics,
    calc_metrics_pom,
    ccc_score,
    current_result_better,
    get_score_from_result,
    multiclass_acc,
    rmse_score,
)


def test_calc_metrics_synthetic():
    """Mirror of the reference's metric self-test (ref: Utils.py:652-656)
    with actual assertions."""
    preds = np.array([0.1 * i for i in range(100)])
    labels = np.array([1 - 0.2 * i for i in range(100)])
    r = calc_metrics(labels, preds, to_print=False)
    assert set(r) == {
        "mae", "corr", "7-class_acc", "5-class_acc", "2(pos/neg)-class_acc",
        "2(nneg/neg)-class_acc", "2(pos/neg)-class_f1",
        "2(nneg/neg)-class_f1"}
    mae_ref = np.mean(np.abs(preds - labels))
    assert np.isclose(r["mae"], mae_ref)
    assert np.isclose(r["corr"], np.corrcoef(preds, labels)[0][1])
    assert -1 <= r["corr"] <= 1
    assert 0 <= r["7-class_acc"] <= 1


def test_calc_metrics_perfect_predictions():
    t = np.array([-2.0, -1.0, 0.5, 1.5, 2.5])
    r = calc_metrics(t, t.copy())
    assert r["mae"] == 0
    assert np.isclose(r["corr"], 1.0)
    assert r["7-class_acc"] == 1.0
    assert r["2(pos/neg)-class_acc"] == 1.0


def test_calc_metrics_excludes_zeros_for_posneg():
    t = np.array([0.0, 0.0, 1.0, -1.0])
    p = np.array([5.0, -5.0, 2.0, -2.0])  # zeros get wild predictions
    r = calc_metrics(t, p)
    assert r["2(pos/neg)-class_acc"] == 1.0  # zeros excluded
    assert r["2(nneg/neg)-class_acc"] == 0.75  # 0>=0 True vs -5>=0 False... 3/4


def test_ccc_and_rmse():
    x = np.array([1.0, 2.0, 3.0])
    assert np.isclose(ccc_score(x, x), 1.0)
    assert np.isclose(rmse_score(x, x + 1), 1.0)
    assert multiclass_acc(np.array([1.2, 2.1]), np.array([1.0, 2.0])) == 1.0


def test_pom_metrics():
    t = np.random.default_rng(0).normal(size=30)
    p = t + 0.1
    r = calc_metrics_pom(t, p)
    assert set(r) == {"mae", "corr", "2(pos/neg)-class_acc",
                      "2(nneg/neg)-class_acc", "2(pos/neg)-class_f1",
                      "2(nneg/neg)-class_f1"}


@pytest.mark.parametrize("dataset,expected_keys", [
    ("mosi_Dec", {"mae", "corr", "7-class_acc", "5-class_acc",
                  "2(pos/neg)-class_acc", "2(nneg/neg)-class_acc",
                  "2(pos/neg)-class_f1", "2(nneg/neg)-class_f1"}),
    ("mosi_20", {"mae", "corr", "7-class_acc", "2-class_acc", "7-f1",
                 "2-f1"}),
    ("pom", {"mae", "corr", "7-class_acc", "7-f1"}),
    ("mmmo", {"mae", "corr", "2-class_acc", "2-f1"}),
    ("avec2019", {"mae", "ccc", "rmse"}),
    ("youtube", {"mae", "corr"}),
])
def test_score_routing_regression(dataset, expected_keys):
    rng = np.random.default_rng(0)
    t = rng.normal(size=20) + 2 if dataset in ("pom", "mmmo") else rng.normal(size=20)
    p = t + rng.normal(size=20) * 0.1
    r = get_score_from_result(p, t, dataset, "regression", 1)
    assert set(r) == expected_keys


def test_score_routing_classification():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 7, 30)
    logits = rng.normal(size=(30, 7))
    logits[np.arange(30), t] += 10
    r = get_score_from_result(logits, t, "mosi_SDK", "classification", 7)
    assert r["7-class_acc"] == 1.0


def test_avec_rmse_25x_rescale():
    t = np.array([0.2, 0.4])
    p = np.array([0.3, 0.5])
    r = get_score_from_result(p, t, "avec2019", "regression", 1)
    assert np.isclose(r["rmse"], 2.5)  # 0.1 * 25


def test_current_result_better():
    assert current_result_better(None, {"mae": 1.0}, "regression", 1, "mosi_Dec")
    assert current_result_better({"mae": 1.0}, {"mae": 0.5}, "regression", 1,
                                 "mosi_Dec")
    assert not current_result_better({"mae": 0.5}, {"mae": 1.0}, "regression",
                                     1, "mosi_Dec")
    assert current_result_better({"ccc": 0.1}, {"ccc": 0.2}, "regression", 1,
                                 "avec2019")
    assert current_result_better({"2-class_acc": 0.5}, {"2-class_acc": 0.6},
                                 "classification", 2, "mosi_SDK")
