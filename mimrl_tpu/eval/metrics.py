"""Evaluation metrics (host-side numpy/sklearn; eval only, never in the
compiled path).

Reproduces the reference metric battery exactly:
- `calc_metrics` for MOSI/MOSEI (ref: Utils.py:118-175): MAE, Pearson
  corr, clipped Acc-7/Acc-5, Acc-2 + weighted F1 in both pos/neg
  (zero labels excluded) and non-neg/neg conventions.
- `calc_metrics_pom` (ref: Utils.py:178-223).
- dataset-routed scoring (ref: Solver.py:344-423) incl. the r2c-bucketed
  local variants and AVEC's CCC + RMSE on 25x-rescaled scores.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np
from sklearn.metrics import accuracy_score, f1_score, mean_absolute_error

from mimrl_tpu.data.local import r2c_2, r2c_7
from mimrl_tpu.data.sdk import mosi_r2c_7, pom_r2c_7


def multiclass_acc(preds, truths) -> float:
    """(ref: Utils.py:100-101)"""
    return float(np.sum(np.round(preds) == np.round(truths)) / len(truths))


def ccc_score(x, y) -> float:
    """Concordance correlation coefficient (ref: Utils.py:37-49)."""
    x, y = np.reshape(x, -1), np.reshape(y, -1)
    x_mean, y_mean = np.nanmean(x), np.nanmean(y)
    covariance = np.nanmean((x - x_mean) * (y - y_mean))
    x_var = np.nanmean((x - x_mean) ** 2)
    y_var = np.nanmean((y - y_mean) ** 2)
    return float(2 * covariance / (x_var + y_var + (x_mean - y_mean) ** 2))


def rmse_score(output, target) -> float:
    """(ref: Utils.py:278-279)"""
    return float(np.sqrt(np.mean((np.asarray(output) - np.asarray(target)) ** 2)))


def calc_metrics(y_true, y_pred, to_print: bool = False) -> Dict[str, float]:
    """MOSI/MOSEI metric battery (ref: Utils.py:118-175)."""
    test_truth = np.reshape(np.asarray(y_true), -1)
    test_preds = np.reshape(np.asarray(y_pred), -1)

    non_zeros = np.array([i for i, e in enumerate(test_truth) if e != 0],
                         dtype=np.int64)

    test_preds_a7 = np.clip(test_preds, -3.0, 3.0)
    test_truth_a7 = np.clip(test_truth, -3.0, 3.0)
    test_preds_a5 = np.clip(test_preds, -2.0, 2.0)
    test_truth_a5 = np.clip(test_truth, -2.0, 2.0)

    mae = float(np.mean(np.absolute(test_preds - test_truth)))
    corr = float(np.corrcoef(test_preds, test_truth)[0][1])
    mult_a7 = multiclass_acc(test_preds_a7, test_truth_a7)
    mult_a5 = multiclass_acc(test_preds_a5, test_truth_a5)

    binary_truth_pn = test_truth[non_zeros] > 0
    binary_preds_pn = test_preds[non_zeros] > 0
    acc2_pos_neg = float(accuracy_score(binary_truth_pn, binary_preds_pn))
    f1_pos_neg = float(f1_score(binary_truth_pn, binary_preds_pn,
                                average="weighted"))

    binary_truth_nn = test_truth >= 0
    binary_preds_nn = test_preds >= 0
    acc2_nonneg_neg = float(accuracy_score(binary_truth_nn, binary_preds_nn))
    f1_nonneg_neg = float(f1_score(binary_truth_nn, binary_preds_nn,
                                   average="weighted"))

    result = {
        "mae": mae,
        "corr": corr,
        "7-class_acc": mult_a7,
        "5-class_acc": mult_a5,
        "2(pos/neg)-class_acc": acc2_pos_neg,
        "2(nneg/neg)-class_acc": acc2_nonneg_neg,
        "2(pos/neg)-class_f1": f1_pos_neg,
        "2(nneg/neg)-class_f1": f1_nonneg_neg,
    }
    if to_print:
        for k, v in result.items():
            logging.debug("%s: %s", k, v)
        # debug classification reports (ref: Utils.py:152-154,163-165)
        from sklearn.metrics import classification_report

        logging.debug("Classification Report (pos/neg): ")
        logging.debug(classification_report(binary_truth_pn,
                                            binary_preds_pn, digits=5))
        logging.debug("Classification Report (non-neg/neg): ")
        logging.debug(classification_report(binary_truth_nn,
                                            binary_preds_nn, digits=5))
    return result


def calc_metrics_pom(y_true, y_pred, to_print: bool = False) -> Dict[str, float]:
    """POM metric battery (ref: Utils.py:178-223)."""
    test_truth = np.reshape(np.asarray(y_true), -1)
    test_preds = np.reshape(np.asarray(y_pred), -1)
    non_zeros = np.array([i for i, e in enumerate(test_truth) if e != 0],
                         dtype=np.int64)

    mae = float(np.mean(np.absolute(test_preds - test_truth)))
    corr = float(np.corrcoef(test_preds, test_truth)[0][1])

    binary_truth = test_truth[non_zeros] > 0
    binary_preds = test_preds[non_zeros] > 0
    acc2_pos_neg = float(accuracy_score(binary_truth, binary_preds))
    f1_pos_neg = float(f1_score(binary_truth, binary_preds,
                                average="weighted"))

    binary_truth = test_truth >= 0
    binary_preds = test_preds >= 0
    acc2_nonneg_neg = float(accuracy_score(binary_truth, binary_preds))
    f1_nonneg_neg = float(f1_score(binary_truth, binary_preds,
                                   average="weighted"))

    result = {
        "mae": mae,
        "corr": corr,
        "2(pos/neg)-class_acc": acc2_pos_neg,
        "2(nneg/neg)-class_acc": acc2_nonneg_neg,
        "2(pos/neg)-class_f1": f1_pos_neg,
        "2(nneg/neg)-class_f1": f1_nonneg_neg,
    }
    if to_print:
        for k, v in result.items():
            logging.debug("%s: %s", k, v)
    return result


def get_score_from_result(predictions: np.ndarray, targets: np.ndarray,
                          dataset: str, task: str,
                          num_class: int) -> Dict[str, float]:
    """Per-dataset score routing (ref: Solver.py:344-423)."""
    predictions = np.asarray(predictions)
    targets = np.asarray(targets)

    if task == "classification":
        if num_class == 1:
            preds_c = np.int64(predictions.reshape(-1) > 0)
        else:
            preds_c = np.argmax(predictions.reshape(-1, num_class), axis=1)
        preds_c, targets_c = preds_c.reshape(-1), targets.reshape(-1)
        return {
            f"{num_class}-class_acc": float(accuracy_score(targets_c, preds_c)),
            f"{num_class}-f1": float(
                f1_score(targets_c, preds_c, average="weighted")),
        }

    assert task == "regression"
    preds, targs = predictions.reshape(-1), targets.reshape(-1)
    mae = float(mean_absolute_error(targs, preds))
    corr = float(np.corrcoef(preds, targs)[0][1])

    if dataset in ("mosi_20", "mosi_50", "mosei_20", "mosei_50"):
        bucket7 = mosi_r2c_7 if "mosi" in dataset else r2c_7
        p7 = [bucket7(p) for p in preds]
        t7 = [bucket7(p) for p in targs]
        p2 = [r2c_2(p) for p in preds]
        t2 = [r2c_2(p) for p in targs]
        return {
            "mae": mae,
            "corr": corr,
            "7-class_acc": float(accuracy_score(t7, p7)),
            "2-class_acc": float(accuracy_score(t2, p2)),
            "7-f1": float(f1_score(t7, p7, average="weighted")),
            "2-f1": float(f1_score(t2, p2, average="weighted")),
        }
    if dataset in ("mosi_SDK", "mosei_SDK", "mosi_Dec", "mosei_Dec"):
        return calc_metrics(targs, preds, to_print=False)
    if dataset == "pom_SDK":
        return calc_metrics_pom(targs, preds, to_print=False)
    if dataset == "pom":
        p7 = [pom_r2c_7(p) for p in preds]
        t7 = [pom_r2c_7(p) for p in targs]
        return {
            "mae": mae,
            "corr": corr,
            "7-class_acc": float(accuracy_score(t7, p7)),
            "7-f1": float(f1_score(t7, p7, average="weighted")),
        }
    if dataset in ("mmmo", "mmmov2"):
        p2 = [int(p >= 3.5) for p in preds]
        t2 = [int(p >= 3.5) for p in targs]
        return {
            "mae": mae,
            "corr": corr,
            "2-class_acc": float(accuracy_score(t2, p2)),
            "2-f1": float(f1_score(t2, p2, average="weighted")),
        }
    if dataset in ("youtube", "youtubev2", "moud", "iemocap_20"):
        return {"mae": mae, "corr": corr}
    if dataset == "avec2019":
        return {
            "mae": mae,
            "ccc": ccc_score(preds, targs),
            "rmse": rmse_score(preds * 25, targs * 25),
        }
    raise NotImplementedError(dataset)


def current_result_better(best_score, current_score, task: str,
                          num_class: int, dataset: str) -> bool:
    """Model-selection rule (ref: Solver.py:425-436)."""
    if best_score is None:
        return True
    if task == "classification":
        key = f"{num_class}-class_acc"
        return current_score[key] > best_score[key]
    if dataset != "avec2019":
        return current_score["mae"] < best_score["mae"]
    return current_score["ccc"] > best_score["ccc"]


def get_seperate_acc(labels, predictions, num_class: int) -> str:
    """Per-class accuracy string (ref: Utils.py:104-114; [sic] name)."""
    alls = [0] * num_class
    corrects = [0] * num_class
    for label, prediction in zip(labels, predictions):
        alls[int(label)] += 1
        if label == prediction:
            corrects[int(label)] += 1
    accs = [
        "{0:5.1f}%".format(100 * corrects[i] / alls[i]) if alls[i] else "  n/a"
        for i in range(num_class)
    ]
    return ",".join(accs)
