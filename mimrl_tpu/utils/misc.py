"""Small host-side helpers (numpy only, no device code)."""

from __future__ import annotations

import numpy as np


def topk_np(matrix: np.ndarray, k: int, axis: int = 1):
    """Numpy top-k along an axis, returning (values, indices) sorted
    descending — same contract as the reference's helper
    (ref: Utils.py:321-336), expressed via take_along_axis."""
    part = np.argpartition(matrix, -k, axis=axis)
    unordered_idx = np.take(part, np.arange(part.shape[axis] - k,
                                            part.shape[axis]), axis=axis)
    unordered_val = np.take_along_axis(matrix, unordered_idx, axis=axis)
    order = np.flip(np.argsort(unordered_val, axis=axis), axis=axis)
    values = np.take_along_axis(unordered_val, order, axis=axis)
    indices = np.take_along_axis(unordered_idx, order, axis=axis)
    return values, indices


def whether_type_str(data) -> bool:
    """True when `data` is a (numpy or python) string (ref: Utils.py:251-252)."""
    return "str" in str(type(data))


def get_predictions_tensor(predictions):
    """Argmax class indices from logits (ref: Utils.py:255-257)."""
    return np.argmax(np.asarray(predictions), axis=-1)
