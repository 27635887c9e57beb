"""Small host-side helpers (numpy only, no device code)."""

from __future__ import annotations

import numpy as np


def topk_np(matrix: np.ndarray, k: int, axis: int = 1):
    """Numpy top-k along an axis, returning (values, indices) sorted
    descending (ref: Utils.py:321-336)."""
    if axis == 0:
        row_index = np.arange(matrix.shape[1])
        topk_index = np.argpartition(-matrix, k, axis=axis)[0:k, :]
        topk_data = matrix[topk_index, row_index]
        sort_idx = np.argsort(-topk_data, axis=axis)
        topk_data_sort = topk_data[sort_idx, row_index]
        topk_index_sort = topk_index[0:k, :][sort_idx, row_index]
    else:
        column_index = np.arange(matrix.shape[0])[:, None]
        topk_index = np.argpartition(-matrix, k, axis=axis)[:, 0:k]
        topk_data = matrix[column_index, topk_index]
        sort_idx = np.argsort(-topk_data, axis=axis)
        topk_data_sort = topk_data[column_index, sort_idx]
        topk_index_sort = topk_index[:, 0:k][column_index, sort_idx]
    return topk_data_sort, topk_index_sort


def whether_type_str(data) -> bool:
    """True when `data` is a (numpy or python) string (ref: Utils.py:251-252)."""
    return "str" in str(type(data))


def get_predictions_tensor(predictions):
    """Argmax class indices from logits (ref: Utils.py:255-257)."""
    return np.argmax(np.asarray(predictions), axis=-1)
