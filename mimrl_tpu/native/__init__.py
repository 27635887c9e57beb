"""ctypes loader for the native host-pipeline library.

Builds `_native.so` from collate.cpp on first use (g++ is in the image;
pybind11 is not, so the ABI is plain C via ctypes). Every entry point has
a pure-Python/numpy fallback in the callers, so a missing compiler only
costs speed, never functionality.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

_log = logging.getLogger("mimrl")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "collate.cpp")
_LIB_PATH = os.path.join(_HERE, "_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=240,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        if not _build():
            _log.warning(
                "native collation library build failed (g++ %s); "
                "falling back to the pure-Python host pipeline", _SRC)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        _log.warning("native collation library failed to load (%s); "
                     "falling back to the pure-Python host pipeline", e)
        return None

    lib.pad_stack_f32.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.gather_f32.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.tokenizer_init.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.tokenizer_init.restype = ctypes.c_int32
    lib.tokenizer_encode_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.tokenizer_free.argtypes = []
    _lib = lib
    return _lib


# ----------------------------------------------------------------------- #
# High-level wrappers (None-safe: callers fall back when load() is None)
# ----------------------------------------------------------------------- #

def pad_stack(arrays, time_len: int) -> Optional[np.ndarray]:
    """Stack variable-length [len, d] float32 arrays -> [n, time_len, d]."""
    lib = load()
    if lib is None or not arrays:
        return None
    d = arrays[0].shape[1] if arrays[0].ndim == 2 else None
    if d is None:
        return None
    arrs = [np.ascontiguousarray(a, dtype=np.float32) for a in arrays]
    if any(a.ndim != 2 or a.shape[1] != d for a in arrs):
        return None
    n = len(arrs)
    out = np.empty((n, time_len, d), np.float32)
    src_ptrs = (ctypes.c_void_p * n)(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs])
    lens = (ctypes.c_int64 * n)(*[a.shape[0] for a in arrs])
    lib.pad_stack_f32(
        ctypes.cast(src_ptrs, ctypes.POINTER(ctypes.c_void_p)), lens, n,
        time_len, d, out.ctypes.data_as(ctypes.c_void_p))
    return out


def gather(src: np.ndarray, idx: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    n = len(idx)
    sample_elems = int(np.prod(src.shape[1:]))
    out = np.empty((n,) + src.shape[1:], np.float32)
    idx_arr = (ctypes.c_int64 * n)(*[int(i) for i in idx])
    lib.gather_f32(src.ctypes.data_as(ctypes.c_void_p), idx_arr, n,
                   sample_elems, out.ctypes.data_as(ctypes.c_void_p))
    return out


class NativeWordPiece:
    """Native WordPiece encoder with the same contract as
    `WordPieceTokenizer.batch_encode` (vocab.txt-backed only; the hash
    fallback stays in Python)."""

    def __init__(self, vocab_tokens, pad_id, unk_id, cls_id, sep_id,
                 lower=True):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        blob = "\n".join(vocab_tokens).encode("utf-8")
        self.vocab_size = lib.tokenizer_init(
            blob, len(blob), pad_id, unk_id, cls_id, sep_id, 1 if lower else 0)

    def batch_encode(self, texts, max_length: int):
        lib = self._lib
        joined = "".join(texts).encode("utf-8")
        offsets = np.zeros(len(texts) + 1, np.int64)
        pos = 0
        for i, t in enumerate(texts):
            pos += len(t.encode("utf-8"))
            offsets[i + 1] = pos
        n = len(texts)
        ids = np.empty((n, max_length), np.int32)
        types = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.int32)
        lib.tokenizer_encode_batch(
            joined, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, max_length,
            ids.ctypes.data_as(ctypes.c_void_p),
            types.ctypes.data_as(ctypes.c_void_p),
            mask.ctypes.data_as(ctypes.c_void_p))
        return ids, types, mask
