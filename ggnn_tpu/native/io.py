"""ctypes bindings for the native TEXMEX readers/writer."""

from __future__ import annotations

import ctypes

import numpy as np

from ggnn_tpu.native.build import load

__all__ = ["available", "load_vecs", "store_vecs"]


def available() -> bool:
    return load() is not None


def load_vecs(path: str, dtype, from_row: int = 0, num=None) -> np.ndarray:
    lib = load()
    dtype = np.dtype(dtype)
    dim = ctypes.c_int64(0)
    total = lib.ggnn_vecs_info(path.encode(), dtype.itemsize, ctypes.byref(dim))
    if total < 0:
        raise ValueError(f"{path}: not a valid TEXMEX file")
    if from_row >= total:
        raise ValueError(f"{path}: from={from_row} beyond {total} rows")
    n = total - from_row if num is None else min(num, total - from_row)
    out = np.empty((n, dim.value), dtype=dtype)
    got = lib.ggnn_read_vecs(
        path.encode(), dtype.itemsize, from_row, n, out.ctypes.data_as(ctypes.c_void_p)
    )
    if got != n:
        raise IOError(f"{path}: read {got} of {n} rows")
    return out


def store_vecs(path: str, data: np.ndarray) -> None:
    lib = load()
    data = np.ascontiguousarray(data)
    n, d = data.shape
    got = lib.ggnn_write_vecs(
        path.encode(), data.ctypes.data_as(ctypes.c_void_p), n, d, data.itemsize
    )
    if got != n:
        raise IOError(f"{path}: wrote {got} of {n} rows")
