"""ctypes binding for the native multi-threaded k-way result merger
(reference: result_merger.cpp:79-148)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ggnn_tpu.native.build import load

__all__ = ["available", "merge_topk_partials"]


def available() -> bool:
    return load() is not None


def merge_topk_partials(
    ids: np.ndarray,
    dists: np.ndarray,
    k_out: int,
    id_offset_scale: int = 0,
    num_threads: int | None = None,
):
    """Merge per-partition sorted results.

    Args:
      ids: [num_parts, num_queries, stride] int32, rows sorted by distance.
      dists: same shape, f32.
      k_out: results per query.
      id_offset_scale: per-partition id offset (partition * scale added to
        ids); 0 if ids are already global.

    Returns (out_ids [Q, k_out] int32, out_dists [Q, k_out] f32).
    """
    lib = load()
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    dists = np.ascontiguousarray(dists, dtype=np.float32)
    num_parts, num_queries, stride = ids.shape
    out_ids = np.empty((num_queries, k_out), np.int32)
    out_dists = np.empty((num_queries, k_out), np.float32)
    if num_threads is None:
        num_threads = min(os.cpu_count() or 1, 16)
    lib.ggnn_merge_topk(
        ids.ctypes.data_as(ctypes.c_void_p),
        dists.ctypes.data_as(ctypes.c_void_p),
        num_parts,
        num_queries,
        stride,
        k_out,
        id_offset_scale,
        out_ids.ctypes.data_as(ctypes.c_void_p),
        out_dists.ctypes.data_as(ctypes.c_void_p),
        num_threads,
    )
    return out_ids, out_dists
