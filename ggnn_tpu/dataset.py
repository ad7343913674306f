"""Datasets and binary vector-file IO.

TPU-native equivalent of the reference's `GenericDataset`/`Dataset<T>`
(include/ggnn/base/dataset.cuh:38-166, src/ggnn/base/dataset.cu:118-233).
Host-side data is NumPy; device residency is handled by the orchestrator via
`jax.device_put` (there is no CUDA-style pinned/managed zoo to replicate --
XLA owns HBM).

Supported on-disk formats:
  * ``.fvecs`` / ``.bvecs`` / ``.ivecs``  (TEXMEX: per-row int32 dim header)
  * ``.hdf5`` / ``.h5``  (ANN-benchmarks layout: train/test/neighbors/distances)

The fvecs family readers use the native C++ loader (ggnn_tpu/native) when it
is available and fall back to a NumPy implementation otherwise.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

__all__ = [
    "Dataset",
    "load_fvecs",
    "load_bvecs",
    "load_ivecs",
    "store_fvecs",
    "store_bvecs",
    "store_ivecs",
    "load_vecs",
    "store_vecs",
    "load_hdf5_dataset",
]

_VECS_DTYPES = {
    ".fvecs": np.float32,
    ".bvecs": np.uint8,
    ".ivecs": np.int32,
}


def _native_io():
    """Return the native IO module if the C++ extension is built."""
    try:
        from ggnn_tpu.native import io as native_io  # noqa: PLC0415

        return native_io if native_io.available() else None
    except Exception:
        return None


def load_vecs(
    path: str | os.PathLike,
    from_row: int = 0,
    num: int | None = None,
) -> np.ndarray:
    """Load a TEXMEX ``.{f,b,i}vecs`` file as an ``[N, D]`` array.

    Mirrors the reference's blocked binary loader
    (src/ggnn/base/dataset.cu:118-202) including the ``from``/``num`` subset
    arguments exposed through the bindings (nanobind.cu:163-164).
    """
    path = Path(path)
    dtype = _VECS_DTYPES.get(path.suffix)
    if dtype is None:
        raise ValueError(f"unsupported vector file extension: {path.suffix}")

    native = _native_io()
    if native is not None:
        return native.load_vecs(str(path), dtype, from_row, num)

    itemsize = np.dtype(dtype).itemsize
    file_size = path.stat().st_size
    with open(path, "rb") as f:
        dim_header = np.fromfile(f, dtype=np.int32, count=1)
        if dim_header.size != 1:
            raise ValueError(f"{path}: cannot read dimension header")
        D = int(dim_header[0])
        if D <= 0:
            raise ValueError(f"{path}: invalid dimension {D}")
    row_bytes = 4 + D * itemsize
    if file_size % row_bytes:
        raise ValueError(
            f"{path}: file size {file_size} is not a multiple of row size {row_bytes}"
        )
    n_total = file_size // row_bytes
    if from_row >= n_total:
        raise ValueError(f"{path}: from={from_row} beyond {n_total} rows")
    n = n_total - from_row if num is None else min(num, n_total - from_row)

    # memory-map, strip the per-row dim headers
    raw = np.memmap(path, dtype=np.uint8, mode="r")
    raw = raw[from_row * row_bytes : (from_row + n) * row_bytes].reshape(n, row_bytes)
    # validate a few headers
    hdr = raw[: min(n, 4), :4].copy().view(np.int32).ravel()
    if not np.all(hdr == D):
        raise ValueError(f"{path}: inconsistent row dimension headers")
    data = np.ascontiguousarray(raw[:, 4:]).view(dtype).reshape(n, D)
    return data


def store_vecs(path: str | os.PathLike, data: np.ndarray) -> None:
    """Store an ``[N, D]`` array in TEXMEX format (dataset.cu:223-233)."""
    path = Path(path)
    dtype = _VECS_DTYPES.get(path.suffix)
    if dtype is None:
        raise ValueError(f"unsupported vector file extension: {path.suffix}")
    data = np.ascontiguousarray(data, dtype=dtype)
    if data.ndim != 2:
        raise ValueError("expected a 2-D array")
    n, d = data.shape
    hdr = np.full((n, 1), d, dtype=np.int32)
    with open(path, "wb") as f:
        out = np.concatenate([hdr.view(np.uint8).reshape(n, 4),
                              data.view(np.uint8).reshape(n, -1)], axis=1)
        out.tofile(f)


def load_fvecs(path, from_row: int = 0, num: int | None = None) -> np.ndarray:
    return load_vecs(path, from_row, num)


def load_bvecs(path, from_row: int = 0, num: int | None = None) -> np.ndarray:
    return load_vecs(path, from_row, num)


def load_ivecs(path, from_row: int = 0, num: int | None = None) -> np.ndarray:
    return load_vecs(path, from_row, num)


def store_fvecs(path, data) -> None:
    store_vecs(path, np.asarray(data, dtype=np.float32))


def store_bvecs(path, data) -> None:
    store_vecs(path, np.asarray(data, dtype=np.uint8))


def store_ivecs(path, data) -> None:
    store_vecs(path, np.asarray(data, dtype=np.int32))


def load_hdf5_dataset(path: str | os.PathLike) -> dict:
    """Load an ANN-benchmarks HDF5 file (train/test/neighbors/distances)."""
    import h5py  # noqa: PLC0415

    out = {}
    with h5py.File(path, "r") as f:
        for key in ("train", "test", "neighbors", "distances"):
            if key in f:
                out[key] = np.asarray(f[key])
        if "distance" in f.attrs:
            out["distance"] = (
                f.attrs["distance"].decode()
                if isinstance(f.attrs["distance"], bytes)
                else str(f.attrs["distance"])
            )
    return out


class Dataset:
    """A host-resident 2-D dataset (base / query / ground-truth ids).

    Python-facing equivalent of the reference's ``Dataset<T>``
    (nanobind.cu:157-182): construct from any array-like, ``load``/``store``
    TEXMEX files, expose ``N``/``D``. float32, uint8 and int32 payloads are
    supported (ValueT/BaseT/KeyT of the reference).
    """

    __slots__ = ("data",)

    def __init__(self, data):
        arr = np.asarray(data)
        if arr.ndim == 1:
            arr = arr[None, :]
        if arr.ndim != 2:
            raise ValueError("Dataset expects a 2-D array")
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        if arr.dtype == np.int64:
            arr = arr.astype(np.int32)
        if arr.dtype not in (np.float32, np.uint8, np.int32):
            raise ValueError(f"unsupported dtype {arr.dtype}")
        self.data = np.ascontiguousarray(arr)

    @classmethod
    def load(cls, path, from_row: int = 0, num: int | None = None) -> "Dataset":
        return cls(load_vecs(path, from_row, num))

    def store(self, path) -> None:
        store_vecs(path, self.data)

    @property
    def N(self) -> int:
        return self.data.shape[0]

    @property
    def D(self) -> int:
        return self.data.shape[1]

    def numel(self) -> int:
        return self.data.size

    def clone(self) -> np.ndarray:
        return self.data.copy()

    @property
    def view(self) -> np.ndarray:
        return self.data

    @property
    def device(self) -> str:
        return "cpu"

    def __array__(self, dtype=None, copy=None):
        if dtype is not None:
            return self.data.astype(dtype)
        return self.data

    def __len__(self) -> int:
        return self.N

    def __repr__(self) -> str:
        return f"Dataset(N={self.N}, D={self.D}, dtype={self.data.dtype})"


# Aliases matching the reference's Python class names (nanobind.cu:110-129).
def FloatDataset(data=None, **kw):
    return Dataset(np.asarray(data, dtype=np.float32), **kw)


def UCharDataset(data=None, **kw):
    return Dataset(np.asarray(data, dtype=np.uint8), **kw)


def IntDataset(data=None, **kw):
    return Dataset(np.asarray(data, dtype=np.int32), **kw)


FloatDataset.load = lambda path, from_row=0, num=None: Dataset.load(path, from_row, num)
UCharDataset.load = lambda path, from_row=0, num=None: Dataset.load(path, from_row, num)
IntDataset.load = lambda path, from_row=0, num=None: Dataset.load(path, from_row, num)
