"""Dataset and TEXMEX/HDF5 IO tests (reference: dataset.cu:118-233)."""

import numpy as np
import pytest

from ggnn_tpu.dataset import Dataset, load_vecs, store_vecs


@pytest.mark.parametrize(
    "suffix,dtype",
    [(".fvecs", np.float32), (".bvecs", np.uint8), (".ivecs", np.int32)],
)
def test_vecs_roundtrip(tmp_path, rng, suffix, dtype):
    if dtype == np.uint8:
        data = rng.integers(0, 255, (37, 19)).astype(dtype)
    elif dtype == np.int32:
        data = rng.integers(0, 10_000, (37, 19)).astype(dtype)
    else:
        data = rng.normal(size=(37, 19)).astype(dtype)
    path = tmp_path / f"test{suffix}"
    store_vecs(path, data)
    # raw layout check: per-row int32 dim header (TEXMEX)
    raw = np.fromfile(path, dtype=np.uint8)
    assert raw.size == 37 * (4 + 19 * data.itemsize)
    assert raw[:4].view(np.int32)[0] == 19

    out = load_vecs(path)
    np.testing.assert_array_equal(out, data)


def test_vecs_subset(tmp_path, rng):
    data = rng.normal(size=(20, 5)).astype(np.float32)
    path = tmp_path / "x.fvecs"
    store_vecs(path, data)
    np.testing.assert_array_equal(load_vecs(path, from_row=3, num=4), data[3:7])
    np.testing.assert_array_equal(load_vecs(path, from_row=18), data[18:])


def test_dataset_wrapper(rng):
    d = Dataset(rng.normal(size=(10, 4)))
    assert d.N == 10 and d.D == 4
    assert d.data.dtype == np.float32
    assert d.numel() == 40
    assert np.asarray(d).shape == (10, 4)


def test_dataset_load_store(tmp_path, rng):
    data = rng.integers(0, 255, (8, 6)).astype(np.uint8)
    d = Dataset(data)
    d.store(tmp_path / "d.bvecs")
    d2 = Dataset.load(tmp_path / "d.bvecs")
    np.testing.assert_array_equal(d2.data, data)


def test_hdf5_loader(tmp_path, rng):
    h5py = pytest.importorskip("h5py")
    from ggnn_tpu.dataset import load_hdf5_dataset

    path = tmp_path / "ann.hdf5"
    with h5py.File(path, "w") as f:
        f["train"] = rng.normal(size=(10, 3)).astype(np.float32)
        f["test"] = rng.normal(size=(4, 3)).astype(np.float32)
        f["neighbors"] = rng.integers(0, 10, (4, 5)).astype(np.int32)
    out = load_hdf5_dataset(path)
    assert out["train"].shape == (10, 3)
    assert out["neighbors"].shape == (4, 5)
