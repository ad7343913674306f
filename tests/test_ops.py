"""Unit tests for distance / top-k / brute-force primitives vs NumPy."""

import numpy as np
import jax.numpy as jnp
import pytest

from ggnn_tpu.config import DistanceMeasure
from ggnn_tpu.ops.bruteforce import bruteforce_knn
from ggnn_tpu.ops.distance import dist_block, dist_gathered, squared_norms
from ggnn_tpu.ops.topk import merge_topk, topk_smallest


def np_dists(q, c, measure):
    q = q.astype(np.float64)
    c = c.astype(np.float64)
    if measure == DistanceMeasure.Euclidean:
        return ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    dot = q @ c.T
    nq = (q * q).sum(-1)[:, None]
    nc = (c * c).sum(-1)[None, :]
    norm = nq * nc
    with np.errstate(invalid="ignore", divide="ignore"):
        d = np.abs(1.0 - dot / np.sqrt(norm))
    return np.where(norm > 0, d, 1.0)


@pytest.mark.parametrize("measure", [DistanceMeasure.Euclidean, DistanceMeasure.Cosine])
@pytest.mark.parametrize("dtype", [np.float32, np.uint8])
def test_dist_block_matches_numpy(rng, measure, dtype):
    if dtype == np.uint8:
        q = rng.integers(0, 255, (17, 33)).astype(dtype)
        c = rng.integers(0, 255, (29, 33)).astype(dtype)
    else:
        q = rng.normal(size=(17, 33)).astype(dtype)
        c = rng.normal(size=(29, 33)).astype(dtype)
    got = np.asarray(dist_block(jnp.asarray(q), jnp.asarray(c), measure))
    want = np_dists(q, c, measure)
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-4)


def test_dist_block_zero_norm_cosine():
    q = np.zeros((2, 8), np.float32)
    c = np.ones((3, 8), np.float32)
    d = np.asarray(dist_block(jnp.asarray(q), jnp.asarray(c), DistanceMeasure.Cosine))
    assert np.all(d == 1.0)


def test_dist_gathered_matches_block(rng):
    q = rng.normal(size=(5, 16)).astype(np.float32)
    cand = rng.normal(size=(5, 7, 16)).astype(np.float32)
    got = np.asarray(dist_gathered(jnp.asarray(q), jnp.asarray(cand)))
    for b in range(5):
        want = np_dists(q[b : b + 1], cand[b], DistanceMeasure.Euclidean)[0]
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_topk_smallest(rng):
    d = rng.normal(size=(4, 20)).astype(np.float32)
    i = np.arange(20, dtype=np.int32)[None].repeat(4, 0)
    td, ti = topk_smallest(jnp.asarray(d), jnp.asarray(i), 5)
    order = np.sort(d, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(td), order)
    np.testing.assert_array_equal(np.asarray(ti), np.argsort(d, axis=1)[:, :5])


def test_merge_topk(rng):
    da = rng.normal(size=(3, 6)).astype(np.float32)
    db = rng.normal(size=(3, 9)).astype(np.float32)
    ia = np.arange(6, dtype=np.int32)[None].repeat(3, 0)
    ib = (np.arange(9, dtype=np.int32) + 100)[None].repeat(3, 0)
    md, mi = merge_topk(jnp.asarray(da), jnp.asarray(ia), jnp.asarray(db), jnp.asarray(ib), 4)
    both = np.concatenate([da, db], axis=1)
    np.testing.assert_allclose(np.asarray(md), np.sort(both, axis=1)[:, :4])


@pytest.mark.parametrize("measure", [DistanceMeasure.Euclidean, DistanceMeasure.Cosine])
def test_bruteforce_vs_numpy(rng, measure):
    base = rng.normal(size=(700, 24)).astype(np.float32)
    query = rng.normal(size=(33, 24)).astype(np.float32)
    ids, dists = bruteforce_knn(
        jnp.asarray(base), jnp.asarray(query), 10, measure, tile_base=256
    )
    want_full = np_dists(query, base, measure)
    want_ids = np.argsort(want_full, axis=1)[:, :10]
    # compare distances (ids can differ on exact ties)
    np.testing.assert_allclose(
        np.asarray(dists),
        np.take_along_axis(want_full, want_ids, axis=1),
        rtol=1e-4,
        atol=1e-4,
    )
    match = (np.asarray(ids) == want_ids).mean()
    assert match > 0.99


def test_bruteforce_uint8(rng):
    base = rng.integers(0, 255, (300, 16)).astype(np.uint8)
    query = rng.integers(0, 255, (9, 16)).astype(np.uint8)
    ids, dists = bruteforce_knn(jnp.asarray(base), jnp.asarray(query), 5, tile_base=128)
    want = np_dists(query.astype(np.float32), base.astype(np.float32), DistanceMeasure.Euclidean)
    np.testing.assert_array_equal(np.asarray(ids), np.argsort(want, axis=1)[:, :5])


def test_squared_norms(rng):
    x = rng.normal(size=(11, 7)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(squared_norms(jnp.asarray(x))), (x * x).sum(-1), rtol=1e-5
    )

