"""End-to-end build + query recall tests (the reference README smoke test,
README.md:83-125, shrunk for CPU CI)."""

import numpy as np
import pytest

from ggnn_tpu import GGNN, DistanceMeasure, Evaluator

N, D, KB = 1024, 16, 12
NQ = 64


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(123)
    base = rng.normal(size=(N, D)).astype(np.float32)
    query = rng.normal(size=(NQ, D)).astype(np.float32)
    return base, query


@pytest.fixture(scope="module")
def engine(data):
    base, _ = data
    g = GGNN()
    g.set_base(base)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=1)
    return g


def test_bf_query_matches_numpy(engine, data):
    base, query = data
    ids, dists = engine.bf_query(query, k_gt=10)
    d = ((query[:, None] - base[None]) ** 2).sum(-1)
    want = np.argsort(d, axis=1)[:, :10]
    assert (ids == want).mean() > 0.99


def test_query_recall(engine, data):
    base, query = data
    gt_ids, _ = engine.bf_query(query, k_gt=20)
    ids, dists = engine.query(query, k_query=10, tau_query=0.7, max_iterations=200)
    assert ids.shape == (NQ, 10)
    ev = Evaluator(base, query, gt_ids, k_query=10)
    res = ev.evaluate_results(ids)
    assert res.c1 >= 0.9, f"c@1 too low: {res}"
    assert res.cKQuery >= 0.85, f"c@10 too low: {res}"
    # distances must be consistent with returned ids
    d = ((query[:, None] - base[None]) ** 2).sum(-1)
    np.testing.assert_allclose(
        dists, np.take_along_axis(d, ids, axis=1), rtol=1e-3, atol=1e-3
    )


def test_query_results_sorted(engine, data):
    _, query = data
    ids, dists = engine.query(query, 10, tau_query=0.5, max_iterations=100)
    assert np.all(np.diff(dists, axis=1) >= 0)
    # no duplicate ids within a row
    for row in ids:
        assert len(np.unique(row)) == len(row)


def test_higher_tau_higher_recall(engine, data):
    base, query = data
    gt_ids, _ = engine.bf_query(query, k_gt=10)
    ev = Evaluator(base, query, gt_ids, k_query=10)
    r_low = ev.evaluate_results(
        engine.query(query, 10, tau_query=0.1, max_iterations=200).ids
    )
    r_high = ev.evaluate_results(
        engine.query(query, 10, tau_query=1.0, max_iterations=200).ids
    )
    assert r_high.cKQuery >= r_low.cKQuery


def test_cosine_end_to_end(data):
    base, query = data
    g = GGNN()
    g.set_base(base)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=1,
            measure=DistanceMeasure.Cosine)
    gt_ids, _ = g.bf_query(query, k_gt=10, measure=DistanceMeasure.Cosine)
    ids, _ = g.query(query, 10, tau_query=0.7, max_iterations=200,
                     measure=DistanceMeasure.Cosine)
    ev = Evaluator(base, query, gt_ids, k_query=10, measure=DistanceMeasure.Cosine)
    res = ev.evaluate_results(ids)
    assert res.c1 >= 0.85, f"cosine c@1 too low: {res}"


def test_uint8_end_to_end():
    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (N, D)).astype(np.uint8)
    query = rng.integers(0, 255, (32, D)).astype(np.uint8)
    g = GGNN()
    g.set_base(base)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=1)
    gt_ids, _ = g.bf_query(query, k_gt=10)
    ids, _ = g.query(query, 10, tau_query=0.7, max_iterations=200)
    ev = Evaluator(base, query, gt_ids, k_query=10)
    res = ev.evaluate_results(ids)
    assert res.c1 >= 0.85, f"uint8 c@1 too low: {res}"


def test_large_k_query_and_device_results(engine, data):
    g = engine
    _, query = data
    # KQuery larger than the default beam geometry exercises the widened beam
    ids, dists = g.query(query, k_query=100, tau_query=0.7, max_iterations=200)
    assert ids.shape == (NQ, 100)
    finite = np.isfinite(dists).all(axis=1)
    assert np.all(np.diff(dists[finite], axis=1) >= 0)
    # device-resident results
    g.set_return_results_on_device()
    try:
        ids_dev, dists_dev = g.query(query, 10, tau_query=0.7, max_iterations=100)
        assert hasattr(ids_dev, "devices")
    finally:
        g.set_return_results_on_device(False)


def test_query_async_matches_sync(engine, data):
    """query_async must return bit-identical results to query(); multiple
    in-flight futures pipeline the result D2H (gpu_instance.cu:688-712)."""
    _, query = data
    want_ids, want_dists = engine.query(query, 10, tau_query=0.7,
                                        max_iterations=100)
    futs = [
        engine.query_async(query, 10, tau_query=0.7, max_iterations=100)
        for _ in range(3)
    ]
    for fut in futs:
        ids, dists = fut.result()
        assert isinstance(ids, np.ndarray) and ids.dtype == np.int32
        np.testing.assert_array_equal(ids, want_ids)
        np.testing.assert_allclose(dists, want_dists, rtol=1e-6)
        # .result() is idempotent
        assert fut.result().ids is ids


def test_query_async_device_results(engine, data):
    _, query = data
    engine.set_return_results_on_device()
    try:
        res = engine.query_async(query, 10, tau_query=0.7,
                                 max_iterations=100).result()
        assert hasattr(res.ids, "devices")
    finally:
        engine.set_return_results_on_device(False)
