"""Evaluator metric tests (reference semantics: eval.cpp:135-242)."""

import numpy as np

from ggnn_tpu.config import DistanceMeasure
from ggnn_tpu.evaluator import Evaluator


def test_perfect_results(rng):
    base = rng.normal(size=(50, 8)).astype(np.float32)
    query = rng.normal(size=(7, 8)).astype(np.float32)
    d = ((query[:, None] - base[None]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :20].astype(np.int32)
    ev = Evaluator(base, query, gt, k_query=5)
    res = ev.evaluate_results(gt[:, :5])
    assert res.c1 == 1.0
    assert res.cKQuery == 1.0
    assert res.rKQuery == 1.0
    assert res.c1_dup == 1.0


def test_partial_results():
    base = np.arange(40, dtype=np.float32).reshape(10, 4)
    query = base[:3].copy()
    gt = np.array([[0, 1, 2], [1, 0, 2], [2, 1, 3]], dtype=np.int32)
    ev = Evaluator(base, query, gt, k_query=2)
    # query 0: perfect; query 1: top1 wrong; query 2: second slot wrong
    results = np.array([[0, 1], [0, 1], [2, 9]], dtype=np.int32)
    res = ev.evaluate_results(results)
    assert np.isclose(res.c1, 2 / 3)  # queries 0 and 2 have correct top-1
    assert np.isclose(res.rKQuery, 3 / 3)  # gt top-1 found in rows 0,1,2
    # c@2: row0 2 hits, row1 2 hits (0 and 1 both in gt top-2), row2 1 hit
    assert np.isclose(res.cKQuery, 5 / 6)


def test_duplicate_awareness():
    # base points 0 and 1 are identical -> tie at top-1
    base = np.array([[0.0, 0.0], [0.0, 0.0], [3.0, 0.0], [9.0, 0.0]], np.float32)
    query = np.array([[0.0, 0.0]], np.float32)
    gt = np.array([[0, 1, 2, 3]], dtype=np.int32)
    ev = Evaluator(base, query, gt, k_query=2)
    assert ev.top1_duplicate_end[0] == 2  # ids 0 and 1 tie
    res = ev.evaluate_results(np.array([[1, 2]], dtype=np.int32))
    assert res.c1 == 0.0  # strict: top-1 id differs
    assert res.c1_dup == 1.0  # duplicate-aware: 1 ties with 0


def test_no_duplicate_info_without_base():
    gt = np.array([[0, 1, 2, 3]], dtype=np.int32)
    ev = Evaluator(gt=gt, k_query=2)
    res = ev.evaluate_results(np.array([[0, 1]], dtype=np.int32))
    assert res.c1 == 1.0
    assert np.isnan(res.c1_dup)


def test_cosine_duplicates_no_reference_bug():
    # two colinear vectors of different length: cosine distance 0 (a tie),
    # the reference's buggy b_norm would miss this
    base = np.array([[1.0, 0.0], [2.0, 0.0], [0.0, 1.0]], np.float32)
    query = np.array([[1.0, 0.0]], np.float32)
    gt = np.array([[0, 1, 2]], dtype=np.int32)
    ev = Evaluator(base, query, gt, k_query=1, measure=DistanceMeasure.Cosine)
    assert ev.top1_duplicate_end[0] == 2
