"""Two-phase (converged-row compaction) query equivalence tests."""

import numpy as np
import jax
import jax.numpy as jnp

from ggnn_tpu import GGNN
from ggnn_tpu.query.ann import _plan_chunks, ann_query


def test_plan_chunks():
    assert _plan_chunks(100, 8192) == 100
    assert _plan_chunks(256, 8192) == 256
    assert _plan_chunks(8192, 8192) == 8192
    assert _plan_chunks(10000, 8192) == 5120  # 2 x 5120 instead of 2 x 8192
    assert _plan_chunks(16384, 8192) == 8192
    # chunks always cover Q
    for q in (300, 1000, 5000, 12345, 100000):
        c = _plan_chunks(q, 8192)
        assert c * (-(-q // c)) >= q


def test_two_phase_matches_single_phase():
    """Splitting the pop budget into resume phases must not change results:
    the pop sequence is identical, only the batching differs."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(1024, 16)).astype(np.float32)
    query = rng.normal(size=(2048, 16)).astype(np.float32)

    g = GGNN()
    g.set_base(base)
    g.build(k_build=8, tau_build=0.5, refinement_iterations=0)
    sh = g._shards[0]
    sh.ensure_base()
    sh.ensure_graph()
    qd = jnp.asarray(query)

    kw = dict(base_sq=sh.base_sq, pops_per_iter=4, fetch_cap_fraction=0.75)
    ids_a, d_a = ann_query(
        qd, sh.base_dev, sh.graph, g._cfg, 5, 0.7, 64, two_phase=False, **kw
    )
    ids_b, d_b = ann_query(
        qd, sh.base_dev, sh.graph, g._cfg, 5, 0.7, 64, two_phase=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), rtol=1e-6)
