"""Flagged-beam semantics tests (the batched SimpleKNNCache)."""

import numpy as np
import jax.numpy as jnp

from ggnn_tpu.ops.beam import (
    beam_compact_candidates,
    beam_dedup_mask,
    beam_init,
    beam_insert,
    beam_pop,
    beam_transform,
)


def insert(st, ids, d, **kw):
    ids = jnp.asarray(ids, jnp.int32)
    d = jnp.asarray(d, jnp.float32)
    ok = beam_dedup_mask(st, ids)
    ids = jnp.where(ok, ids, -1)
    crit = kw.pop("criteria", jnp.full((st.batch,), jnp.inf, jnp.float32))
    return beam_insert(st, ids, d, criteria=crit, **kw)


def test_insert_sorts_and_dedups():
    st = beam_init(2, 4, jnp.float32(10.0))
    ids = [[5, 7, 5, -1], [1, 2, 3, 4]]
    d = [[2.0, 1.0, 0.5, 0.0], [4.0, 3.0, 2.0, 1.0]]
    st = insert(st, ids, d)
    # row 0: duplicate 5 keeps first occurrence (dist 2.0); -1 dropped
    np.testing.assert_array_equal(np.asarray(st.i[0]), [7, 5, -1, -1])
    np.testing.assert_allclose(np.asarray(st.d[0]), [1.0, 2.0, np.inf, np.inf])
    np.testing.assert_array_equal(np.asarray(st.i[1]), [4, 3, 2, 1])


def test_insert_respects_criteria():
    st = beam_init(2, 4, jnp.float32(0.5))
    st = insert(st, [[1, 2, 3], [1, 2, 3]], [[1.0, 2.0, 3.0]] * 2)
    # k_best=3: worst = 3.0, criteria = 3.5 -> 4.0 rejected, 3.2 kept
    st = insert(st, [[4, 5], [4, 5]], [[4.0, 3.2]] * 2, criteria=st.criteria(3))
    assert 5 in np.asarray(st.i[0])
    assert 4 not in np.asarray(st.i[0])


def test_insert_dedups_against_expanded():
    st = beam_init(2, 4, jnp.float32(10.0))
    st = insert(st, [[1], [1]], [[1.0], [1.0]])
    anchors, active, st = beam_pop(st, 1, 2)
    np.testing.assert_array_equal(np.asarray(anchors), [[1], [1]])
    # 1 stays in the beam with its flag set; re-inserting is a no-op
    ok = beam_dedup_mask(st, jnp.asarray([[1], [1]], jnp.int32))
    assert not np.any(np.asarray(ok))
    # and it is never popped twice
    anchors, active, st = beam_pop(st, 1, 2)
    assert not np.any(np.asarray(active))


def test_pop_criteria_stops():
    st = beam_init(2, 4, jnp.float32(0.1))
    st = insert(st, [[1, 2, 3], [1, 2, 3]], [[1.0, 2.0, 3.0]] * 2)
    # k_best=3 -> criteria 3.1: pops 1, 2, 3 then runs dry
    for want in (1, 2, 3):
        a, act, st = beam_pop(st, 1, 3)
        assert np.all(np.asarray(act))
        np.testing.assert_array_equal(np.asarray(a), [[want]] * 2)
    a, act, st = beam_pop(st, 1, 3)
    assert not np.any(np.asarray(act))
    np.testing.assert_array_equal(np.asarray(a), [[-1], [-1]])


def test_pop_uses_criteria_bound():
    st = beam_init(2, 4, jnp.float32(0.0))
    st = insert(st, [[1, 2, 3, 4], [1, 2, 3, 4]],
                [[1.0, 1.1, 1.2, 9.0]] * 2)
    # k_best=3, xi=0 -> criteria = 1.2; entries 1.0 and 1.1 pop, 1.2 does not
    # (reference pop uses >=, simple_knn_cache.cuh:223)
    for _ in range(2):
        a, act, st = beam_pop(st, 1, 3)
        assert np.all(np.asarray(act))
    a, act, st = beam_pop(st, 1, 3)
    assert not np.any(np.asarray(act))


def test_pop_multi_prefix():
    st = beam_init(2, 6, jnp.float32(10.0))
    st = insert(st, [[1, 2, 3, 4], [5, 6, 7, 8]], [[1.0, 2.0, 3.0, 4.0]] * 2)
    anchors, active, st = beam_pop(st, 3, 4)
    np.testing.assert_array_equal(np.asarray(anchors), [[1, 2, 3], [5, 6, 7]])
    assert np.all(np.asarray(active))
    # next pop continues at the 4th entry
    anchors, active, st = beam_pop(st, 3, 4)
    np.testing.assert_array_equal(np.asarray(anchors[:, 0]), [4, 8])


def test_pop_multi_partial_prefix():
    st = beam_init(1, 6, jnp.float32(0.0))
    st = insert(st, [[1, 2, 3]], [[1.0, 1.5, 9.0]])
    # k_best=2, xi=0 -> criteria = 1.5: only entry 1 (1.0) passes
    anchors, active, st = beam_pop(st, 3, 2)
    np.testing.assert_array_equal(np.asarray(anchors), [[1, -1, -1]])
    # entry 2 is still unexpanded (it failed the criterion, not popped)
    assert not np.asarray(st.exp[0, 1])


def test_pop_multi_matches_sequential_pops():
    rng = np.random.default_rng(0)
    ids = rng.choice(100, size=(4, 8), replace=False).astype(np.int32)
    d = np.sort(rng.random((4, 8)), axis=1).astype(np.float32)

    st0 = beam_init(4, 12, jnp.float32(100.0))
    ok = beam_dedup_mask(st0, jnp.asarray(ids))
    st0 = beam_insert(st0, jnp.where(ok, jnp.asarray(ids), -1), jnp.asarray(d),
                      criteria=jnp.full((4,), jnp.inf, jnp.float32))
    anchors_multi, _, st_a = beam_pop(st0, 4, 8)
    st_b = st0
    seq = []
    for _ in range(4):
        a, _, st_b = beam_pop(st_b, 1, 8)
        seq.append(np.asarray(a)[:, 0])
    np.testing.assert_array_equal(np.asarray(anchors_multi), np.stack(seq, axis=1))
    np.testing.assert_array_equal(np.asarray(st_a.exp), np.asarray(st_b.exp))


def test_transform_remaps_and_resets_flags():
    st = beam_init(2, 4, jnp.float32(10.0))
    st = insert(st, [[0, 1], [2, 3]], [[1.0, 2.0], [1.0, 2.0]])
    a, act, st = beam_pop(st, 1, 2)  # flag set on head
    mapping = jnp.asarray([10, 11, 12, 13], jnp.int32)
    st = beam_transform(st, mapping, keep=3)
    np.testing.assert_array_equal(np.asarray(st.i[0]), [10, 11, -1, -1])
    np.testing.assert_array_equal(np.asarray(st.i[1]), [12, 13, -1, -1])
    # distances preserved for kept entries, all flags reset
    np.testing.assert_allclose(np.asarray(st.d[0, :2]), [1.0, 2.0])
    assert not np.any(np.asarray(st.exp))


def test_compact_candidates_packs_in_order():
    ids = jnp.asarray([[9, 8, 7, 6, 5], [1, 2, 3, 4, 5]], jnp.int32)
    ok = jnp.asarray([[False, True, False, True, True],
                      [True, False, False, False, True]])
    packed = beam_compact_candidates(ids, ok, 3)
    np.testing.assert_array_equal(np.asarray(packed), [[8, 6, 5], [1, 5, -1]])


def test_pop_evicts_expanded_beyond_prefix():
    st = beam_init(1, 6, jnp.float32(100.0))
    st = insert(st, [[1, 2, 3, 4, 5]], [[1.0, 2.0, 3.0, 4.0, 5.0]])
    # k_best=2: popping 3 anchors hits positions 0,1 (kept: result prefix)
    # and position 2 (evicted: the reference removes the popped queue copy)
    anchors, active, st = beam_pop(st, 3, 2)
    np.testing.assert_array_equal(np.asarray(anchors), [[1, 2, 3]])
    np.testing.assert_array_equal(np.asarray(st.i[0, :2]), [1, 2])
    assert 3 not in np.asarray(st.i[0])  # evicted from the beam...
    assert 3 in np.asarray(st.vis[0])  # ...but remembered for dedup
    ok = beam_dedup_mask(st, jnp.asarray([[3]], jnp.int32))
    assert not np.any(np.asarray(ok))
    # frontier capacity is freed: a new candidate can take the slot
    st = insert(st, [[6]], [[2.5]])
    assert 6 in np.asarray(st.i[0])
