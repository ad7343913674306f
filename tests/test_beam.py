"""Beam-state semantics tests (the batched SimpleKNNCache)."""

import numpy as np
import jax.numpy as jnp

from ggnn_tpu.ops.beam import beam_init, beam_insert, beam_pop, beam_transform


def mk_state(xi=10.0):
    return beam_init(2, (3, 4, 4), jnp.float32(xi))


def test_insert_sorts_and_dedups():
    st = mk_state()
    ids = jnp.asarray([[5, 7, 5, -1], [1, 2, 3, 4]], jnp.int32)
    d = jnp.asarray([[2.0, 1.0, 0.5, 0.0], [4.0, 3.0, 2.0, 1.0]], jnp.float32)
    st = beam_insert(st, ids, d)
    # row 0: duplicate 5 keeps first occurrence (dist 2.0); -1 dropped
    np.testing.assert_array_equal(np.asarray(st.best_i[0]), [7, 5, -1])
    np.testing.assert_allclose(np.asarray(st.best_d[0]), [1.0, 2.0, np.inf])
    np.testing.assert_array_equal(np.asarray(st.best_i[1]), [4, 3, 2])
    # queue holds the same sorted entries
    np.testing.assert_array_equal(np.asarray(st.q_i[1]), [4, 3, 2, 1])


def test_insert_respects_criteria():
    st = mk_state(xi=0.5)
    st = beam_insert(st, jnp.asarray([[1, 2, 3], [1, 2, 3]], jnp.int32),
                     jnp.asarray([[1.0, 2.0, 3.0]] * 2, jnp.float32))
    # best worst = 3.0, criteria = 3.5 -> candidate at 4.0 rejected, 3.2 kept
    st = beam_insert(st, jnp.asarray([[4, 5], [4, 5]], jnp.int32),
                     jnp.asarray([[4.0, 3.2]] * 2, jnp.float32))
    # 3.2 passes criteria -> admitted to the queue (too far for top-3 best)
    assert 5 in np.asarray(st.q_i[0])
    assert 5 not in np.asarray(st.best_i[0])
    assert 4 not in np.asarray(st.best_i[0])
    assert 4 not in np.asarray(st.q_i[0])


def test_insert_dedups_against_visited():
    st = mk_state()
    st = beam_insert(st, jnp.asarray([[1], [1]], jnp.int32),
                     jnp.asarray([[1.0], [1.0]], jnp.float32))
    anchor, active, st = beam_pop(st)
    np.testing.assert_array_equal(np.asarray(anchor), [1, 1])
    # 1 is now in the visited ring; re-inserting must be a no-op in the queue
    st2 = beam_insert(st, jnp.asarray([[1], [1]], jnp.int32),
                      jnp.asarray([[0.5], [0.5]], jnp.float32))
    assert np.asarray(st2.q_i[0, 0]) == -1


def test_pop_criteria_stops():
    st = mk_state(xi=0.1)
    st = beam_insert(st, jnp.asarray([[1, 2, 3], [1, 2, 3]], jnp.int32),
                     jnp.asarray([[1.0, 2.0, 3.0]] * 2, jnp.float32))
    # pop 1 (1.0 < best_worst 3.0 + 0.1)
    a, act, st = beam_pop(st)
    assert np.all(np.asarray(act))
    # pop 2, 3
    a, act, st = beam_pop(st)
    a, act, st = beam_pop(st)
    # queue empty -> inactive
    a, act, st = beam_pop(st)
    assert not np.any(np.asarray(act))
    np.testing.assert_array_equal(np.asarray(a), [-1, -1])


def test_pop_uses_criteria_bound():
    st = mk_state(xi=0.0)
    # best list filled with near dists, queue head is far -> pop inactive
    st = beam_insert(st, jnp.asarray([[1, 2, 3, 4], [1, 2, 3, 4]], jnp.int32),
                     jnp.asarray([[1.0, 1.1, 1.2, 9.0]] * 2, jnp.float32))
    for _ in range(2):
        a, act, st = beam_pop(st)
        assert np.all(np.asarray(act))
    # head = 1.2 >= best_worst 1.2 + 0 -> rejected (reference pop uses >=,
    # simple_knn_cache.cuh:223)
    a, act, st = beam_pop(st)
    assert not np.any(np.asarray(act))


def test_transform_remaps_and_reseeds():
    st = mk_state()
    st = beam_insert(st, jnp.asarray([[0, 1], [2, 3]], jnp.int32),
                     jnp.asarray([[1.0, 2.0], [1.0, 2.0]], jnp.float32))
    a, act, st = beam_pop(st)  # visited ring non-empty now
    mapping = jnp.asarray([10, 11, 12, 13], jnp.int32)
    st = beam_transform(st, mapping)
    np.testing.assert_array_equal(np.asarray(st.best_i[0]), [10, 11, -1])
    np.testing.assert_array_equal(np.asarray(st.best_i[1]), [12, 13, -1])
    # queue re-seeded from best, visited cleared
    np.testing.assert_array_equal(np.asarray(st.q_i[0, :2]), [10, 11])
    assert np.all(np.asarray(st.vis) == -1)
    assert np.all(np.asarray(st.vis_head) == 0)


def test_pop_multi_prefix_and_shift():
    from ggnn_tpu.ops.beam import beam_pop_multi

    st = beam_init(2, (3, 6, 6), jnp.float32(10.0))
    st = beam_insert(st, jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32),
                     jnp.asarray([[1.0, 2.0, 3.0, 4.0]] * 2, jnp.float32))
    anchors, active, st = beam_pop_multi(st, 3)
    np.testing.assert_array_equal(np.asarray(anchors), [[1, 2, 3], [5, 6, 7]])
    assert np.all(np.asarray(active))
    # queue shifted by 3: head is now the 4th entry
    np.testing.assert_array_equal(np.asarray(st.q_i[:, 0]), [4, 8])
    # popped ids are in the visited ring
    assert set(np.asarray(st.vis[0])) >= {1, 2, 3}
    np.testing.assert_array_equal(np.asarray(st.vis_head), [3, 3])


def test_pop_multi_partial_prefix():
    from ggnn_tpu.ops.beam import beam_pop_multi

    # xi=0 and a full best list -> only entries strictly below best_worst pop
    st = beam_init(1, (2, 6, 6), jnp.float32(0.0))
    st = beam_insert(st, jnp.asarray([[1, 2, 3]], jnp.int32),
                     jnp.asarray([[1.0, 1.5, 9.0]], jnp.float32))
    # best = [1, 2], best_worst = 1.5; queue = [1, 2, 3]
    # criteria 1.5: only entry 1 (1.0) passes
    anchors, active, st = beam_pop_multi(st, 3)
    np.testing.assert_array_equal(np.asarray(anchors), [[1, -1, -1]])
    assert np.asarray(st.q_i[0, 0]) == 2
    np.testing.assert_array_equal(np.asarray(st.vis_head), [1])


def test_pop_multi_matches_sequential_pops():
    from ggnn_tpu.ops.beam import beam_pop_multi

    rng = np.random.default_rng(0)
    ids = rng.choice(100, size=(4, 8), replace=False).astype(np.int32)
    d = np.sort(rng.random((4, 8)), axis=1).astype(np.float32)

    st_a = beam_init(4, (4, 8, 8), jnp.float32(100.0))
    st_a = beam_insert(st_a, jnp.asarray(ids), jnp.asarray(d))
    st_b = st_a

    anchors_multi, _, st_a = beam_pop_multi(st_a, 4)
    seq = []
    for _ in range(4):
        a, _, st_b = beam_pop(st_b)
        seq.append(np.asarray(a))
    np.testing.assert_array_equal(np.asarray(anchors_multi), np.stack(seq, axis=1))
    np.testing.assert_array_equal(np.asarray(st_a.q_i), np.asarray(st_b.q_i))
    np.testing.assert_array_equal(np.asarray(st_a.vis_head), np.asarray(st_b.vis_head))
