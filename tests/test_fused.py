"""Quantized-adjacency (fused) engine tests: quantizer bounds, layout
invariants, oracle recall, uint8 bases, persistence, GGNN API."""

import numpy as np
import jax.numpy as jnp
import pytest

from ggnn_tpu.config import DistanceMeasure, GraphConfig
from ggnn_tpu.build.construction import build_graph
from ggnn_tpu.ops.bruteforce import bruteforce_knn
from ggnn_tpu.query.fused import (
    FusedIndex,
    build_fused_index,
    fit_affine_u8,
    fused_query,
    load_fused_index,
    save_fused_index,
)


def _manifold(rng, n, d=64, d_latent=8, scale=30.0):
    w = rng.normal(size=(d_latent, d)).astype(np.float32) / np.sqrt(d_latent)
    z = rng.normal(size=(n, d_latent)).astype(np.float32)
    return (z @ w * scale + 128.0).astype(np.float32)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(13)
    N, D = 4000, 64
    base = _manifold(rng, N, D)
    query = _manifold(rng, 200, D)
    cfg = GraphConfig.create(N=N, D=D, KBuild=16)
    graph, _ = build_graph(jnp.asarray(base), cfg, 0.5, refinement_iterations=1)
    index = build_fused_index(jnp.asarray(base), graph, cfg)
    return base, query, cfg, graph, index


def test_quantizer_error_bound():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 32)).astype(np.float32) * 50 + 10
    scale, zero = fit_affine_u8(x)
    c = np.clip(np.round((x - zero) / scale), 0, 255).astype(np.uint8)
    x_hat = c.astype(np.float32) * scale + zero
    # max error is half a quantization step per dimension
    assert np.all(np.abs(x - x_hat) <= scale / 2 + 1e-5)


def test_index_codes_match_graph(built):
    """blocks[i, j] is the quantized vector of graph neighbor j of i."""
    base, _, cfg, graph, index = built
    nbr0 = np.asarray(graph.neighbors[0])
    codes = np.clip(
        np.round((base - np.asarray(index.zero)) / np.asarray(index.scale)),
        0,
        255,
    ).astype(np.uint8)
    nc = np.asarray(index.blocks)[:, : cfg.KBuild]
    for i in (0, 1234, len(base) - 1):
        for j in (0, cfg.KBuild - 1):
            n = nbr0[i, j]
            if n >= 0:
                np.testing.assert_array_equal(nc[i, j], codes[n])
    # rep seeds are the layer-1 translation ids
    np.testing.assert_array_equal(
        np.asarray(index.rep_ids), np.asarray(graph.translation[1])
    )


def test_fused_query_recall(built):
    """Fused traversal + exact re-rank reaches >=95% c@1 (oracle check)."""
    base, query, cfg, graph, index = built
    gt_ids, _ = bruteforce_knn(jnp.asarray(base), jnp.asarray(query), 10)
    gt = np.asarray(gt_ids)
    ids, dists = fused_query(
        jnp.asarray(query), index, jnp.asarray(base), 10, 0.64, 200
    )
    ids, dists = np.asarray(ids), np.asarray(dists)
    c1 = np.mean([gt[i, 0] in ids[i] for i in range(len(gt))])
    assert c1 >= 0.95, f"fused-engine c@1={c1}"
    for row_i, row_d in zip(ids, dists):
        filled = row_d[np.isfinite(row_d)]
        assert np.all(np.diff(filled) >= 0)
        real = row_i[row_i >= 0]
        assert len(np.unique(real)) == len(real)
    # distances are EXACT (re-ranked): spot-check against numpy
    q0 = query[0]
    for j in range(3):
        if ids[0, j] >= 0:
            exact = float(np.sum((q0 - base[ids[0, j]]) ** 2))
            assert abs(exact - dists[0, j]) < 1e-2 * max(1.0, exact)


def test_fused_query_uint8_base(built):
    """uint8 bases use their bytes as codes (reference SIFT1B mode)."""
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=(3000, 32)).astype(np.uint8)
    query = rng.integers(0, 256, size=(100, 32)).astype(np.uint8)
    cfg = GraphConfig.create(N=3000, D=32, KBuild=16)
    graph, _ = build_graph(
        jnp.asarray(base).astype(jnp.float32), cfg, 0.5, refinement_iterations=1
    )
    index = build_fused_index(jnp.asarray(base), graph, cfg)
    assert np.all(np.asarray(index.scale) == 1.0)
    assert np.all(np.asarray(index.zero) == 0.0)
    gt_ids, _ = bruteforce_knn(
        jnp.asarray(base).astype(jnp.float32),
        jnp.asarray(query).astype(jnp.float32),
        10,
    )
    gt = np.asarray(gt_ids)
    ids, _ = fused_query(
        jnp.asarray(query).astype(jnp.float32),
        index,
        jnp.asarray(base),
        10,
        1.0,
        200,
    )
    ids = np.asarray(ids)
    c1 = np.mean([gt[i, 0] in ids[i] for i in range(len(gt))])
    assert c1 >= 0.9, f"uint8 fused c@1={c1}"


def test_fused_query_cosine(built):
    base, query, cfg, graph, _ = built
    graph_c, _ = build_graph(
        jnp.asarray(base), cfg, 0.5, refinement_iterations=1,
        measure=DistanceMeasure.Cosine,
    )
    index_c = build_fused_index(jnp.asarray(base), graph_c, cfg)
    gt_ids, _ = bruteforce_knn(
        jnp.asarray(base), jnp.asarray(query), 10, DistanceMeasure.Cosine
    )
    gt = np.asarray(gt_ids)
    ids, _ = fused_query(
        jnp.asarray(query), index_c, jnp.asarray(base), 10, 0.7, 200,
        DistanceMeasure.Cosine,
    )
    ids = np.asarray(ids)
    c1 = np.mean([gt[i, 0] in ids[i] for i in range(len(gt))])
    assert c1 >= 0.9, f"cosine fused c@1={c1}"


def test_fused_index_roundtrip(tmp_path, built):
    """The sidecar persists only the meta (matching + quantizer +
    fingerprint); assembling it against the same base+graph must reproduce
    the original index bit-for-bit."""
    from ggnn_tpu.query.fused import (
        assemble_fused_index,
        fused_index_matches_graph,
        graph_fingerprint,
    )

    base, _, cfg, graph, index = built
    p = tmp_path / "fused_0.npz"
    save_fused_index(p, index, graph)
    loaded = load_fused_index(p)
    np.testing.assert_array_equal(
        np.asarray(index.members), np.asarray(loaded.members)
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.graph_fp), graph_fingerprint(graph)
    )
    assert fused_index_matches_graph(loaded, graph, cfg.KBuild)
    rebuilt = assemble_fused_index(
        jnp.asarray(base), graph,
        members=loaded.members, scale=loaded.scale, zero=loaded.zero,
    )
    for k in FusedIndex._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(index, k)), np.asarray(getattr(rebuilt, k))
        )


def test_ggnn_api_fused(tmp_path):
    """GGNN-level: build_fused_index, engine='fused', store/load roundtrip."""
    from ggnn_tpu import GGNN

    rng = np.random.default_rng(7)
    base = _manifold(rng, 2048, 32, 6)
    query = _manifold(rng, 64, 32, 6)
    g = GGNN()
    g.set_base(base)
    g.build(k_build=16, tau_build=0.5, refinement_iterations=1)
    with pytest.raises(RuntimeError):
        g.query(query, 10, 0.5, engine="fused")
    g.build_fused_index()
    gt_ids, _ = g.bf_query(query, k_gt=10)
    ids, dists = g.query(query, 10, 1.0, 200, engine="fused")
    c1 = np.mean([gt_ids[i, 0] in ids[i] for i in range(len(query))])
    assert c1 >= 0.9
    g.set_working_directory(tmp_path)
    g.store()
    g2 = GGNN()
    g2.set_base(base)
    g2.set_working_directory(tmp_path)
    g2.load(16)
    assert g2.has_fused_index()
    ids2, _ = g2.query(query, 10, 1.0, 200, engine="fused")
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_match_groups_invariants(built):
    """Pair matching: every node in exactly one group; partners are graph
    neighbors for the mutual-matched majority."""
    from ggnn_tpu.query.fused import match_groups

    _, _, cfg, graph, _ = built
    nbr0 = np.asarray(graph.neighbors[0])
    m = match_groups(nbr0, 2)
    flat = m[m >= 0]
    assert sorted(flat.tolist()) == list(range(len(nbr0)))  # exact partition
    # most pairs are graph-adjacent (mutual-nearest matching)
    a, b = m[:, 0], m[:, 1]
    paired = b >= 0
    adj = np.any(nbr0[a[paired]] == b[paired, None], axis=1)
    assert adj.mean() > 0.8


def test_grouped_index_same_results(built):
    """group=2 layout must reach the recall of the per-node layout (same
    walk semantics, one fetch per pair)."""
    base, query, cfg, graph, index1 = built
    index2 = build_fused_index(jnp.asarray(base), graph, cfg, group=2)
    assert index2.group == 2 and index2.k_build == cfg.KBuild
    gt_ids, _ = bruteforce_knn(jnp.asarray(base), jnp.asarray(query), 10)
    gt = np.asarray(gt_ids)
    ids2, d2 = fused_query(
        jnp.asarray(query), index2, jnp.asarray(base), 10, 0.64, 200,
        pops_per_iter=8,
    )
    ids2 = np.asarray(ids2)
    c1 = np.mean([gt[i, 0] in ids2[i] for i in range(len(gt))])
    assert c1 >= 0.95, f"grouped fused c@1={c1}"
    # rows stay sorted + unique
    for row_i, row_d in zip(ids2, np.asarray(d2)):
        filled = row_d[np.isfinite(row_d)]
        assert np.all(np.diff(filled) >= 0)
        real = row_i[row_i >= 0]
        assert len(np.unique(real)) == len(real)


def test_group4_index_same_results(built):
    """group=4 (pairs of graph-adjacent pairs) must keep walk recall; one
    fetch serves four members' adjacency."""
    base, query, cfg, graph, index1 = built
    index4 = build_fused_index(jnp.asarray(base), graph, cfg, group=4)
    assert index4.group == 4 and index4.k_build == cfg.KBuild
    assert index4.cand_per_fetch == 4 * cfg.KBuild
    # exact partition of the node set
    m = np.asarray(index4.members)
    flat = m[m >= 0]
    assert sorted(flat.tolist()) == list(range(len(base)))
    gof = np.asarray(index4.group_of)
    for gid in (0, len(m) // 2, len(m) - 1):
        for node in m[gid][m[gid] >= 0]:
            assert gof[node] == gid
    gt_ids, _ = bruteforce_knn(jnp.asarray(base), jnp.asarray(query), 10)
    gt = np.asarray(gt_ids)
    ids4, d4 = fused_query(
        jnp.asarray(query), index4, jnp.asarray(base), 10, 0.64, 200,
        pops_per_iter=8,
    )
    ids4 = np.asarray(ids4)
    c1 = np.mean([gt[i, 0] in ids4[i] for i in range(len(gt))])
    assert c1 >= 0.95, f"group=4 fused c@1={c1}"
    for row_i, row_d in zip(ids4, np.asarray(d4)):
        filled = row_d[np.isfinite(row_d)]
        assert np.all(np.diff(filled) >= 0)
        real = row_i[row_i >= 0]
        assert len(np.unique(real)) == len(real)


def test_grouped_index_validation(built):
    from ggnn_tpu.query.fused import fused_index_matches_graph

    base, _, cfg, graph, index1 = built
    index2 = build_fused_index(jnp.asarray(base), graph, cfg, group=2)
    assert fused_index_matches_graph(index1, graph, cfg.KBuild)
    assert fused_index_matches_graph(index2, graph, cfg.KBuild)
    # a different graph must be rejected
    rng = np.random.default_rng(99)
    perm = rng.permutation(len(base))
    base_p = base[perm]
    graph_p, _ = build_graph(jnp.asarray(base_p), cfg, 0.5, refinement_iterations=0)
    assert not fused_index_matches_graph(index2, graph_p, cfg.KBuild)


def test_compaction_is_bit_identical(built):
    """Phased converged-row compaction must not change results AT ALL: rows
    walk independently and every live row keeps its full pop budget, so the
    compacted sweep is a pure re-scheduling of the same per-row programs."""
    base, _, cfg, graph, index = built
    rng = np.random.default_rng(7)
    query = jnp.asarray(_manifold(rng, 600, base.shape[1]))  # tile > 512 rows
    base_j = jnp.asarray(base)
    ids0, d0 = fused_query(query, index, base_j, 10, 0.6, 64,
                           compact_levels=0)
    for levels in (1, 3):
        ids, d = fused_query(query, index, base_j, 10, 0.6, 64,
                             compact_levels=levels)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids0))
        np.testing.assert_array_equal(np.asarray(d), np.asarray(d0))


def test_budget_sized_visited_ring_identical(built):
    """vis_size defaults to the pop budget (rounded to 32): a ring that never
    wraps behaves exactly like the reference-sized larger ring."""
    base, query, cfg, graph, index = built
    q = jnp.asarray(query)
    base_j = jnp.asarray(base)
    _, vis_default = GraphConfig.query_beam_geometry(10, 48)
    ids0, d0 = fused_query(q, index, base_j, 10, 0.6, 48, vis_size=vis_default)
    ids1, d1 = fused_query(q, index, base_j, 10, 0.6, 48)  # tightened default
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_seed_approx_recall_close(built):
    """Approximate seed selection (lax.approx_min_k) replaces only WHICH
    reps seed the walk; recall must stay at the exact-top_k level. On CPU
    approx_min_k lowers to the exact reduction, so the ids match exactly;
    the weaker recall bound keeps the test valid on real TPUs too."""
    base, query, cfg, graph, index = built
    q = jnp.asarray(query)
    base_j = jnp.asarray(base)
    gt, _ = bruteforce_knn(base_j, q, 10)
    ids0, _ = fused_query(q, index, base_j, 10, 0.6, 64, seed_approx=False)
    ids1, _ = fused_query(q, index, base_j, 10, 0.6, 64, seed_approx=True)
    gt = np.asarray(gt)
    r0 = (np.asarray(ids0)[:, :1] == gt[:, :1]).mean()
    r1 = (np.asarray(ids1)[:, :1] == gt[:, :1]).mean()
    assert r1 >= r0 - 0.03, (r0, r1)


def test_sort_bf16_recall_close(built):
    """bf16 beam keys only coarsen frontier ORDER (final distances come
    from the exact f32 re-rank): recall must stay at the f32-beam level
    and returned distances must be exact either way."""
    base, query, cfg, graph, index = built
    q = jnp.asarray(query)
    base_j = jnp.asarray(base)
    gt, _ = bruteforce_knn(base_j, q, 10)
    ids0, d0 = fused_query(q, index, base_j, 10, 0.6, 64)
    ids1, d1 = fused_query(q, index, base_j, 10, 0.6, 64, sort_bf16=True)
    gt = np.asarray(gt)
    r0 = (np.asarray(ids0)[:, :1] == gt[:, :1]).mean()
    r1 = (np.asarray(ids1)[:, :1] == gt[:, :1]).mean()
    assert r1 >= r0 - 0.03, (r0, r1)
    d1 = np.asarray(d1)
    assert d1.dtype == np.float32  # re-rank output stays exact f32
    ids1 = np.asarray(ids1)
    for j in range(3):
        if ids1[0, j] >= 0:
            exact = float(np.sum((query[0] - base[ids1[0, j]]) ** 2))
            assert abs(exact - d1[0, j]) < 1e-2 * max(1.0, exact)


def test_int4_index_recall_close(built):
    """bits=4 packs two neighbors per code row (half the block bytes,
    VERDICT r4 #5). The walk metric coarsens but the exact f32 re-rank is
    unchanged, so recall must stay close to the u8 index."""
    base, query, cfg, graph, index = built
    idx4 = build_fused_index(jnp.asarray(base), graph, cfg, bits=4)
    assert idx4.bits == 4 and index.bits == 8
    # half the code rows (plus the shared 8-row-aligned meta tail)
    assert idx4.blocks.shape[1] < index.blocks.shape[1]

    from ggnn_tpu.ops.bruteforce import bruteforce_knn

    gt_ids, _ = bruteforce_knn(jnp.asarray(base), jnp.asarray(query), 10)
    gt = np.asarray(gt_ids)

    def c1(idx):
        ids, _ = fused_query(
            jnp.asarray(query), idx, jnp.asarray(base), 10, 0.64, 100
        )
        ids = np.asarray(ids)
        assert np.all(ids >= 0)
        return np.mean([gt[i, 0] in ids[i] for i in range(len(gt))])

    c8, c4 = c1(index), c1(idx4)
    assert c8 >= 0.9
    assert c4 >= c8 - 0.05, (c4, c8)


def test_int4_sidecar_roundtrip(tmp_path, built):
    """The meta sidecar records the code width: reloading an int4 index
    reassembles int4 blocks (and rejects nothing silently)."""
    base, _, cfg, graph, index = built
    idx4 = build_fused_index(jnp.asarray(base), graph, cfg, bits=4)
    path = tmp_path / "part_0.fused.npz"
    save_fused_index(path, idx4, graph)
    meta = load_fused_index(path)
    assert int(meta.bits[0]) == 4
    from ggnn_tpu.query.fused import assemble_fused_index

    re4 = assemble_fused_index(
        jnp.asarray(base), graph, members=meta.members,
        scale=meta.scale, zero=meta.zero, bits=int(meta.bits[0]),
    )
    np.testing.assert_array_equal(
        np.asarray(re4.blocks), np.asarray(idx4.blocks)
    )


def test_fused_query_k96_smoke():
    """k_build=96 (the 12 KB-block recall-ceiling option, BASELINE.md
    round-4/5 adjudication) builds and answers through the fused engine."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    N, D = 2048, 64
    base = _manifold(rng, N, D)
    query = _manifold(rng, 64, D)
    cfg = GraphConfig.create(N=N, D=D, KBuild=96)
    graph, _ = build_graph(jnp.asarray(base), cfg, 0.5, refinement_iterations=0)
    index = build_fused_index(jnp.asarray(base), graph, cfg)
    assert index.cand_per_fetch == 96
    ids, dists = fused_query(jnp.asarray(query), index, jnp.asarray(base),
                             10, 0.64, 48)
    ids = np.asarray(ids)
    assert ids.shape == (64, 10) and np.all(ids >= 0)
    from ggnn_tpu.ops.bruteforce import bruteforce_knn

    gt = np.asarray(bruteforce_knn(jnp.asarray(base), jnp.asarray(query), 1)[0])
    c1 = np.mean([gt[i, 0] in ids[i] for i in range(len(gt))])
    assert c1 >= 0.9, c1
