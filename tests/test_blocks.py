"""Block-native engine tests: layout invariants, block graph sanity, and
brute-force-as-oracle recall (SURVEY.md section 4 strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ggnn_tpu.config import DistanceMeasure, GraphConfig
from ggnn_tpu.build.construction import build_graph
from ggnn_tpu.ops.bruteforce import bruteforce_knn
from ggnn_tpu.blocks import BlockIndex, build_block_index, block_query
from ggnn_tpu.blocks.layout import (
    _rank_neighbor_blocks,
    load_block_index,
    save_block_index,
)


def _manifold(rng, n, d=64, d_latent=8, scale=30.0):
    w = rng.normal(size=(d_latent, d)).astype(np.float32) / np.sqrt(d_latent)
    z = rng.normal(size=(n, d_latent)).astype(np.float32)
    return (z @ w * scale + 128.0).astype(np.float32)


@pytest.fixture(scope="module")
def built(rng_module=None):
    rng = np.random.default_rng(11)
    N, D = 4000, 64
    base = _manifold(rng, N, D)
    query = _manifold(rng, 200, D)
    cfg = GraphConfig.create(N=N, D=D, KBuild=16)
    graph, _ = build_graph(jnp.asarray(base), cfg, 0.5, refinement_iterations=1)
    index = build_block_index(jnp.asarray(base), graph, cfg, block_size=16, k_blk=12)
    return base, query, cfg, graph, index


def test_layout_partition(built):
    """Every base point lives in exactly one block slot."""
    base, _, _, _, index = built
    m = np.asarray(index.member_ids).ravel()
    ids = np.sort(m[m >= 0])
    assert np.array_equal(ids, np.arange(base.shape[0]))
    # padding slots have +inf norms so they never enter a top-k
    sq = np.asarray(index.member_sq).ravel()
    assert np.all(np.isinf(sq[m < 0]))
    assert np.all(np.isfinite(sq[m >= 0]))


def test_centroids_are_member_means(built):
    _, _, _, _, index = built
    m = np.asarray(index.member_ids)
    blk = np.asarray(index.base_blk)
    cent = np.asarray(index.centroids)
    assert np.all(np.isfinite(cent))
    for b in (0, index.num_blocks // 2, index.num_blocks - 1):
        valid = m[b] >= 0
        np.testing.assert_allclose(
            cent[b], blk[b][valid].mean(axis=0), rtol=1e-5, atol=1e-3
        )
    np.testing.assert_allclose(
        np.asarray(index.centroid_sq), np.sum(cent * cent, axis=-1), rtol=1e-5
    )


def test_layout_vectors_match(built):
    """Block slots hold the original vectors (f32)."""
    base, _, _, _, index = built
    m = np.asarray(index.member_ids)
    blk = np.asarray(index.base_blk)
    nb, bs = m.shape
    for b in range(0, nb, max(1, nb // 7)):
        for s in range(bs):
            if m[b, s] >= 0:
                np.testing.assert_array_equal(blk[b, s], base[m[b, s]])


def test_block_graph_valid(built):
    """Block neighbors are valid ids, exclude self, no duplicates."""
    _, _, _, _, index = built
    nbrs = np.asarray(index.blk_nbrs)
    nb = index.num_blocks
    for b in range(nb):
        row = nbrs[b][nbrs[b] >= 0]
        assert np.all(row < nb)
        assert b not in row
        assert len(np.unique(row)) == len(row)
    starts = np.asarray(index.start_blocks)
    assert np.all(starts[starts >= 0] < nb)
    assert (starts >= 0).sum() > 0


def test_rank_neighbor_blocks_counts():
    """Frequency ranking: most-crossed block first, self excluded, ties by id."""
    cand = jnp.asarray([[3, 1, 3, 3, 2, 2, 0, -1, 1, 3]], dtype=jnp.int32)
    out = np.asarray(_rank_neighbor_blocks(cand, jnp.asarray([0]), 4))
    # counts: 3 x4, 1 x2, 2 x2, 0 excluded(self)
    assert out.tolist() == [[3, 1, 2, -1]]


def test_block_query_recall(built):
    """Block traversal reaches >=90% c@1 at moderate tau (oracle check)."""
    base, query, cfg, graph, index = built
    gt_ids, _ = bruteforce_knn(jnp.asarray(base), jnp.asarray(query), 10)
    gt = np.asarray(gt_ids)
    ids, dists = block_query(jnp.asarray(query), index, 10, 0.7, 200)
    ids = np.asarray(ids)
    dists = np.asarray(dists)
    c1 = np.mean([gt[i, 0] in ids[i] for i in range(len(gt))])
    assert c1 >= 0.9, f"block-engine c@1={c1}"
    # rows sorted ascending, no duplicate ids
    for row_i, row_d in zip(ids, dists):
        filled = row_d[np.isfinite(row_d)]
        assert np.all(np.diff(filled) >= 0)
        real = row_i[row_i >= 0]
        assert len(np.unique(real)) == len(real)


def test_block_query_monotone_tau(built):
    """Higher tau explores more and cannot lose recall (statistically)."""
    base, query, cfg, graph, index = built
    gt_ids, _ = bruteforce_knn(jnp.asarray(base), jnp.asarray(query), 1)
    gt = np.asarray(gt_ids)
    c1 = []
    for tau in (0.3, 1.2):
        ids, _ = block_query(jnp.asarray(query), index, 10, tau, 200)
        ids = np.asarray(ids)
        c1.append(np.mean([gt[i, 0] in ids[i] for i in range(len(gt))]))
    assert c1[1] >= c1[0] - 0.02


def test_block_index_roundtrip(tmp_path, built):
    _, _, _, _, index = built
    p = tmp_path / "blocks_0.npz"
    save_block_index(p, index)
    loaded = load_block_index(p)
    for k in BlockIndex._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(index, k)), np.asarray(getattr(loaded, k))
        )


def test_block_query_cosine(built):
    base, query, cfg, graph, index = built
    # rebuild index under cosine to keep assignment consistent
    graph_c, _ = build_graph(
        jnp.asarray(base), cfg, 0.5, refinement_iterations=1,
        measure=DistanceMeasure.Cosine,
    )
    index_c = build_block_index(
        jnp.asarray(base), graph_c, cfg, measure=DistanceMeasure.Cosine,
        block_size=16, k_blk=12,
    )
    gt_ids, _ = bruteforce_knn(
        jnp.asarray(base), jnp.asarray(query), 10, DistanceMeasure.Cosine
    )
    gt = np.asarray(gt_ids)
    ids, _ = block_query(
        jnp.asarray(query), index_c, 10, 0.7, 200, DistanceMeasure.Cosine
    )
    ids = np.asarray(ids)
    c1 = np.mean([gt[i, 0] in ids[i] for i in range(len(gt))])
    assert c1 >= 0.85, f"cosine block-engine c@1={c1}"
