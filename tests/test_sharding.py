"""Multi-shard and multi-chip (virtual 8-device mesh) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggnn_tpu import GGNN, DistanceMeasure
from ggnn_tpu.config import GraphConfig
from ggnn_tpu.build.construction import build_graph
from ggnn_tpu.parallel import make_mesh, sharded_bf_query, sharded_query, stack_shards

N_SHARD, D, KB = 512, 16, 12
NQ = 16


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    base = rng.normal(size=(4 * N_SHARD, D)).astype(np.float32)
    query = rng.normal(size=(NQ, D)).astype(np.float32)
    return base, query


def test_multi_shard_single_device_query(data):
    base, query = data
    g = GGNN()
    g.set_base(base)
    g.set_shard_size(N_SHARD)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    assert g.num_shards == 4
    ids, dists = g.query(query, 10, tau_query=0.7, max_iterations=100)
    assert ids.shape == (NQ, 10)
    # global ids present from multiple shards
    assert (ids // N_SHARD).max() > 0
    # merged result must dominate any single-shard result
    gt_ids, gt_d = g.bf_query(query, k_gt=10)
    assert (ids == gt_ids).mean() > 0.4  # sanity: some overlap with exact
    assert np.all(np.diff(dists, axis=1) >= 0)


def test_sharded_bf_query_matches_single(data):
    base, query = data
    ndev = 4
    mesh = make_mesh(jax.devices()[:ndev])
    base_stack = jnp.asarray(base.reshape(ndev, N_SHARD, D))
    ids, dists = sharded_bf_query(mesh, base_stack, jnp.asarray(query), 10)
    d = ((query[:, None] - base[None]) ** 2).sum(-1)
    want = np.argsort(d, axis=1)[:, :10]
    assert (np.asarray(ids) == want).mean() > 0.99


def test_sharded_query_matches_per_shard(data):
    base, query = data
    ndev = 4
    cfg = GraphConfig.create(N=N_SHARD, D=D, KBuild=KB)
    graphs, bases = [], []
    for i in range(ndev):
        shard = jnp.asarray(base[i * N_SHARD : (i + 1) * N_SHARD])
        graph, _ = build_graph(shard, cfg, 0.5, refinement_iterations=0, seed=1234 + i)
        graphs.append(graph)
        bases.append(shard)

    mesh = make_mesh(jax.devices()[:ndev])
    base_stack = stack_shards(bases)
    graph_stack = stack_shards(graphs)
    ids, dists = sharded_query(
        mesh, base_stack, graph_stack, cfg, jnp.asarray(query), 10, 0.7, 100
    )
    ids, dists = np.asarray(ids), np.asarray(dists)
    assert ids.shape == (NQ, 10)
    assert np.all(np.diff(dists, axis=1) >= 0)

    # compare against the sequential per-shard path through GGNN
    g = GGNN()
    g.set_base(base)
    g.set_shard_size(N_SHARD)
    g._prepare(KB)
    for i, shard in enumerate(g._shards):
        shard.graph_host = graphs[i]
    ref_ids, ref_d = g.query(query, 10, tau_query=0.7, max_iterations=100)
    np.testing.assert_allclose(np.sort(dists, axis=1), np.sort(ref_d, axis=1), rtol=1e-4)
    assert (ids == ref_ids).mean() > 0.95  # ties may reorder


def test_out_of_core_rotation(data):
    base, query = data
    g = GGNN()
    g.set_base(base)
    g.set_shard_size(N_SHARD)
    g.set_max_device_shards(1)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    ids, dists = g.query(query, 10, tau_query=0.7, max_iterations=100)
    g2 = GGNN()
    g2.set_base(base)
    g2.set_shard_size(N_SHARD)
    g2.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    ids2, _ = g2.query(query, 10, tau_query=0.7, max_iterations=100)
    np.testing.assert_array_equal(ids, ids2)
