"""Graph store/load roundtrip tests (reference: gpu_instance.cu:86-115,
ggnn.cuh:134-142)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ggnn_tpu import GGNN
from ggnn_tpu.config import GraphConfig
from ggnn_tpu.build.construction import build_graph
from ggnn_tpu.graph import load_graph_shard, save_graph_shard

N, D, KB = 512, 16, 12


def test_shard_roundtrip(tmp_path, rng):
    base = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    cfg = GraphConfig.create(N=N, D=D, KBuild=KB)
    graph, _ = build_graph(base, cfg, 0.5, refinement_iterations=0)
    save_graph_shard(tmp_path / "part_0.npz", graph, cfg)
    loaded, cfg2 = load_graph_shard(tmp_path / "part_0.npz")
    assert cfg2 == cfg
    for l in range(cfg.L):
        np.testing.assert_array_equal(
            np.asarray(graph.neighbors[l]), loaded.neighbors[l]
        )
        if l:
            np.testing.assert_array_equal(
                np.asarray(graph.translation[l]), loaded.translation[l]
            )
    np.testing.assert_allclose(np.asarray(graph.nn1_stats), loaded.nn1_stats)


def test_ggnn_store_load_query_identical(tmp_path, rng):
    base = rng.normal(size=(N, D)).astype(np.float32)
    query = rng.normal(size=(8, D)).astype(np.float32)

    g = GGNN()
    g.set_base(base)
    g.set_working_directory(tmp_path)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    ids1, d1 = g.query(query, 10, tau_query=0.5, max_iterations=100)
    g.store()

    g2 = GGNN()
    g2.set_base(base)
    g2.set_working_directory(tmp_path)
    g2.load(k_build=KB)
    ids2, d2 = g2.query(query, 10, tau_query=0.5, max_iterations=100)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(d1, d2)


def test_load_rejects_wrong_kbuild(tmp_path, rng):
    base = rng.normal(size=(N, D)).astype(np.float32)
    g = GGNN()
    g.set_base(base)
    g.set_working_directory(tmp_path)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    g.store()
    g2 = GGNN()
    g2.set_base(base)
    g2.set_working_directory(tmp_path)
    with pytest.raises(ValueError):
        g2.load(k_build=KB * 2)
