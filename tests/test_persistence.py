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


def test_stale_fused_sidecar_ignored_on_load(tmp_path, rng):
    """A fused sidecar left behind by a previous build must not be trusted
    when it no longer matches the stored graph (ADVICE round-1, medium)."""
    base_a = rng.normal(size=(N, D)).astype(np.float32)
    g = GGNN()
    g.set_base(base_a)
    g.set_working_directory(tmp_path)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    g.build_fused_index()
    g.store()
    assert (tmp_path / "part_0.fused.npz").exists()
    stale = (tmp_path / "part_0.fused.npz").read_bytes()

    # a different base -> different graph; store WITHOUT a fused index
    base_b = rng.normal(size=(N, D)).astype(np.float32)
    g2 = GGNN()
    g2.set_base(base_b)
    g2.set_working_directory(tmp_path)
    g2.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    g2.store()
    # store() deletes the sidecar when no fused index exists in memory
    assert not (tmp_path / "part_0.fused.npz").exists()

    # even if the stale sidecar reappears on disk, load() must reject it
    (tmp_path / "part_0.fused.npz").write_bytes(stale)
    g3 = GGNN()
    g3.set_base(base_b)
    g3.set_working_directory(tmp_path)
    g3.load(k_build=KB)
    assert not g3.has_fused_index()


def test_matching_fused_sidecar_survives_roundtrip(tmp_path, rng):
    base = rng.normal(size=(N, D)).astype(np.float32)
    query = rng.normal(size=(8, D)).astype(np.float32)
    g = GGNN()
    g.set_base(base)
    g.set_working_directory(tmp_path)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    g.build_fused_index()
    ids1, _ = g.query(query, 10, tau_query=0.5, max_iterations=100, engine="fused")
    g.store()
    g2 = GGNN()
    g2.set_base(base)
    g2.set_working_directory(tmp_path)
    g2.load(k_build=KB)
    assert g2.has_fused_index()
    ids2, _ = g2.query(query, 10, tau_query=0.5, max_iterations=100, engine="fused")
    np.testing.assert_array_equal(ids1, ids2)


def test_cpu_memory_limit_spills_to_disk(tmp_path, rng):
    """set_cpu_memory_limit bounds the host graph caches; evicted shards
    spill to part_*.npz and reload transparently (gpu_instance.cu:371-467
    disk-tier analog)."""
    base = rng.normal(size=(4 * N, D)).astype(np.float32)
    query = rng.normal(size=(8, D)).astype(np.float32)

    g = GGNN()
    g.set_base(base)
    g.set_shard_size(N)
    g.set_working_directory(tmp_path)
    g.set_max_device_shards(1)
    g.set_cpu_memory_limit(1)  # force every eviction to spill
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    spill_files = sorted(p.name for p in tmp_path.glob("part_*.npz"))
    assert len(spill_files) >= 3  # evicted shards went to disk
    # every evicted shard's host cache was released after spilling
    assert all(s.resident or s.host_cache_bytes() == 0 for s in g._shards)

    ids, dists = g.query(query, 10, tau_query=0.7, max_iterations=100)

    # identical to a fully-resident run
    g2 = GGNN()
    g2.set_base(base)
    g2.set_shard_size(N)
    g2.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    ids2, _ = g2.query(query, 10, tau_query=0.7, max_iterations=100)
    np.testing.assert_array_equal(ids, ids2)
