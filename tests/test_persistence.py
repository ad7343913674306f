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


def test_group_mismatched_sidecar_triggers_rebuild(tmp_path, rng):
    """load() then build_fused_index(group=G) with a sidecar stored at a
    different group must rebuild the index at the requested group instead
    of trusting the cached matching (VERDICT r3 item 9)."""
    base = rng.normal(size=(N, D)).astype(np.float32)
    query = rng.normal(size=(8, D)).astype(np.float32)
    g = GGNN()
    g.set_base(base)
    g.set_working_directory(tmp_path)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    g.build_fused_index(group=2)
    g.store()

    g2 = GGNN()
    g2.set_base(base)
    g2.set_working_directory(tmp_path)
    g2.load(k_build=KB)
    assert g2.has_fused_index()  # the group=2 meta sidecar loaded
    g2.build_fused_index(group=1)  # different group: must NOT reuse it
    idx = g2._shards[0].fused_index
    assert idx is not None and idx.members.shape[1] == 1
    assert g2._shards[0].fused_index_host is None  # stale meta dropped
    ids, _ = g2.query(query, 10, tau_query=0.5, max_iterations=100,
                      engine="fused")

    # same group: the sidecar is reused bit-for-bit
    g3 = GGNN()
    g3.set_base(base)
    g3.set_working_directory(tmp_path)
    g3.load(k_build=KB)
    g3.build_fused_index(group=2)
    assert g3._shards[0].fused_index.members.shape[1] == 2
    ids3, _ = g3.query(query, 10, tau_query=0.5, max_iterations=100,
                       engine="fused")
    ids1, _ = g.query(query, 10, tau_query=0.5, max_iterations=100,
                      engine="fused")
    np.testing.assert_array_equal(np.asarray(ids3), np.asarray(ids1))


def test_legacy_fused_sidecar_rejected_not_crashing(tmp_path, rng):
    """Pre-meta-v2 sidecars lack the graph_fp field: load_fused_index must
    fall back to an all-zeros fingerprint (treated as unvalidatable and
    rebuilt), never raise KeyError (ADVICE r3, low)."""
    from ggnn_tpu.query.fused import (
        fused_index_matches_graph, load_fused_index,
    )

    base = rng.normal(size=(N, D)).astype(np.float32)
    g = GGNN()
    g.set_base(base)
    g.set_working_directory(tmp_path)
    g.build(k_build=KB, tau_build=0.5, refinement_iterations=0)
    g.build_fused_index()
    g.store()
    sidecar = tmp_path / "part_0.fused.npz"
    with np.load(sidecar, allow_pickle=False) as f:
        legacy = {k: f[k] for k in f.files if k != "graph_fp"}
    np.savez(sidecar, **legacy)

    meta = load_fused_index(sidecar)  # must not raise
    assert not np.any(meta.graph_fp)
    assert not fused_index_matches_graph(
        meta, g._shards[0].graph_host, KB
    )

    g2 = GGNN()
    g2.set_base(base)
    g2.set_working_directory(tmp_path)
    g2.load(k_build=KB)
    assert not g2.has_fused_index()  # rejected, not trusted
