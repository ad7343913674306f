"""Construction pipeline tests: top-merge vs numpy oracle, select invariants,
full-build structural invariants, determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggnn_tpu.config import DistanceMeasure, GraphConfig
from ggnn_tpu.build.construction import build_graph
from ggnn_tpu.build.select import wrs_select_layer
from ggnn_tpu.build.top_merge import top_merge_layer
from ggnn_tpu.ops.distance import squared_norms

N, D, KB = 1024, 16, 12


@pytest.fixture(scope="module")
def base():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))


@pytest.fixture(scope="module")
def cfg():
    return GraphConfig.create(N=N, D=D, KBuild=KB)


def segment_bounds(cfg, layer):
    S = cfg.layer_segment_size(layer)
    off = cfg.layer_segment_offset_count(layer)
    bounds = []
    start = 0
    for b in range(cfg.Bs[layer]):
        size = S + (1 if b < off else 0)
        bounds.append((start, start + size))
        start += size
    assert start == cfg.Ns[layer]
    return bounds


def test_top_merge_layer0_matches_numpy(base, cfg):
    nbrs, nn1 = top_merge_layer(
        base, squared_norms(base), None, cfg, 0, DistanceMeasure.Euclidean, seg_chunk=7
    )
    nbrs = np.asarray(nbrs)
    nn1 = np.asarray(nn1)
    b = np.asarray(base)
    for lo, hi in segment_bounds(cfg, 0)[:5]:
        seg = b[lo:hi]
        d = ((seg[:, None] - seg[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        order = np.argsort(d, axis=1)
        for i in range(hi - lo):
            got = nbrs[lo + i]
            want = lo + order[i, :KB]
            got_d = np.sort(d[i][order[i, :KB]])
            want_d = np.sort(d[i][got - lo])
            np.testing.assert_allclose(want_d, got_d, rtol=1e-4)
            # nn1 = second-best distance, sqrt'ed (top_merge_layer.cu:77-79)
            np.testing.assert_allclose(
                nn1[lo + i], np.sqrt(d[i][order[i, 1]]), rtol=1e-4
            )


def test_top_merge_no_self_links(base, cfg):
    nbrs, _ = top_merge_layer(
        base, squared_norms(base), None, cfg, 0, DistanceMeasure.Euclidean
    )
    nbrs = np.asarray(nbrs)
    self_ids = np.arange(N)[:, None]
    assert not np.any(nbrs == self_ids)


def test_select_invariants(base, cfg):
    key = jax.random.PRNGKey(7)
    nn1 = jnp.asarray(np.random.default_rng(1).uniform(0.1, 1.0, N).astype(np.float32))
    sel, trans = wrs_select_layer(key, nn1, None, cfg, 0)
    sel = np.asarray(sel)
    trans = np.asarray(trans)
    assert sel.shape == (cfg.Ns[1],)
    assert np.all(sel >= 0) and np.all(sel < N)
    # at layer 0 translation == selection
    np.testing.assert_array_equal(sel, trans)
    # selected points are unique (one point promoted at most once)
    assert len(np.unique(sel)) == sel.size
    # each selected point comes from the segment that owns its slot
    bounds = segment_bounds(cfg, 0)
    for b in range(cfg.Bs[0]):
        upper = b // cfg.G
        nth = b % cfg.G
        num = cfg.SG + (1 if nth < cfg.SG_off else 0)
        dest = upper * cfg.S + nth * cfg.SG + min(nth, cfg.SG_off)
        lo, hi = bounds[b]
        assert np.all((sel[dest : dest + num] >= lo) & (sel[dest : dest + num] < hi))


def test_select_deterministic(base, cfg):
    key = jax.random.PRNGKey(3)
    nn1 = jnp.ones((N,), jnp.float32)
    s1, t1 = wrs_select_layer(key, nn1, None, cfg, 0)
    s2, t2 = wrs_select_layer(key, nn1, None, cfg, 0)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


@pytest.fixture(scope="module")
def built(base, cfg):
    graph, stats = build_graph(
        base, cfg, tau_build=0.5, refinement_iterations=1,
        measure=DistanceMeasure.Euclidean, chunk=N,
    )
    return graph, stats


def test_build_structural_invariants(built, cfg):
    graph, _ = built
    for l in range(cfg.L):
        nbrs = np.asarray(graph.neighbors[l])
        assert nbrs.shape == (cfg.Ns[l], cfg.KBuild)
        assert np.all(nbrs >= 0), f"layer {l} has unfilled neighbor slots"
        assert np.all(nbrs < cfg.Ns[l])
        if l:
            sel = np.asarray(graph.selection[l])
            trans = np.asarray(graph.translation[l])
            assert np.all((sel >= 0) & (sel < cfg.Ns[l - 1]))
            assert np.all((trans >= 0) & (trans < cfg.N))
    nn1 = np.asarray(graph.nn1_stats)
    assert nn1[0] > 0 and nn1[1] >= nn1[0]


def test_translation_consistency(built, cfg):
    """translation[l] must equal translation[l-1][selection[l]]."""
    graph, _ = built
    for l in range(2, cfg.L):
        sel = np.asarray(graph.selection[l])
        lower_trans = np.asarray(graph.translation[l - 1])
        np.testing.assert_array_equal(
            np.asarray(graph.translation[l]), lower_trans[sel]
        )
    np.testing.assert_array_equal(
        np.asarray(graph.translation[1]), np.asarray(graph.selection[1])
    )


def test_build_graph_quality(built, base, cfg):
    """Most layer-0 links should be among the true 50 nearest neighbors."""
    graph, _ = built
    nbrs = np.asarray(graph.neighbors[0])
    b = np.asarray(base)
    rng = np.random.default_rng(5)
    sample = rng.choice(N, 64, replace=False)
    d = ((b[sample][:, None] - b[None]) ** 2).sum(-1)
    d[np.arange(64), sample] = np.inf
    true50 = np.argsort(d, axis=1)[:, :50]
    hits = np.mean([
        np.isin(nbrs[s, : cfg.KL], true50[i]).mean() for i, s in enumerate(sample)
    ])
    assert hits > 0.8, f"local links poorly connected: {hits}"


def test_build_deterministic(base, cfg):
    g1, _ = build_graph(base, cfg, 0.5, refinement_iterations=0, chunk=N)
    g2, _ = build_graph(base, cfg, 0.5, refinement_iterations=0, chunk=N)
    for l in range(cfg.L):
        np.testing.assert_array_equal(
            np.asarray(g1.neighbors[l]), np.asarray(g2.neighbors[l])
        )


def test_quantizer_guard_falls_back_on_heavy_tails():
    """A single outlier dimension must disable the u8 walk metric
    (ADVICE round 1: min/max affine fit + heavy tails = noise distances)."""
    from ggnn_tpu.build.construction import _BuildContext

    rng = np.random.default_rng(0)
    data = rng.random((1024, 32)).astype(np.float32)
    cfg = GraphConfig.create(1024, 32, 12)

    ctx = _BuildContext(
        jnp.asarray(data), cfg, DistanceMeasure.Euclidean, 0.5, 1234, 1024
    )
    ctx.nn1_stats = jnp.asarray([0.5, 1.0], jnp.float32)
    ctx._ensure_codes()
    assert ctx._quant_usable()  # well-conditioned data passes

    bad = data.copy()
    bad[:, 0] *= 1e6  # one heavy-tailed dimension
    ctx2 = _BuildContext(
        jnp.asarray(bad), cfg, DistanceMeasure.Euclidean, 0.5, 1234, 1024
    )
    ctx2.nn1_stats = jnp.asarray([0.5, 1.0], jnp.float32)
    ctx2._ensure_codes()
    assert not ctx2._quant_usable()  # dequantization error >> 1-NN distance


def test_sort_mutual_filter_bit_identical():
    """The sort-based phase-i mutual filter makes the same decisions as the
    gather formulation on arbitrary tables (round-5 sym lever)."""
    import numpy as np
    import jax.numpy as jnp
    from ggnn_tpu.build.sym import _rows_needing_walk, _rows_needing_walk_sort

    rng = np.random.default_rng(0)
    for Nl, K, KL in [(500, 12, 8), (2048, 24, 12), (97, 6, 4)]:
        nbrs = rng.integers(-1, Nl, size=(Nl, K)).astype(np.int32)
        a = np.asarray(_rows_needing_walk(jnp.asarray(nbrs), KL=KL))
        b = np.asarray(_rows_needing_walk_sort(jnp.asarray(nbrs), KL=KL))
        np.testing.assert_array_equal(a, b)
