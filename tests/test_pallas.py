"""The Pallas fetch+dot kernel vs the XLA gather+einsum oracle.

Runs the Mosaic kernel in interpret mode (tests are on the virtual-CPU
backend); on a real TPU the compiled kernel follows the same path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ggnn_tpu.ops.adjacency_pallas import adjacency_dot, adjacency_dot_xla


@pytest.mark.parametrize("P", [4, 8])
def test_adjacency_dot_matches_xla(P):
    rng = np.random.default_rng(7)
    B, K, D, N = 16, 24, 128, 300
    qs = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    anchors = jnp.asarray(rng.integers(-1, N, size=(B, P)).astype(np.int32))
    codes = jnp.asarray(rng.integers(0, 256, size=(N, K, D)).astype(np.uint8))
    ref = np.asarray(adjacency_dot_xla(qs, anchors, codes))
    out = np.asarray(adjacency_dot(qs, anchors, codes, interpret=True))
    assert out.shape == (B, P, K)
    # EMPTY (-1) anchors issue no DMA: their output lanes are undefined and
    # masked by every caller (fused.py:_code_dists), so compare valid only
    valid = (np.asarray(anchors) >= 0)[:, :, None]
    np.testing.assert_allclose(
        np.where(valid, out, 0.0), np.where(valid, ref, 0.0), rtol=1e-5, atol=1e-2
    )


@pytest.mark.parametrize("P", [4, 8])
def test_adjacency_dot_nibbles_matches_xla(P):
    """int4 path: two neighbors per code row, dot columns [low | high]."""
    rng = np.random.default_rng(11)
    B, K, D, N = 16, 24, 128, 300  # K = code ROWS -> 2K candidates
    qs = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    anchors = jnp.asarray(rng.integers(-1, N, size=(B, P)).astype(np.int32))
    c4 = rng.integers(0, 16, size=(N, 2 * K, D)).astype(np.uint8)
    packed = jnp.asarray(c4[:, 0::2, :] | (c4[:, 1::2, :] << 4))
    ref = np.asarray(adjacency_dot_xla(qs, anchors, packed, nibbles=True))
    out = np.asarray(
        adjacency_dot(qs, anchors, packed, nibbles=True, interpret=True)
    )
    assert out.shape == (B, P, 2 * K)
    valid = (np.asarray(anchors) >= 0)[:, :, None]
    np.testing.assert_allclose(
        np.where(valid, out, 0.0), np.where(valid, ref, 0.0), rtol=1e-5, atol=1e-2
    )
    # the low-nibble half must equal the even original columns' exact dots
    lo = np.einsum(
        "bd,bpkd->bpk",
        np.asarray(qs),
        c4[np.clip(np.asarray(anchors), 0, None)][:, :, 0::2, :].astype(
            np.float32
        ),
    )
    np.testing.assert_allclose(
        np.where(valid, out[:, :, :K], 0.0), np.where(valid, lo, 0.0),
        rtol=1e-2, atol=2.0,
    )


def test_adjacency_dot_unaligned_falls_back():
    # D not lane-aligned or B % qt != 0 must route to the XLA path
    rng = np.random.default_rng(3)
    B, P, K, D, N = 5, 4, 8, 96, 50
    qs = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    anchors = jnp.asarray(rng.integers(0, N, size=(B, P)).astype(np.int32))
    codes = jnp.asarray(rng.integers(0, 256, size=(N, K, D)).astype(np.uint8))
    out = np.asarray(adjacency_dot(qs, anchors, codes))
    ref = np.asarray(adjacency_dot_xla(qs, anchors, codes))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-2)


def test_fused_query_pallas_flag_cpu():
    # the fused tile with use_pallas resolving on CPU must pick the XLA path
    # and produce identical results to the explicit XLA flag
    from ggnn_tpu.config import GraphConfig
    from ggnn_tpu.build.construction import build_graph
    from ggnn_tpu.query.fused import build_fused_index, fused_query

    rng = np.random.default_rng(0)
    N, D = 2048, 128
    base = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    cfg = GraphConfig.create(N=N, D=D, KBuild=24)
    graph, _ = build_graph(base, cfg, 0.5, refinement_iterations=0, seed=0)
    index = build_fused_index(base, graph, cfg)
    query = jnp.asarray(rng.normal(size=(64, D)).astype(np.float32))
    ids_auto, _ = fused_query(query, index, base, 10, 0.6, 50)
    ids_xla, _ = fused_query(query, index, base, 10, 0.6, 50, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(ids_auto), np.asarray(ids_xla))
