"""Multi-chip query execution over a device mesh.

TPU-native replacement for the reference's multi-GPU scheme. The reference
has *no* inter-GPU communication at all: one host thread per GPU queries its
shard, partial results are D2H-copied and k-way-merged on the CPU
(src/ggnn/base/ggnn.cu:308-326, src/ggnn/base/result_merger.cpp:79-142).

Here one *logical* index spans chips: base and graph shards live one-per-chip
in a ``jax.sharding.Mesh``, every chip answers all queries against its local
shard under ``shard_map``, and the per-chip top-k candidates are merged
*on device* with an ``all_gather`` over ICI followed by a local top-k
(SURVEY.md section 5.8) -- no host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ggnn_tpu.config import DistanceMeasure, GraphConfig
from ggnn_tpu.graph import Graph
from ggnn_tpu.ops.distance import dist_block, squared_norms
from ggnn_tpu.ops.topk import merge_topk
from ggnn_tpu.query.ann import _query_cold
from ggnn_tpu.query.fused import FusedIndex, _fused_query_tile

__all__ = [
    "make_mesh",
    "stack_shards",
    "sharded_query",
    "sharded_fused_query",
    "sharded_bf_query",
]

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    """A 1-D mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=(AXIS,))


def stack_shards(shards: list) -> Graph | jax.Array:
    """Stack per-shard pytrees along a new leading (mesh) axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *shards)


def _merge_over_ici(ids, dists, k: int, n_shard: int):
    """Offset local ids to global, all_gather over ICI, local top-k."""
    shard_idx = jax.lax.axis_index(AXIS)
    ids = jnp.where(ids >= 0, ids + shard_idx * n_shard, ids)
    all_ids = jax.lax.all_gather(ids, AXIS)  # [ndev, Q, k]
    all_d = jax.lax.all_gather(dists, AXIS)
    Q = ids.shape[0]
    all_ids = jnp.moveaxis(all_ids, 0, 1).reshape(Q, -1)
    all_d = jnp.moveaxis(all_d, 0, 1).reshape(Q, -1)
    neg_d, order = jax.lax.top_k(-all_d, k)
    return jnp.take_along_axis(all_ids, order, axis=1), -neg_d


def sharded_query(
    mesh: Mesh,
    base_stack: jax.Array,  # [ndev, N_shard, D]
    graph_stack: Graph,  # leaves stacked along a leading [ndev] axis
    cfg: GraphConfig,
    query: jax.Array,  # [Q, D] replicated
    KQuery: int,
    tau_query: float,
    max_iterations: int = 400,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    pops_per_iter: int = 8,
    fetch_cap_fraction: float = 0.75,
):
    """Query one logical index sharded across the mesh.

    Returns replicated (ids [Q, KQuery] global, dists [Q, KQuery]).
    ``pops_per_iter`` must match the single-shard path (ann_query) for
    bit-identical results across execution strategies.
    """
    measure = DistanceMeasure(measure)
    width, vis_size = GraphConfig.query_beam_geometry(KQuery, max_iterations)
    n_shard = base_stack.shape[1]
    tau = jnp.float32(tau_query)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), jax.tree.map(lambda _: P(AXIS), graph_stack), P(), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def run(base_s, graph_s, q, tau_s):
        base = base_s[0]
        graph = jax.tree.map(lambda x: x[0], graph_s)
        state, _ = _query_cold(
            q,
            graph.neighbors[0],
            graph.translation[cfg.L - 1],
            base,
            squared_norms(base),
            graph.nn1_stats,
            tau_s,
            width=width,
            vis_size=vis_size,
            k_query=KQuery,
            measure=measure,
            budget=max_iterations,
            pops_per_iter=pops_per_iter,
            fetch_cap_fraction=fetch_cap_fraction,
        )
        ids, dists = state.best(KQuery)
        return _merge_over_ici(ids, dists, KQuery, n_shard)

    return run(base_stack, graph_stack, query, tau)


def sharded_fused_query(
    mesh: Mesh,
    base_stack: jax.Array,  # [ndev, N_shard, D]
    index_stack: FusedIndex,  # leaves stacked along a leading [ndev] axis
    query: jax.Array,  # [Q, D] replicated
    KQuery: int,
    tau_query: float,
    max_iterations: int = 400,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    pops_per_iter: int = 16,
    num_seeds: int = 16,
    use_pallas: bool | None = None,
    compact_levels: int = 0,
    seed_approx: bool = False,
):
    """The fused quantized-adjacency engine sharded across the mesh: every
    chip walks its own shard's inline-code graph, results merge over ICI."""
    measure = DistanceMeasure(measure)
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    width, vis_size = GraphConfig.query_beam_geometry(KQuery, max_iterations)
    # budget-sized visited ring (never wraps => semantics-identical; see
    # fused_query)
    P_ = max(1, pops_per_iter)
    total_pops = -(-max_iterations // P_) * P_
    vis_size = min(vis_size, max(32, -(-total_pops // 32) * 32))
    n_shard = base_stack.shape[1]
    cand_per_fetch = int(index_stack.nbr_ids.shape[2])
    num_seeds = min(num_seeds, int(index_stack.rep_ids.shape[1]))
    rerank = min(width, max(2 * KQuery, 32))
    cap = max(64, (max(1, pops_per_iter) * cand_per_fetch) // 4)
    tau = jnp.float32(tau_query)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(AXIS),
            jax.tree.map(lambda _: P(AXIS), index_stack),
            P(),
            P(),
        ),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def run(base_s, idx_s, q, tau_s):
        base = base_s[0]
        idx = jax.tree.map(lambda x: x[0], idx_s)
        ids, dists = _fused_query_tile(
            q, idx, base, squared_norms(base), tau_s,
            width=width, vis_size=vis_size, k_query=KQuery, measure=measure,
            max_iterations=max_iterations, pops_per_iter=max(1, pops_per_iter),
            num_seeds=num_seeds, rerank=rerank, cap=cap,
            use_pallas=use_pallas, compact_levels=compact_levels,
            seed_approx=seed_approx,
        )
        return _merge_over_ici(ids, dists, KQuery, n_shard)

    return run(base_stack, index_stack, query, tau)


def sharded_bf_query(
    mesh: Mesh,
    base_stack: jax.Array,  # [ndev, N_shard, D]
    query: jax.Array,
    k: int,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    tile_base: int = 8192,
):
    """Exact kNN over a base sharded across the mesh: per-chip tiled matmul
    top-k, then an ICI all_gather merge (the SURVEY.md 2.4 design)."""
    measure = DistanceMeasure(measure)
    n_shard = base_stack.shape[1]
    k_local = min(k, n_shard)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def run(base_s, q):
        base = base_s[0]
        q32 = q.astype(jnp.float32)
        q_sq = squared_norms(q32)
        tile = min(tile_base, n_shard)
        num_tiles = -(-n_shard // tile)
        pad = num_tiles * tile - n_shard
        b = jnp.pad(base, ((0, pad), (0, 0))) if pad else base
        tiles = b.reshape(num_tiles, tile, -1)

        def scan_tile(carry, inp):
            best_d, best_i = carry
            t_idx, t = inp
            d = dist_block(
                q32,
                t.astype(jnp.float32),
                measure,
                q_sq=q_sq,
                precision=jax.lax.Precision.HIGHEST,
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + t_idx * tile
            d = jnp.where(col < n_shard, d, jnp.inf)
            ids = jnp.broadcast_to(col, d.shape)
            td, ti = jax.lax.top_k(-d, min(k_local, tile))
            ti = jnp.take_along_axis(ids, ti, axis=1)
            return merge_topk(best_d, best_i, -td, ti, k_local), None

        init = (
            jnp.full((q.shape[0], k_local), jnp.inf, jnp.float32),
            jnp.full((q.shape[0], k_local), -1, jnp.int32),
        )
        (best_d, best_i), _ = jax.lax.scan(
            scan_tile, init, (jnp.arange(num_tiles, dtype=jnp.int32), tiles)
        )
        return _merge_over_ici(best_i, best_d, min(k, k_local * mesh.size), n_shard)

    return run(base_stack, query)
