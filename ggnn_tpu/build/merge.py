"""Hierarchical descent merge: rebuild a layer's neighborhoods by searching
down from a top layer.

TPU-native replacement for the reference ``MergeKernel``
(src/ggnn/construction/merge_layer.cu:63-158): for every node of
``layer_btm``, seed a beam with the node's top-layer segment, descend layer by
layer (remapping beam ids through ``selection``), run the best-first loop at
each layer, and finally write the best KBuild neighbors (minus the node's own
self-link). On layer 0 the 1-NN distance is recorded for the nn1 statistics.

The reference writes into a double buffer and copies back afterwards
(graph_construction.cu:292-295) so all nodes read the *pre-merge* graph; here
each chunk reads the same input arrays and results are scattered into a fresh
output, which is equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ggnn_tpu.config import MERGE_MAX_ITERATIONS, DistanceMeasure, GraphConfig
from ggnn_tpu.ops.beam import beam_init, beam_insert, beam_transform
from ggnn_tpu.ops.distance import dist_block
from ggnn_tpu.ops.traverse import best_first_search, gather_dists, seed_beam
from ggnn_tpu.query.fused import fused_best_first, fused_best_first_compacted

__all__ = ["merge_layer"]


def _top_seg_offset(n, layer_top, layer_btm, cfg: GraphConfig):
    """Start of the top-layer segment covering node ``n`` of ``layer_btm``
    (merge_layer.cu:40-61)."""
    if layer_btm == 0:
        offset_points = cfg.S0_off * (cfg.S0 + 1)
        seg_btm = jnp.where(
            n < offset_points,
            n // (cfg.S0 + 1),
            cfg.S0_off + (n - offset_points) // cfg.S0,
        )
    else:
        seg_btm = n // cfg.S
    powG = cfg.G ** (layer_top - layer_btm)
    return (seg_btm // powG) * cfg.S


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "layer_top", "layer_btm", "measure", "pops_per_iter",
        "use_pallas", "num_seeds",
    ),
)
def _merge_chunk(
    n,  # [B] node ids of layer_btm (tail chunks clamp ids; extra rows are
    #     recomputed duplicates that the caller slices off)
    base,
    base_sq,
    neighbors,  # tuple of L neighbor tables
    selection,  # tuple of L selection arrays
    translation,  # tuple of L translation arrays
    nn1_stats,  # [2]
    tau_build,  # scalar f32
    adjs,  # per-layer AdjacencyTables tuple (None entries = f32 row path)
    reps,  # None | (rep_local [R], rep_vecs [R, D], rep_sq [R]): dense seeding
    *,
    cfg: GraphConfig,
    layer_top: int,
    layer_btm: int,
    measure: DistanceMeasure,
    pops_per_iter: int = 1,
    use_pallas: bool = False,
    num_seeds: int = 16,
):
    B = n.shape[0]
    KBuild = cfg.KBuild
    width, vis_size = cfg.merge_beam_geometry()
    k_best = KBuild + 1  # merge_layer.cuh:40: BEST holds KBuild+1 (self + K)

    # slack (merge_layer.cu:74-76): mean 1-NN distance scaled by tau_build
    if measure == DistanceMeasure.Euclidean:
        xi = (nn1_stats[0] * nn1_stats[0]) * tau_build * tau_build
    else:
        xi = nn1_stats[0] * tau_build

    m = translation[layer_btm][n] if layer_btm else n
    q_vecs = base[m].astype(jnp.float32)
    q_sq = base_sq[m]

    state = beam_init(B, width, xi, vis_size)

    if reps is not None:
        # dense seeding (the query engine's rep scan applied to the build,
        # query/fused.py:525-539): score every layer_btm+1 representative
        # against the whole chunk in one MXU tile and enter the best
        # ``num_seeds`` directly into the layer_btm beam. Replaces the
        # reference's segment-seeded hierarchic descent
        # (merge_layer.cu:86-121) whose upper-layer best-first legs cost
        # more than the layer_btm search itself (measured at 262k; see
        # docs/design.md) while finding *graph*-nearest upper nodes -- the
        # dense scan finds the distance-nearest ones exactly.
        rep_local, rep_vecs, rep_sq = reps
        seed_d_all = dist_block(
            q_vecs, rep_vecs, measure, q_sq=q_sq, c_sq=rep_sq
        )
        seed_d, pos = jax.lax.approx_min_k(
            seed_d_all, min(num_seeds, rep_vecs.shape[0])
        )
        seed_ids = rep_local[pos].astype(jnp.int32)
        # when n is itself a representative its distance-0 seed would
        # duplicate the own-id insert below, violating beam_insert's
        # unique-ids contract (the survivor becomes a wasted self-link slot)
        dup = seed_ids == n[:, None]
        seed_ids = jnp.where(dup, jnp.int32(-1), seed_ids)
        seed_d = jnp.where(dup, jnp.inf, seed_d)
        no_crit = jnp.full((B,), jnp.inf, jnp.float32)
        state = beam_insert(state, seed_ids, seed_d, criteria=no_crit)
        trans_btm = translation[layer_btm] if layer_btm else None
        d_own, _ = gather_dists(
            q_vecs, q_sq, n[:, None], base, base_sq, trans_btm, measure
        )
        state = beam_insert(state, n[:, None], d_own, criteria=no_crit)
        descent_layers = [layer_btm]
    else:
        # seed with the node's top-layer segment (merge_layer.cu:86-97)
        s_offset = _top_seg_offset(n, layer_top, layer_btm, cfg)
        seeds = s_offset[:, None] + jnp.arange(cfg.S, dtype=jnp.int32)[None, :]
        state = seed_beam(
            state,
            q_vecs,
            q_sq,
            seeds,
            base,
            base_sq,
            translation[layer_top],
            measure,
        )
        descent_layers = list(range(layer_top - 1, layer_btm - 1, -1))

    # hierarchic descent (merge_layer.cu:100-121)
    for layer in descent_layers:
        if reps is None:
            state = beam_transform(state, selection[layer + 1], keep=k_best)
        trans_l = translation[layer] if layer else None
        if layer == layer_btm and reps is None:
            # fetch the node itself (merge_layer.cu:103-104)
            d_own, _ = gather_dists(
                q_vecs, q_sq, n[:, None], base, base_sq, trans_l, measure
            )
            state = beam_insert(
                state, n[:, None], d_own,
                criteria=jnp.full((B,), jnp.inf, jnp.float32),
            )
        adj_l = adjs[layer] if adjs is not None else None
        if adj_l is not None:
            # quantized-adjacency fetch: one contiguous code block per
            # popped anchor instead of per-candidate f32 row gathers --
            # the fused query engine's layout applied to construction
            # (the reference's native uint8 mode builds in this metric).
            # Applied at EVERY descent layer: the upper-layer legs ran on
            # 512 B row gathers and cost more than the layer-0 search
            # (measured 262k: merge[2->0] 38.4 s vs merge[1->0] 17.7 s).
            if layer == layer_btm:
                # final leg: rows run to CONVERGENCE, so converged-row
                # compaction pays off here (the query sweep's phase
                # machinery, bit-identical; only the k_best prefix is
                # needed downstream -- no state survives this leg)
                beam_out = fused_best_first_compacted(
                    state,
                    q_vecs,
                    q_sq,
                    adj_l,
                    measure,
                    MERGE_MAX_ITERATIONS,
                    k_best=k_best,
                    pops_per_iter=pops_per_iter,
                    use_pallas=use_pallas,
                )
                break
            state = fused_best_first(
                state,
                q_vecs,
                q_sq,
                adj_l,
                measure,
                MERGE_MAX_ITERATIONS,
                k_best=k_best,
                pops_per_iter=pops_per_iter,
                use_pallas=use_pallas,
            )
        else:
            state = best_first_search(
                state,
                q_vecs,
                q_sq,
                neighbors[layer],
                base,
                base_sq,
                trans_l,
                measure,
                MERGE_MAX_ITERATIONS,
                k_best=k_best,
                pops_per_iter=pops_per_iter,
            )
    else:
        beam_out = state.best(k_best)

    # write-out with self-link removal (merge_layer.cu:123-145)
    best_i, best_d = beam_out  # [B, KBuild+1]
    own_eq = best_i[:, :KBuild] == n[:, None]
    own_found = jnp.any(own_eq, axis=-1)
    own_pos = jnp.where(own_found, jnp.argmax(own_eq, axis=-1), -1).astype(jnp.int32)

    k = jnp.arange(KBuild, dtype=jnp.int32)[None, :]
    shift = (k >= own_pos[:, None]).astype(jnp.int32)
    out = jnp.take_along_axis(best_i, k + shift, axis=-1)
    out = jnp.where(out == -1, n[:, None], out)

    # 1-NN distance for layer 0 (merge_layer.cu:147-157): first nonzero best
    # distance after the node's own entry
    idx = jnp.arange(best_d.shape[-1], dtype=jnp.int32)[None, :]
    cand = (idx > own_pos[:, None]) & (best_d != 0.0)
    found = jnp.any(cand, axis=-1)
    first = jnp.argmax(cand, axis=-1)
    nn1 = jnp.where(
        found, jnp.take_along_axis(best_d, first[:, None], axis=-1)[:, 0], 0.0
    )
    if measure == DistanceMeasure.Euclidean:
        nn1 = jnp.sqrt(nn1)
    nn1 = jnp.where(jnp.isfinite(nn1), nn1, 0.0)

    return out, nn1


def merge_layer(
    base: jax.Array,
    base_sq: jax.Array,
    neighbors: tuple,
    selection: tuple,
    translation: tuple,
    nn1_stats: jax.Array,
    cfg: GraphConfig,
    layer_top: int,
    layer_btm: int,
    measure: DistanceMeasure,
    tau_build: float,
    chunk: int = 8192,
    pops_per_iter: int = 8,
    adjs=None,
    use_pallas: bool = False,
    dense_seed: bool = False,
    num_seeds: int = 16,
):
    """Rebuild ``layer_btm`` neighborhoods by descending from ``layer_top``.

    With ``dense_seed`` the hierarchic descent is replaced by one dense MXU
    scan against the layer_btm+1 representatives (exact distance-nearest
    entry points; the upper-layer best-first legs disappear entirely).

    Returns (new_neighbors [Ns[layer_btm], KBuild], nn1 [Ns[layer_btm]]).
    """
    from ggnn_tpu.utils.timing import hard_sync  # noqa: PLC0415

    reps = None
    if dense_seed and layer_top > layer_btm:
        sel = selection[layer_btm + 1]  # layer_btm-local ids of the reps
        tr = translation[layer_btm + 1]  # their base ids
        rep_vecs = base[tr].astype(jnp.float32)
        reps = (sel, rep_vecs, base_sq[tr])

    Ns = cfg.Ns[layer_btm]
    chunk = min(chunk, Ns)
    out_rows = []
    out_nn1 = []
    tau = jnp.float32(tau_build)
    for start in range(0, Ns, chunk):
        if start and (start // chunk) % 8 == 0:
            # bound the device-work backlog behind any single blocking RPC
            # (the axon relay kills waits over ~70 s; see utils.hard_sync)
            hard_sync(out_rows[-1])
        ids = jnp.arange(start, start + chunk, dtype=jnp.int32)
        ids = jnp.minimum(ids, Ns - 1)
        rows, nn1 = _merge_chunk(
            ids,
            base,
            base_sq,
            neighbors,
            selection,
            translation,
            nn1_stats,
            tau,
            adjs,
            reps,
            cfg=cfg,
            layer_top=layer_top,
            layer_btm=layer_btm,
            measure=DistanceMeasure(measure),
            pops_per_iter=pops_per_iter,
            use_pallas=use_pallas,
            num_seeds=num_seeds,
        )
        out_rows.append(rows)
        out_nn1.append(nn1)
    new_nbrs = jnp.concatenate(out_rows, axis=0)[:Ns]
    new_nn1 = jnp.concatenate(out_nn1, axis=0)[:Ns]
    return new_nbrs, new_nn1
