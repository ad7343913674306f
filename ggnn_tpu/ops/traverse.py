"""Batched best-first graph traversal (shared by construction merge & query).

TPU-native replacement for the reference's per-block traversal loops
(src/ggnn/query/query_layer.cu:57-79, src/ggnn/construction/merge_layer.cu:
100-121): a `lax.while_loop` over a whole batch of rows, where each iteration
pops P anchors per row from the flagged beam, gathers their neighbor rows,
dedups candidate ids, computes an MXU/VPU distance tile against the per-row
query, and sorted-merges the admitted candidates back into the beam. Rows
converge independently via masks; the loop exits once every row is done (or
at the ``max_iterations`` pop budget).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ggnn_tpu.config import DistanceMeasure
from ggnn_tpu.ops.beam import (
    BeamState,
    beam_compact_candidates,
    beam_dedup_mask,
    beam_insert,
    beam_pop,
)
from ggnn_tpu.ops.distance import dist_gathered

__all__ = ["gather_dists", "seed_beam", "best_first_search", "beam_active"]


def gather_dists(
    q_vecs: jax.Array,
    q_sq: jax.Array,
    ids: jax.Array,
    base: jax.Array,
    base_sq: jax.Array,
    translation: jax.Array | None,
    measure: DistanceMeasure,
):
    """Distances from per-row queries to per-row candidate ids.

    ``ids`` are layer-local ids ([B, K]); ``translation`` (if given) maps them
    to base ids first (merge_layer.cu:118 passes d_translation into fetch).
    Invalid ids (-1) produce arbitrary distances -- callers mask them.

    Returns (dists [B, K], base_ids [B, K]).
    """
    safe = jnp.clip(ids, 0, None)
    if translation is not None and translation.shape[0]:
        base_ids = translation[safe]
    else:
        base_ids = safe
    vecs = base[base_ids]  # [B, K, D]
    cand_sq = base_sq[base_ids]
    d = dist_gathered(q_vecs, vecs, measure, q_sq=q_sq, cand_sq=cand_sq)
    return d, base_ids


def seed_beam(
    state: BeamState,
    q_vecs: jax.Array,
    q_sq: jax.Array,
    seed_ids: jax.Array,
    base: jax.Array,
    base_sq: jax.Array,
    translation: jax.Array | None,
    measure: DistanceMeasure,
    valid: jax.Array | None = None,
) -> BeamState:
    """Insert starting points unconditionally (the batched
    ``fetch_unfiltered``)."""
    ok = beam_dedup_mask(state, seed_ids, valid)
    seed_ids = jnp.where(ok, seed_ids, -1)
    d, _ = gather_dists(q_vecs, q_sq, seed_ids, base, base_sq, translation, measure)
    no_crit = jnp.full((state.batch,), jnp.inf, jnp.float32)
    return beam_insert(state, seed_ids, d, criteria=no_crit)


def best_first_search(
    state: BeamState,
    q_vecs: jax.Array,
    q_sq: jax.Array,
    nbr_table: jax.Array,
    base: jax.Array,
    base_sq: jax.Array,
    translation: jax.Array | None,
    measure: DistanceMeasure,
    max_iterations: int,
    k_best: int,
    dynamic_xi: Callable[[BeamState], jax.Array] | None = None,
    pops_per_iter: int = 1,
    fetch_cap_fraction: float = 0.5,
    warm: bool = False,
) -> BeamState:
    """Run the best-first expansion loop until convergence.

    Args:
      state: seeded beam state.
      q_vecs/q_sq: [B, D]/[B] per-row query vectors and squared norms.
      nbr_table: [N_layer, K] int32 neighbor lists of the layer searched.
      translation: optional [N_layer] layer->base id map.
      max_iterations: total anchor-pop budget (MAX_ITERATIONS=200 for merge,
        user max_iterations for query). Matches the reference's per-query
        iteration count regardless of ``pops_per_iter``.
      k_best: size of the logical best list feeding the stopping criterion
        ``d[k_best-1] + xi`` (KQuery for queries, KBuild+1 for merge).
      dynamic_xi: optional per-iteration slack update (query_layer.cu:58-63).
      pops_per_iter: anchors expanded per loop step. 1 reproduces the
        reference visit order exactly; >1 shortens the sequential loop by
        that factor and widens the per-step distance tile (TPU-friendly).
      fetch_cap_fraction: after id-dedup, candidates are packed left and the
        vector gather is capped at this fraction of the raw tile (graph walks
        re-encounter most ids, so typically <50% survive dedup; capping
        halves the HBM gather volume -- the reference's fetch also filters
        known ids before computing any distance,
        simple_knn_cache.cuh:246-261). Survivors beyond the cap are dropped
        (rare; costs a revisit at most). The first two expansions always run
        uncapped: with an empty beam nearly every candidate survives dedup.
      warm: set when resuming an already-expanded beam (skips the uncapped
        first expansions).
    """
    K = nbr_table.shape[-1]
    P = max(1, pops_per_iter)
    steps = -(-max_iterations // P)
    # Lane-pad the neighbor table before the loop: gathering raw [*, K] i32
    # rows issues sub-lane (~96-byte) fetches that XLA:TPU runs ~50x below
    # 512-byte-row gather bandwidth (measured in the sym bulk filter). The
    # pad is loop-invariant (hoisted once per compiled chunk); the gather
    # result is sliced straight back to K columns.
    lanes = 128
    if K % lanes:
        nbr_wide = jnp.pad(
            nbr_table, ((0, 0), (0, lanes - K % lanes)), constant_values=-1
        )
    else:
        nbr_wide = nbr_table
    if P == 1 or fetch_cap_fraction >= 1.0:
        cap = P * K
    else:
        cap = min(P * K, max(K, int(P * K * fetch_cap_fraction + 7) // 8 * 8))

    def step(st, cap_now):
        if dynamic_xi is not None:
            st = st._replace(xi=dynamic_xi(st))
        anchors, active, st = beam_pop(st, P, k_best)  # [B, P]
        safe_anchor = jnp.where(anchors != -1, anchors, 0)
        nbrs = nbr_wide[safe_anchor][:, :, :K].reshape(anchors.shape[0], P * K)
        valid = jnp.repeat(anchors != -1, K, axis=-1, total_repeat_length=P * K)
        # dedup on ids BEFORE fetching vectors, then compact the survivors
        ok = beam_dedup_mask(st, nbrs, valid)
        cand = beam_compact_candidates(nbrs, ok, cap_now)
        d, _ = gather_dists(q_vecs, q_sq, cand, base, base_sq, translation, measure)
        st = beam_insert(st, cand, d, row_mask=active, criteria=st.criteria(k_best))
        return st, active

    def cond(carry):
        st, it, alive = carry
        return (it < steps) & alive

    def body(carry):
        st, it, _ = carry
        st, active = step(st, cap)
        return st, it + 1, jnp.any(active)

    if cap < P * K and not warm:
        state, _ = step(state, P * K)
        state, _ = step(state, P * K)
        steps = max(0, steps - 2)

    state, _, _ = jax.lax.while_loop(
        cond, body, (state, jnp.int32(0), jnp.bool_(True))
    )
    return state


def beam_active(state: BeamState, k_best: int) -> jax.Array:
    """Whether the next pop of each row would still fire ([B] bool)."""
    crit = state.criteria(k_best)
    return jnp.any(
        ~state.exp & (state.i != -1) & (state.d < crit[:, None]), axis=-1
    )
