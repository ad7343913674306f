"""Batched best-first graph traversal state (the TPU "SimpleKNNCache").

The reference keeps per-query traversal state in CUDA shared memory: a sorted
best list ``[0, BEST)``, a sorted priority-queue ring ``[BEST, SORTED)`` and a
visited ring ``[SORTED, CACHE)`` (include/ggnn/cuda_utils/
simple_knn_cache.cuh:41-87). One block serves one query and runs a
data-dependent while loop: pop the queue head, fetch its neighbors, dedup
against all three segments, shift-insert admitted candidates.

On TPU the state is ONE sorted array per row with an "expanded" flag -- the
*flagged beam* -- plus an id-only visited ring:

  * ``d/i [B, W]``   -- the W best candidates ever admitted, sorted ascending
                        (W = the reference's SORTED size, best+queue).
  * ``exp [B, W]``   -- True once a slot's node has been expanded. The
                        reference's best-list/queue split collapses into this
                        flag: "queue" = unexpanded entries, results = the
                        leading ``k_best`` entries.
  * ``vis [B, V]``   -- ring of expanded ids (dedup history). Expanded
                        entries usually stay in the beam, but once one is
                        pushed past column W it would otherwise be re-added
                        and re-expanded through a back-edge -- the reference's
                        visited ring ([SORTED, CACHE)) exists for exactly
                        this, and dropping it measurably hurts both recall
                        and speed.
  * ``xi [B]``       -- slack for the stopping criterion.

``pop`` selects the first P unexpanded entries below ``d[K_best-1] + xi``
(the reference's ``best.worst() + xi`` criterion), flags them and records
them in the ring; ``insert`` is one 3-operand sorted merge. Compared to a
literal translation this does one merge per step instead of two and needs no
ring *reshuffling* -- the VPU-bound costs the ablation showed at ~40% of
query step time.

Rows converge independently via masks; the surrounding ``lax.while_loop``
ends when every row's pop comes up empty (the batched equivalent of the
reference's per-block ``break``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "BeamState",
    "beam_init",
    "beam_dedup_mask",
    "beam_compact_candidates",
    "beam_insert",
    "beam_pop",
    "beam_transform",
]

EMPTY_ID = -1
EMPTY_DIST = jnp.inf


class BeamState(NamedTuple):
    d: jax.Array  # [B, W] f32, sorted ascending, inf = empty
    i: jax.Array  # [B, W] i32, -1 = empty
    exp: jax.Array  # [B, W] bool, True = already expanded
    vis: jax.Array  # [B, V] i32 ring of expanded ids (-1 = empty)
    vis_head: jax.Array  # [B] i32 next ring slot
    xi: jax.Array  # [B] f32

    @property
    def batch(self) -> int:
        return self.d.shape[0]

    @property
    def width(self) -> int:
        return self.d.shape[1]

    def best(self, k: int):
        """The current k best (ids, dists), sorted ascending."""
        return self.i[:, :k], self.d[:, :k]

    def criteria(self, k_best: int) -> jax.Array:
        """``best.worst() + xi`` (simple_knn_cache.cuh:121-124). While fewer
        than ``k_best`` entries exist the k-th distance is inf, so everything
        is admitted -- matching the reference's EMPTY_DIST-initialized best
        list."""
        return self.d[:, k_best - 1] + self.xi


def beam_init(
    batch: int, width: int, xi: jax.Array, vis_size: int = 0,
    dist_dtype=jnp.float32,
) -> BeamState:
    """Empty beam of the given width and visited-ring size; ``xi``: [B] or
    scalar slack.

    ``dist_dtype=bfloat16`` halves the key bytes of every sorted merge in
    the walk (the beam's distances only order the frontier and gate the
    criterion -- final distances come from the exact f32 re-rank). The
    construction merge keeps f32: build output must stay bit-deterministic.
    """
    xi = jnp.broadcast_to(jnp.asarray(xi, jnp.float32), (batch,))
    return BeamState(
        d=jnp.full((batch, width), EMPTY_DIST, dist_dtype),
        i=jnp.full((batch, width), EMPTY_ID, jnp.int32),
        exp=jnp.zeros((batch, width), bool),
        vis=jnp.full((batch, max(vis_size, 1)), EMPTY_ID, jnp.int32),
        vis_head=jnp.zeros((batch,), jnp.int32),
        xi=xi,
    )


def beam_dedup_mask(
    state: BeamState,
    cand_i: jax.Array,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Which candidates are new to the beam (the id-only part of ``fetch``).

    Mirrors simple_knn_cache.cuh:126-146 & 241-261: drop a candidate already
    present in the beam or earlier in this same tile. Run BEFORE gathering
    candidate vectors -- like the reference, which filters known ids before
    any distance computation -- so duplicate rows are never fetched from HBM.
    Returns a [B, K] bool mask.
    """
    K = cand_i.shape[1]
    ok = cand_i != EMPTY_ID
    if valid is not None:
        ok &= valid

    # dedup within the tile: keep the first occurrence only
    eq = cand_i[:, :, None] == cand_i[:, None, :]  # [B, K, K]
    lower = jnp.tril(jnp.ones((K, K), bool), k=-1)
    ok &= ~jnp.any(eq & lower[None], axis=-1)

    # dedup against the beam and the visited ring
    seen = jnp.concatenate([state.i, state.vis], axis=-1)
    ok &= ~jnp.any(cand_i[:, :, None] == seen[:, None, :], axis=-1)
    return ok


def beam_compact_candidates(cand_i: jax.Array, ok: jax.Array, cap: int):
    """Pack the surviving candidates left and truncate to ``cap`` columns.

    Graph walks re-encounter most neighbor ids, so after dedup typically less
    than half a tile survives; compacting before the vector gather halves the
    HBM gather volume (the dominant traversal cost on TPU). Order among
    survivors is preserved. Returns [B, cap] ids with EMPTY padding.
    """
    K = cand_i.shape[1]
    cap = min(cap, K)
    # stable sort by "dropped" flag packs survivors to the left in order
    key = (~ok).astype(jnp.int32)
    _, packed = jax.lax.sort((key, cand_i), dimension=-1, num_keys=1, is_stable=True)
    packed = jnp.where(
        jnp.arange(K, dtype=jnp.int32)[None, :] < jnp.sum(ok, axis=-1)[:, None],
        packed,
        EMPTY_ID,
    )
    return packed[:, :cap]


def beam_insert(
    state: BeamState,
    cand_i: jax.Array,
    cand_d: jax.Array,
    row_mask: jax.Array | None = None,
    *,
    criteria: jax.Array,
) -> BeamState:
    """Merge deduplicated candidates into the beam (one 3-operand sort).

    The admission criterion (fetch at simple_knn_cache.cuh:284) is applied
    here; ids must already be unique vs the beam and within the tile (see
    :func:`beam_dedup_mask`). EMPTY ids are ignored. Entries pushed past
    column W fall off -- exactly the reference's finite sorted cache.
    """
    ok = (cand_i != EMPTY_ID) & (cand_d < criteria[:, None])
    cand_d = jnp.where(ok, cand_d, EMPTY_DIST).astype(state.d.dtype)
    cand_i = jnp.where(ok, cand_i, EMPTY_ID)

    # pack (id, exp) into one i32 payload so the merge sort moves two
    # operands instead of three (the sorted merges are the VPU-bound ~40%
    # of a query step). ip = 2*id + exp; EMPTY -1 packs to -2 and both
    # unpackings below fall out of arithmetic shift/mask. Requires
    # id < 2^30 -- far above any per-shard N (shards cap out under 2^27).
    ip_state = state.i * 2 + state.exp
    ip_cand = cand_i * 2  # fresh candidates are never expanded

    d = jnp.concatenate([state.d, cand_d], axis=-1)
    ip = jnp.concatenate([ip_state, ip_cand], axis=-1)
    d, ip = jax.lax.sort((d, ip), dimension=-1, num_keys=1)
    W = state.width
    d, ip = d[:, :W], ip[:, :W]
    i = ip >> 1  # -2 >> 1 == -1: EMPTY survives the roundtrip
    exp = (ip & 1) == 1

    if row_mask is not None:
        m = row_mask[:, None]
        d = jnp.where(m, d, state.d)
        i = jnp.where(m, i, state.i)
        exp = jnp.where(m, exp, state.exp)
    return state._replace(d=d, i=i, exp=exp)


def beam_pop(
    state: BeamState,
    P: int,
    k_best: int,
    row_mask: jax.Array | None = None,
    *,
    criteria: jax.Array | None = None,
):
    """Select and flag the first P unexpanded entries passing the criterion.

    The batched widening of the reference pop (simple_knn_cache.cuh:215-239):
    the beam is sorted, so the P best unexpanded entries below
    ``d[k_best-1] + xi`` are this step's anchors. P=1 reproduces the
    reference's one-anchor-at-a-time visit order.

    Eviction matches the reference's segment split: a popped entry beyond the
    ``k_best`` result prefix is BLANKED (the reference removes the popped
    queue copy entirely, simple_knn_cache.cuh:233-235, keeping the full queue
    capacity for frontier; its id lives on in the visited ring for dedup). A
    popped entry inside the prefix stays -- it is the reference's best-list
    copy. Blanked slots leave the tail momentarily unsorted; the next
    insert's merge re-sorts, and the prefix -- everything criteria/results
    read -- is never blanked.

    Returns: (anchors [B, P] i32 with EMPTY padding, active [B] bool,
    new_state).
    """
    B, W = state.d.shape
    crit = state.criteria(k_best) if criteria is None else criteria
    mask = ~state.exp & (state.i != EMPTY_ID) & (state.d < crit[:, None])
    if row_mask is not None:
        mask &= row_mask[:, None]

    # first-P selection via prefix-sum ranks (cheaper than a sort: the beam
    # is already ordered, so the first P eligible columns ARE the P best)
    iota = jnp.arange(W, dtype=jnp.int32)[None, :]
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)  # inclusive, 1-based
    hit = mask & (rank <= P)  # [B, W] the popped positions
    oh = hit[:, :, None] & (
        rank[:, :, None] == jnp.arange(1, P + 1, dtype=jnp.int32)[None, None, :]
    )  # [B, W, P] one-hot by pop order
    anchors = jnp.sum((state.i + 1)[:, :, None] * oh.astype(jnp.int32), axis=1) - 1
    valid = anchors != EMPTY_ID

    evict = hit & (iota >= k_best)
    d = jnp.where(evict, EMPTY_DIST, state.d)
    i = jnp.where(evict, EMPTY_ID, state.i)
    exp = state.exp | hit

    # record popped ids in the visited ring (the reference appends on pop,
    # simple_knn_cache.cuh:230-236); out-of-range writes are dropped
    V = state.vis.shape[-1]
    cnt = jnp.sum(valid, axis=-1)
    slot = (state.vis_head[:, None] + jnp.arange(P, dtype=jnp.int32)[None, :]) % V
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    w_slot = jnp.where(valid, slot, V)
    vis = state.vis.at[rows, w_slot].set(anchors, mode="drop")
    vis_head = (state.vis_head + cnt) % V

    return anchors, jnp.any(valid, axis=-1), state._replace(
        d=d, i=i, exp=exp, vis=vis, vis_head=vis_head
    )


def beam_transform(state: BeamState, mapping: jax.Array, keep: int) -> BeamState:
    """Descend one layer: remap the best ``keep`` ids, reset expansion flags.

    Mirrors simple_knn_cache.cuh:297-333: best-list ids are remapped through
    ``mapping`` (selection: layer-l id -> layer-(l-1) id), everything becomes
    expandable again (the reference re-seeds its queue from the best list and
    clears the visited ring), entries beyond ``keep`` are dropped.
    """
    W = state.width
    col = jnp.arange(W, dtype=jnp.int32)[None, :]
    ok = (state.i != EMPTY_ID) & (col < keep)
    remapped = jnp.where(
        ok, mapping[jnp.clip(state.i, 0, mapping.shape[0] - 1)], EMPTY_ID
    )
    d = jnp.where(ok, state.d, EMPTY_DIST)
    return state._replace(
        i=remapped,
        d=d,
        exp=jnp.zeros_like(state.exp),
        vis=jnp.full_like(state.vis, EMPTY_ID),
        vis_head=jnp.zeros_like(state.vis_head),
    )
