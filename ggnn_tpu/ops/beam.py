"""Batched best-first graph traversal state (the TPU "SimpleKNNCache").

The reference keeps per-query traversal state in CUDA shared memory: a sorted
best list, a sorted priority-queue ring buffer, and a visited ring
(include/ggnn/cuda_utils/simple_knn_cache.cuh:41-87). One block serves one
query and runs a data-dependent while loop.

On TPU, traversal state lives in fixed-shape arrays over a *batch* of rows
(queries or nodes under construction), and each step is a dense masked update:

  * ``best_d/best_i [B, BEST]``  -- all-time top-BEST, sorted ascending.
  * ``q_d/q_i [B, QS]``          -- unvisited frontier, sorted ascending
                                    (the priority queue).
  * ``vis [B, V]``               -- ring of popped ids (dedup history).
  * ``xi [B]``                   -- slack for the stopping criterion
                                    ``head < best_worst + xi``.

``pop`` = take the queue head; ``push`` = dedup against best+queue+visited,
filter by the slack criterion, then sorted-merge (``lax.sort``) into best and
queue. Rows converge independently via masks; the surrounding
``lax.while_loop`` ends when every row's queue head fails the criterion
(the batched equivalent of the reference's per-block ``break``).
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
    "beam_insert_deduped",
    "beam_pop",
    "beam_pop_multi",
    "beam_transform",
]

EMPTY_ID = -1
EMPTY_DIST = jnp.inf


class BeamState(NamedTuple):
    best_d: jax.Array  # [B, BEST] f32
    best_i: jax.Array  # [B, BEST] i32
    q_d: jax.Array  # [B, QS] f32
    q_i: jax.Array  # [B, QS] i32
    vis: jax.Array  # [B, V] i32
    vis_head: jax.Array  # [B] i32
    xi: jax.Array  # [B] f32

    @property
    def batch(self) -> int:
        return self.best_d.shape[0]

    def criteria(self) -> jax.Array:
        """Worst-best + slack (simple_knn_cache.cuh:121-124)."""
        return self.best_d[:, -1] + self.xi


def beam_init(batch: int, sizes: tuple[int, int, int], xi: jax.Array) -> BeamState:
    """Empty state. ``sizes`` = (BEST, QS, V); ``xi``: [B] or scalar slack."""
    best, qs, v = sizes
    xi = jnp.broadcast_to(jnp.asarray(xi, jnp.float32), (batch,))
    return BeamState(
        best_d=jnp.full((batch, best), EMPTY_DIST, jnp.float32),
        best_i=jnp.full((batch, best), EMPTY_ID, jnp.int32),
        q_d=jnp.full((batch, qs), EMPTY_DIST, jnp.float32),
        q_i=jnp.full((batch, qs), EMPTY_ID, jnp.int32),
        vis=jnp.full((batch, v), EMPTY_ID, jnp.int32),
        vis_head=jnp.zeros((batch,), jnp.int32),
        xi=xi,
    )


def _sorted_merge(d_a, i_a, d_b, i_b, keep: int):
    d = jnp.concatenate([d_a, d_b], axis=-1)
    i = jnp.concatenate([i_a, i_b], axis=-1)
    d, i = jax.lax.sort((d, i), dimension=-1, num_keys=1)
    return d[..., :keep], i[..., :keep]


def beam_dedup_mask(
    state: BeamState,
    cand_i: jax.Array,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Which candidates are new to the beam (the id-only part of ``fetch``).

    Mirrors simple_knn_cache.cuh:126-146 & 241-261: a candidate is dropped if
    it already appears in the best list, the queue, the visited ring, or
    earlier in this same tile. Returns a [B, K] bool mask. Run this BEFORE
    gathering candidate vectors -- like the reference, which filters known ids
    before any distance computation -- so duplicate rows are never fetched
    from HBM.
    """
    K = cand_i.shape[1]
    ok = cand_i != EMPTY_ID
    if valid is not None:
        ok &= valid

    # dedup within the tile: keep the first occurrence only
    eq = cand_i[:, :, None] == cand_i[:, None, :]  # [B, K, K]
    lower = jnp.tril(jnp.ones((K, K), bool), k=-1)
    ok &= ~jnp.any(eq & lower[None], axis=-1)

    # dedup against cache contents
    seen = jnp.concatenate([state.best_i, state.q_i, state.vis], axis=-1)  # [B, C]
    ok &= ~jnp.any(cand_i[:, :, None] == seen[:, None, :], axis=-1)
    return ok


def beam_compact_candidates(cand_i: jax.Array, ok: jax.Array, cap: int):
    """Pack the surviving candidates left and truncate to ``cap`` columns.

    Graph walks re-encounter most neighbor ids, so after dedup typically less
    than half a tile survives; compacting before the vector gather halves the
    HBM gather volume (the dominant cost of traversal on TPU). Order among
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


def beam_insert_deduped(
    state: BeamState,
    cand_i: jax.Array,
    cand_d: jax.Array,
    row_mask: jax.Array | None = None,
    *,
    criteria: jax.Array | None = None,
) -> BeamState:
    """Merge already-deduplicated candidates into the beam.

    The admission criterion (fetch at simple_knn_cache.cuh:284) is applied
    here; ids must already be unique vs the cache and within the tile
    (see :func:`beam_dedup_mask`). EMPTY ids are ignored.
    """
    ok = cand_i != EMPTY_ID
    crit = state.criteria() if criteria is None else criteria
    ok &= cand_d < crit[:, None]

    cand_d = jnp.where(ok, cand_d, EMPTY_DIST)
    cand_i = jnp.where(ok, cand_i, EMPTY_ID)

    new_best_d, new_best_i = _sorted_merge(
        state.best_d, state.best_i, cand_d, cand_i, state.best_d.shape[-1]
    )
    new_q_d, new_q_i = _sorted_merge(
        state.q_d, state.q_i, cand_d, cand_i, state.q_d.shape[-1]
    )

    if row_mask is not None:
        m = row_mask[:, None]
        new_best_d = jnp.where(m, new_best_d, state.best_d)
        new_best_i = jnp.where(m, new_best_i, state.best_i)
        new_q_d = jnp.where(m, new_q_d, state.q_d)
        new_q_i = jnp.where(m, new_q_i, state.q_i)
    return state._replace(
        best_d=new_best_d, best_i=new_best_i, q_d=new_q_d, q_i=new_q_i
    )


def beam_insert(
    state: BeamState,
    cand_i: jax.Array,
    cand_d: jax.Array,
    valid: jax.Array | None = None,
    row_mask: jax.Array | None = None,
    *,
    criteria: jax.Array | None = None,
) -> BeamState:
    """Push a tile of candidates into the beam (the batched ``fetch``+``push``).

    Args:
      cand_i: [B, K] candidate ids (-1 = empty slot).
      cand_d: [B, K] candidate distances.
      valid: optional [B, K] mask of usable candidates.
      row_mask: optional [B] mask; masked-off rows keep their state unchanged.
      criteria: optional [B] admission threshold override (default:
        ``state.criteria()``, i.e. best_worst + xi).

    Dedup follows simple_knn_cache.cuh:126-146 & 241-261: a candidate is
    dropped if it already appears in the best list, the queue, the visited
    ring, or earlier in this same tile.
    """
    ok = beam_dedup_mask(state, cand_i, valid)
    cand_i = jnp.where(ok, cand_i, EMPTY_ID)
    return beam_insert_deduped(
        state, cand_i, cand_d, row_mask=row_mask, criteria=criteria
    )


def beam_pop(
    state: BeamState,
    row_mask: jax.Array | None = None,
    *,
    criteria: jax.Array | None = None,
):
    """Pop the queue head where it passes the stopping criterion.

    Mirrors simple_knn_cache.cuh:215-239: returns EMPTY (inactive row) when
    the queue is empty or the head distance >= criteria; otherwise removes the
    head and records it in the visited ring.

    Returns: (anchor [B] i32, active [B] bool, new_state).
    """
    head_d = state.q_d[:, 0]
    head_i = state.q_i[:, 0]
    crit = state.criteria() if criteria is None else criteria
    active = (head_i != EMPTY_ID) & (head_d < crit)
    if row_mask is not None:
        active &= row_mask

    B, V = state.vis.shape
    rows = jnp.arange(B)
    # record popped id in the visited ring
    cur = state.vis[rows, state.vis_head]
    vis = state.vis.at[rows, state.vis_head].set(jnp.where(active, head_i, cur))
    vis_head = jnp.where(active, (state.vis_head + 1) % V, state.vis_head)

    # shift the queue left by one on active rows
    q_d_shift = jnp.concatenate(
        [state.q_d[:, 1:], jnp.full((B, 1), EMPTY_DIST, jnp.float32)], axis=-1
    )
    q_i_shift = jnp.concatenate(
        [state.q_i[:, 1:], jnp.full((B, 1), EMPTY_ID, jnp.int32)], axis=-1
    )
    q_d = jnp.where(active[:, None], q_d_shift, state.q_d)
    q_i = jnp.where(active[:, None], q_i_shift, state.q_i)

    anchor = jnp.where(active, head_i, EMPTY_ID)
    return anchor, active, state._replace(q_d=q_d, q_i=q_i, vis=vis, vis_head=vis_head)


def beam_pop_multi(
    state: BeamState,
    P: int,
    row_mask: jax.Array | None = None,
    *,
    criteria: jax.Array | None = None,
):
    """Pop up to ``P`` queue heads per row in one step.

    TPU-native widening of the reference's one-anchor-per-iteration pop
    (simple_knn_cache.cuh:215-239): expanding the P best frontier entries
    together shortens the sequential loop by P× and turns the per-iteration
    distance computation into a larger, MXU-friendlier tile. The queue is
    sorted ascending, so the entries passing the ``head < best_worst + xi``
    criterion are exactly a prefix; each row pops its own prefix length.

    Returns: (anchors [B, P] i32 with EMPTY padding, active [B] bool,
    new_state).
    """
    if P == 1:
        anchor, active, st = beam_pop(state, row_mask, criteria=criteria)
        return anchor[:, None], active, st

    B, QS = state.q_d.shape
    crit = state.criteria() if criteria is None else criteria
    head_d = state.q_d[:, :P]
    head_i = state.q_i[:, :P]
    passes = (head_i != EMPTY_ID) & (head_d < crit[:, None])  # [B, P]
    if row_mask is not None:
        passes &= row_mask[:, None]
    # sorted queue => passing entries form a prefix; count = pops this step
    cnt = jnp.sum(jnp.cumprod(passes.astype(jnp.int32), axis=-1), axis=-1)
    active = cnt > 0
    popped = jnp.arange(P, dtype=jnp.int32)[None, :] < cnt[:, None]  # [B, P]
    anchors = jnp.where(popped, head_i, EMPTY_ID)

    # append popped ids to the visited ring (vectorized ring write)
    V = state.vis.shape[-1]
    slot = (state.vis_head[:, None] + jnp.arange(P, dtype=jnp.int32)[None, :]) % V
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    w_slot = jnp.where(popped, slot, V)  # out-of-range rows are dropped
    vis = state.vis.at[rows, w_slot].set(anchors, mode="drop")
    vis_head = (state.vis_head + cnt) % V

    # shift the queue left by each row's own pop count
    idx = jnp.arange(QS, dtype=jnp.int32)[None, :] + cnt[:, None]
    valid = idx < QS
    idx = jnp.minimum(idx, QS - 1)
    q_d = jnp.where(valid, jnp.take_along_axis(state.q_d, idx, axis=-1), EMPTY_DIST)
    q_i = jnp.where(valid, jnp.take_along_axis(state.q_i, idx, axis=-1), EMPTY_ID)

    return anchors, active, state._replace(
        q_d=q_d, q_i=q_i, vis=vis, vis_head=vis_head
    )


def beam_transform(state: BeamState, mapping: jax.Array) -> BeamState:
    """Descend one layer: remap best ids, restart the queue from the best list.

    Mirrors simple_knn_cache.cuh:297-333: best-list ids are remapped through
    ``mapping`` (selection: layer-l id -> layer-(l-1) id), the queue is
    re-seeded with a copy of the (remapped) best list, and the visited ring is
    cleared.
    """
    best = state.best_i.shape[-1]
    qs = state.q_d.shape[-1]
    ok = state.best_i != EMPTY_ID
    remapped = jnp.where(
        ok, mapping[jnp.clip(state.best_i, 0, mapping.shape[0] - 1)], EMPTY_ID
    )
    ncopy = min(best, qs)
    q_i = jnp.full_like(state.q_i, EMPTY_ID).at[:, :ncopy].set(remapped[:, :ncopy])
    q_d = (
        jnp.full_like(state.q_d, EMPTY_DIST)
        .at[:, :ncopy]
        .set(state.best_d[:, :ncopy])
    )
    return state._replace(
        best_i=remapped,
        q_i=q_i,
        q_d=q_d,
        vis=jnp.full_like(state.vis, EMPTY_ID),
        vis_head=jnp.zeros_like(state.vis_head),
    )
