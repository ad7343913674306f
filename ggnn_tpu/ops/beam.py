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

__all__ = ["BeamState", "beam_init", "beam_insert", "beam_pop", "beam_transform"]

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
    B, K = cand_i.shape
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

    # admission criterion (fetch at simple_knn_cache.cuh:284)
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
