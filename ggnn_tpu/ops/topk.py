"""Top-k / sorted-merge primitives.

TPU-native replacement for the reference's shared-memory ``KBestList``
shift-insert (include/ggnn/cuda_utils/k_best_list.cuh:29-142) and the
CUB segmented sorts: running top-k state is kept in sorted arrays and merged
with ``lax.sort`` / ``lax.top_k``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["EMPTY_ID", "topk_smallest", "merge_topk", "sort_by_dist"]

EMPTY_ID = jnp.int32(-1)


def topk_smallest(dists: jax.Array, ids: jax.Array, k: int):
    """Smallest-k entries along the last axis, sorted ascending by distance.

    Args:
      dists: [..., n] f32 (+inf marks empty slots).
      ids: [..., n] int32 payload.
      k: number of entries to keep (k <= n).

    Returns: (dists [..., k], ids [..., k]).
    """
    n = dists.shape[-1]
    if k > n:
        raise ValueError(f"k={k} > n={n}")
    sorted_d, sorted_i = jax.lax.sort((dists, ids), dimension=-1, num_keys=1)
    return sorted_d[..., :k], sorted_i[..., :k]


def sort_by_dist(dists: jax.Array, ids: jax.Array):
    """Sort (dists, ids) ascending by distance along the last axis."""
    return jax.lax.sort((dists, ids), dimension=-1, num_keys=1)


def merge_topk(
    dists_a: jax.Array,
    ids_a: jax.Array,
    dists_b: jax.Array,
    ids_b: jax.Array,
    k: int,
):
    """Merge two (not necessarily sorted) candidate sets, keep smallest k.

    Shapes: a=[..., na], b=[..., nb]; returns sorted [..., k].
    """
    d = jnp.concatenate([dists_a, dists_b], axis=-1)
    i = jnp.concatenate([ids_a, ids_b], axis=-1)
    return topk_smallest(d, i, k)
