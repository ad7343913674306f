"""Exact (brute-force) k-nearest-neighbor search.

TPU-native replacement for the reference's ``BruteForceQueryKernel``
(src/ggnn/query/bf_query_layer.cu:39-65: one CUDA block per query scanning
all base points). Here the scan is a tiled dense distance matmul on the MXU
with a running top-k merge -- the SURVEY.md 2.4 "sharded matmul + lax.top_k"
design.

Used as the ground-truth oracle (``GGNN.bf_query``) and by tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ggnn_tpu.config import DistanceMeasure
from ggnn_tpu.ops.distance import dist_block, squared_norms
from ggnn_tpu.ops.topk import merge_topk

__all__ = ["bruteforce_knn"]


@functools.partial(
    jax.jit, static_argnames=("k", "measure", "tile_base", "exact")
)
def bruteforce_knn(
    base: jax.Array,
    query: jax.Array,
    k: int,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    *,
    tile_base: int = 8192,
    exact: bool = True,
):
    """Exact k-NN of ``query`` rows in ``base`` rows.

    Args:
      base: [N, D] float32/uint8 base points.
      query: [Q, D] queries (same dtype family as base).
      k: neighbors to return (k <= N).
      measure: Euclidean (squared L2, like the reference) or Cosine.
      tile_base: base tile size for the scanned distance matmul.
      exact: use highest-precision f32 matmuls (3-pass bf16) for oracle
        quality; set False for faster approximate distances.

    Returns:
      (ids [Q, k] int32, dists [Q, k] f32), each row sorted ascending.
    """
    N, D = base.shape
    Q = query.shape[0]
    if k > N:
        raise ValueError(f"k={k} > N={N}")
    precision = jax.lax.Precision.HIGHEST if exact else None

    measure = DistanceMeasure(measure)
    query = query.astype(jnp.float32)
    q_sq = squared_norms(query)

    # Pad the base so it tiles evenly; padded rows get +inf distance.
    num_tiles = -(-N // tile_base)
    pad = num_tiles * tile_base - N
    if pad:
        base = jnp.pad(base, ((0, pad), (0, 0)))
    base_tiles = base.reshape(num_tiles, tile_base, D)

    init_d = jnp.full((Q, k), jnp.inf, dtype=jnp.float32)
    init_i = jnp.full((Q, k), -1, dtype=jnp.int32)

    def scan_tile(carry, inp):
        best_d, best_i = carry
        tile_idx, tile = inp
        tile = tile.astype(jnp.float32)
        d = dist_block(
            query, tile, measure, q_sq=q_sq, precision=precision
        )  # [Q, tile_base]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_base), 1)
        ids = col + tile_idx * tile_base  # [1, tile_base] broadcasting over Q
        valid = ids < N
        d = jnp.where(valid, d, jnp.inf)
        ids = jnp.broadcast_to(ids, d.shape)
        # keep top-k within the tile first (k << tile_base), then merge
        tile_d, tile_i = jax.lax.top_k(-d, min(k, tile_base))
        tile_d = -tile_d
        tile_i = jnp.take_along_axis(ids, tile_i, axis=1)
        best_d, best_i = merge_topk(best_d, best_i, tile_d, tile_i, k)
        return (best_d, best_i), None

    (best_d, best_i), _ = jax.lax.scan(
        scan_tile,
        (init_d, init_i),
        (jnp.arange(num_tiles, dtype=jnp.int32), base_tiles),
    )
    return best_i, best_d
