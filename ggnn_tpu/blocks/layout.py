"""Block layout construction: coherent point blocks + a block-level graph.

The reference's traversal (src/ggnn/query/query_layer.cu) fetches one
512-byte point row per graph edge -- the GPU's latency-hiding home turf. On
TPU, random row gathers run far below HBM peak, while multi-KB contiguous
reads approach it. This module converts a built GGNN graph into a
*block-native* index:

  * points are assigned to their nearest layer-1 hierarchy node (the WRS-
    selected representatives, translation[1]) -- a spatially-coherent
    clustering the build already paid for;
  * points are reordered so each cluster occupies consecutive slots, then
    chunked into fixed blocks of ``block_size`` points -> ``base_blk
    [NB, BS, D]``, one block = one contiguous multi-KB fetch;
  * a block-level graph ranks neighbor blocks by how many point-graph edges
    (layer-0 neighbor lists, graph.neighbors[0]) cross between the blocks --
    the block analog of the kNN graph.

Everything is derived from an existing (base, graph) pair; the point-level
graph/build semantics are untouched.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ggnn_tpu.config import DistanceMeasure, GraphConfig
from ggnn_tpu.graph import Graph
from ggnn_tpu.ops.distance import dist_block, squared_norms

__all__ = ["BlockIndex", "build_block_index", "save_block_index", "load_block_index"]


class BlockIndex(NamedTuple):
    """Block-native view of one shard (device-resident pytree).

    Attributes:
      base_blk: [NB, BS, D] f32 -- base vectors grouped by block (padding
        slots hold zeros).
      member_ids: [NB, BS] i32 -- original base id per slot, -1 in padding.
      member_sq: [NB, BS] f32 -- squared norms; +inf in padding slots so
        padded distances never enter any top-k.
      blk_nbrs: [NB, KBlk] i32 -- neighbor blocks ranked by crossing edge
        count (-1 padding).
      start_blocks: [SB] i32 -- blocks of the layer-(L-1) starting points
        (-1 padding), the block analog of translation[L-1] seeding
        (query_kernels.cu:149).
      centroids: [NB, D] f32 -- mean member vector per block. Queries seed by
        scoring ALL centroids in one dense MXU tile and taking the top
        blocks -- the TPU-native replacement for the reference's hierarchy
        descent (a handful of graph-walk seeds cannot navigate thousands of
        blocks; a dense scan of every block centroid is almost free on MXU).
      centroid_sq: [NB] f32 -- squared centroid norms.
      nn1_stats: [2] f32 -- {mean, max} 1-NN distance, copied from the graph.
    """

    base_blk: jax.Array
    member_ids: jax.Array
    member_sq: jax.Array
    blk_nbrs: jax.Array
    start_blocks: jax.Array
    centroids: jax.Array
    centroid_sq: jax.Array
    nn1_stats: jax.Array

    @property
    def num_blocks(self) -> int:
        return self.base_blk.shape[0]

    @property
    def block_size(self) -> int:
        return self.base_blk.shape[1]


@functools.partial(jax.jit, static_argnames=("measure",))
def _nearest_rep(tile_vecs, tile_sq, rep_vecs, rep_sq, measure):
    d = dist_block(tile_vecs, rep_vecs, measure, q_sq=tile_sq, c_sq=rep_sq)
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    return idx, jnp.min(d, axis=-1)


def _assign_to_reps(
    base: jax.Array,
    rep_vecs: jax.Array,
    measure: DistanceMeasure,
    tile: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Nearest representative per point: ([N] i32 index, [N] f32 dist)."""
    base_sq = squared_norms(base)
    rep_sq = squared_norms(rep_vecs)

    N = base.shape[0]
    tile = min(tile, max(256, N))
    out = np.empty((N,), np.int32)
    out_d = np.empty((N,), np.float32)
    for lo in range(0, N, tile):
        hi = min(N, lo + tile)
        chunk = base[lo:hi]
        csq = base_sq[lo:hi]
        if hi - lo < tile:  # pad the tail to keep one compiled shape
            pad = tile - (hi - lo)
            chunk = jnp.pad(chunk, ((0, pad), (0, 0)))
            csq = jnp.pad(csq, (0, pad))
        idx, d = _nearest_rep(chunk, csq, rep_vecs, rep_sq, measure)
        out[lo:hi] = np.asarray(idx)[: hi - lo]
        out_d[lo:hi] = np.asarray(d)[: hi - lo]
    return out, out_d


def _hierarchical_order(
    base_f32: jax.Array,
    graph: Graph,
    cfg: GraphConfig,
    measure: DistanceMeasure,
) -> tuple[np.ndarray, np.ndarray]:
    """Spatially-coherent point order from the build's own hierarchy.

    Layer-l node ids carry NO spatial locality (layer membership comes from
    per-segment WRS sampling over the input order, wrs_select_layer.cu:41-102),
    so sorting by raw rep id interleaves unrelated clusters. Instead each
    point is keyed by its path through the hierarchy -- nearest layer-1 rep,
    that rep's nearest layer-2 rep, that rep's nearest layer-3 rep -- plus the
    distance to its rep, and lexsorted. Consecutive points then share ever-
    larger spatial neighborhoods, so fixed-size blocks straddle only nearby
    clusters.

    Returns (perm [N] i32, assign [N] i32 layer-1 cluster of each point).
    """
    rep_vecs = {
        l: base_f32[graph.translation[l]].astype(jnp.float32)
        for l in range(1, cfg.L)
    }
    assign, d1 = _assign_to_reps(base_f32, rep_vecs[1], measure)
    keys = [d1, assign.astype(np.int64)]
    parent = None
    for l in range(1, cfg.L - 1):
        up, _ = _assign_to_reps(rep_vecs[l], rep_vecs[l + 1], measure)
        parent = up if parent is None else up[parent]
        # parent maps layer-1 rep -> its layer-(l+1) ancestor
        keys.append(parent[assign].astype(np.int64))
    perm = np.lexsort(keys).astype(np.int32)  # last key is primary
    return perm, assign


@functools.partial(jax.jit, static_argnames=("k_blk",))
def _rank_neighbor_blocks(cand: jax.Array, self_blk: jax.Array, k_blk: int):
    """Top-``k_blk`` most frequent block ids per row (excluding the row's own
    block), deterministic ties by block id.

    cand: [NB, M] i32 candidate block ids (-1 = invalid).
    Returns [NB, k_blk] i32 with -1 padding.
    """
    M = cand.shape[1]
    big = jnp.int32(2**30)
    cand = jnp.where(cand == self_blk[:, None], -1, cand)
    key = jnp.where(cand >= 0, cand, big)
    s = jax.lax.sort(key, dimension=-1)  # invalids at the end
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=-1
    )
    first &= s < big
    # run length of the run starting at each first-occurrence position:
    # positions of the NEXT first occurrence minus own position.
    idx = jnp.arange(M, dtype=jnp.int32)[None, :]
    nxt_start = jnp.where(first | (s >= big), idx, M)
    # suffix-min gives, at each position, the next boundary at or after it
    suffix_next = jax.lax.associative_scan(
        jnp.minimum, nxt_start[:, ::-1], axis=-1
    )[:, ::-1]
    run_end = jnp.concatenate(
        [suffix_next[:, 1:], jnp.full_like(suffix_next[:, :1], M)], axis=-1
    )
    count = jnp.where(first, run_end - idx, 0)
    # rank: primary count desc, secondary id asc (deterministic, x64-free)
    neg_count, picked = jax.lax.sort((-count, s), dimension=-1, num_keys=2)
    picked = picked[:, :k_blk]
    valid = neg_count[:, :k_blk] < 0
    return jnp.where(valid, picked, -1)


def build_block_index(
    base: jax.Array,
    graph: Graph,
    cfg: GraphConfig,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    *,
    block_size: int = 32,
    k_blk: int = 16,
    dtype=jnp.float32,
) -> BlockIndex:
    """Derive the block-native index from a built shard graph.

    Args:
      base: [N, D] shard base (float32 or uint8).
      graph: the built GGNN graph of this shard.
      cfg: shard geometry.
      block_size: points per block (32 x D=128 f32 = 16 KB fetches).
      k_blk: block-graph degree.
      dtype: storage dtype of the block vectors. ``jnp.bfloat16`` halves the
        per-block fetch bytes and hits the MXU's native bf16 path; squared
        norms and centroids stay f32, so the ~0.4% relative dot error only
        perturbs candidate ranking (recall effect measured negligible).
    """
    N, D = base.shape
    BS = block_size
    NB = -(-N // BS)
    base = jnp.asarray(base)

    # 1+2) hierarchy-ordered reorder: lexsort points by their (layer-3,
    #    layer-2, layer-1, dist-to-rep) hierarchy path, chunk into blocks
    perm, _ = _hierarchical_order(base.astype(jnp.float32), graph, cfg, measure)
    pad = NB * BS - N
    member_ids = np.concatenate([perm, np.full((pad,), -1, np.int32)])
    member_ids = member_ids.reshape(NB, BS)

    base_f32 = np.asarray(base, dtype=np.float32)
    base_blk = np.zeros((NB, BS, D), np.float32)
    base_blk.reshape(-1, D)[: N] = base_f32[perm]
    member_sq = np.full((NB, BS), np.inf, np.float32)
    member_sq.reshape(-1)[: N] = np.asarray(squared_norms(jnp.asarray(base_f32)))[perm]

    blk_of_point = np.empty((N,), np.int32)
    blk_of_point[perm] = np.arange(NB * BS, dtype=np.int32)[: N] // BS

    # 3) block graph: point-graph edges mapped to block ids, ranked by count
    nbr0 = np.asarray(graph.neighbors[0])  # [N, KBuild]
    edge_blocks = np.where(nbr0 >= 0, blk_of_point[np.clip(nbr0, 0, N - 1)], -1)
    cand = np.full((NB * BS, nbr0.shape[1]), -1, np.int32)
    cand[: N] = edge_blocks[perm]
    cand = cand.reshape(NB, BS * nbr0.shape[1])
    self_blk = jnp.arange(NB, dtype=jnp.int32)
    blk_nbrs = _rank_neighbor_blocks(jnp.asarray(cand), self_blk, k_blk)

    # 4) starting blocks: unique blocks of the top-layer starting points
    starts = np.asarray(graph.translation[cfg.L - 1])
    start_blocks = np.unique(blk_of_point[starts]).astype(np.int32)
    SB = -(-len(start_blocks) // 8) * 8  # pad to a lane-friendly multiple
    start_blocks = np.concatenate(
        [start_blocks, np.full((SB - len(start_blocks),), -1, np.int32)]
    )

    # 5) block centroids for dense MXU seeding
    valid = (member_ids >= 0).astype(np.float32)
    cnt = np.maximum(valid.sum(axis=1, keepdims=True), 1.0)
    centroids = (base_blk * valid[:, :, None]).sum(axis=1) / cnt
    centroid_sq = np.sum(centroids * centroids, axis=-1)

    return BlockIndex(
        base_blk=jnp.asarray(base_blk).astype(dtype),
        member_ids=jnp.asarray(member_ids),
        member_sq=jnp.asarray(member_sq),
        blk_nbrs=blk_nbrs,
        start_blocks=jnp.asarray(start_blocks),
        centroids=jnp.asarray(centroids),
        centroid_sq=jnp.asarray(centroid_sq),
        nn1_stats=jnp.asarray(graph.nn1_stats),
    )


def save_block_index(path: str | Path, index: BlockIndex) -> None:
    """Persist a block index next to its graph shard (.npz + JSON header).

    Vectors are stored as f32 regardless of the in-memory dtype (numpy npz
    cannot hold bfloat16); the dtype is recorded and restored on load."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    meta = {
        "block_size": index.block_size,
        "num_blocks": index.num_blocks,
        "dtype": str(jnp.dtype(index.base_blk.dtype)),
    }
    payload = {k: np.asarray(v) for k, v in index._asdict().items()}
    payload["base_blk"] = payload["base_blk"].astype(np.float32)
    np.savez(path, meta=json.dumps(meta), **payload)


def load_block_index(path: str | Path) -> BlockIndex:
    with np.load(Path(path), allow_pickle=False) as f:
        meta = json.loads(str(f["meta"]))
        arrays = {k: jnp.asarray(f[k]) for k in BlockIndex._fields}
        arrays["base_blk"] = arrays["base_blk"].astype(
            jnp.dtype(meta.get("dtype", "float32"))
        )
        return BlockIndex(**arrays)
