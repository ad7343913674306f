"""Quantized-adjacency ANN query: the flagship TPU query engine.

The row engine (ggnn_tpu/query/ann.py) is bound by per-candidate row
gathers: every expanded anchor triggers KBuild scattered 512-byte fetches,
which run at ~59 GB/s on v5e (vs 762 GB/s dense). This engine restructures
the *memory layout*, not the search semantics:

  * ``nbr_codes [N, KBuild, D] uint8`` stores each point's neighbors'
    vectors inline, quantized per-dimension -- ONE contiguous ~3 KB fetch
    per popped anchor yields the vectors of ALL its neighbors (multi-KB
    fetches run at 260-480 GB/s, measured);
  * neighbor distances come from an MXU dequant-dot
    (``(q*scale) . codes + q.zero``) -- no per-candidate gather at all;
  * seeding scores the layer-1 representatives (translation[1], the WRS
    cluster heads the build already selected) against the query tile in one
    dense MXU matmul -- replacing the reference's hierarchy descent
    (query_kernels.cu:149 seeds from translation[L-1]);
  * the best-first walk itself is the same flagged-beam traversal as the
    row engine (pop -> expand -> dedup -> insert under ``best + xi``),
    with the reference's dynamic slack tightening (query_layer.cu:58-63);
  * a final exact re-rank gathers f32 rows for only the surviving top
    candidates (~3 rows per returned neighbor instead of thousands).

Quantization is per-dimension affine uint8 (SIFT-style data is uint8
natively -- the reference's SIFT1B mode); distances during the walk are
exact distances to the *dequantized* points, so the walk explores the true
graph geometry with a slightly perturbed metric, and the re-rank restores
exact ordering.
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
from ggnn_tpu.ops.adjacency_pallas import adjacency_dot, adjacency_dot_xla
from ggnn_tpu.ops.beam import (
    beam_dedup_mask,
    beam_init,
    beam_insert,
    beam_pop,
)
from ggnn_tpu.ops.distance import dist_block, squared_norms

__all__ = [
    "AdjacencyTables",
    "FusedIndex",
    "FusedIndexMeta",
    "assemble_fused_index",
    "build_fused_index",
    "fused_best_first",
    "fused_query",
    "make_adjacency",
    "save_fused_index",
    "load_fused_index",
]

EMPTY_ID = -1
EMPTY_DIST = jnp.inf


class FusedIndex(NamedTuple):
    """Quantized-adjacency index of one shard (device-resident pytree).

    Adjacency blocks are stored per *group* of graph-close nodes (group
    size 2 pairs via mutual-nearest matching on the layer-0 graph):
    one DMA descriptor then fetches every member's inline neighbor codes at
    once. The fetch kernel is descriptor-bound (~44 ns each, measured), so
    halving the descriptor count -- and doubling the per-descriptor bytes,
    which also lifts effective HBM bandwidth -- is the main fetch lever.
    Anchors of one pop tile that map to the same group dedup to a single
    fetch. ``group=1`` degenerates to the per-node layout.

    Attributes:
      nbr_ids: [NG, G*K] i32 -- the group members' neighbor ids, member-major
        (-1 = empty slot).
      blocks: [NG, CR, D] u8 -- the fetch unit: the members' quantized
        neighbor vectors inline (CR = G*K rows, or G*K/2 with int4 codes
        packed two per byte -- see ``bits``). (Folding the meta row into
        this block was measured net-negative: alignment pads cost more DMA
        bytes + matmul rows than the meta gather saves -- round 5.)
      meta: [NG, 2H] i32 -- the walk's per-anchor metadata row, PRE-packed
        (ids, then bitcast f32 dequantized-norms; see :func:`_pack_meta`).
        Packed once at assembly; ONE lane-padded row gather per anchor.
      group_of: [N] i32 -- node id -> its group (the fetch address map).
      members: [NG, G] i32 -- group -> member node ids (-1 pad; validation +
        introspection).
      scale / zero: [D] f32 -- per-dimension affine dequantization
        (x_hat = scale * code + zero).
      rep_ids: [R] i32 -- base ids of the layer-1 representatives (seeds).
      rep_vecs: [R, D] f32 -- their vectors (dense seeding scan).
      rep_sq: [R] f32.
      nn1_stats: [2] f32 -- {mean, max} 1-NN distance (slack scaling).
    """

    nbr_ids: jax.Array
    blocks: jax.Array
    meta: jax.Array
    group_of: jax.Array
    members: jax.Array
    scale: jax.Array
    zero: jax.Array
    rep_ids: jax.Array
    rep_vecs: jax.Array
    rep_sq: jax.Array
    nn1_stats: jax.Array

    @property
    def k_build(self) -> int:
        """Neighbor ids per group member."""
        return self.nbr_ids.shape[1] // self.group

    @property
    def group(self) -> int:
        return self.members.shape[1]

    @property
    def cand_per_fetch(self) -> int:
        """Candidate ids delivered by one block fetch."""
        return self.nbr_ids.shape[1]

    @property
    def bits(self) -> int:
        """Code width (8 = one neighbor per block row, 4 = two packed)."""
        return 8 if self.blocks.shape[1] == self.nbr_ids.shape[1] else 4


def fit_affine_u8(
    base: np.ndarray, clip_quantile: float = 1e-4, levels: int = 255
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension affine quantizer fitted on the base (``levels``=255 for
    uint8 codes, 15 for int4).

    The range is clipped at the ``clip_quantile`` tails instead of raw
    min/max: on heavy-tailed data a single outlier dimension would otherwise
    inflate the quantization step for every point (values outside the clipped
    range saturate at 0/levels, which costs only those few points accuracy).
    """
    if clip_quantile > 0.0 and base.shape[0] > 1000:
        lo = np.quantile(base, clip_quantile, axis=0).astype(np.float32)
        hi = np.quantile(base, 1.0 - clip_quantile, axis=0).astype(np.float32)
    else:
        lo = base.min(axis=0).astype(np.float32)
        hi = base.max(axis=0).astype(np.float32)
    scale = np.maximum(hi - lo, 1e-12).astype(np.float32) / float(levels)
    return scale, lo


@functools.partial(jax.jit, static_argnames=("levels",), donate_argnums=())
def _encode_u8(base_f32, scale, zero, levels: int = 255):
    c = jnp.round((base_f32 - zero[None, :]) / scale[None, :])
    return jnp.clip(c, 0.0, float(levels)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("bits",))
def _assemble_blocks(codes, sq_hat, nbr0, bits: int = 8):
    """Build the inline adjacency tables on device: ([NG, CR, D] u8 code
    blocks, [NG, 2H] i32 packed meta rows).

    ``bits=4`` packs TWO neighbors per code row (low nibble = the first of
    the pair) -- CR = Kc/2, halving the block bytes. The fetch kernel's dot
    columns then come out [all-low | all-high], so the meta ids/norms are
    packed in that same even-columns-then-odd order; downstream only ever
    pairs id[j] with dot[j], so the order is free to choose."""
    safe = jnp.clip(nbr0, 0, None)
    nbr_codes = codes[safe]  # [NG, Kc, D] u8
    nbr_sq = jnp.where(nbr0 >= 0, sq_hat[safe], jnp.inf)
    if bits == 4:
        nbr_codes = nbr_codes[:, 0::2, :] | (nbr_codes[:, 1::2, :] << 4)
        nbr0 = jnp.concatenate([nbr0[:, 0::2], nbr0[:, 1::2]], axis=1)
        nbr_sq = jnp.concatenate([nbr_sq[:, 0::2], nbr_sq[:, 1::2]], axis=1)
    return nbr_codes, _pack_meta(nbr0, nbr_sq)


def match_groups(nbr_ids: np.ndarray, group: int) -> np.ndarray:
    """Group nodes with graph-nearest partners (deterministic, vectorized).

    ``group`` must be a power of two. Pairs come from greedy mutual-nearest
    matching (see :func:`_match_pairs`); larger groups recurse -- pairs are
    re-matched on the induced pair-level adjacency (a pair's neighbor list is
    its members' neighbor *pairs*, interleaved so the graph-nearest-first
    ordering survives), so a group of 4 is two graph-adjacent pairs, etc.
    Returns members [NG, group] i32 (-1 pads only when N % group != 0).
    """
    N, K = nbr_ids.shape
    if group <= 1:
        return np.arange(N, dtype=np.int32)[:, None]
    assert group & (group - 1) == 0, "group must be a power of two"
    pairs = _match_pairs(nbr_ids)
    if group == 2:
        return pairs
    NP = pairs.shape[0]
    # induced pair-level adjacency: map member neighbor ids -> pair ids,
    # interleaved member-major so column order still means nearest-first
    pair_of = np.zeros((N,), np.int64)
    valid = pairs >= 0
    pair_of[pairs[valid]] = np.repeat(
        np.arange(NP, dtype=np.int64), 2
    ).reshape(NP, 2)[valid]
    mem_nbrs = np.where(
        valid[:, :, None], nbr_ids[np.clip(pairs, 0, None)], -1
    )  # [NP, 2, K]
    nbr_pairs = np.where(
        mem_nbrs >= 0, pair_of[np.clip(mem_nbrs, 0, None)], -1
    )
    pair_nbrs = np.transpose(nbr_pairs, (0, 2, 1)).reshape(NP, 2 * K)
    sub = match_groups(pair_nbrs.astype(np.int32), group // 2)
    safe_sub = np.clip(sub, 0, None)
    out = np.where((sub >= 0)[:, :, None], pairs[safe_sub], -1)
    return out.reshape(sub.shape[0], group).astype(np.int32)


def _match_pairs(nbr_ids: np.ndarray) -> np.ndarray:
    """Greedy mutual-nearest pairing in rounds: each unmatched node proposes
    to its nearest unmatched neighbor (neighbor rows are distance-sorted by
    the merge); mutual proposals pair up. Leftovers merge pairwise in id
    order. Returns [ceil(N/2), 2] i32 (-1 pad only for odd N)."""
    N, K = nbr_ids.shape
    partner = np.full((N,), -1, np.int64)
    ids = np.arange(N, dtype=np.int64)
    for _ in range(8):
        free = partner == -1
        if not free.any():
            break
        # nearest *free* neighbor of each free node (first in sorted row)
        nbrs = nbr_ids.astype(np.int64).copy()
        bad = (nbrs < 0) | ~free[np.clip(nbrs, 0, None)] | (nbrs == ids[:, None])
        score = np.where(bad, K, np.arange(K)[None, :])
        best_col = score.argmin(axis=1)
        proposal = np.where(
            score[ids, best_col] < K, nbrs[ids, best_col], -1
        )
        proposal[~free] = -1
        ok = (proposal >= 0) & (proposal[np.clip(proposal, 0, None)] == ids)
        ok &= ids < proposal  # one writer per mutual pair
        a = ids[ok]
        b = proposal[ok]
        partner[a] = b
        partner[b] = a
    # pair the stragglers in id order
    rest = ids[partner == -1]
    if len(rest) >= 2:
        even = rest[: len(rest) // 2 * 2]
        partner[even[0::2]] = even[1::2]
        partner[even[1::2]] = even[0::2]
    is_owner = (partner == -1) | (ids < partner)
    owners = ids[is_owner]  # ascending: deterministic group numbering
    return np.stack([owners, partner[owners]], axis=1).astype(np.int32)


class FusedIndexMeta(NamedTuple):
    """Host-persisted form of a FusedIndex: only what cannot be re-derived
    from (base, graph) -- the group matching and the quantizer. The GB-scale
    inline-code tables are reconstructed by ONE device gather at stage-in
    (:func:`assemble_fused_index`); pulling them host-side instead costs
    minutes through the relay D2H (~2-20 MB/s measured for bulk transfers),
    and on any platform they are pure derived redundancy on disk.

    ``graph_fp`` fingerprints the layer-0 adjacency the matching was
    derived from; a sidecar whose fingerprint does not match the loaded
    graph is rejected (stale-sidecar hygiene, tests/test_persistence.py).
    All-zeros means "unvalidatable" and is likewise rejected on load."""

    members: np.ndarray  # [NG, G] i32
    scale: np.ndarray  # [D] f32
    zero: np.ndarray  # [D] f32
    graph_fp: np.ndarray  # [32] u8 blake2b of neighbors[0]
    bits: np.ndarray  # [1] i32 code width (8 = uint8, 4 = packed int4)


def graph_fingerprint(graph) -> np.ndarray:
    """32-byte digest of a graph's layer-0 adjacency (host arrays only)."""
    import hashlib  # noqa: PLC0415

    nbr0 = np.ascontiguousarray(np.asarray(graph.neighbors[0]))
    digest = hashlib.blake2b(nbr0.tobytes(), digest_size=32).digest()
    return np.frombuffer(digest, dtype=np.uint8).copy()


def build_fused_index(
    base: jax.Array,
    graph: Graph,
    cfg: GraphConfig,
    *,
    group: int = 1,
    bits: int = 8,
) -> FusedIndex:
    """Derive the quantized-adjacency index from a built shard graph.

    For uint8 bases the codes are the bytes themselves (scale=1, zero=0),
    matching the reference's native SIFT1B uint8 mode (BaseT=uint8,
    lib.h:23-75). ``group`` controls the paired-block layout (see
    FusedIndex; group=1 restores one block per node). ``bits=4`` stores
    packed int4 codes: half the block bytes and HBM footprint (the walk
    metric coarsens; the exact f32 re-rank is unchanged)."""
    if group <= 1:
        # trivial matching -- skip the layer-0 adjacency D2H entirely
        N = graph.neighbors[0].shape[0]
        members_np = np.arange(N, dtype=np.int32)[:, None]
    else:
        members_np = match_groups(np.asarray(graph.neighbors[0]), group)
    return assemble_fused_index(base, graph, members=members_np, bits=bits)


def assemble_fused_index(
    base: jax.Array,
    graph: Graph,
    *,
    members: np.ndarray,
    scale: np.ndarray | None = None,
    zero: np.ndarray | None = None,
    bits: int = 8,
) -> FusedIndex:
    """Assemble the device-resident index from a group matching (and
    optionally a stored quantizer). Deterministic given (base, graph,
    members): reloading a meta sidecar reproduces the stored index
    bit-for-bit from the current graph.

    With scale/zero supplied (the meta-sidecar stage-in path) the base is
    never pulled host-side: a device-resident base stays on device, so
    reconstructing the GB-scale code tables costs one gather, not a
    relay D2H+H2D round trip of the whole base."""
    if bits not in (4, 8):
        raise ValueError(f"bits={bits} (4 or 8)")
    levels = 255 if bits == 8 else 15
    if scale is None or zero is None:
        if np.dtype(base.dtype) == np.uint8 and bits == 8:
            D = base.shape[1]
            scale = np.ones((D,), np.float32)
            zero = np.zeros((D,), np.float32)
        else:
            # the quantile fit runs on host -- the one path that needs bytes
            scale, zero = fit_affine_u8(np.asarray(base), levels=levels)
    scale_j = jnp.asarray(scale)
    zero_j = jnp.asarray(zero)
    base_f32 = jnp.asarray(base).astype(jnp.float32)
    codes = _encode_u8(base_f32, scale_j, zero_j, levels=levels)
    # exact squared norms of the DEQUANTIZED points: the walk's metric
    x_hat_sq = squared_norms(
        codes.astype(jnp.float32) * scale_j[None, :] + zero_j[None, :]
    )
    nbr0 = graph.neighbors[0]
    N, K = nbr0.shape
    members_np = np.asarray(members)
    members = jnp.asarray(members_np)
    NG, G = members_np.shape
    group_of_np = np.zeros((N,), np.int32)
    valid = members_np >= 0
    group_of_np[members_np[valid]] = np.repeat(
        np.arange(NG, dtype=np.int32), G
    ).reshape(NG, G)[valid]
    # member-major group adjacency: row g = [nbrs(m0) || nbrs(m1) ...]; an
    # empty member slot contributes EMPTY ids (masked downstream)
    safe_members = jnp.clip(members, 0, None)
    grp_nbrs = jnp.where(
        (members != -1)[:, :, None], nbr0[safe_members], -1
    ).reshape(NG, G * K)
    if bits == 4 and (G * K) % 2:
        raise ValueError("bits=4 requires an even candidate count per block")

    rep_ids = graph.translation[1]
    rep_vecs = base_f32[rep_ids]
    blocks, meta = _assemble_blocks(codes, x_hat_sq, grp_nbrs, bits=bits)
    return FusedIndex(
        nbr_ids=grp_nbrs,
        blocks=blocks,
        meta=meta,
        group_of=jnp.asarray(group_of_np),
        members=members,
        scale=scale_j,
        zero=zero_j,
        rep_ids=jnp.asarray(rep_ids, jnp.int32),
        rep_vecs=rep_vecs,
        rep_sq=squared_norms(rep_vecs),
        nn1_stats=jnp.asarray(graph.nn1_stats),
    )


class AdjacencyTables(NamedTuple):
    """The quantized-adjacency core shared by the query engine and the
    construction merge: inline neighbor codes of one graph layer, one block
    per node (FusedIndex is the grouped superset; both are duck-typed
    through ``cand_per_fetch``/``group``)."""

    nbr_ids: jax.Array  # [N, K] i32
    blocks: jax.Array  # [N, K, D] u8 inline neighbor codes
    meta: jax.Array  # [N, 2H] i32 pre-packed walk metadata (_pack_meta)
    scale: jax.Array  # [D] f32
    zero: jax.Array  # [D] f32

    @property
    def k_build(self) -> int:
        return self.nbr_ids.shape[1]

    @property
    def group(self) -> int:
        return 1

    @property
    def cand_per_fetch(self) -> int:
        return self.nbr_ids.shape[1]


def make_adjacency(codes, x_hat_sq, nbr0, scale, zero) -> AdjacencyTables:
    """Inline the current layer-0 adjacency (one device gather): the build's
    per-pass equivalent of build_fused_index."""
    blocks, meta = _assemble_blocks(codes, x_hat_sq, nbr0)
    return AdjacencyTables(
        nbr_ids=nbr0, blocks=blocks, meta=meta, scale=scale, zero=zero,
    )


def _meta_half(Kc: int) -> int:
    """H: lane offset of the norms half inside a packed meta row."""
    return max(64, -(-Kc // 64) * 64)


def _pack_meta(nbr_ids: jax.Array, nbr_sq: jax.Array) -> jax.Array:
    """Lane-padded [NG, 2H] i32 rows: candidate ids in ``[:, :Kc]``, the f32
    squared norms bitcast into ``[:, H:H+Kc]``.

    The walk gathers one row per popped anchor per step. Gathering the raw
    [NG, Kc] tables issues 96-192 B row fetches, which XLA:TPU executes
    ~50x below the 512 B-row gather rate (the same pathology documented at
    build/sym.py:_pad_rows_to_lanes); packing ids+norms into one >=128-lane
    row makes it a single aligned >=512 B fetch. Packed ONCE at index
    assembly.
    """
    NG, Kc = nbr_ids.shape
    H = _meta_half(Kc)
    ids = jnp.pad(nbr_ids, ((0, 0), (0, H - Kc)), constant_values=EMPTY_ID)
    sqb = jnp.pad(
        jax.lax.bitcast_convert_type(nbr_sq, jnp.int32), ((0, 0), (0, H - Kc))
    )
    return jnp.concatenate([ids, sqb], axis=-1)


def _code_dists(q_vecs, q_sq, anchors, index: FusedIndex, measure,
                use_pallas):
    """Distances from each row's query to its anchors' inline neighbors.

    anchors: [B, P] i32 (-1 = empty). Returns (ids [B, P*Kc], d [B, P*Kc])
    where Kc = index.cand_per_fetch. One contiguous block fetch per anchor's
    *group* -- THE hot memory access; anchors sharing a group within the
    tile collapse to a single fetch (the duplicate becomes an EMPTY block,
    which the Pallas kernel skips entirely). On TPU the fetch+dot runs as a
    Pallas kernel (ops/adjacency_pallas.py) that streams each block
    HBM->VMEM and dots it in place; ids+norms come from one lane-padded
    row gather (``meta``, see :func:`_pack_meta`).
    """
    B, P = anchors.shape
    Kc = index.cand_per_fetch
    group_of = getattr(index, "group_of", None)
    if group_of is not None and index.group > 1:
        safe_a = jnp.clip(anchors, 0, None)
        blocks = jnp.where(anchors >= 0, group_of[safe_a], EMPTY_ID)
        # collapse same-group anchors: keep the first, blank the rest
        eq = blocks[:, :, None] == blocks[:, None, :]
        lower = jnp.tril(jnp.ones((P, P), bool), k=-1)
        dup = jnp.any(eq & lower[None] & (blocks[:, None, :] >= 0), axis=-1)
        blocks = jnp.where(dup, EMPTY_ID, blocks)
    else:
        blocks = anchors
    safe_b = jnp.clip(blocks, 0, None)
    live = (blocks >= 0)[:, :, None]
    H = _meta_half(Kc)
    meta = index.meta
    rows = meta[safe_b]  # [B, P, 2H] -- ONE aligned row gather per anchor
    ids = jnp.where(live, rows[..., :Kc], EMPTY_ID).reshape(B, P * Kc)
    sq = jax.lax.bitcast_convert_type(rows[..., H : H + Kc], jnp.float32)
    sq = jnp.where(live, sq, jnp.inf).reshape(B, P * Kc)

    # dot(q, x_hat) = (q * scale) . codes + q . zero
    qs = q_vecs * index.scale[None, :]
    nibbles = index.blocks.shape[1] != Kc  # int4: two neighbors per row
    if use_pallas:
        dot = adjacency_dot(qs, blocks, index.blocks, nibbles=nibbles,
                            qt=8 if use_pallas is True else use_pallas)
    else:
        dot = adjacency_dot_xla(qs, blocks, index.blocks, nibbles=nibbles)
    dot = dot.reshape(B, P * Kc) + (q_vecs @ index.zero)[:, None]

    if measure == DistanceMeasure.Euclidean:
        d = jnp.maximum(q_sq[:, None] + sq - 2.0 * dot, 0.0)
    else:  # Cosine (distance.cuh:140-159)
        norm_sq = q_sq[:, None] * sq
        ok = norm_sq > 0.0
        d = jnp.abs(1.0 - dot * jax.lax.rsqrt(jnp.where(ok, norm_sq, 1.0)))
        d = jnp.where(ok, d, 1.0)
    bad = ids == EMPTY_ID
    d = jnp.where(bad | ~jnp.isfinite(sq), EMPTY_DIST, d)
    return ids, d


def _fused_step(st, q_vecs, q_sq, index, measure, *, k_best, P, cap,
                use_pallas):
    """One pop->fetch->filter->dedup->insert step of the quantized-adjacency
    walk (shared by the query engine and the construction merge).

    Distances are free here (computed from the inline codes), so the
    admission criterion filters BEFORE the expensive dedup/merge: keep only
    the best ``cap`` candidates below best+xi, sorted. (A VMEM-resident
    Pallas filter+dedup+merge kernel was built and measured 5.8x slower than
    this XLA pipeline -- see docs/design.md "Candidate merge"; XLA's fused
    sort pipeline is already near VPU-bound.)
"""
    anchors, active, st = beam_pop(st, P, k_best)
    ids, d = _code_dists(q_vecs, q_sq, anchors, index, measure, use_pallas)
    crit = st.criteria(k_best)
    d = jnp.where((ids != EMPTY_ID) & (d < crit[:, None]), d, EMPTY_DIST)
    ids = jnp.where(jnp.isfinite(d), ids, EMPTY_ID)
    # a bf16 beam sorts bf16 candidate keys end-to-end (see beam_init)
    d = d.astype(st.d.dtype)
    if cap < d.shape[1]:
        # a full 2-op sort: lax.top_k(384->cap) + the id gather measured
        # 68.7k vs 97.7k QPS in-process at the 262k headline point, and a
        # per-anchor quota sort ([B,P,Kc] blocks) measured 63.9k vs 116.1k --
        # XLA's fused full-width 2-operand sort pipeline wins on TPU
        d, ids = jax.lax.sort((d, ids), dimension=-1, num_keys=1)
        d, ids = d[:, :cap], ids[:, :cap]
    ok = beam_dedup_mask(st, ids)
    ids = jnp.where(ok, ids, EMPTY_ID)
    st = beam_insert(st, ids, d, row_mask=active, criteria=crit)
    return st, active


def fused_best_first(
    state,
    q_vecs,
    q_sq,
    index,
    measure: DistanceMeasure,
    max_iterations: int,
    k_best: int,
    pops_per_iter: int = 8,
    cap: int | None = None,
    use_pallas: bool | None = None,
):
    """Best-first expansion over inline-code adjacency until convergence.

    The construction merge's layer-0 loop (merge_layer.cu:100-121) on the
    quantized-adjacency layout: same walk semantics as best_first_search
    (ops/traverse.py) but fetching one contiguous code block per anchor
    instead of per-candidate f32 rows. Distances are to the dequantized
    points (the metric the reference's native uint8 mode builds in).
    """
    P = max(1, pops_per_iter)
    if cap is None:
        cap = max(64, (P * index.cand_per_fetch) // 4)
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    steps = -(-max_iterations // P)

    def cond(carry):
        st, it, alive = carry
        return (it < steps) & alive

    def body(carry):
        st, it, _ = carry
        st, active = _fused_step(
            st, q_vecs, q_sq, index, measure,
            k_best=k_best, P=P, cap=cap, use_pallas=use_pallas,
        )
        return st, it + 1, jnp.any(active)

    state, _, _ = jax.lax.while_loop(
        cond, body, (state, jnp.int32(0), jnp.bool_(True))
    )
    return state


def fused_best_first_compacted(
    state,
    q_vecs,
    q_sq,
    index,
    measure: DistanceMeasure,
    max_iterations: int,
    k_best: int,
    pops_per_iter: int = 8,
    cap: int | None = None,
    use_pallas: bool | None = None,
    compact_levels: int = 3,
):
    """:func:`fused_best_first` with converged-row compaction; returns the
    final ``k_best`` beam columns (ids, dists) per row instead of the state.

    Bit-identical to the plain loop (see :func:`_best_first_phases`). Used
    by the construction merge, whose rows run to CONVERGENCE (not a fixed
    budget) -- the lock-step tile otherwise pays the full per-step
    sort/merge cost for the straggler tail."""
    P = max(1, pops_per_iter)
    if cap is None:
        cap = max(64, (P * index.cand_per_fetch) // 4)
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    steps = -(-max_iterations // P)
    return _best_first_phases(
        state, q_vecs, q_sq, index, measure,
        steps=steps, k_best=k_best, P=P, cap=cap, use_pallas=use_pallas,
        k_out=k_best, compact_levels=compact_levels, want_d=True,
    )


def _best_first_phases(
    state,
    q_vecs,
    q_sq,
    index,
    measure: DistanceMeasure,
    *,
    steps: int,
    k_best: int,
    P: int,
    cap: int,
    use_pallas: bool,
    k_out: int,
    compact_levels: int,
    xi_update=None,
    want_d: bool = False,
    min_rows: int = 256,
):
    """The best-first sweep as PHASES of statically halving row counts.

    Rows walk independently, so once enough rows of the lock-step tile have
    converged the live rows are compacted into a half-size sub-tile that
    keeps stepping, and so on. Every non-converged row still receives its
    full pop budget, so results are BIT-IDENTICAL to the single-phase sweep
    -- but converged rows stop paying the per-step sort/merge cost the
    moment the stragglers fit a smaller tile. This recovers the reference's
    free per-block exit (query_layer.cu:57-79: each CUDA block simply
    returns when its queue empties). Shared by the query engine and the
    construction merge, where rows run to convergence and the straggler
    tail dominates the lock-step cost.

    Returns the first ``k_out`` beam columns per original row:
    (ids [B, k_out], dists [B, k_out] or None if not ``want_d``).
    ``xi_update``: optional per-step slack tightening (the query's dynamic
    criterion, query_layer.cu:58-63).
    """
    B = q_vecs.shape[0]
    caps = [B]
    for _ in range(max(0, compact_levels)):
        if caps[-1] // 2 >= min_rows:  # tiny tiles underfill the VPU
            caps.append(caps[-1] // 2)

    def run_phase(st, q, qs, it, live, min_live):
        def cond(carry):
            _st, it_, live_ = carry
            return (it_ < steps) & (jnp.sum(live_) > min_live)

        def body(carry):
            st_, it_, _ = carry
            if xi_update is not None:
                st_ = st_._replace(xi=xi_update(st_))
            st_, active = _fused_step(
                st_, q, qs, index, measure,
                k_best=k_best, P=P, cap=cap, use_pallas=use_pallas,
            )
            return st_, it_ + 1, active

        return jax.lax.while_loop(cond, body, (st, it, live))

    live = jnp.ones((B,), bool)
    it = jnp.int32(0)
    st, q, qs = state, q_vecs, q_sq
    idx = jnp.arange(B, dtype=jnp.int32)  # original row of each tile row
    out_i = None
    out_d = None
    for pi, rows in enumerate(caps):
        next_min = caps[pi + 1] if pi + 1 < len(caps) else 0
        if pi:
            # stable sort brings live rows to the front in original order;
            # phase pi-1 exited with <= ``rows`` live rows (or out of budget,
            # in which case the loops below run zero iterations)
            key = (~live).astype(jnp.int32)
            pos_ = jnp.arange(live.shape[0], dtype=jnp.int32)
            _, order = jax.lax.sort(
                (key, pos_), dimension=-1, num_keys=1, is_stable=True
            )
            sel = order[:rows]
            st = jax.tree.map(lambda a: a[sel], st)
            q, qs, live, idx = q[sel], qs[sel], live[sel], idx[sel]
        st, it, live = run_phase(st, q, qs, it, live, next_min)
        ii = st.i[:, :k_out]
        out_i = ii if out_i is None else out_i.at[idx].set(ii)
        if want_d:
            dd = st.d[:, :k_out]
            out_d = dd if out_d is None else out_d.at[idx].set(dd)
    return out_i, out_d


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "vis_size", "k_query", "measure", "max_iterations",
        "pops_per_iter", "num_seeds", "rerank", "cap", "use_pallas",
        "compact_levels", "seed_approx", "sort_bf16",
    ),
)
def _fused_query_tile(
    q_vecs,  # [B, D]
    index: FusedIndex,
    base,  # [N, D] original vectors (exact re-rank)
    base_sq,  # [N]
    tau_query,
    *,
    width: int,
    vis_size: int,
    k_query: int,
    measure: DistanceMeasure,
    max_iterations: int,
    pops_per_iter: int,
    num_seeds: int,
    rerank: int,
    cap: int,
    use_pallas: bool = False,
    compact_levels: int = 0,
    seed_approx: bool = False,
    sort_bf16: bool = False,
):
    B, D = q_vecs.shape
    P = pops_per_iter
    q_vecs = q_vecs.astype(jnp.float32)
    q_sq = jnp.sum(q_vecs * q_vecs, axis=-1)

    # dynamic slack (query_layer.cu:48-63): from the max 1-NN distance,
    # tightened by the current best distance
    nn1 = index.nn1_stats
    if measure == DistanceMeasure.Euclidean:
        xi0 = (nn1[1] * nn1[1]) * tau_query * tau_query
        dyn = lambda st: jnp.minimum(xi0, st.d[:, 0] * tau_query * tau_query)
    else:
        xi0 = nn1[1] * tau_query
        dyn = lambda st: jnp.minimum(xi0, st.d[:, 0] * tau_query)

    state = beam_init(
        B, width, xi0, vis_size,
        dist_dtype=jnp.bfloat16 if sort_bf16 else jnp.float32,
    )

    # --- seed: dense rep scan (one MXU tile), top seeds enter the beam ---
    seed_d_all = dist_block(
        q_vecs, index.rep_vecs, measure, q_sq=q_sq, c_sq=index.rep_sq
    )
    if seed_approx:
        # TPU-native partial reduction (~0.95 per-seed recall): seeds are
        # redundant entry points, so approximate selection is free quality-
        # wise while skipping the full-width top_k sort over all reps
        seed_d, pos = jax.lax.approx_min_k(seed_d_all, num_seeds)
    else:
        neg_d, pos = jax.lax.top_k(-seed_d_all, num_seeds)
        seed_d = -neg_d
    seed_ids = index.rep_ids[pos].astype(jnp.int32)
    no_crit = jnp.full((B,), EMPTY_DIST, jnp.float32)
    state = beam_insert(state, seed_ids, seed_d, criteria=no_crit)

    steps = -(-max_iterations // P)

    # converged-row compaction (see _best_first_phases): results are
    # bit-identical to the single-phase sweep, stragglers step in smaller
    # tiles. Only the top-R candidate ids are needed for the re-rank.
    R = min(rerank, width)
    result_i, _ = _best_first_phases(
        state, q_vecs, q_sq, index, measure,
        steps=steps, k_best=k_query, P=P, cap=cap, use_pallas=use_pallas,
        k_out=R, compact_levels=compact_levels, xi_update=dyn,
    )

    # --- exact re-rank of the top survivors (one small f32 gather) ---
    cand = result_i
    safe = jnp.clip(cand, 0, None)
    vecs = base[safe].astype(jnp.float32)  # [B, R, D]
    dot = jnp.einsum(
        "bd,brd->br", q_vecs, vecs,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    if measure == DistanceMeasure.Euclidean:
        d = jnp.maximum(q_sq[:, None] + base_sq[safe] - 2.0 * dot, 0.0)
    else:
        norm_sq = q_sq[:, None] * base_sq[safe]
        okn = norm_sq > 0.0
        d = jnp.abs(1.0 - dot * jax.lax.rsqrt(jnp.where(okn, norm_sq, 1.0)))
        d = jnp.where(okn, d, 1.0)
    d = jnp.where(cand == EMPTY_ID, EMPTY_DIST, d)
    d, i = jax.lax.sort((d, cand), dimension=-1, num_keys=1)
    return i[:, :k_query], d[:, :k_query]


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk_plan", "shard_base", "pack_results",
        "width", "vis_size", "k_query", "measure", "max_iterations",
        "pops_per_iter", "num_seeds", "rerank", "cap", "use_pallas",
        "compact_levels", "seed_approx", "sort_bf16",
    ),
)
def _fused_query_chunks(
    query,  # [Q, D] full query batch
    index: FusedIndex,
    base,
    base_sq,
    tau_query,
    *,
    chunk_plan,  # static tuple of (start, padded_rows) per chunk
    shard_base: int,
    pack_results: bool = False,
    **statics,
):
    """Chunk split + every chunk's walk + concat + tail slice + shard-id
    offset as ONE program. The TPU relay charges a fixed round trip
    (~10-25 ms) per dispatched program, so a 10k-query call issued as
    [slice, pad, 8192-chunk, 2048-chunk, concat, offset] ops costs several
    round trips of pure latency; fusing them recovers nearly all of it (the
    reference pays one kernel launch per shard, query_kernels.cu:112-158)."""
    Q = query.shape[0]
    outs = []
    for lo, tgt in chunk_plan:
        qc = query[lo : min(lo + tgt, Q)]
        pad = tgt - qc.shape[0]
        if pad:
            qc = jnp.pad(qc, ((0, pad), (0, 0)))
        outs.append(
            _fused_query_tile(qc, index, base, base_sq, tau_query, **statics)
        )
    ids = jnp.concatenate([o[0] for o in outs], axis=0)[:Q]
    dists = jnp.concatenate([o[1] for o in outs], axis=0)[:Q]
    if shard_base:
        # global ids for multi-shard merges (query_layer.cu:81-90 writes
        # on_gpu_shard_id * N_base offsets in-kernel)
        ids = jnp.where(ids >= 0, ids + jnp.int32(shard_base), ids)
    if pack_results:
        # single-program host handoff: bitcast-stack (ids, dists) so the
        # caller fetches both in ONE D2H with no separate packing program
        # (each extra program costs a serialized relay round trip)
        return jnp.stack(
            [jax.lax.bitcast_convert_type(ids, jnp.float32), dists]
        )
    return ids, dists


def fused_query(
    query: jax.Array,
    index: FusedIndex,
    base: jax.Array,
    KQuery: int,
    tau_query: float,
    max_iterations: int = 400,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    *,
    base_sq: jax.Array | None = None,
    chunk: int = 8192,
    pops_per_iter: int = 16,
    num_seeds: int = 16,
    rerank: int | None = None,
    cap: int | None = None,
    vis_size: int | None = None,
    use_pallas: bool | None = None,
    shard_base: int = 0,
    pack_results: bool = False,
    compact_levels: int = 2,
    seed_approx: bool = False,
    sort_bf16: bool = False,
    width: int | None = None,
):
    """Query one shard through its quantized-adjacency index.

    Same user parameters as the reference query (KQuery, tau_query,
    max_iterations -- the total anchor-pop budget, ggnn.cuh:144-155).

    Returns (ids [Q, KQuery] i32 shard-local, dists [Q, KQuery] f32 exact),
    rows sorted ascending. With ``pack_results=True`` returns instead ONE
    [2, Q, KQuery] f32 array (row 0 = ids bit-cast) for a single-D2H host
    handoff.
    """
    measure = DistanceMeasure(measure)
    width_default, vis_default = GraphConfig.query_beam_geometry(
        KQuery, max_iterations
    )
    if width is None:
        width = width_default
    elif width < KQuery + 1:
        raise ValueError(f"width={width} must exceed KQuery={KQuery}")
    if vis_size is None:
        # the ring records one id per pop; with capacity >= the total pop
        # budget it NEVER wraps, so shrinking it to the budget is exactly
        # semantics-preserving while halving the dedup scan width at small
        # budgets (the reference sizes its cache for the worst case,
        # query_kernels.cu:77-110 -- here jit re-specializes per budget)
        P_ = max(1, pops_per_iter)
        total_pops = -(-max_iterations // P_) * P_
        vis_size = min(vis_default, max(32, -(-total_pops // 32) * 32))
    if base_sq is None:
        base_sq = squared_norms(base)
    if rerank is None:
        rerank = min(width, max(2 * KQuery, 32))
    if cap is None:
        # a quarter of the raw tile survives criteria+dedup in steady state;
        # survivors beyond the cap cost at most a revisit
        cap = max(64, (max(1, pops_per_iter) * index.cand_per_fetch) // 4)
    Q = query.shape[0]
    if Q == 0:
        return (
            jnp.zeros((0, KQuery), jnp.int32),
            jnp.zeros((0, KQuery), jnp.float32),
        )
    tau = jnp.float32(tau_query)
    num_seeds = min(num_seeds, int(index.rep_ids.shape[0]))
    if use_pallas is None:
        # the Pallas fetch+dot kernel needs a real TPU (CPU tests and the
        # virtual multi-chip mesh lower it in interpret mode only).
        # False = XLA gather path; True = Pallas at qt=8 (queries per grid
        # step, i.e. qt*P DMA blocks in flight per buffer slot); an int
        # selects that qt directly (pipeline-depth experiments).
        use_pallas = jax.default_backend() not in ("cpu",)
    # chunk plan: pad the tail chunk only to the next power of two (>= 256),
    # not to the full chunk: 10k queries run as 8192 + 2048 instead of
    # 8192 + 8192 -- the lock-step sweep pays for every padded row. A
    # non-pow2 ``chunk`` (e.g. 10240 = one tile for a 10k batch) caps the
    # padding at the chunk itself instead of overshooting to the next pow2.
    chunk = min(chunk, max(256, 1 << (Q - 1).bit_length()))
    plan = []
    for lo in range(0, Q, chunk):
        rows = min(chunk, Q - lo)
        plan.append((lo, min(chunk, max(256, 1 << (rows - 1).bit_length()))))
    return _fused_query_chunks(
        query, index, base, base_sq, tau,
        chunk_plan=tuple(plan), shard_base=shard_base,
        pack_results=pack_results,
        width=width, vis_size=vis_size, k_query=KQuery, measure=measure,
        max_iterations=max_iterations, pops_per_iter=max(1, pops_per_iter),
        num_seeds=num_seeds, rerank=rerank, cap=cap, use_pallas=use_pallas,
        compact_levels=max(0, compact_levels), seed_approx=seed_approx,
        sort_bf16=sort_bf16,
    )


def fused_index_matches_graph(index, graph, k_build: int) -> bool:
    """Whether a (possibly stale) fused index belongs to this graph.

    For a full :class:`FusedIndex`: every group row must hold exactly its
    members' current layer-0 neighbor ids. For a :class:`FusedIndexMeta`
    (the persisted form) the adjacency is re-derived from the CURRENT graph
    at assembly, so wrong *results* cannot go stale -- but a matching from a
    different graph pairs suboptimally and its quantizer may not fit this
    base at all, so the meta carries a layer-0 fingerprint that must match
    (plus a coverage check for shape/N mismatches)."""
    try:
        nbr0 = np.asarray(graph.neighbors[0])
        N, K = nbr0.shape
        if K != k_build:
            return False
        m = np.asarray(index.members)
        flat = np.sort(m[m >= 0].ravel())
        if flat.shape != (N,) or not np.array_equal(flat, np.arange(N)):
            return False
        if isinstance(index, FusedIndexMeta):
            return bool(
                np.any(index.graph_fp)
                and np.array_equal(index.graph_fp, graph_fingerprint(graph))
            )
        if index.k_build != K or np.asarray(index.group_of).shape != (N,):
            return False
        expected = np.where(
            (m >= 0)[:, :, None], nbr0[np.clip(m, 0, None)], -1
        ).reshape(m.shape[0], m.shape[1] * K)
        return np.array_equal(np.asarray(index.nbr_ids), expected)
    except Exception:
        return False


def meta_of(index, graph=None) -> FusedIndexMeta:
    """The persistable meta of an index (tiny host arrays; for a device
    index this pulls ~a few MB, never the inline-code tables). Pass the
    source ``graph`` to stamp the staleness fingerprint -- without it the
    meta is rejected by any future load (safe default)."""
    if isinstance(index, FusedIndexMeta):
        return index
    return FusedIndexMeta(
        members=np.asarray(index.members),
        scale=np.asarray(index.scale),
        zero=np.asarray(index.zero),
        graph_fp=(
            graph_fingerprint(graph)
            if graph is not None
            else np.zeros((32,), np.uint8)
        ),
        bits=np.asarray([index.bits], np.int32),
    )


def save_fused_index(path: str | Path, index, graph=None) -> None:
    """Persist the index meta alongside the graph shard (.npz + JSON
    header). Only the group matching + quantizer are written -- the
    inline-code tables are derived state, reconstructed on load by
    :func:`assemble_fused_index` (see FusedIndexMeta). Pass ``graph`` so
    the sidecar carries the staleness fingerprint load() checks."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    m = meta_of(index, graph)
    header = {
        "format": "meta-v2",
        "n": int((np.asarray(m.members) >= 0).sum()),
        "group": int(m.members.shape[1]),
    }
    np.savez(
        path,
        meta=json.dumps(header),
        **{k: np.asarray(v) for k, v in m._asdict().items()},
    )


def load_fused_index(path: str | Path) -> FusedIndexMeta:
    """Load a fused-index sidecar as its meta. Legacy full dumps (pre
    meta-v2, no ``graph_fp`` field) load with an all-zeros fingerprint,
    which :func:`fused_index_matches_graph` treats as unvalidatable --
    they are therefore rejected downstream and rebuilt, never trusted."""
    with np.load(Path(path), allow_pickle=False) as f:
        vals = {}
        for k in FusedIndexMeta._fields:
            if k == "graph_fp" and k not in f:
                vals[k] = np.zeros((32,), np.uint8)
            elif k == "bits" and k not in f:
                vals[k] = np.asarray([8], np.int32)  # pre-int4 sidecars
            else:
                vals[k] = np.asarray(f[k])
        return FusedIndexMeta(**vals)
