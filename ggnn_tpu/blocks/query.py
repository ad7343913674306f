"""Block-native ANN query: best-first search over the block graph.

Same search semantics as the reference's QueryKernel
(src/ggnn/query/query_layer.cu:39-97) -- best-first expansion from fixed
starting points under the dynamic slack criterion -- but the traversal unit
is a *block* of ``BS`` spatially-coherent points instead of a single point:

  * seeding scores EVERY block centroid against the query tile in one dense
    MXU matmul and admits the top blocks -- the TPU-native replacement for
    the reference's hierarchy descent (dense scans are nearly free on MXU,
    pointer-chased descent is not);
  * the frontier beam holds block ids scored by their best member distance;
  * admitting a block costs ONE contiguous multi-KB fetch and ONE MXU tile
    ``[B, C, BS]`` instead of BS scattered 512-byte row gathers;
  * every admitted block's members are merged into a per-query point top-K
    (the result list); the block beam only steers local refinement.

An id ring of every block ever admitted prevents re-fetching (the visited
ring of simple_knn_cache.cuh:73-87, lifted to blocks); a final sort-based
pass drops the rare duplicate ids that ring overflow can cause.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ggnn_tpu.config import DistanceMeasure, next_multiple
from ggnn_tpu.blocks.layout import BlockIndex
from ggnn_tpu.ops.distance import dist_block

__all__ = ["block_query"]

EMPTY_ID = -1
EMPTY_DIST = jnp.inf


def _dedup_blocks(beam_i, ring, cand, valid):
    """Mask of candidate blocks not already admitted (beam or ring) and
    unique within the tile ([B, K] bool)."""
    K = cand.shape[1]
    ok = (cand != EMPTY_ID) & valid
    eq = cand[:, :, None] == cand[:, None, :]
    lower = jnp.tril(jnp.ones((K, K), bool), k=-1)
    ok &= ~jnp.any(eq & lower[None], axis=-1)
    seen = jnp.concatenate([beam_i, ring], axis=-1)
    ok &= ~jnp.any(cand[:, :, None] == seen[:, None, :], axis=-1)
    return ok


def _compact(cand, ok, cap):
    """Pack surviving block ids left, truncate to ``cap`` columns."""
    K = cand.shape[1]
    cap = min(cap, K)
    key = (~ok).astype(jnp.int32)
    _, packed = jax.lax.sort((key, cand), dimension=-1, num_keys=1, is_stable=True)
    packed = jnp.where(
        jnp.arange(K, dtype=jnp.int32)[None, :] < jnp.sum(ok, axis=-1)[:, None],
        packed,
        EMPTY_ID,
    )
    return packed[:, :cap]


def _score_blocks(q_vecs, q_sq, cand, index: BlockIndex, measure):
    """Fetch candidate blocks and compute member distances.

    Returns (pt_d [B, C*BS] f32, pt_i [B, C*BS] i32, blk_d [B, C] f32).
    Invalid blocks/padding slots yield inf / -1.
    """
    B, C = cand.shape
    safe = jnp.clip(cand, 0, None)
    vecs = index.base_blk[safe]  # [B, C, BS, D] -- the contiguous block fetch
    sq = index.member_sq[safe]  # [B, C, BS]
    ids = index.member_ids[safe]  # [B, C, BS]

    if vecs.dtype == jnp.bfloat16:
        # MXU-native bf16 x bf16 -> f32 path; squared norms stay f32
        dot = jnp.einsum(
            "bd,bcsd->bcs",
            q_vecs.astype(jnp.bfloat16),
            vecs,
            preferred_element_type=jnp.float32,
        )
    else:
        dot = jnp.einsum(
            "bd,bcsd->bcs",
            q_vecs,
            vecs,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    if measure == DistanceMeasure.Euclidean:
        d = jnp.maximum(q_sq[:, None, None] + sq - 2.0 * dot, 0.0)
        d = jnp.where(jnp.isfinite(sq), d, EMPTY_DIST)
    else:  # Cosine (distance.cuh:140-159 semantics)
        norm_sq = q_sq[:, None, None] * sq
        ok = jnp.isfinite(sq) & (norm_sq > 0.0)
        d = jnp.abs(1.0 - dot * jax.lax.rsqrt(jnp.where(ok, norm_sq, 1.0)))
        d = jnp.where(ok, d, jnp.where(jnp.isfinite(sq), 1.0, EMPTY_DIST))
    bad = (cand == EMPTY_ID)[:, :, None] | (ids == EMPTY_ID)
    d = jnp.where(bad, EMPTY_DIST, d)
    ids = jnp.where(bad, EMPTY_ID, ids)
    blk_d = jnp.min(d, axis=-1)
    BSz = index.block_size
    return d.reshape(B, C * BSz), ids.reshape(B, C * BSz), blk_d


def _merge_points(pt_d, pt_i, new_d, new_i, k):
    """Merge new candidates into the sorted per-query point top-k."""
    if new_d.shape[1] > 2 * k:
        neg, pos = jax.lax.top_k(-new_d, min(k, new_d.shape[1]))
        new_d = -neg
        new_i = jnp.take_along_axis(new_i, pos, axis=-1)
    d = jnp.concatenate([pt_d, new_d], axis=-1)
    i = jnp.concatenate([pt_i, new_i], axis=-1)
    d, i = jax.lax.sort((d, i), dimension=-1, num_keys=1)
    return d[:, :k], i[:, :k]


def _ring_record(ring, head, cand):
    """Append the admitted block ids to the ring (drop past capacity)."""
    B, C = cand.shape
    V = ring.shape[-1]
    valid = cand != EMPTY_ID
    offs = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1
    slot = jnp.where(valid, (head[:, None] + offs) % V, V)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    ring = ring.at[rows, slot].set(cand, mode="drop")
    head = (head + jnp.sum(valid, axis=-1)) % V
    return ring, head


def _dedup_results(pt_d, pt_i):
    """Drop duplicate ids (possible only after ring overflow), keep best."""
    big = jnp.int32(2**30)
    key_i = jnp.where(pt_i == EMPTY_ID, big, pt_i)
    si, sd = jax.lax.sort((key_i, pt_d), dimension=-1, num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros_like(si[:, :1], bool), (si[:, 1:] == si[:, :-1]) & (si[:, 1:] < big)],
        axis=-1,
    )
    sd = jnp.where(dup, EMPTY_DIST, sd)
    si = jnp.where(dup | (si >= big), EMPTY_ID, si)
    sd, si = jax.lax.sort((sd, si), dimension=-1, num_keys=1)
    return sd, si


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_query", "measure", "max_steps", "pops_per_iter", "cap", "beam_width",
        "ring_size", "num_seeds",
    ),
)
def _block_query_tile(
    q_vecs,  # [B, D]
    index: BlockIndex,
    tau_query,
    *,
    k_query: int,
    measure: DistanceMeasure,
    max_steps: int,
    pops_per_iter: int,
    cap: int,
    beam_width: int,
    ring_size: int,
    num_seeds: int,
):
    B, D = q_vecs.shape
    Pb = pops_per_iter
    W = beam_width
    q_vecs = q_vecs.astype(jnp.float32)
    q_sq = jnp.sum(q_vecs * q_vecs, axis=-1)

    nn1 = index.nn1_stats
    if measure == DistanceMeasure.Euclidean:
        xi0 = (nn1[1] * nn1[1]) * tau_query * tau_query
        dyn = lambda d0: jnp.minimum(xi0, d0 * tau_query * tau_query)
    else:
        xi0 = nn1[1] * tau_query
        dyn = lambda d0: jnp.minimum(xi0, d0 * tau_query)

    # block beam + admitted-ring + point results
    beam_d = jnp.full((B, W), EMPTY_DIST, jnp.float32)
    beam_i = jnp.full((B, W), EMPTY_ID, jnp.int32)
    ring = jnp.full((B, ring_size), EMPTY_ID, jnp.int32)
    head = jnp.zeros((B,), jnp.int32)
    pt_d = jnp.full((B, k_query), EMPTY_DIST, jnp.float32)
    pt_i = jnp.full((B, k_query), EMPTY_ID, jnp.int32)

    def admit(carry, cand, crit):
        """Score candidate blocks, merge members into results, insert blocks."""
        beam_d, beam_i, ring, head, pt_d, pt_i = carry
        new_d, new_i, blk_d = _score_blocks(q_vecs, q_sq, cand, index, measure)
        pt_d, pt_i = _merge_points(pt_d, pt_i, new_d, new_i, k_query)
        ring, head = _ring_record(ring, head, cand)
        # blocks enter the frontier only if they could still improve results
        ok = (cand != EMPTY_ID) & (blk_d < crit[:, None])
        blk_d = jnp.where(ok, blk_d, EMPTY_DIST)
        cand = jnp.where(ok, cand, EMPTY_ID)
        d = jnp.concatenate([beam_d, blk_d], axis=-1)
        i = jnp.concatenate([beam_i, cand], axis=-1)
        d, i = jax.lax.sort((d, i), dimension=-1, num_keys=1)
        return (d[:, :W], i[:, :W], ring, head, pt_d, pt_i)

    # --- seed: dense centroid scan, admit the top blocks per query ---
    seed_d = dist_block(
        q_vecs, index.centroids, measure, q_sq=q_sq, c_sq=index.centroid_sq
    )
    _, seed = jax.lax.top_k(-seed_d, min(num_seeds, seed_d.shape[1]))
    seed = seed.astype(jnp.int32)
    no_crit = jnp.full((B,), EMPTY_DIST, jnp.float32)
    carry = admit((beam_d, beam_i, ring, head, pt_d, pt_i), seed, no_crit)

    def cond(state):
        carry, it, alive = state
        return (it < max_steps) & alive

    def body(state):
        carry, it, _ = state
        beam_d, beam_i, ring, head, pt_d, pt_i = carry
        xi = dyn(pt_d[:, 0])
        crit = pt_d[:, k_query - 1] + xi

        # pop the Pb best frontier blocks below the criterion
        mask = (beam_i != EMPTY_ID) & (beam_d < crit[:, None])
        iota = jnp.arange(W, dtype=jnp.int32)[None, :]
        key = jnp.where(mask, iota, W)
        pos = jax.lax.sort(key, dimension=-1)[:, :Pb]
        valid = pos < W
        safe_pos = jnp.minimum(pos, W - 1)
        anchors = jnp.where(
            valid, jnp.take_along_axis(beam_i, safe_pos, axis=-1), EMPTY_ID
        )
        hit = jnp.any(
            (iota[:, :, None] == pos[:, None, :]) & valid[:, None, :], axis=-1
        )
        # evict popped blocks: the beam is pure frontier (keeping expanded
        # entries crowds out frontier capacity -- the same failure mode the
        # reference avoids by removing the popped queue copy,
        # simple_knn_cache.cuh:233-235; the ring still dedups them)
        beam_d = jnp.where(hit, EMPTY_DIST, beam_d)
        beam_i = jnp.where(hit, EMPTY_ID, beam_i)
        active = jnp.any(valid, axis=-1)

        # expand: neighbor blocks of the popped anchors
        KB = index.blk_nbrs.shape[1]
        safe_anchor = jnp.where(anchors != EMPTY_ID, anchors, 0)
        nbrs = index.blk_nbrs[safe_anchor].reshape(B, Pb * KB)
        nbr_valid = jnp.repeat(
            anchors != EMPTY_ID, KB, axis=-1, total_repeat_length=Pb * KB
        )
        ok = _dedup_blocks(beam_i, ring, nbrs, nbr_valid)
        cand = _compact(nbrs, ok, cap)

        carry = admit((beam_d, beam_i, ring, head, pt_d, pt_i), cand, crit)
        # converged rows keep their state (the masked lock-step sweep)
        keep = lambda new, old: jnp.where(
            active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
        )
        carry = tuple(
            keep(n, o)
            for n, o in zip(carry, (beam_d, beam_i, ring, head, pt_d, pt_i))
        )
        return carry, it + 1, jnp.any(active)

    carry, _, _ = jax.lax.while_loop(cond, body, (carry, jnp.int32(0), jnp.bool_(True)))
    pt_d, pt_i = carry[-2], carry[-1]
    return _dedup_results(pt_d, pt_i)


def block_query(
    query: jax.Array,
    index: BlockIndex,
    KQuery: int,
    tau_query: float,
    max_iterations: int = 400,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    *,
    chunk: int = 2048,
    pops_per_iter: int = 4,
    cap_fraction: float = 0.5,
    max_steps: int | None = None,
    num_seeds: int = 24,
):
    """Query one shard through its block index.

    ``max_iterations`` keeps the reference's meaning of a total *point*
    expansion budget: it is converted into block steps so that
    ``steps * pops * BS`` member evaluations roughly match the row engine's
    ``max_iterations * KBuild`` candidate evaluations.

    Returns (ids [Q, KQuery] i32 shard-local, dists [Q, KQuery] f32), rows
    sorted ascending.
    """
    measure = DistanceMeasure(measure)
    BS = index.block_size
    KB = index.blk_nbrs.shape[1]
    Pb = max(1, pops_per_iter)
    raw = Pb * KB
    cap = raw if cap_fraction >= 1.0 else max(8, int(raw * cap_fraction + 7) // 8 * 8)
    cap = min(cap, raw)
    if max_steps is None:
        # point-evaluation parity with the row engine's budget (KBuild~24
        # candidates per point pop), floored for exploration depth
        max_steps = max(4, -(-max_iterations * 24 // (cap * BS)))
    beam_width = next_multiple(max(32, 2 * cap, num_seeds), 32)
    ring_size = next_multiple(num_seeds + max_steps * cap, 128)

    Q = query.shape[0]
    if Q == 0:
        return (
            jnp.zeros((0, KQuery), jnp.int32),
            jnp.zeros((0, KQuery), jnp.float32),
        )
    tau = jnp.float32(tau_query)
    outs_d, outs_i = [], []
    chunk = min(chunk, max(256, 1 << (Q - 1).bit_length()))
    for lo in range(0, Q, chunk):
        qc = query[lo : lo + chunk]
        # tail chunk pads only to the next power of two (>= 256) -- every
        # padded row costs real work in the lock-step sweep
        tgt = max(256, 1 << (qc.shape[0] - 1).bit_length())
        pad = tgt - qc.shape[0]
        if pad:
            qc = jnp.pad(qc, ((0, pad), (0, 0)))
        d, i = _block_query_tile(
            qc,
            index,
            tau,
            k_query=KQuery,
            measure=measure,
            max_steps=max_steps,
            pops_per_iter=Pb,
            cap=cap,
            beam_width=beam_width,
            ring_size=ring_size,
            num_seeds=num_seeds,
        )
        outs_d.append(d)
        outs_i.append(i)
    ids = jnp.concatenate(outs_i, axis=0)[:Q]
    dists = jnp.concatenate(outs_d, axis=0)[:Q]
    return ids, dists
