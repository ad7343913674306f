"""Pallas TPU kernel: fused anchor-block fetch + dequant dot + meta unpack.

The fused query engine's hot memory access is the anchor expansion
(ggnn_tpu/query/fused.py:_code_dists): for every popped anchor, fetch its
inline adjacency block and dot it with the (scaled) query row. In XLA this
is a gather followed by an einsum -- the gather cannot fuse into the dot,
so the gathered codes (``B*P*K*D`` bytes) are materialized to HBM,
converted to bf16 (2x that), and re-read by the matmul: ~5x the
unavoidable traffic.

One block is the anchor's ``[CR, D]`` uint8 code rows: one row per
neighbor (u8), or one row per neighbor PAIR with int4 codes packed two per
byte (``nibbles`` -- half the bytes per candidate). The walk's ids+norms
row comes from a separate lane-padded meta-table gather
(fused.py:_pack_meta). Folding that meta row INTO the fetch block was
built and measured NET-NEGATIVE at the 262k headline point (-26% QPS,
round 5): alignment forces 8 extra block rows whose DMA bytes and matmul
rows cost more than the ~0.3 ms/step gather they save -- don't retry.

This kernel streams each anchor's block HBM->VMEM with double-buffered
async DMA (one contiguous descriptor per anchor -- the layout the whole
fused engine exists to enable) and computes the dequant dot on the MXU in
place. Only the [B, P, K] f32 dot tile is ever written back.

Structure per grid step (one step = QT queries = G = QT*P anchor blocks):
  * issue G block DMAs for step i+1 into the alternate buffer slot,
  * wait for step i's G blocks,
  * one bf16 MXU matmul [G*CR, D] x [QT, D]^T (int4 unpacks to 2*G*CR
    rows, [all-low | all-high]),
  * a static mask selects each block's own query column (block g belongs
    to query g // P -- a compile-time pattern), reduce, write [G, K].

The anchor ids arrive via scalar prefetch (PrefetchScalarGridSpec) so the
DMA source addresses are known ahead of the grid step.

Replaces the device-side hot path of the reference's ``fetch``
(simple_knn_cache.cuh:241-289), whose warp loop pulls one neighbor vector
at a time through L2; here one descriptor pulls the whole adjacency block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["adjacency_dot", "adjacency_dot_xla"]


def adjacency_dot_xla(qs: jax.Array, anchors: jax.Array, blocks: jax.Array,
                      *, nibbles: bool = False):
    """Reference XLA path: gather + einsum (used on CPU and as the oracle).

    qs: [B, D] f32 -- query rows, already scaled by the dequant ``scale``.
    anchors: [B, P] i32 (-1 allowed; callers mask the results).
    blocks: [N, CR, D] u8 -- inline neighbor codes. With ``nibbles`` each
    code row carries TWO neighbors' int4 codes (low nibble first); the dot
    columns then come out [all-low | all-high] -- the index packs its meta
    ids in the same order.
    Returns dots [B, P, K] f32 against the raw codes (K = CR, or 2*CR for
    nibbles).
    """
    safe = jnp.clip(anchors, 0, None)
    craw = blocks[safe]  # [B, P, CR, D] u8
    if nibbles:
        codes = jnp.concatenate([craw & 15, craw >> 4], axis=2)
    else:
        codes = craw
    return jnp.einsum(
        "bd,bpkd->bpk",
        qs.astype(jnp.bfloat16),
        codes.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _kernel(anchors_ref, qs_ref, blocks_hbm, out_ref, blk_buf, sems,
            *, QT, P, CR, D, NIB):
    G = QT * P
    i = pl.program_id(0)
    nc = pl.num_programs(0)

    # EMPTY (-1) anchors issue no DMA at all: converged rows pop nothing, so
    # late sweep steps -- where most rows have converged -- stop paying the
    # per-descriptor cost that bounds this kernel. The skip condition is the
    # same pure function of the prefetched anchors at issue and wait time, so
    # start/wait always pair up. (Stale buffer contents for skipped blocks
    # flow into the matmul; callers mask those lanes via the EMPTY anchor
    # id, ggnn_tpu/query/fused.py:_code_dists.)
    def issue(chunk, slot):
        base = chunk * G
        for g in range(G):
            aid = anchors_ref[base + g]

            @pl.when(aid >= 0)
            def _():
                pltpu.make_async_copy(
                    blocks_hbm.at[aid], blk_buf.at[slot, g], sems.at[slot, g]
                ).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    @pl.when(i + 1 < nc)
    def _():
        issue(i + 1, (i + 1) % 2)

    slot = i % 2
    base = i * G
    for g in range(G):
        aid = anchors_ref[base + g]

        @pl.when(aid >= 0)
        def _():
            pltpu.make_async_copy(
                blocks_hbm.at[aid], blk_buf.at[slot, g], sems.at[slot, g]
            ).wait()

    # Mosaic has no direct u8->float cast; widen to i32 first (VPU moves)
    raw = blk_buf[slot].reshape(G * CR, D).astype(jnp.int32)
    if NIB:
        # int4: each code row carries two neighbors (low nibble first); one
        # matmul over the stacked [all-low | all-high] rows, output columns
        # in the same order (the index packs meta ids to match)
        codes = jnp.concatenate([raw & 15, raw >> 4], axis=0).astype(
            jnp.bfloat16
        )  # [2*G*CR, D]
    else:
        codes = raw.astype(jnp.bfloat16)  # [G*CR, D]
    RW = codes.shape[0]
    q = qs_ref[:]  # [QT, D] bf16
    dots = jax.lax.dot_general(
        codes, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [RW, QT]
    # block g belongs to query g // P: row r of dots -> query
    # ((r % (G*CR)) // (CR*P)) (the int4 high-nibble half repeats the pattern)
    row_q = (
        jax.lax.broadcasted_iota(jnp.int32, (RW, QT), 0) % (G * CR)
    ) // (CR * P)
    col_q = jax.lax.broadcasted_iota(jnp.int32, (RW, QT), 1)
    picked = jnp.sum(jnp.where(row_q == col_q, dots, 0.0), axis=1)  # [RW]
    if NIB:
        halves = picked.reshape(2, G, CR)
        out_ref[:] = jnp.concatenate([halves[0], halves[1]], axis=-1)
    else:
        out_ref[:] = picked.reshape(G, CR)


@functools.partial(
    jax.jit, static_argnames=("nibbles", "qt", "interpret")
)
def _adjacency_dot_tpu(qs, anchors, blocks, *, nibbles: bool,
                       qt: int, interpret: bool):
    B, D = qs.shape
    P = anchors.shape[1]
    CR = blocks.shape[1]
    KC = 2 * CR if nibbles else CR
    G = qt * P
    num_chunks = B // qt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # anchors [B*P] i32
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((qt, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # blocks stay in HBM
        ],
        out_specs=pl.BlockSpec((G, KC), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, G, CR, D), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, QT=qt, P=P, CR=CR, D=D, NIB=nibbles),
        out_shape=jax.ShapeDtypeStruct((B * P, KC), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(anchors.reshape(B * P), qs.astype(jnp.bfloat16), blocks)
    return out.reshape(B, P, KC)


def adjacency_dot(
    qs: jax.Array,
    anchors: jax.Array,
    blocks: jax.Array,
    *,
    nibbles: bool = False,
    qt: int = 8,
    interpret: bool = False,
):
    """Fused fetch + dequant dot of the anchors' inline code blocks.

    Same contract as :func:`adjacency_dot_xla`. ``qt`` is the number of
    query rows per grid step (``qt * P`` DMA blocks in flight per buffer
    slot). Requires ``B % qt == 0``, lane-aligned ``D`` and an
    8-row-aligned block (Mosaic slices HBM blocks at 8-sublane
    granularity); callers fall back to the XLA path otherwise.
    """
    B, D = qs.shape
    P = anchors.shape[1]
    # the scalar-prefetch anchor array lives in SMEM (1 MiB on v5e):
    # B*P*4 bytes must leave headroom for the kernel's own scalars, or
    # XLA:TPU fails the whole compile ("Ran out of memory in memory space
    # smem" -- hit at B=8192, P=32)
    CR = blocks.shape[1]
    if (
        B % qt or D % 128 or CR % 8
        or B * P * 4 > (1 << 20) - (8 << 10)
    ):
        return adjacency_dot_xla(qs, anchors, blocks, nibbles=nibbles)
    return _adjacency_dot_tpu(qs, anchors, blocks, nibbles=nibbles,
                              qt=qt, interpret=interpret)
