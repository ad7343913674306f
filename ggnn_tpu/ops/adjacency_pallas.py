"""Pallas TPU kernel: fused anchor-code fetch + dequant dot.

The fused query engine's hot memory access is the anchor expansion
(ggnn_tpu/query/fused.py:_code_dists): for every popped anchor, fetch its
inline ``[K, D]`` uint8 neighbor-code block and dot it with the (scaled)
query row. In XLA this is a gather followed by an einsum -- the gather
cannot fuse into the dot, so the gathered codes (``B*P*K*D`` bytes) are
materialized to HBM, converted to bf16 (2x that), and re-read by the
matmul: ~5x the unavoidable traffic.

This kernel streams each anchor's code block HBM->VMEM with double-buffered
async DMA (one contiguous ~K*D-byte descriptor per anchor -- the layout the
whole fused engine exists to enable) and computes the dequant dot on the MXU
in place. Only the [B, P, K] f32 dot tile is ever written back.

Structure per grid step (one step = QT queries = G = QT*P anchor blocks):
  * issue G block DMAs for step i+1 into the alternate buffer slot,
  * wait for step i's G blocks,
  * one bf16 MXU matmul [G*K, D] x [QT, D]^T -> [G*K, QT],
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


def adjacency_dot_xla(qs: jax.Array, anchors: jax.Array, nbr_codes: jax.Array):
    """Reference XLA path: gather + einsum (used on CPU and as the oracle).

    qs: [B, D] f32 -- query rows, already scaled by the dequant ``scale``.
    anchors: [B, P] i32 (-1 allowed; callers mask the results).
    nbr_codes: [N, K, D] u8.
    Returns [B, P, K] f32 dots against the raw (un-shifted) codes.
    """
    safe = jnp.clip(anchors, 0, None)
    codes = nbr_codes[safe]  # [B, P, K, D] u8
    return jnp.einsum(
        "bd,bpkd->bpk",
        qs.astype(jnp.bfloat16),
        codes.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _kernel(anchors_ref, qs_ref, codes_hbm, out_ref, codes_buf, sems, *, QT, P, K, D):
    G = QT * P
    i = pl.program_id(0)
    nc = pl.num_programs(0)

    # EMPTY (-1) anchors issue no DMA at all: converged rows pop nothing, so
    # late sweep steps -- where most rows have converged -- stop paying the
    # per-descriptor cost that bounds this kernel. The skip condition is the
    # same pure function of the prefetched anchors at issue and wait time, so
    # start/wait always pair up. (Stale buffer contents for skipped blocks
    # flow into the matmul; callers mask those lanes via the EMPTY anchor id,
    # ggnn_tpu/query/fused.py:_code_dists.)
    def issue(chunk, slot):
        base = chunk * G
        for g in range(G):
            aid = anchors_ref[base + g]

            @pl.when(aid >= 0)
            def _():
                pltpu.make_async_copy(
                    codes_hbm.at[aid], codes_buf.at[slot, g], sems.at[slot, g]
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
                codes_hbm.at[aid], codes_buf.at[slot, g], sems.at[slot, g]
            ).wait()

    # Mosaic has no direct u8->float cast; widen to i32 first (VPU moves)
    codes = (
        codes_buf[slot]
        .reshape(G * K, D)
        .astype(jnp.int32)
        .astype(jnp.bfloat16)
    )  # [G*K, D]
    q = qs_ref[:]  # [QT, D] bf16
    dots = jax.lax.dot_general(
        codes, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [G*K, QT]
    # block g belongs to query g // P: row r of dots -> query (r // (K*P)) % QT
    row_q = jax.lax.broadcasted_iota(jnp.int32, (G * K, QT), 0) // (K * P)
    col_q = jax.lax.broadcasted_iota(jnp.int32, (G * K, QT), 1)
    picked = jnp.sum(jnp.where(row_q == col_q, dots, 0.0), axis=1)  # [G*K]
    out_ref[:] = picked.reshape(G, K)


@functools.partial(jax.jit, static_argnames=("qt", "interpret"))
def _adjacency_dot_tpu(qs, anchors, nbr_codes, *, qt: int, interpret: bool):
    B, D = qs.shape
    P = anchors.shape[1]
    K = nbr_codes.shape[1]
    G = qt * P
    num_chunks = B // qt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # anchors [B*P] i32
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((qt, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # codes stay in HBM
        ],
        out_specs=pl.BlockSpec((G, K), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, G, K, D), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, QT=qt, P=P, K=K, D=D),
        out_shape=jax.ShapeDtypeStruct((B * P, K), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(anchors.reshape(B * P), qs.astype(jnp.bfloat16), nbr_codes)
    return out.reshape(B, P, K)


def adjacency_dot(
    qs: jax.Array,
    anchors: jax.Array,
    nbr_codes: jax.Array,
    *,
    qt: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused fetch+dot of the anchors' inline neighbor codes.

    Same contract as :func:`adjacency_dot_xla`. ``qt`` is the number of
    query rows per grid step (``qt * P`` DMA blocks in flight per buffer
    slot). Requires ``B % qt == 0`` and lane-aligned ``D``; callers fall
    back to the XLA path otherwise.
    """
    B, D = qs.shape
    P = anchors.shape[1]
    # the scalar-prefetch anchor array lives in SMEM (1 MiB on v5e):
    # B*P*4 bytes must leave headroom for the kernel's own scalars, or
    # XLA:TPU fails the whole compile ("Ran out of memory in memory space
    # smem" -- hit at B=8192, P=32)
    if B % qt or D % 128 or B * P * 4 > (1 << 20) - (8 << 10):
        return adjacency_dot_xla(qs, anchors, nbr_codes)
    return _adjacency_dot_tpu(qs, anchors, nbr_codes, qt=qt, interpret=interpret)
