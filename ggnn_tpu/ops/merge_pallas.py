"""Pallas TPU kernel: the fused query step's candidate merge.

Replaces three XLA stages of the fused engine's inner loop -- candidate
filter sort, dedup mask, beam insert sort (ops/beam.py) -- with one kernel
whose state never leaves VMEM. The XLA pipeline pays ~2.8 ms/step at
B=8192 because every sort pass and the [B, C, W+V] dedup broadcast
materialize to HBM; here the same work is VPU passes over a row tile.

Pipeline per row: criterion filter -> dedup (vs beam ids, visited ring,
and first-occurrence within the tile) -> descending bitonic sort of the
candidates by (distance, packed id) -> take the best W -> log-depth
bitonic merge with the already-sorted beam -> emit the new beam.

Beam entries are packed ``ip = id * 2 + expanded`` (EMPTY = -2) so the
whole merge moves two arrays; the compound key (d, ip) makes ties
deterministic. Unlike the XLA path there is no ``cap`` truncation -- all
P*K candidates compete, which can only help recall.

Semantics mirror SimpleKNNCache::fetch/push (simple_knn_cache.cuh:126-289):
criterion admission, full-cache dedup, sorted insert with overflow falling
off the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggnn_tpu.ops.bitonic import bitonic_merge_asc, bitonic_sort

__all__ = ["fused_merge", "fused_merge_xla"]

EMPTY_IP = -2  # packed EMPTY: unpacks to id -1, exp 0
_INF = float("inf")


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _dedup_mask(cand_i, ok0, beam_id, vis, chunk=64):
    """True where the candidate duplicates the beam, the visited ring, or an
    earlier *admissible* candidate in the same row (``ok0``: passed the
    criterion/validity pre-filter -- an inadmissible copy must not suppress a
    later one)."""
    R, C = cand_i.shape
    dup = jnp.zeros((R, C), dtype=jnp.bool_)
    seen = jnp.concatenate([beam_id, vis], axis=-1)
    cand_3 = jnp.expand_dims(cand_i, 2)  # [R, C, 1]
    # plain expand_dims + broadcasting only -- mixed None/slice indexing
    # lowers to a gather, which Mosaic rejects
    for s0 in range(0, seen.shape[-1], chunk):
        blk = jnp.expand_dims(jax.lax.slice_in_dim(seen, s0, s0 + chunk, axis=1), 1)
        dup |= jnp.any(cand_3 == blk, axis=-1)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, C, chunk), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, C, chunk), 1)
    for j0 in range(0, C, chunk):
        blk = jnp.expand_dims(jax.lax.slice_in_dim(cand_i, j0, j0 + chunk, axis=1), 1)
        okb = jnp.expand_dims(jax.lax.slice_in_dim(ok0, j0, j0 + chunk, axis=1), 1)
        eq = (cand_3 == blk) & okb
        dup |= jnp.any(eq & ((col + j0) < row), axis=-1)
    return dup


def _merge_rows(cand_i, cand_d, beam_d, beam_ip, vis, crit):
    """The per-row merge pipeline on in-VMEM values (also used by the XLA
    reference path -- identical math, different memory residency)."""
    R, C = cand_i.shape
    W = beam_d.shape[-1]
    ok = (cand_i >= 0) & (cand_d < crit)
    ok &= ~_dedup_mask(cand_i, ok, beam_ip >> 1, vis)
    d = jnp.where(ok, cand_d, _INF)
    ip = jnp.where(ok, cand_i * 2, EMPTY_IP)

    n = _next_pow2(C)
    if n > C:
        d = jnp.concatenate(
            [d, jnp.full((R, n - C), _INF, jnp.float32)], axis=-1
        )
        ip = jnp.concatenate(
            [ip, jnp.full((R, n - C), EMPTY_IP, jnp.int32)], axis=-1
        )
    # descending sort puts the W best candidates in the LAST W lanes, in
    # descending order -- exactly the tail a bitonic merge wants
    d, ip = bitonic_sort(d, ip, descending=True)
    md = jnp.concatenate([beam_d, d[:, n - W :]], axis=-1)
    mip = jnp.concatenate([beam_ip, ip[:, n - W :]], axis=-1)
    md, mip = bitonic_merge_asc(md, mip)
    return md[:, :W], mip[:, :W]


def _kernel(cand_i_ref, cand_d_ref, beam_d_ref, beam_ip_ref, vis_ref, crit_ref,
            out_d_ref, out_ip_ref):
    out_d, out_ip = _merge_rows(
        cand_i_ref[:],
        cand_d_ref[:],
        beam_d_ref[:],
        beam_ip_ref[:],
        vis_ref[:],
        crit_ref[:],
    )
    out_d_ref[:] = out_d
    out_ip_ref[:] = out_ip


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def _fused_merge_tpu(cand_i, cand_d, beam_d, beam_ip, vis, crit, *, rows, interpret):
    B, C = cand_i.shape
    W = beam_d.shape[-1]
    V = vis.shape[-1]
    grid = (B // rows,)
    tile = lambda c: pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_d, out_ip = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[tile(C), tile(C), tile(W), tile(W), tile(V), tile(1)],
        out_specs=(tile(W), tile(W)),
        out_shape=(
            jax.ShapeDtypeStruct((B, W), jnp.float32),
            jax.ShapeDtypeStruct((B, W), jnp.int32),
        ),
        interpret=interpret,
    )(cand_i, cand_d, beam_d, beam_ip, vis, crit[:, None])
    return out_d, out_ip


def fused_merge(
    cand_i: jax.Array,  # [B, C] i32, EMPTY=-1
    cand_d: jax.Array,  # [B, C] f32 (inf where invalid)
    beam_d: jax.Array,  # [B, W] f32 sorted ascending
    beam_ip: jax.Array,  # [B, W] i32 packed id*2+exp, EMPTY=-2
    vis: jax.Array,  # [B, V] i32 visited ring, EMPTY=-1
    crit: jax.Array,  # [B] f32 admission criterion (best_k + xi)
    *,
    rows: int = 16,
    interpret: bool = False,
):
    """Merge this step's candidates into the beam. Returns (d, ip) [B, W]."""
    B = cand_i.shape[0]
    if B % rows:
        rows = 1 << max(0, (B & -B).bit_length() - 1)  # largest pow2 divisor
        rows = min(rows, 16) or 1
    return _fused_merge_tpu(
        cand_i, cand_d, beam_d, beam_ip, vis, crit, rows=rows, interpret=interpret
    )


def fused_merge_xla(cand_i, cand_d, beam_d, beam_ip, vis, crit):
    """Reference implementation: the same pipeline as plain XLA ops (used on
    CPU and as the oracle for the kernel)."""
    return _merge_rows(cand_i, cand_d, beam_d, beam_ip, vis, crit[:, None])
