"""Distance computation primitives, MXU-first.

TPU-native replacement for the reference's block-cooperative ``Distance``
(include/ggnn/cuda_utils/distance.cuh:34-164). Instead of one CUDA block
reducing one pair at a time, distances are computed as dense tiles on the
MXU: ``[M, D] x [D, N] -> [M, N]`` (or batched ``[B, K, D]`` gathers reduced
against per-row queries on the VPU/MXU).

Semantics match the reference:
  * Euclidean -> *squared* L2 (sqrt is only applied to 1-NN statistics).
  * Cosine    -> ``|1 - <a,b> / sqrt(|a|^2 |b|^2)|``, and 1.0 when either
    norm is zero (distance.cuh:140-159).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ggnn_tpu.config import DistanceMeasure

__all__ = ["EMPTY_DIST", "squared_norms", "dist_block", "dist_gathered"]

EMPTY_DIST = jnp.inf


def _as_f32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


def squared_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms, f32. ``x``: [N, D] (any real dtype)."""
    x = _as_f32(x)
    return jnp.sum(x * x, axis=-1)


def dist_block(
    q: jax.Array,
    c: jax.Array,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    *,
    q_sq: jax.Array | None = None,
    c_sq: jax.Array | None = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Dense distance tile between query rows and candidate rows.

    Args:
      q: [M, D] queries.
      c: [N, D] candidates.
      q_sq / c_sq: optional precomputed squared norms ([M] / [N]).
      precision: matmul precision (use ``jax.lax.Precision.HIGHEST`` for the
        brute-force oracle).

    Returns: [M, N] f32 distances.
    """
    q = _as_f32(q)
    c = _as_f32(c)
    dot = jnp.dot(q, c.T, precision=precision, preferred_element_type=jnp.float32)
    if measure == DistanceMeasure.Euclidean:
        if q_sq is None:
            q_sq = jnp.sum(q * q, axis=-1)
        if c_sq is None:
            c_sq = jnp.sum(c * c, axis=-1)
        d = q_sq[:, None] + c_sq[None, :] - 2.0 * dot
        return jnp.maximum(d, 0.0)
    elif measure == DistanceMeasure.Cosine:
        if q_sq is None:
            q_sq = jnp.sum(q * q, axis=-1)
        if c_sq is None:
            c_sq = jnp.sum(c * c, axis=-1)
        norm_sq = q_sq[:, None] * c_sq[None, :]
        safe = norm_sq > 0.0
        d = jnp.abs(1.0 - dot * jax.lax.rsqrt(jnp.where(safe, norm_sq, 1.0)))
        return jnp.where(safe, d, 1.0)
    raise ValueError(f"unknown measure {measure}")


def dist_gathered(
    q: jax.Array,
    cand: jax.Array,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    *,
    q_sq: jax.Array | None = None,
    cand_sq: jax.Array | None = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Distances between per-row queries and per-row gathered candidates.

    Args:
      q: [B, D] query vectors (one per row).
      cand: [B, K, D] candidate vectors gathered for each row.
      q_sq: optional [B] squared query norms.
      cand_sq: optional [B, K] squared candidate norms.

    Returns: [B, K] f32 distances.
    """
    q = _as_f32(q)
    cand = _as_f32(cand)
    dot = jnp.einsum(
        "bd,bkd->bk", q, cand, precision=precision, preferred_element_type=jnp.float32
    )
    if measure == DistanceMeasure.Euclidean:
        if q_sq is None:
            q_sq = jnp.sum(q * q, axis=-1)
        if cand_sq is None:
            cand_sq = jnp.sum(cand * cand, axis=-1)
        return jnp.maximum(q_sq[:, None] + cand_sq - 2.0 * dot, 0.0)
    elif measure == DistanceMeasure.Cosine:
        if q_sq is None:
            q_sq = jnp.sum(q * q, axis=-1)
        if cand_sq is None:
            cand_sq = jnp.sum(cand * cand, axis=-1)
        norm_sq = q_sq[:, None] * cand_sq
        safe = norm_sq > 0.0
        d = jnp.abs(1.0 - dot * jax.lax.rsqrt(jnp.where(safe, norm_sq, 1.0)))
        return jnp.where(safe, d, 1.0)
    raise ValueError(f"unknown measure {measure}")
