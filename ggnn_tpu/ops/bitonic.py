"""Lane-wise bitonic sorting networks for Pallas TPU kernels.

``jax.lax.sort`` is a full O(n log^2 n) network and — crucially — each XLA
sort materializes its operands to HBM between passes. Inside a Pallas kernel
the same network runs entirely in VMEM, and when one side is already sorted
(the beam) a bitonic *merge* needs only log n passes.

All helpers operate on ``[rows, n]`` arrays (n a power of two, lanes =
columns) with a compound key (d: f32 primary, ip: i32 secondary). The
secondary key makes the order total, so equal points (same id -> same
distance) become adjacent and tie-breaks are deterministic. Exchanges are
lane-rolls at power-of-two distances -- the classic hypercube network, one
`roll` pair + select per pass.

These replace the beam's XLA sorts (ops/beam.py) inside the fused query
step; the reference's analog is the shared-memory shift-insert of
KBestList/SimpleKNNCache (k_best_list.cuh:77-109).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bitonic_sort", "bitonic_merge_asc", "compound_lt"]


def _roll(x, shift):
    """Circular lane roll; numpy semantics (element i -> i+shift)."""
    # jnp.roll lowers fine in Mosaic for lane axes and in interpret mode
    return jnp.roll(x, shift, axis=-1)


def compound_lt(d_a, ip_a, d_b, ip_b):
    """(d, ip) lexicographic strict less-than."""
    return (d_a < d_b) | ((d_a == d_b) & (ip_a < ip_b))


def _pass(d, ip, s: int, asc: jax.Array):
    """One compare-exchange pass with partner ``lane ^ s``.

    asc: [rows, n] bool -- True where the lane's block sorts ascending.
    """
    n = d.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    low = (lane & s) == 0  # lane is the lower partner
    pd = jnp.where(low, _roll(d, -s), _roll(d, s))
    pip = jnp.where(low, _roll(ip, -s), _roll(ip, s))
    self_lt = compound_lt(d, ip, pd, pip)
    # ascending block: low lane keeps min; descending: low keeps max.
    # pure logical ops -- Mosaic cannot select between i1 vectors
    keep_min = low == asc
    self_le = self_lt | ~compound_lt(pd, pip, d, ip)
    take_self = (keep_min & self_le) | (~keep_min & ~self_lt)
    return (
        jnp.where(take_self, d, pd),
        jnp.where(take_self, ip, pip),
    )


def bitonic_sort(d, ip, *, descending: bool = False):
    """Full bitonic sort of each row by (d, ip). n must be a power of two."""
    n = d.shape[-1]
    assert n & (n - 1) == 0, f"n={n} not a power of two"
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    log_n = n.bit_length() - 1
    for k in range(1, log_n + 1):
        blk = 1 << k
        if k == log_n:
            asc_blk = jnp.full(d.shape, not descending)
        else:
            asc_blk = (lane & blk) == 0
            if descending:
                asc_blk = ~asc_blk
        for s in [1 << j for j in range(k - 1, -1, -1)]:
            d, ip = _pass(d, ip, s, asc_blk)
    return d, ip


def bitonic_merge_asc(d, ip):
    """Ascending cleanup of a bitonic row (e.g. [asc-run, desc-run] concat).

    log n passes. n must be a power of two.
    """
    n = d.shape[-1]
    assert n & (n - 1) == 0, f"n={n} not a power of two"
    asc = jnp.full(d.shape, True)
    for s in [1 << j for j in range((n.bit_length() - 1) - 1, -1, -1)]:
        d, ip = _pass(d, ip, s, asc)
    return d, ip
