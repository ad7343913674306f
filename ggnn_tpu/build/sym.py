"""Inverse ("foreign") link discovery and insertion.

TPU-native replacement for the reference's sym pass:

* ``SymQueryKernel`` (src/ggnn/construction/sym_query_layer.cu:39-145): for
  each node n and each of its KL local neighbors, walk the graph from that
  neighbor back toward n -- guided by a "half-way point"
  ``h = q + (0.5-EPS)(neighbor - q)`` (simple_knn_sym_cache.cuh:159-201,
  EPS=0.1) -- checking whether any visited node already links to n. If not,
  request an inverse link at the nearest on-path candidate with capacity.

* The CUDA ``atomicAdd`` slot reservation (sym_query_layer.cu:124-141) is
  replaced by a deterministic sort-based capacity assignment: requests are
  ranked per target via a stable sort and accepted while the target's fill
  (attempt counter, matching the reference's overflow accounting) is < KF.

* ``SymBufferMergeKernel`` (src/ggnn/construction/sym_buffer_merge_layer.cu:
  36-99): merge requested inverse links into the graph's KF foreign slots,
  keeping non-duplicate existing foreign links while room remains and padding
  empties with the node's own index.

The whole pass over a layer runs as ONE jitted program: node chunks advance
through a ``lax.scan`` whose carry is the (sym_buffer, sym_atomic) request
state, so successive chunks see earlier chunks' requested links (the
reference gets the same effect through global-memory atomics) without any
host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ggnn_tpu.config import (
    SYM_MAX_PER_PATH_ITERATIONS,
    DistanceMeasure,
    GraphConfig,
)
from ggnn_tpu.ops.beam import (
    beam_compact_candidates,
    beam_dedup_mask,
    beam_init,
    beam_insert,
    beam_pop,
)
from ggnn_tpu.utils.timing import hard_sync

__all__ = ["sym_pass"]

_HALF_EPS = 0.1  # simple_knn_sym_cache.cuh:39


def _pair_dists(q, h, q_sq, h_sq, cand_vecs, cand_sq, measure):
    """Distances of gathered candidates to both the query and the half point.

    q/h: [R, D]; cand_vecs: [R, K, D]. Returns (dist_q, dist_h) each [R, K].
    """
    dot_q = jnp.einsum(
        "rd,rkd->rk",
        q,
        cand_vecs,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    dot_h = jnp.einsum(
        "rd,rkd->rk",
        h,
        cand_vecs,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if measure == DistanceMeasure.Euclidean:
        dq = jnp.maximum(q_sq[:, None] + cand_sq - 2.0 * dot_q, 0.0)
        dh = jnp.maximum(h_sq[:, None] + cand_sq - 2.0 * dot_h, 0.0)
        return dq, dh
    nq = q_sq[:, None] * cand_sq
    nh = h_sq[:, None] * cand_sq
    sq_ok = nq > 0.0
    sh_ok = nh > 0.0
    dq = jnp.where(
        sq_ok, jnp.abs(1.0 - dot_q * jax.lax.rsqrt(jnp.where(sq_ok, nq, 1.0))), 1.0
    )
    dh = jnp.where(
        sh_ok, jnp.abs(1.0 - dot_h * jax.lax.rsqrt(jnp.where(sh_ok, nh, 1.0))), 1.0
    )
    return dq, dh


def _sym_walk(
    n,  # [R] source node ids (layer-local)
    start,  # [R] start neighbor ids (layer-local)
    nbrs,  # [N_layer, KBuild] current layer graph
    sym_buffer,  # [N_layer, KF] snapshot of requested inverse links
    translation_l,  # [N_layer] or dummy
    base,
    base_sq,
    nn1_stats,
    tau_build,
    *,
    cfg: GraphConfig,
    measure: DistanceMeasure,
    use_translation: bool,
    pops_per_iter: int,
):
    """Walk from ``start`` toward ``n``; return (connected, preference list).

    Only rows whose whole bulk preference list was full reach this walk (see
    sym_pass); it searches deeper for an alternative host with capacity,
    exactly the reference walk's remaining job (sym_query_layer.cu:87-141).
    """
    R = n.shape[0]
    KL, KF = cfg.KL, cfg.KF
    KC = KL + KF
    width, vis_size = cfg.sym_beam_geometry()
    P = max(1, pops_per_iter)
    steps = -(-SYM_MAX_PER_PATH_ITERATIONS // P)
    # dedup-before-fetch compaction cap (see ops/traverse.py)
    cap = P * KC if P == 1 else min(P * KC, max(KC, (P * KC // 2 + 7) // 8 * 8))

    if measure == DistanceMeasure.Euclidean:
        xi = (nn1_stats[0] * nn1_stats[0]) * tau_build * tau_build
    else:
        xi = nn1_stats[0] * tau_build

    def tr(ids):
        return translation_l[ids] if use_translation else ids

    q = base[tr(n)].astype(jnp.float32)
    s_vec = base[tr(start)].astype(jnp.float32)
    # half-way point (simple_knn_sym_cache.cuh:159-177)
    h = q + (0.5 - _HALF_EPS) * (s_vec - q)
    q_sq = jnp.sum(q * q, axis=-1)
    h_sq = jnp.sum(h * h, axis=-1)

    # init_start_point: seed with the start neighbor, fix criteria_half
    dq0, dh0 = _pair_dists(
        q, h, q_sq, h_sq, s_vec[:, None, :], base_sq[tr(start)][:, None], measure
    )
    criteria_half = dh0[:, 0] + xi

    state = beam_init(R, width, xi, vis_size)
    state = beam_insert(
        state, start[:, None], dq0, criteria=jnp.full((R,), jnp.inf, jnp.float32)
    )

    # lane-pad both tables once per walk (loop-invariant, hoisted by XLA);
    # sub-lane row gathers are ~50x slower (see _pad_rows_to_lanes)
    nbrs_wide = _pad_rows_to_lanes(nbrs, KL)
    sym_wide = _pad_rows_to_lanes(sym_buffer, KF)

    def step(st, connected, cap_now):
        # criteria_sym = best distance + xi (simple_knn_sym_cache.cuh:285-288)
        crit = st.d[:, 0] + st.xi
        anchors, active, st = beam_pop(
            st, P, KF, row_mask=~connected, criteria=crit
        )  # [R, P]
        safe_anchor = jnp.where(anchors != -1, anchors, 0)
        # candidates = KL local links + KF requested inverse links per anchor
        # (sym_query_layer.cu:98-112)
        cand_local = nbrs_wide[safe_anchor][..., :KL]  # [R, P, KL]
        cand_sym = sym_wide[safe_anchor][..., :KF]  # [R, P, KF]
        cand = jnp.concatenate([cand_local, cand_sym], axis=-1).reshape(
            R, P * KC
        )
        a_ok = jnp.repeat(anchors != -1, KC, axis=-1, total_repeat_length=P * KC)
        found = jnp.any((cand == n[:, None]) & a_ok, axis=-1) & active
        connected = connected | found

        usable = a_ok & active[:, None] & ~found[:, None]
        # exact path: dedup on ids BEFORE the vector gather, pack left
        ok = beam_dedup_mask(st, cand, valid=usable)
        packed = beam_compact_candidates(cand, ok, cap_now)

        safe_cand = jnp.clip(packed, 0, None)
        cand_base = tr(safe_cand)
        vecs = base[cand_base].astype(jnp.float32)
        dq, dh = _pair_dists(q, h, q_sq, h_sq, vecs, base_sq[cand_base], measure)
        # admit only when close to both query and half point
        # (simple_knn_sym_cache.cuh:423-436)
        admitted = jnp.where(dh < criteria_half[:, None], packed, -1)
        st = beam_insert(
            st, admitted, dq, row_mask=active & ~found, criteria=crit
        )
        return st, connected, active & ~found

    connected = start == n  # degenerate self-link rows resolve immediately
    remaining = steps
    if cap < P * KC:
        # first expansion uncapped: the beam holds only the start point, so
        # nearly every candidate survives dedup and capping would drop
        # genuinely-new frontier
        state, connected, _ = step(state, connected, P * KC)
        remaining = max(0, steps - 1)

    def cond(carry):
        st, conn, it, alive = carry
        return (it < remaining) & alive

    def body(carry):
        st, conn, it, _ = carry
        st, conn, going = step(st, conn, cap)
        return st, conn, it + 1, jnp.any(going)

    state, connected, _, _ = jax.lax.while_loop(
        cond, body, (state, connected, jnp.int32(0), jnp.bool_(True))
    )
    # preference list: the KF best on-path nodes (sym_query_layer.cu:124-129)
    return connected, state.best(KF)[0]


def _insert_requests(
    pref,  # [R, KF] preference lists (-1 = empty)
    n_req,  # [R] requesting node ids
    need,  # [R] rows that need an inverse link
    sym_buffer,  # [N_layer, KF]
    sym_atomic,  # [N_layer] attempt counters
    *,
    KF: int,
):
    """Deterministic capacity-limited scatter replacing the reference's
    atomicAdd loop (sym_query_layer.cu:124-141)."""
    R = pref.shape[0]
    N = sym_atomic.shape[0]
    assigned = ~need
    rows = jnp.arange(R, dtype=jnp.int32)

    for j in range(KF):
        tgt = jnp.where(~assigned & (pref[:, j] != -1), pref[:, j], N)
        # rank requests per target, stable in row order
        order = jnp.argsort(tgt, stable=True)
        sorted_tgt = tgt[order]
        prev = jnp.concatenate([jnp.full((1,), -2, jnp.int32), sorted_tgt[:-1]])
        is_new = sorted_tgt != prev
        run_start = jax.lax.cummax(jnp.where(is_new, rows, 0), axis=0)
        rank_sorted = rows - run_start
        rank = jnp.zeros((R,), jnp.int32).at[order].set(rank_sorted)

        valid = tgt != N
        pos = sym_atomic.at[tgt].get(mode="fill", fill_value=0) + rank
        accept = valid & (pos < KF)

        sym_buffer = sym_buffer.at[
            jnp.where(accept, tgt, N), jnp.where(accept, pos, 0)
        ].set(n_req, mode="drop")
        # attempts count even on overflow (reference atomicAdd semantics)
        sym_atomic = sym_atomic.at[tgt].add(valid.astype(jnp.int32), mode="drop")
        assigned = assigned | accept
    return sym_buffer, sym_atomic, assigned


@functools.partial(jax.jit, static_argnames=("KL", "KF"), donate_argnums=(1,))
def _sym_buffer_merge(nbrs, sym_buffer, sym_atomic, *, KL: int, KF: int):
    """Merge requested inverse links into the graph's foreign slots
    (sym_buffer_merge_layer.cu:36-99)."""
    Nl = nbrs.shape[0]
    node_ids = jnp.arange(Nl, dtype=jnp.int32)
    out = sym_buffer
    num = jnp.minimum(sym_atomic, KF + 1)  # clamp, semantics only need >= KF
    existing = nbrs[:, KL:]
    for i in range(KF):
        g = existing[:, i]
        dup = jnp.any(out == g[:, None], axis=-1)
        can = (num < KF) & ~dup
        slot = jnp.clip(num, 0, KF - 1)
        cur = out[node_ids, slot]
        out = out.at[node_ids, slot].set(jnp.where(can, g, cur))
        num = num + can.astype(jnp.int32)
    out = jnp.where(out >= 0, out, node_ids[:, None])
    return nbrs.at[:, KL:].set(out)


def _pad_rows_to_lanes(tbl: jax.Array, cols: int, lanes: int = 128) -> jax.Array:
    """Widen an integer row table to the VPU lane width before row gathers.

    Gathering [*, KL]-shaped slices of a [N, 24] i32 table issues sub-lane
    (48-byte) row fetches, which XLA:TPU executes ~50x below the 512-byte-row
    gather bandwidth (measured: the backlink check was 1.65 s of a 1.85 s
    filter chunk). One explicit pad to 128 lanes turns every downstream row
    gather into the aligned 512-byte case. Pad value -1 never matches a node
    id."""
    pad = -(-cols // lanes) * lanes - cols
    return jnp.pad(tbl[:, :cols], ((0, 0), (0, pad)), constant_values=-1)


@functools.partial(
    jax.jit, static_argnames=("cfg", "measure", "use_translation", "pref_gate")
)
def _bulk_filter_chunk(
    rows,  # [C] indices into [Nl*KL], -1 = pad
    nbrs,
    nbrs_wide,  # [Nl, 128] lane-padded local slots (see _pad_rows_to_lanes)
    translation_l,
    base,
    base_sq,
    nn1_stats,
    tau_build,
    *,
    cfg: GraphConfig,
    measure: DistanceMeasure,
    use_translation: bool,
    pref_gate: bool = True,
):
    """First-expansion connectivity check for one chunk of mutual-filtered
    (node, neighbor) rows -- the bulk equivalent of the walk's first step.

    A row (n, s) counts as already connected when some first-expansion
    candidate t of s -- one the walk would have admitted to its beam, i.e.
    ``dist_half(t) < dist_half(s)+xi`` and ``dist_q(t) < dist_q(s)+xi``
    (simple_knn_sym_cache.cuh:423-436) -- already links back to n through its
    KL local slots (sym_query_layer.cu:87-122 detects exactly these on its
    early iterations). Rows that pass here skip the walk entirely; the
    remaining rows first try a *direct* inverse-link request at s (phase ii)
    and only walk when s is full (phase iii). Returns (connected, dq0, n, s).
    """
    KL = cfg.KL
    row_pad = rows == -1
    rows_safe = jnp.clip(rows, 0, None)
    n = rows_safe // KL
    s = nbrs[n, rows_safe % KL]
    row_pad |= s == -1
    s = jnp.where(s == -1, n, s)

    if measure == DistanceMeasure.Euclidean:
        xi = (nn1_stats[0] * nn1_stats[0]) * tau_build * tau_build
    else:
        xi = nn1_stats[0] * tau_build

    def tr(ids):
        return translation_l[ids] if use_translation else ids

    q = base[tr(n)].astype(jnp.float32)
    s_vec = base[tr(s)].astype(jnp.float32)
    h = q + (0.5 - _HALF_EPS) * (s_vec - q)
    q_sq = jnp.sum(q * q, axis=-1)
    h_sq = jnp.sum(h * h, axis=-1)
    dq0, dh0 = _pair_dists(
        q, h, q_sq, h_sq, s_vec[:, None, :], base_sq[tr(s)][:, None], measure
    )
    dq0 = dq0[:, 0]
    crit_q = dq0 + xi
    crit_h = dh0[:, 0] + xi

    t = nbrs_wide[s][:, :KL]  # [C, KL] first-expansion candidates
    t_ok = (t != -1) & (t != n[:, None])
    t_safe = jnp.clip(t, 0, None)
    vecs = base[tr(t_safe)].astype(jnp.float32)
    dq_t, dh_t = _pair_dists(q, h, q_sq, h_sq, vecs, base_sq[tr(t_safe)], measure)
    admitted = t_ok & (dh_t < crit_h[:, None]) & (dq_t < crit_q[:, None])
    back = nbrs_wide[t_safe]  # [C, KL, 128] -- lane-aligned row gather
    connected = jnp.any(
        (back == n[:, None, None]) & admitted[:, :, None], axis=(1, 2)
    )

    # preference list: s plus the first-expansion candidates, the KF
    # nearest to n first -- the bulk analog of the walk's KF-best on-path
    # host list (sym_query_layer.cu:124-129). With pref_gate=True only
    # beam-admissible candidates may host (the reference inserts only at
    # nodes its walk visited, i.e. admitted ones -- measured better graph
    # quality); ungated hosting (pref_gate=False) nearly eliminates
    # residual walks but measured ~0.006 c@1 lower at 65k. Rows whose whole
    # list is full are the only ones that still walk.
    KF = cfg.KF
    host_ok = admitted if pref_gate else t_ok
    cand = jnp.concatenate([s[:, None], t], axis=1)  # [C, 1+KL]
    cand_d = jnp.concatenate([dq0[:, None], dq_t], axis=1)
    cand_ok = jnp.concatenate([~row_pad[:, None], host_ok], axis=1)
    cand_d = jnp.where(cand_ok, cand_d, jnp.inf)
    cand = jnp.where(cand_ok, cand, -1)
    cand_d, pref = jax.lax.sort((cand_d, cand), dimension=-1, num_keys=1)
    return connected | row_pad, dq0, n, s, pref[:, :KF]


@functools.partial(jax.jit, static_argnames=("KL", "R_cap", "G_pad"))
def _group_pending_rows(need, nbrs, *, KL: int, R_cap: int, G_pad: int):
    """Group pending (node, neighbor) pairs by their START node s.

    Each pending pair (n, s) needs s's first expansion -- its KL neighbor
    ids, their vectors and their back-links -- but s starts ~KL/2 pairs on
    average, so the per-pair filter re-gathers the same expansion once per
    pair. Grouping by s amortizes those gathers R_cap-fold. The grouping
    runs entirely on device (one stable sort over the flat pair ids); a
    host-side grouping would need the s values D2H'd over the relay
    (~12 MB/pass at 262k, seconds at measured 2-20 MB/s bulk rates).

    A start with more than R_cap pending requesters spans several
    consecutive group rows (rank // R_cap "rounds"), so every pair lands in
    exactly one grid slot and no per-pair fallback path is needed.

    Returns (grid [G_pad, R_cap] flat pair ids (-1 = empty),
    group_s [G_pad] start id per group row (-1 = empty), n_groups scalar).
    """
    Nl = nbrs.shape[0]
    M = Nl * KL
    pos = jnp.arange(M, dtype=jnp.int32)
    s_flat = nbrs[:, :KL].reshape(-1)
    valid = need.reshape(-1) & (s_flat >= 0)
    key = jnp.where(valid, s_flat, jnp.int32(Nl))  # invalids sort last
    order = jnp.argsort(key, stable=True)
    ks = key[order]
    rs = pos[order]
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), ks[:-1]])
    is_new = ks != prev
    run_start = jax.lax.cummax(jnp.where(is_new, pos, 0))
    rank = pos - run_start  # rank of the pair within its s-run
    vs = ks != Nl
    is_start = vs & (is_new | (rank % R_cap == 0))
    gid = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    n_groups = jnp.sum(is_start.astype(jnp.int32))
    tgt = jnp.where(vs, gid, jnp.int32(G_pad))  # OOB rows drop
    grid = (
        jnp.full((G_pad, R_cap), -1, jnp.int32)
        .at[tgt, rank % R_cap]
        .set(rs, mode="drop")
    )
    group_s = (
        jnp.full((G_pad,), -1, jnp.int32)
        .at[jnp.where(is_start, gid, jnp.int32(G_pad))]
        .set(ks, mode="drop")
    )
    return grid, group_s, n_groups


@functools.partial(
    jax.jit, static_argnames=("cfg", "measure", "use_translation", "pref_gate")
)
def _bulk_filter_grouped(
    group_s,  # [C] start node ids (-1 = pad)
    grid_rows,  # [C, R] flat pair indices into [Nl*KL], -1 = pad
    nbrs_wide,  # [Nl, 128] lane-padded local slots
    translation_l,
    base,
    base_sq,
    nn1_stats,
    tau_build,
    *,
    cfg: GraphConfig,
    measure: DistanceMeasure,
    use_translation: bool,
    pref_gate: bool = True,
):
    """Start-grouped first-expansion connectivity filter.

    Same decision per pair as ``_bulk_filter_chunk`` (admission against both
    the query and half-point criteria, simple_knn_sym_cache.cuh:423-436;
    back-link detection, sym_query_layer.cu:87-122) but evaluated for all of
    a start's requesters against ONE gather of the start's expansion: the
    [KL, D] neighbor vectors and [KL, lanes] back-link rows move HBM->VMEM
    once per group instead of once per pair (~8x fewer fetched bytes at the
    layer-0 fill measured at 262k).

    Returns (connected, dq0, n, pref) with a leading [C, R] pair grid.
    """
    KL, KF = cfg.KL, cfg.KF
    C, R = grid_rows.shape
    pad = (grid_rows == -1) | (group_s[:, None] == -1)
    rows_safe = jnp.clip(grid_rows, 0, None)
    n = rows_safe // KL  # [C, R] requesters
    s = jnp.where(group_s == -1, 0, group_s)  # [C]

    if measure == DistanceMeasure.Euclidean:
        xi = (nn1_stats[0] * nn1_stats[0]) * tau_build * tau_build
    else:
        xi = nn1_stats[0] * tau_build

    def tr(ids):
        return translation_l[ids] if use_translation else ids

    s_vec = base[tr(s)].astype(jnp.float32)  # [C, D]
    s_sq = base_sq[tr(s)]  # [C]
    q = base[tr(n)].astype(jnp.float32)  # [C, R, D]
    q_sq = jnp.sum(q * q, axis=-1)  # [C, R]
    h = q + (0.5 - _HALF_EPS) * (s_vec[:, None, :] - q)  # [C, R, D]
    h_sq = jnp.sum(h * h, axis=-1)

    # shared expansion of s: one gather per GROUP, not per pair
    t = nbrs_wide[s][:, :KL]  # [C, KL]
    t_safe = jnp.clip(t, 0, None)
    t_vecs = base[tr(t_safe)].astype(jnp.float32)  # [C, KL, D]
    t_sq = base_sq[tr(t_safe)]  # [C, KL]
    back = nbrs_wide[t_safe]  # [C, KL, lanes]

    def dists(x, x_sq, y, y_sq, dot):
        # x: [C, R(, D)] vs y: [C, K(, D)] -> [C, R, K]
        if measure == DistanceMeasure.Euclidean:
            return jnp.maximum(x_sq[..., None] + y_sq[:, None, :] - 2.0 * dot, 0.0)
        nn = x_sq[..., None] * y_sq[:, None, :]
        ok = nn > 0.0
        return jnp.where(
            ok, jnp.abs(1.0 - dot * jax.lax.rsqrt(jnp.where(ok, nn, 1.0))), 1.0
        )

    ein = functools.partial(
        jnp.einsum,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    def dists1(x, x_sq, dot):
        # x: [C, R] vs the group's own s: [C] -> [C, R]
        if measure == DistanceMeasure.Euclidean:
            return jnp.maximum(x_sq + s_sq[:, None] - 2.0 * dot, 0.0)
        nn = x_sq * s_sq[:, None]
        ok = nn > 0.0
        return jnp.where(
            ok, jnp.abs(1.0 - dot * jax.lax.rsqrt(jnp.where(ok, nn, 1.0))), 1.0
        )

    # n <-> s admission criteria per pair
    dq0 = dists1(q, q_sq, ein("crd,cd->cr", q, s_vec))
    dh0 = dists1(h, h_sq, ein("crd,cd->cr", h, s_vec))
    crit_q = dq0 + xi
    crit_h = dh0 + xi

    dq_t = dists(q, q_sq, t_vecs, t_sq, ein("crd,ckd->crk", q, t_vecs))
    dh_t = dists(h, h_sq, t_vecs, t_sq, ein("crd,ckd->crk", h, t_vecs))
    t_ok = (t[:, None, :] != -1) & (t[:, None, :] != n[:, :, None])  # [C, R, KL]
    admitted = t_ok & (dh_t < crit_h[..., None]) & (dq_t < crit_q[..., None])
    links_back = jnp.any(
        back[:, None, :, :] == n[:, :, None, None], axis=-1
    )  # [C, R, KL]
    connected = jnp.any(links_back & admitted, axis=-1) | pad

    host_ok = admitted if pref_gate else t_ok
    cand = jnp.concatenate(
        [jnp.broadcast_to(s[:, None, None], (C, R, 1)), jnp.broadcast_to(t[:, None, :], (C, R, KL))],
        axis=-1,
    )  # [C, R, 1+KL]
    cand_d = jnp.concatenate([dq0[..., None], dq_t], axis=-1)
    cand_ok = jnp.concatenate([~pad[..., None], host_ok], axis=-1)
    cand_d = jnp.where(cand_ok, cand_d, jnp.inf)
    cand = jnp.where(cand_ok, cand, -1)
    cand_d, pref = jax.lax.sort((cand_d, cand), dimension=-1, num_keys=1)
    n_out = jnp.where(pad, -1, n)
    return connected, jnp.where(pad, jnp.inf, dq0), n_out, pref[..., :KF]


@jax.jit
def _order_needs(prio, connected, n_valid):
    """Priority order + live-request count for :func:`_bulk_requests`.

    ``n_valid`` is a *dynamic* scalar on purpose: baking the live row count
    into the program as a constant would recompile it every pass (each
    remote compile costs 30-250 s on the relay; the compute is <1 s)."""
    M = prio.shape[0]
    need = ~connected & (jnp.arange(M) < n_valid)
    order = jnp.argsort(jnp.where(need, prio, jnp.inf))
    return order, jnp.sum(need.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("KF",), donate_argnums=(2, 3))
def _insert_requests_ordered(pref_o, src_o, sym_buffer, sym_atomic, cnt,
                             *, KF: int):
    """Run the capacity scatter on priority-ordered, COMPACTED rows.

    The first ``cnt`` rows are exactly the live requests (finite
    priorities sort before the +inf non-needs, and real pair distances are
    always finite); the rest of the pow2-padded tile is masked."""
    Lw = pref_o.shape[0]
    need_o = jnp.arange(Lw) < cnt
    sym_buffer, sym_atomic, assigned = _insert_requests(
        pref_o, src_o, need_o, sym_buffer, sym_atomic, KF=KF
    )
    return sym_buffer, sym_atomic, assigned & need_o


@jax.jit
def _scatter_accept(order, sel, acc):
    """Expand the compacted accept mask back to full row order."""
    return (
        jnp.zeros((order.shape[0],), jnp.bool_).at[sel].set(acc)
    )


def _bulk_requests(
    pref,  # [M, KF] per-row host preference lists (-1 = empty)
    src,  # [M] requesting nodes n
    prio,  # [M] f32 priority (distance n->s; closer sources win slots)
    sym_buffer,
    sym_atomic,
    connected,  # [M] bool -- rows already symmetric (no request needed)
    n_valid,  # scalar -- rows beyond this index are padding
    *,
    KF: int,
):
    """Phase ii: bulk inverse-link proposals down per-row preference lists.

    Rows are processed in ascending-priority order (nearest sources claim
    slots first -- the deterministic replacement for the reference's
    first-come atomicAdd race, sym_query_layer.cu:124-141); each row tries
    its preference hosts in order until one has capacity. Returns the
    updated request state plus the per-row accept mask (rejects walk in
    phase iii).

    The KF-iteration capacity scatter runs on a COMPACTED tile: only
    ~15-30% of rows are live requests in steady state (most pairs are
    connected), yet the loop's ~25 argsorts and ~50 scatters used to run
    at the full padded width -- 29 -> 8 s/pass at 262k came from warm
    caching alone, and compaction cuts the remaining loop width ~4-8x.
    Bit-identical: the priority argsort already orders live requests
    first, so slicing to a pow2 ladder >= count drops only masked rows
    (suite-tested determinism)."""
    M = pref.shape[0]
    order, cnt_dev = _order_needs(prio, connected, n_valid)
    cnt = int(cnt_dev)  # one scalar D2H picks the pow2 ladder width
    Lw = min(M, max(4096, 1 << (max(1, cnt) - 1).bit_length()))
    sel = order[:Lw]
    pref_o = pref[sel]
    src_o = src[sel]
    # free the full-width inputs BEFORE the capacity-scatter program: at 1M
    # the [M, KF] preference table alone is multi-GB and splitting the old
    # single program into phases keeps it live across program boundaries
    # (RESOURCE_EXHAUSTED observed) unless dropped here. Callers pass
    # temporaries, so these dels release the device buffers.
    del pref, src, prio, connected
    sym_buffer, sym_atomic, acc = _insert_requests_ordered(
        pref_o, src_o, sym_buffer, sym_atomic, cnt_dev, KF=KF
    )
    accept = _scatter_accept(order, sel, acc)
    return sym_buffer, sym_atomic, accept


@functools.partial(jax.jit, static_argnames=("KL",))
def _rows_needing_walk_sort(nbrs, *, KL: int):
    """Sort-based mutual-link pre-filter: same decisions as
    :func:`_rows_needing_walk` with ZERO row gathers.

    A pair (n, s=nbrs[n,j]) is mutual iff the edge (s -> n) exists, i.e.
    (s, n) is a member of the full edge set {(u, nbrs[u,k])}. Membership
    of all Nl*KL query pairs in the Nl*K edge set resolves with ONE
    3-key sort (key, tag) putting each query next to its matching edge --
    the gather formulation instead fetched a 512 B lane-padded row PER
    PAIR (~3.2 GB at 262k, ~12 GB at 1M)."""
    Nl, K = nbrs.shape
    node = jnp.arange(Nl, dtype=jnp.int32)
    starts = nbrs[:, :KL]
    valid = (starts != -1) & (starts != node[:, None])
    NQ = Nl * KL
    # queries: (s, n), tag 1; database: (u, v) over ALL K slots, tag 0
    q1 = jnp.where(valid, starts, Nl).reshape(-1)  # invalid sorts last
    q2 = jnp.broadcast_to(node[:, None], (Nl, KL)).reshape(-1)
    d1 = jnp.broadcast_to(node[:, None], (Nl, K)).reshape(-1)
    d2 = nbrs.reshape(-1)
    d1 = jnp.where(d2 == -1, Nl, d1)  # empty slots never match
    k1 = jnp.concatenate([d1, q1])
    k2 = jnp.concatenate([d2, q2])
    tag = jnp.concatenate(
        [jnp.zeros((Nl * K,), jnp.int32), jnp.ones((NQ,), jnp.int32)]
    )
    pos = jnp.concatenate(
        [jnp.full((Nl * K,), -1, jnp.int32), jnp.arange(NQ, dtype=jnp.int32)]
    )
    k1, k2, tag, pos = jax.lax.sort((k1, k2, tag, pos), num_keys=3)
    # run = equal (k1, k2); tags sort database entries first within a run,
    # so a query is matched iff its run STARTS with a database entry
    M = k1.shape[0]
    idx = jnp.arange(M, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1]),
        ]
    )
    run_start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    matched = tag[run_start] == 0
    out = jnp.zeros((NQ,), bool).at[jnp.where(tag == 1, pos, NQ)].set(
        matched, mode="drop"
    )
    return valid & ~out.reshape(Nl, KL)


@functools.partial(jax.jit, static_argnames=("KL", "chunk"))
def _rows_needing_walk(nbrs, *, KL: int, chunk: int = 65536):
    """Which (node, local-neighbor) pairs need a walk at all.

    A pair is trivially symmetric when the neighbor already links back --
    mutual-kNN pairs, the common case, which the reference's walk detects on
    its very first fetch (sym_query_layer.cu:87-97). Filtering them up front
    lets the expensive walk scan run over a compacted row list (typically
    half the rows or fewer).

    Row-chunked: the back-link gather materializes [rows, KL, lanes(K)] i32,
    which at 1M/KBuild=48 is ~24 GB unchunked -- it OOM'd the whole 1M k=48
    build (the k=24 incarnation squeaked by). 64k-row chunks cap the
    transient at ~1.6 GB with shape-stable programs per layer."""
    Nl, K = nbrs.shape
    padded = _pad_rows_to_lanes(nbrs, K)  # lane-aligned row gather source
    C = min(chunk, max(1024, 1 << (Nl - 1).bit_length()))
    outs = []
    for lo in range(0, Nl, C):
        starts = nbrs[lo : lo + C, :KL]  # [C, KL]
        rows = starts.shape[0]
        if rows < C:  # tail: pad with EMPTY rows (filtered by != -1 below)
            starts = jnp.pad(
                starts, ((0, C - rows), (0, 0)), constant_values=-1
            )
        back = padded[jnp.clip(starts, 0, None)]
        node = (lo + jnp.arange(C, dtype=jnp.int32))[:, None]
        direct = jnp.any(back == node[:, :, None], axis=-1)
        outs.append((starts != -1) & (starts != node) & ~direct)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:Nl]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "measure", "use_translation", "pops_per_iter"),
    donate_argnums=(1, 2),
)
def _sym_scan_block(
    row_chunks,  # [group, chunk_rows] indices into [Nl*KL], -1 = pad
    sym_buffer,
    sym_atomic,
    nbrs,
    translation_l,
    base,
    base_sq,
    nn1_stats,
    tau_build,
    *,
    cfg: GraphConfig,
    measure: DistanceMeasure,
    use_translation: bool,
    pops_per_iter: int,
):
    """Walk+request over one group of pre-filtered row chunks.

    Groups are bounded so a single device program stays well under the
    relay's ~70 s blocking limit (see utils.timing.hard_sync); the
    (sym_buffer, sym_atomic) request state carries across groups on device.
    """
    KL, KF = cfg.KL, cfg.KF

    def step(carry, rows):
        sym_buffer, sym_atomic = carry
        row_pad = rows == -1
        rows_safe = jnp.clip(rows, 0, None)
        n_rows = rows_safe // KL
        start_rows = nbrs[n_rows, rows_safe % KL]
        row_pad |= start_rows == -1
        start_rows = jnp.where(start_rows == -1, n_rows, start_rows)

        connected, pref = _sym_walk(
            n_rows,
            start_rows,
            nbrs,
            sym_buffer,
            translation_l,
            base,
            base_sq,
            nn1_stats,
            tau_build,
            cfg=cfg,
            measure=measure,
            use_translation=use_translation,
            pops_per_iter=pops_per_iter,
        )
        need = ~connected & ~row_pad
        sym_buffer, sym_atomic, _ = _insert_requests(
            pref, n_rows, need, sym_buffer, sym_atomic, KF=KF
        )
        return (sym_buffer, sym_atomic), None

    (sym_buffer, sym_atomic), _ = jax.lax.scan(
        step, (sym_buffer, sym_atomic), row_chunks
    )
    return sym_buffer, sym_atomic


@jax.jit
def _grouped_counts(real, connected, accept):
    """Phase-ii stats as one scalar-triple D2H (the pair path pulls the full
    per-row masks host-side; at 262k those are ~4 MB of bools per pass over
    a 2-20 MB/s relay)."""
    return jnp.stack(
        [
            jnp.sum((real & connected).astype(jnp.int32)),
            jnp.sum((real & accept).astype(jnp.int32)),
            jnp.sum((real & ~connected & ~accept).astype(jnp.int32)),
        ]
    )


def _phase_ii_grouped(
    need_dev,
    nbrs,
    trans,
    base,
    base_sq,
    nn1_stats,
    tau,
    sym_buffer,
    sym_atomic,
    *,
    cfg: GraphConfig,
    measure: DistanceMeasure,
    use_translation: bool,
    pref_gate: bool,
    want_residual_rows: bool,
):
    """Phase ii with the start-grouped filter layout.

    Orchestrates ``_group_pending_rows`` -> chunked ``_bulk_filter_grouped``
    -> one ``_bulk_requests``. Chunks are fixed-shape ([Cs] groups x [R_cap]
    requesters = 65,536 pair slots -- the same 64k granularity as the pair
    path, so the request program's pow2 chunk ladder shares its compiled
    variants). Returns (sym_buffer, sym_atomic, residual_rows, stats).
    """
    import numpy as np  # noqa: PLC0415 -- host chunk loop only
    import os  # noqa: PLC0415
    import time  # noqa: PLC0415

    # GGNN_SYM_TIMING=1: hard-sync fenced sub-phase attribution (perturbs
    # perf -- the fences serialize work the chunk loop otherwise overlaps)
    timing = os.environ.get("GGNN_SYM_TIMING") == "1"

    def _mark(x=None):
        if timing:
            if x is not None:
                hard_sync(x)
            return time.perf_counter()
        return 0.0

    KL, KF = cfg.KL, cfg.KF
    Nl = nbrs.shape[0]
    R_cap = 16
    Cs = 4096
    # every start needs at least one group row; starts with > R_cap pending
    # requesters spill into ceil(cnt/R_cap) rows total
    g_bound = Nl + -(-Nl * KL // R_cap)
    G_pad = -(-g_bound // Cs) * Cs
    t0 = _mark()
    grid, group_s, n_groups = _group_pending_rows(
        need_dev, nbrs, KL=KL, R_cap=R_cap, G_pad=G_pad
    )
    ng = int(n_groups)
    t1 = _mark()
    empty_stats = {"bulk_connected": 0, "bulk_accepted": 0, "residual": 0}
    if ng == 0:
        return sym_buffer, sym_atomic, np.zeros((0,), np.int32), empty_stats
    used = -(-ng // Cs)
    nbrs_wide = _pad_rows_to_lanes(nbrs, KL)
    conn_parts, dq0_parts, n_parts, pref_parts, row_parts = [], [], [], [], []
    for c in range(used):
        lo = c * Cs
        conn, dq0c, n_ids, pref = _bulk_filter_grouped(
            group_s[lo : lo + Cs],
            grid[lo : lo + Cs],
            nbrs_wide,
            trans,
            base,
            base_sq,
            nn1_stats,
            tau,
            cfg=cfg,
            measure=measure,
            use_translation=use_translation,
            pref_gate=pref_gate,
        )
        conn_parts.append(conn.reshape(-1))
        dq0_parts.append(dq0c.reshape(-1))
        n_parts.append(n_ids.reshape(-1))
        pref_parts.append(pref.reshape(-1, KF))
        row_parts.append(grid[lo : lo + Cs].reshape(-1))
        if (c + 1) % 4 == 0:
            hard_sync(conn)
    t2 = _mark(conn_parts[-1])
    # pow2 ladder on the chunk count bounds the request-program variants
    # while capping pad waste at 2x; padding enters as constants
    num_chunks = 1 << (used - 1).bit_length()
    if num_chunks > used:
        pad_n = (num_chunks - used) * Cs * R_cap
        conn_parts.append(jnp.ones((pad_n,), bool))
        dq0_parts.append(jnp.full((pad_n,), jnp.inf, jnp.float32))
        n_parts.append(jnp.full((pad_n,), -1, jnp.int32))
        pref_parts.append(jnp.full((pad_n, KF), -1, jnp.int32))
        row_parts.append(jnp.full((pad_n,), -1, jnp.int32))
    connected = jnp.concatenate(conn_parts)
    n_flat = jnp.concatenate(n_parts)
    # the [M, KF] preference table is the multi-GB tensor at 1M: hand it to
    # _bulk_requests as the ONLY reference (list-pop) and drop the chunk
    # parts (which hold the same bytes again) so the callee's del actually
    # releases HBM before the capacity-scatter program runs
    big = [jnp.concatenate(pref_parts)]
    dq0_all = jnp.concatenate(dq0_parts)
    del conn_parts, pref_parts, dq0_parts, n_parts
    M = int(connected.shape[0])
    sym_buffer, sym_atomic, accept = _bulk_requests(
        big.pop(),
        n_flat,
        dq0_all,
        sym_buffer,
        sym_atomic,
        connected,
        M,  # pads are interleaved; they are masked by connected=True instead
        KF=KF,
    )
    t3 = _mark(sym_atomic)
    real = n_flat != -1
    counts = np.asarray(_grouped_counts(real, connected, accept))
    stats = {
        "bulk_connected": int(counts[0]),
        "bulk_accepted": int(counts[1]),
        "residual": int(counts[2]),
    }
    if timing:
        t4 = time.perf_counter()
        print(
            f"# sym-ii[{Nl}] groups={ng} chunks={used} | "
            f"group {t1 - t0:.2f} s | filter {t2 - t1:.2f} s | "
            f"requests {t3 - t2:.2f} s | stats-d2h {t4 - t3:.2f} s",
            flush=True,
        )
    rows = np.zeros((0,), np.int32)
    if want_residual_rows and stats["residual"]:
        # hybrid only: pull the residual pair ids host-side for phase iii
        # (an [M] i32 D2H -- the bulk default never pays it)
        resid = real & ~connected & ~accept
        rows_flat = np.asarray(jnp.where(resid, jnp.concatenate(row_parts), -1))
        rows = rows_flat[rows_flat >= 0].astype(np.int32)
    return sym_buffer, sym_atomic, rows, stats


def sym_pass(
    base: jax.Array,
    base_sq: jax.Array,
    nbrs: jax.Array,
    translation_l: jax.Array | None,
    nn1_stats: jax.Array,
    cfg: GraphConfig,
    layer: int,
    measure: DistanceMeasure,
    tau_build: float,
    chunk_nodes: int = 4096,
    pops_per_iter: int = 4,
    mode: str = "bulk",
    pref_gate: bool = True,
    sym_filter: str | None = None,
):
    """Run the full sym pass on one layer.

    ``mode``: three decompositions of the reference's per-pair walks
    (sym_query_layer.cu:39-145) into three phases, walking only a small
    residual:

      i.   mutual-link pre-filter (``_rows_needing_walk``): pairs whose
           neighbor already links back need nothing;
      ii.  first-expansion connectivity filter + bulk *direct* inverse-link
           proposals (``_bulk_filter_chunk`` / ``_bulk_requests``): the
           common case -- ask the start neighbor itself to host the link;
      iii. walks (``_sym_walk``) only for pairs whose direct target was
           already full -- the walk's real job is finding a *nearby
           alternative* host (sym_query_layer.cu:124-141).

    ``mode="bulk"`` (default) skips phase iii entirely: rows whose whole
    preference list is full drop their link, like the reference's overflow
    drop after an unsuccessful walk -- measured recall-identical to
    "hybrid" at 65k and substantially faster. ``mode="walk"`` runs the
    round-1 behavior: a walk per unconnected pair.

    ``sym_filter``: "grouped" (default) evaluates phase ii with pairs
    grouped by their start node so each start's expansion is gathered once
    (``_bulk_filter_grouped``); "pairs" is the one-row-per-pair layout.
    Both make the same admission decisions; the grouped layout visits the
    request queue in (start, rank) order rather than pair order, so slot
    assignment can differ on exact distance ties.

    Returns (new_nbrs, stats dict with overflow/added-links counters matching
    graph_construction.cu:354-378).
    """
    import numpy as np  # noqa: PLC0415 -- host-side row compaction only
    import os  # noqa: PLC0415

    if sym_filter is None:
        sym_filter = os.environ.get("GGNN_SYM_FILTER", "grouped")

    Nl = cfg.Ns[layer]
    KL, KF = cfg.KL, cfg.KF
    use_translation = layer > 0
    trans = translation_l if use_translation else jnp.zeros((0,), jnp.int32)

    timing = os.environ.get("GGNN_SYM_TIMING") == "1"
    if timing:
        import time  # noqa: PLC0415

        t0 = time.perf_counter()

    # phase i: mutual pre-filter (stays on device in grouped mode).
    # "sort" resolves the mutual check with one 3-key sort over the edge
    # set instead of a 512 B row gather per pair (bit-identical output,
    # suite-tested); "gather" is the round-4 shape.
    if os.environ.get("GGNN_SYM_MUTUAL", "gather") == "sort":
        need_dev = _rows_needing_walk_sort(nbrs, KL=KL)
    else:
        need_dev = _rows_needing_walk(nbrs, KL=KL)
    rows = np.zeros((0,), np.int32)
    if mode == "walk" or sym_filter != "grouped":
        need = np.asarray(need_dev).reshape(-1)
        rows = np.nonzero(need)[0].astype(np.int32)
    if timing:
        hard_sync(need_dev)
        print(
            f"# sym-i[{Nl}] mutual filter {time.perf_counter() - t0:.2f} s",
            flush=True,
        )

    sym_buffer = jnp.full((Nl, KF), -1, jnp.int32)
    sym_atomic = jnp.zeros((Nl,), jnp.int32)
    tau = jnp.float32(tau_build)
    bulk_connected = 0
    bulk_accepted = 0
    walk_residual = 0

    if mode in ("hybrid", "bulk") and sym_filter == "grouped":
        sym_buffer, sym_atomic, rows, stats_ii = _phase_ii_grouped(
            need_dev,
            nbrs,
            trans,
            base,
            base_sq,
            nn1_stats,
            tau,
            sym_buffer,
            sym_atomic,
            cfg=cfg,
            measure=DistanceMeasure(measure),
            use_translation=use_translation,
            pref_gate=pref_gate,
            want_residual_rows=(mode == "hybrid"),
        )
        bulk_connected = stats_ii["bulk_connected"]
        bulk_accepted = stats_ii["bulk_accepted"]
        if mode == "bulk":
            walk_residual = stats_ii["residual"]
            rows = rows[:0]
    elif mode in ("hybrid", "bulk") and len(rows):
        # phase ii: chunked first-expansion filter, then one bulk proposal.
        # Two decoupled shape disciplines (every distinct jit shape costs a
        # 30-250 s remote compile on the relay):
        #   * the FILTER runs fixed-[C] chunk programs over the REAL rows
        #     only -- the chunk program shape never churns, and no compute
        #     is spent on ladder padding (the former single pow4 ladder ran
        #     up to 3.3x pure-padding filter chunks at 1M);
        #   * the REQUEST program's row count comes from a pow2 ladder on
        #     the CHUNK COUNT (constant parts fill the gap), bounding its
        #     compile variants while capping pad waste at 2x. The former
        #     pow4 ladder padded 20M walk-rows to 67M: its [R, KF] i32
        #     preference table plus the priority-order gather copy alone
        #     were ~13 GB -- the 1M k=48 sym pass OOM'd HBM outright.
        C = min(1 << 16, max(4096, 1 << (len(rows) - 1).bit_length()))
        real_chunks = -(-len(rows) // C)
        num_chunks = 1 << (real_chunks - 1).bit_length()  # pow2 ladder
        R_pad = num_chunks * C
        rows_pad = np.full((R_pad,), -1, np.int32)
        rows_pad[: len(rows)] = rows
        nbrs_wide = _pad_rows_to_lanes(nbrs, KL)
        conn_parts, dq0_parts, n_parts, pref_parts = [], [], [], []
        for c in range(real_chunks):
            conn, dq0, n_ids, _s_ids, pref = _bulk_filter_chunk(
                jnp.asarray(rows_pad[c * C : (c + 1) * C]),
                nbrs,
                nbrs_wide,
                trans,
                base,
                base_sq,
                nn1_stats,
                tau,
                cfg=cfg,
                measure=DistanceMeasure(measure),
                use_translation=use_translation,
                pref_gate=pref_gate,
            )
            conn_parts.append(conn)
            dq0_parts.append(dq0)
            n_parts.append(n_ids)
            pref_parts.append(pref)
            if (c + 1) % 4 == 0:
                hard_sync(conn)
        if num_chunks > real_chunks:
            # ladder padding enters as constants -- never filtered
            pad_n = (num_chunks - real_chunks) * C
            conn_parts.append(jnp.ones((pad_n,), bool))
            dq0_parts.append(jnp.full((pad_n,), jnp.inf, jnp.float32))
            n_parts.append(jnp.full((pad_n,), -1, jnp.int32))
            pref_parts.append(jnp.full((pad_n, KF), -1, jnp.int32))
        connected = jnp.concatenate(conn_parts)
        sym_buffer, sym_atomic, accept = _bulk_requests(
            jnp.concatenate(pref_parts),
            jnp.concatenate(n_parts),
            jnp.concatenate(dq0_parts),
            sym_buffer,
            sym_atomic,
            connected,
            len(rows),
            KF=KF,
        )
        accept_host = np.asarray(accept)
        conn_host = np.asarray(connected)
        valid_host = ~conn_host
        valid_host[len(rows):] = False
        bulk_connected = int(conn_host[: len(rows)].sum())
        bulk_accepted = int(accept_host.sum())
        # phase iii residual: valid rows whose direct target was full
        rows = rows_pad[valid_host & ~accept_host]
        if mode == "bulk":
            walk_residual = int(len(rows))
            rows = rows[:0]

    if len(rows):
        # pick the walk-program width from a power-of-two ladder so a tiny
        # residual (the common case in hybrid mode) does not pad up to a
        # full-size walk program, while the ladder keeps the number of
        # distinct jit shapes -- each a slow remote compile -- bounded
        chunk_rows = min(chunk_nodes, Nl) * KL
        if mode == "hybrid":
            ladder = max(4096, 1 << (max(1, len(rows)) - 1).bit_length())
            chunk_rows = min(chunk_rows, ladder)
        group = 2  # chunks per device program (bounds each blocking slice)
        num_chunks = max(1, -(-len(rows) // chunk_rows))
        num_chunks = -(-num_chunks // group) * group
        padded = num_chunks * chunk_rows
        row_all = np.full((padded,), -1, np.int32)
        row_all[: len(rows)] = rows
        row_all = row_all.reshape(num_chunks, chunk_rows)

        for g in range(0, num_chunks, group):
            sym_buffer, sym_atomic = _sym_scan_block(
                jnp.asarray(row_all[g : g + group]),
                sym_buffer,
                sym_atomic,
                nbrs,
                trans,
                base,
                base_sq,
                nn1_stats,
                tau,
                cfg=cfg,
                measure=DistanceMeasure(measure),
                use_translation=use_translation,
                pops_per_iter=pops_per_iter,
            )
            hard_sync(sym_atomic)

    new_nbrs = _sym_buffer_merge(
        nbrs, sym_buffer, sym_atomic, KL=cfg.KL, KF=cfg.KF
    )
    atomic_host = jax.device_get(sym_atomic)
    stats = {
        "overflow": int((atomic_host > KF).sum()),
        "added_links": int(jnp.minimum(atomic_host, KF).sum()),
        "N": Nl,
        "walk_rows": int(len(rows)),
        "dropped_rows": walk_residual if mode == "bulk" else 0,
        "bulk_connected": bulk_connected,
        "bulk_accepted": bulk_accepted,
        "total_rows": int(Nl * KL),
    }
    return new_nbrs, stats
