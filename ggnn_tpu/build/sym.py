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


@functools.partial(jax.jit, static_argnames=("KF",), donate_argnums=(3, 4))
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

    ``n_valid`` is a *dynamic* scalar on purpose: baking the live row count
    into the program as a constant would recompile it every pass (each
    remote compile costs 30-250 s on the relay; the compute is ~0.4 s)."""
    M = pref.shape[0]
    need = ~connected & (jnp.arange(M) < n_valid)
    order = jnp.argsort(jnp.where(need, prio, jnp.inf))
    sym_buffer, sym_atomic, assigned = _insert_requests(
        pref[order],
        src[order],
        need[order],
        sym_buffer,
        sym_atomic,
        KF=KF,
    )
    accept = jnp.zeros((M,), jnp.bool_).at[order].set(assigned & need[order])
    return sym_buffer, sym_atomic, accept


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

    Returns (new_nbrs, stats dict with overflow/added-links counters matching
    graph_construction.cu:354-378).
    """
    import numpy as np  # noqa: PLC0415 -- host-side row compaction only

    Nl = cfg.Ns[layer]
    KL, KF = cfg.KL, cfg.KF
    use_translation = layer > 0
    trans = translation_l if use_translation else jnp.zeros((0,), jnp.int32)

    # phase i: mutual pre-filter + compact the rows (one small D2H per pass)
    need = np.asarray(_rows_needing_walk(nbrs, KL=KL)).reshape(-1)
    rows = np.nonzero(need)[0].astype(np.int32)

    sym_buffer = jnp.full((Nl, KF), -1, jnp.int32)
    sym_atomic = jnp.zeros((Nl,), jnp.int32)
    tau = jnp.float32(tau_build)
    bulk_connected = 0
    bulk_accepted = 0
    walk_residual = 0

    if mode in ("hybrid", "bulk") and len(rows):
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
