"""Approximate nearest-neighbor query via batched best-first search.

TPU-native replacement for the reference ``QueryKernel``
(src/ggnn/query/query_layer.cu:39-97): instead of one CUDA block per query
with a shared-memory cache, a whole tile of queries advances in lock-step --
seeding is a dense MXU matmul against the S starting points, each step
expands several frontier anchors per query, and the slack is tightened
dynamically per row (query_layer.cu:58-63).

Large batches run in TWO PHASES: after a quarter of the pop budget, rows
whose beams have converged stop paying for the lock-step sweep -- the still
active rows are compacted into smaller tiles and only those continue. The
reference gets this for free (each CUDA block exits independently); on TPU
it costs one host round-trip for the row compaction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ggnn_tpu.config import DistanceMeasure, GraphConfig
from ggnn_tpu.graph import Graph
from ggnn_tpu.ops.beam import beam_init, beam_insert
from ggnn_tpu.ops.distance import dist_block, squared_norms
from ggnn_tpu.ops.traverse import beam_active, best_first_search

__all__ = ["ann_query"]


def _dynamic_xi(nn1_stats, tau_query, measure):
    """Initial slack + per-step tightening (query_layer.cu:48-63): from the
    *max* 1-NN distance, clamped by the current best distance."""
    if measure == DistanceMeasure.Euclidean:
        xi0 = (nn1_stats[1] * nn1_stats[1]) * tau_query * tau_query
        dyn = lambda st: jnp.minimum(xi0, st.d[:, 0] * tau_query * tau_query)
    else:
        xi0 = nn1_stats[1] * tau_query
        dyn = lambda st: jnp.minimum(xi0, st.d[:, 0] * tau_query)
    return xi0, dyn


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "vis_size", "k_query", "measure", "budget", "pops_per_iter",
        "fetch_cap_fraction",
    ),
)
def _query_cold(
    q_vecs,  # [B, D]
    nbr0,  # [N, KBuild] layer-0 neighbor table
    starting_points,  # [S] base ids (translation[L-1])
    base,
    base_sq,
    nn1_stats,
    tau_query,
    *,
    width: int,
    vis_size: int,
    k_query: int,
    measure: DistanceMeasure,
    budget: int,
    pops_per_iter: int,
    fetch_cap_fraction: float,
):
    """Seed from the starting points and run ``budget`` pops."""
    B = q_vecs.shape[0]
    q_vecs = q_vecs.astype(jnp.float32)
    q_sq = jnp.sum(q_vecs * q_vecs, axis=-1)
    xi0, dyn = _dynamic_xi(nn1_stats, tau_query, measure)

    state = beam_init(B, width, xi0, vis_size)

    # seed with the S starting points: a dense [B, S] MXU distance tile
    start_vecs = base[starting_points].astype(jnp.float32)
    seed_d = dist_block(
        q_vecs, start_vecs, measure, q_sq=q_sq, c_sq=base_sq[starting_points]
    )
    seed_ids = jnp.broadcast_to(starting_points[None, :], seed_d.shape).astype(
        jnp.int32
    )
    no_crit = jnp.full((B,), jnp.inf, jnp.float32)
    state = beam_insert(state, seed_ids, seed_d, criteria=no_crit)

    state = best_first_search(
        state, q_vecs, q_sq, nbr0, base, base_sq, None, measure, budget,
        k_best=k_query, dynamic_xi=dyn, pops_per_iter=pops_per_iter,
        fetch_cap_fraction=fetch_cap_fraction,
    )
    return state, beam_active(state, k_query)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_query", "measure", "budget", "pops_per_iter", "fetch_cap_fraction"
    ),
)
def _query_warm(
    state,
    q_vecs,
    nbr0,
    base,
    base_sq,
    nn1_stats,
    tau_query,
    *,
    k_query: int,
    measure: DistanceMeasure,
    budget: int,
    pops_per_iter: int,
    fetch_cap_fraction: float,
):
    """Resume an existing beam for the remaining pop budget."""
    q_vecs = q_vecs.astype(jnp.float32)
    q_sq = jnp.sum(q_vecs * q_vecs, axis=-1)
    _, dyn = _dynamic_xi(nn1_stats, tau_query, measure)
    state = best_first_search(
        state, q_vecs, q_sq, nbr0, base, base_sq, None, measure, budget,
        k_best=k_query, dynamic_xi=dyn, pops_per_iter=pops_per_iter,
        fetch_cap_fraction=fetch_cap_fraction, warm=True,
    )
    return state


def _plan_chunks(Q: int, chunk: int) -> int:
    """Evenly-sized chunks, rounded up to 256 rows to bound compile variety
    (instead of padding the tail chunk to the full chunk size)."""
    if Q <= 256:
        return Q
    num_chunks = max(1, -(-Q // chunk))
    per = -(-Q // num_chunks)
    return min(chunk, ((per + 255) // 256) * 256)


def ann_query(
    query: jax.Array,
    base: jax.Array,
    graph: Graph,
    cfg: GraphConfig,
    KQuery: int,
    tau_query: float,
    max_iterations: int = 400,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    *,
    base_sq: jax.Array | None = None,
    chunk: int = 8192,
    pops_per_iter: int = 8,
    fetch_cap_fraction: float = 0.75,
    two_phase: bool = False,
):
    """Query one graph shard.

    Returns (ids [Q, KQuery] int32 shard-local, dists [Q, KQuery] f32),
    each row sorted ascending (-1/inf in unfilled slots).

    ``pops_per_iter`` expands that many frontier anchors per loop step
    (total pop budget stays ``max_iterations``); 1 reproduces the reference
    visit order exactly, larger values trade a slightly greedier visit order
    for a P×-shorter sequential loop. ``fetch_cap_fraction`` bounds the
    per-step vector gather after id-dedup (ops/traverse.py); 0.75 measured
    recall-neutral, 0.5 trades ~3 recall points at saturation for ~20% more
    throughput. ``two_phase`` compacts converged rows out of the sweep after a quarter
    of the budget -- measured profitable only when most queries converge
    early (easy data / generous tau); on slow-converging workloads the extra
    host round-trip and smaller phase-2 tiles cost more than they save, so
    it is off by default.
    """
    measure = DistanceMeasure(measure)
    width, vis_size = GraphConfig.query_beam_geometry(KQuery, max_iterations)
    if base_sq is None:
        base_sq = squared_norms(base)
    starting_points = graph.translation[cfg.L - 1]
    tau = jnp.float32(tau_query)
    nbr0 = graph.neighbors[0]
    P = max(1, pops_per_iter)

    Q = query.shape[0]
    chunk = _plan_chunks(Q, chunk)
    use_two_phase = two_phase and Q >= 2048 and max_iterations >= 8 * P

    t1 = max_iterations
    if use_two_phase:
        t1 = max(4 * P, (max_iterations // 4 // P) * P)
    t2 = max_iterations - t1

    static = dict(
        width=width, vis_size=vis_size, k_query=KQuery, measure=measure,
        pops_per_iter=pops_per_iter, fetch_cap_fraction=fetch_cap_fraction,
    )

    states, actives, pads = [], [], []
    for start in range(0, Q, chunk):
        q_chunk = query[start : start + chunk]
        pad = chunk - q_chunk.shape[0]
        if pad:
            q_chunk = jnp.pad(q_chunk, ((0, pad), (0, 0)))
        st, act = _query_cold(
            q_chunk, nbr0, starting_points, base, base_sq, graph.nn1_stats,
            tau, budget=t1, **static,
        )
        states.append(st)
        actives.append(act)
        pads.append(pad)

    if not (use_two_phase and t2 > 0):
        ids = jnp.concatenate([st.i[:, :KQuery] for st in states], axis=0)
        dists = jnp.concatenate([st.d[:, :KQuery] for st in states], axis=0)
        return ids[:Q], dists[:Q]

    # phase 2: compact the still-active rows and spend the remaining budget
    ids = np.concatenate([np.asarray(st.i[:, :KQuery]) for st in states])
    dists = np.concatenate([np.asarray(st.d[:, :KQuery]) for st in states])
    act = np.concatenate([np.asarray(a) for a in actives])
    if pads[-1]:
        act[len(act) - pads[-1] :] = False  # padded tail rows never continue
    rows = np.nonzero(act)[0].astype(np.int32)
    if rows.size:
        state_all = jax.tree.map(lambda *xs: jnp.concatenate(xs), *states)
        query_host = np.asarray(query)
        c2 = min(chunk, 2048)
        n2 = max(1, -(-len(rows) // c2))
        n2 += n2 % 2 if n2 > 1 else 0  # even counts bound compile variety
        rows_pad = np.zeros((n2 * c2,), np.int32)
        rows_pad[: len(rows)] = rows
        parts = []
        for j in range(n2):
            sel_h = rows_pad[j * c2 : (j + 1) * c2]
            sel = jnp.asarray(sel_h)
            st_j = jax.tree.map(lambda x: x[sel], state_all)
            st_j = _query_warm(
                st_j, jnp.asarray(query_host[sel_h]), nbr0, base, base_sq,
                graph.nn1_stats, tau, k_query=KQuery, measure=measure,
                budget=t2, pops_per_iter=pops_per_iter,
                fetch_cap_fraction=fetch_cap_fraction,
            )
            parts.append(st_j)
        ids2 = np.concatenate([np.asarray(p.i[:, :KQuery]) for p in parts])
        d2 = np.concatenate([np.asarray(p.d[:, :KQuery]) for p in parts])
        ids[rows] = ids2[: len(rows)]
        dists[rows] = d2[: len(rows)]
    return jnp.asarray(ids[:Q]), jnp.asarray(dists[:Q])
