"""Graph construction schedule (build + refine).

TPU-native replacement for the reference ``GraphConstruction``
(src/ggnn/construction/graph_construction.cu:104-403). The layer schedule is
kept verbatim (graph_construction.cu:128-147):

    build():  for layer_top in 0..L-1:
                for layer_btm in layer_top..0 (descending):
                  merge(layer_top, layer_btm)        # top==btm -> top_merge
                  if layer_top < L-1 and top == btm: select(layer_top)
                  sym(layer_btm)

    refine(): for layer in L-2..0: merge(L-1, layer); sym(layer)

The CUDA kernel-config dispatch, GraphBuffer scratch pool and cuRAND
generator disappear: XLA/jit specializes per shape, scratch is managed by the
compiler, and randomness is a threaded ``jax.random`` key (seeded 1234 like
graph_construction.cu:100 for determinism).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ggnn_tpu.config import DistanceMeasure, GraphConfig
from ggnn_tpu.graph import Graph
from ggnn_tpu.build.merge import merge_layer
from ggnn_tpu.build.select import wrs_select_layer
from ggnn_tpu.build.sym import sym_pass
from ggnn_tpu.build.top_merge import top_merge_layer
from ggnn_tpu.ops.distance import squared_norms
from ggnn_tpu.utils.logging import vlog
from ggnn_tpu.utils.timing import PhaseTimer

__all__ = ["build_graph"]


class _BuildContext:
    """Mutable per-shard construction state (the reference's GraphBuffer +
    Graph pair, graph_buffer.cuh:38-92)."""

    def __init__(self, base, cfg: GraphConfig, measure, tau_build, seed, chunk,
                 quantized_fetch=True, sym_mode="bulk", dense_seed_merge=True,
                 merge_num_seeds=32):
        self.cfg = cfg
        self.measure = DistanceMeasure(measure)
        self.tau_build = float(tau_build)
        self.base = base
        self.base_sq = squared_norms(base)
        self.chunk = chunk
        self.sym_mode = sym_mode
        self.dense_seed_merge = bool(dense_seed_merge)
        self.merge_num_seeds = int(merge_num_seeds)
        # quantized layer-0 merge fetch (query/fused.py layout); auto-off
        # when the inline adjacency would not fit comfortably in HBM
        self.quantized_fetch = bool(quantized_fetch) and (
            cfg.N * cfg.KBuild * cfg.D <= 6 << 30
        )
        self._codes = None
        self._quant_ok = None
        L = cfg.L
        self.neighbors = [
            jnp.full((cfg.Ns[l], cfg.KBuild), -1, jnp.int32) for l in range(L)
        ]
        self.selection = [jnp.zeros((0,), jnp.int32) for _ in range(L)]
        self.translation = [jnp.zeros((0,), jnp.int32) for _ in range(L)]
        self.nn1_dist = [None] * L  # per-layer 1-NN distance buffers
        self.nn1_stats = jnp.zeros((2,), jnp.float32)
        self.key = jax.random.PRNGKey(seed)
        self.timer = PhaseTimer()
        self.sym_stats = []

    def next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _layer_adjacency(self, layer: int):
        """Inline one layer's current neighborhoods as quantized code
        blocks (rebuilt per merge pass -- the read-side graph changes).

        Layer > 0 tables address the layer-local id space (the layer graphs
        are layer-local, graph.cuh:57-63); their inline codes come from the
        translated base vectors, so the descent's best-first loop at every
        layer fetches one contiguous code block per popped anchor instead
        of per-candidate 512 B f32 rows (measured at 262k: the layer-1
        descent leg alone cost more than the whole layer-0 search)."""
        from ggnn_tpu.query.fused import make_adjacency

        self._ensure_codes()
        if layer == 0:
            codes, sq = self._codes, self._x_hat_sq
        else:
            tr = self.translation[layer]
            codes, sq = self._codes[tr], self._x_hat_sq[tr]
        return make_adjacency(
            codes, sq, self.neighbors[layer], self._scale, self._zero,
        )

    def _ensure_codes(self):
        from ggnn_tpu.query.fused import fit_affine_u8, _encode_u8
        import numpy as np
        from ggnn_tpu.ops.distance import squared_norms as _sq

        if self._codes is None:
            base_np = np.asarray(self.base)
            if base_np.dtype == np.uint8:
                scale = np.ones((base_np.shape[1],), np.float32)
                zero = np.zeros((base_np.shape[1],), np.float32)
            else:
                scale, zero = fit_affine_u8(base_np)
            self._scale = jnp.asarray(scale)
            self._zero = jnp.asarray(zero)
            base_f32 = jnp.asarray(base_np).astype(jnp.float32)
            self._codes = _encode_u8(base_f32, self._scale, self._zero)
            self._x_hat_sq = _sq(
                self._codes.astype(jnp.float32) * self._scale[None, :]
                + self._zero[None, :]
            )

    def _quant_usable(self) -> bool:
        """Whether the u8 walk metric is sane for this data.

        The affine fit uses per-dimension min/max, so one heavy-tailed
        dimension can inflate the quantization step until walk distances are
        noise. Guard: if the mean dequantization error is comparable to the
        mean 1-NN distance, fall back to the exact f32 fetch (and say so).
        Euclidean only -- nn1_stats are cosine distances under Cosine, where
        no comparable scale exists; uint8 input is exact by construction."""
        if self._quant_ok is None:
            if self.measure != DistanceMeasure.Euclidean:
                self._quant_ok = True
            else:
                sample = min(4096, self.cfg.N)
                x = self.base[:sample].astype(jnp.float32)
                x_hat = (
                    self._codes[:sample].astype(jnp.float32) * self._scale
                    + self._zero
                )
                err = float(jnp.mean(jnp.linalg.norm(x - x_hat, axis=-1)))
                nn1_mean = float(self.nn1_stats[0])
                self._quant_ok = nn1_mean <= 0.0 or err < 0.5 * nn1_mean
                if not self._quant_ok:
                    vlog(
                        0,
                        "quantized fetch disabled: mean dequantization error "
                        "%.3g vs mean 1-NN distance %.3g -- building with "
                        "exact f32 fetches instead",
                        err,
                        nn1_mean,
                    )
        return self._quant_ok

    # --- schedule steps ---------------------------------------------------

    def merge(self, layer_top: int, layer_btm: int):
        if layer_top == layer_btm:
            self.top(layer_btm)
        else:
            self.merge_descend(layer_top, layer_btm)
        if layer_btm == 0:
            self.compute_nn1_stats()

    def top(self, layer: int):
        with self.timer.phase(f"top[{layer}]", self.cfg.Ns[layer]) as r:
            nbrs, nn1 = top_merge_layer(
                self.base,
                self.base_sq,
                self.translation[layer] if layer else None,
                self.cfg,
                layer,
                self.measure,
            )
            self.neighbors[layer] = nbrs
            self.nn1_dist[layer] = nn1
            r["out"] = nbrs

    def merge_descend(self, layer_top: int, layer_btm: int):
        name = f"merge[{layer_top}->{layer_btm}]"
        adjs = None
        if self.quantized_fetch:
            self._ensure_codes()
            if self._quant_usable():
                # every layer the descent searches (layer_top-1 .. layer_btm)
                # gets an inline-code adjacency; dense seeding searches only
                # layer_btm, so the upper-layer tables are never fetched
                with self.timer.phase(
                    f"adj[{layer_top}->{layer_btm}]", self.cfg.Ns[layer_btm]
                ) as r:
                    adjs = tuple(
                        self._layer_adjacency(l)
                        if (
                            l == layer_btm
                            if self.dense_seed_merge
                            else layer_btm <= l < layer_top
                        )
                        else None
                        for l in range(self.cfg.L)
                    )
                    r["out"] = adjs[layer_btm].blocks
            else:
                self.quantized_fetch = False  # don't re-check every pass
        with self.timer.phase(name, self.cfg.Ns[layer_btm]) as r:
            nbrs, nn1 = merge_layer(
                self.base,
                self.base_sq,
                tuple(self.neighbors),
                tuple(self.selection),
                tuple(self.translation),
                self.nn1_stats,
                self.cfg,
                layer_top,
                layer_btm,
                self.measure,
                self.tau_build,
                chunk=self.chunk,
                adjs=adjs,
                use_pallas=jax.default_backend() not in ("cpu",),
                dense_seed=self.dense_seed_merge,
                num_seeds=self.merge_num_seeds,
            )
            self.neighbors[layer_btm] = nbrs
            if layer_btm == 0:
                self.nn1_dist[0] = nn1
            r["out"] = nbrs

    def select(self, layer: int):
        with self.timer.phase(f"select[{layer}]", self.cfg.Bs[layer]) as r:
            sel, trans = wrs_select_layer(
                self.next_key(),
                self.nn1_dist[layer],
                self.translation[layer] if layer else None,
                self.cfg,
                layer,
            )
            self.selection[layer + 1] = sel
            self.translation[layer + 1] = trans
            r["out"] = sel

    def sym(self, layer: int):
        with self.timer.phase(f"sym[{layer}]", self.cfg.Ns[layer]) as r:
            nbrs, stats = sym_pass(
                self.base,
                self.base_sq,
                self.neighbors[layer],
                self.translation[layer] if layer else None,
                self.nn1_stats,
                self.cfg,
                layer,
                self.measure,
                self.tau_build,
                mode=self.sym_mode,
            )
            self.neighbors[layer] = nbrs
            self.sym_stats.append({"layer": layer, **stats})
            vlog(
                2,
                "Layer %d [N: %d] | overflow: %d (%.4f) | added_links: %d (%.4f)",
                layer,
                stats["N"],
                stats["overflow"],
                stats["overflow"] / stats["N"],
                stats["added_links"],
                stats["added_links"] / stats["N"],
            )
            r["out"] = nbrs

    def compute_nn1_stats(self):
        # graph_construction.cu:381-402: mean and max of layer-0 1-NN dists
        nn1 = self.nn1_dist[0]
        self.nn1_stats = jnp.stack([jnp.mean(nn1), jnp.max(nn1)]).astype(jnp.float32)
        vlog(2, "nn1 stats -- mean: %s | max: %s", *jax.device_get(self.nn1_stats))

    def to_graph(self) -> Graph:
        return Graph(
            neighbors=tuple(self.neighbors),
            selection=tuple(self.selection),
            translation=tuple(self.translation),
            nn1_stats=self.nn1_stats,
        )


def build_graph(
    base: jax.Array,
    cfg: GraphConfig,
    tau_build: float,
    refinement_iterations: int = 2,
    measure: DistanceMeasure = DistanceMeasure.Euclidean,
    seed: int = 1234,
    chunk: int = 8192,
    quantized_fetch: bool = True,
    sym_mode: str = "bulk",
    dense_seed_merge: bool = True,
    merge_num_seeds: int = 32,
) -> tuple[Graph, dict]:
    """Build one graph shard. Returns (graph, build stats).

    ``sym_mode``: "bulk" (drop residual links instead of walking --
    fastest, measured recall-identical; default), "hybrid" (bulk proposals
    + residual walks), "walk" (walk every unconnected pair -- the
    conservative reference shape).

    ``dense_seed_merge``: seed merge beams with a dense MXU scan against the
    next layer's representatives instead of the reference's hierarchic
    descent (merge_layer.cu:86-121) -- the upper-layer best-first legs
    disappear. False restores the descent shape."""
    ctx = _BuildContext(base, cfg, measure, tau_build, seed, chunk,
                        quantized_fetch=quantized_fetch, sym_mode=sym_mode,
                        dense_seed_merge=dense_seed_merge,
                        merge_num_seeds=merge_num_seeds)
    L = cfg.L

    # graph_construction.cu:128-140
    for layer_top in range(L):
        for layer_btm in range(layer_top, -1, -1):
            ctx.merge(layer_top, layer_btm)
            if layer_top < L - 1 and layer_top == layer_btm:
                ctx.select(layer_top)
            ctx.sym(layer_btm)

    # refinement (gpu_instance.cu:552-555)
    for _ in range(refinement_iterations):
        for layer in range(L - 2, -1, -1):
            ctx.merge(L - 1, layer)
            ctx.sym(layer)

    graph = ctx.to_graph()
    stats = {
        "phases": dict(ctx.timer.phases),
        "sym": ctx.sym_stats,
        "build_time_s": ctx.timer.total(),
    }
    return graph, stats


