"""Per-segment brute-force kNN seeding ("top merge").

TPU-native replacement for the reference ``TopMergeKernel``
(src/ggnn/construction/top_merge_layer.cu:40-89: one CUDA block per point
scanning its segment with a KBestList). Segments are fixed-size and
contiguous, so on TPU the whole layer becomes a batch of dense S x S distance
matrices on the MXU followed by a row sort -- no per-point loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ggnn_tpu.config import DistanceMeasure, GraphConfig
__all__ = ["top_merge_layer"]


@functools.partial(
    jax.jit,
    static_argnames=("W", "KBuild", "measure", "use_translation", "S", "S_offset"),
)
def _top_merge_chunk(
    seg_ids,  # [C] segment indices
    base,  # [N, D]
    base_sq,  # [N]
    translation,  # [N_layer] or dummy
    *,
    W: int,  # padded segment width
    S: int,  # regular segment size
    S_offset: int,  # number of leading segments with one extra point
    KBuild: int,
    measure: DistanceMeasure,
    use_translation: bool,
):
    C = seg_ids.shape[0]
    if S_offset:
        starts = seg_ids * S + jnp.minimum(seg_ids, S_offset)
        sizes = S + (seg_ids < S_offset).astype(jnp.int32)
    else:
        starts = seg_ids * S
        sizes = jnp.full((C,), S, jnp.int32)

    offs = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    node_ids = starts[:, None] + offs  # [C, W] layer-local ids
    valid = offs < sizes[:, None]
    safe_nodes = jnp.where(valid, node_ids, 0)

    if use_translation:
        m = translation[safe_nodes]
    else:
        m = safe_nodes
    vecs = base[m].astype(jnp.float32)  # [C, W, D]
    sq = base_sq[m]  # [C, W]

    dots = jnp.einsum(
        "cwd,cvd->cwv",
        vecs,
        vecs,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if measure == DistanceMeasure.Euclidean:
        d = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * dots, 0.0)
    else:
        norm_sq = sq[:, :, None] * sq[:, None, :]
        safe = norm_sq > 0.0
        d = jnp.abs(1.0 - dots * jax.lax.rsqrt(jnp.where(safe, norm_sq, 1.0)))
        d = jnp.where(safe, d, 1.0)

    # mask out self matches (incl. translated duplicates, top_merge_layer.cu:66)
    # and padded columns
    self_mask = m[:, :, None] == m[:, None, :]
    col_invalid = ~valid[:, None, :]
    d = jnp.where(self_mask | col_invalid, jnp.inf, d)

    cols = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2), d.shape
    )
    sorted_d, sorted_c = jax.lax.sort((d, cols), dimension=-1, num_keys=1)
    # segments can be narrower than KBuild (S0 < KBuild regime,
    # graph_config.cpp warning path): the reference's KBestList simply stays
    # partially filled (top_merge_layer.cu:66-75) -- pad the missing columns
    # with EMPTY and let later merge passes fill them
    take = min(KBuild, W)
    top_d = sorted_d[:, :, :take]
    top_ids = starts[:, None, None] + sorted_c[:, :, :take]
    top_ids = jnp.where(jnp.isinf(top_d), -1, top_ids)
    if take < KBuild:
        top_ids = jnp.pad(
            top_ids, ((0, 0), (0, 0), (0, KBuild - take)), constant_values=-1
        )

    # 1-NN statistic = second-best non-self distance (top_merge_layer.cu:77)
    nn1 = sorted_d[:, :, 1]
    if measure == DistanceMeasure.Euclidean:
        nn1 = jnp.sqrt(nn1)
    nn1 = jnp.where(jnp.isinf(nn1), 0.0, nn1)

    return node_ids, valid, top_ids, nn1


def top_merge_layer(
    base: jax.Array,
    base_sq: jax.Array,
    translation_l: jax.Array | None,
    cfg: GraphConfig,
    layer: int,
    measure: DistanceMeasure,
    seg_chunk: int = 2048,
):
    """Seed ``layer`` with per-segment exact kNN.

    Returns (neighbors [Ns[layer], KBuild] int32 layer-local ids,
             nn1 [Ns[layer]] f32 second-best distances).
    """
    S = cfg.layer_segment_size(layer)
    S_offset = cfg.layer_segment_offset_count(layer)
    W = S + (1 if S_offset else 0)
    num_segments = cfg.Bs[layer]
    use_translation = layer > 0
    trans = translation_l if use_translation else jnp.zeros((0,), jnp.int32)

    Ns = cfg.Ns[layer]
    nbrs_out = jnp.full((Ns, cfg.KBuild), -1, jnp.int32)
    nn1_out = jnp.zeros((Ns,), jnp.float32)

    seg_chunk = min(seg_chunk, num_segments)
    for start in range(0, num_segments, seg_chunk):
        ids = jnp.arange(start, start + seg_chunk, dtype=jnp.int32)
        ids = jnp.minimum(ids, num_segments - 1)  # pad tail by repeating
        node_ids, valid, top_ids, nn1 = _top_merge_chunk(
            ids,
            base,
            base_sq,
            trans,
            W=W,
            S=S,
            S_offset=S_offset,
            KBuild=cfg.KBuild,
            measure=DistanceMeasure(measure),
            use_translation=use_translation,
        )
        # drop duplicated tail segments / padded rows via mode="drop"
        flat_nodes = jnp.where(valid, node_ids, Ns).reshape(-1)
        if start + seg_chunk > num_segments:
            real = (
                jnp.arange(start, start + seg_chunk)[:, None] < num_segments
            ) & valid
            flat_nodes = jnp.where(real, node_ids, Ns).reshape(-1)
        nbrs_out = nbrs_out.at[flat_nodes].set(
            top_ids.reshape(-1, cfg.KBuild), mode="drop"
        )
        nn1_out = nn1_out.at[flat_nodes].set(nn1.reshape(-1), mode="drop")
    return nbrs_out, nn1_out
