"""Weighted reservoir sampling promotion to the next layer.

TPU-native replacement for the reference ``WRSSelectionKernel``
(src/ggnn/construction/wrs_select_layer.cu:41-102): Efraimidis-Spirakis keys
``e = -log(u) / nn1_dist`` favor points in sparse regions; the per-segment
cub::BlockRadixSort becomes a batched ``lax.sort`` over reshaped segments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ggnn_tpu.config import GraphConfig

__all__ = ["wrs_select_layer"]

_EPS = jnp.float32(jnp.finfo(jnp.float32).eps)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_segments",
        "S",
        "S_offset",
        "Sglob",
        "G",
        "SG",
        "SG_offset",
        "use_translation",
        "N_next",
    ),
)
def _select(
    rng_u,  # [Ns[layer]] uniform(0,1]
    nn1_dist,  # [Ns[layer]]
    translation_layer,  # [Ns[layer]] or dummy
    *,
    num_segments: int,
    S: int,
    S_offset: int,
    Sglob: int,
    G: int,
    SG: int,
    SG_offset: int,
    use_translation: bool,
    N_next: int,
):
    W = S + (1 if S_offset else 0)
    b = jnp.arange(num_segments, dtype=jnp.int32)
    if S_offset:
        starts = b * S + jnp.minimum(b, S_offset)
        sizes = S + (b < S_offset).astype(jnp.int32)
    else:
        starts = b * S
        sizes = jnp.full((num_segments,), S, jnp.int32)

    offs = jax.lax.broadcasted_iota(jnp.int32, (num_segments, W), 1)
    node_ids = starts[:, None] + offs
    valid = offs < sizes[:, None]
    safe = jnp.where(valid, node_ids, 0)

    # Efraimidis-Spirakis keys (wrs_select_layer.cu:55-65); invalid slots lose.
    e = -jnp.log(rng_u[safe]) / (nn1_dist[safe] + _EPS)
    e = jnp.where(valid, e, -jnp.inf)

    # sort descending by key, carry node ids
    neg_e, winners = jax.lax.sort((-e, safe), dimension=-1, num_keys=1)

    # number of points each segment contributes to its upper segment
    nth = b % G
    num_sel = SG + (nth < SG_offset).astype(jnp.int32)
    upper_segment = b // G
    dest0 = upper_segment * Sglob + nth * SG + jnp.minimum(nth, SG_offset)

    max_sel = SG + (1 if SG_offset else 0)
    slot = jax.lax.broadcasted_iota(jnp.int32, (num_segments, max_sel), 1)
    chosen = winners[:, :max_sel]
    sel_valid = slot < num_sel[:, None]
    dest = jnp.where(sel_valid, dest0[:, None] + slot, N_next)  # drop invalid

    selection = jnp.full((N_next,), -1, jnp.int32)
    translation = jnp.full((N_next,), -1, jnp.int32)
    selection = selection.at[dest.reshape(-1)].set(chosen.reshape(-1), mode="drop")
    if use_translation:
        trans_vals = translation_layer[chosen]
    else:
        trans_vals = chosen
    translation = translation.at[dest.reshape(-1)].set(
        trans_vals.reshape(-1), mode="drop"
    )
    return selection, translation


def wrs_select_layer(
    key: jax.Array,
    nn1_dist: jax.Array,
    translation_l: jax.Array | None,
    cfg: GraphConfig,
    layer: int,
):
    """Select/translate layer ``layer+1`` from layer ``layer``.

    Returns (selection [Ns[layer+1]], translation [Ns[layer+1]]) where
    selection maps layer-(l+1) ids to layer-l ids and translation maps them
    to base (layer-0) ids, mirroring graph_construction.cu:163-187.
    """
    Ns = cfg.Ns[layer]
    # curand uniform is (0, 1]; jax.random.uniform is [0, 1) -- flip.
    u = 1.0 - jax.random.uniform(key, (Ns,), dtype=jnp.float32)
    use_translation = layer > 0
    trans = translation_l if use_translation else jnp.zeros((0,), jnp.int32)
    return _select(
        u,
        nn1_dist,
        trans,
        num_segments=cfg.Bs[layer],
        S=cfg.layer_segment_size(layer),
        S_offset=cfg.layer_segment_offset_count(layer),
        Sglob=cfg.S,
        G=cfg.G,
        SG=cfg.SG,
        SG_offset=cfg.SG_off,
        use_translation=use_translation,
        N_next=cfg.Ns[layer + 1],
    )
