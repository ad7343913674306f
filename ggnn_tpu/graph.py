"""The hierarchical search-graph container.

TPU-native equivalent of the reference's ``Graph`` (include/ggnn/base/graph.h:
38-76, src/ggnn/base/graph.cpp): where the reference carves one flat byte pool
into per-layer views, we keep per-layer JAX/NumPy arrays in a pytree --
XLA owns layout, and static per-layer shapes come from :class:`GraphConfig`.

Serialization improves on the reference's headerless ``part_<id>.ggnn`` blobs
(gpu_instance.cu:86-115): shards are ``.npz`` files with a JSON-encoded config
header, so loading does not silently depend on the KBuild passed at load time.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ggnn_tpu.config import GraphConfig

__all__ = ["Graph", "empty_graph", "save_graph_shard", "load_graph_shard"]


class Graph(NamedTuple):
    """One graph shard.

    Attributes:
      neighbors: tuple of L arrays, layer l: [Ns[l], KBuild] int32 -- neighbor
        ids *within layer l* (first KL local links, last KF foreign links).
      selection: tuple of L arrays; selection[l] for l>=1: [Ns[l]] int32 --
        id of each layer-l node in layer l-1. selection[0] is a placeholder
        of shape [0].
      translation: tuple of L arrays; translation[l] for l>=1: [Ns[l]] int32
        -- id of each layer-l node in layer 0 (the base). translation[0] is a
        placeholder of shape [0].
      nn1_stats: [2] f32 -- {mean, max} of 1-NN distances on layer 0
        (graph.h:47-50; sqrt'ed for Euclidean).
    """

    neighbors: tuple
    selection: tuple
    translation: tuple
    nn1_stats: jax.Array

    @property
    def num_layers(self) -> int:
        return len(self.neighbors)


def empty_graph(config: GraphConfig, device=None) -> Graph:
    """Allocate an all-invalid graph shard with the config's geometry."""
    L = config.L
    neighbors = tuple(
        jnp.full((config.Ns[l], config.KBuild), -1, dtype=jnp.int32)
        for l in range(L)
    )
    selection = tuple(
        jnp.full((config.Ns[l] if l else 0,), -1, dtype=jnp.int32) for l in range(L)
    )
    translation = tuple(
        jnp.full((config.Ns[l] if l else 0,), -1, dtype=jnp.int32) for l in range(L)
    )
    nn1_stats = jnp.zeros((2,), dtype=jnp.float32)
    g = Graph(neighbors, selection, translation, nn1_stats)
    if device is not None:
        g = jax.device_put(g, device)
    return g


def save_graph_shard(path: str | Path, graph: Graph, config: GraphConfig) -> None:
    """Store one shard: npz payload + JSON config header."""
    path = Path(path)
    payload = {"config": json.dumps(config.to_dict())}
    for l in range(config.L):
        payload[f"neighbors_{l}"] = np.asarray(graph.neighbors[l])
        if l:
            payload[f"selection_{l}"] = np.asarray(graph.selection[l])
            payload[f"translation_{l}"] = np.asarray(graph.translation[l])
    payload["nn1_stats"] = np.asarray(graph.nn1_stats)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **payload)


def load_graph_shard(path: str | Path) -> tuple[Graph, GraphConfig]:
    """Load one shard; returns (graph on host, config from the header)."""
    path = Path(path)
    with np.load(path, allow_pickle=False) as f:
        cfg_dict = json.loads(str(f["config"]))
        config = GraphConfig.create(
            N=cfg_dict["N"], D=cfg_dict["D"], KBuild=cfg_dict["KBuild"]
        )
        # verify stored geometry matches the re-derived one
        for key in ("KF", "G", "S", "S0", "S0_off", "N_all", "ST_all"):
            if cfg_dict[key] != getattr(config, key):
                raise ValueError(
                    f"{path}: stored graph geometry mismatch on {key}: "
                    f"{cfg_dict[key]} != {getattr(config, key)}"
                )
        neighbors = tuple(f[f"neighbors_{l}"] for l in range(config.L))
        selection = tuple(
            f[f"selection_{l}"] if l else np.zeros((0,), np.int32)
            for l in range(config.L)
        )
        translation = tuple(
            f[f"translation_{l}"] if l else np.zeros((0,), np.int32)
            for l in range(config.L)
        )
        nn1_stats = f["nn1_stats"]
    return Graph(neighbors, selection, translation, nn1_stats), config
