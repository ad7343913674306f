"""GGNN-TPU: graph-based approximate nearest-neighbor search, TPU-native.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cgtuebingen/ggnn ("GGNN: Graph-Based GPU Nearest Neighbor Search",
IEEE Trans. Big Data 9(1), 2023): hierarchical kNN-graph construction and
best-first ANN query, sharded across TPU chips.

Public surface mirrors the reference Python module
(src/ggnn/python/nanobind.cu:131-301): ``GGNN``, ``Dataset`` (+ typed
aliases), ``Evaluator``/``Evaluation``, ``DistanceMeasure``,
``set_log_level``.
"""

from ggnn_tpu.config import DistanceMeasure, GraphConfig  # noqa: F401
from ggnn_tpu.dataset import (  # noqa: F401
    Dataset,
    FloatDataset,
    IntDataset,
    UCharDataset,
    load_bvecs,
    load_fvecs,
    load_hdf5_dataset,
    load_ivecs,
    store_fvecs,
    store_ivecs,
)
from ggnn_tpu.evaluator import Evaluation, Evaluator  # noqa: F401
from ggnn_tpu.ggnn import GGNN, Results, ResultsFuture  # noqa: F401
from ggnn_tpu.graph import Graph  # noqa: F401
from ggnn_tpu.utils.logging import set_log_level  # noqa: F401

__version__ = "0.1.0"
