"""Block-native query engine: spatially-coherent point blocks + block graph.

The row-oriented traversal (ggnn_tpu/query/ann.py) is bound by XLA's random
row-gather rate (~20-30 GB/s effective for 512 B rows on v5e). This engine
regroups the base into fixed-size spatially-coherent blocks so the traversal
fetches whole multi-KB blocks (DMA-friendly) and scores 32 points per fetch
on the MXU -- same graph-ANN semantics, TPU-native memory access.
"""

from ggnn_tpu.blocks.layout import BlockIndex, build_block_index
from ggnn_tpu.blocks.query import block_query

__all__ = ["BlockIndex", "build_block_index", "block_query"]
