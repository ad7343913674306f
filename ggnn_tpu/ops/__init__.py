"""TPU compute primitives (XLA + Pallas) for GGNN-TPU."""

from ggnn_tpu.ops.distance import (  # noqa: F401
    EMPTY_DIST,
    dist_block,
    dist_gathered,
    squared_norms,
)
from ggnn_tpu.ops.topk import (  # noqa: F401
    EMPTY_ID,
    merge_topk,
    sort_by_dist,
    topk_smallest,
)
from ggnn_tpu.ops.bruteforce import bruteforce_knn  # noqa: F401
