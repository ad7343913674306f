"""Query pipeline (ANN best-first search + brute force)."""

from ggnn_tpu.query.ann import ann_query  # noqa: F401
