"""Graph construction pipeline (top-merge, select, merge, sym)."""

from ggnn_tpu.build.construction import build_graph  # noqa: F401
