"""Utility helpers: logging verbosity and phase timing."""

from ggnn_tpu.utils.logging import get_log_level, set_log_level, vlog  # noqa: F401
from ggnn_tpu.utils.timing import PhaseTimer  # noqa: F401
