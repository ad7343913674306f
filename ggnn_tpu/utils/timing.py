"""Wall-clock phase timing with us/point throughput logs.

TPU analog of the reference's cudaEvent ``time_launcher`` instrumentation
(graph_construction.cu:54-77) and the per-shard build/query timing logs
(gpu_instance.cu:536-545, 707-712): phases are timed with wall clocks around
blocking device work and reported in the same "N queries -> X us/query"
format.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax

from ggnn_tpu.utils.logging import vlog

__all__ = ["PhaseTimer", "hard_sync"]


def hard_sync(x) -> None:
    """Force completion of the program producing ``x`` via a 1-element D2H.

    ``jax.block_until_ready`` does not actually wait on some experimental
    platforms (axon relay), and on those platforms a single blocking transfer
    that spans more than ~70 s of queued device work gets the worker killed.
    Long build phases therefore sync in bounded slices through this helper.
    """
    leaf = jax.tree.leaves(x)[0]
    jax.device_get(leaf.ravel()[:1])


class PhaseTimer:
    """Accumulates named phase durations; logs us/point at VLOG level."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str, n: int = 0, log_level: int = 2, block=None):
        """Time a phase. ``block``: optional array(s) to block_until_ready."""
        start = time.perf_counter()
        result = {}
        try:
            yield result
        finally:
            out = result.get("out", block)
            if out is not None:
                # block_until_ready returns immediately on the axon relay --
                # a 1-element D2H is the only true fence there. Without it
                # the phase's device work drains during whichever LATER
                # operation first blocks, mis-attributing tens of seconds
                # (262k: 150 s of "between-phase" wall was deferred work).
                jax.block_until_ready(out)
                hard_sync(out)
            elapsed = time.perf_counter() - start
            self.phases[name] = self.phases.get(name, 0.0) + elapsed
            if n:
                vlog(
                    log_level,
                    "%s: %.3f ms for %d queries -> %.3f us/query",
                    name,
                    elapsed * 1e3,
                    n,
                    elapsed * 1e6 / n,
                )
            else:
                vlog(log_level, "%s: %.3f ms", name, elapsed * 1e3)

    def total(self) -> float:
        return sum(self.phases.values())
