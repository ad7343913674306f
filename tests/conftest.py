"""Test fixtures. The CPU/8-virtual-device environment is enforced by the
early plugin ``tests/force_cpu.py`` (see pytest.ini) -- by the time this
conftest runs, jax is guaranteed to be on the cpu backend with 8 devices."""

import os

import jax
import numpy as np
import pytest

# Persistent compile cache: repeat suite runs skip most XLA CPU compiles.
# Also mitigates a reproducible XLA-CPU compiler segfault that only occurs
# late in a long single-process run with hundreds of live executables (the
# cosine build program at ~90% of the suite) -- cache hits skip the
# crashing compile entirely on subsequent runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "GGNN_JAX_TEST_CACHE", os.path.expanduser("~/.cache/ggnn_tpu_jax_cpu")
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the number of live executables in one process (see above)."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
