"""Test fixtures. The CPU/8-virtual-device environment is enforced by the
early plugin ``tests/force_cpu.py`` (see pytest.ini) -- by the time this
conftest runs, jax is guaranteed to be on the cpu backend with 8 devices."""

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
