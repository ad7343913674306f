#!/usr/bin/env python
"""Sharded multi-chip GGNN-TPU.

Functional analog of the reference's multi-GPU examples
(examples/cpp-and-cuda/ggnn_main_multi_gpu.cpp, ggnn_pytorch_multi_gpu.py):
the base is split into shards assigned across devices; queries run against
every shard and results are merged.

Run on a host without a TPU pod with 8 virtual devices:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multi_device.py
"""

import jax
import numpy as np

from ggnn_tpu import GGNN

rng = np.random.default_rng(0)
base = rng.random((100_000, 128), dtype=np.float32)
query = rng.random((10_000, 128), dtype=np.float32)

g = GGNN()
g.set_base(base)
g.set_shard_size(n_shard=25_000)
g.set_devices(jax.devices()[: min(4, jax.device_count())])

g.build(k_build=24, tau_build=0.5)

ids, dists = g.query(query, k_query=10, tau_query=0.64, max_iterations=400)
print("indices:", ids[:5], "\nsquared dists:", dists[:5], "\n")
