#!/usr/bin/env python
"""GGNN-TPU with data that already lives on the accelerator.

Functional analog of the reference's GPU-resident-data examples
(examples/cpp-and-cuda/ggnn_main_gpu_data.cu, ggnn_pytorch_gpu_data.py):
base and query are generated directly on the TPU as jax.Arrays, and results
are requested on-device (`set_return_results_on_gpu` analog).
"""

import jax
import jax.numpy as jnp

from ggnn_tpu import GGNN

key = jax.random.PRNGKey(0)
kb, kq = jax.random.split(key)
base = jax.random.uniform(kb, (10_000, 128), dtype=jnp.float32)
query = jax.random.uniform(kq, (1_000, 128), dtype=jnp.float32)

g = GGNN()
g.set_base(base)  # accepts jax.Array / numpy / torch via __array__
g.set_return_results_on_device()
g.build(k_build=24, tau_build=0.5)

ids, dists = g.query(query, k_query=10, tau_query=0.64, max_iterations=400)
print("result devices:", ids.devices() if hasattr(ids, "devices") else "host")
print("indices:", ids[:5])
print("squared dists:", dists[:5])
