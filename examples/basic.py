#!/usr/bin/env python
"""Minimal GGNN-TPU usage: build, query, brute-force ground truth, recall.

Functional analog of the reference's ggnn_main.cpp / ggnn_pytorch.py
(examples/cpp-and-cuda/ggnn_main.cpp:33-78, examples/python/ggnn_pytorch.py):
10k random 128-D vectors, k_build=24, tau_build=0.5, recall@10 vs brute force.
"""

import numpy as np

from ggnn_tpu import GGNN, Evaluator

rng = np.random.default_rng(42)
base = rng.random((10_000, 128), dtype=np.float32)
query = rng.random((1_000, 128), dtype=np.float32)

g = GGNN()
g.set_base(base)
g.build(k_build=24, tau_build=0.5, refinement_iterations=2)

k_query = 10
ids, dists = g.query(query, k_query=k_query, tau_query=0.64, max_iterations=400)
print("indices:", ids[:5], "\nsquared dists:", dists[:5], "\n")

gt_ids, gt_dists = g.bf_query(query, k_gt=100)
evaluator = Evaluator(base, query, gt_ids, k_query=k_query)
print(evaluator.evaluate_results(ids))
