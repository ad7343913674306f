#!/usr/bin/env python
"""GGNN-TPU with PyTorch tensors.

The reference's Python bindings are torch-first (nanobind.cu:157-182 accept
torch tensors zero-copy); GGNN-TPU accepts anything NumPy-convertible,
including torch CPU tensors, and returns NumPy arrays that torch can wrap
zero-copy via ``torch.from_numpy``.
"""

import torch

from ggnn_tpu import GGNN, Evaluator

torch.manual_seed(0)
base = torch.rand((10_000, 128), dtype=torch.float32)
query = torch.rand((1_000, 128), dtype=torch.float32)

g = GGNN()
g.set_base(base)
g.build(k_build=24, tau_build=0.5)

ids, dists = g.query(query, k_query=10, tau_query=0.64, max_iterations=400)
ids_t = torch.from_numpy(ids)
dists_t = torch.from_numpy(dists)
print("indices:", ids_t[:5], "\nsquared dists:", dists_t[:5], "\n")

gt_ids, _ = g.bf_query(query, k_gt=100)
evaluator = Evaluator(base, query, gt_ids, k_query=10)
print(evaluator.evaluate_results(ids))
