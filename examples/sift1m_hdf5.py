#!/usr/bin/env python
"""ANN-benchmarks HDF5 benchmark (sift-128-euclidean.hdf5).

Functional analog of examples/python/sift1m_hdf5.py: loads the
train/test/neighbors arrays from an ANN-benchmarks-format HDF5 file and
sweeps the reference recall anchors.

Dataset: https://ann-benchmarks.com/sift-128-euclidean.hdf5
Usage: python examples/sift1m_hdf5.py /path/to/sift-128-euclidean.hdf5
"""

import sys

from ggnn_tpu import GGNN, Evaluator, load_hdf5_dataset

data = load_hdf5_dataset(sys.argv[1])
base, query, gt = data["train"], data["test"], data["neighbors"]

k_query = 10
evaluator = Evaluator(base, query, gt=gt, k_query=k_query)

g = GGNN()
g.set_base(base)
g.build(k_build=24, tau_build=0.5)

for tau_query, max_iterations in ((0.34, 200), (0.41, 200), (0.51, 200), (0.64, 400)):
    ids, dists = g.query(query, k_query, tau_query, max_iterations)
    print(f"-- tau_query={tau_query}, max_iterations={max_iterations}")
    print(evaluator.evaluate_results(ids))
