#!/usr/bin/env python
"""SIFT1M (TEXMEX fvecs) benchmark with the reference's recall anchors.

Functional analog of examples/python/sift1m_fvecs.py: with default
parameters on SIFT1M, tau_query 0.34 / 0.41 / 0.51 should reach roughly
90 / 95 / 99% C@1, and 0.64 with 400 iterations 99% C@10.

Dataset: http://corpus-texmex.irisa.fr/ (ANN_SIFT1M).
Usage: python examples/sift1m_fvecs.py /path/to/sift
"""

import sys
from pathlib import Path

from ggnn_tpu import GGNN, Evaluator, load_fvecs, load_ivecs

path = Path(sys.argv[1] if len(sys.argv) > 1 else "data/sift")
base = load_fvecs(path / "sift_base.fvecs")
query = load_fvecs(path / "sift_query.fvecs")
gt = load_ivecs(path / "sift_groundtruth.ivecs")

k_query = 10
evaluator = Evaluator(base, query, gt=gt, k_query=k_query)

g = GGNN()
g.set_base(base)
g.build(k_build=24, tau_build=0.5)

for tau_query, max_iterations in ((0.34, 200), (0.41, 200), (0.51, 200), (0.64, 400)):
    ids, dists = g.query(query, k_query, tau_query, max_iterations)
    print(f"-- tau_query={tau_query}, max_iterations={max_iterations}")
    print(evaluator.evaluate_results(ids))
