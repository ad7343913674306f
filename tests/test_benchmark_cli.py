"""Smoke test for the benchmark CLI (python -m ggnn_tpu.benchmark)."""

import numpy as np

from ggnn_tpu.benchmark import build_parser, main
from ggnn_tpu.dataset import store_fvecs


def test_parser_defaults():
    args = build_parser().parse_args(["--base", "x.fvecs"])
    assert args.k_build == 24
    assert args.tau_build == 0.5
    assert args.refinement_iterations == 2
    assert args.k_query == 10
    assert args.max_iterations == 200
    assert args.measure == "euclidean"
    assert not args.grid_search


def test_end_to_end_fvecs(tmp_path, rng):
    base = rng.random((512, 32), dtype=np.float32)
    query = rng.random((64, 32), dtype=np.float32)
    store_fvecs(tmp_path / "base.fvecs", base)
    store_fvecs(tmp_path / "query.fvecs", query)

    rc = main(
        [
            "--base", str(tmp_path / "base.fvecs"),
            "--query", str(tmp_path / "query.fvecs"),
            "--gt", str(tmp_path / "gt.ivecs"),
            "--graph_dir", str(tmp_path / "graph"),
            "--k_build", "8",
            "--k_query", "4",
            "--max_iterations", "64",
        ]
    )
    assert rc == 0
    # graph and ground truth were stored for reuse
    assert (tmp_path / "graph" / "part_0.npz").exists()
    assert (tmp_path / "gt.ivecs").exists()

    # second invocation takes the load path
    rc = main(
        [
            "--base", str(tmp_path / "base.fvecs"),
            "--query", str(tmp_path / "query.fvecs"),
            "--gt", str(tmp_path / "gt.ivecs"),
            "--graph_dir", str(tmp_path / "graph"),
            "--k_build", "8",
            "--k_query", "4",
            "--max_iterations", "64",
        ]
    )
    assert rc == 0
