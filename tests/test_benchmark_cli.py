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


def test_sift1m_example_on_stub_data(tmp_path, rng):
    """The SIFT1M example must run verbatim against a drop-in directory with
    the TEXMEX file names (real-dataset runs are blocked: the environment
    has no network egress -- recorded in BASELINE.md). Deterministic stub
    data stands in for the download."""
    import subprocess
    import sys
    from pathlib import Path

    from ggnn_tpu.dataset import store_ivecs

    n, nq, d = 2048, 64, 32
    base = rng.random((n, d), dtype=np.float32)
    query = rng.random((nq, d), dtype=np.float32)
    sift = tmp_path / "sift"
    sift.mkdir()
    store_fvecs(sift / "sift_base.fvecs", base)
    store_fvecs(sift / "sift_query.fvecs", query)
    d2 = ((query[:, None] - base[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :100].astype(np.int32)
    store_ivecs(sift / "sift_groundtruth.ivecs", gt)

    import os

    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(repo)] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    out = subprocess.run(
        [sys.executable, str(repo / "examples" / "sift1m_fvecs.py"), str(sift)],
        capture_output=True, text=True, timeout=540, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "tau_query=0.34" in out.stdout
