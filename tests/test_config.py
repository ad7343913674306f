"""GraphConfig derivation goldens (reference: graph_config.cpp:39-106)."""

import pytest

from ggnn_tpu.config import DistanceMeasure, GraphConfig


def test_sift1m_style_golden():
    """SURVEY.md section 7 golden: N=10k, KBuild=24."""
    cfg = GraphConfig.create(N=10_000, D=128, KBuild=24)
    assert cfg.KF == 12
    assert cfg.S == 32
    assert cfg.G == 7
    assert cfg.S0 == 29
    assert cfg.S0_off == 10_000 - 7**3 * 29  # 53
    assert cfg.S0_off == 53
    assert cfg.SG == 4  # 32 // 7
    assert cfg.SG_off == 32 - 4 * 7  # 4
    assert cfg.Ns == (10_000, 7 * 7 * 32, 7 * 32, 32)
    assert cfg.Bs == (343, 49, 7, 1)
    assert cfg.Ns_offsets == (0, 10_000, 10_000 + 1568, 10_000 + 1568 + 224)
    assert cfg.STs_offsets == (0, 0, 1568, 1568 + 224)
    assert cfg.N_all == 10_000 + 1568 + 224 + 32
    assert cfg.ST_all == 1568 + 224 + 32


def test_sift1m_full():
    cfg = GraphConfig.create(N=1_000_000, D=128, KBuild=24)
    assert cfg.KF == 12 and cfg.S == 32
    # growth = (1e6/32)^(1/3) = 31.5 -> floor 31 vs ceil 32
    assert cfg.G in (31, 32)
    # base-layer segments cover all of N
    assert cfg.G ** 3 * cfg.S0 + cfg.S0_off == 1_000_000
    assert cfg.S0 >= cfg.KBuild


def test_segment_cover_exact():
    """Segments partition each layer exactly."""
    for n, kb in [(1024, 12), (10_000, 24), (4096, 20), (100_000, 40)]:
        cfg = GraphConfig.create(N=n, D=64, KBuild=kb)
        # layer 0: S0_off segments of S0+1, rest S0
        total0 = cfg.S0_off * (cfg.S0 + 1) + (cfg.Bs[0] - cfg.S0_off) * cfg.S0
        assert total0 == n
        # selection counts per upper segment sum to S
        contrib = sum(
            cfg.SG + (nth < cfg.SG_off) for nth in range(cfg.G)
        )
        assert contrib == cfg.S


def test_beam_geometry_matches_reference_sizes():
    cfg = GraphConfig.create(N=10_000, D=128, KBuild=24)
    # beam width = the reference SORTED region, ring = CACHE - SORTED
    assert cfg.merge_beam_geometry() == (64, 192)  # SORTED 64, CACHE 256
    assert cfg.sym_beam_geometry() == (64, 64)  # SORTED 64, CACHE 128
    assert GraphConfig.query_beam_geometry(10, 200) == (64, 192)
    # large KQuery grows the width via required_sorted
    assert GraphConfig.query_beam_geometry(100, 200)[0] == 128  # next32(100+17)
    # large max_iterations grows the ring via cache = bit_ceil(max_iters)
    w, v = GraphConfig.query_beam_geometry(10, 2000)
    assert w + v == 2048
    cfg512 = GraphConfig.create(N=100_000, D=128, KBuild=512)
    assert cfg512.merge_beam_geometry()[0] == 544  # next32(512+1+16)


def test_bounds_validation():
    with pytest.raises(ValueError):
        GraphConfig.create(N=1000, D=5000, KBuild=24)
    with pytest.raises(ValueError):
        GraphConfig.create(N=1000, D=128, KBuild=1)
    with pytest.raises(ValueError):
        GraphConfig.create(N=1000, D=128, KBuild=600)


def test_distance_measure_parse():
    assert DistanceMeasure.parse("euclidean") == DistanceMeasure.Euclidean
    assert DistanceMeasure.parse("Cosine") == DistanceMeasure.Cosine
    assert DistanceMeasure.parse(0) == DistanceMeasure.Euclidean
    assert DistanceMeasure.parse(DistanceMeasure.Cosine) == DistanceMeasure.Cosine
