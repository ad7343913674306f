#!/usr/bin/env python
"""GGNN-TPU headline benchmark.

Builds a GGNN search graph over a synthetic SIFT-like dataset (clustered
uint8-range vectors, D=128 -- the shape of the reference's headline SIFT1M
benchmark, examples/cpp-and-cuda/ggnn_benchmark.cpp:37-50), sweeps tau_query
to find the operating point with C@1 >= 0.9 (the reference's tau=0.34 anchor,
BASELINE.md), and reports query throughput there.

Prints ONE JSON line:
  {"metric": "qps_c1_90", "value": <QPS>, "unit": "queries/s",
   "vs_baseline": <QPS / 500000>}

Baseline assumption: the reference paper (arXiv 1912.01059) reports roughly
5e5 queries/s on SIFT1M at ~90% C@1 with max_iterations=200 on a consumer
GPU; the in-repo reference publishes recall anchors only (BASELINE.json
"published": {}), so 500k QPS is used as the GPU-parity denominator.

The headline N is 1,000,000 -- the SAME dataset size as the baseline's
SIFT1M figure (VERDICT r4 weak #1: a 262k QPS over a 1M denominator
overstated parity ~1.5x). Smaller-N results recorded by earlier runs are
surfaced in the detail as secondaries, never as the headline.

Environment knobs: GGNN_BENCH_N (base size, default 1,000,000),
GGNN_BENCH_NQ (queries, default 50000),
GGNN_BENCH_CACHE=<dir> (store the built graph there / reload it on rerun --
lets hour-long large-N runs survive TPU-relay crashes; the reported build
time on a cache hit is the one recorded at store time).
"""

import json
import os
import sys
import time

import numpy as np

import jax

# persistent compilation cache: repeat runs (tau sweeps, driver re-runs) skip
# the ~20-40s XLA compiles entirely
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GGNN_JAX_CACHE", os.path.expanduser("~/.cache/ggnn_tpu_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ggnn_tpu import GGNN, Evaluator, set_log_level

BASELINE_QPS = 500_000.0

# Bump whenever the construction path changes materially: the cached graph's
# recorded build time would otherwise go stale (round-2 shipped a 680 s
# number recorded before the shape-stable sym + quantized-descent landed).
# A version mismatch forces a fresh build so the reported build_s always
# reflects the current code.
BUILD_PATH_VERSION = 6  # 6 = start-grouped sym phase-ii filter
#     (build/sym.py _bulk_filter_grouped: one expansion gather per start);
#     5 = dense-seed own-id dedup + real-rows-only sym filter;
#     4 = dense-seed merges (build/merge.py dense_seed)
DATASET_SEED = 0


def make_dataset(n, nq, d=128, d_latent=24, seed=0):
    """SIFT-like synthetic vectors: uint8-range, low intrinsic dimension.

    Real descriptor datasets live near a low-dimensional manifold and form ONE
    connected kNN component. High-dimensional Gaussian-mixture clusters do
    not (distance concentration makes every true kNN edge intra-cluster once
    clusters hold more than KBuild points, so no graph-ANN method --
    including the reference -- can reach clusters holding no start point).
    Sampling a ``d_latent``-dim Gaussian latent through a random linear map
    gives a connected continuum with realistic ANN difficulty.
    """
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(d_latent, d)).astype(np.float32) / np.sqrt(d_latent)
    def sample(m):
        z = rng.normal(size=(m, d_latent)).astype(np.float32)
        x = z @ w * 40.0 + 128.0 + rng.normal(0, 4, size=(m, d)).astype(np.float32)
        return np.clip(x, 0, 255).astype(np.float32)
    return sample(n), sample(nq)


def _run_config(g, evaluator, query_dev, nq, k_query, tau_query, iters, qkw,
                best, pops_per_iter=8):
    """Warm + time one (tau, iters) sweep point; fold into ``best``.

    Two warmups (the relay's first dispatches after a build are slow), then
    a pipelined throughput measurement with reference-parity timing: M
    batches issued back-to-back with results left DEVICE-RESIDENT, fenced
    by one 1-element D2H after the last batch (programs execute in
    dispatch order, so the fence covers all of them). This is exactly the
    reference's cudaEvent span -- start/stop straddle the query kernel
    alone and d_results stays on the GPU (gpu_instance.cu:688-712); the
    result copy to host happens after the stop event, untimed. Including
    the relay's result round trip instead would measure the tunnel: its
    D2H runs at ~15-25 MB/s with a ~40 ms floor (scratch/pipeline_floor.py:
    a 10k-query call is pinned at ~93 ms even at iters=8, where device
    compute is ~5 ms)."""
    from ggnn_tpu.utils.timing import hard_sync

    reps = 5
    # qt=32 (use_pallas=32: 128 DMA blocks in flight) measured +1.4% at
    # P<=5 but would cost the driver run ~6 fresh 30-250 s remote compiles
    # (the warm program set was built at the qt=8 default) -- kept at the
    # default; flip to use_pallas=32 once its programs are cached
    qkw = dict(qkw, pops_per_iter=pops_per_iter)
    g.set_return_results_on_device(True)
    try:
        for _ in range(2):
            # warm up the SAME program variant the timed loop runs (the
            # device-resident result path compiles separately from the
            # packed-D2H one)
            out = g.query(query_dev, k_query, tau_query, iters, **qkw)
            hard_sync(out.ids)
        t0 = time.perf_counter()
        futs = [
            g.query_async(query_dev, k_query, tau_query, iters, **qkw)
            for _ in range(reps)
        ]
        outs = [f.result() for f in futs]  # device arrays (no host copy)
        hard_sync(outs[-1].ids)  # fences every dispatched program
        elapsed = (time.perf_counter() - t0) / reps
        ids = np.asarray(outs[-1].ids)  # untimed, like the reference
    finally:
        g.set_return_results_on_device(False)
    ev = evaluator.evaluate_results(ids)
    qps = nq / elapsed
    print(
        f"# tau={tau_query} iters={iters} P={pops_per_iter}: c@1={ev.c1:.4f} "
        f"c@10={ev.cKQuery:.4f} qps={qps:,.0f}",
        file=sys.stderr,
    )
    if ev.c1 >= 0.90 and (best is None or qps > best["qps"]):
        best = {"tau": tau_query, "iters": iters, "P": pops_per_iter,
                "qps": qps, "c1": ev.c1, "c10": ev.cKQuery}
    return best


def main():
    n = int(os.environ.get("GGNN_BENCH_N", 1_000_000))
    if os.environ.get("GGNN_BENCH_FULL"):
        n = 1_000_000  # kept for compatibility (now the default)
    # 50k queries per dispatched program: the per-dispatch relay floor
    # (~2.6 ms) and the padded tail chunk are pure overhead at 10k batches
    # (+20-25% QPS at 50k, scratch/bigbatch_262k.py). Distinct queries with
    # real brute-force GT -- a bigger batch, not replication; the reference
    # measures its own 10k batch the same way (kernel-span cudaEvents).
    nq = int(os.environ.get("GGNN_BENCH_NQ", 50_000))
    k_query = 10
    # Graph degree 48 (reference envelope [20,96], docs/source/ann.rst:16-53):
    # the adjacency fetch is DMA-descriptor-bound on TPU (~44 ns/descriptor,
    # ops/adjacency_pallas.py), so doubling the per-fetch block from 3 KB to
    # 6 KB is nearly free while doubling candidates per pop -- measured at
    # 262k: c@1 0.946 @ 232k QPS (iters=32) vs k=24/group=2's 0.919 @ 154k
    # (iters=48). The reference picks k=24 for GPU shared-memory sizing; the
    # TPU engine has no such constraint (scratch/kbuild_ab_262k.py).
    k_build = int(os.environ.get("GGNN_BENCH_K", 48))
    tau_build = 0.5
    max_iterations = 400

    # group=1 with k=48: one node's true 48-NN per fetch beats group=2's
    # paired 2x24 lists at equal bytes (recall per pop is the whole game)
    group = int(os.environ.get("GGNN_BENCH_GROUP", 1))
    set_log_level(int(os.environ.get("GGNN_BENCH_VERBOSE", 0)))
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    # optional profiler capture (the TPU analog of the reference's
    # -lineinfo/-Xptxas builds for nsight): GGNN_PROFILE_DIR=/tmp/trace
    profile_dir = os.environ.get("GGNN_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    base, query = make_dataset(n, nq, seed=DATASET_SEED)

    g = GGNN()
    g.set_base(base)

    # default to a repo-local per-N graph cache: driver re-runs of this
    # script reuse the stored graph + GT (the recorded build time is the one
    # measured when the graph was actually built), which keeps the headline
    # measurement about the engine rather than relay/compile luck.
    # GGNN_BENCH_CACHE= (empty) disables caching.
    # the 1M case keeps its documented historical directory name
    cache_name = ".bench_graph_1m" if n == 1_000_000 else f".bench_graph_{n}"
    cache_dir = os.environ.get(
        "GGNN_BENCH_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), cache_name),
    ) or None
    meta_path = os.path.join(cache_dir, "bench_meta.json") if cache_dir else None
    meta_now = {
        "n": n,
        "k_build": k_build,
        "tau_build": tau_build,
        "dataset_seed": DATASET_SEED,
        "build_version": BUILD_PATH_VERSION,
    }
    cached = None
    if meta_path and os.path.exists(meta_path):
        with open(meta_path) as f:
            cached = json.load(f)
        # ANY config/build-path mismatch means stale -- rebuild
        if any(cached.get(k) != v for k, v in meta_now.items()):
            cached = None
    if cached is not None:
        g.set_working_directory(cache_dir)
        g.load(k_build)
        g.build_fused_index(group=group)
        build_s = cached["build_s"]
        build_cold_s = cached.get("build_cold_s")
        print(f"# build: {build_s:.2f} s (cached from {cache_dir})", file=sys.stderr)
    else:
        t0 = time.perf_counter()
        try:
            g.build(k_build=k_build, tau_build=tau_build,
                    refinement_iterations=2)
        except Exception as e:  # sporadic relay crash: one retry after 60 s
            print(f"# build ERROR (retrying in 60 s): {e}", file=sys.stderr)
            time.sleep(60)
            g = GGNN()
            g.set_base(base)
            g.build(k_build=k_build, tau_build=tau_build,
                    refinement_iterations=2)
        build_cold_s = time.perf_counter() - t0
        print(f"# build (cold, jit compiles included): {build_cold_s:.2f} s "
              f"({build_cold_s * 1e6 / n:.2f} us/point)", file=sys.stderr)
        # The axon relay recompiles every program in a fresh process
        # (30-250 s each; the local persistent cache is not honored by the
        # remote-compile path), so a single cold wall mostly measures the
        # COMPILER. The reference pays zero JIT (AOT C++/CUDA); its logged
        # us/point (gpu_instance.cu:541-544) is compile-free. The warm
        # steady-state rebuild below is the apples-to-apples build time;
        # both numbers are printed and the warm one is recorded.
        # GGNN_BENCH_WARM_BUILD=0 skips the rebuild (records cold).
        build_s = build_cold_s
        if os.environ.get("GGNN_BENCH_WARM_BUILD", "1") != "0":
            g2 = GGNN()
            g2.set_base(base)
            t0 = time.perf_counter()
            g2.build(k_build=k_build, tau_build=tau_build,
                     refinement_iterations=2)
            build_s = time.perf_counter() - t0
            g = g2
            print(f"# build (warm steady state): {build_s:.2f} s "
                  f"({build_s * 1e6 / n:.2f} us/point)", file=sys.stderr)
        # quantized-adjacency layout for the query phase; grouped blocks
        # (graph-nearest members share one DMA descriptor) are the measured
        # recall-per-fetch lever
        g.build_fused_index(group=group)
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            g.set_working_directory(cache_dir)
            g.store()
            with open(meta_path, "w") as f:
                json.dump(dict(meta_now, build_s=build_s,
                               build_cold_s=build_cold_s), f)

    # GT depends on the query set size -- name it per nq so a changed
    # GGNN_BENCH_NQ can never silently reuse a mismatched ground truth
    gt_path = os.path.join(cache_dir, f"gt_{nq}.npy") if cache_dir else None
    if gt_path and cached is not None and os.path.exists(gt_path):
        gt_ids = np.load(gt_path)
        print("# brute force: cached", file=sys.stderr)
    else:
        gt_t0 = time.perf_counter()
        gt_ids, _ = g.bf_query(query, k_gt=max(100, k_query))
        print(f"# brute force: {time.perf_counter() - gt_t0:.2f} s", file=sys.stderr)
        if gt_path:
            np.save(gt_path, gt_ids)
    evaluator = Evaluator(base, query, gt_ids, k_query=k_query)

    # stage the queries on device once, outside the timed region -- the
    # reference's headline timing wraps the query kernel alone in cudaEvents
    # with d_query already GPU-resident (gpu_instance.cu:688-712); keeping the
    # per-call relay upload (~86 ms for 10k x 128 f32) in the timed loop would
    # measure the tunnel, not the engine. Dispatch + result D2H stay timed.
    query_dev = jax.device_put(query)

    # warmup + (tau, iteration-budget) sweep for the C@1 >= 0.9 operating
    # point, on the fused quantized-adjacency engine (ggnn_tpu/query/fused.py):
    # inline uint8 neighbor codes (one contiguous fetch per expanded anchor),
    # dense MXU rep seeding, exact f32 re-rank. Cheapest configs first; the
    # budget matters as much as tau (converged rows wait for stragglers in
    # the lock-step sweep, so a tight budget is nearly free recall-wise).
    # rerank=16 (vs the default 32) and approx_min_k seeding measured
    # recall-identical at k_query=10 and +25% QPS together (scratch/
    # fixed_cost_ab2.py: 144.0k vs 114.9k at the 262k headline point)
    # width=32 / cap=32 / num_seeds=8 each measured bit-identical recall
    # and a few % faster at BOTH 262k and 1M headline points (r5 knob grid
    # + 1M probe: c@1 unchanged to 4 decimals at it=28 and it=32)
    qkw = {"engine": "fused", "num_seeds": 8,
           "rerank": max(16, k_query + 6), "width": 32, "cap": 32}
    # (tau, pop budget, pops_per_iter), cheapest-first. P=5 merges the beam
    # after every 5 pops: at equal budget that buys ~2.5 recall points over
    # P=8 (more merge points -> better-informed pops) while the extra sorts
    # hide under the DMA-descriptor-bound fetch (scratch/step_pieces_262k.py,
    # scratch/bigbatch_262k.py -- 325k vs 266k QPS at c@1>=0.91, 262k).
    sweep = [
        (0.64, 20, 4), (0.64, 24, 4),
        (0.64, 28, 4), (0.64, 30, 5),
        (0.64, 30, 3), (0.64, 32, 4), (0.64, 35, 5),
        (0.64, 40, 5), (0.64, 48, 8),
        (0.41, 64, 8), (0.51, 64, 8),
        (0.41, 100, 8), (0.51, 100, 8), (0.64, 100, 8),
        (0.41, 200, 8), (0.64, 200, 8),
        (0.8, 200, 8), (1.0, 400, 8), (1.3, 400, 8),
    ]
    best = None
    for tau_query, iters, pops in sweep:
        iters = min(iters, max_iterations) if max_iterations else iters
        try:
            best = _run_config(
                g, evaluator, query_dev, nq, k_query, tau_query, iters, qkw,
                best, pops_per_iter=pops,
            )
        except Exception as e:  # relay crash mid-sweep: keep what we have
            print(f"# tau={tau_query} iters={iters}: ERROR {e}", file=sys.stderr)
            time.sleep(60)  # the relay usually recovers in ~60 s
            continue
        # the sweep is ordered cheapest-first; once a config qualifies, a
        # point with a much larger pop budget can only be slower. The +8
        # slack keeps near-budget neighbors in play: different P at nearly
        # equal budget can qualify with higher QPS (e.g. P=5/it=25 beats a
        # qualifying P=4/it=24 -- scratch/bigbatch_262k.py)
        if (
            best is not None
            and iters > best["iters"] + 8
            and not os.environ.get("GGNN_BENCH_CURVE")
        ):
            break  # GGNN_BENCH_CURVE=1 runs every point (anchor-curve tables)
    if best is None:
        best = {"tau": None, "iters": None, "qps": 0.0, "c1": 0.0, "c10": 0.0}

    # persist this run's best point next to the graph cache so future runs
    # at other N can surface it as a secondary (never as the headline)
    if meta_path and os.path.exists(meta_path) and best.get("tau") is not None:
        with open(meta_path) as f:
            meta_disk = json.load(f)
        meta_disk["last_result"] = {
            "qps": round(best["qps"], 1), "c1": round(best["c1"], 4),
            "tau": best["tau"], "iters": best["iters"], "P": best["P"],
        }
        with open(meta_path, "w") as f:
            json.dump(meta_disk, f)
    secondaries = {}
    for other_n in (262_144, 1_000_000):
        if other_n == n:
            continue
        other_dir = ".bench_graph_1m" if other_n == 1_000_000 else \
            f".bench_graph_{other_n}"
        other_meta = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), other_dir,
            "bench_meta.json")
        if os.path.exists(other_meta):
            with open(other_meta) as f:
                om = json.load(f)
            if om.get("last_result") and om.get("build_version") == \
                    BUILD_PATH_VERSION:
                secondaries[f"n{other_n}"] = om["last_result"]

    result = {
        "metric": "qps_c1_90",
        "value": round(best["qps"], 1),
        "unit": "queries/s",
        "vs_baseline": round(best["qps"] / BASELINE_QPS, 4),
        "detail": {
            "timing": "pipelined device compute, results device-resident, "
                      "1-elem D2H fence (reference cudaEvent parity, "
                      "gpu_instance.cu:688-712)",
            "N": n,
            "NQ": nq,
            "k_build": k_build,
            "tau_build": tau_build,
            "tau_query": best["tau"],
            "max_iterations": best.get("iters") or max_iterations,
            "pops_per_iter": best.get("P"),
            "group": group,
            "c1": round(best["c1"], 4),
            "c10": round(best["c10"], 4),
            "build_s": round(build_s, 2),
            "build_us_per_point": round(build_s * 1e6 / n, 2),
            # one-time jit compiles included (fresh process; see the warm
            # steady-state note at the build site)
            "build_cold_s": round(build_cold_s, 2) if build_cold_s else None,
            # earlier recorded operating points at OTHER dataset sizes
            # (same build path version), for context only
            **({"secondary": secondaries} if secondaries else {}),
        },
    }
    if profile_dir:
        jax.profiler.stop_trace()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
