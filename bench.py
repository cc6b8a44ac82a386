"""Benchmark harness (driver-run per round; see BASELINE.md protocol).

Default mode: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, ...}

``--scaling``: run the identical PageRank job twice in FRESH processes at
num_cpus=8 and num_cpus=32 (the sandbox stand-in for N- and 4N-node
clusters per BASELINE.md) and report both throughputs + the scaling
efficiency ``thr(4N) / (4 * thr(N))``.

``--worker K``: internal — one fresh-process PageRank run at K CPUs,
prints its own JSON line (used by --scaling via subprocess).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )


def _pagerank_throughput(sf_dir: str, num_cpus: int) -> dict:
    """Derive the co-occurrence edge table (untimed), then time a 10-iter
    FOG-semantics PageRank; throughput = edges * iters / wall_s."""
    from fogray import algorithms as alg
    from fogray import queries as q
    from fogray.config import EngineConfig
    from fogray.engine import GraphEngine

    edges = q.cooccurrence_edges(sf_dir)
    src = edges.column("src").to_numpy(zero_copy_only=False)
    dst = edges.column("dst").to_numpy(zero_copy_only=False)
    w = edges.column("weight").to_numpy(zero_copy_only=False)
    n = int(max(src.max(), dst.max())) + 1
    eng = GraphEngine(
        n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=num_cpus)
    )
    try:
        t0 = time.perf_counter()
        res = alg.pagerank(eng, niters=10)
        wall = time.perf_counter() - t0
    finally:
        eng.shutdown()
    return {
        "num_vertices": n,
        "num_edges": int(eng.num_edges),
        "iters": res.supersteps,
        "wall_s": round(wall, 4),
        "edges_per_sec_per_iter": round(eng.num_edges * res.supersteps / wall, 1),
    }


def run_suite(sf_dir: str, num_cpus: int, names: list[str] | None = None) -> dict:
    _init_ray(num_cpus)
    import __ray_entry__ as entry

    qs = entry.queries()
    # headline suite: the derive stage + every iterative graph pipeline +
    # the training-data ops; skip per-query failures rather than dying.
    default = [
        "derive_edges",
        "pagerank",
        "connected_components",
        "label_propagation",
        "bfs",
        "sssp_tree",
        "spmv",
        "triangle_count",
        "scc",
        "repo_pagerank",
        "dd_exact",
        "dd_minhash_lsh",
        "dd_simhash",
        "dd_ngram_jaccard",
        "dd_embed_cosine",
        "ann_topk",
        "ann_ivf",
        "txt_stats",
        "txt_langid",
        "txt_fingerprint",
        "mm_features",
    ]
    names = names or [k for k in default if k in qs]
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            res = qs[name](sf_dir)
            # force execution for lazy results
            if hasattr(res, "to_pandas") and not hasattr(res, "column_names"):
                res = res.to_pandas()
            timings[name] = round(time.perf_counter() - t0, 4)
            print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)
        except Exception as e:  # pragma: no cover - bench resilience
            errors[name] = f"{type(e).__name__}: {e}"
            print(f"[bench] {name}: FAILED {e}", file=sys.stderr, flush=True)
    pr = _pagerank_throughput(sf_dir, num_cpus)
    out = {
        "metric": "headline_suite_e2e",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        "pagerank": pr,
    }
    if errors:
        out["errors"] = errors
    return out


def run_worker(sf_dir: str, num_cpus: int) -> dict:
    _init_ray(num_cpus)
    pr = _pagerank_throughput(sf_dir, num_cpus)
    return {
        "metric": "pagerank_edges_per_sec_per_iter",
        "value": pr["edges_per_sec_per_iter"],
        "unit": "edges/s/iter",
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        **pr,
    }


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Fresh-process runs at two parallelism levels (BASELINE.md)."""
    results = {}
    for k in (lo, hi):
        env = dict(os.environ)
        env["GRAFT_SF_DIR"] = sf_dir
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(k)],
            capture_output=True,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[k] = json.loads(line)
    thr_lo = results[lo]["edges_per_sec_per_iter"]
    thr_hi = results[hi]["edges_per_sec_per_iter"]
    eff = thr_hi / (thr_lo * (hi / lo))
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 4),
        "unit": "ratio",
        "sf": _sf_of(sf_dir),
        "num_cpus": hi,
        "lo_cpus": lo,
        "hi_cpus": hi,
        "throughput_lo": thr_lo,
        "throughput_hi": thr_hi,
        "queries": {f"pagerank@{lo}cpus": results[lo]["wall_s"],
                    f"pagerank@{hi}cpus": results[hi]["wall_s"]},
    }


def main(argv: list[str]) -> None:
    if "--worker" in argv:
        k = int(argv[argv.index("--worker") + 1])
        out = run_worker(SF_DIR, k)
    elif "--scaling" in argv:
        out = run_scaling(SF_DIR)
    else:
        out = run_suite(SF_DIR, NUM_CPUS)
    print(json.dumps(out))
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
