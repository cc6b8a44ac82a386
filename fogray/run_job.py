"""``ray job submit`` entry point — the cluster-run story required by
the north rule (FOG analog: the ``fog`` binary's CLI, fogsrc/main.cpp).

Usage (single node or against a cluster address):

    ray job submit --working-dir . -- \
        python -m fogray.run_job --algorithm pagerank \
            --repo-table /path/to/repos.parquet \
            --ckpt-dir /tmp/fogray_ckpt --output /tmp/fogray_out \
            --resume

    # or over a driver testdata graph:
    python -m fogray.run_job --algorithm cc --sf-dir /root/testdata/sf0.01

The script OWNS the Ray session (guarded init — under ``ray job submit``
the cluster is already initialized). Results are written as partitioned
Parquet (one file per vid-range shard) so a re-run can skip or overwrite
deterministically; per-superstep checkpoints + manifests land under
--ckpt-dir and --resume continues from the newest complete one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _build_engine(args):
    import ray.data as rd

    from fogray import derive, tables
    from fogray.util import read_parquet_clean
    from fogray.config import EngineConfig
    from fogray.engine import GraphEngine
    from fogray import queries as q

    from fogray.dist_engine import DistGraphEngine

    cfg = EngineConfig(num_partitions=args.num_partitions)
    engine_cls = DistGraphEngine if args.engine == "dist" else GraphEngine
    if args.repo_table or args.synthetic_repos:
        if args.repo_table:
            src = read_parquet_clean(args.repo_table)
        else:
            src = rd.from_arrow(
                tables.make_repo_table(
                    args.synthetic_repos * args.files_per_repo,
                    args.synthetic_repos,
                    seed=42,
                )
            )
        out = derive.derive_edges(src)
        edges_ds = out["edges"].materialize()
        n = out["num_vertices"]
    else:
        edges_ds, n = q.cooccurrence_edges_ds(args.sf_dir)
    # the dataset= constructor path: sorted edge BLOCKS go object-store
    # -> pinned actor; the driver never concatenates the edge table
    # (the streaming-converter analog, convert/process_in_edge.cpp:142-209)
    return engine_cls(n, dataset=edges_ds, cfg=cfg), n


def _write_result(state: dict, n: int, out_dir: str, shards: int,
                  run_meta: dict) -> None:
    """Partitioned parquet: one file per vid-range shard (resumable /
    parallel-readable output, never one giant file), plus a
    ``_MANIFEST.json`` with per-partition lineage (vid range, rows,
    sha256 per shard — the same shape as the checkpoint manifests,
    fogray/checkpoint.py) and the run metrics, written LAST via atomic
    rename so a reader never sees output without its manifest."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    bounds = np.linspace(0, n, shards + 1).astype(np.int64)
    shard_meta = []
    for i in range(shards):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        cols = {"vid": np.arange(lo, hi, dtype=np.int64)}
        # sorted: state-dict iteration order differs between a fresh
        # run and a checkpoint-resumed one — output bytes must not
        for k, v in sorted(state.items()):
            cols[k] = v[lo:hi]
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(pa.table(cols), path)
        with open(path, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        shard_meta.append(
            {"file": os.path.basename(path), "vid_lo": lo, "vid_hi": hi,
             "rows": hi - lo, "sha256": digest}
        )
    mtmp = os.path.join(out_dir, f"_MANIFEST.json.tmp-{os.getpid()}")
    with open(mtmp, "w") as f:
        json.dump({**run_meta, "state_fields": sorted(state.keys()),
                   "shards": shard_meta}, f, indent=1)
    os.replace(mtmp, os.path.join(out_dir, "_MANIFEST.json"))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="fogray graph job")
    p.add_argument("--algorithm", required=True,
                   choices=["pagerank", "ppr", "kcore", "cc", "label_propagation",
                            "bfs", "sssp", "scc", "spmv"])
    src_group = p.add_mutually_exclusive_group(required=True)
    src_group.add_argument("--repo-table", help="parquet path of the (repo,path,commit,lang,content) table")
    src_group.add_argument("--synthetic-repos", type=int, help="derive from a deterministic synthetic repo table with this many repos")
    src_group.add_argument("--sf-dir", help="driver testdata dir (part co-occurrence graph)")
    p.add_argument("--files-per-repo", type=int, default=16)
    p.add_argument("--niters", type=int, default=10)
    p.add_argument("--source", type=int, default=0, help="bfs/sssp/ppr source vid")
    p.add_argument("--k", type=int, default=2, help="kcore threshold")
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument(
        "--engine",
        choices=["broadcast", "dist"],
        default="broadcast",
        help="broadcast: driver-held state, broadcast per superstep "
        "(fogray.engine — fastest when state << edges); dist: vertex "
        "state range-sharded across actors, actor-to-actor exchange "
        "(fogray.dist_engine — the multi-node scale path)",
    )
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--output", default=None)
    p.add_argument("--output-shards", type=int, default=8)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True)

    from fogray import algorithms as alg
    from fogray.triangles import triangle_count

    t0 = time.perf_counter()
    eng, n = _build_engine(args)
    try:
        run = {
            "pagerank": lambda: alg.pagerank(eng, niters=args.niters,
                                             ckpt_dir=args.ckpt_dir, resume=args.resume),
            "ppr": lambda: alg.ppr(eng, source=args.source, niters=args.niters,
                                   ckpt_dir=args.ckpt_dir, resume=args.resume),
            "kcore": lambda: alg.kcore(eng, k=args.k),
            "cc": lambda: alg.connected_components(eng, ckpt_dir=args.ckpt_dir, resume=args.resume),
            "label_propagation": lambda: alg.label_propagation(eng, ckpt_dir=args.ckpt_dir, resume=args.resume),
            "bfs": lambda: alg.bfs(eng, root=args.source, ckpt_dir=args.ckpt_dir, resume=args.resume),
            "sssp": lambda: alg.sssp(eng, source=args.source, ckpt_dir=args.ckpt_dir, resume=args.resume),
            "scc": lambda: alg.scc(eng, ckpt_dir=args.ckpt_dir, resume=args.resume),
            "spmv": lambda: alg.spmv(eng, ckpt_dir=args.ckpt_dir, resume=args.resume),
        }[args.algorithm]
        res = run()
    finally:
        eng.shutdown()

    wall = time.perf_counter() - t0
    summary = {
        "algorithm": args.algorithm,
        "engine": args.engine,
        "input": args.repo_table or args.sf_dir
        or f"synthetic:{args.synthetic_repos}x{args.files_per_repo}",
        "num_vertices": n,
        "num_edges": res.num_edges,
        "supersteps": res.supersteps,
        "wall_s": round(wall, 3),
        "edges_per_sec_per_iter": round(res.edges_per_sec_per_iter, 1),
        "output": args.output,
        "checkpoints": args.ckpt_dir,
    }
    if args.output:
        _write_result(res.state, n, args.output, args.output_shards, summary)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
