"""Per-superstep checkpointing with per-shard lineage and atomic
manifests (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"; the reference has no mid-run checkpoint — its only
durable state is the rewritten ``.attr`` file, fog_engine.cpp:245-261).

Layout::

    <ckpt_dir>/
      iter=000007/
        shard-00000.parquet   # vid-range shard: vid + state cols + frontier
        ...
        manifest.json         # written LAST, via tmp-file + os.replace
      LATEST                  # atomic pointer to the newest complete iter

A checkpoint is complete iff its manifest exists and every shard listed
matches its recorded row count and sha256. Shards are vid ranges, so a
restarted job (or a different partition count) can reload them
independently — the "resumable output" contract.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _params_key(program: str, params: dict) -> str:
    return hashlib.sha256(
        json.dumps({"program": program, "params": params}, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def write_checkpoint(
    ckpt_dir: str,
    iteration: int,
    program: str,
    params: dict,
    state: dict[str, np.ndarray],
    frontier: np.ndarray | None,
    metrics: list[dict],
    *,
    shards: int = 8,
) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    n = len(next(iter(state.values())))
    final = os.path.join(ckpt_dir, f"iter={iteration:06d}")
    tmp = final + f".tmp-{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    bounds = np.linspace(0, n, shards + 1).astype(np.int64)
    shard_meta = []
    for i in range(shards):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        cols: dict = {"vid": np.arange(lo, hi, dtype=np.int64)}
        for k, v in state.items():
            cols[k] = v[lo:hi]
        if frontier is not None:
            cols["active"] = frontier[lo:hi]
        path = os.path.join(tmp, f"shard-{i:05d}.parquet")
        pq.write_table(pa.table(cols), path)
        with open(path, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        shard_meta.append(
            {"file": os.path.basename(path), "vid_lo": lo, "vid_hi": hi,
             "rows": hi - lo, "sha256": digest}
        )
    manifest = {
        "iteration": iteration,
        "program": program,
        "params_key": _params_key(program, params),
        "num_vertices": n,
        "state_fields": sorted(state.keys()),
        "has_frontier": frontier is not None,
        "frontier_count": int(frontier.sum()) if frontier is not None else None,
        "shards": shard_meta,
        "metrics": metrics,
    }
    mtmp = os.path.join(tmp, "manifest.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, os.path.join(tmp, "manifest.json"))
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    ltmp = os.path.join(ckpt_dir, f".LATEST.tmp-{os.getpid()}")
    with open(ltmp, "w") as f:
        f.write(os.path.basename(final))
    os.replace(ltmp, os.path.join(ckpt_dir, "LATEST"))
    return final


def _is_complete(path: str) -> bool:
    mpath = os.path.join(path, "manifest.json")
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            manifest = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    for s in manifest["shards"]:
        fp = os.path.join(path, s["file"])
        if not os.path.exists(fp):
            return False
    return True


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Newest complete checkpoint dir, preferring the LATEST pointer and
    falling back to a scan (covers a crash between dir and pointer)."""
    if not os.path.isdir(ckpt_dir):
        return None
    pointer = os.path.join(ckpt_dir, "LATEST")
    if os.path.exists(pointer):
        with open(pointer) as f:
            cand = os.path.join(ckpt_dir, f.read().strip())
        if _is_complete(cand):
            return cand
    iters = sorted(
        (d for d in os.listdir(ckpt_dir) if d.startswith("iter=") and ".tmp" not in d),
        reverse=True,
    )
    for d in iters:
        cand = os.path.join(ckpt_dir, d)
        if _is_complete(cand):
            return cand
    return None


def load_checkpoint(path: str, program: str, params: dict):
    """Validate shard lineage (row counts + sha256) and reassemble
    (state, frontier, iteration, metrics)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["params_key"] != _params_key(program, params):
        raise ValueError(
            f"checkpoint at {path} was written by a different program/params "
            f"({manifest['program']})"
        )
    n = manifest["num_vertices"]
    state = {k: None for k in manifest["state_fields"]}
    frontier = np.zeros(n, dtype=bool) if manifest["has_frontier"] else None
    arrays: dict[str, np.ndarray] = {}
    for s in manifest["shards"]:
        fp = os.path.join(path, s["file"])
        with open(fp, "rb") as f:
            if hashlib.sha256(f.read()).hexdigest() != s["sha256"]:
                raise ValueError(f"checkpoint shard corrupt: {fp}")
        t = pq.read_table(fp)
        if len(t) != s["rows"]:
            raise ValueError(f"checkpoint shard row mismatch: {fp}")
        lo, hi = s["vid_lo"], s["vid_hi"]
        for k in state:
            col = t.column(k).to_numpy(zero_copy_only=False)
            if k not in arrays:
                arrays[k] = np.empty(n, dtype=col.dtype)
            arrays[k][lo:hi] = col
        if frontier is not None:
            frontier[lo:hi] = t.column("active").to_numpy(zero_copy_only=False)
    return arrays, frontier, manifest["iteration"], manifest["metrics"]
