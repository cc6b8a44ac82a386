"""Jones-Plassmann parallel greedy coloring over an edge Dataset.

The classic distributed graph-coloring algorithm (Jones & Plassmann
1993): vertices carry a random-but-deterministic priority; each round,
every uncolored vertex that beats ALL its uncolored neighbors'
priorities colors itself with the smallest color its already-colored
neighbors don't use (greedy mex). Expected O(log n / log log n) rounds;
palette ≤ maxdeg + 1. Priorities here are the rank of the splitmix-
style vertex hash (a deterministic permutation — all priorities
distinct, so winner selection needs no tie rule and the output is a
pure function of the edge set).

Scale shape (the broadcast-state pattern shared with fogray/msf.py):
edges stream as Dataset blocks and never collect; each round ships the
O(V) (color, priority) state once via ``ray.put``; blocks emit two
pre-combined partials — per-vertex max uncolored-neighbor priority
(sort + reduceat, O(block) rows out bounded by distinct sources), and
distinct (winner, neighbor-color) pairs — and the driver folds O(V)
maxima plus the winners' mex. Not SQL-expressible (data-dependent
round count), so the exactness oracle is the pure-python round replica
in tests/test_metrics.py; the driver records the rows-only check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .util import from_arrow_chunked

_NEG = np.int64(-1)

_UNION_SCHEMA = pa.schema(
    [("v", pa.int64()), ("kind", pa.int8()), ("val", pa.int64())]
)


def _block_partials(t: pa.Table, state_ref) -> pa.Table:
    """kind 0 rows: per-source max priority among UNCOLORED neighbors;
    kind 1 rows: distinct (uncolored source, colored-neighbor color)
    pairs — the mex input, emitted every round (winners are decided on
    the driver after folding kind-0, so pair rows for non-winners are
    dropped there; they are pre-deduped per block to stay bounded)."""
    if t.num_rows == 0:
        return _UNION_SCHEMA.empty_table()
    # as a raw-task arg Ray auto-dereferences the ref before the call
    state = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
    color, prio = state
    u = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    v = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    live_u = color[u] == _NEG
    if not live_u.any():
        return _UNION_SCHEMA.empty_table()
    u, v = u[live_u], v[live_u]
    nbr_live = color[v] == _NEG
    out_v, out_k, out_val = [], [], []
    uu, vv = u[nbr_live], v[nbr_live]
    if len(uu):
        o = np.argsort(uu, kind="stable")
        uu_s = uu[o]
        pv = prio[vv[o]]
        starts = np.flatnonzero(np.r_[True, uu_s[1:] != uu_s[:-1]])
        mx = np.maximum.reduceat(pv, starts)
        out_v.append(uu_s[starts])
        out_k.append(np.zeros(len(starts), dtype=np.int8))
        out_val.append(mx)
    uc, vc = u[~nbr_live], v[~nbr_live]
    if len(uc):
        key = uc * np.int64(len(color)) + color[vc]
        uk = np.unique(key)
        out_v.append((uk // len(color)).astype(np.int64))
        out_k.append(np.ones(len(uk), dtype=np.int8))
        out_val.append((uk % len(color)).astype(np.int64))
    if not out_v:
        return _UNION_SCHEMA.empty_table()
    return pa.table(
        {
            "v": np.concatenate(out_v),
            "kind": np.concatenate(out_k),
            "val": np.concatenate(out_val),
        },
        schema=_UNION_SCHEMA,
    )


def _mex_fold(gv: np.ndarray, gc: np.ndarray, n: int) -> np.ndarray:
    """O(n) array of per-group mex (smallest non-negative integer absent
    from the group's DISTINCT sorted colors); groups with no rows get 0.
    Fully vectorized: within each sorted group, the mex is the first
    position where color != its in-group rank, else the group size."""
    mex = np.zeros(n, dtype=np.int64)
    if len(gv):
        order = np.lexsort((gc, gv))
        gv, gc = gv[order], gc[order]
        # blocks pre-dedupe pairs only locally — drop cross-block
        # duplicates, or the color==rank scan undercounts the mex
        keep = np.r_[True, (gv[1:] != gv[:-1]) | (gc[1:] != gc[:-1])]
        gv, gc = gv[keep], gc[keep]
        starts = np.flatnonzero(np.r_[True, gv[1:] != gv[:-1]])
        ends = np.r_[starts[1:], len(gv)]
        rank = np.arange(len(gv), dtype=np.int64) - np.repeat(
            starts, ends - starts
        )
        big = np.int64(1) << 60
        cand = np.where(gc != rank, rank, big)
        first_miss = np.minimum.reduceat(cand, starts)
        mex[gv[starts]] = np.minimum(first_miss, ends - starts)
    return mex


def jones_plassmann(edges, n: int) -> pa.Table:
    """Color the undirected graph given as a SYMMETRIC directed edge
    Dataset (columns src, dst). -> (vid, color) for every vertex that
    appears in the edge set, sorted by vid; deterministic (priority =
    rank of the splitmix-style hash of vid)."""
    from .sources import det_weight

    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table(
                {
                    "src": np.asarray(src, dtype=np.int64),
                    "dst": np.asarray(dst, dtype=np.int64),
                }
            )
        )
    edges = edges.select_columns(["src", "dst"]).materialize()

    # touched vertices (O(V) driver state, one pre-deduped pass)
    def uniq_block(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"v": np.unique(np.r_[s, d]).astype(np.int64)})

    tabs = [
        t
        for t in ray.get(
            edges.map_batches(uniq_block, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not tabs:
        return pa.table(
            {"vid": pa.array([], pa.int64()), "color": pa.array([], pa.int64())}
        )
    touched = np.unique(
        np.concatenate([t.column("v").to_numpy(zero_copy_only=False) for t in tabs])
    )
    # deterministic distinct priorities: rank of the splitmix hash
    h = det_weight(touched.astype(np.uint64), np.zeros(len(touched), dtype=np.uint64))
    prio_full = np.full(n, -1, dtype=np.int64)
    prio_full[touched] = np.argsort(np.argsort(h, kind="stable"), kind="stable")
    color = np.full(n, -1, dtype=np.int64)
    off_graph = np.ones(n, dtype=bool)
    off_graph[touched] = False
    color[off_graph] = -2  # never considered

    # superstep loop over PINNED block refs with raw tasks (the
    # dist_engine pattern): re-running a Dataset pipeline per round pays
    # ~0.2s executor startup each; tasks on the already-materialized
    # refs pay only dispatch
    block_refs = edges.to_arrow_refs()
    partial_task = ray.remote(_block_partials)
    while True:
        live = np.flatnonzero(color == _NEG)
        if len(live) == 0:
            break
        state_ref = ray.put((color, prio_full))
        tabs = [
            t
            for t in ray.get(
                [partial_task.remote(r, state_ref) for r in block_refs]
            )
            if t.num_rows and t.num_columns
        ]
        if tabs:
            part = pa.concat_tables(tabs)
            pv = part.column("v").to_numpy(zero_copy_only=False)
            pk = part.column("kind").to_numpy(zero_copy_only=False)
            pval = part.column("val").to_numpy(zero_copy_only=False)
        else:
            pv = np.array([], dtype=np.int64)
            pk = np.array([], dtype=np.int8)
            pval = np.array([], dtype=np.int64)
        # fold kind-0: max uncolored-neighbor priority per live vertex
        maxnbr = np.full(n, -1, dtype=np.int64)
        m0 = pk == 0
        if m0.any():
            np.maximum.at(maxnbr, pv[m0], pval[m0])
        winners = live[prio_full[live] > maxnbr[live]]
        if len(winners) == 0:  # cannot happen (global max always wins)
            break
        win_mask = np.zeros(n, dtype=bool)
        win_mask[winners] = True
        m1 = (pk == 1) & win_mask[pv]
        mex = _mex_fold(pv[m1], pval[m1], n)
        color[winners] = mex[winners]
    return pa.table(
        {
            "vid": pa.array(touched.astype(np.int64)),
            "color": pa.array(color[touched].astype(np.int64)),
        }
    )
