"""Time-respecting (temporal) earliest-arrival reachability — the
temporal-graph operator class: edges carry an availability time and a
path may only traverse edges in non-decreasing time order.

Earliest arrival has optimal substructure under min-label correction
(a smaller arrival at u can only enable MORE outgoing edges), so the
fixpoint of

    arrival[v] = min over edges (u, v, t) with t >= arrival[u] of t

is the exact earliest-arrival function — computed here as the same
frontier-limited broadcast superstep as fogray/incremental.py: edge
blocks pinned once, each round ships the O(V) (arrival, frontier) pair
via ``ray.put``, blocks emit per-dst minimum feasible-time partials
for frontier srcs, the driver folds O(V) minima, and only vertices
whose arrival improved scatter next round.

The SQL oracle explores (vertex, arrival-via-some-path) pairs with a
recursive UNION CTE (``e.t >= r.t`` gates time-respecting extension;
UNION dedups exact pairs so smaller-time rediscoveries still expand)
and takes MIN per vertex — exact, no unroll bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .util import from_arrow_chunked

_INF = np.int64(1) << 62

_CAND_SCHEMA = pa.schema([("v", pa.int64()), ("t", pa.int64())])


def _arrival_partials(tab: pa.Table, state_ref) -> pa.Table:
    """Per-dst minimum feasible edge time from frontier srcs: edge
    (u, v, t) is feasible when arrival[u] <= t, useful when t improves
    arrival[v]; pre-combined per block (lexsort + first-per-group)."""
    if tab.num_rows == 0 or tab.num_columns == 0:
        return _CAND_SCHEMA.empty_table()
    arrival, frontier = (
        ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
    )
    s = tab.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    d = tab.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    t = tab.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
    m = frontier[s] & (arrival[s] <= t) & (t < arrival[d])
    if not m.any():
        return _CAND_SCHEMA.empty_table()
    d, t = d[m], t[m]
    order = np.lexsort((t, d))
    d, t = d[order], t[order]
    first = np.r_[True, d[1:] != d[:-1]]
    return pa.table({"v": d[first], "t": t[first]}, schema=_CAND_SCHEMA)


def temporal_earliest_arrival(edges, n: int, source: int):
    """Earliest-arrival times over the temporal edge Dataset (columns
    src, dst, t — int64 availability time). The source is available at
    time -1 (before every edge).

    -> (arrival[n] int64 with _INF for unreached, reached_ids)
    """
    if not isinstance(edges, rd.Dataset):
        src, dst, tt = edges
        edges = from_arrow_chunked(
            pa.table(
                {
                    "src": np.asarray(src, dtype=np.int64),
                    "dst": np.asarray(dst, dtype=np.int64),
                    "t": np.asarray(tt, dtype=np.int64),
                }
            )
        )
    edges = edges.select_columns(["src", "dst", "t"]).materialize()
    block_refs = edges.to_arrow_refs()
    task = ray.remote(_arrival_partials)
    arrival = np.full(n, _INF, dtype=np.int64)
    arrival[source] = -1
    frontier = np.zeros(n, dtype=bool)
    frontier[source] = True
    while frontier.any():
        state_ref = ray.put((arrival, frontier))
        tabs = [
            t
            for t in ray.get([task.remote(r, state_ref) for r in block_refs])
            if t.num_rows > 0 and t.num_columns > 0
        ]
        frontier = np.zeros(n, dtype=bool)
        if not tabs:
            break
        part = pa.concat_tables(tabs)
        v = part.column("v").to_numpy(zero_copy_only=False)
        tt = part.column("t").to_numpy(zero_copy_only=False)
        cand = np.full(n, _INF, dtype=np.int64)
        np.minimum.at(cand, v, tt)
        improved = cand < arrival
        if improved.any():
            arrival[improved] = cand[improved]
            frontier = improved
    return arrival, np.flatnonzero(arrival < _INF)
