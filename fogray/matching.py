"""Distributed greedy maximal matching over an edge Dataset.

The mutual-minimum (Hoepman 2004 / Luby-style) maximal matching: every
round, each unmatched vertex proposes to its minimum incident live edge
under the strict key (hash, a, b); an edge whose BOTH endpoints propose
it joins the matching and its endpoints leave the graph. The globally
minimum live edge is always mutual, so every round makes progress;
expected O(log E) rounds. The hash is the deterministic splitmix edge
weight (fogray.sources.det_weight), so the matching is a pure function
of the edge set — exactness oracle is the pure-python round replica in
tests/test_metrics.py (iterative, not SQL-expressible).

Scale shape: the msf.py/coloring.py broadcast-superstep pattern — edge
blocks pinned once, per-round raw tasks receive the O(V) alive mask,
emit per-vertex min-proposal partials (lexsort + first-per-group,
bounded by distinct endpoints per block), and the driver folds O(V)
argmin state; edges never collect on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .util import from_arrow_chunked

_PROP_SCHEMA = pa.schema(
    [
        ("v", pa.int64()),
        ("h", pa.float64()),
        ("a", pa.int64()),
        ("b", pa.int64()),
    ]
)


def _proposals(t: pa.Table, alive_ref) -> pa.Table:
    """Per-vertex minimum live incident edge under (h, a, b), both
    endpoints proposing; pre-combined per block."""
    if t.num_rows == 0:
        return _PROP_SCHEMA.empty_table()
    alive = ray.get(alive_ref) if isinstance(alive_ref, ray.ObjectRef) else alive_ref
    from .sources import det_weight

    u = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    v = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    m = alive[u] & alive[v]
    if not m.any():
        return _PROP_SCHEMA.empty_table()
    u, v = u[m], v[m]
    a = np.minimum(u, v)
    b = np.maximum(u, v)
    h = det_weight(a.astype(np.uint64), b.astype(np.uint64))
    vv = np.r_[a, b]
    hh = np.r_[h, h]
    aa = np.r_[a, a]
    bb = np.r_[b, b]
    order = np.lexsort((bb, aa, hh, vv))
    vv, hh, aa, bb = vv[order], hh[order], aa[order], bb[order]
    first = np.r_[True, vv[1:] != vv[:-1]]
    return pa.table(
        {"v": vv[first], "h": hh[first], "a": aa[first], "b": bb[first]},
        schema=_PROP_SCHEMA,
    )


def greedy_matching(edges, n: int) -> pa.Table:
    """Maximal matching of the undirected graph given as a SYMMETRIC
    directed edge Dataset (columns src, dst; self-loops ignored).

    -> (a, b) matched pairs, canonical a < b, sorted by (a, b).
    """
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

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(s < d))

    edges = (
        edges.select_columns(["src", "dst"])
        .map_batches(canon, batch_format="pyarrow")
        .materialize()
    )
    block_refs = edges.to_arrow_refs()
    prop_task = ray.remote(_proposals)
    alive = np.ones(n, dtype=bool)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    while True:
        alive_ref = ray.put(alive)
        tabs = [
            t
            for t in ray.get(
                [prop_task.remote(r, alive_ref) for r in block_refs]
            )
            if t.num_rows > 0 and t.num_columns > 0
        ]
        if not tabs:
            break
        part = pa.concat_tables(tabs)
        vv = part.column("v").to_numpy(zero_copy_only=False)
        hh = part.column("h").to_numpy(zero_copy_only=False)
        aa = part.column("a").to_numpy(zero_copy_only=False)
        bb = part.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, aa, hh, vv))
        vv, aa, bb = vv[order], aa[order], bb[order]
        first = np.r_[True, vv[1:] != vv[:-1]]
        vv, aa, bb = vv[first], aa[first], bb[first]
        # pick[v] encoded as fused key of its chosen edge
        pick = np.full(n, -1, dtype=np.int64)
        pick[vv] = aa * np.int64(n) + bb
        key = aa * np.int64(n) + bb
        mutual = (pick[aa] == key) & (pick[bb] == key) & (vv == aa)
        if not mutual.any():  # cannot happen (global min edge is mutual)
            break
        ma, mb = aa[mutual], bb[mutual]
        out_a.append(ma)
        out_b.append(mb)
        alive[ma] = False
        alive[mb] = False
    if not out_a:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    order = np.lexsort((b, a))
    return pa.table(
        {"a": pa.array(a[order].astype(np.int64)), "b": pa.array(b[order].astype(np.int64))}
    )
