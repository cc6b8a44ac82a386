"""Triangle counting — absent from the reference (TODO.list:17-20),
defined in SURVEY.md section 2.4 and built Ray-Data-first:

1. collapse to the undirected simple graph: (min,max) normalize, drop
   self-loops, ONE groupby dedup;
2. degree-order orientation (low (deg, vid) -> high) so every wedge is
   enumerated exactly once at its lowest-rank apex and out-degrees are
   O(sqrt(E)) — the standard bound that keeps wedge volume ~E^1.5;
   degrees are a broadcast O(V) array (ray.put), not a shuffle join;
3. wedge generation = hash self-join of the oriented edges on the apex
   (vectorized all-to-all), unioned with the oriented edges, then ONE
   groupby over (x, y) counts wedge/edge coincidences: sum(wedges) x
   exists(edge) summed = triangle count — the closure expressed as a
   single aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from .derive import _join_parts, empty_guard, safe_inner_join
from .util import from_arrow_chunked


def _normalize(batch: pa.Table) -> pa.Table:
    s = batch.column("src").to_numpy(zero_copy_only=False)
    d = batch.column("dst").to_numpy(zero_copy_only=False)
    m = s != d
    s, d = s[m], d[m]
    return pa.table({"a": np.minimum(s, d), "b": np.maximum(s, d)})


def triangle_count(edges, n: int, closure: str = "auto") -> int:
    """``edges``: Dataset with src/dst columns, or (src, dst) arrays.

    ``closure`` selects how wedge-closure is checked:

    - ``"broadcast"``: the oriented edge set is broadcast once as a
      sorted int64 key array (x*(n+1)+y; 8 bytes/edge) and every wedge
      batch does a vectorized searchsorted membership test, reducing to
      a single per-batch count — NO post-join shuffle at all.
    - ``"shuffle"``: union wedges with edges and close via one (x, y)
      groupby — the all-to-all formulation for graphs whose edge set
      exceeds single-node memory (> ~100M edges).
    - ``"auto"``: broadcast below 50M edges, shuffle above.
    """
    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table({"src": np.asarray(src, dtype=np.int64),
                      "dst": np.asarray(dst, dtype=np.int64)})
        )
    # materialized: degrees, orientation and the edge-flag union all read
    # it — without this the dedup groupby re-executes once per consumer
    simple = (
        edges.map_batches(_normalize, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="cnt"))
        .select_columns(["a", "b"])
        .materialize()
    )
    if simple.count() == 0:
        return 0  # edgeless / self-loops only (empty aggregates also
        # come back 0-column, so nothing downstream could read them)

    # degrees on the simple graph: per-batch partials -> one small groupby
    def degree_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate(
            [t.column("a").to_numpy(zero_copy_only=False),
             t.column("b").to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": u, "c": c})

    deg_rows = (
        simple.map_batches(degree_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="deg"))
        .to_pandas()
    )
    deg = np.zeros(n, dtype=np.int64)
    deg[deg_rows["v"].to_numpy()] = deg_rows["deg"].to_numpy()
    deg_ref = ray.put(deg)

    def orient(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        # rank(v) = (deg[v], v); orient low -> high
        a_first = (dg[a] < dg[b]) | ((dg[a] == dg[b]) & (a < b))
        return pa.table(
            {"x": np.where(a_first, a, b), "y": np.where(a_first, b, a)}
        )

    oriented = simple.map_batches(orient, batch_format="pyarrow").materialize()

    # wedge enumeration = hash self-join of the oriented edges on the
    # apex (one all-to-all, vectorized; a per-apex map_groups would be a
    # Python call per vertex). Keep each unordered leg pair once, ordered
    # by the same (deg, vid) rank as the orientation, so the closing edge
    # — if it exists — appears in `oriented` with exactly that key.
    left = oriented.map_batches(
        lambda t: t.rename_columns(["apex", "y1"]), batch_format="pyarrow"
    )
    right = oriented.map_batches(
        lambda t: t.rename_columns(["apex", "y2"]), batch_format="pyarrow"
    )
    num_edges = oriented.count()
    if closure == "auto":
        closure = "broadcast" if num_edges <= 50_000_000 else "shuffle"

    if closure == "broadcast":
        # The whole oriented edge set fits on a node, so skip the wedge
        # JOIN entirely: broadcast a rank-relabelled CSR + the sorted
        # edge-key array ONCE, then a map over apex ranges enumerates
        # each apex's ordered neighbor pairs (vectorized meshgrid per
        # apex — tens of microseconds each) and membership-tests the
        # closing edge with one searchsorted per batch. No all-to-all
        # after the dedup groupby.
        tabs = [t for t in ray.get(oriented.to_arrow_refs()) if t.num_rows]
        if not tabs:
            return 0
        x = np.concatenate([t.column("x").to_numpy(zero_copy_only=False) for t in tabs])
        y = np.concatenate([t.column("y").to_numpy(zero_copy_only=False) for t in tabs])
        # relabel by orientation rank (deg, vid) so each adjacency list
        # is ascending in rank and every wedge's closing edge key is
        # (lower_rank, higher_rank)
        order = np.lexsort((np.arange(n), deg))
        rank_of = np.empty(n, dtype=np.int64)
        rank_of[order] = np.arange(n, dtype=np.int64)
        rx, ry = rank_of[x], rank_of[y]
        s = np.lexsort((ry, rx))
        rx, ry = rx[s], ry[s]
        offsets = np.searchsorted(rx, np.arange(n + 1, dtype=np.int64))
        keys = rx * np.int64(n) + ry  # sorted ascending by construction
        csr_ref = ray.put((offsets, ry, keys))

        def count_range(t: pa.Table) -> pa.Table:
            offs, nbrs, ek = ray.get(csr_ref)
            total = 0
            wk_parts = []
            for v in t.column("id").to_numpy(zero_copy_only=False):
                lst = nbrs[offs[v] : offs[v + 1]]
                k = len(lst)
                if k < 2:
                    continue
                i, j = np.triu_indices(k, 1)
                wk_parts.append(lst[i] * np.int64(n) + lst[j])
            if not wk_parts:
                return pa.table({"tri": np.array([0], dtype=np.int64)})
            wk = np.concatenate(wk_parts)
            pos = np.searchsorted(ek, wk)
            pos[pos >= len(ek)] = len(ek) - 1
            total = int((ek[pos] == wk).sum())
            return pa.table({"tri": np.array([total], dtype=np.int64)})

        counted = rd.range(n).map_batches(count_range, batch_format="pyarrow")
        return int(counted.sum("tri") or 0)

    # shuffle closure: union wedges with flagged edges, close via groupby
    def rank_filter(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        y1 = t.column("y1").to_numpy(zero_copy_only=False)
        y2 = t.column("y2").to_numpy(zero_copy_only=False)
        keep = (dg[y1] < dg[y2]) | ((dg[y1] == dg[y2]) & (y1 < y2))
        k = int(keep.sum())
        return pa.table(
            {
                "x": y1[keep],
                "y": y2[keep],
                "w": np.ones(k, dtype=np.int64),
                "e": np.zeros(k, dtype=np.int64),
            }
        )

    wedge_schema = pa.schema(
        [("x", pa.int64()), ("y", pa.int64()), ("w", pa.int64()), ("e", pa.int64())]
    )
    wedge_ds = safe_inner_join(
        left, right, on=("apex",), num_partitions=_join_parts(16)
    ).map_batches(empty_guard(rank_filter, wedge_schema), batch_format="pyarrow")
    edge_flag = oriented.map_batches(
        lambda t: t.append_column("w", pa.array(np.zeros(len(t), dtype=np.int64)))
        .append_column("e", pa.array(np.ones(len(t), dtype=np.int64))),
        batch_format="pyarrow",
    )
    closed = (
        wedge_ds.union(edge_flag)
        .groupby(["x", "y"])
        .aggregate(Sum("w", alias_name="nw"), Max("e", alias_name="ne"))
        .map_batches(
            lambda t: pa.table(
                {"tri": t.column("nw").to_numpy(zero_copy_only=False)
                 * t.column("ne").to_numpy(zero_copy_only=False)}
            ),
            batch_format="pyarrow",
        )
    )
    total = closed.sum("tri")
    return int(total or 0)
