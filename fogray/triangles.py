"""Triangle counting — absent from the reference (TODO.list:17-20),
defined in SURVEY.md section 2.4 and built Ray-Data-first:

1. collapse to the undirected simple graph: (min,max) normalize, drop
   self-loops, ONE groupby dedup;
2. degree-order orientation (low (deg, vid) -> high) so every wedge is
   enumerated exactly once at its lowest-rank apex and out-degrees are
   O(sqrt(E)) — the standard bound that keeps wedge volume ~E^1.5;
   degrees are a broadcast O(V) array (ray.put), not a shuffle join;
3. wedge generation per apex group (vectorized meshgrid), unioned with
   the oriented edges, then ONE groupby over (x, y) counts wedge/edge
   coincidences: sum(wedges) x exists(edge) summed = triangle count —
   the closure join expressed as a single aggregate, no pairwise join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum


def _normalize(batch: pa.Table) -> pa.Table:
    s = batch.column("src").to_numpy(zero_copy_only=False)
    d = batch.column("dst").to_numpy(zero_copy_only=False)
    m = s != d
    s, d = s[m], d[m]
    return pa.table({"a": np.minimum(s, d), "b": np.maximum(s, d)})


def triangle_count(edges, n: int) -> int:
    """``edges``: Dataset with src/dst columns, or (src, dst) arrays."""
    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = rd.from_arrow(
            pa.table({"src": np.asarray(src, dtype=np.int64),
                      "dst": np.asarray(dst, dtype=np.int64)})
        )
    simple = (
        edges.map_batches(_normalize, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="cnt"))
        .select_columns(["a", "b"])
    )

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

    oriented = simple.map_batches(orient, batch_format="pyarrow")

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        dg = ray.get(deg_ref)
        ys = g["y"].to_numpy()
        k = len(ys)
        if k < 2:
            z = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"x": z, "y": z, "w": z, "e": z})
        order = np.lexsort((ys, dg[ys]))
        ys = ys[order]
        i, j = np.triu_indices(k, 1)
        return pd.DataFrame(
            {"x": ys[i], "y": ys[j],
             "w": np.ones(len(i), dtype=np.int64),
             "e": np.zeros(len(i), dtype=np.int64)}
        )

    wedge_ds = oriented.groupby("x").map_groups(wedges, batch_format="pandas").map_batches(
        lambda t: t, batch_format="pyarrow"  # unify block type for the union
    )
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
