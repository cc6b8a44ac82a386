"""Borůvka minimum spanning forest over a weighted edge Dataset.

The reference engine's algorithm set stops at scatter-gather
propagation (application/*.hpp); MSF is the classic next capability a
link-graph engine needs (clustering backbones, hierarchy extraction).
Borůvka (1926) is THE distributed-friendly MSF algorithm: every round
each component picks its minimum incident cross edge, picked edges
join the forest, components contract, and the component count at least
halves — ≤ ⌈log2 V⌉ rounds.

Determinism: edges are totally ordered by the lexicographic key
(weight, a, b) over canonical endpoints a = min(u,v) < b = max(u,v).
A strict total order makes the MSF UNIQUE, so Borůvka here and Kruskal
in the test oracle must produce the identical edge set (the exactness
discipline the SQL oracles provide elsewhere; MSF is not
SQL-expressible, so the oracle lives in pytest).

Scale shape (the broadcast-engine pattern, fogray/engine.py): edges
stream as Dataset blocks and NEVER collect on the driver; each round
broadcasts the O(V) component labels once (``ray.put``), every block
emits per-component minimum-candidate partials (vectorized lexsort +
first-per-group, ≤ 2·|components-in-block| rows), and the driver folds
only those partials plus the O(V) hook/pointer-jump label update —
per-round driver work is O(V + Σ partials), independent of E.
Weights ride as integer-valued doubles (the co-occurrence counts), so
float comparison is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .util import from_arrow_chunked

_CAND_SCHEMA = pa.schema(
    [
        ("comp", pa.int64()),
        ("w", pa.float64()),
        ("a", pa.int64()),
        ("b", pa.int64()),
    ]
)


def _min_candidates(t: pa.Table, comp_ref) -> pa.Table:
    """Per-component minimum cross-edge candidates for one edge block:
    each cross edge is a candidate for BOTH endpoint components; keep
    the lexicographically (w, a, b)-first candidate per component."""
    if t.num_rows == 0:
        return _CAND_SCHEMA.empty_table()
    # as a raw-task arg Ray auto-dereferences the ref before the call
    comp = ray.get(comp_ref) if isinstance(comp_ref, ray.ObjectRef) else comp_ref
    u = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    v = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
    cu, cv = comp[u], comp[v]
    m = cu != cv
    if not m.any():
        return _CAND_SCHEMA.empty_table()
    u, v, w, cu, cv = u[m], v[m], w[m], cu[m], cv[m]
    a = np.minimum(u, v)
    b = np.maximum(u, v)
    cc = np.r_[cu, cv]
    ww = np.r_[w, w]
    aa = np.r_[a, a]
    bb = np.r_[b, b]
    order = np.lexsort((bb, aa, ww, cc))
    cc, ww, aa, bb = cc[order], ww[order], aa[order], bb[order]
    first = np.r_[True, cc[1:] != cc[:-1]]
    return pa.table(
        {"comp": cc[first], "w": ww[first], "a": aa[first], "b": bb[first]},
        schema=_CAND_SCHEMA,
    )


def boruvka_msf(edges, n: int) -> pa.Table:
    """Minimum spanning forest of an undirected weighted graph given as
    a SYMMETRIC directed edge Dataset (columns src, dst, weight; both
    orientations present, as the co-occurrence derivation emits).

    -> (a, b, weight) — the unique MSF under the strict (weight, a, b)
    order, canonical a < b, sorted by (a, b).
    """
    if not isinstance(edges, rd.Dataset):
        src, dst, w = edges
        edges = from_arrow_chunked(
            pa.table(
                {
                    "src": np.asarray(src, dtype=np.int64),
                    "dst": np.asarray(dst, dtype=np.int64),
                    "weight": np.asarray(w, dtype=np.float64),
                }
            )
        )
    # one canonical direction: the symmetric input carries each
    # undirected edge twice with equal weight (vectorized block filter,
    # never a per-row predicate)
    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(s < d))

    edges = (
        edges.select_columns(["src", "dst", "weight"])
        .map_batches(canon, batch_format="pyarrow")
        .materialize()
    )
    comp = np.arange(n, dtype=np.int64)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_w: list[np.ndarray] = []
    # superstep loop over PINNED block refs with raw tasks (the
    # dist_engine / coloring pattern): a fresh Dataset pipeline per
    # round pays ~0.2s executor startup each
    block_refs = edges.to_arrow_refs()
    cand_task = ray.remote(_min_candidates)
    max_rounds = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    for _ in range(max_rounds):
        comp_ref = ray.put(comp)
        tabs = [
            t
            for t in ray.get(
                [cand_task.remote(r, comp_ref) for r in block_refs]
            )
            # Ray emits zero-COLUMN blocks for empty inputs — drop them
            if t.num_rows > 0 and t.num_columns > 0
        ]
        cand = pa.concat_tables(tabs) if tabs else _CAND_SCHEMA.empty_table()
        if cand.num_rows == 0:
            break
        cc = cand.column("comp").to_numpy(zero_copy_only=False)
        ww = cand.column("w").to_numpy(zero_copy_only=False)
        aa = cand.column("a").to_numpy(zero_copy_only=False)
        bb = cand.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, aa, ww, cc))
        cc, ww, aa, bb = cc[order], ww[order], aa[order], bb[order]
        first = np.r_[True, cc[1:] != cc[:-1]]
        cc, ww, aa, bb = cc[first], ww[first], aa[first], bb[first]
        # dedup edges picked by both endpoint components
        key = aa * np.int64(n) + bb
        _, uidx = np.unique(key, return_index=True)
        out_a.append(aa[uidx])
        out_b.append(bb[uidx])
        out_w.append(ww[uidx])
        # hook: each picking component points at the other endpoint's
        # component; 2-cycles (mutual picks of the same edge) break by
        # keeping the pointer FROM the larger comp id (the smaller
        # becomes the root), the standard tie rule
        other = np.where(comp[aa] == cc, comp[bb], comp[aa])
        # parent lives in COMPONENT-ID space (roots are vertex ids that
        # label their component); inactive components stay their own root
        parent = np.arange(n, dtype=np.int64)
        parent[cc] = other
        mutual = parent[parent[cc]] == cc
        keep_root = cc[mutual & (cc < parent[cc])]
        parent[keep_root] = keep_root
        # pointer jumping to roots (O(log) doublings)
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        comp = parent[comp]
    if not out_a:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "weight": pa.array([], pa.float64()),
            }
        )
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    w = np.concatenate(out_w)
    order = np.lexsort((b, a))
    return pa.table(
        {
            "a": pa.array(a[order].astype(np.int64)),
            "b": pa.array(b[order].astype(np.int64)),
            "weight": pa.array(w[order], pa.float64()),
        }
    )
