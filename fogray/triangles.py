"""Triangle counting — absent from the reference (TODO.list:17-20),
defined in SURVEY.md section 2.4 and built Ray-Data-first:

1. collapse to the undirected simple graph: (min,max) normalize, drop
   self-loops, dedup via ONE sort + group-complete per-block unique
   (fogray.derive.key_grouped_block_map — a groupby-aggregate here costs
   3-5x more for the same exchange);
2. degree-order orientation (low (deg, vid) -> high) so every wedge is
   enumerated exactly once at its lowest-rank apex and oriented
   out-degrees are O(sqrt(E)) — the standard bound that keeps wedge
   volume ~E^1.5; degrees come from per-block partials combined on the
   driver (O(V) ints, no shuffle);
3. closure ``broadcast`` path: the rank-relabelled CSR + sorted edge-key
   array are broadcast once (ray.put); wedge enumeration and the
   closing-edge membership test are ONE vectorized pass per apex-range
   batch (expand_ranges over neighbor suffixes + searchsorted) — no
   all-to-all after the dedup, no per-apex Python loop;
4. closure ``shuffle`` path (edge set exceeds single-node memory):
   wedges via hash self-join on the apex, closed by one (x, y) groupby
   summing wedge x edge coincidences.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Sum

from .derive import _join_parts, empty_guard, key_grouped_block_map, safe_inner_join
from .engine import expand_ranges
from .util import from_arrow_chunked


def _apex_wedges(ids: np.ndarray, offs: np.ndarray, nb: np.ndarray):
    """Wedge enumeration for an ARBITRARY apex-rank id set: returns
    (apexes, firsts, seconds), one entry per wedge (first < second in
    CSR order under the apex). Derives every position from ``ids``
    itself — NO contiguity assumption: Ray Data may bundle
    non-adjacent `range` blocks into one map task under memory
    pressure, and the previous ``[ids[0], ids[-1]]`` span would then
    enumerate apexes the batch does not own (double-counting across
    tasks, the same executor-layout trap as the round-1 evt_sessions
    flake in derive.key_grouped_block_map)."""
    ids = ids.astype(np.int64, copy=False)
    sizes = offs[ids + 1] - offs[ids]
    pos = expand_ranges(offs[ids], offs[ids + 1])
    apex_per_pos = np.repeat(ids, sizes)
    end_per_pos = np.repeat(offs[ids + 1], sizes)
    wedge_n = end_per_pos - pos - 1
    firsts = np.repeat(nb[pos], wedge_n)
    apexes = np.repeat(apex_per_pos, wedge_n)
    seconds = nb[expand_ranges(pos + 1, end_per_pos)]
    return apexes, firsts, seconds


def _normalize(batch: pa.Table) -> pa.Table:
    s = batch.column("src").to_numpy(zero_copy_only=False)
    d = batch.column("dst").to_numpy(zero_copy_only=False)
    m = s != d
    s, d = s[m], d[m]
    return pa.table({"a": np.minimum(s, d), "b": np.maximum(s, d)})


def _dedup_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    a = t.column("a").to_numpy(zero_copy_only=False)
    b = t.column("b").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return pa.table({"a": a[first], "b": b[first]})


@ray.remote
def _degree_partial(t: pa.Table):
    v = np.concatenate(
        [t.column("a").to_numpy(zero_copy_only=False),
         t.column("b").to_numpy(zero_copy_only=False)]
    )
    u, c = np.unique(v, return_counts=True)
    return u, c


@ray.remote(num_returns=4)
def _rank_csr_build(n: int, *tabs):
    """Build the degree-rank-relabelled CSR + adjacency membership of
    the simple graph IN A WORKER from the deduped Dataset's blocks
    (Ray derefs the block refs straight from plasma): the edge set
    never touches the driver — the driver receives object REFS for the
    O(V+E) structures plus the O(V) degree/rank arrays it legitimately
    needs for output assembly. This is the broadcast regime's honest
    memory contract (the CSR must fit a NODE, not the driver); past it
    the callers switch to the Dataset-native shuffle paths."""
    tabs = [t for t in tabs if t.num_rows]
    if tabs:
        a = np.concatenate(
            [t.column("a").to_numpy(zero_copy_only=False) for t in tabs]
        )
        b = np.concatenate(
            [t.column("b").to_numpy(zero_copy_only=False) for t in tabs]
        )
    else:
        a = b = np.empty(0, dtype=np.int64)
    deg = (
        np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    ).astype(np.int64)
    order = np.lexsort((np.arange(n), deg))
    rank_of = np.empty(n, dtype=np.int64)
    rank_of[order] = np.arange(n, dtype=np.int64)
    ra, rb = rank_of[a], rank_of[b]
    keys = np.sort(np.minimum(ra, rb) * np.int64(n) + np.maximum(ra, rb))
    nbrs = keys % np.int64(n)
    offsets = np.searchsorted(keys, np.arange(n + 1, dtype=np.int64) * np.int64(n))
    if _use_bits(n):
        # dense bitset over the n^2 key space: O(1) probes, n^2/8 bytes
        member = np.zeros(((n * n) >> 3) + 1, dtype=np.uint8)
        np.bitwise_or.at(
            member, (keys >> 3).astype(np.int64), (1 << (keys & 7)).astype(np.uint8)
        )
    else:
        member = keys  # sorted key array, searchsorted probes
    return (offsets, nbrs), member, deg, order


def _use_bits(n: int) -> bool:
    """Membership = dense bitset (<= 256 MiB) or sorted key array —
    deterministic in n, so driver and build task agree without an RPC."""
    return n * n <= (1 << 31)


def triangle_count(edges, n: int, closure: str = "auto") -> int:
    """``edges``: Dataset with src/dst columns, or (src, dst) arrays.

    ``closure``: ``"broadcast"`` (edge set fits a node: zero post-dedup
    shuffles), ``"shuffle"`` (all-to-all wedge join for > ~100M edges),
    or ``"auto"``."""
    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table({"src": np.asarray(src, dtype=np.int64),
                      "dst": np.asarray(dst, dtype=np.int64)})
        )
    normalized = edges.map_batches(_normalize, batch_format="pyarrow").materialize()
    if normalized.count() == 0:
        return 0
    simple = key_grouped_block_map(
        normalized.sort(["a", "b"]), ["a", "b"], _dedup_block
    ).materialize()

    refs = [r for r in simple.to_arrow_refs()]
    num_edges = simple.count()
    if closure == "auto":
        closure = "broadcast" if num_edges <= 50_000_000 else "shuffle"

    if closure == "shuffle":
        deg = np.zeros(n, dtype=np.int64)
        for u, c in ray.get([_degree_partial.remote(r) for r in refs]):
            np.add.at(deg, u, c)
        return _shuffle_closure_count(simple, deg)

    # broadcast closure: orient low (deg, vid) -> high and relabel by
    # that rank so each adjacency list is ascending and a wedge's
    # closing key is (lower_rank * n + higher_rank). The CSR build —
    # the only whole-edge-set concatenation — runs in a WORKER task
    # over the block refs; the driver holds only object refs.
    csr_ref, member_ref, _deg_ref, _order_ref = _rank_csr_build.remote(n, *refs)
    use_bits = _use_bits(n)

    def count_block(t: pa.Table) -> pa.Table:
        """All wedges whose apex rank falls in this batch, one
        vectorized pass: position p in the CSR emits pairs
        (nbrs[p], nbrs[p+1 .. end-of-apex])."""
        offs, nb = ray.get(csr_ref)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        _, firsts, seconds = _apex_wedges(ids, offs, nb)
        if len(firsts) == 0:
            return pa.table({"tri": np.array([0], dtype=np.int64)})
        nn = np.int64(len(offs) - 1)
        wk = firsts * nn + seconds
        m = ray.get(member_ref)
        if use_bits:
            hit = (m[(wk >> 3).astype(np.int64)] >> (wk & 7).astype(np.uint8)) & 1
            total = int(hit.sum())
        else:
            at = np.searchsorted(m, wk)
            at[at >= len(m)] = len(m) - 1
            total = int((m[at] == wk).sum())
        return pa.table({"tri": np.array([total], dtype=np.int64)})

    cpus = int(ray.cluster_resources().get("CPU", 8))
    bs = max(64, n // (cpus * 4))
    counted = rd.range(n).map_batches(
        count_block, batch_format="pyarrow", batch_size=bs
    )
    return int(counted.sum("tri") or 0)


def _simple_dedup_ds(edges, n: int):
    """Normalize + ONE sort + group-complete dedup to the undirected
    simple graph Dataset (a < b by vid), or None when empty."""
    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table({"src": np.asarray(src, dtype=np.int64),
                      "dst": np.asarray(dst, dtype=np.int64)})
        )
    normalized = edges.map_batches(_normalize, batch_format="pyarrow").materialize()
    if normalized.count() == 0:
        return None
    return key_grouped_block_map(
        normalized.sort(["a", "b"]), ["a", "b"], _dedup_block
    ).materialize()


def _simple_rank_csr(edges, n: int, simple: rd.Dataset | None = None):
    """Shared prep for the per-vertex / per-edge attribution paths:
    normalize + dedup to the undirected simple graph (a Dataset),
    degree-order ranks, and the rank-relabelled CSR + membership
    structure — BUILT IN A WORKER over the sorted Dataset's block refs
    (the driver never concatenates the edge set; it pulls only the
    O(V) degree/rank arrays). Returns
    (simple_ds, deg, order, rank_of, member_ref, csr_ref, use_bits)
    or None for an empty graph. Pass ``simple`` to reuse an
    already-deduped Dataset (skips the sort)."""
    if simple is None:
        simple = _simple_dedup_ds(edges, n)
    if simple is None:
        return None
    refs = [r for r in simple.to_arrow_refs()]
    csr_ref, member_ref, deg_ref, order_ref = _rank_csr_build.remote(n, *refs)
    deg, order = ray.get([deg_ref, order_ref])  # O(V) only
    rank_of = np.empty(n, dtype=np.int64)
    rank_of[order] = np.arange(n, dtype=np.int64)
    return simple, deg, order, rank_of, member_ref, csr_ref, _use_bits(n)


def triangle_per_vertex(
    edges, n: int, closure: str = "auto"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-vertex triangle counts + simple-graph degrees: each CLOSED
    wedge attributes one triangle to its apex and to both endpoints
    (every triangle is enumerated exactly once at its lowest-rank
    apex, so each vertex's count is exact). Returns ``(vids, tri,
    deg)`` for vertices with degree > 0.

    ``closure="broadcast"`` (default below ~50M edges): worker-built
    rank CSR in plasma, wedge enumeration + membership per apex-range
    batch, O(V) per-block count partials.
    ``closure="shuffle"``: the Dataset-native attribution —
    :func:`_closed_wedge_union` routes (wedge ∪ edge) rows through ONE
    (x, y) sort; group-complete blocks see every probe of an edge next
    to the edge itself, so closure needs NO broadcast membership at
    any scale. Both paths are exact and agree (pytest-asserted)."""
    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table({"src": np.asarray(src, dtype=np.int64),
                      "dst": np.asarray(dst, dtype=np.int64)})
        )
    e0 = np.empty(0, dtype=np.int64)
    if closure == "shuffle":
        simple = _simple_dedup_ds(edges, n)
        if simple is None:
            return e0, e0, e0
        deg = np.zeros(n, dtype=np.int64)
        for u, c in ray.get(
            [_degree_partial.remote(r) for r in simple.to_arrow_refs()]
        ):
            np.add.at(deg, u, c)

        def vertex_credits(t: pa.Table) -> pa.Table:
            """(x, y) group-complete block of wedge ∪ edge rows: every
            wedge row in a group that also holds its edge row is a
            triangle; credit apex + both endpoints, pre-aggregated."""
            x = t.column("x").to_numpy(zero_copy_only=False)
            y = t.column("y").to_numpy(zero_copy_only=False)
            ap = t.column("apex").to_numpy(zero_copy_only=False)
            if len(x) == 0:
                return pa.table(
                    {"v": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
                )
            o = np.lexsort((ap, y, x))
            x, y, ap = x[o], y[o], ap[o]
            starts = np.flatnonzero(np.r_[True, (x[1:] != x[:-1]) | (y[1:] != y[:-1])])
            sizes = np.diff(np.r_[starts, len(x)])
            # edge rows carry apex == -1 and sort FIRST within a group
            has_edge = ap[starts] == -1
            closed = np.repeat(has_edge, sizes) & (ap >= 0)
            ends = np.concatenate([ap[closed], x[closed], y[closed]])
            uv, cv = np.unique(ends, return_counts=True)
            return pa.table(
                {"v": uv.astype(np.int64), "c": cv.astype(np.int64)}
            )

        parts = _closed_wedge_union(simple, deg, vertex_credits)
        tri = np.zeros(n, dtype=np.int64)
        for tpart in ray.get(parts.materialize().to_arrow_refs()):
            if tpart.num_rows:
                np.add.at(
                    tri,
                    tpart.column("v").to_numpy(zero_copy_only=False),
                    tpart.column("c").to_numpy(zero_copy_only=False),
                )
        vids = np.flatnonzero(deg > 0).astype(np.int64)
        return vids, tri[vids], deg[vids]

    prep = _simple_rank_csr(edges, n)
    if prep is None:
        return e0, e0, e0
    _simple, deg, order, rank_of, member_ref, csr_ref, use_bits = prep

    def count_block(t: pa.Table) -> pa.Table:
        offs, nb = ray.get(csr_ref)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"rank": pa.array([], pa.int64()), "tri": pa.array([], pa.int64())}
        )
        apexes, firsts, seconds = _apex_wedges(ids, offs, nb)
        if len(firsts) == 0:
            return empty
        nn = np.int64(len(offs) - 1)
        wk = firsts * nn + seconds
        m = ray.get(member_ref)
        if use_bits:
            hit = ((m[(wk >> 3).astype(np.int64)] >> (wk & 7).astype(np.uint8)) & 1).astype(bool)
        else:
            at = np.searchsorted(m, wk)
            at[at >= len(m)] = len(m) - 1
            hit = m[at] == wk
        ends = np.concatenate([apexes[hit], firsts[hit], seconds[hit]])
        ur, cr = np.unique(ends, return_counts=True)
        return pa.table({"rank": ur, "tri": cr.astype(np.int64)})

    cpus = int(ray.cluster_resources().get("CPU", 8))
    bs = max(64, n // (cpus * 4))
    parts = pa.concat_tables(
        ray.get(
            rd.range(n)
            .map_batches(count_block, batch_format="pyarrow", batch_size=bs)
            .materialize()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    tri_by_rank = np.zeros(n, dtype=np.int64)
    if parts.num_rows:
        np.add.at(
            tri_by_rank,
            parts.column("rank").to_numpy(zero_copy_only=False),
            parts.column("tri").to_numpy(zero_copy_only=False),
        )
    tri = tri_by_rank[rank_of]  # rank space -> vid space
    vids = np.flatnonzero(deg > 0).astype(np.int64)
    return vids, tri[vids], deg[vids]


def _orient_by_rank(simple: rd.Dataset, deg_ref) -> rd.Dataset:
    """(a, b) -> (x, y) with x the (deg, vid)-lower endpoint: every
    wedge is then enumerated exactly once at its lowest-rank apex and
    oriented out-degrees are O(sqrt(E)). deg is the O(V) broadcast
    small side."""

    def orient(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        a_first = (dg[a] < dg[b]) | ((dg[a] == dg[b]) & (a < b))
        return pa.table(
            {"x": np.where(a_first, a, b).astype(np.int64),
             "y": np.where(a_first, b, a).astype(np.int64)}
        )

    return simple.map_batches(orient, batch_format="pyarrow")


def _closed_wedge_union(simple: rd.Dataset, deg: np.ndarray, block_fn) -> rd.Dataset:
    """The Dataset-native triangle closure (no broadcast membership,
    no driver edge arrays — the 100-TB shape):

    1. rank-orient the simple edges ((deg, vid)-low -> high);
    2. ONE sort by x groups each apex's out-list whole
       (group-complete); enumerate its wedges (y1, y2 rank-ascending)
       as rows (x=y1, y=y2, apex);
    3. union with the oriented edges tagged apex = -1 and ONE sort by
       (x, y): each group-complete block sees every wedge probe of an
       edge TOGETHER WITH the edge row itself, so ``block_fn`` decides
       closure locally and emits whatever attribution it needs.

    Exchange volume: E rows (step 2's sort) + wedges + E rows (step
    3's sort) — wedge volume is the standard sum of oriented
    out-degrees squared, O(E^1.5)."""
    deg_ref = ray.put(deg)
    oriented = _orient_by_rank(simple, deg_ref).materialize()

    def wedge_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()),
             "apex": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        dg = ray.get(deg_ref)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        # per apex, neighbors rank-ascending so wedge pairs come out
        # (lower rank, higher rank) — the orientation of their edge row
        o = np.lexsort((y, dg[y], x))
        x, y = x[o], y[o]
        starts = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        sizes = np.diff(np.r_[starts, len(x)])
        ends = np.repeat(starts + sizes, sizes)
        pos = np.arange(len(x), dtype=np.int64)
        wn = ends - pos - 1
        if int(wn.sum()) == 0:
            return empty
        firsts = np.repeat(y, wn)
        apexes = np.repeat(x, wn)
        seconds = y[expand_ranges(pos + 1, ends)]
        return pa.table(
            {"x": firsts, "y": seconds, "apex": apexes}
        )

    wedges = key_grouped_block_map(oriented.sort("x"), ["x"], wedge_block)
    tagged = oriented.map_batches(
        lambda t: t.append_column(
            "apex", pa.array(np.full(t.num_rows, -1, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    unioned = wedges.union(tagged)
    return key_grouped_block_map(unioned.sort(["x", "y"]), ["x", "y"], block_fn)



def _shuffle_closure_count(simple, deg) -> int:
    deg_ref = ray.put(deg)

    def orient(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        a_first = (dg[a] < dg[b]) | ((dg[a] == dg[b]) & (a < b))
        return pa.table(
            {"x": np.where(a_first, a, b), "y": np.where(a_first, b, a)}
        )

    oriented = simple.map_batches(orient, batch_format="pyarrow").materialize()
    left = oriented.map_batches(
        lambda t: t.rename_columns(["apex", "y1"]), batch_format="pyarrow"
    )
    right = oriented.map_batches(
        lambda t: t.rename_columns(["apex", "y2"]), batch_format="pyarrow"
    )

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


def _edge_support_block(t: pa.Table) -> pa.Table:
    """(a, b) group-complete block of credit-union-edge rows: sum the
    triangle credits per edge. Every group must contain EXACTLY ONE
    edge row (e == 1, c == 0) — a credit group without its edge means
    attribution produced a non-edge key, which fails LOUDLY here
    rather than mis-adding."""
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "common": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    a = t.column("a").to_numpy(zero_copy_only=False)
    b = t.column("b").to_numpy(zero_copy_only=False)
    c = t.column("c").to_numpy(zero_copy_only=False)
    e = t.column("e").to_numpy(zero_copy_only=False)
    o = np.lexsort((b, a))
    a, b, c, e = a[o], b[o], c[o], e[o]
    starts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    esum = np.add.reduceat(e, starts)
    if not (esum == 1).all():
        raise AssertionError("triangle attribution produced a non-edge key")
    csum = np.add.reduceat(c, starts)
    return pa.table(
        {"a": a[starts], "b": b[starts], "common": csum.astype(np.int64)}
    )


def _combine_edge_credits(simple: rd.Dataset, credits: rd.Dataset) -> rd.Dataset:
    """Union per-block (a, b, c) triangle credits with the simple edges
    at c=0 and resolve per-edge totals through ONE (a, b) sort +
    group-complete sum — the Dataset-native combine (no driver-side
    edge arrays)."""
    tagged_edges = simple.map_batches(
        lambda t: pa.table(
            {"a": t.column("a"), "b": t.column("b"),
             "c": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
             "e": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    )
    tagged_credits = credits.map_batches(
        lambda t: pa.table(
            {"a": t.column("a"), "b": t.column("b"), "c": t.column("c"),
             "e": pa.array(np.zeros(t.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    )
    unioned = tagged_credits.union(tagged_edges)
    return key_grouped_block_map(
        unioned.sort(["a", "b"]), ["a", "b"], _edge_support_block
    )


def triangle_per_edge_ds(edges, n: int, closure: str = "auto",
                         simple: "rd.Dataset | None" = None):
    """Per-EDGE common-neighbor (triangle) counts, Dataset-native:
    every closed wedge (apex < first < second in rank order)
    attributes one triangle to each of its THREE edges, so an edge's
    total is exactly |N(u) & N(v)|. Returns ``(support_ds, deg)``:
    a Dataset with columns (a, b, common) — the canonical simple
    edges (a < b by vid) with their counts — plus the O(V) per-vid
    simple-graph degree array; ``(None, zeros)`` for an empty graph.

    ``closure="broadcast"`` (default below ~50M edges): worker-built
    rank CSR + membership in plasma, wedge enumeration per apex-rank
    batch emitting pre-combined per-edge credits in vid space.
    ``closure="shuffle"``: :func:`_closed_wedge_union` — group-complete
    (x, y) blocks decide closure locally and credit all three edges;
    works at any scale with no broadcast membership. Both paths end in
    :func:`_combine_edge_credits` (ONE sort) and agree exactly
    (pytest-asserted). The SCAN structural-similarity / edge-Jaccard /
    k-truss input."""
    assert n < (1 << 31), "fused vid-pair key would overflow"
    nn_key = np.int64(n)

    def credits_to_vid_pairs(u: np.ndarray, v: np.ndarray) -> pa.Table:
        """Pre-combine raw per-triangle edge endpoints (vid space) into
        (a, b, c) credit rows via ONE fused-key sort."""
        ek = np.minimum(u, v) * nn_key + np.maximum(u, v)
        ek.sort()
        starts = np.flatnonzero(np.r_[True, ek[1:] != ek[:-1]])
        cnt = np.diff(np.r_[starts, len(ek)]).astype(np.int64)
        heads = ek[starts]
        return pa.table(
            {"a": heads // nn_key, "b": heads % nn_key, "c": cnt}
        )

    _credit_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())]
    )
    _credit_empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "c": pa.array([], pa.int64())}
    )

    if simple is None:
        simple = _simple_dedup_ds(edges, n)
    if simple is None:
        return None, np.zeros(n, dtype=np.int64)
    if closure == "auto":
        closure = "broadcast" if simple.count() <= 50_000_000 else "shuffle"

    if closure == "shuffle":
        deg = np.zeros(n, dtype=np.int64)
        for u, c in ray.get(
            [_degree_partial.remote(r) for r in simple.to_arrow_refs()]
        ):
            np.add.at(deg, u, c)

        def edge_credits(t: pa.Table) -> pa.Table:
            """(x, y) group-complete block of wedge-union-edge rows:
            each closed wedge credits edges (apex,x), (apex,y), (x,y),
            canonicalized to vid order and pre-combined."""
            if t.num_rows == 0:
                return _credit_empty
            x = t.column("x").to_numpy(zero_copy_only=False)
            y = t.column("y").to_numpy(zero_copy_only=False)
            ap = t.column("apex").to_numpy(zero_copy_only=False)
            o = np.lexsort((ap, y, x))
            x, y, ap = x[o], y[o], ap[o]
            starts = np.flatnonzero(
                np.r_[True, (x[1:] != x[:-1]) | (y[1:] != y[:-1])]
            )
            sizes = np.diff(np.r_[starts, len(x)])
            # edge rows carry apex == -1 and sort FIRST within a group
            closed = np.repeat(ap[starts] == -1, sizes) & (ap >= 0)
            if not closed.any():
                return _credit_empty
            xc, yc, apc = x[closed], y[closed], ap[closed]
            u = np.concatenate([apc, apc, xc])
            v = np.concatenate([xc, yc, yc])
            return credits_to_vid_pairs(u, v)

        credits = _closed_wedge_union(simple, deg, edge_credits)
        return _combine_edge_credits(simple, credits), deg

    prep = _simple_rank_csr(edges, n, simple=simple)
    if prep is None:
        return None, np.zeros(n, dtype=np.int64)
    simple, deg, order, _rank_of, member_ref, csr_ref, use_bits = prep
    order_ref = ray.put(order)

    def count_block(t: pa.Table) -> pa.Table:
        """Closed wedges for this apex-rank batch, attributed to all
        three edges and mapped rank -> vid via the broadcast O(V)
        order array."""
        offs, nb = ray.get(csr_ref)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        apexes, firsts, seconds = _apex_wedges(ids, offs, nb)
        if len(firsts) == 0:
            return _credit_empty
        nn = np.int64(len(offs) - 1)
        wk = firsts * nn + seconds
        m = ray.get(member_ref)
        if use_bits:
            hit = (
                (m[(wk >> 3).astype(np.int64)] >> (wk & 7).astype(np.uint8)) & 1
            ).astype(bool)
        else:
            at = np.searchsorted(m, wk)
            at[at >= len(m)] = len(m) - 1
            hit = m[at] == wk
        if not hit.any():
            return _credit_empty
        ord_ = ray.get(order_ref)
        ap, fi, se = ord_[apexes[hit]], ord_[firsts[hit]], ord_[seconds[hit]]
        u = np.concatenate([ap, ap, fi])
        v = np.concatenate([fi, se, se])
        return credits_to_vid_pairs(u, v)

    cpus = int(ray.cluster_resources().get("CPU", 8))
    bs = max(64, n // (cpus * 4))
    credits = rd.range(n).map_batches(
        count_block, batch_format="pyarrow", batch_size=bs
    )
    return _combine_edge_credits(simple, credits), deg


def triangle_per_edge(edges, n: int, closure: str = "auto"):
    """Array-contract convenience wrapper over
    :func:`triangle_per_edge_ds`: pulls the RESULT Dataset (one row per
    simple edge — the operator's output, not an intermediate) to the
    driver and returns ``(a, b, common, deg)``. Use the ``_ds`` form
    when the edge list itself exceeds driver memory."""
    support, deg = triangle_per_edge_ds(edges, n, closure=closure)
    e0 = np.empty(0, dtype=np.int64)
    if support is None:
        return e0, e0, e0, deg
    tabs = [t for t in ray.get(support.materialize().to_arrow_refs()) if t.num_rows]
    if not tabs:
        return e0, e0, e0, deg
    out = pa.concat_tables(tabs, promote_options="default")
    return (
        out.column("a").to_numpy(zero_copy_only=False),
        out.column("b").to_numpy(zero_copy_only=False),
        out.column("common").to_numpy(zero_copy_only=False),
        deg,
    )


def ktruss_edges(edges, n: int, k: int, rounds: int = 4, closure: str = "auto"):
    """Bounded k-truss peeling: ``rounds`` rounds of (per-edge support
    -> drop edges with support < k-2), the multi-pass-loop pattern of
    SCC/k-core applied to EDGES. Monotone, so the result equals the
    true k-truss whenever peeling converges within ``rounds`` (early
    exit when a round removes nothing); the FIXED round count is part
    of the operator contract and mirrored by the unrolled SQL oracle —
    both sides compute "the edge set after R peeling rounds" exactly.
    The peeling loop is Dataset-native (filter survivors per round via
    map_batches over the support Dataset; early-exit on COUNTS, never
    edge arrays); only the FINAL surviving edge set is pulled. Returns
    the canonical (a < b) surviving simple edges."""
    cur = edges
    cur_simple = None  # rounds >= 2 feed back the ALREADY-canonical
    # distinct (a, b) survivor Dataset, skipping the normalize +
    # dedup sort that only round 1's raw input needs (measured ~2x
    # on the sf0.1 suite entry)
    e0 = np.empty(0, dtype=np.int64)
    thresh = k - 2
    prev_count = None
    survivors = None
    for _ in range(max(1, rounds)):
        support, _deg = triangle_per_edge_ds(
            cur, n, closure=closure, simple=cur_simple
        )
        if support is None:
            return e0, e0

        def keep_block(t: pa.Table) -> pa.Table:
            m = pc.greater_equal(t.column("common"), thresh)
            return t.filter(m).select(["a", "b"])

        survivors = support.map_batches(
            keep_block, batch_format="pyarrow"
        ).materialize()
        n_kept = survivors.count()
        if n_kept == 0:
            return e0, e0
        total = support.count() if prev_count is None else prev_count
        if n_kept == total:
            break  # fixpoint: every later round is the identity
        prev_count = n_kept
        # compact: the filtered survivor Dataset inherits one (mostly
        # tiny) block per support block; feeding that back multiplies
        # every per-block fixed cost (CSR-build refs, combine sort) —
        # a few balanced blocks is the right layout for the next round
        cur_simple = survivors.repartition(
            max(1, min(32, -(-n_kept // 100_000)))
        ).materialize()
    tabs = [
        t for t in ray.get(survivors.to_arrow_refs()) if t.num_rows
    ]
    if not tabs:
        return e0, e0
    out = pa.concat_tables(tabs, promote_options="default")
    return (
        out.column("a").to_numpy(zero_copy_only=False),
        out.column("b").to_numpy(zero_copy_only=False),
    )
