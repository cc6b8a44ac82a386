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
    deg = np.zeros(n, dtype=np.int64)
    for u, c in ray.get([_degree_partial.remote(r) for r in refs]):
        np.add.at(deg, u, c)

    num_edges = simple.count()
    if closure == "auto":
        closure = "broadcast" if num_edges <= 50_000_000 else "shuffle"

    if closure == "broadcast":
        tabs = [t for t in ray.get(refs) if t.num_rows]
        a = np.concatenate([t.column("a").to_numpy(zero_copy_only=False) for t in tabs])
        b = np.concatenate([t.column("b").to_numpy(zero_copy_only=False) for t in tabs])
        # orient low (deg, vid) -> high and relabel by that rank so each
        # adjacency list is ascending and a wedge's closing key is
        # (lower_rank * n + higher_rank); ONE combined-key sort builds
        # the rank CSR (keys//n is non-decreasing => offsets via a
        # searchsorted of the apex boundaries)
        order = np.lexsort((np.arange(n), deg))
        rank_of = np.empty(n, dtype=np.int64)
        rank_of[order] = np.arange(n, dtype=np.int64)
        ra, rb = rank_of[a], rank_of[b]
        keys = np.sort(np.minimum(ra, rb) * np.int64(n) + np.maximum(ra, rb))
        nbrs = keys % np.int64(n)
        offsets = np.searchsorted(keys, np.arange(n + 1, dtype=np.int64) * np.int64(n))
        # membership structure: a dense bitset over the n^2 key space is
        # an O(1) probe (vs log2(E) binary-search rounds, each a random
        # gather); it costs n^2/8 bytes, so guard it to <=256 MiB and
        # fall back to searchsorted on the sorted key array above
        use_bits = n * n <= (1 << 31)
        if use_bits:
            bits = np.zeros(((n * n) >> 3) + 1, dtype=np.uint8)
            np.bitwise_or.at(
                bits, (keys >> 3).astype(np.int64), (1 << (keys & 7)).astype(np.uint8)
            )
            member_ref = ray.put(bits)
        else:
            member_ref = ray.put(keys)
        csr_ref = ray.put((offsets, nbrs))

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

    # ---- shuffle closure: wedge self-join + (x, y) groupby ------------
    return _shuffle_closure_count(simple, deg)


def _simple_rank_csr(edges, n: int):
    """Shared prep for the per-vertex / per-edge attribution paths:
    normalize + dedup to the undirected simple graph, degree-order
    ranks, broadcast the rank-relabelled CSR + membership structure.
    Returns (a, b, deg, order, rank_of, member_ref, csr_ref, use_bits)
    or None for an empty graph."""
    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table({"src": np.asarray(src, dtype=np.int64),
                      "dst": np.asarray(dst, dtype=np.int64)})
        )
    normalized = edges.map_batches(_normalize, batch_format="pyarrow").materialize()
    if normalized.count() == 0:
        return None
    simple = key_grouped_block_map(
        normalized.sort(["a", "b"]), ["a", "b"], _dedup_block
    ).materialize()
    refs = [r for r in simple.to_arrow_refs()]
    deg = np.zeros(n, dtype=np.int64)
    for u, c in ray.get([_degree_partial.remote(r) for r in refs]):
        np.add.at(deg, u, c)

    tabs = [t for t in ray.get(refs) if t.num_rows]
    a = np.concatenate([t.column("a").to_numpy(zero_copy_only=False) for t in tabs])
    b = np.concatenate([t.column("b").to_numpy(zero_copy_only=False) for t in tabs])
    order = np.lexsort((np.arange(n), deg))
    rank_of = np.empty(n, dtype=np.int64)
    rank_of[order] = np.arange(n, dtype=np.int64)
    ra, rb = rank_of[a], rank_of[b]
    keys = np.sort(np.minimum(ra, rb) * np.int64(n) + np.maximum(ra, rb))
    nbrs = keys % np.int64(n)
    offsets = np.searchsorted(keys, np.arange(n + 1, dtype=np.int64) * np.int64(n))
    use_bits = n * n <= (1 << 31)
    if use_bits:
        bits = np.zeros(((n * n) >> 3) + 1, dtype=np.uint8)
        np.bitwise_or.at(
            bits, (keys >> 3).astype(np.int64), (1 << (keys & 7)).astype(np.uint8)
        )
        member_ref = ray.put(bits)
    else:
        member_ref = ray.put(keys)
    csr_ref = ray.put((offsets, nbrs))
    return a, b, deg, order, rank_of, member_ref, csr_ref, use_bits


def triangle_per_vertex(edges, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-vertex triangle counts + simple-graph degrees over the
    broadcast closure: the same rank-CSR wedge enumeration as
    :func:`triangle_count`, but each CLOSED wedge attributes one
    triangle to its apex and to both endpoints (every triangle is
    enumerated exactly once at its lowest-rank apex, so each vertex's
    count is exact). Returns ``(vids, tri, deg)`` for vertices with
    degree > 0. Broadcast-path only — beyond ~50M edges extend the
    shuffle closure with endpoint attribution before using this."""
    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table({"src": np.asarray(src, dtype=np.int64),
                      "dst": np.asarray(dst, dtype=np.int64)})
        )
    prep = _simple_rank_csr(edges, n)
    e0 = np.empty(0, dtype=np.int64)
    if prep is None:
        return e0, e0, e0
    a, b, deg, order, rank_of, member_ref, csr_ref, use_bits = prep

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


def triangle_per_edge(edges, n: int):
    """Per-EDGE common-neighbor (triangle) counts over the undirected
    simple graph: every closed wedge (apex < first < second in rank
    order) attributes one triangle to each of its THREE edges, so an
    edge's total is exactly |N(u) & N(v)|. Same broadcast rank-CSR
    closure as :func:`triangle_per_vertex`. Returns
    ``(a, b, common, deg)``: the canonical simple edges (a < b by vid),
    each edge's common-neighbor count, and the full per-vid degree
    array. The SCAN structural-similarity / edge-Jaccard inputs."""
    prep = _simple_rank_csr(edges, n)
    e0 = np.empty(0, dtype=np.int64)
    if prep is None:
        return e0, e0, e0, np.zeros(n, dtype=np.int64)
    a, b, deg, order, rank_of, member_ref, csr_ref, use_bits = prep
    nn_key = np.int64(n)
    assert n < (1 << 31), "fused rank-pair key would overflow"

    def count_block(t: pa.Table) -> pa.Table:
        offs, nb = ray.get(csr_ref)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"ek": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
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
        # apex < first < second in rank order: all three edge keys are
        # already canonical in rank space
        ap, fi, se = apexes[hit], firsts[hit], seconds[hit]
        eks = np.concatenate([ap * nn + fi, ap * nn + se, fi * nn + se])
        if len(eks) == 0:  # every wedge in this batch was open
            return empty
        eks.sort()
        starts = np.flatnonzero(np.r_[True, eks[1:] != eks[:-1]])
        cnt = np.diff(np.r_[starts, len(eks)])
        return pa.table({"ek": eks[starts], "c": cnt.astype(np.int64)})

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
    # combine block partials, then map rank-pair keys back to vid pairs
    ra, rb = rank_of[a], rank_of[b]
    edge_keys = np.minimum(ra, rb) * nn_key + np.maximum(ra, rb)
    eorder = np.argsort(edge_keys)
    sorted_keys = edge_keys[eorder]
    common = np.zeros(len(a), dtype=np.int64)
    if parts.num_rows:
        pk = parts.column("ek").to_numpy(zero_copy_only=False)
        pc_ = parts.column("c").to_numpy(zero_copy_only=False)
        at = np.minimum(np.searchsorted(sorted_keys, pk), len(sorted_keys) - 1)
        # every attributed key IS an edge of the simple graph — fail
        # LOUDLY if attribution ever drifts rather than mis-adding
        if not (sorted_keys[at] == pk).all():
            raise AssertionError("triangle attribution produced a non-edge key")
        np.add.at(common, eorder[at], pc_)
    return a, b, common, deg


def ktruss_edges(edges, n: int, k: int, rounds: int = 4):
    """Bounded k-truss peeling: ``rounds`` rounds of (per-edge support
    -> drop edges with support < k-2), the multi-pass-loop pattern of
    SCC/k-core applied to EDGES. Monotone, so the result equals the
    true k-truss whenever peeling converges within ``rounds`` (early
    exit when a round removes nothing); the FIXED round count is part
    of the operator contract and mirrored by the unrolled SQL oracle —
    both sides compute "the edge set after R peeling rounds" exactly.
    Returns the canonical (a < b) surviving simple edges."""
    cur = edges
    a = b = np.empty(0, dtype=np.int64)
    for _ in range(max(1, rounds)):
        a, b, common, _deg = triangle_per_edge(cur, n)
        keep = common >= (k - 2)
        if keep.all():
            return a, b  # fixpoint: every later round is the identity
        a, b = a[keep], b[keep]
        if len(a) == 0:
            return a, b
        cur = (a, b)
    return a, b
