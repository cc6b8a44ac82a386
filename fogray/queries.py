"""Driver-conformance queries over /root/testdata sf tables.

Each ``q_*`` function takes ``sf_dir`` and returns a pyarrow Table; the
matching entry in :data:`ORACLE_SQL` is ANSI SQL DuckDB runs on the same
parquet (views pre-registered by the driver). Column names and dtypes
match EXACTLY (the driver hashes values after sorting columns by name).

Graph queries run the FOG-semantics engine over two graphs derived from
the TPC-H-ish tables:

- the **part co-occurrence graph**: distinct (order, part) pairs from
  ``lineitem``; parts sharing an order get symmetric edges with
  weight = co-occurring order count (integer-valued doubles => float
  aggregation is exact and hash-stable);
- the **part sequence graph** (directed, for SCC): edges between
  consecutive line numbers within an order;
- the **geo tree** (region -> nation -> customer) with deterministic
  key-derived weights, for SSSP value parity.

Float-emitting queries round to 6 decimals on BOTH sides; every rounded
quantity is either exactly representable (integer-valued weights) or
computed identically (documented per query).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from . import algorithms as alg
from .config import EngineConfig
from .engine import GraphEngine
from .derive import cooccurrence_pair_counts, empty_guard, safe_inner_join
from .util import read_parquet_clean, sorted_table, sql_round
from .triangles import triangle_count

# ---------------------------------------------------------------------------
# derived graphs (cached per sf_dir; edge tables are small relative to
# the base data — V = #parts, E = co-occurrence pairs)
# ---------------------------------------------------------------------------


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _join_parts(cap: int = 32) -> int:
    """Hash-join partition count sized to the session: each partition is
    an aggregator actor, so more partitions than CPUs deadlocks small
    sessions (and wastes workers on big ones)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(cap, cpus))


def _ray_session_key() -> str:
    """Cache key component tied to the live Ray session: lru-cached
    Datasets / actor handles from a previous ``ray.init`` are dead
    objects — keying every cache on the job id makes a re-initialized
    session rebuild instead of failing on stale handles."""
    import ray

    if not ray.is_initialized():
        return "uninit"
    try:
        return str(ray.get_runtime_context().get_job_id())
    except Exception:  # pragma: no cover - defensive
        return "unknown"


@functools.lru_cache(maxsize=4)
def _cooc_edges_ds(sf_dir: str, _session: str):
    """Materialized co-occurrence edge Dataset + num_vertices. Blocks
    stay IN THE OBJECT STORE (the driver holds only refs): this is the
    input the engines' ``dataset=`` constructors consume, so no query
    path funnels the full edge table through the driver. Derivation:
    ONE sort by order key, per-block group-complete pair expansion
    (distinct parts per order, vectorized, pre-aggregated), then one
    sort of the pair partials for exact totals — see
    fogray.derive.cooccurrence_pair_counts (replaces the prior
    distinct-groupby + hash self-join + count-groupby, ~2.6x faster at
    sf0.1 and two fewer all-to-all exchanges)."""
    li = read_parquet_clean(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])
    edges = cooccurrence_pair_counts(li, ["l_orderkey"], "l_partkey", cap=None)
    edges = edges.repartition(_join_parts(cap=8)).materialize()
    if edges.count() == 0:
        return edges, 1
    mx = edges.max(["src", "dst"])
    return edges, int(max(mx["max(src)"], mx["max(dst)"])) + 1


def cooccurrence_edges_ds(sf_dir: str):
    """(materialized edge Dataset, num_vertices) for the current Ray
    session — see :func:`_cooc_edges_ds`."""
    return _cooc_edges_ds(sf_dir, _ray_session_key())


@functools.lru_cache(maxsize=4)
def cooccurrence_edges(sf_dir: str) -> pa.Table:
    """Driver-side co-occurrence edge TABLE — only for queries whose
    RESULT is the edge table itself (derive_edges / src_edgelist /
    degree and triangle reports); engine construction goes through
    :func:`cooccurrence_edges_ds` and never collects the edges."""
    ds, _ = cooccurrence_edges_ds(sf_dir)
    return pa.concat_tables(_collect(ds))


def _collect(ds) -> list[pa.Table]:
    import ray

    # materialize first: collecting refs from a LAZY dataset triggers a
    # schema probe (a limit-1 plan) that re-runs any upstream aggregate
    # in full — materialize executes exactly once.
    return ray.get(ds.materialize().to_arrow_refs())


@functools.lru_cache(maxsize=4)
def sequence_edges(sf_dir: str) -> pa.Table:
    """Directed part sequence graph: consecutive line numbers in an
    order, distinct, self-loops dropped. ONE sort by order key brings
    every order's rows into one group-complete block, where the
    (order, line) x (order, line+1) equi-join is a composite-key
    searchsorted + range expansion — exact join semantics incl.
    duplicate (order, line) rows (the synthetic lineitem HAS them); a
    second sort dedups the pairs."""
    from .derive import key_grouped_block_map
    from .engine import expand_ranges

    li = read_parquet_clean(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber", "l_partkey"]
    )

    def adjacent_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ln = t.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        # composite key (order, line) as one int64; line numbers are
        # small so the order key is scaled by the next power of two
        M = np.int64(1) << max(int(ln.max()) + 2, 8).bit_length()
        k = o * M + ln
        order = np.argsort(k, kind="stable")
        k, p = k[order], p[order]
        starts = np.searchsorted(k, k + 1, side="left")
        ends = np.searchsorted(k, k + 1, side="right")
        idx = expand_ranges(starts, ends)
        src = np.repeat(p, ends - starts)
        dst = p[idx]
        m = src != dst
        return pa.table({"src": src[m], "dst": dst[m]})

    def dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        first = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
        return pa.table({"src": s[first], "dst": d[first]})

    pairs = key_grouped_block_map(
        li.sort(["l_orderkey", "l_linenumber"]), ["l_orderkey"], adjacent_pairs
    ).materialize()
    if pairs.count() == 0:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    ds = key_grouped_block_map(pairs.sort(["src", "dst"]), ["src", "dst"], dedup)
    return pa.concat_tables(_collect(ds))


_SEQ_SQL = """
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey
     AND b.l_linenumber = a.l_linenumber + 1
     AND a.l_partkey <> b.l_partkey
"""


@functools.lru_cache(maxsize=4)
def temporal_sequence_edges(sf_dir: str) -> pa.Table:
    """Directed part-sequence graph WITH edge availability times:
    distinct (src, dst, t) triples where t = epoch-day of the SECOND
    line's l_shipdate — the temporal twin of :func:`sequence_edges`
    (same ONE-sort group-complete derivation, same duplicate-row
    handling; a pair recurring on different days keeps every distinct
    day as its own temporal edge)."""
    from .derive import key_grouped_block_map
    from .engine import expand_ranges

    li = read_parquet_clean(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_shipdate"],
    )
    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "t": pa.array([], pa.int64()),
        }
    )

    def adjacent_pairs_t(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ln = t.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        days = (
            t.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // np.int64(86_400_000_000)
        )
        M = np.int64(1) << max(int(ln.max()) + 2, 8).bit_length()
        k = o * M + ln
        order = np.argsort(k, kind="stable")
        k, p, days = k[order], p[order], days[order]
        starts = np.searchsorted(k, k + 1, side="left")
        ends = np.searchsorted(k, k + 1, side="right")
        idx = expand_ranges(starts, ends)
        src = np.repeat(p, ends - starts)
        dst = p[idx]
        tt = days[idx]  # availability = the SECOND line's ship day
        m = src != dst
        return pa.table({"src": src[m], "dst": dst[m], "t": tt[m]})

    def dedup3(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        tt = t.column("t").to_numpy(zero_copy_only=False)
        order = np.lexsort((tt, d, s))
        s, d, tt = s[order], d[order], tt[order]
        first = np.r_[
            True,
            (s[1:] != s[:-1]) | (d[1:] != d[:-1]) | (tt[1:] != tt[:-1]),
        ]
        return pa.table({"src": s[first], "dst": d[first], "t": tt[first]})

    pairs = key_grouped_block_map(
        li.sort(["l_orderkey", "l_linenumber"]), ["l_orderkey"], adjacent_pairs_t
    ).materialize()
    if pairs.count() == 0:
        return empty
    ds = key_grouped_block_map(
        pairs.sort(["src", "dst", "t"]), ["src", "dst", "t"], dedup3
    )
    return pa.concat_tables(_collect(ds))

_COOC_SQL = """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS src, b.l_partkey AS dst,
           CAST(COUNT(*) AS DOUBLE) AS weight
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
"""


def _engine_for(table: pa.Table, weights: bool = True) -> tuple[GraphEngine, int]:
    src = table.column("src").to_numpy(zero_copy_only=False)
    dst = table.column("dst").to_numpy(zero_copy_only=False)
    w = (
        table.column("weight").to_numpy(zero_copy_only=False)
        if weights and "weight" in table.column_names
        else None
    )
    n = int(max(src.max(), dst.max())) + 1 if len(src) else 1
    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=4))
    return eng, n


@functools.lru_cache(maxsize=2)
def _cooc_engine_impl(sf_dir: str, _session: str) -> tuple[GraphEngine, int]:
    ds, n = cooccurrence_edges_ds(sf_dir)
    return GraphEngine(n, dataset=ds, cfg=EngineConfig()), n


def _cooc_engine(sf_dir: str) -> tuple[GraphEngine, int]:
    """ONE pinned-actor engine per (sf_dir, Ray session) serves every
    co-occurrence graph query (pagerank/cc/lp/bfs/spmv all run over the
    same edges; programs that ignore weights just don't read them).
    Engines hold no cross-run state — each run() re-inits its vertex
    state — so reuse is safe, and re-building identical CSR actors per
    query was pure overhead. Built via the ``dataset=`` streaming path:
    the sorted edge blocks go object-store -> actor without ever being
    concatenated on the driver."""
    return _cooc_engine_impl(sf_dir, _ray_session_key())


def _touched(eng: GraphEngine) -> np.ndarray:
    return np.flatnonzero((eng.outdeg > 0) | (eng.indeg > 0))


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------


def q_derive_edges(sf_dir: str) -> pa.Table:
    return sorted_table(cooccurrence_edges(sf_dir), ["src", "dst"])


def q_out_degrees(sf_dir: str) -> pa.Table:
    """Out-degrees straight off the engine's setup-time degree arrays
    (computed distributed, per-block, at engine construction) — no
    driver-side edge table or pandas groupby."""
    eng, n = _cooc_engine(sf_dir)
    ids = np.flatnonzero(eng.outdeg > 0)
    return pa.table(
        {"vid": ids.astype(np.int64), "out_degree": eng.outdeg[ids].astype(np.int64)}
    )


def q_pagerank(sf_dir: str) -> pa.Table:
    eng, n = _cooc_engine(sf_dir)
    res = alg.pagerank(eng, niters=10)
    ids = _touched(eng)
    return pa.table(
        {"vid": ids.astype(np.int64), "rank": sql_round(res.state["rank"][ids])}
    )


def q_ppr(sf_dir: str) -> pa.Table:
    """Personalized PageRank seeded at the lowest-vid vertex with
    out-edges (== MIN(src) in the oracle; the co-occurrence graph is
    symmetric so that is also the lowest touched vid)."""
    eng, n = _cooc_engine(sf_dir)
    src0 = int(np.flatnonzero(eng.outdeg > 0)[0])
    res = alg.ppr(eng, src0, niters=10)
    ids = _touched(eng)
    return pa.table(
        {"vid": ids.astype(np.int64), "rank": sql_round(res.state["rank"][ids])}
    )


def q_hits(sf_dir: str) -> pa.Table:
    """HITS hub/authority scores after 5 max-normalized iterations
    (fogray.algorithms.hits; authority half-step on the forward views,
    hub half-step on the backward/CSC views)."""
    eng, n = _cooc_engine(sf_dir)
    res = alg.hits(eng, niters=5)
    ids = _touched(eng)
    return pa.table(
        {
            "vid": ids.astype(np.int64),
            "hub": sql_round(res.state["hub"][ids]),
            "auth": sql_round(res.state["auth"][ids]),
        }
    )


def q_kcore(sf_dir: str) -> pa.Table:
    """k-core membership with k = max(2, floor(avg_degree * 0.7)) — the
    data-derived threshold (computed identically by the oracle's AVG)
    peels a mixed shell at every sf on the near-regular co-occurrence
    graph (193/200 .. 18201/20000 in-core, 3-10 peel rounds measured).
    The peeling runs to fixpoint on the engine; the oracle's fixed 32
    recursion rounds rely on rounds being idempotent past convergence
    (asserted in tests)."""
    import math

    eng, n = _cooc_engine(sf_dir)
    pos = eng.outdeg[eng.outdeg > 0]
    k = max(2, math.floor(float(pos.mean()) * 0.7)) if len(pos) else 2
    res = alg.kcore(eng, k)
    ids = _touched(eng)
    return pa.table(
        {
            "vid": ids.astype(np.int64),
            "in_core": res.state["alive"][ids].astype(np.int64),
        }
    )


def q_connected_components(sf_dir: str) -> pa.Table:
    eng, n = _cooc_engine(sf_dir)
    res = alg.connected_components(eng)
    ids = _touched(eng)
    return pa.table(
        {
            "vid": ids.astype(np.int64),
            "component_root": res.state["component_root"][ids].astype(np.int64),
        }
    )


def q_cc_incremental(sf_dir: str) -> pa.Table:
    """Streaming-update connected components: the co-occurrence edges
    arrive in 4 deterministic batches (splitmix hash of the canonical
    edge) and min-label components are restored after each arrival by
    FRONTIER-LIMITED propagation over the accumulated pinned blocks
    (fogray.incremental.incremental_cc). The final fixpoint is
    arrival-order independent and equals the static components, so the
    oracle is the SAME recursive-reachability SQL as
    ``connected_components``."""
    from .incremental import incremental_cc

    ds, n = cooccurrence_edges_ds(sf_dir)
    labels, touched, _stats = incremental_cc(
        ds.select_columns(["src", "dst"]), n, num_batches=4
    )
    return pa.table(
        {
            "vid": touched.astype(np.int64),
            "component_root": labels[touched].astype(np.int64),
        }
    )


def q_pagerank_evolve(sf_dir: str) -> pa.Table:
    """Evolving-graph PageRank with warm start: half the co-occurrence
    edges (splitmix hash of the canonical pair, the cc_incremental
    split) form phase 0 — 10 FOG-semantics iterations; then the full
    edge set arrives and 10 MORE iterations continue from the phase-0
    ranks (rounded to 6 decimals at the boundary on both sides, the
    established drift collapse). The accumulate-no-reset semantics make
    the history part of the answer — warm-start != cold-start on the
    full graph, which is exactly what the oracle's two-chained
    recursions replay."""
    from .sources import splitmix53

    ds, n = cooccurrence_edges_ds(sf_dir)

    def phase0(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        h = splitmix53((a << np.uint64(32)) ^ b)
        return t.filter(pa.array((h % np.uint64(2)) == 0))

    ds0 = ds.map_batches(phase0, batch_format="pyarrow").materialize()
    eng0 = GraphEngine(n, dataset=ds0, cfg=EngineConfig())
    try:
        r1 = alg.pagerank(eng0, niters=10)
    finally:
        eng0.shutdown()
    rank1 = sql_round(r1.state["rank"])
    eng, _ = _cooc_engine(sf_dir)
    r2 = alg.pagerank(eng, niters=10, init_rank=rank1)
    ids = _touched(eng)
    # log-rank output: 20 accumulate-no-reset iterations push ranks to
    # ~1e6+, where a 6-decimal ABSOLUTE round exceeds float64's
    # meaningful precision (one observed last-digit boundary flip vs
    # the oracle's different summation order); ROUND(ln(rank), 6) is a
    # RELATIVE quantization — boundary 5e-7 vs ~1e-13 cross-impl drift
    return pa.table(
        {
            "vid": ids.astype(np.int64),
            "log_rank": sql_round(np.log(r2.state["rank"][ids])),
        }
    )


def _pagerank_evolve_sql() -> str:
    """Two chained FOG-PageRank recursions: pr0 runs 10 iterations on
    the phase-0 edge subset (splitmix(canonical pair) % 2 == 0), its
    rounded iteration-10 state seeds pr1's base row, and pr1 runs 10
    more on the full matrix — both phases carry isolated vertices via
    the unit self-loop rows, exactly the engine's warm-start run."""
    return f"""
WITH RECURSIVE
edges AS MATERIALIZED ({_COOC_SQL}),
pe0 AS (SELECT src, dst,
        xor(CAST(LEAST(src, dst) AS UBIGINT) * CAST(4294967296 AS UBIGINT),
            CAST(GREATEST(src, dst) AS UBIGINT)) AS x0
        FROM edges),
{_splitmix_ctes("pe", "pe0", "src, dst")},
e0 AS MATERIALIZED (
    SELECT src, dst FROM pe3 WHERE (f >> 11) % 2 = 0),
verts AS (SELECT DISTINCT src AS v FROM edges),
deg0 AS (SELECT src, COUNT(*) AS outdeg FROM e0 GROUP BY src),
mat0 AS (
    SELECT e.src, e.dst, 0.85 / d.outdeg AS coef, 0.15 AS konst
    FROM e0 e JOIN deg0 d ON d.src = e.src
    UNION ALL
    SELECT v, v, 1.0, 0.0 FROM verts
),
deg1 AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
mat1 AS (
    SELECT e.src, e.dst, 0.85 / d.outdeg AS coef, 0.15 AS konst
    FROM edges e JOIN deg1 d ON d.src = e.src
    UNION ALL
    SELECT v, v, 1.0, 0.0 FROM verts
),
pr0(iter, v, r) AS (
    SELECT 0, v, CAST(1.0 AS DOUBLE) FROM verts
    UNION ALL
    SELECT pr0.iter + 1, mat0.dst, SUM(mat0.coef * pr0.r + mat0.konst)
    FROM pr0 JOIN mat0 ON mat0.src = pr0.v
    WHERE pr0.iter < 10
    GROUP BY pr0.iter + 1, mat0.dst
),
seed AS MATERIALIZED (SELECT v, ROUND(r, 6) AS r FROM pr0 WHERE iter = 10),
pr1(iter, v, r) AS (
    SELECT 0, v, r FROM seed
    UNION ALL
    SELECT pr1.iter + 1, mat1.dst, SUM(mat1.coef * pr1.r + mat1.konst)
    FROM pr1 JOIN mat1 ON mat1.src = pr1.v
    WHERE pr1.iter < 10
    GROUP BY pr1.iter + 1, mat1.dst
)
SELECT v AS vid, ROUND(LN(r), 6) AS log_rank FROM pr1 WHERE iter = 10
ORDER BY vid
"""


def q_temporal_reach(sf_dir: str) -> pa.Table:
    """Time-respecting earliest-arrival reachability over the temporal
    part-sequence graph (edge time = the second line's ship day;
    fogray.temporal.temporal_earliest_arrival) from the minimum source
    vid. -> (vid, arrival_day); the source reports -1."""
    from .temporal import temporal_earliest_arrival

    t = temporal_sequence_edges(sf_dir)
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    tt = t.column("t").to_numpy(zero_copy_only=False)
    if len(s) == 0:
        return pa.table(
            {"vid": pa.array([], pa.int64()), "arrival_day": pa.array([], pa.int64())}
        )
    n = int(max(s.max(), d.max())) + 1
    source = int(s.min())
    arrival, reached = temporal_earliest_arrival((s, d, tt), n, source)
    return pa.table(
        {
            "vid": pa.array(reached.astype(np.int64)),
            "arrival_day": pa.array(arrival[reached].astype(np.int64)),
        }
    )


def q_label_propagation(sf_dir: str) -> pa.Table:
    eng, n = _cooc_engine(sf_dir)
    res = alg.label_propagation(eng)
    ids = _touched(eng)
    return pa.table(
        {"vid": ids.astype(np.int64), "label": res.state["component_root"][ids].astype(np.int64)}
    )


def q_bfs(sf_dir: str) -> pa.Table:
    eng, n = _cooc_engine(sf_dir)
    # min src == first vid with out-edges (no edge-table collection)
    root = int(np.flatnonzero(eng.outdeg > 0)[0])
    res = alg.bfs(eng, root=root)
    lv = res.state["bfs_level"]
    reached = np.flatnonzero(lv < np.float64(2**32 - 1))
    return pa.table(
        {"vid": reached.astype(np.int64), "bfs_level": lv[reached].astype(np.int64)}
    )


def q_harmonic(sf_dir: str) -> pa.Table:
    """Sampled harmonic centrality: BFS from the 4 lowest vids with
    out-edges (== the oracle's ``ORDER BY src LIMIT 4``; the
    co-occurrence graph is symmetric so the src set is the touched
    set), H(v) = sum over sources of 1/dist(s, v) for reached v != s.
    Each source is one frontier BFS over the SAME pinned CSR actors —
    the per-source passes share the engine build, which is the scale
    cost; K stays a constant sample, not a function of V. Four float
    terms summed before one 6-decimal round (the HITS drift argument)."""
    eng, n = _cooc_engine(sf_dir)
    ids = _touched(eng)
    sources = np.flatnonzero(eng.outdeg > 0)[:4]
    unreached = np.float64(2**32 - 1)
    h = np.zeros(n, dtype=np.float64)
    for s0 in sources:
        lv = alg.bfs(eng, root=int(s0)).state["bfs_level"]
        reach = (lv > 0) & (lv < unreached)
        h[reach] += 1.0 / lv[reach]
    return pa.table({"vid": ids.astype(np.int64), "harmonic": sql_round(h[ids])})


def q_closeness(sf_dir: str) -> pa.Table:
    """Closeness centrality of the 4 sampled sources (same BFS passes
    as q_harmonic): C(s) = (reached-1) / sum of distances to reached
    vertices — one row per source."""
    eng, n = _cooc_engine(sf_dir)
    sources = np.flatnonzero(eng.outdeg > 0)[:4]
    unreached = np.float64(2**32 - 1)
    rows = {"source": [], "n_reached": [], "sum_dist": [], "closeness": []}
    for s0 in sources:
        lv = alg.bfs(eng, root=int(s0)).state["bfs_level"]
        reach = (lv > 0) & (lv < unreached)
        sd = int(lv[reach].sum())
        nr = int(reach.sum())
        rows["source"].append(int(s0))
        rows["n_reached"].append(nr)
        rows["sum_dist"].append(sd)
        rows["closeness"].append(
            float(sql_round(np.array([nr / sd if sd else 0.0]))[0])
        )
    return pa.table(
        {
            "source": pa.array(rows["source"], pa.int64()),
            "n_reached": pa.array(rows["n_reached"], pa.int64()),
            "sum_dist": pa.array(rows["sum_dist"], pa.int64()),
            "closeness": pa.array(rows["closeness"], pa.float64()),
        }
    )


def q_degree_histogram(sf_dir: str) -> pa.Table:
    """Out-degree distribution histogram (bucket width 16) straight off
    the engine's setup-time degree arrays — the graph-shape summary."""
    eng, n = _cooc_engine(sf_dir)
    deg = eng.outdeg[eng.outdeg > 0]
    b = (deg // 16).astype(np.int64)
    u, c = np.unique(b, return_counts=True)
    return pa.table(
        {
            "bucket": pa.array(u, pa.int64()),
            "lo_degree": pa.array(u * 16, pa.int64()),
            "n_vertices": pa.array(c.astype(np.int64)),
        }
    )


def q_diameter(sf_dir: str) -> pa.Table:
    """Approximate diameter by the classic double-sweep lower bound:
    BFS from the lowest out-degree>0 vid, re-BFS from the farthest
    reached vertex (ties -> lowest vid, matching the oracle's
    ``ORDER BY v LIMIT 1``), report the second sweep's eccentricity."""
    eng, n = _cooc_engine(sf_dir)
    unreached = np.float64(2**32 - 1)
    root = int(np.flatnonzero(eng.outdeg > 0)[0])

    def _sweep(r: int) -> tuple[int, int]:
        lv = alg.bfs(eng, root=r).state["bfs_level"]
        reached = lv < unreached
        ecc = int(lv[reached].max())
        far = int(np.flatnonzero(reached & (lv == ecc))[0])
        return far, ecc

    far1, _ = _sweep(root)
    far2, ecc2 = _sweep(far1)
    return pa.table(
        {
            "start_vid": pa.array([root], pa.int64()),
            "sweep1_vid": pa.array([far1], pa.int64()),
            "sweep2_vid": pa.array([far2], pa.int64()),
            "approx_diameter": pa.array([ecc2], pa.int64()),
        }
    )


def q_katz(sf_dir: str) -> pa.Table:
    """Katz centrality, 8 fixed iterations with the dyadic alpha=1/256
    (fogray.programs.KatzCentrality; the oracle unrolls the same
    iterations as materialized CTEs)."""
    eng, n = _cooc_engine(sf_dir)
    res = alg.katz(eng, niters=8)
    ids = _touched(eng)
    return pa.table(
        {"vid": ids.astype(np.int64), "katz": sql_round(res.state["x"][ids])}
    )


@ray.remote
def _wsum_partial(t: pa.Table):
    """O(distinct src) per-block out-weight-sum partial — the weighted
    twin of the out-degree fold; float64 sums of integer-valued
    co-occurrence counts are exact in any order."""
    if t.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    s = t.column("src").to_numpy(zero_copy_only=False)
    w = t.column("weight").to_numpy(zero_copy_only=False)
    u, inv = np.unique(s, return_inverse=True)
    return u.astype(np.int64), np.bincount(inv, weights=w, minlength=len(u))


def q_wpagerank(sf_dir: str) -> pa.Table:
    """Weighted FOG-semantics PageRank over the co-occurrence graph
    (fogray.programs.WeightedPageRank): each edge's share is scaled by
    its co-occurrence weight over the source's total out-weight; 10
    fixed iterations. wsum comes from an O(V) per-block fold; the
    oracle's recursive CTE applies the identical per-edge expression."""
    eng, n = _cooc_engine(sf_dir)
    ds, _ = cooccurrence_edges_ds(sf_dir)
    wsum = np.zeros(n, dtype=np.float64)
    for bu, bw in ray.get(
        [_wsum_partial.remote(r) for r in ds.to_arrow_refs()]
    ):
        np.add.at(wsum, bu, bw)
    res = alg.wpagerank(eng, wsum, niters=10)
    ids = _touched(eng)
    return pa.table(
        {
            "vid": ids.astype(np.int64),
            "wrank": sql_round(res.state["rank"][ids]),
        }
    )


def q_eigenvector(sf_dir: str) -> pa.Table:
    """Eigenvector centrality: 4 fixed power iterations from x0=1
    (exact integer walk counts — programs.EigenvectorCentrality), then
    one normalization by max(x). The oracle unrolls the same rounds as
    materialized CTEs and divides by the same max, so the floats are
    bit-identical before the shared 6-decimal round."""
    eng, n = _cooc_engine(sf_dir)
    res = alg.eigenvector(eng, niters=4)
    ids = _touched(eng)
    x = res.state["x"][ids]
    m = float(x.max()) if len(x) else 1.0
    return pa.table(
        {
            "vid": ids.astype(np.int64),
            "eig": sql_round(x / (m if m > 0 else 1.0)),
        }
    )


def _eigenvector_sql(niters: int = 4) -> str:
    """Unrolled power-iteration mirror: k{i}(v) = Σ k{i-1} over
    in-edges from k0 = 1, normalized by MAX at the end (identical
    float division on identical exact-integer walk counts)."""
    parts = [
        f"""WITH edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
        touched AS MATERIALIZED (SELECT DISTINCT src AS vid FROM edges),
        k0 AS (SELECT vid, CAST(1.0 AS DOUBLE) AS x FROM touched)"""
    ]
    for i in range(1, niters + 1):
        parts.append(f"""k{i} AS MATERIALIZED (
            SELECT t.vid, COALESCE(SUM(p.x), 0.0) AS x
            FROM touched t
            LEFT JOIN edges e ON e.dst = t.vid
            LEFT JOIN k{i - 1} p ON p.vid = e.src
            GROUP BY t.vid)""")
    return (
        ",\n".join(parts)
        + f"""
        SELECT vid,
               ROUND(x / GREATEST((SELECT MAX(x) FROM k{niters}), 1e-300),
                     6) AS eig
        FROM k{niters} ORDER BY vid
    """
    )


def _katz_sql(niters: int = 8) -> str:
    """Unrolled Katz mirror: k{i}(v) = 1 + (1/256)·Σ k{i-1} over
    in-edges, one materialized CTE per iteration."""
    parts = [
        f"""WITH edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
        touched AS MATERIALIZED (SELECT DISTINCT src AS vid FROM edges),
        k0 AS (SELECT vid, CAST(1.0 AS DOUBLE) AS x FROM touched)"""
    ]
    for i in range(1, niters + 1):
        parts.append(f"""k{i} AS MATERIALIZED (
            SELECT t.vid, 1.0 + (1.0/256.0) * COALESCE(SUM(p.x), 0.0) AS x
            FROM touched t
            LEFT JOIN edges e ON e.dst = t.vid
            LEFT JOIN k{i - 1} p ON p.vid = e.src
            GROUP BY t.vid)""")
    return (
        ",\n".join(parts)
        + f"""
        SELECT vid, ROUND(x, 6) AS katz FROM k{niters} ORDER BY vid
    """
    )


def q_betweenness(sf_dir: str) -> pa.Table:
    """Sampled Brandes betweenness from the 4 lowest out-degree>0 vids,
    paths truncated at 6 hops (fogray.algorithms.betweenness; the
    oracle unrolls the same sigma/delta levels as materialized CTEs).
    Sigma stays float64 on both sides (exact while < 2^53)."""
    eng, n = _cooc_engine(sf_dir)
    res = alg.betweenness(eng, num_sources=4, max_level=6)
    ids = _touched(eng)
    return pa.table(
        {"vid": ids.astype(np.int64), "bc": sql_round(res.state["bc"][ids])}
    )


def _betweenness_sql(num_sources: int = 4, max_level: int = 6) -> str:
    """Unrolled Brandes mirror: recursive BFS levels per source, one
    sig{l} CTE per level (path counts over shortest-path-DAG edges),
    one del{l} CTE per level from deepest up (dependency accumulation,
    emitter delta = 0 at the truncation level), bc = sum of deltas over
    sources for v != source."""
    parts = [
        f"""WITH RECURSIVE
        edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
        srcs AS MATERIALIZED (
            SELECT s FROM (SELECT DISTINCT src AS s FROM edges)
            ORDER BY s LIMIT {num_sources}
        ),
        lvl(s, v, d) AS (
            SELECT s, s, 0 FROM srcs
            UNION
            SELECT lvl.s, e.dst, lvl.d + 1
            FROM lvl JOIN edges e ON e.src = lvl.v
            WHERE lvl.d < {max_level}
        ),
        dist AS MATERIALIZED (SELECT s, v, MIN(d) AS d FROM lvl GROUP BY s, v),
        sig0 AS MATERIALIZED (
            SELECT s, s AS v, CAST(1.0 AS DOUBLE) AS sig FROM srcs
        )"""
    ]
    for lev in range(1, max_level + 1):
        parts.append(f"""sig{lev} AS MATERIALIZED (
            SELECT dv.s, dv.v, CAST(SUM(p.sig) AS DOUBLE) AS sig
            FROM dist dv
            JOIN edges e ON e.dst = dv.v
            JOIN sig{lev - 1} p ON p.s = dv.s AND p.v = e.src
            WHERE dv.d = {lev}
            GROUP BY dv.s, dv.v)""")
    for lev in range(max_level - 1, 0, -1):
        if lev == max_level - 1:
            dj, dexpr = "", "0.0"
        else:
            dj = f"LEFT JOIN del{lev + 1} dn ON dn.s = dv.s AND dn.v = e.dst"
            dexpr = "COALESCE(dn.delta, 0.0)"
        parts.append(f"""del{lev} AS MATERIALIZED (
            SELECT dv.s, dv.v,
                   SUM((sv.sig / sw.sig) * (1.0 + {dexpr})) AS delta
            FROM dist dv
            JOIN edges e ON e.src = dv.v
            JOIN sig{lev} sv ON sv.s = dv.s AND sv.v = dv.v
            JOIN sig{lev + 1} sw ON sw.s = dv.s AND sw.v = e.dst
            {dj}
            WHERE dv.d = {lev}
            GROUP BY dv.s, dv.v)""")
    union = " UNION ALL ".join(
        f"SELECT v, delta FROM del{lev}" for lev in range(1, max_level)
    )
    parts.append(f"alldel AS (SELECT v, SUM(delta) AS bc FROM ({union}) GROUP BY v)")
    return (
        ",\n".join(parts)
        + """
        SELECT t.vid, ROUND(COALESCE(a.bc, 0.0), 6) AS bc
        FROM (SELECT DISTINCT src AS vid FROM edges) t
        LEFT JOIN alldel a ON a.v = t.vid
        ORDER BY t.vid
    """
    )


def q_mis(sf_dir: str) -> pa.Table:
    """Deterministic-Luby maximal independent set (12 fixed rounds —
    :func:`fogray.algorithms.mis`; the oracle unrolls the same 12
    rounds as materialized CTEs, exact even if unconverged, idempotent
    past the fixpoint). in_mis = 1 for members, 0 for excluded (or
    still undecided after 12 rounds — both sides agree by construction)."""
    eng, n = _cooc_engine(sf_dir)
    res = alg.mis(eng, rounds=12)
    ids = _touched(eng)
    return pa.table(
        {
            "vid": ids.astype(np.int64),
            "in_mis": (res.state["status"][ids] == 1.0).astype(np.int64),
        }
    )


def _mis_sql(rounds: int = 12) -> str:
    """Unrolled deterministic-Luby MIS: u{i} = still-undecided vertices
    (with splitmix53(vid) priorities — the same mod-2^64 HUGEINT chain
    as _DET_W_SQL), m{i} = round-i entrants (lexicographic (prio, vid)
    minima over their undecided neighborhood, vertices with no
    undecided neighbor included), u{i+1} = u{i} minus entrants minus
    entrants' neighbors."""
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL}))",
        "vids AS MATERIALIZED (SELECT DISTINCT src AS v FROM edges)",
        "prm AS (SELECT v, CAST(v AS UBIGINT) AS x0 FROM vids)",
        "ps1 AS (SELECT v, xor(x0, x0 >> 30) AS a FROM prm)",
        """ps1m AS (SELECT v, CAST((
            (CAST(a AS HUGEINT) * 484763065 +
             ((CAST(a AS HUGEINT) % 4294967296) * 3210233709 % 4294967296)
             * 4294967296)
            % 18446744073709551616
          ) AS UBIGINT) AS x1 FROM ps1)""",
        "ps2 AS (SELECT v, xor(x1, x1 >> 27) AS b FROM ps1m)",
        """ps2m AS (SELECT v, CAST((
            (CAST(b AS HUGEINT) * 321982955 +
             ((CAST(b AS HUGEINT) % 4294967296) * 2496678331 % 4294967296)
             * 4294967296)
            % 18446744073709551616
          ) AS UBIGINT) AS x2 FROM ps2)""",
        "ps3 AS (SELECT v, xor(x2, x2 >> 31) AS f FROM ps2m)",
        "u0 AS MATERIALIZED (SELECT v, CAST(f >> 11 AS DOUBLE) AS prio FROM ps3)",
    ]
    for i in range(rounds):
        parts.append(f"""m{i} AS MATERIALIZED (
            SELECT u.v FROM u{i} u WHERE NOT EXISTS (
                SELECT 1 FROM edges e JOIN u{i} n ON n.v = e.dst
                WHERE e.src = u.v
                  AND (n.prio < u.prio OR (n.prio = u.prio AND n.v < u.v))))""")
        parts.append(f"""u{i + 1} AS MATERIALIZED (
            SELECT u.v, u.prio FROM u{i} u
            WHERE u.v NOT IN (SELECT v FROM m{i})
              AND NOT EXISTS (
                SELECT 1 FROM edges e JOIN m{i} mm ON mm.v = e.dst
                WHERE e.src = u.v))""")
    member_union = " UNION ALL ".join(f"SELECT v FROM m{i}" for i in range(rounds))
    parts.append(f"members AS MATERIALIZED ({member_union})")
    return (
        ",\n".join(parts)
        + """
        SELECT t.v AS vid,
               CAST(CASE WHEN mem.v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
                   AS in_mis
        FROM vids t LEFT JOIN (SELECT DISTINCT v FROM members) mem
          ON mem.v = t.v
        ORDER BY vid
    """
    )


# splitmix chain shared by the iterative-contraction oracles: emits the
# CTE list computing f = splitmix(x0) (the pre->>11 state) from a column
# x0, with the same staged mod-2^64 HUGEINT arithmetic as _DET_W_SQL.
def _splitmix_ctes(prefix: str, src_cte: str, carry: str) -> str:
    """CTE chain ``{prefix}3`` with columns ``{carry}, f`` computing the
    splitmix finalizer of ``{src_cte}.x0`` (mirrors
    fogray.sources.splitmix53 minus the final ``>> 11``)."""
    return f"""
    {prefix}1 AS (SELECT {carry}, xor(x0, x0 >> 30) AS sm_a FROM {src_cte}),
    {prefix}1m AS (SELECT {carry}, CAST((
        (CAST(sm_a AS HUGEINT) * 484763065 +
         ((CAST(sm_a AS HUGEINT) % 4294967296) * 3210233709 % 4294967296)
         * 4294967296)
        % 18446744073709551616) AS UBIGINT) AS x1 FROM {prefix}1),
    {prefix}2 AS (SELECT {carry}, xor(x1, x1 >> 27) AS sm_b FROM {prefix}1m),
    {prefix}2m AS (SELECT {carry}, CAST((
        (CAST(sm_b AS HUGEINT) * 321982955 +
         ((CAST(sm_b AS HUGEINT) % 4294967296) * 2496678331 % 4294967296)
         * 4294967296)
        % 18446744073709551616) AS UBIGINT) AS x2 FROM {prefix}2),
    {prefix}3 AS (SELECT {carry}, xor(x2, x2 >> 31) AS f FROM {prefix}2m)"""


def _coloring_sql(max_rounds: int = 1000) -> str:
    """Exact DuckDB mirror of :func:`fogray.coloring.jones_plassmann`:
    the synchronous superstep loop is ONE plain recursive CTE whose
    working table carries the full per-vertex color state each round
    (DuckDB 1.0 allows multiple self-references in the recursive term,
    so the round's winners / mex derive from the previous round's full
    state). Rounds are data-dependent (~200 at sf0.01 on the dense
    co-occurrence graph — JP rounds = longest decreasing-priority
    path); the recursion stops at the colored fixpoint, so no unroll
    bound is assumed — ``max_rounds`` is only a runaway brake.
    Priority = rank of splitmix(vid<<32) among touched vertices, ties
    by vid — ROW_NUMBER() OVER (ORDER BY f >> 11, v), order-isomorphic
    to numpy's stable argsort of det_weight(v, 0)."""
    return f"""
WITH RECURSIVE
edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
vids AS MATERIALIZED (SELECT DISTINCT src AS v FROM edges),
pr0 AS (SELECT v, CAST(v AS UBIGINT) * CAST(4294967296 AS UBIGINT) AS x0
        FROM vids),
{_splitmix_ctes("pr", "pr0", "v")},
prio AS MATERIALIZED (
    SELECT v, ROW_NUMBER() OVER (ORDER BY f >> 11, v) - 1 AS p FROM pr3),
st(r, v, p, c) AS (
    SELECT 0, v, p, CAST(-1 AS BIGINT) FROM prio
    UNION ALL
    SELECT s.r + 1, s.v, s.p,
      CASE
        WHEN s.c <> -1 THEN s.c
        WHEN EXISTS (SELECT 1 FROM edges e JOIN st n ON n.v = e.dst
                     WHERE e.src = s.v AND n.c = -1 AND n.p > s.p)
          THEN CAST(-1 AS BIGINT)
        ELSE (SELECT COALESCE(MIN(CASE WHEN cc <> rn THEN rn END), COUNT(*))
              FROM (SELECT cc, ROW_NUMBER() OVER (ORDER BY cc) - 1 AS rn
                    FROM (SELECT DISTINCT n.c AS cc
                          FROM edges e JOIN st n ON n.v = e.dst
                          WHERE e.src = s.v AND n.c >= 0)))
      END
    FROM st s
    WHERE s.r < {max_rounds} AND EXISTS (SELECT 1 FROM st x WHERE x.c = -1)
),
last_r AS (SELECT MAX(r) AS mr FROM st)
SELECT st.v AS vid, st.c AS color FROM st, last_r WHERE st.r = last_r.mr
ORDER BY vid
"""


def _matching_sql(max_rounds: int = 200) -> str:
    """Exact DuckDB mirror of :func:`fogray.matching.greedy_matching`
    (mutual-minimum maximal matching): one recursive CTE whose working
    table holds the alive vertex set (kind 0) and whose result
    accumulates matched pairs (kind 1, emitted by a second UNION ALL
    branch of the compound recursive term). The round's live edges /
    per-vertex min proposals / mutual pairs are local WITH CTEs inside
    the recursive term, shared by both branches. Edge order key is the
    full-precision det_weight(a, b) double, computed bit-identically
    ((f >> 11) / 2^53 * 10 — all three ops exact-or-identically-rounded
    IEEE doubles), ties by (a, b) as in the numpy lexsort."""
    return f"""
WITH RECURSIVE
cooc AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
ew0 AS (SELECT src AS a, dst AS b,
        xor(CAST(src AS UBIGINT) * CAST(4294967296 AS UBIGINT),
            CAST(dst AS UBIGINT)) AS x0
        FROM cooc WHERE src < dst),
{_splitmix_ctes("ew", "ew0", "a, b")},
ew AS MATERIALIZED (
    SELECT a, b, CAST(f >> 11 AS DOUBLE) / 9007199254740992.0 * 10.0 AS h
    FROM ew3),
vids AS MATERIALIZED (SELECT DISTINCT src AS v FROM cooc),
st(r, kind, x, y) AS (
    SELECT 0, 0, v, CAST(NULL AS BIGINT) FROM vids
    UNION ALL
    (
      WITH alive AS (SELECT x AS v FROM st WHERE kind = 0),
      rr AS (SELECT MAX(r) AS r FROM st),
      live AS (SELECT e.a, e.b, e.h FROM ew e
               JOIN alive xa ON xa.v = e.a
               JOIN alive xb ON xb.v = e.b),
      prop AS (SELECT v, a, b FROM (
                 SELECT v, a, b,
                        ROW_NUMBER() OVER (PARTITION BY v ORDER BY h, a, b)
                            AS rn
                 FROM (SELECT a AS v, a, b, h FROM live
                       UNION ALL
                       SELECT b AS v, a, b, h FROM live))
               WHERE rn = 1),
      mut AS (SELECT pa.a, pa.b FROM prop pa
              JOIN prop pb ON pb.v = pa.b AND pb.a = pa.a AND pb.b = pa.b
              WHERE pa.v = pa.a),
      dead AS (SELECT a AS v FROM mut UNION ALL SELECT b FROM mut)
      SELECT rr.r + 1, 0, al.v, CAST(NULL AS BIGINT)
      FROM rr, alive al
      WHERE rr.r < {max_rounds}
        AND al.v NOT IN (SELECT v FROM dead)
        AND EXISTS (SELECT 1 FROM live)
      UNION ALL
      SELECT rr.r + 1, 1, m.a, m.b
      FROM rr, mut m
      WHERE rr.r < {max_rounds}
    )
)
SELECT x AS a, y AS b FROM st WHERE kind = 1 ORDER BY a, b
"""


def _msf_sql(rounds: int = 5) -> str:
    """Exact DuckDB mirror of :func:`fogray.msf.boruvka_msf`: Borůvka
    rounds unrolled as CTE groups (the co-occurrence graph closes in 2
    rounds at every test scale; extra rounds are idempotent no-ops on an
    empty cross-edge set), with each round's hook/pointer-jump label
    resolution as its own recursive pointer-chase CTE — per-component
    min cross edge under the strict (w, a, b) order, hook to the other
    endpoint's component, 2-cycle break keeps the SMALLER id as root,
    then chase parents to the fixpoint roots, exactly the numpy fold."""
    parts = [
        f"cooc AS MATERIALIZED (SELECT src, dst, weight FROM ({_COOC_SQL}))",
        "ew AS MATERIALIZED (SELECT src AS a, dst AS b, weight AS w"
        " FROM cooc WHERE src < dst)",
        "vids AS MATERIALIZED (SELECT DISTINCT src AS v FROM cooc)",
        "comp0 AS (SELECT v, v AS c FROM vids)",
    ]
    for i in range(rounds):
        parts.append(f"""crs{i} AS MATERIALIZED (
            SELECT ca.c AS comp, cb.c AS oth, e.w, e.a, e.b
            FROM ew e JOIN comp{i} ca ON ca.v = e.a
                      JOIN comp{i} cb ON cb.v = e.b
            WHERE ca.c <> cb.c)""")
        parts.append(f"""cand{i} AS MATERIALIZED (
            SELECT comp, oth, w, a, b FROM (
              SELECT comp, oth, w, a, b,
                     ROW_NUMBER() OVER (PARTITION BY comp ORDER BY w, a, b)
                         AS rn
              FROM (SELECT comp, oth, w, a, b FROM crs{i}
                    UNION ALL
                    SELECT oth, comp, w, a, b FROM crs{i}))
            WHERE rn = 1)""")
        parts.append(f"chosen{i} AS (SELECT DISTINCT a, b, w FROM cand{i})")
        parts.append(f"""par0_{i} AS MATERIALIZED (
            SELECT comp AS c, oth AS p FROM cand{i}
            UNION ALL
            SELECT c, c FROM (SELECT DISTINCT c FROM comp{i})
            WHERE c NOT IN (SELECT comp FROM cand{i}))""")
        parts.append(f"""par{i} AS MATERIALIZED (
            SELECT p0.c,
                   CASE WHEN p2.p = p0.c AND p0.c < p0.p THEN p0.c
                        ELSE p0.p END AS p
            FROM par0_{i} p0 JOIN par0_{i} p2 ON p2.c = p0.p)""")
        parts.append(f"""chase{i}(c, p) AS (
            SELECT c, p FROM par{i}
            UNION
            SELECT ch.c, pa.p FROM chase{i} ch JOIN par{i} pa ON pa.c = ch.p)""")
        parts.append(f"""root{i} AS MATERIALIZED (
            SELECT ch.c, ch.p AS root FROM chase{i} ch
            JOIN par{i} pa ON pa.c = ch.p WHERE pa.p = ch.p)""")
        parts.append(f"""comp{i + 1} AS MATERIALIZED (
            SELECT co.v, rt.root AS c FROM comp{i} co
            JOIN root{i} rt ON rt.c = co.c)""")
    union = " UNION ALL ".join(
        f"SELECT a, b, w FROM chosen{i}" for i in range(rounds)
    )
    return (
        "WITH RECURSIVE\n"
        + ",\n".join(parts)
        + f"\nSELECT a, b, w AS weight FROM ({union}) ORDER BY a, b"
    )


def q_sssp_tree(sf_dir: str) -> pa.Table:
    """SSSP over the geo tree (region 0 as source). vid encoding:
    region=r_regionkey, nation=100+n_nationkey, customer=1000+c_custkey;
    weights are small integers derived from keys => exact doubles."""
    # the edge derivation is a per-batch transform over the two source
    # Datasets (union-ed, never concatenated on the driver): the O(rows)
    # customer table flows object-store -> engine actors as blocks
    nation_ds = read_parquet_clean(
        _pq(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    )
    cust_ds = read_parquet_clean(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )

    def nation_edges(t: pa.Table) -> pa.Table:
        nk = t.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        rk = t.column("n_regionkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": rk, "dst": 100 + nk, "weight": (nk % 5 + 1).astype(np.float64)}
        )

    def cust_edges(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": 100 + nk,
                "dst": 1000 + ck,
                "weight": (ck % 10 + 1).astype(np.float64),
            }
        )

    edges = (
        nation_ds.map_batches(nation_edges, batch_format="pyarrow")
        .union(cust_ds.map_batches(cust_edges, batch_format="pyarrow"))
        .materialize()
    )
    mx = edges.max(["src", "dst"])
    n = int(max(mx["max(src)"], mx["max(dst)"])) + 1
    eng = GraphEngine(n, dataset=edges, cfg=EngineConfig(num_partitions=4))
    try:
        res = alg.sssp(eng, source=0)
    finally:
        eng.shutdown()
    v = res.state["value"]
    reached = np.flatnonzero(np.isfinite(v))
    return pa.table(
        {"vid": reached.astype(np.int64), "value": sql_round(v[reached])}
    )


def q_spmv(sf_dir: str) -> pa.Table:
    eng, n = _cooc_engine(sf_dir)
    res = alg.spmv(eng)
    y = res.state["spmv_value"]
    ids = np.flatnonzero(eng.indeg > 0)
    return pa.table({"vid": ids.astype(np.int64), "spmv_value": sql_round(y[ids])})


def q_triangle_count(sf_dir: str) -> pa.Table:
    t = cooccurrence_edges(sf_dir)
    eng_src = t.column("src").to_numpy(zero_copy_only=False)
    n = int(max(eng_src.max(), t.column("dst").to_numpy(zero_copy_only=False).max())) + 1
    cnt = triangle_count(
        (eng_src, t.column("dst").to_numpy(zero_copy_only=False)), n
    )
    return pa.table({"triangles": np.array([cnt], dtype=np.int64)})


def q_clustering(sf_dir: str) -> pa.Table:
    """Per-vertex triangle count + local clustering coefficient
    c(v) = 2*tri(v) / (deg(v)*(deg(v)-1)) over the undirected simple
    co-occurrence graph (fogray.triangles.triangle_per_vertex)."""
    from .triangles import triangle_per_vertex

    t = cooccurrence_edges(sf_dir)
    src = t.column("src").to_numpy(zero_copy_only=False)
    dst = t.column("dst").to_numpy(zero_copy_only=False)
    n = int(max(src.max(), dst.max())) + 1 if len(src) else 1
    vids, tri, deg = triangle_per_vertex((src, dst), n)
    d = deg.astype(np.float64)
    coeff = np.where(deg >= 2, 2.0 * tri / np.maximum(d * (d - 1.0), 1.0), 0.0)
    return pa.table(
        {
            "vid": pa.array(vids),
            "n_tri": pa.array(tri),
            "clustering": pa.array(sql_round(coeff)),
        }
    )


def q_scan_similarity(sf_dir: str) -> pa.Table:
    """Edge-wise structural similarity over the undirected simple
    co-occurrence graph (the SCAN metric family, Xu et al. 2007 —
    public algorithm; no FOG counterpart): for every simple edge
    (u < v), the Jaccard of the OPEN neighborhoods,
    common / (deg(u) + deg(v) - 2 - common), 0 when the denominator
    is 0. Built on the per-edge triangle attribution
    (fogray.triangles.triangle_per_edge — the same broadcast rank-CSR
    closure as triangle counting, so cost is bounded by wedge volume,
    never by all vertex pairs)."""
    from .triangles import triangle_per_edge

    ds, n = cooccurrence_edges_ds(sf_dir)
    a, b, common, deg = triangle_per_edge(ds.select_columns(["src", "dst"]), n)
    denom = deg[a] + deg[b] - 2 - common
    j = np.where(denom > 0, common / np.maximum(denom, 1), 0.0)
    return pa.table(
        {
            "u": pa.array(a.astype(np.int64)),
            "v": pa.array(b.astype(np.int64)),
            "similarity": pa.array(sql_round(j)),
        }
    )


def q_assortativity(sf_dir: str) -> pa.Table:
    """Degree assortativity of the directed co-occurrence graph —
    Pearson r of (outdeg[src], indeg[dst]) across edges
    (fogray.metrics.degree_assortativity): shuffle-free exact-int
    moment partials over the edge Dataset, degree arrays reused from
    the session engine's distributed build."""
    from .metrics import degree_assortativity

    eng, n = _cooc_engine(sf_dir)
    ds, _ = cooccurrence_edges_ds(sf_dir)
    r = degree_assortativity(
        ds.select_columns(["src", "dst"]), eng.outdeg, eng.indeg
    )
    val = pa.array(
        [None] if r is None else [float(sql_round(r))], pa.float64()
    )
    return pa.table({"assortativity": val})


@functools.lru_cache(maxsize=2)
def _aa_full_cached(sf_dir: str, _session: str) -> pa.Table:
    """ONE extra_scores adamic-adar run per (sf_dir, session) serves
    both link-prediction queries: the top-50 by the all-integer
    (cn DESC, u, v) order is a prefix of the top-100, so adamic_adar
    projects columns and link_predict takes the head — the pipeline is
    deterministic and was the suite's second-largest duplicated cost."""
    from .metrics import adamic_adar

    ds, n = cooccurrence_edges_ds(sf_dir)
    return adamic_adar(
        ds.select_columns(["src", "dst"]), n, k=_AA_K, extra_scores=True
    )


def q_adamic_adar(sf_dir: str) -> pa.Table:
    """Link prediction over the simple co-occurrence graph: top-100
    non-adjacent pairs by common-neighbor count with Adamic-Adar scores
    (fogray.metrics.adamic_adar; exact — no apex cap at gate scale)."""
    return _aa_full_cached(sf_dir, _ray_session_key()).select(
        ["u", "v", "cn", "aa", "rk"]
    )


_AA_K = 100
_LP_K = 50


def q_link_predict(sf_dir: str) -> pa.Table:
    """Link-prediction score suite over the simple co-occurrence graph:
    the top-50 non-adjacent pairs by common-neighbor count with
    Adamic-Adar, resource-allocation (Σ 1/deg over common neighbors)
    and preferential-attachment (deg·deg) scores
    (fogray.metrics.adamic_adar with extra_scores — same dataflow, two
    more fold columns and one O(V) degree fold; shares the session's
    one extra_scores run with q_adamic_adar)."""
    return _aa_full_cached(sf_dir, _ray_session_key()).slice(0, _LP_K)


def q_two_hop(sf_dir: str) -> pa.Table:
    """Distinct two-hop neighborhood size per vertex
    (fogray.metrics.two_hop_size; broadcast-CSR work-balanced chunks)."""
    from .metrics import two_hop_size

    ds, n = cooccurrence_edges_ds(sf_dir)
    return two_hop_size(ds.select_columns(["src", "dst"]), n)


def q_modularity(sf_dir: str) -> pa.Table:
    """Newman modularity of the part-brand partition over the
    co-occurrence graph (fogray.metrics.partition_modularity) — do
    parts of the same brand co-occur more than degree chance predicts?
    The vid→brand map is the broadcast small side; edge blocks emit
    exact int64 (community, internal, degree) partials."""
    import ray

    from .metrics import partition_modularity

    part = read_parquet_clean(
        _pq(sf_dir, "part"), columns=["p_partkey", "p_brand"]
    ).to_pandas()
    vids = part["p_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(vids, kind="stable")
    vids = vids[order]
    brands = part["p_brand"].to_numpy()[order]
    cats = np.unique(brands)
    codes = np.searchsorted(cats, brands).astype(np.int64)
    ref = ray.put((vids, codes, len(cats)))
    ds, n = cooccurrence_edges_ds(sf_dir)
    return partition_modularity(ds, ref)


def q_transitivity(sf_dir: str) -> pa.Table:
    """Global clustering coefficient (transitivity): 3·triangles /
    wedges, wedges = Σ d(d-1)/2 over simple-graph degrees (the
    co-occurrence edge set is already symmetric + distinct, so the
    engine's setup-time out-degrees ARE the simple degrees)."""
    t = cooccurrence_edges(sf_dir)
    src = t.column("src").to_numpy(zero_copy_only=False)
    dst = t.column("dst").to_numpy(zero_copy_only=False)
    n = int(max(src.max(), dst.max())) + 1
    tri = int(triangle_count((src, dst), n))
    eng, _ = _cooc_engine(sf_dir)
    d = eng.outdeg.astype(np.int64)
    wedges = int((d * (d - 1) // 2).sum())
    val = float(sql_round(np.array([(3.0 * tri) / wedges if wedges else 0.0]))[0])
    return pa.table(
        {
            "triangles": pa.array([tri], pa.int64()),
            "wedges": pa.array([wedges], pa.int64()),
            "transitivity": pa.array([val], pa.float64()),
        }
    )


def q_ktruss(sf_dir: str) -> pa.Table:
    """Bounded k-truss peeling over the simple co-occurrence graph
    (k=10, 4 fixed rounds — fogray.triangles.ktruss_edges): the
    multi-pass edge-peeling analog of SCC/k-core's vertex loops. The
    fixed round count makes the result exactly mirrorable by the
    unrolled SQL oracle regardless of convergence (peeling is monotone,
    so the two definitions coincide once a round removes nothing)."""
    from .triangles import ktruss_edges

    ds, n = cooccurrence_edges_ds(sf_dir)
    a, b = ktruss_edges(ds.select_columns(["src", "dst"]), n, k=_KTRUSS_K,
                        rounds=_KTRUSS_ROUNDS)
    return pa.table(
        {"u": pa.array(a.astype(np.int64)), "v": pa.array(b.astype(np.int64))}
    )


_KTRUSS_K = 10  # sf0.01 median support is 10 => a real peel at gate scale
_KTRUSS_ROUNDS = 4


def _ktruss_sql(k: int, rounds: int) -> str:
    """Unrolled DuckDB mirror of :func:`q_ktruss`: round i recomputes
    per-edge support over und{i} via the triangle CTE and keeps edges
    with support >= k-2 (edges in no triangle vanish through the inner
    join, exactly the engine's common < k-2 drop for k > 2)."""
    parts = [
        f"""und0 AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ({_COOC_SQL}) WHERE src <> dst
        )"""
    ]
    for i in range(rounds):
        parts.append(f"""tri{i} AS MATERIALIZED (
            SELECT p1.a AS x, p1.b AS y, p2.b AS z
            FROM und{i} p1
            JOIN und{i} p2 ON p2.a = p1.a AND p2.b > p1.b
            JOIN und{i} p3 ON p3.a = p1.b AND p3.b = p2.b
        )""")
        parts.append(f"""sup{i} AS MATERIALIZED (
            SELECT a, b, COUNT(*) AS c FROM (
                SELECT x AS a, y AS b FROM tri{i}
                UNION ALL SELECT x, z FROM tri{i}
                UNION ALL SELECT y, z FROM tri{i}) GROUP BY a, b
        )""")
        parts.append(f"""und{i + 1} AS MATERIALIZED (
            SELECT u.a, u.b FROM und{i} u
            JOIN sup{i} s ON s.a = u.a AND s.b = u.b
            WHERE s.c >= {k - 2}
        )""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT a AS u, b AS v FROM und{rounds} ORDER BY u, v"
    )


def q_src_edgelist(sf_dir: str) -> pa.Table:
    """Round-trip conformance for the SNAP text reader
    (fogray.sources.read_edgelist): serialize the co-occurrence graph as
    an edge-list text fixture (scratch under /tmp), parse it back with
    the distributed reader, return the (src, dst) pairs."""
    import os

    from . import sources

    parsed = pa.concat_tables(_collect(sources.read_edgelist(_edgelist_fixture(sf_dir))))
    return sorted_table(parsed.select(["src", "dst"]), ["src", "dst"])


@functools.lru_cache(maxsize=4)
def _edgelist_fixture(sf_dir: str) -> str:
    """Serialize the co-occurrence graph as an edge-list text fixture
    (scratch under /tmp, atomic) — shared by the reader round-trips
    (src_edgelist / det_weights). Cached per sf_dir: the graph is
    deterministic, so the three fixture consumers pay the sort+write
    once per process; written via pyarrow.csv (~10x pandas to_csv).
    Written as a DIRECTORY of shards: ray.data.read_text cannot split
    a single text file, so a one-file fixture serialized the whole
    parse into one task."""
    import pyarrow.csv as pacsv

    t = sorted_table(cooccurrence_edges(sf_dir), ["src", "dst"])
    base = f"/tmp/fogray_edgelist_{os.path.basename(sf_dir.rstrip('/'))}"
    tmp = f"{base}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    shards = max(1, min(32, t.num_rows // 50_000))
    for i in range(shards):
        a = (t.num_rows * i) // shards
        b = (t.num_rows * (i + 1)) // shards
        with pa.OSFile(os.path.join(tmp, f"part-{i:05d}.txt"), "wb") as f:
            if i == 0:
                f.write(b"# fogray edge-list round-trip fixture\n")
            pacsv.write_csv(
                t.select(["src", "dst"]).slice(a, b - a),
                f,
                pacsv.WriteOptions(include_header=False, delimiter="\t"),
            )
    if os.path.isdir(base):
        import shutil

        shutil.rmtree(base)
    os.replace(tmp, base)
    return base


@functools.lru_cache(maxsize=4)
def _csv_fixture(sf_dir: str) -> str:
    """Sharded CSV fixture (src,dst with header per shard) of the
    co-occurrence graph — scratch under /tmp, atomic, cached."""
    import pyarrow.csv as pacsv

    t = sorted_table(cooccurrence_edges(sf_dir), ["src", "dst"]).select(["src", "dst"])
    base = f"/tmp/fogray_csv_{os.path.basename(sf_dir.rstrip('/'))}"
    tmp = f"{base}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    shards = max(1, min(16, t.num_rows // 50_000))
    for i in range(shards):
        a = (t.num_rows * i) // shards
        b = (t.num_rows * (i + 1)) // shards
        pacsv.write_csv(t.slice(a, b - a), os.path.join(tmp, f"part-{i:05d}.csv"))
    if os.path.isdir(base):
        import shutil

        shutil.rmtree(base)
    os.replace(tmp, base)
    return base


@functools.lru_cache(maxsize=4)
def _jsonl_fixture(sf_dir: str) -> str:
    """Sharded JSONL fixture of the co-occurrence graph — scratch under
    /tmp, atomic, cached. Serialized via pandas to_json(lines=True)."""
    t = sorted_table(cooccurrence_edges(sf_dir), ["src", "dst"]).select(["src", "dst"])
    base = f"/tmp/fogray_jsonl_{os.path.basename(sf_dir.rstrip('/'))}"
    tmp = f"{base}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    df = t.to_pandas()
    shards = max(1, min(16, len(df) // 50_000))
    for i in range(shards):
        a = (len(df) * i) // shards
        b = (len(df) * (i + 1)) // shards
        df.iloc[a:b].to_json(
            os.path.join(tmp, f"part-{i:05d}.json"), orient="records", lines=True
        )
    if os.path.isdir(base):
        import shutil

        shutil.rmtree(base)
    os.replace(tmp, base)
    return base


def q_src_csv(sf_dir: str) -> pa.Table:
    """Round-trip conformance for the CSV edge source
    (fogray.sources.read_edges_csv)."""
    from . import sources

    parsed = pa.concat_tables(_collect(sources.read_edges_csv(_csv_fixture(sf_dir))))
    return sorted_table(parsed.select(["src", "dst"]), ["src", "dst"])


def q_src_jsonl(sf_dir: str) -> pa.Table:
    """Round-trip conformance for the JSONL edge source
    (fogray.sources.read_edges_jsonl)."""
    from . import sources

    parsed = pa.concat_tables(
        _collect(sources.read_edges_jsonl(_jsonl_fixture(sf_dir)))
    )
    return sorted_table(parsed.select(["src", "dst"]), ["src", "dst"])


def q_src_adjlist(sf_dir: str) -> pa.Table:
    """Round-trip conformance for the adjacency-list reader
    (fogray.sources.read_adjlist, convert/process_adjlist.cpp:32-271):
    serialize the co-occurrence graph as ``src n d1 d2 ...`` lines,
    parse back distributed, return the (src, dst) pairs."""
    from . import sources

    t = sorted_table(cooccurrence_edges(sf_dir), ["src", "dst"])
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]]) if len(s) else np.empty(0, np.int64)
    ends = np.r_[starts[1:], len(s)]
    path = f"/tmp/fogray_adjlist_{os.path.basename(sf_dir.rstrip('/'))}.txt"
    with open(path + ".tmp", "w") as f:
        f.write("# fogray adjacency-list round-trip fixture\n")
        for a, b in zip(starts, ends):
            f.write(f"{s[a]} {b - a} " + " ".join(map(str, d[a:b])) + "\n")
    os.replace(path + ".tmp", path)
    parsed = pa.concat_tables(_collect(sources.read_adjlist(path)))
    return sorted_table(parsed.select(["src", "dst"]), ["src", "dst"])


def q_det_weights(sf_dir: str) -> pa.Table:
    """S6 conformance: the deterministic splitmix edge weights
    (fogray.sources.det_weight — the reproducible replacement for
    convert's rand(), process_adjlist.cpp:25-30), generated INSIDE the
    distributed weighted-edgelist reader and checked against a DuckDB
    oracle that reproduces the hash exactly with HUGEINT mod-2^64
    arithmetic."""
    from . import sources

    parsed = pa.concat_tables(
        _collect(sources.read_edgelist(_edgelist_fixture(sf_dir), weighted=True))
    )
    t = sorted_table(parsed, ["src", "dst"])
    return pa.table(
        {
            "src": t.column("src"),
            "dst": t.column("dst"),
            "w": sql_round(t.column("weight").to_numpy(zero_copy_only=False)),
        }
    )


def q_graph_meta(sf_dir: str) -> pa.Table:
    """S7 conformance: the ``.desc`` metadata facts
    (fogray.sources.graph_meta, convert/convert.cpp:144-153) computed
    by distributed aggregates over the co-occurrence edge Dataset."""
    from . import sources

    ds, _n = cooccurrence_edges_ds(sf_dir)
    meta = sources.graph_meta(ds)
    return pa.table(
        {
            "min_vertex_id": pa.array([meta["min_vertex_id"]], pa.int64()),
            "max_vertex_id": pa.array([meta["max_vertex_id"]], pa.int64()),
            "num_edges": pa.array([meta["num_edges"]], pa.int64()),
            "max_out_edges": pa.array([meta["max_out_edges"]], pa.int64()),
        }
    )


_WALK_STEPS = 6


_BIASED_STEPS = 5


def q_biased_walks(sf_dir: str) -> pa.Table:
    """node2vec-style biased second-order walks over the co-occurrence
    graph (fogray.walks.biased_walks): integer weights (return 1 /
    triangle-closing 4 / exploring 2, i.e. p=2, q=2 scaled integral),
    checked bit-for-bit against the unrolled weighted-pick DuckDB
    mirror. Dataset shard path — edges never land on the driver."""
    from . import walks

    ds, _n = cooccurrence_edges_ds(sf_dir)
    return sorted_table(
        walks.biased_walks(ds, num_steps=_BIASED_STEPS), ["wid", "step"]
    )


def q_graph_walks(sf_dir: str) -> pa.Table:
    """Deterministic DeepWalk-style walk corpus over the co-occurrence
    graph: one walk per vertex, _WALK_STEPS splitmix-chosen steps
    (fogray.walks.random_walks) — checked bit-for-bit against a
    recursive-CTE DuckDB mirror. Uses the Dataset shard path: the edge
    table never materializes on the driver."""
    from . import walks

    ds, _n = cooccurrence_edges_ds(sf_dir)
    return sorted_table(
        walks.random_walks(ds, num_steps=_WALK_STEPS), ["wid", "step"]
    )


_FANOUT = 4


def q_sample_fanout(sf_dir: str) -> pa.Table:
    """GraphSAGE-layer neighbor sampling over the co-occurrence graph:
    per-vertex ≤4 out-neighbors by ascending splitmix53((src<<32)^dst)
    (fogray.walks.sample_fanout) — per-block partial top-k, ONE sort,
    group-complete global pick. The oracle ranks by the identical
    staged mod-2^64 HUGEINT splitmix mirror."""
    from . import walks

    ds, _n = cooccurrence_edges_ds(sf_dir)
    t = pa.concat_tables(
        _collect(walks.sample_fanout(ds.select_columns(["src", "dst"]), fanout=_FANOUT))
    )
    return sorted_table(t, ["src", "rk"])


def q_four_cycles(sf_dir: str) -> pa.Table:
    """Exact 4-cycle (butterfly diagonal) count over the simple
    co-occurrence graph (fogray.metrics.four_cycles): the adamic-adar
    wedge dataflow with adjacent pairs kept, folded to ½ Σ C(cn, 2)."""
    from .metrics import four_cycles

    ds, n = cooccurrence_edges_ds(sf_dir)
    return four_cycles(ds.select_columns(["src", "dst"]), n)


def q_salsa(sf_dir: str) -> pa.Table:
    """SALSA hub/authority scores after 4 iterations over the DIRECTED
    part-sequence graph (fogray.algorithms.salsa: degree-normalized
    HITS — auth(v) = Σ_in hub/outdeg, hub(u) = Σ_out auth/indeg; no
    normalization, the walk conserves mass). The oracle unrolls the
    same half-steps as materialized CTEs with identical per-edge
    h/outdeg divisions."""
    eng, n = _engine_for(sequence_edges(sf_dir), weights=False)
    try:
        res = alg.salsa(eng, niters=4)
        ids = _touched(eng)
        return pa.table(
            {
                "vid": ids.astype(np.int64),
                "hub": sql_round(res.state["hub"][ids]),
                "auth": sql_round(res.state["auth"][ids]),
            }
        )
    finally:
        eng.shutdown()


def _salsa_sql(niters: int = 4) -> str:
    """Unrolled SALSA mirror over the sequence graph: a{i}(v) =
    Σ_in h{i-1}(u)/outdeg(u), h{i}(u) = Σ_out a{i}(v)/indeg(v), from
    h0 = 1; empty sums COALESCE to 0 (zero-outdeg hubs, zero-indeg
    authorities)."""
    parts = [
        f"""WITH edges AS MATERIALIZED ({_SEQ_SQL}),
        od AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
        idg AS (SELECT dst, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY dst),
        verts AS MATERIALIZED (
            SELECT DISTINCT v FROM (
                SELECT src AS v FROM edges UNION SELECT dst FROM edges)
        ),
        h0 AS (SELECT v, CAST(1.0 AS DOUBLE) AS h FROM verts)"""
    ]
    for i in range(1, niters + 1):
        parts.append(f"""a{i} AS MATERIALIZED (
            SELECT t.v, COALESCE(SUM(p.h / od.d), 0.0) AS a
            FROM verts t
            LEFT JOIN edges e ON e.dst = t.v
            LEFT JOIN od ON od.src = e.src
            LEFT JOIN h{i - 1} p ON p.v = e.src
            GROUP BY t.v)""")
        parts.append(f"""h{i} AS MATERIALIZED (
            SELECT t.v, COALESCE(SUM(p.a / idg.d), 0.0) AS h
            FROM verts t
            LEFT JOIN edges e ON e.src = t.v
            LEFT JOIN idg ON idg.dst = e.dst
            LEFT JOIN a{i} p ON p.v = e.dst
            GROUP BY t.v)""")
    return (
        ",\n".join(parts)
        + f"""
        SELECT v AS vid, ROUND(h{niters}.h, 6) AS hub, ROUND(a{niters}.a, 6) AS auth
        FROM verts JOIN h{niters} USING (v) JOIN a{niters} USING (v)
        ORDER BY vid
    """
    )


_SNP_K = 50


def q_bib_coupling(sf_dir: str) -> pa.Table:
    """Bibliographic coupling over the directed sequence graph: top-50
    src pairs by shared out-neighbors
    (fogray.metrics.shared_neighbor_pairs, mode="out")."""
    from .metrics import shared_neighbor_pairs

    t = sequence_edges(sf_dir)
    return shared_neighbor_pairs(
        (t.column("src").to_numpy(zero_copy_only=False),
         t.column("dst").to_numpy(zero_copy_only=False)),
        _seq_n(t), k=_SNP_K, mode="out",
    )


def q_co_citation(sf_dir: str) -> pa.Table:
    """Co-citation over the directed sequence graph: top-50 dst pairs
    by shared in-neighbors (shared_neighbor_pairs, mode="in")."""
    from .metrics import shared_neighbor_pairs

    t = sequence_edges(sf_dir)
    return shared_neighbor_pairs(
        (t.column("src").to_numpy(zero_copy_only=False),
         t.column("dst").to_numpy(zero_copy_only=False)),
        _seq_n(t), k=_SNP_K, mode="in",
    )


def _seq_n(t: pa.Table) -> int:
    if t.num_rows == 0:
        return 1
    return int(
        max(
            t.column("src").to_numpy(zero_copy_only=False).max(),
            t.column("dst").to_numpy(zero_copy_only=False).max(),
        )
    ) + 1


def _md5_bucket_rho(vids: np.ndarray, m_bits: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Per-vid HLL register (bucket, rho) from md5 hex — the identical
    integer-exact hex-run rule as the sketch oracles (first hex char =
    bucket over 16; rho = 4·(leading-'0' run of the 31-char tail) +
    position of the first set bit in the next hex char; 125 caps the
    all-zero tail). O(V) driver-side at gate scale; a corpus-scale run
    computes this inside map_batches."""
    import hashlib

    bucket = np.empty(len(vids), dtype=np.int64)
    rho = np.empty(len(vids), dtype=np.int64)
    for i, v in enumerate(vids):
        hx = hashlib.md5(str(int(v)).encode()).hexdigest()
        bucket[i] = int(hx[0], 16)
        tail = hx[1:]
        z = len(tail) - len(tail.lstrip("0"))
        if z >= len(tail):
            rho[i] = 125
        else:
            c = int(tail[z], 16)
            rho[i] = 4 * z + (1 if c >= 8 else 2 if c >= 4 else 3 if c >= 2 else 4)
    return bucket, rho


def q_anf_reach(sf_dir: str) -> pa.Table:
    """ANF/HyperBall 2-hop neighborhood-size estimate per vertex over
    the DIRECTED sequence graph (fogray.algorithms.anf_registers): each
    vertex's single md5 HLL register max-propagates along in-edges for
    2 hops (16 buckets × 2 hops engine MIN supersteps on negated
    registers — exact small-integer floats), then the standard
    bias-corrected HLL estimator with the linear-counting small-range
    branch scores each row. The oracle unrolls the same propagation as
    sparse (v, bucket, MAX rho) CTEs and applies the identical
    estimator expression."""
    eng, n = _engine_for(sequence_edges(sf_dir), weights=False)
    try:
        ids = _touched(eng)
        bucket = np.full(n, -1, dtype=np.int64)
        rho = np.zeros(n, dtype=np.int64)
        b_t, r_t = _md5_bucket_rho(ids)
        bucket[ids], rho[ids] = b_t, r_t
        regs = alg.anf_registers(eng, bucket, rho, m=16, hops=2)
        r = regs[ids]  # (|touched|, 16)
        total = np.power(2.0, -r).sum(axis=1)  # exact powers of two
        zeros = (r == 0).sum(axis=1)
        raw = 0.673 * 256.0 / total
        lin = zeros > 0
        est = np.where(
            (raw <= 40.0) & lin,
            16.0 * np.log(16.0 / np.maximum(zeros, 1)),
            raw,
        )
        return pa.table(
            {"vid": ids.astype(np.int64), "reach_est": sql_round(est)}
        )
    finally:
        eng.shutdown()


def q_degree_powerlaw(sf_dir: str) -> pa.Table:
    """Continuous power-law MLE over the co-occurrence out-degree
    distribution (Clauset-Shalizi-Newman 2009 eq. 3.1):
    alpha = 1 + n / Σ ln(d / dmin) over degrees >= dmin = 2. Degrees
    are the engine's O(V) setup arrays — no edge pass; the fold is one
    exact Σ ln over the degree vector, mirrored term-for-term by SQL."""
    eng, n = _cooc_engine(sf_dir)
    d = eng.outdeg[eng.outdeg >= 2].astype(np.float64)
    cnt = int(len(d))
    if cnt == 0:
        return pa.table(
            {"n_tail": pa.array([0], pa.int64()),
             "alpha": pa.array([None], pa.float64())}
        )
    alpha = 1.0 + cnt / np.log(d / 2.0).sum()
    return pa.table(
        {
            "n_tail": pa.array([cnt], pa.int64()),
            "alpha": pa.array(sql_round(np.array([alpha])), pa.float64()),
        }
    )


def q_wl_colors(sf_dir: str) -> pa.Table:
    """2-round 1-WL color refinement over the directed sequence graph
    (fogray.metrics.wl_refinement) — the per-vertex isomorphism feature
    a graph-ML pipeline hashes before training; the oracle rebuilds the
    identical colors with ordered string_agg + md5."""
    from .metrics import wl_refinement

    t = sequence_edges(sf_dir)
    ids, cols = wl_refinement(
        (t.column("src").to_numpy(zero_copy_only=False),
         t.column("dst").to_numpy(zero_copy_only=False)),
        _seq_n(t), rounds=2,
    )
    return pa.table(
        {"vid": pa.array(ids.astype(np.int64)),
         "wl_color": pa.array([str(c) for c in cols], pa.string())}
    )


def q_densest(sf_dir: str) -> pa.Table:
    """Batched densest-subgraph peeling trajectory over the simple
    co-occurrence graph (fogray.metrics.densest_subgraph_rounds,
    4 rounds of the exact-integer deg·V ≤ 2E drop)."""
    from .metrics import densest_subgraph_rounds

    ds, n = cooccurrence_edges_ds(sf_dir)
    return densest_subgraph_rounds(ds.select_columns(["src", "dst"]), n, rounds=4)


def q_reciprocity(sf_dir: str) -> pa.Table:
    """Edge reciprocity of the DIRECTED part-sequence graph
    (fogray.metrics.edge_reciprocity): block-local unordered-pair
    pre-combine, ONE (a, b) sort, O(blocks) scalar partials."""
    from .metrics import edge_reciprocity

    t = sequence_edges(sf_dir)
    return edge_reciprocity(
        (
            t.column("src").to_numpy(zero_copy_only=False),
            t.column("dst").to_numpy(zero_copy_only=False),
        )
    )


def q_motif_triads(sf_dir: str) -> pa.Table:
    """Directed closed-triad census (cycle vs transitive) of the part
    sequence graph (fogray.metrics.triad_census: mid-keyed wedge
    expansion + fused-key membership fold, two sorts total)."""
    from .metrics import triad_census

    t = sequence_edges(sf_dir)
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    n = int(max(s.max(), d.max())) + 1 if len(s) else 1
    return triad_census((s, d), n)


def q_scc_condensation(sf_dir: str) -> pa.Table:
    """Condensation-DAG summary of a sequence SUBGRAPH's strongly
    connected components: top-10 components by (size DESC, root ASC)
    with each component's DISTINCT outgoing condensation edges. The
    full sequence graph is one giant SCC (a degenerate condensation),
    so the graph here keeps the forward skeleton plus only every 7th
    part's back-edges (src < dst OR src % 7 = 0 — deterministic,
    mirrored by the oracle; 272 components at sf0.01). Builds on the
    engine's fwd-bwd SCC labels (alg.scc) — the cross-pair dedup and
    size histogram are O(V + distinct pairs) numpy folds over the
    broadcast label array."""
    full = sequence_edges(sf_dir)
    fs = full.column("src").to_numpy(zero_copy_only=False)
    fd = full.column("dst").to_numpy(zero_copy_only=False)
    keep = (fs < fd) | (fs % 7 == 0)
    t = pa.table({"src": fs[keep], "dst": fd[keep]})
    eng, n = _engine_for(t, weights=False)
    try:
        res = alg.scc(eng)
    finally:
        eng.shutdown()
    comp = res.state["component_root"].astype(np.int64)
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    ra, rb = comp[s], comp[d]
    m = ra != rb
    pairs = np.unique(ra[m] * np.int64(n) + rb[m])
    ids = _touched(eng)
    roots, sizes = np.unique(comp[ids], return_counts=True)
    cross = np.zeros(n, dtype=np.int64)
    if len(pairs):
        np.add.at(cross, (pairs // n).astype(np.int64), 1)
    order = np.lexsort((roots, -sizes))[:10]
    roots, sizes = roots[order], sizes[order]
    return pa.table(
        {
            "component_root": pa.array(roots.astype(np.int64)),
            "size": pa.array(sizes.astype(np.int64)),
            "cross_out": pa.array(cross[roots].astype(np.int64)),
        }
    )


def q_lpa_freq(sf_dir: str) -> pa.Table:
    """Frequency-based (mode) community label propagation, 4 synchronous
    rounds over the DIRECTED part-sequence graph
    (fogray.metrics.lpa_mode_rounds — distinct from the engine's
    min-label FOG cc semantics; the sparse directed graph keeps real
    community structure where the dense co-occurrence blob collapses to
    one label)."""
    from .metrics import lpa_mode_rounds

    t = sequence_edges(sf_dir)
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    n = int(max(s.max(), d.max())) + 1 if len(s) else 1
    return lpa_mode_rounds((s, d), n, rounds=4)


def q_msf(sf_dir: str) -> pa.Table:
    """Borůvka minimum spanning forest of the weighted co-occurrence
    graph (fogray.msf.boruvka_msf). Unique under the strict
    (weight, a, b) edge order; oracle = :func:`_msf_sql` (unrolled
    Borůvka rounds with recursive pointer-chase label resolution),
    cross-checked against the pure-python Kruskal in
    tests/test_queries.py."""
    from .msf import boruvka_msf

    ds, n = cooccurrence_edges_ds(sf_dir)
    return boruvka_msf(ds, n)


def q_coloring(sf_dir: str) -> pa.Table:
    """Jones-Plassmann greedy coloring of the co-occurrence graph
    (fogray.coloring.jones_plassmann). Deterministic; oracle =
    :func:`_coloring_sql`, a recursive CTE that carries the full
    per-vertex color state per superstep (round count data-dependent,
    no unroll bound), cross-checked against the pure-python replica in
    tests/test_queries.py."""
    from .coloring import jones_plassmann

    ds, n = cooccurrence_edges_ds(sf_dir)
    return jones_plassmann(ds.select_columns(["src", "dst"]), n)


def q_matching(sf_dir: str) -> pa.Table:
    """Mutual-minimum greedy maximal matching of the co-occurrence
    graph (fogray.matching.greedy_matching). Deterministic under the
    splitmix edge hash; oracle = :func:`_matching_sql`, a recursive CTE
    carrying the alive set and accumulating matched pairs per round,
    cross-checked against the pure-python replica in
    tests/test_queries.py."""
    from .matching import greedy_matching

    ds, n = cooccurrence_edges_ds(sf_dir)
    return greedy_matching(ds.select_columns(["src", "dst"]), n)


def q_scc(sf_dir: str) -> pa.Table:
    eng, n = _engine_for(sequence_edges(sf_dir), weights=False)
    try:
        res = alg.scc(eng)
    finally:
        eng.shutdown()
    ids = _touched(eng)
    return pa.table(
        {
            "vid": ids.astype(np.int64),
            "component_root": res.state["component_root"][ids].astype(np.int64),
        }
    )


# Exact SQL mirror of fogray.sources.det_weight (splitmix-style hash):
# every mod-2^64 multiply is HUGEINT arithmetic split into 32-bit halves
# (a*C mod 2^64 = a*C_lo + ((a mod 2^32)*C_hi mod 2^32)<<32, mod 2^64);
# xor/shift are native UBIGINT ops. Matches numpy bit-for-bit for
# vertex ids < 2^32 (the reader's id range).
_DET_W_SQL = """
    WITH m AS (
      SELECT src, dst,
        xor(CAST(src AS UBIGINT) * CAST(4294967296 AS UBIGINT),
            CAST(dst AS UBIGINT)) AS x0
      FROM __EDGES__
    ), s1 AS (
      SELECT src, dst, xor(x0, x0 >> 30) AS a FROM m
    ), s1m AS (
      SELECT src, dst, CAST((
          (CAST(a AS HUGEINT) * 484763065 +
           ((CAST(a AS HUGEINT) % 4294967296) * 3210233709 % 4294967296)
           * 4294967296)
          % 18446744073709551616
        ) AS UBIGINT) AS x1 FROM s1
    ), s2 AS (
      SELECT src, dst, xor(x1, x1 >> 27) AS b FROM s1m
    ), s2m AS (
      SELECT src, dst, CAST((
          (CAST(b AS HUGEINT) * 321982955 +
           ((CAST(b AS HUGEINT) % 4294967296) * 2496678331 % 4294967296)
           * 4294967296)
          % 18446744073709551616
        ) AS UBIGINT) AS x2 FROM s2
    ), s3 AS (
      SELECT src, dst, xor(x2, x2 >> 31) AS f FROM s2m
    )
    SELECT src, dst,
           ROUND(CAST(f >> 11 AS DOUBLE) / 9007199254740992.0 * 10.0, 6) AS w
    FROM s3
"""


def _walks_oracle_sql(num_steps: int = 6) -> str:
    """DuckDB mirror of :func:`fogray.walks.random_walks` on the
    co-occurrence graph: neighbor rank by ascending dst (ROW_NUMBER),
    per-(walker, step) splitmix53 hash precomputed by the same staged
    mod-2^64 HUGEINT CTE chain as ``_DET_W_SQL``, then a recursive CTE
    advances every walk ``a.idx = h % deg`` steps until ``num_steps``;
    a vertex with no out-edges simply finds no adj row and halts, like
    the engine's -1."""
    return f"""
    WITH RECURSIVE
    edges AS MATERIALIZED ({_COOC_SQL}),
    adj AS MATERIALIZED (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
               COUNT(*) OVER (PARTITION BY src) AS deg
        FROM edges
    ),
    hw AS (SELECT DISTINCT src AS wid FROM edges),
    hp AS (
        SELECT wid, CAST(k AS BIGINT) AS step,
               xor(CAST(wid AS UBIGINT) * CAST(4294967296 AS UBIGINT),
                   CAST(k AS UBIGINT)) AS x0
        FROM hw CROSS JOIN (SELECT unnest(range({num_steps})) AS k)
    ),
    h1 AS (SELECT wid, step, xor(x0, x0 >> 30) AS a FROM hp),
    h1m AS (SELECT wid, step, CAST((
        (CAST(a AS HUGEINT) * 484763065 +
         ((CAST(a AS HUGEINT) % 4294967296) * 3210233709 % 4294967296)
         * 4294967296)
        % 18446744073709551616) AS UBIGINT) AS x1 FROM h1),
    h2 AS (SELECT wid, step, xor(x1, x1 >> 27) AS b FROM h1m),
    h2m AS (SELECT wid, step, CAST((
        (CAST(b AS HUGEINT) * 321982955 +
         ((CAST(b AS HUGEINT) % 4294967296) * 2496678331 % 4294967296)
         * 4294967296)
        % 18446744073709551616) AS UBIGINT) AS x2 FROM h2),
    hz AS MATERIALIZED (
        SELECT wid, step, xor(x2, x2 >> 31) >> 11 AS h FROM h2m
    ),
    walk(wid, step, vid) AS (
        SELECT wid, CAST(0 AS BIGINT), wid FROM hw
        UNION ALL
        SELECT w.wid, w.step + 1, a.dst
        FROM walk w
        JOIN hz h ON h.wid = w.wid AND h.step = w.step
        JOIN adj a ON a.src = w.vid
         AND a.idx = CAST(h.h % CAST(a.deg AS UBIGINT) AS BIGINT)
        WHERE w.step < {num_steps}
    )
    SELECT wid, step, vid FROM walk ORDER BY wid, step
    """


def _biased_walks_oracle_sql(num_steps: int = 5) -> str:
    """DuckDB mirror of :func:`fogray.walks.biased_walks`: the same hz
    splitmix CTE chain as the uniform-walk mirror, then ``num_steps``
    UNROLLED weighted-pick layers (window cumsum per walker over
    ascending dst; candidate weights 1 / 4 / 2 by prev-return /
    triangle-membership LEFT JOIN / exploration; pick = the candidate
    whose [cum, cum+w) range contains h % total — all-integer, so the
    mirror is bit-exact)."""
    hz_chain = """
    hw AS (SELECT DISTINCT src AS wid FROM edges),
    hp AS (
        SELECT wid, CAST(k AS BIGINT) AS step,
               xor(CAST(wid AS UBIGINT) * CAST(4294967296 AS UBIGINT),
                   CAST(k AS UBIGINT)) AS x0
        FROM hw CROSS JOIN (SELECT unnest(range(%d)) AS k)
    ),
    h1 AS (SELECT wid, step, xor(x0, x0 >> 30) AS a FROM hp),
    h1m AS (SELECT wid, step, CAST((
        (CAST(a AS HUGEINT) * 484763065 +
         ((CAST(a AS HUGEINT) %% 4294967296) * 3210233709 %% 4294967296)
         * 4294967296)
        %% 18446744073709551616) AS UBIGINT) AS x1 FROM h1),
    h2 AS (SELECT wid, step, xor(x1, x1 >> 27) AS b FROM h1m),
    h2m AS (SELECT wid, step, CAST((
        (CAST(b AS HUGEINT) * 321982955 +
         ((CAST(b AS HUGEINT) %% 4294967296) * 2496678331 %% 4294967296)
         * 4294967296)
        %% 18446744073709551616) AS UBIGINT) AS x2 FROM h2),
    hz AS MATERIALIZED (
        SELECT wid, step, xor(x2, x2 >> 31) >> 11 AS h FROM h2m
    ),
    s0 AS (SELECT wid, CAST(-1 AS BIGINT) AS prev, wid AS vid FROM hw)
    """ % num_steps
    layers = []
    for k in range(1, num_steps + 1):
        layers.append(f"""
    c{k} AS MATERIALIZED (
        SELECT s.wid, s.vid AS cur, e.dst,
               CASE WHEN e.dst = s.prev THEN 1
                    WHEN m.src IS NOT NULL THEN 4
                    ELSE 2 END AS w
        FROM s{k - 1} s
        JOIN edges e ON e.src = s.vid
        LEFT JOIN edges m ON m.src = s.prev AND m.dst = e.dst
    ),
    w{k} AS MATERIALIZED (
        SELECT wid, cur, dst, w,
               COALESCE(SUM(w) OVER (PARTITION BY wid ORDER BY dst
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cw,
               SUM(w) OVER (PARTITION BY wid) AS tot
        FROM c{k}
    ),
    s{k} AS MATERIALIZED (
        SELECT w.wid, w.cur AS prev, w.dst AS vid
        FROM w{k} w JOIN hz h ON h.wid = w.wid AND h.step = {k - 1}
        WHERE CAST(h.h % CAST(w.tot AS UBIGINT) AS BIGINT) >= w.cw
          AND CAST(h.h % CAST(w.tot AS UBIGINT) AS BIGINT) < w.cw + w.w
    )""")
    selects = ["SELECT wid, CAST(0 AS BIGINT) AS step, vid FROM s0"] + [
        f"SELECT wid, CAST({k} AS BIGINT), vid FROM s{k}"
        for k in range(1, num_steps + 1)
    ]
    return (
        f"WITH edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),\n"
        + hz_chain
        + ","
        + ",".join(layers)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY wid, step"
    )


def _hits_oracle_sql(niters: int = 5) -> str:
    """DuckDB mirror of :func:`fogray.algorithms.hits`: the iterations
    unrolled as CTE pairs (authority sum over in-edges then hub sum over
    out-edges, each max-normalized; the NULLIF guard matches the
    engine's 'divide only when max > 0'). Final scores ROUND 6.
    Every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and each
    half-step references its predecessor twice (the join and the MAX
    subquery), so inlining would re-expand the base scan 2^(2*niters)
    times — enough file re-opens to exhaust the fd limit."""
    parts = [
        f"""edges AS MATERIALIZED ({_COOC_SQL}),
        verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM edges),
        h0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS h FROM verts)"""
    ]
    for i in range(1, niters + 1):
        parts.append(
            f"""ar{i} AS MATERIALIZED (
            SELECT e.dst AS v, SUM(h.h) AS x
            FROM edges e JOIN h{i - 1} h ON h.v = e.src GROUP BY e.dst
        ),
        a{i} AS MATERIALIZED (
            SELECT verts.v,
                   COALESCE(ar.x, 0.0)
                   / COALESCE(NULLIF((SELECT MAX(x) FROM ar{i}), 0.0), 1.0) AS a
            FROM verts LEFT JOIN ar{i} ar ON ar.v = verts.v
        ),
        hr{i} AS MATERIALIZED (
            SELECT e.src AS v, SUM(a.a) AS x
            FROM edges e JOIN a{i} a ON a.v = e.dst GROUP BY e.src
        ),
        h{i} AS MATERIALIZED (
            SELECT verts.v,
                   COALESCE(hr.x, 0.0)
                   / COALESCE(NULLIF((SELECT MAX(x) FROM hr{i}), 0.0), 1.0) AS h
            FROM verts LEFT JOIN hr{i} hr ON hr.v = verts.v
        )"""
        )
    body = ",\n        ".join(parts)
    return f"""WITH {body}
        SELECT verts.v AS vid, ROUND(h{niters}.h, 6) AS hub,
               ROUND(a{niters}.a, 6) AS auth
        FROM verts JOIN h{niters} ON h{niters}.v = verts.v
                   JOIN a{niters} ON a{niters}.v = verts.v
        ORDER BY vid"""


ORACLE_SQL: dict[str, str] = {
    "hits": _hits_oracle_sql(),
    "derive_edges": f"SELECT src, dst, weight FROM ({_COOC_SQL}) ORDER BY src, dst",
    "src_edgelist": f"SELECT src, dst FROM ({_COOC_SQL}) ORDER BY src, dst",
    "src_adjlist": f"SELECT src, dst FROM ({_COOC_SQL}) ORDER BY src, dst",
    "src_csv": f"SELECT src, dst FROM ({_COOC_SQL}) ORDER BY src, dst",
    "src_jsonl": f"SELECT src, dst FROM ({_COOC_SQL}) ORDER BY src, dst",
    "det_weights": _DET_W_SQL.replace(
        "__EDGES__", f"(SELECT src, dst FROM ({_COOC_SQL}))"
    )
    + " ORDER BY src, dst",
    "graph_meta": f"""
        WITH e AS ({_COOC_SQL}),
        deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src)
        SELECT (SELECT LEAST(MIN(src), MIN(dst)) FROM e) AS min_vertex_id,
               (SELECT GREATEST(MAX(src), MAX(dst)) FROM e) AS max_vertex_id,
               (SELECT COUNT(*) FROM e) AS num_edges,
               (SELECT MAX(d) FROM deg) AS max_out_edges
    """,
    "out_degrees": f"""
        SELECT src AS vid, COUNT(*) AS out_degree
        FROM ({_COOC_SQL}) GROUP BY src ORDER BY vid
    """,
    # personalized pagerank: the pagerank recursion with mass seeded at
    # MIN(src) and the per-edge teleport landing only on edges INTO the
    # source (programs.PersonalizedPageRank mirrors this exactly)
    "ppr": f"""
        WITH RECURSIVE
        edges AS ({_COOC_SQL}),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        verts AS (SELECT DISTINCT src AS v FROM edges),
        s0 AS (SELECT MIN(src) AS sv FROM edges),
        mat AS (
            SELECT e.src AS src, e.dst AS dst,
                   0.85 / d.outdeg AS coef,
                   CASE WHEN e.dst = (SELECT sv FROM s0)
                        THEN 0.15 ELSE 0.0 END AS konst
            FROM edges e JOIN deg d ON d.src = e.src
            UNION ALL
            SELECT v, v, 1.0, 0.0 FROM verts
        ),
        pr(iter, v, r) AS (
            SELECT 0, v,
                   CAST(CASE WHEN v = (SELECT sv FROM s0)
                             THEN 1.0 ELSE 0.0 END AS DOUBLE)
            FROM verts
            UNION ALL
            SELECT pr.iter + 1, mat.dst, SUM(mat.coef * pr.r + mat.konst)
            FROM pr JOIN mat ON mat.src = pr.v
            WHERE pr.iter < 10
            GROUP BY pr.iter + 1, mat.dst
        )
        SELECT v AS vid, ROUND(r, 6) AS rank FROM pr WHERE iter = 10 ORDER BY vid
    """,
    # k-core peeling as a fixed-round recursion: the self row's 1e6
    # coefficient carries the vertex's own alive flag through the same
    # SUM that counts alive neighbors (>= 1e6 + k  <=>  alive AND
    # deg_alive >= k); all sums are small integers, exact in DOUBLE.
    # 32 rounds >= the engine's measured fixpoint (idempotent after).
    "kcore": f"""
        WITH RECURSIVE
        edges AS ({_COOC_SQL}),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        kk AS (SELECT GREATEST(2, CAST(FLOOR(AVG(outdeg) * 0.7) AS BIGINT)) AS k
               FROM deg),
        verts AS (SELECT DISTINCT src AS v FROM edges),
        mat AS (
            SELECT src, dst, CAST(1.0 AS DOUBLE) AS coef FROM edges
            UNION ALL
            SELECT v, v, CAST(1000000.0 AS DOUBLE) FROM verts
        ),
        kc(iter, v, alive) AS (
            SELECT 0, v, CAST(1.0 AS DOUBLE) FROM verts
            UNION ALL
            SELECT kc.iter + 1, mat.dst,
                   CASE WHEN SUM(mat.coef * kc.alive)
                             >= 1000000.0 + (SELECT k FROM kk)
                        THEN 1.0 ELSE 0.0 END
            FROM kc JOIN mat ON mat.src = kc.v
            WHERE kc.iter < 32
            GROUP BY kc.iter + 1, mat.dst
        )
        SELECT v AS vid, CAST(alive AS BIGINT) AS in_core
        FROM kc WHERE iter = 32 ORDER BY vid
    """,
    "pagerank": f"""
        WITH RECURSIVE
        edges AS ({_COOC_SQL}),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        verts AS (SELECT DISTINCT src AS v FROM edges),
        mat AS (
            SELECT e.src AS src, e.dst AS dst,
                   0.85 / d.outdeg AS coef, 0.15 AS konst
            FROM edges e JOIN deg d ON d.src = e.src
            UNION ALL
            SELECT v, v, 1.0, 0.0 FROM verts
        ),
        pr(iter, v, r) AS (
            SELECT 0, v, CAST(1.0 AS DOUBLE) FROM verts
            UNION ALL
            SELECT pr.iter + 1, mat.dst, SUM(mat.coef * pr.r + mat.konst)
            FROM pr JOIN mat ON mat.src = pr.v
            WHERE pr.iter < 10
            GROUP BY pr.iter + 1, mat.dst
        )
        SELECT v AS vid, ROUND(r, 6) AS rank FROM pr WHERE iter = 10 ORDER BY vid
    """,
    "wpagerank": f"""
        WITH RECURSIVE
        edges AS ({_COOC_SQL}),
        ws AS (SELECT src, SUM(weight) AS ws FROM edges GROUP BY src),
        verts AS (SELECT DISTINCT src AS v FROM edges),
        mat AS (
            SELECT e.src AS src, e.dst AS dst, e.weight AS w8, ws.ws AS ws,
                   FALSE AS selfloop
            FROM edges e JOIN ws ON ws.src = e.src
            UNION ALL
            SELECT v, v, 0.0, 1.0, TRUE FROM verts
        ),
        pr(iter, v, r) AS (
            SELECT 0, v, CAST(1.0 AS DOUBLE) FROM verts
            UNION ALL
            SELECT pr.iter + 1, mat.dst,
                   SUM(CASE WHEN mat.selfloop THEN pr.r
                            ELSE 0.85 * pr.r / mat.ws * mat.w8 + 0.15 END)
            FROM pr JOIN mat ON mat.src = pr.v
            WHERE pr.iter < 10
            GROUP BY pr.iter + 1, mat.dst
        )
        SELECT v AS vid, ROUND(r, 6) AS wrank FROM pr WHERE iter = 10 ORDER BY vid
    """,
    "connected_components": f"""
        WITH RECURSIVE
        edges AS (SELECT src, dst FROM ({_COOC_SQL})),
        reach(v, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v
        )
        SELECT v AS vid, MIN(r) AS component_root FROM reach GROUP BY v ORDER BY vid
    """,
    # the incremental operator's fixpoint is arrival-order independent
    # and equals the static components — same oracle (assigned below,
    # after the dict literal, to share the exact string)
    "label_propagation": f"""
        WITH RECURSIVE
        edges AS (SELECT src, dst FROM ({_COOC_SQL})),
        reach(v, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v
        )
        SELECT v AS vid, MIN(r) AS label FROM reach GROUP BY v ORDER BY vid
    """,
    "bfs": f"""
        WITH RECURSIVE
        edges AS (SELECT src, dst FROM ({_COOC_SQL})),
        lvl(v, d) AS (
            SELECT (SELECT MIN(src) FROM edges), 0
            UNION
            SELECT e.dst, lvl.d + 1
            FROM lvl JOIN edges e ON e.src = lvl.v
            WHERE lvl.d < 64
        )
        SELECT v AS vid, MIN(d) AS bfs_level FROM lvl GROUP BY v ORDER BY vid
    """,
    "mis": _mis_sql(12),
    "msf": _msf_sql(5),
    "coloring": _coloring_sql(),
    "matching": _matching_sql(),
    "betweenness": _betweenness_sql(4, 6),
    "katz": _katz_sql(8),
    "eigenvector": _eigenvector_sql(4),
    "modularity": f"""
        WITH edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
        m2t AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM edges),
        lab AS (SELECT p_partkey AS vid, p_brand AS b FROM part),
        agg AS (
            SELECT ls.b,
                   CAST(SUM(CASE WHEN ld.b = ls.b THEN 1 ELSE 0 END)
                        AS BIGINT) AS mc,
                   CAST(COUNT(*) AS BIGINT) AS dc
            FROM edges e
            JOIN lab ls ON ls.vid = e.src
            JOIN lab ld ON ld.vid = e.dst
            GROUP BY ls.b
        )
        SELECT ROUND(SUM(CAST(mc AS DOUBLE) / CAST(m2 AS DOUBLE)
                     - (CAST(dc AS DOUBLE) / CAST(m2 AS DOUBLE))
                     * (CAST(dc AS DOUBLE) / CAST(m2 AS DOUBLE))), 6)
                   AS modularity,
               CAST(COUNT(*) AS BIGINT) AS n_communities,
               (SELECT m2 FROM m2t) AS m2
        FROM agg CROSS JOIN m2t
    """,
    "two_hop": f"""
        WITH edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
        h AS (
            SELECT a.src AS vid, CAST(COUNT(DISTINCT b.dst) AS BIGINT) AS two_hop
            FROM edges a JOIN edges b ON b.src = a.dst
            WHERE b.dst <> a.src
            GROUP BY a.src
        )
        SELECT t.vid, COALESCE(h.two_hop, CAST(0 AS BIGINT)) AS two_hop
        FROM (SELECT DISTINCT src AS vid FROM edges) t
        LEFT JOIN h ON h.vid = t.vid ORDER BY t.vid
    """,
    "harmonic": f"""
        WITH RECURSIVE
        edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
        srcs AS MATERIALIZED (
            SELECT s FROM (SELECT DISTINCT src AS s FROM edges)
            ORDER BY s LIMIT 4
        ),
        lvl(s, v, d) AS (
            SELECT s, s, 0 FROM srcs
            UNION
            SELECT lvl.s, e.dst, lvl.d + 1
            FROM lvl JOIN edges e ON e.src = lvl.v
            WHERE lvl.d < 64
        ),
        dist AS (SELECT s, v, MIN(d) AS d FROM lvl GROUP BY s, v),
        touched AS (SELECT DISTINCT src AS vid FROM edges)
        SELECT t.vid,
               ROUND(COALESCE(SUM(1.0 / d) FILTER (WHERE d > 0), 0.0), 6)
                   AS harmonic
        FROM touched t LEFT JOIN dist ON dist.v = t.vid
        GROUP BY t.vid ORDER BY t.vid
    """,
    "closeness": f"""
        WITH RECURSIVE
        edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
        srcs AS MATERIALIZED (
            SELECT s FROM (SELECT DISTINCT src AS s FROM edges)
            ORDER BY s LIMIT 4
        ),
        lvl(s, v, d) AS (
            SELECT s, s, 0 FROM srcs
            UNION
            SELECT lvl.s, e.dst, lvl.d + 1
            FROM lvl JOIN edges e ON e.src = lvl.v
            WHERE lvl.d < 64
        ),
        dist AS (SELECT s, v, MIN(d) AS d FROM lvl GROUP BY s, v)
        SELECT s AS source,
               CAST(COUNT(*) FILTER (WHERE d > 0) AS BIGINT) AS n_reached,
               CAST(SUM(d) AS BIGINT) AS sum_dist,
               ROUND(CASE WHEN SUM(d) > 0
                          THEN CAST(COUNT(*) FILTER (WHERE d > 0) AS DOUBLE)
                               / CAST(SUM(d) AS DOUBLE)
                          ELSE 0.0 END, 6) AS closeness
        FROM dist GROUP BY s ORDER BY source
    """,
    "degree_histogram": f"""
        WITH deg AS (
            SELECT src, CAST(COUNT(*) AS BIGINT) AS d
            FROM ({_COOC_SQL}) GROUP BY src
        )
        SELECT CAST(d // 16 AS BIGINT) AS bucket,
               CAST((d // 16) * 16 AS BIGINT) AS lo_degree,
               CAST(COUNT(*) AS BIGINT) AS n_vertices
        FROM deg GROUP BY 1, 2 ORDER BY bucket
    """,
    "diameter": f"""
        WITH RECURSIVE
        edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
        root AS MATERIALIZED (SELECT MIN(src) AS r FROM edges),
        l1(v, d) AS (
            SELECT r, 0 FROM root
            UNION
            SELECT e.dst, l1.d + 1
            FROM l1 JOIN edges e ON e.src = l1.v WHERE l1.d < 64
        ),
        d1 AS MATERIALIZED (SELECT v, MIN(d) AS d FROM l1 GROUP BY v),
        f1 AS MATERIALIZED (
            SELECT v FROM d1 WHERE d = (SELECT MAX(d) FROM d1)
            ORDER BY v LIMIT 1
        ),
        l2(v, d) AS (
            SELECT v, 0 FROM f1
            UNION
            SELECT e.dst, l2.d + 1
            FROM l2 JOIN edges e ON e.src = l2.v WHERE l2.d < 64
        ),
        d2 AS (SELECT v, MIN(d) AS d FROM l2 GROUP BY v)
        SELECT (SELECT r FROM root) AS start_vid,
               (SELECT v FROM f1) AS sweep1_vid,
               (SELECT v FROM d2 WHERE d = (SELECT MAX(d) FROM d2)
                ORDER BY v LIMIT 1) AS sweep2_vid,
               (SELECT MAX(d) FROM d2) AS approx_diameter
    """,
    "sssp_tree": """
        SELECT vid, ROUND(value, 6) AS value FROM (
            SELECT 0 AS vid, CAST(0.0 AS DOUBLE) AS value
            UNION ALL
            SELECT 100 + n_nationkey,
                   CAST(n_nationkey % 5 + 1 AS DOUBLE)
            FROM nation WHERE n_regionkey = 0
            UNION ALL
            SELECT 1000 + c_custkey,
                   CAST(n_nationkey % 5 + 1 AS DOUBLE)
                   + CAST(c_custkey % 10 + 1 AS DOUBLE)
            FROM customer JOIN nation ON n_nationkey = c_nationkey
            WHERE n_regionkey = 0
        ) ORDER BY vid
    """,
    "spmv": f"""
        SELECT dst AS vid, ROUND(SUM(weight), 6) AS spmv_value
        FROM ({_COOC_SQL}) GROUP BY dst ORDER BY vid
    """,
    "triangle_count": f"""
        WITH und AS (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ({_COOC_SQL}) WHERE src <> dst
        )
        SELECT COUNT(*) AS triangles
        FROM und p1
        JOIN und p2 ON p2.a = p1.a AND p2.b > p1.b
        JOIN und p3 ON p3.a = p1.b AND p3.b = p2.b
    """,
    "transitivity": f"""
        WITH und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ({_COOC_SQL}) WHERE src <> dst
        ),
        tri AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM und p1
            JOIN und p2 ON p2.a = p1.a AND p2.b > p1.b
            JOIN und p3 ON p3.a = p1.b AND p3.b = p2.b
        ),
        deg AS (
            SELECT src, CAST(COUNT(*) AS BIGINT) AS d
            FROM ({_COOC_SQL}) GROUP BY src
        ),
        wg AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS w FROM deg)
        SELECT t AS triangles, w AS wedges,
               ROUND(CASE WHEN w > 0
                          THEN (3.0 * CAST(t AS DOUBLE)) / CAST(w AS DOUBLE)
                          ELSE 0.0 END, 6) AS transitivity
        FROM tri CROSS JOIN wg
    """,
    "clustering": f"""
        WITH und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ({_COOC_SQL}) WHERE src <> dst
        ),
        tri AS MATERIALIZED (
            SELECT p1.a AS x, p1.b AS y, p2.b AS z
            FROM und p1
            JOIN und p2 ON p2.a = p1.a AND p2.b > p1.b
            JOIN und p3 ON p3.a = p1.b AND p3.b = p2.b
        ),
        tv AS MATERIALIZED (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM (
                SELECT x AS v FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri) GROUP BY v
        ),
        deg AS MATERIALIZED (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY v
        )
        SELECT deg.v AS vid, COALESCE(tv.t, 0) AS n_tri,
               ROUND(CASE WHEN d >= 2
                          THEN 2.0 * COALESCE(tv.t, 0) / (d * (d - 1.0))
                          ELSE 0.0 END, 6) AS clustering
        FROM deg LEFT JOIN tv ON tv.v = deg.v
        ORDER BY vid
    """,
    "ktruss": _ktruss_sql(_KTRUSS_K, _KTRUSS_ROUNDS),
    "graph_walks": _walks_oracle_sql(_WALK_STEPS),
    "biased_walks": _biased_walks_oracle_sql(_BIASED_STEPS),
    "sample_fanout": (
        lambda hv_sql: f"""
        WITH h AS ({hv_sql}),
        r AS (
            SELECT src, dst,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY src ORDER BY hv, dst) AS BIGINT) AS rk
            FROM h
        )
        SELECT src, dst, rk FROM r WHERE rk <= {_FANOUT}
        ORDER BY src, rk
    """
    )(
        _DET_W_SQL[: _DET_W_SQL.rindex("SELECT")].replace(
            "__EDGES__", f"(SELECT src, dst FROM ({_COOC_SQL}))"
        )
        + "SELECT src, dst, f >> 11 AS hv FROM s3"
    ),
    # assortativity: exact HUGEINT moment sums, then ONE double
    # expression — term-for-term the kernel's float(int) arithmetic
    "assortativity": f"""
        WITH e AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
        od AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1),
        idg AS (SELECT dst AS v, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1),
        xy AS (SELECT od.c AS x, idg.c AS y
               FROM e JOIN od ON od.v = e.src JOIN idg ON idg.v = e.dst),
        s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
              FROM xy)
        SELECT CASE WHEN n = 0 OR n * sxx - sx * sx = 0
                      OR n * syy - sy * sy = 0 THEN NULL
               ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                          / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                 * CAST(n * syy - sy * sy AS DOUBLE)), 6)
               END AS assortativity
        FROM s
    """,
    # adamic-adar: wedges at EVERY common neighbor of a non-adjacent
    # pair; ranking is the all-integer (cn DESC, u, v) total order
    "adamic_adar": f"""
        WITH und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ({_COOC_SQL}) WHERE src <> dst
        ),
        sym AS MATERIALIZED (
            SELECT a, b FROM und UNION ALL SELECT b, a FROM und
        ),
        deg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS c FROM sym GROUP BY 1),
        wedge AS (
            SELECT s1.b AS u, s2.b AS v, s1.a AS apex
            FROM sym s1 JOIN sym s2 ON s2.a = s1.a AND s1.b < s2.b
        ),
        agg AS (
            SELECT w.u, w.v, CAST(COUNT(*) AS BIGINT) AS cn,
                   SUM(1.0 / ln(CAST(deg.c AS DOUBLE))) AS aa
            FROM wedge w
            JOIN deg ON deg.v = w.apex
            WHERE NOT EXISTS (SELECT 1 FROM und
                              WHERE und.a = w.u AND und.b = w.v)
            GROUP BY w.u, w.v
        )
        SELECT u, v, cn, ROUND(aa, 6) AS aa,
               CAST(ROW_NUMBER() OVER (ORDER BY cn DESC, u, v) AS BIGINT) AS rk
        FROM agg QUALIFY rk <= {_AA_K} ORDER BY rk
    """,
    "link_predict": f"""
        WITH und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ({_COOC_SQL}) WHERE src <> dst
        ),
        sym AS MATERIALIZED (
            SELECT a, b FROM und UNION ALL SELECT b, a FROM und
        ),
        deg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS c FROM sym GROUP BY 1),
        wedge AS (
            SELECT s1.b AS u, s2.b AS v, s1.a AS apex
            FROM sym s1 JOIN sym s2 ON s2.a = s1.a AND s1.b < s2.b
        ),
        agg AS (
            SELECT w.u, w.v, CAST(COUNT(*) AS BIGINT) AS cn,
                   SUM(1.0 / ln(CAST(deg.c AS DOUBLE))) AS aa,
                   SUM(1.0 / CAST(deg.c AS DOUBLE)) AS ra
            FROM wedge w
            JOIN deg ON deg.v = w.apex
            WHERE NOT EXISTS (SELECT 1 FROM und
                              WHERE und.a = w.u AND und.b = w.v)
            GROUP BY w.u, w.v
        )
        SELECT a.u, a.v, a.cn, ROUND(a.aa, 6) AS aa, ROUND(a.ra, 6) AS ra,
               CAST(du.c * dv.c AS BIGINT) AS pref,
               CAST(ROW_NUMBER() OVER (ORDER BY a.cn DESC, a.u, a.v)
                    AS BIGINT) AS rk
        FROM agg a JOIN deg du ON du.v = a.u JOIN deg dv ON dv.v = a.v
        QUALIFY rk <= {_LP_K} ORDER BY rk
    """,
    "scan_similarity": f"""
        WITH und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ({_COOC_SQL}) WHERE src <> dst
        ),
        tri AS MATERIALIZED (
            SELECT p1.a AS x, p1.b AS y, p2.b AS z
            FROM und p1
            JOIN und p2 ON p2.a = p1.a AND p2.b > p1.b
            JOIN und p3 ON p3.a = p1.b AND p3.b = p2.b
        ),
        cn AS MATERIALIZED (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM (
                SELECT x AS a, y AS b FROM tri
                UNION ALL SELECT x, z FROM tri
                UNION ALL SELECT y, z FROM tri) GROUP BY a, b
        ),
        deg AS MATERIALIZED (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY v
        )
        SELECT und.a AS u, und.b AS v,
               ROUND(CASE WHEN da.d + db.d - 2 - COALESCE(cn.c, 0) > 0
                          THEN CAST(COALESCE(cn.c, 0) AS DOUBLE)
                               / (da.d + db.d - 2 - COALESCE(cn.c, 0))
                          ELSE 0.0 END, 6) AS similarity
        FROM und
        LEFT JOIN cn ON cn.a = und.a AND cn.b = und.b
        JOIN deg da ON da.v = und.a
        JOIN deg db ON db.v = und.b
        ORDER BY u, v
    """,
    "four_cycles": f"""
        WITH und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ({_COOC_SQL}) WHERE src <> dst
        ),
        sym AS MATERIALIZED (
            SELECT a, b FROM und UNION ALL SELECT b, a FROM und
        ),
        wedge AS (
            SELECT s1.b AS u, s2.b AS v
            FROM sym s1 JOIN sym s2 ON s2.a = s1.a AND s1.b < s2.b
        ),
        agg AS (
            SELECT u, v, CAST(COUNT(*) AS BIGINT) AS c
            FROM wedge GROUP BY u, v
        )
        SELECT CAST(COALESCE(SUM(c * (c - 1)), 0) / 4 AS BIGINT) AS c4
        FROM agg
    """,
    "salsa": _salsa_sql(4),
    "densest": f"""
        WITH         und0 AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ({_COOC_SQL}) WHERE src <> dst
        ),
        deg0 AS MATERIALIZED (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT a AS v FROM und0 UNION ALL SELECT b FROM und0
            ) GROUP BY v
        ),
        st0 AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nv,
                   CAST(COALESCE(SUM(d), 0) / 2 AS BIGINT) AS ne
            FROM deg0
        ),
        keep0 AS (
            SELECT v FROM deg0
            WHERE d * (SELECT nv FROM st0) > 2 * (SELECT ne FROM st0)
        ),
        und1 AS MATERIALIZED (
            SELECT u.a, u.b FROM und0 u
            JOIN keep0 ka ON ka.v = u.a
            JOIN keep0 kb ON kb.v = u.b
        ),
        deg1 AS MATERIALIZED (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT a AS v FROM und1 UNION ALL SELECT b FROM und1
            ) GROUP BY v
        ),
        st1 AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nv,
                   CAST(COALESCE(SUM(d), 0) / 2 AS BIGINT) AS ne
            FROM deg1
        ),
        keep1 AS (
            SELECT v FROM deg1
            WHERE d * (SELECT nv FROM st1) > 2 * (SELECT ne FROM st1)
        ),
        und2 AS MATERIALIZED (
            SELECT u.a, u.b FROM und1 u
            JOIN keep1 ka ON ka.v = u.a
            JOIN keep1 kb ON kb.v = u.b
        ),
        deg2 AS MATERIALIZED (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT a AS v FROM und2 UNION ALL SELECT b FROM und2
            ) GROUP BY v
        ),
        st2 AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nv,
                   CAST(COALESCE(SUM(d), 0) / 2 AS BIGINT) AS ne
            FROM deg2
        ),
        keep2 AS (
            SELECT v FROM deg2
            WHERE d * (SELECT nv FROM st2) > 2 * (SELECT ne FROM st2)
        ),
        und3 AS MATERIALIZED (
            SELECT u.a, u.b FROM und2 u
            JOIN keep2 ka ON ka.v = u.a
            JOIN keep2 kb ON kb.v = u.b
        ),
        deg3 AS MATERIALIZED (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT a AS v FROM und3 UNION ALL SELECT b FROM und3
            ) GROUP BY v
        ),
        st3 AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nv,
                   CAST(COALESCE(SUM(d), 0) / 2 AS BIGINT) AS ne
            FROM deg3
        ),
        keep3 AS (
            SELECT v FROM deg3
            WHERE d * (SELECT nv FROM st3) > 2 * (SELECT ne FROM st3)
        ),
        und4 AS MATERIALIZED (
            SELECT u.a, u.b FROM und3 u
            JOIN keep3 ka ON ka.v = u.a
            JOIN keep3 kb ON kb.v = u.b
        ),
        deg4 AS MATERIALIZED (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT a AS v FROM und4 UNION ALL SELECT b FROM und4
            ) GROUP BY v
        ),
        st4 AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nv,
                   CAST(COALESCE(SUM(d), 0) / 2 AS BIGINT) AS ne
            FROM deg4
        )
        SELECT 0 AS round, nv AS n_vertices, ne AS n_edges,
               ROUND(CASE WHEN nv = 0 THEN 0.0
                          ELSE ne * 1.0 / nv END, 6) AS density
        FROM st0
        UNION ALL
        SELECT 1 AS round, nv AS n_vertices, ne AS n_edges,
               ROUND(CASE WHEN nv = 0 THEN 0.0
                          ELSE ne * 1.0 / nv END, 6) AS density
        FROM st1
        UNION ALL
        SELECT 2 AS round, nv AS n_vertices, ne AS n_edges,
               ROUND(CASE WHEN nv = 0 THEN 0.0
                          ELSE ne * 1.0 / nv END, 6) AS density
        FROM st2
        UNION ALL
        SELECT 3 AS round, nv AS n_vertices, ne AS n_edges,
               ROUND(CASE WHEN nv = 0 THEN 0.0
                          ELSE ne * 1.0 / nv END, 6) AS density
        FROM st3
        UNION ALL
        SELECT 4 AS round, nv AS n_vertices, ne AS n_edges,
               ROUND(CASE WHEN nv = 0 THEN 0.0
                          ELSE ne * 1.0 / nv END, 6) AS density
        FROM st4
        ORDER BY round
    """,
    "wl_colors": f"""
        WITH edges AS MATERIALIZED ({_SEQ_SQL}),
        verts AS MATERIALIZED (
            SELECT DISTINCT v FROM (
                SELECT src AS v FROM edges UNION SELECT dst FROM edges)
        ),
        c0 AS (SELECT v, md5('') AS c FROM verts),
        c1 AS MATERIALIZED (
            SELECT t.v,
                   md5(ANY_VALUE(cv.c) || '|' ||
                       COALESCE(string_agg(cu.c, ',' ORDER BY cu.c), '')) AS c
            FROM verts t
            JOIN c0 cv ON cv.v = t.v
            LEFT JOIN edges e ON e.dst = t.v
            LEFT JOIN c0 cu ON cu.v = e.src
            GROUP BY t.v
        ),
        c2 AS MATERIALIZED (
            SELECT t.v,
                   md5(ANY_VALUE(cv.c) || '|' ||
                       COALESCE(string_agg(cu.c, ',' ORDER BY cu.c), '')) AS c
            FROM verts t
            JOIN c1 cv ON cv.v = t.v
            LEFT JOIN edges e ON e.dst = t.v
            LEFT JOIN c1 cu ON cu.v = e.src
            GROUP BY t.v
        )
        SELECT v AS vid, c AS wl_color FROM c2 ORDER BY vid
    """,
    "degree_powerlaw": f"""
        WITH deg AS (
            SELECT src, CAST(COUNT(*) AS DOUBLE) AS d
            FROM ({_COOC_SQL}) GROUP BY src
        ),
        tail AS (SELECT d FROM deg WHERE d >= 2)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
               ROUND(1.0 + COUNT(*) / SUM(LN(d / 2.0)), 6) AS alpha
        FROM tail
    """,
    "anf_reach": f"""
        WITH edges AS MATERIALIZED ({_SEQ_SQL}),
        verts AS MATERIALIZED (
            SELECT DISTINCT v FROM (
                SELECT src AS v FROM edges UNION SELECT dst FROM edges)
        ),
        h AS (SELECT v, md5(CAST(v AS VARCHAR)) AS hx FROM verts),
        d AS (
            SELECT v,
                   CAST(('0x' || substr(hx, 1, 1)) AS UBIGINT) AS bucket,
                   length(regexp_extract(substr(hx, 2), '^0*')) AS zhex,
                   substr(substr(hx, 2),
                          length(regexp_extract(substr(hx, 2), '^0*')) + 1,
                          1) AS c
            FROM h
        ),
        r0 AS MATERIALIZED (
            SELECT v, bucket,
                   CASE WHEN c = '' THEN 125
                        WHEN CAST(('0x' || c) AS UBIGINT) >= 8 THEN 4*zhex + 1
                        WHEN CAST(('0x' || c) AS UBIGINT) >= 4 THEN 4*zhex + 2
                        WHEN CAST(('0x' || c) AS UBIGINT) >= 2 THEN 4*zhex + 3
                        ELSE 4*zhex + 4 END AS rho
            FROM d
        ),
        r1 AS MATERIALIZED (
            SELECT v, bucket, MAX(rho) AS rho FROM (
                SELECT v, bucket, rho FROM r0
                UNION ALL
                SELECT e.dst AS v, r0.bucket, r0.rho
                FROM edges e JOIN r0 ON r0.v = e.src
            ) GROUP BY v, bucket
        ),
        r2 AS MATERIALIZED (
            SELECT v, bucket, MAX(rho) AS rho FROM (
                SELECT v, bucket, rho FROM r1
                UNION ALL
                SELECT e.dst AS v, r1.bucket, r1.rho
                FROM edges e JOIN r1 ON r1.v = e.src
            ) GROUP BY v, bucket
        ),
        s AS (
            SELECT v, SUM(POWER(2.0, -rho)) AS snz,
                   CAST(COUNT(*) AS BIGINT) AS nz
            FROM r2 GROUP BY v
        )
        SELECT v AS vid,
               ROUND(CASE WHEN 0.673 * 256.0 / (snz + (16 - nz)) <= 40.0
                               AND nz < 16
                          THEN 16.0 * LN(16.0 / (16 - nz))
                          ELSE 0.673 * 256.0 / (snz + (16 - nz)) END,
                     6) AS reach_est
        FROM s ORDER BY vid
    """,
    "bib_coupling": f"""
        WITH e AS MATERIALIZED ({_SEQ_SQL}),
        w AS (
            SELECT e1.src AS u, e2.src AS v
            FROM e e1 JOIN e e2 ON e2.dst = e1.dst AND e1.src < e2.src
        ),
        agg AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn FROM w GROUP BY 1, 2)
        SELECT u, v, cn,
               CAST(ROW_NUMBER() OVER (ORDER BY cn DESC, u, v) AS BIGINT) AS rk
        FROM agg QUALIFY rk <= {_SNP_K} ORDER BY rk
    """,
    "co_citation": f"""
        WITH e AS MATERIALIZED ({_SEQ_SQL}),
        w AS (
            SELECT e1.dst AS u, e2.dst AS v
            FROM e e1 JOIN e e2 ON e2.src = e1.src AND e1.dst < e2.dst
        ),
        agg AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn FROM w GROUP BY 1, 2)
        SELECT u, v, cn,
               CAST(ROW_NUMBER() OVER (ORDER BY cn DESC, u, v) AS BIGINT) AS rk
        FROM agg QUALIFY rk <= {_SNP_K} ORDER BY rk
    """,
    "reciprocity": f"""
        WITH e AS ({_SEQ_SQL}),
        p AS (
            SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM e GROUP BY 1, 2
        )
        SELECT CAST(SUM(c) AS BIGINT) AS n_edges,
               CAST(COALESCE(SUM(CASE WHEN c = 2 THEN 2 ELSE 0 END), 0)
                    AS BIGINT) AS n_recip,
               ROUND(CAST(COALESCE(SUM(CASE WHEN c = 2 THEN 2 ELSE 0 END), 0)
                          AS DOUBLE) / SUM(c), 6) AS reciprocity
        FROM p
    """,
    # mode-LPA: 4 unrolled synchronous rounds, per-vertex most-frequent
    # in-neighbor label with (count DESC, label ASC) tie rule
    "lpa_freq": f"""
        WITH edges AS MATERIALIZED ({_SEQ_SQL}),
        verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
        l0 AS (SELECT v, v AS lab FROM verts),
        r1 AS (SELECT e.dst AS v, l.lab, COUNT(*) AS c
               FROM edges e JOIN l0 l ON l.v = e.src GROUP BY 1, 2),
        m1 AS (SELECT v, lab FROM (
                   SELECT v, lab, ROW_NUMBER() OVER (
                       PARTITION BY v ORDER BY c DESC, lab) AS rn FROM r1)
               WHERE rn = 1),
        l1 AS (SELECT l0.v, COALESCE(m.lab, l0.lab) AS lab
               FROM l0 LEFT JOIN m1 m USING (v)),
        r2 AS (SELECT e.dst AS v, l.lab, COUNT(*) AS c
               FROM edges e JOIN l1 l ON l.v = e.src GROUP BY 1, 2),
        m2 AS (SELECT v, lab FROM (
                   SELECT v, lab, ROW_NUMBER() OVER (
                       PARTITION BY v ORDER BY c DESC, lab) AS rn FROM r2)
               WHERE rn = 1),
        l2 AS (SELECT l1.v, COALESCE(m.lab, l1.lab) AS lab
               FROM l1 LEFT JOIN m2 m USING (v)),
        r3 AS (SELECT e.dst AS v, l.lab, COUNT(*) AS c
               FROM edges e JOIN l2 l ON l.v = e.src GROUP BY 1, 2),
        m3 AS (SELECT v, lab FROM (
                   SELECT v, lab, ROW_NUMBER() OVER (
                       PARTITION BY v ORDER BY c DESC, lab) AS rn FROM r3)
               WHERE rn = 1),
        l3 AS (SELECT l2.v, COALESCE(m.lab, l2.lab) AS lab
               FROM l2 LEFT JOIN m3 m USING (v)),
        r4 AS (SELECT e.dst AS v, l.lab, COUNT(*) AS c
               FROM edges e JOIN l3 l ON l.v = e.src GROUP BY 1, 2),
        m4 AS (SELECT v, lab FROM (
                   SELECT v, lab, ROW_NUMBER() OVER (
                       PARTITION BY v ORDER BY c DESC, lab) AS rn FROM r4)
               WHERE rn = 1),
        l4 AS (SELECT l3.v, COALESCE(m.lab, l3.lab) AS lab
               FROM l3 LEFT JOIN m4 m USING (v))
        SELECT v AS vid, lab AS label FROM l4 ORDER BY vid
    """,
    # closed-triad census: ordered closed 3-walks (each directed 3-cycle
    # = 3 rotations, hence // 3) and ordered transitive triples — the
    # same distinct directed edge set triad_census consumes
    "motif_triads": f"""
        WITH e AS MATERIALIZED ({_SEQ_SQL})
        SELECT 'cycle' AS motif,
               (SELECT COUNT(*) FROM e e1
                JOIN e e2 ON e2.src = e1.dst
                JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src) // 3 AS cnt
        UNION ALL
        SELECT 'transitive',
               (SELECT COUNT(*) FROM e e1
                JOIN e e2 ON e2.src = e1.dst
                JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)
        ORDER BY motif
    """,
    "scc": f"""
        WITH RECURSIVE
        edges AS ({_SEQ_SQL}),
        verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
        reach(a, b) AS (
            SELECT v, v FROM verts
            UNION
            SELECT reach.a, e.dst FROM reach JOIN edges e ON e.src = reach.b
        )
        SELECT f.a AS vid, MIN(f.b) AS component_root
        FROM reach f JOIN reach r ON r.a = f.b AND r.b = f.a
        GROUP BY f.a ORDER BY vid
    """,
    # condensation-DAG summary over the scc labels: top-10 components
    # by (size DESC, root ASC), distinct outgoing condensation edges
    "scc_condensation": f"""
        WITH RECURSIVE
        edges AS MATERIALIZED (
            SELECT * FROM ({_SEQ_SQL}) WHERE src < dst OR src % 7 = 0
        ),
        verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
        reach(a, b) AS (
            SELECT v, v FROM verts
            UNION
            SELECT reach.a, e.dst FROM reach JOIN edges e ON e.src = reach.b
        ),
        comp AS MATERIALIZED (
            SELECT f.a AS vid, MIN(f.b) AS root
            FROM reach f JOIN reach r ON r.a = f.b AND r.b = f.a
            GROUP BY f.a
        ),
        sizes AS (SELECT root, COUNT(*) AS size FROM comp GROUP BY root),
        ce AS (SELECT DISTINCT ca.root AS ra, cb.root AS rb
               FROM edges e
               JOIN comp ca ON ca.vid = e.src
               JOIN comp cb ON cb.vid = e.dst
               WHERE ca.root <> cb.root),
        xo AS (SELECT ra AS root, COUNT(*) AS cross_out FROM ce GROUP BY ra)
        SELECT s.root AS component_root, CAST(s.size AS BIGINT) AS size,
               CAST(COALESCE(x.cross_out, 0) AS BIGINT) AS cross_out
        FROM sizes s LEFT JOIN xo x ON x.root = s.root
        ORDER BY s.size DESC, s.root LIMIT 10
    """,
}

# the incremental-CC fixpoint equals the static components (arrival-
# order independence is the operator's contract, pytest-asserted), so
# both queries share the exact oracle string
ORACLE_SQL["cc_incremental"] = ORACLE_SQL["connected_components"]
ORACLE_SQL["pagerank_evolve"] = _pagerank_evolve_sql()

# the sharded flavors are output-identical to their broadcast
# originals (pytest parity, tests/test_sharded.py) — same oracles
ORACLE_SQL["cc_incremental_sharded"] = ORACLE_SQL["connected_components"]
ORACLE_SQL["msf_sharded"] = ORACLE_SQL["msf"]
ORACLE_SQL["coloring_sharded"] = ORACLE_SQL["coloring"]
ORACLE_SQL["matching_sharded"] = ORACLE_SQL["matching"]

# temporal earliest arrival: explore (vertex, arrival-via-some-path)
# pairs — `e.t >= r.t` gates time-respecting extension; UNION dedups
# exact pairs, so smaller-time rediscoveries still expand; MIN per
# vertex at the end is the exact earliest arrival (no unroll bound)
ORACLE_SQL["temporal_reach"] = """
    WITH RECURSIVE
    edges AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst,
               CAST(date_diff('day', TIMESTAMP '1970-01-01', b.l_shipdate)
                    AS BIGINT) AS t
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey
         AND b.l_linenumber = a.l_linenumber + 1
         AND a.l_partkey <> b.l_partkey
    ),
    s AS (SELECT MIN(src) AS v FROM edges),
    reach(v, t) AS (
        SELECT v, CAST(-1 AS BIGINT) FROM s
        UNION
        SELECT e.dst, e.t FROM reach r JOIN edges e
        ON e.src = r.v AND e.t >= r.t
    )
    SELECT v AS vid, MIN(t) AS arrival_day FROM reach GROUP BY v ORDER BY vid
"""
ORACLE_SQL["temporal_reach_sharded"] = ORACLE_SQL["temporal_reach"]

# fully-dynamic CC: the final fixpoint equals the static components of
# the NEVER-DELETED edge set; both lifecycle hashes (arrival batch and
# the delete lottery) replay through the exact HUGEINT splitmix chain.
# Seeds come from ALL edges (touched = every endpoint, including ones
# whose every edge was deleted — they end as singletons).
# HyperBall: exact bounded-hop reach sets -> the SAME md5 registers
# over the members (register MAX == union sketch) -> the identical
# bias-corrected estimator. Absent buckets contribute 2^0 = 1 to the
# power sum and count as zeros (rho from the hash is always >= 1).
ORACLE_SQL["hyperball"] = f"""
    WITH RECURSIVE
    edges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
    vids AS MATERIALIZED (SELECT DISTINCT src AS v FROM edges),
    walk(v, u, h) AS (
        SELECT v, v, 0 FROM vids
        UNION
        SELECT w.v, e.dst, w.h + 1 FROM walk w JOIN edges e ON e.src = w.u
        WHERE w.h < 2
    ),
    dist AS MATERIALIZED (SELECT v, u, MIN(h) AS d FROM walk GROUP BY v, u),
    h0 AS (SELECT v, substr(md5(CAST(v AS VARCHAR)), 1, 2) AS pre,
                  substr(md5(CAST(v AS VARCHAR)), 3) AS tail FROM vids),
    h1 AS (SELECT v, CAST(('0x' || pre) AS UBIGINT) AS bucket,
                  length(regexp_extract(tail, '^0*')) AS zhex,
                  substr(tail, length(regexp_extract(tail, '^0*')) + 1, 1) AS c
           FROM h0),
    hx AS MATERIALIZED (
        SELECT v AS u, bucket,
               CASE WHEN c = '' THEN 121
                    WHEN CAST(('0x' || c) AS UBIGINT) >= 8 THEN 4*zhex + 1
                    WHEN CAST(('0x' || c) AS UBIGINT) >= 4 THEN 4*zhex + 2
                    WHEN CAST(('0x' || c) AS UBIGINT) >= 2 THEN 4*zhex + 3
                    ELSE 4*zhex + 4 END AS rho
        FROM h1),
    hops AS (SELECT unnest(range(3)) AS hop),
    mem AS (SELECT dist.v, hops.hop, dist.u
            FROM dist JOIN hops ON dist.d <= hops.hop),
    r AS (SELECT mem.v, mem.hop, hx.bucket, MAX(hx.rho) AS rho
          FROM mem JOIN hx ON hx.u = mem.u GROUP BY mem.v, mem.hop, hx.bucket),
    s AS (SELECT v, hop,
                 SUM(POWER(2.0, -rho)) + (256 - COUNT(*)) AS ssum,
                 256 - COUNT(*) AS zeros
          FROM r GROUP BY v, hop)
    SELECT v AS vid, CAST(hop AS BIGINT) AS hop,
           ROUND(CASE WHEN (0.7213/(1.0+1.079/256.0))*256.0*256.0/ssum
                           <= 2.5*256.0 AND zeros > 0
                      THEN 256.0 * LN(256.0 / zeros)
                      ELSE (0.7213/(1.0+1.079/256.0))*256.0*256.0/ssum
                 END, 6) AS est_ball
    FROM s ORDER BY vid, hop
"""

ORACLE_SQL["hyperball_sharded"] = ORACLE_SQL["hyperball"]

ORACLE_SQL["graph_sparsify"] = f"""
    WITH e AS (SELECT src, dst, weight FROM ({_COOC_SQL})),
    r AS (SELECT src, dst, weight,
          ROW_NUMBER() OVER (PARTITION BY src
                             ORDER BY weight DESC, dst) AS rk FROM e)
    SELECT src, dst, weight, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 4 ORDER BY src, rk
"""

ORACLE_SQL["cc_dynamic"] = f"""
    WITH RECURSIVE
    alledges AS MATERIALIZED (SELECT src, dst FROM ({_COOC_SQL})),
    k0 AS (SELECT src, dst,
           xor(CAST(LEAST(src, dst) AS UBIGINT)
               * CAST(4294967296 AS UBIGINT),
               CAST(GREATEST(src, dst) AS UBIGINT)) AS key
           FROM alledges),
    a0 AS (SELECT src, dst, key AS x0 FROM k0),
    {_splitmix_ctes("dyna", "a0", "src, dst")},
    arr AS (SELECT src, dst, CAST((f >> 11) % 4 AS BIGINT) AS arrival
            FROM dyna3),
    b0 AS (SELECT src, dst,
           xor(key, CAST(11400714819323198485 AS UBIGINT)) AS x0 FROM k0),
    {_splitmix_ctes("dynb", "b0", "src, dst")},
    lot AS (SELECT src, dst, ((f >> 11) % 3) = 0 AS unlucky FROM dynb3),
    live AS MATERIALIZED (
        SELECT a.src, a.dst
        FROM arr a JOIN lot b ON a.src = b.src AND a.dst = b.dst
        WHERE NOT (b.unlucky AND a.arrival < 3)
    ),
    reach(v, r) AS (
        SELECT src, src FROM alledges
        UNION
        SELECT e.dst, reach.r FROM reach JOIN live e ON e.src = reach.v
    )
    SELECT v AS vid, MIN(r) AS component_root FROM reach GROUP BY v ORDER BY vid
"""

def q_cc_incremental_sharded(sf_dir: str) -> pa.Table:
    """Range-sharded flavor of ``cc_incremental``
    (fogray.sharded.incremental_cc_sharded): same batches, labels and
    touched set — state sliced across range shards, edges accumulating
    in src-range shard actors, per-round exchange actor-to-actor —
    gated by the SAME static-components oracle."""
    from .sharded import incremental_cc_sharded

    ds, n = cooccurrence_edges_ds(sf_dir)
    labels, touched, _stats = incremental_cc_sharded(
        ds.select_columns(["src", "dst"]), n, num_batches=4
    )
    return pa.table(
        {
            "vid": touched.astype(np.int64),
            "component_root": labels[touched].astype(np.int64),
        }
    )


def q_hyperball(sf_dir: str) -> pa.Table:
    """HyperBall approximate neighborhood function
    (fogray.hyperball.hyperball, Boldi & Vigna 2013): per-vertex
    256-register HLL sketches of the 0..2-hop out-reach balls, merged
    along edges one broadcast superstep per hop. Register max ==
    set-union sketch, so the estimate is a deterministic function of
    the EXACT ball — the oracle computes true bounded-hop reach sets,
    rebuilds the identical md5 registers over the members (the
    established HLL mirror) and applies the same estimator.
    -> (vid, hop, est_ball ROUND 6)."""
    from .hyperball import hyperball

    ds, n = cooccurrence_edges_ds(sf_dir)
    return hyperball(ds.select_columns(["src", "dst"]), n, max_hops=2)


def q_hyperball_sharded(sf_dir: str) -> pa.Table:
    """Range-sharded HyperBall (fogray.sharded.hyperball_sharded):
    identical estimates, register matrix sliced across range shards
    and merged by routed per-range maxima — same oracle."""
    from .sharded import hyperball_sharded

    ds, n = cooccurrence_edges_ds(sf_dir)
    return hyperball_sharded(ds.select_columns(["src", "dst"]), n, max_hops=2)


def q_graph_sparsify(sf_dir: str) -> pa.Table:
    """Degree-capped graph sparsification: keep each vertex's top-4
    HEAVIEST out-edges (ties by dst — the deterministic kNN-graph
    degree cap that keeps hub neighborhoods bounded at corpus scale),
    composed directly from the D76 grouped top-k kernel
    (fogray.datapipes.relational.topk_per_group) over the co-occurrence
    edge table — one sort, group-complete heads, no driver state.
    -> (src, dst, weight, rk) sorted by (src, rk)."""
    from .datapipes.relational import topk_per_group
    from .util import sorted_table

    ds, _n = cooccurrence_edges_ds(sf_dir)
    out = topk_per_group(
        ds, group_col="src", id_col="dst", order_col="weight", k=4
    )
    t = pa.concat_tables(
        [b for b in ray.get(out.materialize().to_arrow_refs())
         if b.num_rows and b.num_columns],
        promote_options="default",
    ) if out.count() else pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
         "weight": pa.array([], pa.float64()), "rk": pa.array([], pa.int64())}
    )
    return sorted_table(t, ["src", "rk"])


def q_cc_dynamic(sf_dir: str) -> pa.Table:
    """Fully-dynamic connected components with INSERTS AND DELETES
    (fogray.incremental.dynamic_cc): the co-occurrence edges arrive in
    4 deterministic batches and ~a third of them — chosen by an
    independent splitmix hash — are DELETED at a later batch; a
    deletion resets every touched component (deletions split, so
    affected labels are recomputed, not propagated) and one
    frontier-limited pass restores the live fixpoint. The oracle
    mirrors both hash chains in HUGEINT SQL and runs the static
    reachability over the never-deleted edge set — after the last
    batch the two are identical (intermediate states are
    pytest-asserted against a union-find oracle per prefix)."""
    from .incremental import dynamic_cc

    ds, n = cooccurrence_edges_ds(sf_dir)
    labels, touched, _stats = dynamic_cc(
        ds.select_columns(["src", "dst"]), n, num_batches=4
    )
    return pa.table(
        {
            "vid": touched.astype(np.int64),
            "component_root": labels[touched].astype(np.int64),
        }
    )


def q_temporal_reach_sharded(sf_dir: str) -> pa.Table:
    """Range-sharded flavor of ``temporal_reach``
    (fogray.sharded.temporal_earliest_arrival_sharded), same oracle."""
    from .sharded import temporal_earliest_arrival_sharded

    t = temporal_sequence_edges(sf_dir)
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    tt = t.column("t").to_numpy(zero_copy_only=False)
    if len(s) == 0:
        return pa.table(
            {"vid": pa.array([], pa.int64()), "arrival_day": pa.array([], pa.int64())}
        )
    n = int(max(s.max(), d.max())) + 1
    source = int(s.min())
    arrival, reached = temporal_earliest_arrival_sharded((s, d, tt), n, source)
    return pa.table(
        {
            "vid": pa.array(reached.astype(np.int64)),
            "arrival_day": pa.array(arrival[reached].astype(np.int64)),
        }
    )


def q_coloring_sharded(sf_dir: str) -> pa.Table:
    """Range-sharded Jones-Plassmann
    (fogray.sharded.jones_plassmann_sharded): identical colors — the
    rank-of-hash priorities are computed distributedly — same
    recursive-CTE oracle as ``coloring``."""
    from .sharded import jones_plassmann_sharded

    ds, n = cooccurrence_edges_ds(sf_dir)
    return jones_plassmann_sharded(ds.select_columns(["src", "dst"]), n)


def q_matching_sharded(sf_dir: str) -> pa.Table:
    """Range-sharded mutual-minimum matching
    (fogray.sharded.greedy_matching_sharded), same oracle as
    ``matching``."""
    from .sharded import greedy_matching_sharded

    ds, n = cooccurrence_edges_ds(sf_dir)
    return greedy_matching_sharded(ds.select_columns(["src", "dst"]), n)


def q_msf_sharded(sf_dir: str) -> pa.Table:
    """Range-sharded Borůvka MSF (fogray.sharded.boruvka_msf_sharded):
    the identical unique forest under the strict (weight, a, b) order,
    same unrolled-Borůvka oracle as ``msf``."""
    from .sharded import boruvka_msf_sharded

    ds, n = cooccurrence_edges_ds(sf_dir)
    return boruvka_msf_sharded(ds, n)


QUERIES = {
    "derive_edges": q_derive_edges,
    "src_edgelist": q_src_edgelist,
    "src_adjlist": q_src_adjlist,
    "src_csv": q_src_csv,
    "src_jsonl": q_src_jsonl,
    "det_weights": q_det_weights,
    "graph_meta": q_graph_meta,
    "out_degrees": q_out_degrees,
    "pagerank": q_pagerank,
    "wpagerank": q_wpagerank,
    "ppr": q_ppr,
    "hits": q_hits,
    "kcore": q_kcore,
    "connected_components": q_connected_components,
    "cc_incremental": q_cc_incremental,
    "cc_incremental_sharded": q_cc_incremental_sharded,
    "cc_dynamic": q_cc_dynamic,
    "graph_sparsify": q_graph_sparsify,
    "hyperball": q_hyperball,
    "hyperball_sharded": q_hyperball_sharded,
    "temporal_reach": q_temporal_reach,
    "temporal_reach_sharded": q_temporal_reach_sharded,
    "pagerank_evolve": q_pagerank_evolve,
    "label_propagation": q_label_propagation,
    "bfs": q_bfs,
    "harmonic": q_harmonic,
    "closeness": q_closeness,
    "degree_histogram": q_degree_histogram,
    "diameter": q_diameter,
    "mis": q_mis,
    "betweenness": q_betweenness,
    "katz": q_katz,
    "eigenvector": q_eigenvector,
    "sssp_tree": q_sssp_tree,
    "spmv": q_spmv,
    "triangle_count": q_triangle_count,
    "transitivity": q_transitivity,
    "clustering": q_clustering,
    "scan_similarity": q_scan_similarity,
    "ktruss": q_ktruss,
    "assortativity": q_assortativity,
    "adamic_adar": q_adamic_adar,
    "link_predict": q_link_predict,
    "two_hop": q_two_hop,
    "modularity": q_modularity,
    "graph_walks": q_graph_walks,
    "sample_fanout": q_sample_fanout,
    "scc": q_scc,
    "reciprocity": q_reciprocity,
    "motif_triads": q_motif_triads,
    "msf": q_msf,
    "msf_sharded": q_msf_sharded,
    "coloring": q_coloring,
    "coloring_sharded": q_coloring_sharded,
    "matching": q_matching,
    "matching_sharded": q_matching_sharded,
    "lpa_freq": q_lpa_freq,
    "biased_walks": q_biased_walks,
    "scc_condensation": q_scc_condensation,
    "bib_coupling": q_bib_coupling,
    "co_citation": q_co_citation,
    "anf_reach": q_anf_reach,
    "degree_powerlaw": q_degree_powerlaw,
    "wl_colors": q_wl_colors,
    "densest": q_densest,
    "salsa": q_salsa,
    "four_cycles": q_four_cycles,
}
