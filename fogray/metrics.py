"""Whole-graph structural metrics — beyond the reference's algorithm
set (TODO.list:17-20 stops at the scatter-gather programs), built
Ray-Data-first like fogray.triangles:

- :func:`degree_assortativity` — Pearson correlation of (out-degree of
  src, in-degree of dst) across directed edges. Shuffle-FREE: the O(V)
  degree arrays (already computed distributed at engine build) are
  broadcast once via ``ray.put``; every edge block emits one row of
  EXACT int64 moment partials (n, Σx, Σy, Σxy, Σx², Σy²) and the driver
  folds Python ints (arbitrary precision, associativity-proof — the
  same exactness discipline as the int64-cents money sums). The final
  correlation is one float expression over exact integers, mirrored
  term-for-term by the DuckDB oracle.

- :func:`adamic_adar` — link prediction over the undirected simple
  graph: for every NON-adjacent pair (u, v) with at least one common
  neighbor, cn = |N(u) ∩ N(v)| and aa = Σ_{w ∈ N(u) ∩ N(v)} 1/ln(deg w)
  (Adamic-Adar, 2003 — hub neighbors contribute less). Top-k pairs by
  (cn DESC, u, v) — an all-integer total order, so ranking is
  deterministic; aa is reported, not ranked.

  Dataflow: normalize+dedup to the simple graph (ONE sort, shared shape
  with fogray.triangles), broadcast the full unoriented CSR + the
  adjacency bitset/key array once, enumerate wedges per apex-range
  batch (every wedge (u, apex, v) with u < v appears at exactly one
  apex position, so per-pair partials need no dedup), pre-aggregate
  per block, then ONE sort of the (pair-key, cn, aa) partials with a
  group-complete fold + per-block partial top-k; the driver merges
  P×k candidate rows. Unlike triangle counting, AA needs wedges at
  EVERY common neighbor (degree orientation would drop apexes ranked
  above an endpoint), so wedge volume is Σ deg(w)² — the
  ``max_apex_degree`` cap is the documented scale knob: a hub apex w
  contributes only cn+1 and a vanishing 1/ln(deg w), so capping
  approximates scores while bounding work (default None = exact, which
  is what the oracle checks).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .derive import key_grouped_block_map
from .triangles import _dedup_block, _normalize
from .util import from_arrow_chunked, sql_round


def degree_assortativity(edges, outdeg: np.ndarray, indeg: np.ndarray):
    """Pearson r of (outdeg[src], indeg[dst]) over directed edges.

    ``edges``: Dataset with src/dst columns (blocks stay in the object
    store) or (src, dst) arrays. Returns a float, or None when either
    marginal has zero variance (the SQL NULL). The float expression
    matches the oracle exactly: double(nΣxy − ΣxΣy) /
    sqrt(double(nΣx²−(Σx)²) · double(nΣy²−(Σy)²)) over exact integers.
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
    deg_ref = ray.put(
        (outdeg.astype(np.int64, copy=False), indeg.astype(np.int64, copy=False))
    )

    def partial(t: pa.Table) -> pa.Table:
        od, idg = ray.get(deg_ref)  # zero-copy plasma read per task
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        x = od[s]
        y = idg[d]
        return pa.table(
            {
                "n": np.array([len(x)], dtype=np.int64),
                "sx": np.array([x.sum()], dtype=np.int64),
                "sy": np.array([y.sum()], dtype=np.int64),
                "sxy": np.array([(x * y).sum()], dtype=np.int64),
                "sxx": np.array([(x * x).sum()], dtype=np.int64),
                "syy": np.array([(y * y).sum()], dtype=np.int64),
            }
        )

    parts = pa.concat_tables(
        ray.get(
            edges.select_columns(["src", "dst"])
            .map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
    )
    # Python-int fold: per-block sums are int64-safe (degree² × block
    # rows), the global fold is unbounded
    n = sum(parts.column("n").to_pylist())
    if n == 0:
        return None
    sx = sum(parts.column("sx").to_pylist())
    sy = sum(parts.column("sy").to_pylist())
    sxy = sum(parts.column("sxy").to_pylist())
    sxx = sum(parts.column("sxx").to_pylist())
    syy = sum(parts.column("syy").to_pylist())
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if vx == 0 or vy == 0:
        return None
    return float(n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))


def _full_csr(a: np.ndarray, b: np.ndarray, n: int):
    """Unoriented CSR over vid space [0, n): offsets, ascending-sorted
    neighbor array, and the ASCENDING oriented edge-key array
    (min·n + max) for adjacency probes."""
    keys2 = np.sort(
        np.concatenate([a * np.int64(n) + b, b * np.int64(n) + a])
    )
    nbrs = keys2 % np.int64(n)
    offsets = np.searchsorted(keys2, np.arange(n + 1, dtype=np.int64) * np.int64(n))
    edge_keys = np.sort(np.minimum(a, b) * np.int64(n) + np.maximum(a, b))
    return offsets, nbrs, edge_keys


@ray.remote(num_returns=3)
def _full_csr_build(n: int, *tabs):
    """Build the unoriented CSR (+ edge keys, degrees, and the O(V)
    two-hop work mass used for equal-WORK chunking) IN A WORKER from
    the simple Dataset's block refs — the edge set never touches the
    driver (the FOG analog is the shared mmapped ``index_vert_array``,
    fogsrc/index_vert_array.cpp:25-167, which is likewise never
    resident in the coordinating process). The driver receives the
    O(V+E) structure as an object REF plus the two O(V) arrays it
    legitimately needs for planning/output."""
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
    offsets, nbrs, edge_keys = _full_csr(a, b, n)
    deg = np.diff(offsets).astype(np.int64)
    cum = np.r_[0, np.cumsum(deg[nbrs].astype(np.float64))]
    t2 = cum[offsets[1:]] - cum[offsets[:-1]]
    mass = np.cumsum(t2 + 1.0)
    return (offsets, nbrs, edge_keys, deg), deg, mass


@ray.remote
def _aa_rescore(csr_ref, gu: np.ndarray, gv: np.ndarray, max_apex_degree):
    """Exact float64 Adamic-Adar (and resource-allocation) for the k
    winning pairs via CSR neighbor intersection — O(k · deg) probes
    against the plasma CSR, run in a worker so the driver never maps
    the O(V+E) structure."""
    offsets, nbrs, _ek, deg = (
        ray.get(csr_ref) if not isinstance(csr_ref, tuple) else csr_ref
    )
    aa = np.zeros(len(gu), dtype=np.float64)
    ra = np.zeros(len(gu), dtype=np.float64)
    for i in range(len(gu)):
        cu = nbrs[offsets[gu[i]]:offsets[gu[i] + 1]]
        cv = nbrs[offsets[gv[i]]:offsets[gv[i] + 1]]
        common = np.intersect1d(cu, cv, assume_unique=True)
        if max_apex_degree is not None:
            common = common[deg[common] <= max_apex_degree]
        d = deg[common].astype(np.float64)
        aa[i] = (1.0 / np.log(d)).sum()
        ra[i] = (1.0 / d).sum()
    return aa, ra


def adamic_adar(
    edges,
    n: int,
    *,
    k: int = 100,
    max_apex_degree: int | None = None,
    dense_max_vertices: int = 24_000,
    extra_scores: bool = False,
) -> pa.Table:
    """Top-``k`` non-adjacent pairs by common-neighbor count, with the
    Adamic-Adar score. See the module docstring for the dataflow and
    the ``max_apex_degree`` scale knob.

    Two regimes (the triangles broadcast/shuffle split, applied to
    pairs): when ``n <= dense_max_vertices`` the O(V+E) CSR is plasma-
    broadcast once and each endpoint row-chunk accumulates its two-hop
    walks with ONE fused-key bincount into a dense (rows × n) count
    block — total work Σ deg(w)² integer adds — with adjacency
    masking, threshold pruning and local top-k all IN-TASK; the
    exchange is #tasks × k rows, never Σdeg² wedge rows, and exact
    float64 aa is rescored on the driver for the k winners only.
    Dense co-occurrence graphs make this the difference between a
    bincount sweep and a hundred-million-row sort (60s → ~9s at
    sf0.1). Beyond the cutoff (where a single n-wide count row stops
    being cheap) the wedge-partial sort path runs — real web-scale
    link graphs are sparse there (distinct pairs per block ≪ V²),
    which is exactly where a sort exchange is the right shape.

    -> pa.Table (u, v, cn, aa, rk), rk 1..k by (cn DESC, u, v).
    """
    ecols = {
        "u": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64()),
        "cn": pa.array([], pa.int64()),
        "aa": pa.array([], pa.float64()),
    }
    if extra_scores:
        ecols["ra"] = pa.array([], pa.float64())
        ecols["pref"] = pa.array([], pa.int64())
    ecols["rk"] = pa.array([], pa.int64())
    empty = pa.table(ecols)
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
    normalized = edges.map_batches(_normalize, batch_format="pyarrow").materialize()
    if normalized.count() == 0:
        return empty
    simple = key_grouped_block_map(
        normalized.sort(["a", "b"]), ["a", "b"], _dedup_block
    ).materialize()
    if n <= dense_max_vertices:
        refs = list(simple.to_arrow_refs())
        csr_ref, deg_ref, mass_ref = _full_csr_build.remote(n, *refs)
        mass = ray.get(mass_ref)  # O(V) planning array only
        return _dense_adamic_adar(
            csr_ref, mass, n, k=k, max_apex_degree=max_apex_degree,
            extra_scores=extra_scores, deg_ref=deg_ref,
        )
    return _sparse_adamic_adar(
        simple, n, k=k, max_apex_degree=max_apex_degree, empty=empty,
        extra_scores=extra_scores,
    )


def _sparse_adamic_adar(
    simple: rd.Dataset,
    n: int,
    *,
    k: int,
    max_apex_degree: int | None,
    empty: pa.Table,
    extra_scores: bool = False,
) -> pa.Table:
    """Wedge-partial sort regime, fully Dataset-native (the 100-TB
    shape — NO CSR or broadcast adjacency anywhere): each apex's
    neighbor list arrives group-complete from ONE (apex, nbr) sort of
    the symmetrized simple edges, every block emits pre-combined
    per-pair (cn, aa) partials (the apex's degree IS its run length,
    so the 1/log(deg) weight needs no side array), and true-adjacent
    pairs are dropped by unioning the edge rows as cn=-1 MARKERS
    through the pair-key sort — a group holding a marker is an edge.
    The exchange ships wedge partials + E marker rows; the largest
    structure resident in any task is one apex group."""
    nn = np.int64(n)
    partial_schema = pa.schema(
        [("key", pa.int64()), ("cn", pa.int64()), ("aa", pa.float64()),
         ("ra", pa.float64())]
    )
    empty_partial = partial_schema.empty_table()

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "apex": np.concatenate([a, b]).astype(np.int64),
                "nbr": np.concatenate([b, a]).astype(np.int64),
            }
        )

    adj = simple.map_batches(sym, batch_format="pyarrow")

    def wedge_partials_block(t: pa.Table) -> pa.Table:
        """Block is group-complete in apex and (apex, nbr)-sorted:
        each run is one apex's full ascending neighbor list; expand its
        wedge pairs (first < second by construction) and pre-combine
        per pair key with ONE fused-key bincount."""
        from .engine import expand_ranges

        if t.num_rows == 0:
            return empty_partial
        apex = t.column("apex").to_numpy(zero_copy_only=False)
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, apex[1:] != apex[:-1]])
        sizes = np.diff(np.r_[starts, len(apex)])
        if max_apex_degree is not None:
            keep_run = sizes <= max_apex_degree
            if not keep_run.all():
                nbr = nbr[np.repeat(keep_run, sizes)]
                sizes = sizes[keep_run]
            if len(nbr) == 0:
                return empty_partial
        ends = np.repeat(np.cumsum(sizes), sizes)
        pos = np.arange(len(nbr), dtype=np.int64)
        wn = ends - pos - 1
        if int(wn.sum()) == 0:
            return empty_partial
        firsts = np.repeat(nbr, wn)
        seconds = nbr[expand_ranges(pos + 1, ends)]
        with np.errstate(divide="ignore"):  # deg-1 runs emit 0 wedges
            w_row = 1.0 / np.log(sizes.astype(np.float64))
        r_row = 1.0 / sizes.astype(np.float64)
        rep = np.repeat(np.arange(len(sizes)), sizes)
        rep = np.repeat(rep, wn)
        w_aa = w_row[rep]
        w_ra = r_row[rep]
        pk = firsts * nn + seconds
        ukey, inv, cnt = np.unique(pk, return_inverse=True, return_counts=True)
        aa = np.bincount(inv, weights=w_aa, minlength=len(ukey))
        ra = np.bincount(inv, weights=w_ra, minlength=len(ukey))
        return pa.table(
            {
                "key": ukey.astype(np.int64),
                "cn": cnt.astype(np.int64),
                "aa": aa.astype(np.float64),
                "ra": ra.astype(np.float64),
            }
        )

    partials = key_grouped_block_map(
        adj.sort(["apex", "nbr"]), ["apex"], wedge_partials_block
    )

    def mark(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        key = a.astype(np.int64) * nn + b.astype(np.int64)
        return pa.table(
            {
                "key": key,
                "cn": np.full(len(key), -1, dtype=np.int64),
                "aa": np.zeros(len(key), dtype=np.float64),
                "ra": np.zeros(len(key), dtype=np.float64),
            },
            schema=partial_schema,
        )

    markers = simple.map_batches(mark, batch_format="pyarrow")
    unioned = partials.union(markers)

    def fold_topk(t: pa.Table) -> pa.Table:
        """Group-complete per-pair totals; a group whose min cn is the
        -1 marker IS an edge of the simple graph -> dropped; keep the
        block's top-k by (cn DESC, key ASC)."""
        if t.num_rows == 0:
            return empty_partial
        key = t.column("key").to_numpy(zero_copy_only=False)
        cn = t.column("cn").to_numpy(zero_copy_only=False)
        aa = t.column("aa").to_numpy(zero_copy_only=False)
        ra = t.column("ra").to_numpy(zero_copy_only=False)
        # key-sorted (group-complete): reduceat over boundaries
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        nonadj = np.minimum.reduceat(cn, bounds) != -1
        ukey = key[bounds][nonadj]
        tcn = np.add.reduceat(cn, bounds)[nonadj]
        taa = np.add.reduceat(aa, bounds)[nonadj]
        tra = np.add.reduceat(ra, bounds)[nonadj]
        if len(ukey) == 0:
            return empty_partial
        order = np.lexsort((ukey, -tcn))[:k]
        return pa.table(
            {
                "key": ukey[order].astype(np.int64),
                "cn": tcn[order].astype(np.int64),
                "aa": taa[order].astype(np.float64),
                "ra": tra[order].astype(np.float64),
            }
        )

    tops = pa.concat_tables(
        ray.get(
            key_grouped_block_map(unioned.sort(["key"]), ["key"], fold_topk)
            .materialize()
            .to_arrow_refs()
        )
    )
    if tops.num_rows == 0:
        return empty
    key = tops.column("key").to_numpy(zero_copy_only=False)
    cn = tops.column("cn").to_numpy(zero_copy_only=False)
    aa = tops.column("aa").to_numpy(zero_copy_only=False)
    ra = tops.column("ra").to_numpy(zero_copy_only=False)
    order = np.lexsort((key, -cn))[:k]
    key, cn, aa, ra = key[order], cn[order], aa[order], ra[order]
    gu = (key // nn).astype(np.int64)
    gv = (key % nn).astype(np.int64)
    cols = {
        "u": pa.array(gu),
        "v": pa.array(gv),
        "cn": pa.array(cn.astype(np.int64)),
        "aa": pa.array(sql_round(aa)),
    }
    if extra_scores:
        # O(V) undirected-degree fold from per-block partials — the
        # only side array the driver holds, same budget as outdeg.
        deg = np.zeros(n, dtype=np.int64)
        for bu, bc in ray.get(
            [_sym_deg_partial.remote(r) for r in simple.to_arrow_refs()]
        ):
            np.add.at(deg, bu, bc)
        cols["ra"] = pa.array(sql_round(ra))
        cols["pref"] = pa.array((deg[gu] * deg[gv]).astype(np.int64))
    cols["rk"] = pa.array(np.arange(1, len(key) + 1, dtype=np.int64))
    return pa.table(cols)


@ray.remote
def _sym_deg_partial(t: pa.Table):
    """O(distinct vid) undirected-degree partial for one simple-edge
    block (each (a, b) row contributes to both endpoints)."""
    if t.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a = t.column("a").to_numpy(zero_copy_only=False)
    b = t.column("b").to_numpy(zero_copy_only=False)
    u, c = np.unique(np.concatenate([a, b]), return_counts=True)
    return u.astype(np.int64), c.astype(np.int64)


@ray.remote
def _aa_chunk_topk(csr_ref, lo: int, hi: int, k: int, max_apex_degree):
    """Local top-k over pair rows u ∈ [lo, hi): every two-hop walk
    u → w → v is expanded vectorized from the broadcast CSR
    (expand_ranges twice) and accumulated into the chunk's dense
    (hi-lo)×n count block with ONE fused-key bincount — total work is
    Σ deg(w)² adds across all chunks, never an n³ GEMM or a wedge-row
    exchange. True-adjacent cells are zeroed (from the chunk's own CSR
    rows) BEFORE threshold pruning so ties never displace legit rows;
    only ≤ k tiny rows leave the task. Scores are NOT computed here:
    ranking is all-integer (cn DESC, u, v); the driver rescopes exact
    aa for the k winners only."""
    from .engine import expand_ranges

    offsets, nbrs, _ek, deg = (
        ray.get(csr_ref) if not isinstance(csr_ref, tuple) else csr_ref
    )
    n = len(offsets) - 1
    z = np.zeros(0, dtype=np.int64)
    if hi <= lo:
        return z, z, z
    ids = np.arange(lo, hi, dtype=np.int64)
    sizes = offsets[ids + 1] - offsets[ids]
    w = nbrs[expand_ranges(offsets[ids], offsets[ids + 1])]
    u_per_w = np.repeat(ids, sizes)
    ev, eu = w, u_per_w  # first-hop pairs = the chunk's adjacency cells
    if max_apex_degree is not None:
        keep = deg[w] <= max_apex_degree
        w, u_per_w = w[keep], u_per_w[keep]
    wsz = offsets[w + 1] - offsets[w]
    v = nbrs[expand_ranges(offsets[w], offsets[w + 1])]
    u_all = np.repeat(u_per_w, wsz)
    m = v > u_all  # upper triangle only; also drops v == u
    if not m.any():
        return z, z, z
    key = (u_all[m] - lo) * n + v[m]
    cn = np.bincount(key, minlength=(hi - lo) * n)
    # zero TRUE-adjacent pairs (they are predictions of existing edges)
    em = ev > eu
    cn[(eu[em] - lo) * n + ev[em]] = 0
    if len(cn) > k:
        thresh = max(int(np.partition(cn, len(cn) - k)[len(cn) - k]), 1)
    else:
        thresh = 1
    sel = np.flatnonzero(cn >= thresh)
    gu = sel // n + lo
    gv = sel % n
    cnt = cn[sel]
    if len(gu) > k:  # trim threshold ties deterministically
        order = np.lexsort((gv, gu, -cnt))[:k]
        gu, gv, cnt = gu[order], gv[order], cnt[order]
    return gu.astype(np.int64), gv.astype(np.int64), cnt.astype(np.int64)


def _dense_adamic_adar(
    csr_ref,
    mass: np.ndarray,
    n: int,
    *,
    k: int,
    max_apex_degree: int | None,
    extra_scores: bool = False,
    deg_ref=None,
) -> pa.Table:
    """Broadcast-regime AA (see :func:`adamic_adar`): the O(V+E) CSR
    lives in plasma (worker-built, workers map it zero-copy), two-hop
    bincount accumulation per endpoint row-chunk with in-task masking
    and top-k — the driver merges #tasks × k candidate rows, ranks by
    the all-integer (cn DESC, u, v) order, and a worker computes EXACT
    float64 aa only for the k winners via CSR neighbor intersection.
    The n² pair space is never materialized anywhere; per-task memory
    is the (chunk_rows × n) count block, capped below. The driver
    touches only ``mass`` — the O(V) cumulative two-hop work used for
    equal-WORK chunk bounds (Σ_{u ∈ chunk} Σ_{w ∈ N(u)} deg(w))."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    ntasks = max(1, min(4 * cpus, n // 8 or 1))
    targets = np.linspace(0, mass[-1], ntasks + 1)[1:-1]
    max_rows = max(1, (16 << 20) // max(n, 1))
    bounds = np.unique(
        np.r_[0, np.searchsorted(mass, targets), np.arange(0, n, max_rows), n]
    )
    parts = ray.get(
        [
            _aa_chunk_topk.remote(csr_ref, int(lo), int(hi), k, max_apex_degree)
            for lo, hi in zip(bounds[:-1], bounds[1:])
            if hi > lo
        ]
    )
    gu = np.concatenate([p[0] for p in parts])
    gv = np.concatenate([p[1] for p in parts])
    cnt = np.concatenate([p[2] for p in parts])
    order = np.lexsort((gv, gu, -cnt))[:k]
    gu, gv, cnt = gu[order], gv[order], cnt[order]
    aa, ra = ray.get(_aa_rescore.remote(csr_ref, gu, gv, max_apex_degree))
    cols = {
        "u": pa.array(gu),
        "v": pa.array(gv),
        "cn": pa.array(cnt),
        "aa": pa.array(sql_round(aa)),
    }
    if extra_scores:
        deg = ray.get(deg_ref)
        cols["ra"] = pa.array(sql_round(ra))
        cols["pref"] = pa.array((deg[gu] * deg[gv]).astype(np.int64))
    cols["rk"] = pa.array(np.arange(1, len(gu) + 1, dtype=np.int64))
    return pa.table(cols)


def two_hop_size(
    edges, n: int, *, target_chunk_rows: int = 4_000_000, closure: str = "auto"
) -> pa.Table:
    """Distinct two-hop neighborhood size per vertex over the DIRECTED
    distinct edge set: |{w != v : v -> u -> w}| — the friend-of-friend
    reach feature.

    ``closure="broadcast"`` (default below ~50M edges): the O(V+E)
    directed CSR is worker-built over the Dataset's block refs and
    ships to plasma once; vertex ranges are chunked by their actual
    two-hop work (Σ_{u in N(v)} outdeg(u), so one hub range cannot
    stall the wave), and each task expands its walks vectorized
    (expand_ranges twice) and counts distinct (v, w) pairs with ONE
    fused-key np.unique — only the O(chunk vertices) count rows leave
    the task. Vertices with out-edges but no two-hop reach report 0
    (the oracle's LEFT JOIN).

    ``closure="shuffle"``: the Dataset-native any-scale path — both
    edge directions meet at their middle vertex through ONE sort
    (group-complete in ``mid``), each block cross-joins in-origins ×
    out-targets into fused (v, w) pair keys (pre-uniqued in-task), and
    a second sort resolves global distinctness; only O(V) count
    partials reach the driver. No CSR anywhere; exchange volume is the
    operator's work bound (Σ indeg·outdeg pre-deduped pair rows). Both
    paths agree exactly (pytest-asserted).

    ``edges`` must already be distinct (src, dst) pairs (true for the
    co-occurrence derivation, which GROUP-BYs pairs).

    -> pa.Table (vid, two_hop) over vids with outdeg > 0, sorted.
    """
    from .engine import expand_ranges

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
    if closure == "auto":
        closure = "broadcast" if edges.count() <= 50_000_000 else "shuffle"
    if closure == "shuffle":
        return _two_hop_shuffle(edges, n)
    refs = list(edges.to_arrow_refs())
    if not refs:
        return pa.table(
            {"vid": pa.array([], pa.int64()), "two_hop": pa.array([], pa.int64())}
        )
    # directed CSR built IN A WORKER over the block refs; the driver
    # pulls only the O(V) cumulative-work array for chunk planning
    csr_ref, cum_ref = _directed_csr_build.remote(n, *refs)
    cum = ray.get(cum_ref)
    if cum is None:
        return pa.table(
            {"vid": pa.array([], pa.int64()), "two_hop": pa.array([], pa.int64())}
        )
    total = int(cum[-1]) if n else 0
    n_chunks = max(1, min(n, -(-total // target_chunk_rows)))
    bounds = np.searchsorted(cum, np.linspace(0, total, n_chunks + 1)[1:-1])
    bounds = np.unique(np.r_[0, bounds + 1, n])
    futs = [
        _two_hop_chunk.remote(csr_ref, int(lo), int(hi))
        for lo, hi in zip(bounds[:-1], bounds[1:])
    ]
    vids, counts = [], []
    for gv, gc in ray.get(futs):
        vids.append(gv)
        counts.append(gc)
    vid = np.concatenate(vids) if vids else np.empty(0, np.int64)
    cnt = np.concatenate(counts) if counts else np.empty(0, np.int64)
    order = np.argsort(vid, kind="stable")
    return pa.table(
        {
            "vid": pa.array(vid[order].astype(np.int64)),
            "two_hop": pa.array(cnt[order].astype(np.int64)),
        }
    )


@ray.remote
def _outdeg_partial(t: pa.Table):
    """O(distinct src) out-degree partial for one edge block — degrees
    fold on the driver without edge bytes ever leaving the workers."""
    if t.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    s = t.column("src").to_numpy(zero_copy_only=False)
    u, c = np.unique(s, return_counts=True)
    return u.astype(np.int64), c.astype(np.int64)


def _two_hop_shuffle(edges: rd.Dataset, n: int) -> pa.Table:
    """Dataset-native two-hop distinct reach (see :func:`two_hop_size`,
    ``closure="shuffle"``): in-rows (mid=dst) and out-rows (mid=src)
    union through ONE mid sort; each group-complete block cross-joins
    its mids' in-origins × out-targets into fused v·n+w keys, uniqued
    in-task; a second key sort makes distinctness global and each block
    emits O(V) per-vertex count partials."""
    from .engine import expand_ranges

    nn = np.int64(n)
    out_schema = pa.schema([("vid", pa.int64()), ("two_hop", pa.int64())])
    outdeg = np.zeros(n, dtype=np.int64)
    for u, c in ray.get(
        [_outdeg_partial.remote(r) for r in edges.to_arrow_refs()]
    ):
        np.add.at(outdeg, u, c)
    if int(outdeg.sum()) == 0:
        return out_schema.empty_table()

    def tag(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "mid": np.concatenate([d, s]),
                "other": np.concatenate([s, d]),
                # 0 = in-origin v (v -> mid), 1 = out-target w (mid -> w)
                "tag": np.concatenate(
                    [np.zeros(len(s), np.int64), np.ones(len(d), np.int64)]
                ),
            }
        )

    key_schema = pa.schema([("key", pa.int64())])

    def pair_block(t: pa.Table) -> pa.Table:
        """Group-complete in mid, (mid, tag, other)-sorted: per mid the
        in-origin run [s, m) precedes the out-target run [m, e); expand
        the cross product vectorized and pre-unique the fused keys."""
        if t.num_rows == 0:
            return key_schema.empty_table()
        mid = t.column("mid").to_numpy(zero_copy_only=False)
        other = t.column("other").to_numpy(zero_copy_only=False)
        tg = t.column("tag").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, mid[1:] != mid[:-1]])
        ends = np.r_[starts[1:], len(mid)]
        # first out-target position per run (tag sorted within run)
        mids_pos = starts + np.add.reduceat(1 - tg, starts)
        # guard: reduceat on an empty trailing slice is never hit here
        # because starts always indexes a non-empty run
        nv = mids_pos - starts
        nw = ends - mids_pos
        tot = nv * nw
        live = tot > 0
        if not live.any():
            return key_schema.empty_table()
        st, mp, en = starts[live], mids_pos[live], ends[live]
        v_idx = expand_ranges(st, mp)  # all in-origin rows of live runs
        nw_per_v = np.repeat(en - mp, mp - st)
        w_idx = expand_ranges(
            np.repeat(mp, mp - st), np.repeat(en, mp - st)
        )
        v = np.repeat(other[v_idx], nw_per_v)
        w = other[w_idx]
        keep = v != w
        if not keep.any():
            return key_schema.empty_table()
        keys = np.unique(v[keep] * nn + w[keep])
        return pa.table({"key": keys})

    tagged = edges.map_batches(tag, batch_format="pyarrow")
    pairs = key_grouped_block_map(
        tagged.sort(["mid", "tag", "other"]), ["mid"], pair_block
    )

    partial_schema = pa.schema([("vid", pa.int64()), ("c", pa.int64())])

    def count_block(t: pa.Table) -> pa.Table:
        """Group-complete in key: every distinct pair lands in exactly
        one block, so per-vertex distinct counts are pure partials."""
        if t.num_rows == 0:
            return partial_schema.empty_table()
        key = t.column("key").to_numpy(zero_copy_only=False)
        uk = np.unique(key)
        v = (uk // nn).astype(np.int64)
        uv, cv = np.unique(v, return_counts=True)
        return pa.table({"vid": uv, "c": cv.astype(np.int64)})

    counts = key_grouped_block_map(pairs.sort(["key"]), ["key"], count_block)
    reach = np.zeros(n, dtype=np.int64)
    for t in ray.get(counts.materialize().to_arrow_refs()):
        if t.num_rows:
            np.add.at(
                reach,
                t.column("vid").to_numpy(zero_copy_only=False),
                t.column("c").to_numpy(zero_copy_only=False),
            )
    vids = np.flatnonzero(outdeg > 0).astype(np.int64)
    return pa.table(
        {"vid": pa.array(vids), "two_hop": pa.array(reach[vids])},
        schema=out_schema,
    )


@ray.remote(num_returns=2)
def _directed_csr_build(n: int, *tabs):
    """Directed CSR (out-neighbors sorted per source) built IN A
    WORKER from the edge Dataset's block refs, plus the O(V)
    cumulative per-vertex two-hop work (Σ_{u in N(v)} outdeg(u)) for
    equal-work chunking. Returns ``((offsets, nbrs), cum)``; ``cum``
    is ``None`` for an empty edge set."""
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return (None, None), None
    a = np.concatenate(
        [t.column("src").to_numpy(zero_copy_only=False) for t in tabs]
    )
    b = np.concatenate(
        [t.column("dst").to_numpy(zero_copy_only=False) for t in tabs]
    )
    keys = np.sort(a.astype(np.int64) * np.int64(n) + b.astype(np.int64))
    nbrs = keys % np.int64(n)
    offsets = np.searchsorted(keys, np.arange(n + 1, dtype=np.int64) * np.int64(n))
    outdeg = np.diff(offsets)
    work = np.zeros(n, dtype=np.int64)
    nzv = np.flatnonzero(outdeg)
    if len(nzv):
        work[nzv] = np.add.reduceat(outdeg[nbrs], offsets[nzv])
    return (offsets, nbrs), np.cumsum(work)


@ray.remote
def _two_hop_chunk(csr_ref, lo: int, hi: int):
    """Distinct (v, w) two-hop pairs for v in [lo, hi): expand the
    chunk's first hops, expand each hop's out-neighbors, drop w == v,
    fuse (v - lo)·n + w and np.unique — counts per v via one boundary
    diff. Returns only vids with outdeg > 0 in the range."""
    from .engine import expand_ranges

    offsets, nbrs = ray.get(csr_ref) if not isinstance(csr_ref, tuple) else csr_ref
    n = len(offsets) - 1
    z = np.zeros(0, dtype=np.int64)
    if hi <= lo:
        return z, z
    ids = np.arange(lo, hi, dtype=np.int64)
    sizes = offsets[ids + 1] - offsets[ids]
    ids = ids[sizes > 0]
    if len(ids) == 0:
        return z, z
    sizes = offsets[ids + 1] - offsets[ids]
    u = nbrs[expand_ranges(offsets[ids], offsets[ids + 1])]
    rel_per_u = np.repeat(np.arange(len(ids), dtype=np.int64), sizes)
    usz = offsets[u + 1] - offsets[u]
    w = nbrs[expand_ranges(offsets[u], offsets[u + 1])]
    rel_all = np.repeat(rel_per_u, usz)
    if len(ids) * n <= (1 << 28):
        # dense (chunk rows x n) boolean membership: the dedup is a
        # random-write sweep + a row sum — no sort of the pair rows
        # (3-5x cheaper than fused-key np.unique at the same work).
        # Mark ALL walks, then clear each row's self column — exactly
        # the w != v exclusion without materializing the mask and its
        # three O(pair-rows) gather/filter temporaries. Gated on the
        # MATRIX byte budget (256 MiB), not on n alone: a low-degree
        # graph can put 200k ids in one chunk (work-bounded chunking
        # bounds pair ROWS, not vertices), and rows x n bools would
        # then dwarf the work being saved.
        seen = np.zeros((len(ids), n), dtype=bool)
        seen[rel_all, w] = True
        seen[np.arange(len(ids)), ids] = False
        counts = seen.sum(axis=1).astype(np.int64)
    else:
        counts = np.zeros(len(ids), dtype=np.int64)
        m = w != ids[rel_all]
        if m.any():
            fused = rel_all[m] * np.int64(n) + w[m]
            uf = np.unique(fused)
            np.add.at(counts, uf // n, 1)
    return ids, counts


def partition_modularity(edges, labels_ref) -> pa.Table:
    """Newman modularity of a GIVEN vertex partition over a symmetric
    directed edge list (every undirected edge stored both ways):
    Q = Σ_c [ m_c/m2 − (D_c/m2)² ], m2 = |directed edges|, m_c =
    directed edges with both ends in community c, D_c = Σ out-degree
    over c. Shuffle-FREE: the (small) vid→community map is broadcast
    once via ``ray.put``; every edge block emits one EXACT int64
    (community, internal-count, degree-count) partial; the driver folds
    ints and evaluates the float sum once — the oracle's expression
    term-for-term (Σ over communities of identical doubles before one
    6-decimal round).

    ``labels_ref`` is a ``ray.put`` handle to (vids int64 sorted,
    community codes int64, n_communities) — attribute partitions (e.g.
    part brand) or algorithm output (cc / label propagation) both fit.

    -> one row (modularity DOUBLE, n_communities BIGINT, m2 BIGINT)
    """
    from .util import sql_round

    def partial(t: pa.Table) -> pa.Table:
        vids, codes, k = ray.get(labels_ref)
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        cs = codes[np.searchsorted(vids, s)]
        cd = codes[np.searchsorted(vids, d)]
        dc = np.bincount(cs, minlength=k).astype(np.int64)
        same = cs == cd
        mc = np.bincount(cs[same], minlength=k).astype(np.int64)
        nz = np.flatnonzero(dc | mc)
        return pa.table(
            {
                "c": pa.array(nz.astype(np.int64)),
                "mc": pa.array(mc[nz]),
                "dc": pa.array(dc[nz]),
            }
        )

    parts = pa.concat_tables(
        ray.get(
            edges.select_columns(["src", "dst"])
            .map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    _, _, k = ray.get(labels_ref)
    mc = np.zeros(k, dtype=np.int64)
    dc = np.zeros(k, dtype=np.int64)
    np.add.at(mc, parts.column("c").to_numpy(zero_copy_only=False),
              parts.column("mc").to_numpy(zero_copy_only=False))
    np.add.at(dc, parts.column("c").to_numpy(zero_copy_only=False),
              parts.column("dc").to_numpy(zero_copy_only=False))
    m2 = int(dc.sum())
    touched = np.flatnonzero(dc)
    md = float(m2)
    q = np.sum(
        mc[touched].astype(np.float64) / md
        - (dc[touched].astype(np.float64) / md) * (dc[touched].astype(np.float64) / md)
    )
    return pa.table(
        {
            "modularity": pa.array(sql_round(np.array([q]))),
            "n_communities": pa.array([len(touched)], pa.int64()),
            "m2": pa.array([m2], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# edge reciprocity (directed graphs)
# ---------------------------------------------------------------------------


def edge_reciprocity(edges) -> pa.Table:
    """Reciprocity of a DIRECTED distinct edge set (self-loops already
    dropped): the fraction of directed edges whose reverse edge also
    exists. Dataset-native: each block pre-combines its rows into
    (min, max) unordered-pair counts, ONE (a, b) sort makes every pair
    group-complete, each block emits a single (n_edges, n_recip)
    partial, and the driver folds O(blocks) rows — no adjacency
    structure anywhere. A pair group's total count is 1 (one-way) or 2
    (reciprocated) because the input is distinct and loop-free.

    -> pa.Table 1 row: (n_edges, n_recip, reciprocity) with
    reciprocity = round(n_recip / n_edges, 6).
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

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())])

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        key = np.stack([a, b])
        u, cnt = np.unique(key, axis=1, return_counts=True)
        return pa.table(
            {"a": u[0], "b": u[1], "c": cnt.astype(np.int64)}, schema=pair_schema
        )

    part_schema = pa.schema([("n_edges", pa.int64()), ("n_recip", pa.int64())])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        key = a * (b.max() + 1) + b if len(a) else a
        order = np.argsort(key, kind="stable")
        key = key[order]
        c = c[order]
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        tot = np.add.reduceat(c, bounds)
        return pa.table(
            {
                "n_edges": pa.array([int(tot.sum())], pa.int64()),
                "n_recip": pa.array([int((tot[tot == 2]).sum())], pa.int64()),
            },
            schema=part_schema,
        )

    parts = pa.concat_tables(
        ray.get(
            key_grouped_block_map(
                edges.select_columns(["src", "dst"])
                .map_batches(pairs, batch_format="pyarrow")
                .sort(["a", "b"]),
                ["a", "b"],
                fold,
            )
            .materialize()
            .to_arrow_refs()
        )
    )
    n_edges = int(pa.compute.sum(parts.column("n_edges")).as_py() or 0)
    n_recip = int(pa.compute.sum(parts.column("n_recip")).as_py() or 0)
    ratio = sql_round(np.array([n_recip / n_edges if n_edges else 0.0]))
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_recip": pa.array([n_recip], pa.int64()),
            "reciprocity": pa.array(ratio, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# 4-cycle counting (the butterfly/C4 motif)
# ---------------------------------------------------------------------------


@ray.remote
def _c4_chunk(csr_ref, lo: int, hi: int):
    """Σ C(cn, 2) over unordered pairs (u, v) with u ∈ [lo, hi), v > u:
    expand the chunk's two-hop walks from the plasma CSR and bincount
    them into the dense (hi-lo) × n count block — the adamic-adar chunk
    kernel with the top-k machinery replaced by ONE scalar fold, so
    nothing but one int leaves the task. Adjacent pairs are kept (a
    4-cycle's diagonal may be an edge)."""
    from .engine import expand_ranges

    offsets, nbrs, _ek, _deg = (
        ray.get(csr_ref) if not isinstance(csr_ref, tuple) else csr_ref
    )
    n = len(offsets) - 1
    if hi <= lo:
        return 0
    ids = np.arange(lo, hi, dtype=np.int64)
    sizes = offsets[ids + 1] - offsets[ids]
    w = nbrs[expand_ranges(offsets[ids], offsets[ids + 1])]
    u_per_w = np.repeat(ids, sizes)
    wsz = offsets[w + 1] - offsets[w]
    v = nbrs[expand_ranges(offsets[w], offsets[w + 1])]
    u_all = np.repeat(u_per_w, wsz)
    m = v > u_all  # upper triangle; also drops v == u
    if not m.any():
        return 0
    key = (u_all[m] - lo) * n + v[m]
    cn = np.bincount(key, minlength=(hi - lo) * n)
    return int((cn * (cn - 1) // 2).sum())


def four_cycles(edges, n: int, *, dense_max_vertices: int = 24_000) -> pa.Table:
    """Exact count of 4-cycles in the simple undirected graph:
    C4 = ½ Σ_{unordered pairs {u,v}} C(cn(u,v), 2) — every 4-cycle
    u–w–v–x–u is determined by a diagonal pair {u,v} plus two of its
    common neighbors, and has exactly two diagonals, hence the ½.

    Same Dataset-native wedge dataflow as the sparse adamic-adar path
    (ONE (apex, nbr) sort → group-complete per-apex wedge expansion with
    in-block per-pair pre-combine → ONE pair-key sort → group-complete
    Σ C(cn, 2) scalar partials), except adjacent pairs are KEPT (a
    4-cycle's diagonal may be an edge) so no marker union is needed.
    The driver folds O(blocks) int rows (Python ints — overflow-proof).

    -> pa.Table 1 row: (c4,).
    """
    from .engine import expand_ranges

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
    normalized = edges.map_batches(_normalize, batch_format="pyarrow").materialize()
    if normalized.count() == 0:
        return pa.table({"c4": pa.array([0], pa.int64())})
    simple = key_grouped_block_map(
        normalized.sort(["a", "b"]), ["a", "b"], _dedup_block
    )
    if n <= dense_max_vertices:
        # broadcast regime: worker-built CSR, equal-WORK chunks, one
        # scalar per task — no pair exchange anywhere (56s -> ~3s on
        # the sf0.1 co-occurrence graph vs the wedge-sort path)
        refs = list(simple.materialize().to_arrow_refs())
        csr_ref, _deg_ref, mass_ref = _full_csr_build.remote(n, *refs)
        mass = ray.get(mass_ref)
        if mass is None or not len(mass):
            return pa.table({"c4": pa.array([0], pa.int64())})
        cpus = int(ray.cluster_resources().get("CPU", 8))
        ntasks = max(1, min(4 * cpus, n // 8 or 1))
        targets = np.linspace(0, mass[-1], ntasks + 1)[1:-1]
        max_rows = max(1, (16 << 20) // max(n, 1))
        bounds = np.unique(
            np.r_[0, np.searchsorted(mass, targets),
                  np.arange(0, n, max_rows), n]
        )
        parts = ray.get(
            [
                _c4_chunk.remote(csr_ref, int(lo), int(hi))
                for lo, hi in zip(bounds[:-1], bounds[1:])
                if hi > lo
            ]
        )
        return pa.table({"c4": pa.array([sum(parts) // 2], pa.int64())})
    nn = np.int64(n)
    pair_schema = pa.schema([("key", pa.int64()), ("cn", pa.int64())])

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "apex": np.concatenate([a, b]).astype(np.int64),
                "nbr": np.concatenate([b, a]).astype(np.int64),
            }
        )

    def wedge_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        apex = t.column("apex").to_numpy(zero_copy_only=False)
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, apex[1:] != apex[:-1]])
        sizes = np.diff(np.r_[starts, len(apex)])
        ends = np.repeat(np.cumsum(sizes), sizes)
        pos = np.arange(len(nbr), dtype=np.int64)
        wn = ends - pos - 1
        if int(wn.sum()) == 0:
            return pair_schema.empty_table()
        firsts = np.repeat(nbr, wn)
        seconds = nbr[expand_ranges(pos + 1, ends)]
        pk = firsts * nn + seconds
        ukey, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {"key": ukey.astype(np.int64), "cn": cnt.astype(np.int64)},
            schema=pair_schema,
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"p": pa.array([], pa.int64())})
        key = t.column("key").to_numpy(zero_copy_only=False)
        cn = t.column("cn").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        tot = np.add.reduceat(cn, bounds)
        return pa.table(
            {"p": pa.array([int((tot * (tot - 1) // 2).sum())], pa.int64())}
        )

    adj = key_grouped_block_map(
        simple.map_batches(sym, batch_format="pyarrow").sort(["apex", "nbr"]),
        ["apex"],
        wedge_partials,
    )
    parts = pa.concat_tables(
        ray.get(
            key_grouped_block_map(adj.sort(["key"]), ["key"], fold)
            .materialize()
            .to_arrow_refs()
        )
    )
    total = sum(parts.column("p").to_pylist())  # Python ints
    return pa.table({"c4": pa.array([total // 2], pa.int64())})


# ---------------------------------------------------------------------------
# bibliographic coupling / co-citation (directed shared-neighbor pairs)
# ---------------------------------------------------------------------------


def shared_neighbor_pairs(edges, n: int, *, k: int = 50, mode: str = "out") -> pa.Table:
    """Top-``k`` vertex pairs of a DIRECTED distinct edge set by shared
    neighbors (Kessler 1963 / Small 1973, the classic link-analysis
    pair):

    - ``mode="out"`` — bibliographic coupling: pairs (u, v) ranked by
      |{x : u→x and v→x}| (edges grouped by dst, src pairs expanded);
    - ``mode="in"`` — co-citation: pairs ranked by |{x : x→u and x→v}|
      (grouped by src, dst pairs expanded).

    Same Dataset-native shape as the sparse adamic-adar wedge path:
    ONE (group, item) sort makes each shared neighbor's membership list
    group-complete, blocks expand ordered pairs pre-combined to fused
    int64 keys, ONE key sort + per-block partial top-k, driver merges
    blocks × k rows. Adjacent pairs are kept (coupling does not exclude
    direct links). -> (u, v, cn, rk), rk 1..k by (cn DESC, u, v)."""
    from .engine import expand_ranges

    group_col, item_col = ("dst", "src") if mode == "out" else ("src", "dst")
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
    nn = np.int64(n)
    pair_schema = pa.schema([("key", pa.int64()), ("cn", pa.int64())])
    empty = pa.table(
        {
            "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "cn": pa.array([], pa.int64()),
            "rk": pa.array([], pa.int64()),
        }
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        it = t.column(item_col).to_numpy(zero_copy_only=False)
        o = np.lexsort((it, g))
        g, it = g[o], it[o]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        sizes = np.diff(np.r_[starts, len(g)])
        ends = np.repeat(np.cumsum(sizes), sizes)
        pos = np.arange(len(it), dtype=np.int64)
        wn = ends - pos - 1
        if int(wn.sum()) == 0:
            return pair_schema.empty_table()
        firsts = np.repeat(it, wn)
        seconds = it[expand_ranges(pos + 1, ends)]
        pk = firsts * nn + seconds
        ukey, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {"key": ukey.astype(np.int64), "cn": cnt.astype(np.int64)},
            schema=pair_schema,
        )

    def fold_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        key = t.column("key").to_numpy(zero_copy_only=False)
        cn = t.column("cn").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ukey = key[bounds]
        tot = np.add.reduceat(cn, bounds)
        order = np.lexsort((ukey, -tot))[:k]
        return pa.table(
            {"key": ukey[order].astype(np.int64), "cn": tot[order].astype(np.int64)},
            schema=pair_schema,
        )

    partials = key_grouped_block_map(
        edges.select_columns(["src", "dst"]).sort([group_col, item_col]),
        [group_col],
        pair_partials,
    )
    tops = pa.concat_tables(
        ray.get(
            key_grouped_block_map(partials.sort(["key"]), ["key"], fold_topk)
            .materialize()
            .to_arrow_refs()
        )
    )
    if tops.num_rows == 0:
        return empty
    key = tops.column("key").to_numpy(zero_copy_only=False)
    cn = tops.column("cn").to_numpy(zero_copy_only=False)
    order = np.lexsort((key, -cn))[:k]
    key, cn = key[order], cn[order]
    return pa.table(
        {
            "u": pa.array((key // nn).astype(np.int64)),
            "v": pa.array((key % nn).astype(np.int64)),
            "cn": pa.array(cn.astype(np.int64)),
            "rk": pa.array(np.arange(1, len(key) + 1, dtype=np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# 1-WL color refinement (Weisfeiler-Leman vertex features)
# ---------------------------------------------------------------------------


def wl_refinement(edges, n: int, *, rounds: int = 2) -> "tuple[np.ndarray, np.ndarray]":
    """1-dimensional Weisfeiler-Leman color refinement over a DIRECTED
    distinct edge set (in-neighbor multisets), the classic
    graph-isomorphism vertex feature: from the uniform color
    c0 = md5(''), each round rehashes every vertex as
    md5(own || '|' || comma-join(sorted in-neighbor colors)) — vertices
    with no in-edges hash md5(own || '|'). Deterministic and mirrored
    literally by the SQL oracle's ordered string_agg.

    Dataflow per round: the O(V) 32-hex color array broadcasts once via
    ``ray.put``; the (dst, src)-sorted edge Dataset (sorted ONCE, blocks
    reused every round) maps group-complete dst blocks to (vid, color)
    updates. The in-block per-group join+md5 is a Python loop over the
    block's groups — the same per-row hashing budget as the md5
    fingerprint ops.

    Returns (touched_vids, colors[touched_vids])."""
    import hashlib

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
    touched = np.zeros(n, dtype=bool)
    has_in = np.zeros(n, dtype=bool)
    for t in ray.get(edges.to_arrow_refs()):
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        touched[s] = True
        touched[d] = True
        has_in[d] = True
    sorted_ds = edges.sort(["dst", "src"]).materialize()
    colors = np.full(n, hashlib.md5(b"").hexdigest(), dtype="<U32")

    upd_schema = pa.schema([("vid", pa.int64()), ("c", pa.string())])

    for _ in range(rounds):
        cref = ray.put(colors)

        def block(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return upd_schema.empty_table()
            cols_all = ray.get(cref)
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            o = np.lexsort((s, d))
            s, d = s[o], d[o]
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            ends = np.r_[starts[1:], len(d)]
            nbr_c = cols_all[s]
            vids, new_c = [], []
            for a, b in zip(starts, ends):
                v = int(d[a])
                joined = ",".join(sorted(nbr_c[a:b]))
                vids.append(v)
                new_c.append(
                    hashlib.md5(
                        (str(cols_all[v]) + "|" + joined).encode()
                    ).hexdigest()
                )
            return pa.table(
                {"vid": pa.array(vids, pa.int64()),
                 "c": pa.array(new_c, pa.string())},
                schema=upd_schema,
            )

        upds = pa.concat_tables(
            ray.get(
                key_grouped_block_map(sorted_ds, ["dst"], block)
                .materialize()
                .to_arrow_refs()
            )
        )
        nxt = colors.copy()
        # no-in-edge touched vertices rehash over the empty multiset
        for v in np.flatnonzero(touched & ~has_in):
            nxt[v] = hashlib.md5((str(colors[v]) + "|").encode()).hexdigest()
        uv = upds.column("vid").to_numpy(zero_copy_only=False)
        nxt[uv] = np.asarray(upds.column("c").to_pylist(), dtype="<U32")
        colors = nxt

    ids = np.flatnonzero(touched)
    return ids, colors[ids]


# ---------------------------------------------------------------------------
# densest subgraph (batched greedy peeling)
# ---------------------------------------------------------------------------


def densest_subgraph_rounds(edges, n: int, *, rounds: int = 4) -> pa.Table:
    """Batched greedy densest-subgraph peeling (Bahmani-Kumar-
    Vassilvitskii 2012, the MapReduce ½-approximation): each round
    drops every vertex whose degree is at most the current average
    (the EXACT integer test deg·V ≤ 2E — no float boundary), then
    keeps only edges with both endpoints surviving. Reports the
    per-round (n_vertices, n_edges, density) trajectory; the densest
    round is the approximation's answer.

    Dataset-native per round: degrees fold from O(distinct vid)
    per-block partials (no shuffle), the O(V) keep mask broadcasts via
    ``ray.put``, and one map_batches filters the edge blocks — ``rounds``
    linear passes, zero sorts after the initial dedup.

    -> pa.Table (round, n_vertices, n_edges, density) for rounds
    0..``rounds``.
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
    normalized = edges.map_batches(_normalize, batch_format="pyarrow").materialize()
    out_rounds, out_v, out_e = [], [], []
    if normalized.count() == 0:
        cur = None
    else:
        cur = key_grouped_block_map(
            normalized.sort(["a", "b"]), ["a", "b"], _dedup_block
        ).materialize()

    @ray.remote
    def deg_partial(t: pa.Table):
        v = np.concatenate(
            [t.column("a").to_numpy(zero_copy_only=False),
             t.column("b").to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(v, return_counts=True)
        return u, c

    for r in range(rounds + 1):
        if cur is None:
            out_rounds.append(r)
            out_v.append(0)
            out_e.append(0)
            continue
        deg = np.zeros(n, dtype=np.int64)
        for u, c in ray.get([deg_partial.remote(t) for t in cur.to_arrow_refs()]):
            np.add.at(deg, u, c)
        n_e = int(deg.sum()) // 2
        n_v = int((deg > 0).sum())
        out_rounds.append(r)
        out_v.append(n_v)
        out_e.append(n_e)
        if r == rounds or n_v == 0:
            cur = None if n_v == 0 else cur
            if r == rounds:
                break
            continue
        # exact integer threshold: drop v when deg[v] * V <= 2 * E
        # (int64-safe: deg, V <= 1e9 at any realistic scale)
        keep = deg * np.int64(n_v) > np.int64(2) * np.int64(n_e)
        keep_ref = ray.put(keep)

        def filt(t: pa.Table) -> pa.Table:
            k = ray.get(keep_ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            m = k[a] & k[b]
            return pa.table({"a": a[m], "b": b[m]})

        cur = cur.map_batches(filt, batch_format="pyarrow").materialize()
        if cur.count() == 0:
            cur = None

    dens = sql_round(
        np.array(
            [e / v if v else 0.0 for v, e in zip(out_v, out_e)],
            dtype=np.float64,
        )
    )
    return pa.table(
        {
            "round": pa.array(np.array(out_rounds, dtype=np.int64)),
            "n_vertices": pa.array(np.array(out_v, dtype=np.int64)),
            "n_edges": pa.array(np.array(out_e, dtype=np.int64)),
            "density": pa.array(dens, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# directed triad (closed-triple) census
# ---------------------------------------------------------------------------


def triad_census(edges, n: int) -> pa.Table:
    """Closed-triad motif census of a DISTINCT directed edge set with no
    self-loops — the two closed shapes of the classic triad census
    (Holland & Leinhardt 1976; the reference engine stops at undirected
    closure, application/tc.hpp):

    - ``cycle`` — unordered directed 3-cycles {u→m→w→u}; every cycle is
      seen as 3 rotations of ordered closed walks, so the count is
      (ordered closed walks) // 3;
    - ``transitive`` — ordered triples (u, m, w) with u→m, m→w and the
      shortcut u→w, each counted once per ordered path (mutual edges
      included), exactly matching the 3-way self-join oracle.

    Dataflow (sort + group-complete blocks, zero driver-side edge
    bytes): a two-channel tagged union keyed by the wedge MIDPOINT
    brings each mid's in-list and out-list into one block in ONE sort;
    blocks expand (u, w) wedge pairs fully vectorized (ragged cross
    product via expand_ranges) pre-combined to fused int64 keys u·n+w;
    a second tagged union sorts those wedge-count partials against
    forward ((u,w) ∈ E) and backward ((w,u) ∈ E) membership markers on
    the same fused key, and each group-complete block emits ONE exact
    int64 scalar partial per motif — the driver folds O(blocks) Python
    ints. Fused keys require n² < 2^63 (the shared_neighbor_pairs
    contract); hub mids cost in·out wedge rows (the documented wedge
    budget shared with adamic_adar / four_cycles)."""
    from .engine import expand_ranges

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
    edges = edges.select_columns(["src", "dst"])
    nn = np.int64(n)
    wedge_schema = pa.schema([("key", pa.int64()), ("cnt", pa.int64()), ("tag", pa.int8())])

    def tag_mid(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "mid": np.r_[d, s],
                "other": np.r_[s, d],
                "tag": np.r_[
                    np.zeros(len(s), dtype=np.int8), np.ones(len(s), dtype=np.int8)
                ],
            }
        )

    def wedge_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return wedge_schema.empty_table()
        mid = t.column("mid").to_numpy(zero_copy_only=False)
        other = t.column("other").to_numpy(zero_copy_only=False)
        tag = t.column("tag").to_numpy(zero_copy_only=False)
        o = np.lexsort((other, tag, mid))
        mid, other, tag = mid[o], other[o], tag[o]
        starts = np.flatnonzero(np.r_[True, mid[1:] != mid[:-1]])
        ends = np.r_[starts[1:], len(mid)]
        # per mid: ins = [start, split), outs = [split, end)
        splits = starts + np.add.reduceat((tag == 0).astype(np.int64), starts)
        a = splits - starts  # in-degree of mid
        b = ends - splits  # out-degree of mid
        total = int((a * b).sum())
        if total == 0:
            return wedge_schema.empty_table()
        # firsts: each in-neighbor repeated b_g times (group-aligned)
        firsts = np.repeat(other[expand_ranges(starts, splits)], np.repeat(b, a))
        seconds = other[expand_ranges(np.repeat(splits, a), np.repeat(ends, a))]
        m = firsts != seconds
        if not m.any():
            return wedge_schema.empty_table()
        pk = firsts[m] * nn + seconds[m]
        ukey, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "key": ukey.astype(np.int64),
                "cnt": cnt.astype(np.int64),
                "tag": np.zeros(len(ukey), dtype=np.int8),
            },
            schema=wedge_schema,
        )

    def tag_members(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": np.r_[s * nn + d, d * nn + s],
                "cnt": np.zeros(2 * len(s), dtype=np.int64),
                "tag": np.r_[
                    np.full(len(s), 1, dtype=np.int8), np.full(len(s), 2, dtype=np.int8)
                ],
            },
            schema=wedge_schema,
        )

    fold_schema = pa.schema([("trans", pa.int64()), ("walks", pa.int64())])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return fold_schema.empty_table()
        key = t.column("key").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        tag = t.column("tag").to_numpy(zero_copy_only=False)
        o = np.argsort(key, kind="stable")
        key, cnt, tag = key[o], cnt[o], tag[o]
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        wsum = np.add.reduceat(np.where(tag == 0, cnt, 0), bounds)
        has_f = np.maximum.reduceat((tag == 1).astype(np.int64), bounds)
        has_b = np.maximum.reduceat((tag == 2).astype(np.int64), bounds)
        return pa.table(
            {
                "trans": np.array([int((wsum * has_f).sum())], dtype=np.int64),
                "walks": np.array([int((wsum * has_b).sum())], dtype=np.int64),
            },
            schema=fold_schema,
        )

    from .util import collect_tables

    tagged = edges.map_batches(tag_mid, batch_format="pyarrow")
    wedges = key_grouped_block_map(tagged.sort(["mid", "tag"]), ["mid"], wedge_partials)
    members = edges.map_batches(tag_members, batch_format="pyarrow")
    partials = key_grouped_block_map(wedges.union(members).sort(["key"]), ["key"], fold)
    folded = collect_tables(partials, fold_schema)
    trans = int(pa.compute.sum(folded.column("trans")).as_py() or 0)
    walks = int(pa.compute.sum(folded.column("walks")).as_py() or 0)
    return pa.table(
        {
            "motif": pa.array(["cycle", "transitive"], pa.string()),
            "cnt": pa.array([walks // 3, trans], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# frequency-based (mode) label propagation — community LPA
# ---------------------------------------------------------------------------


def lpa_mode_rounds(edges, n: int, *, rounds: int = 4) -> pa.Table:
    """Synchronous community label propagation (Raghavan et al. 2007),
    distinct from the engine's min-label FOG semantics: every round,
    each vertex adopts the MOST FREQUENT label among its in-neighbors
    (ties break to the smallest label; isolated vertices keep their
    label). Fixed ``rounds`` for a deterministic, SQL-unrollable
    result.

    Per round: broadcast the O(V) label array once, every edge block
    pre-combines (dst, neighbor-label) counts (np.unique on fused
    keys), ONE sort brings each dst's counts group-complete, and the
    mode pick is a vectorized lexsort-first — the exchange ships
    pre-combined label counts, never raw edges. -> (vid, label)."""
    from .util import collect_tables

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
    nn = np.int64(n)
    cnt_schema = pa.schema([("v", pa.int64()), ("lab", pa.int64()), ("c", pa.int64())])

    def count_block(t: pa.Table, lab_ref) -> pa.Table:
        if t.num_rows == 0:
            return cnt_schema.empty_table()
        lab = ray.get(lab_ref) if isinstance(lab_ref, ray.ObjectRef) else lab_ref
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        key = d * nn + lab[s]
        uk, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "v": (uk // nn).astype(np.int64),
                "lab": (uk % nn).astype(np.int64),
                "c": c.astype(np.int64),
            },
            schema=cnt_schema,
        )

    mode_schema = pa.schema([("v", pa.int64()), ("lab", pa.int64())])

    def mode_block(t: pa.Table) -> pa.Table:
        """Blocks are v-COMPLETE (grouped on the dst column, not the
        fused key — a dst's labels may straddle fused-key block cuts):
        fold duplicate (v, lab) partials, then pick the per-v mode with
        the (count DESC, label ASC) rule."""
        if t.num_rows == 0:
            return mode_schema.empty_table()
        v = t.column("v").to_numpy(zero_copy_only=False)
        lab = t.column("lab").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        key = v * nn + lab
        o = np.argsort(key, kind="stable")
        key, c = key[o], c[o]
        kb = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ukey = key[kb]
        tot = np.add.reduceat(c, kb)
        vv = (ukey // nn).astype(np.int64)
        ll = (ukey % nn).astype(np.int64)
        o2 = np.lexsort((ll, -tot, vv))
        vv, ll = vv[o2], ll[o2]
        first = np.r_[True, vv[1:] != vv[:-1]]
        return pa.table({"v": vv[first], "lab": ll[first]}, schema=mode_schema)

    labels = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        lab_ref = ray.put(labels)
        partials = edges.map_batches(
            lambda t, r=lab_ref: count_block(t, r), batch_format="pyarrow"
        )
        modes = collect_tables(
            key_grouped_block_map(partials.sort(["v", "lab"]), ["v"], mode_block),
            mode_schema,
        )
        labels = labels.copy()
        labels[modes.column("v").to_numpy(zero_copy_only=False)] = modes.column(
            "lab"
        ).to_numpy(zero_copy_only=False)
    touched_mask = np.zeros(n, dtype=bool)

    def touch_block(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"v": np.unique(np.r_[s, d]).astype(np.int64)})

    tv = collect_tables(
        edges.map_batches(touch_block, batch_format="pyarrow"),
        pa.schema([("v", pa.int64())]),
    )
    touched = np.unique(tv.column("v").to_numpy(zero_copy_only=False))
    return pa.table(
        {
            "vid": pa.array(touched.astype(np.int64)),
            "label": pa.array(labels[touched].astype(np.int64)),
        }
    )
