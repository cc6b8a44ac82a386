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
from .triangles import _apex_wedges, _dedup_block, _normalize
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
    """Exact float64 Adamic-Adar for the k winning pairs via CSR
    neighbor intersection — O(k · deg) probes against the plasma CSR,
    run in a worker so the driver never maps the O(V+E) structure."""
    offsets, nbrs, _ek, deg = (
        ray.get(csr_ref) if not isinstance(csr_ref, tuple) else csr_ref
    )
    aa = np.zeros(len(gu), dtype=np.float64)
    for i in range(len(gu)):
        cu = nbrs[offsets[gu[i]]:offsets[gu[i] + 1]]
        cv = nbrs[offsets[gv[i]]:offsets[gv[i] + 1]]
        common = np.intersect1d(cu, cv, assume_unique=True)
        if max_apex_degree is not None:
            common = common[deg[common] <= max_apex_degree]
        aa[i] = (1.0 / np.log(deg[common].astype(np.float64))).sum()
    return aa


def adamic_adar(
    edges,
    n: int,
    *,
    k: int = 100,
    max_apex_degree: int | None = None,
    dense_max_vertices: int = 24_000,
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
    empty = pa.table(
        {
            "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "cn": pa.array([], pa.int64()),
            "aa": pa.array([], pa.float64()),
            "rk": pa.array([], pa.int64()),
        }
    )
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
    refs = list(simple.to_arrow_refs())
    csr_ref, _deg_ref, mass_ref = _full_csr_build.remote(n, *refs)
    if n <= dense_max_vertices:
        mass = ray.get(mass_ref)  # O(V) planning array only
        return _dense_adamic_adar(
            csr_ref, mass, n, k=k, max_apex_degree=max_apex_degree
        )
    nn = np.int64(n)

    def wedge_partials(t: pa.Table) -> pa.Table:
        """Per-pair (cn, aa) partials for wedges whose apex id falls in
        this batch — fused int64 pair key, bincount pre-aggregation."""
        offs, nb, _, dg = ray.get(csr_ref)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        if max_apex_degree is not None:
            sz = offs[ids + 1] - offs[ids]
            ids = ids[sz <= max_apex_degree]
        apexes, firsts, seconds = _apex_wedges(ids, offs, nb)
        if len(firsts) == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "cn": pa.array([], pa.int64()),
                    "aa": pa.array([], pa.float64()),
                }
            )
        # nb is ascending per apex, so firsts < seconds already
        pk = firsts * nn + seconds
        ukey, inv, cnt = np.unique(pk, return_inverse=True, return_counts=True)
        w_aa = 1.0 / np.log(dg[apexes].astype(np.float64))
        aa = np.bincount(inv, weights=w_aa, minlength=len(ukey))
        return pa.table(
            {
                "key": ukey.astype(np.int64),
                "cn": cnt.astype(np.int64),
                "aa": aa.astype(np.float64),
            }
        )

    cpus = int(ray.cluster_resources().get("CPU", 8))
    bs = max(64, n // (cpus * 4))
    partials = rd.range(n).map_batches(
        wedge_partials, batch_format="pyarrow", batch_size=bs
    )

    def fold_topk(t: pa.Table) -> pa.Table:
        """Group-complete per-pair totals, drop adjacent pairs, keep the
        block's top-k by (cn DESC, key ASC)."""
        out_empty = pa.table(
            {
                "key": pa.array([], pa.int64()),
                "cn": pa.array([], pa.int64()),
                "aa": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return out_empty
        key = t.column("key").to_numpy(zero_copy_only=False)
        cn = t.column("cn").to_numpy(zero_copy_only=False)
        aa = t.column("aa").to_numpy(zero_copy_only=False)
        # key-sorted (group-complete): reduceat over boundaries
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ukey = key[bounds]
        tcn = np.add.reduceat(cn, bounds)
        taa = np.add.reduceat(aa, bounds)
        _, _, ek, _ = ray.get(csr_ref)
        at = np.searchsorted(ek, ukey)
        at[at >= len(ek)] = len(ek) - 1 if len(ek) else 0
        nonadj = (ek[at] != ukey) if len(ek) else np.ones(len(ukey), bool)
        ukey, tcn, taa = ukey[nonadj], tcn[nonadj], taa[nonadj]
        if len(ukey) == 0:
            return out_empty
        order = np.lexsort((ukey, -tcn))[:k]
        return pa.table(
            {
                "key": ukey[order].astype(np.int64),
                "cn": tcn[order].astype(np.int64),
                "aa": taa[order].astype(np.float64),
            }
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
    aa = tops.column("aa").to_numpy(zero_copy_only=False)
    order = np.lexsort((key, -cn))[:k]
    key, cn, aa = key[order], cn[order], aa[order]
    return pa.table(
        {
            "u": pa.array((key // nn).astype(np.int64)),
            "v": pa.array((key % nn).astype(np.int64)),
            "cn": pa.array(cn.astype(np.int64)),
            "aa": pa.array(sql_round(aa)),
            "rk": pa.array(np.arange(1, len(key) + 1, dtype=np.int64)),
        }
    )


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
    aa = ray.get(_aa_rescore.remote(csr_ref, gu, gv, max_apex_degree))
    return pa.table(
        {
            "u": pa.array(gu),
            "v": pa.array(gv),
            "cn": pa.array(cnt),
            "aa": pa.array(sql_round(aa)),
            "rk": pa.array(np.arange(1, len(gu) + 1, dtype=np.int64)),
        }
    )


def two_hop_size(edges, n: int, *, target_chunk_rows: int = 4_000_000) -> pa.Table:
    """Distinct two-hop neighborhood size per vertex over the DIRECTED
    distinct edge set: |{w != v : v -> u -> w}| — the friend-of-friend
    reach feature. Same broadcast-CSR chunk dataflow as
    :func:`adamic_adar`'s dense path: the O(V+E) CSR ships to plasma
    once, vertex ranges are chunked by their actual two-hop work
    (Σ_{u in N(v)} outdeg(u), so one hub range cannot stall the wave),
    and each task expands its walks vectorized (expand_ranges twice)
    and counts distinct (v, w) pairs with ONE fused-key np.unique —
    only the O(chunk vertices) count rows leave the task. Vertices with
    out-edges but no two-hop reach report 0 (the oracle's LEFT JOIN).

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
    refs = list(
        edges.select_columns(["src", "dst"]).materialize().to_arrow_refs()
    )
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
