"""Similarity search over an embedding column (``list<float>``).

- :func:`ann_topk_bruteforce` — the exact baseline: the query matrix is
  broadcast ONCE (``ray.put``), every corpus block computes block x Q
  cosines as one float64 matmul and emits its per-block top-k partials;
  the driver merges partials (k x Q rows per block — tiny). No corpus
  row ever leaves its block unless it is a candidate.

- :class:`IVFIndex` / :func:`ann_topk_ivf` — the scale path: a coarse
  quantizer (deterministic seeded Lloyd iterations, each a single
  ``map_batches`` partial-sum round) partitions the corpus into nlist
  cells; a query probes only its nprobe nearest cells. Recall tested in
  tests/test_datapipes.py against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..util import list_col_matrix, sql_round

#: rows sampled for the deterministic seed (bottom-N by id) — see IVFIndex.fit
SEED_FACTOR = 8
SEED_MIN = 256


def _to_matrix(t: pa.Table, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    return ids, list_col_matrix(t.column(vec_col))


def _unit(vecs: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(vecs, axis=1)
    n[n == 0] = 1.0
    return vecs / n[:, None]


def _sq_dists(v: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Pairwise squared distances via |v|^2 + |c|^2 - 2 v.c — one matmul
    instead of an O(rows x centroids x dim) broadcast temporary."""
    return (
        (v * v).sum(axis=1)[:, None]
        + (c * c).sum(axis=1)[None, :]
        - 2.0 * (v @ c.T)
    )


def ann_topk_bruteforce(
    emb_ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k. Returns (qid, nid, score) with score rounded
    to 6 decimals; candidates exclude the query's own vec_id. Ordering
    rule on ties: higher score first, then lower nid (mirrored by the
    SQL oracle's ROW_NUMBER ORDER BY)."""
    qunit = _unit(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    qref = ray.put((qids, qunit))

    def block_topk(t: pa.Table) -> pa.Table:
        q_ids, q_unit = ray.get(qref)
        ids, vecs = _to_matrix(t, id_col, vec_col)
        cunit = _unit(vecs)
        cos = q_unit @ cunit.T  # Q x B
        out_q, out_n, out_s = [], [], []
        kk = min(k, cos.shape[1])
        for qi in range(len(q_ids)):
            row = cos[qi]
            mask = ids != q_ids[qi]
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            # per-block partial top-k (tie-break: higher score, lower id)
            order = cand[np.lexsort((ids[cand], -row[cand]))][:kk]
            out_q.extend([q_ids[qi]] * len(order))
            out_n.extend(ids[order].tolist())
            out_s.extend(row[order].tolist())
        return pa.table(
            {
                "qid": pa.array(out_q, type=pa.int64()),
                "nid": pa.array(out_n, type=pa.int64()),
                "score_raw": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = pa.concat_tables(
        ray.get(
            emb_ds.map_batches(block_topk, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    # driver-side merge of per-block partials: k rows per (query, block)
    qid = partials.column("qid").to_numpy(zero_copy_only=False)
    nid = partials.column("nid").to_numpy(zero_copy_only=False)
    sc = partials.column("score_raw").to_numpy(zero_copy_only=False)
    out_q, out_n, out_s = [], [], []
    for q in np.unique(qid):
        m = qid == q
        order = np.lexsort((nid[m], -sc[m]))[:k]
        out_q.extend([q] * len(order))
        out_n.extend(nid[m][order].tolist())
        out_s.extend(sql_round(sc[m][order]).tolist())
    return pa.table(
        {
            "qid": pa.array(out_q, type=pa.int64()),
            "nid": pa.array(out_n, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        }
    )


class IVFIndex:
    """Coarse-quantizer index built with distributed partial-sum Lloyd
    iterations (each iteration = one ``map_batches`` over the corpus
    emitting per-centroid (sum, count) partials + one tiny driver
    reduce — the classic pre-aggregated groupby)."""

    def __init__(self, nlist: int = 16, iters: int = 3, seed: int = 5):
        self.nlist = nlist
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, emb_ds, *, id_col: str = "vec_id", vec_col: str = "embedding"):
        emb_ds = emb_ds.materialize()
        # deterministic init: evenly-strided rows of the SEED_N lowest-id
        # vectors. Distributed bottom-N: each block emits its own N
        # lowest-id rows (tiny), the driver merges — no sort, no reliance
        # on block order, and exactly mirrored by the SQL oracle's
        # ROW_NUMBER() OVER (ORDER BY id) seed CTE.
        seed_n = max(self.nlist * SEED_FACTOR, SEED_MIN)

        def block_bottom(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            keep = np.argsort(ids, kind="stable")[:seed_n]
            return t.select([id_col, vec_col]).take(pa.array(np.sort(keep)))

        first = pa.concat_tables(
            ray.get(
                emb_ds.map_batches(block_bottom, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            ),
            promote_options="default",
        )
        sids, vecs = _to_matrix(first, id_col, vec_col)
        order = np.argsort(sids, kind="stable")[:seed_n]
        vecs = vecs[order]
        stride = max(1, len(vecs) // self.nlist)
        cents = vecs[:: stride][: self.nlist].copy()
        while len(cents) < self.nlist:  # tiny corpora
            cents = np.vstack([cents, vecs[: self.nlist - len(cents)]])

        for _ in range(self.iters):
            cref = ray.put(cents)

            def partials(t: pa.Table) -> pa.Table:
                c = ray.get(cref)
                _, v = _to_matrix(t, id_col, vec_col)
                assign = _sq_dists(v, c).argmin(axis=1)
                sums = np.zeros_like(c)
                np.add.at(sums, assign, v)
                cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
                return pa.table(
                    {
                        "cid": np.arange(len(c), dtype=np.int64),
                        "s": pa.array(sums.tolist(), type=pa.list_(pa.float64())),
                        "n": cnt,
                    }
                )

            rows = pa.concat_tables(
                ray.get(
                    emb_ds.map_batches(partials, batch_format="pyarrow")
                    .materialize()
                    .to_arrow_refs()
                ),
                promote_options="default",
            )
            cid = rows.column("cid").to_numpy(zero_copy_only=False)
            s = list_col_matrix(rows.column("s"))
            n = rows.column("n").to_numpy(zero_copy_only=False)
            sums = np.zeros_like(cents)
            cnts = np.zeros(self.nlist, dtype=np.int64)
            np.add.at(sums, cid, s)
            np.add.at(cnts, cid, n)
            nz = cnts > 0
            # round each updated centroid to 6 decimals (SQL ROUND rule):
            # the oracle computes the same means with a different summation
            # order; rounding collapses the last-ulp drift so assignments
            # stay bit-identical across iterations. Empty cells keep their
            # previous (seed-exact or already-rounded) centroid.
            cents[nz] = sql_round(sums[nz] / cnts[nz, None])
        self.centroids = cents
        return self

    def assign(self, emb_ds, *, id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
        cref = ray.put(self.centroids)

        def cell(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            ids, v = _to_matrix(t, id_col, vec_col)
            d = _sq_dists(v, c)
            return t.append_column("cell", pa.array(d.argmin(axis=1).astype(np.int64)))

        return emb_ds.map_batches(cell, batch_format="pyarrow")


@ray.remote
def _cell_bounds(t: pa.Table):
    """(min_cell, max_cell, nrows) of a cell-sorted block — the block
    metadata the probe stage prunes on."""
    if t.num_rows == 0 or t.num_columns == 0:
        return (0, -1, 0)
    c = t.column("cell").to_numpy(zero_copy_only=False)
    return (int(c[0]), int(c[-1]), len(c))


@ray.remote
def _probe_block(
    t: pa.Table,
    q_ids: np.ndarray,
    q_unit: np.ndarray,
    q_probes: np.ndarray,
    id_col: str,
    vec_col: str,
    k: int,
):
    """Per-block probe over a CELL-SORTED block: searchsorted slices out
    exactly the probed cells' rows (no full-block scan), queries probing
    the same cell share one matmul."""
    cells = t.column("cell").to_numpy(zero_copy_only=False)
    ids, vecs = _to_matrix(t, id_col, vec_col)
    out_q, out_n, out_s = [], [], []
    for c in np.unique(q_probes):
        s, e = np.searchsorted(cells, [c, c + 1])
        if s == e:
            continue
        qm = np.flatnonzero((q_probes == c).any(axis=1))
        sub_ids = ids[s:e]
        cos = q_unit[qm] @ _unit(vecs[s:e]).T  # |qm| x cell_rows
        for row, qi in zip(cos, qm):
            cand = np.flatnonzero(sub_ids != q_ids[qi])
            if len(cand) == 0:
                continue
            order = cand[np.lexsort((sub_ids[cand], -row[cand]))][: min(k, len(cand))]
            out_q.extend([q_ids[qi]] * len(order))
            out_n.extend(sub_ids[order].tolist())
            out_s.extend(row[order].tolist())
    return pa.table(
        {
            "qid": pa.array(out_q, type=pa.int64()),
            "nid": pa.array(out_n, type=pa.int64()),
            "score_raw": pa.array(out_s, type=pa.float64()),
        }
    )


def ann_topk_ivf(
    emb_ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    *,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: probe only the nprobe nearest cells per query.
    Same output schema/tie-break as the brute-force baseline.

    The assigned corpus is SORTED BY CELL (one shuffle, done once per
    index build): blocks are contiguous cell ranges, so the probe stage
    reads each block's (min_cell, max_cell) metadata and submits probe
    tasks ONLY for blocks intersecting some query's probed cells —
    nprobe prunes IO/scan, not just flops. Inside a block, searchsorted
    slices out exactly the probed cells' rows."""
    idx = IVFIndex(nlist=nlist).fit(emb_ds, id_col=id_col, vec_col=vec_col)
    assigned = (
        idx.assign(emb_ds, id_col=id_col, vec_col=vec_col).sort("cell").materialize()
    )
    refs = assigned.to_arrow_refs()
    metas = ray.get([_cell_bounds.remote(r) for r in refs])

    qvec = np.asarray(query_vecs, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)
    qunit = _unit(qvec)
    qd = _sq_dists(qvec, idx.centroids)
    # stable sort: distance ties break toward the lower cell id, the same
    # rule as the oracle's ROW_NUMBER() ... ORDER BY dist, cid
    probes = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]  # Q x nprobe

    futs = []
    for r, (lo, hi, nr) in zip(refs, metas):
        if nr == 0:
            continue
        qsel = np.flatnonzero(((probes >= lo) & (probes <= hi)).any(axis=1))
        if len(qsel) == 0:
            continue  # pruned: no query probes any cell in this block
        futs.append(
            _probe_block.remote(
                r, qids[qsel], qunit[qsel], probes[qsel], id_col, vec_col, k
            )
        )
    if futs:
        partials = pa.concat_tables(ray.get(futs), promote_options="default")
    else:
        partials = pa.table(
            {"qid": pa.array([], pa.int64()), "nid": pa.array([], pa.int64()),
             "score_raw": pa.array([], pa.float64())}
        )
    qid = partials.column("qid").to_numpy(zero_copy_only=False)
    nid = partials.column("nid").to_numpy(zero_copy_only=False)
    sc = partials.column("score_raw").to_numpy(zero_copy_only=False)
    out_q, out_n, out_s = [], [], []
    for q in np.unique(qid):
        m = qid == q
        order = np.lexsort((nid[m], -sc[m]))[:k]
        out_q.extend([q] * len(order))
        out_n.extend(nid[m][order].tolist())
        out_s.extend(sql_round(sc[m][order]).tolist())
    return pa.table(
        {
            "qid": pa.array(out_q, type=pa.int64()),
            "nid": pa.array(out_n, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        }
    )


def ann_range_search(
    emb_ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    *,
    tau: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine RANGE search (the radius-query twin of
    :func:`ann_topk_bruteforce`): every (query, vector) pair with
    cosine ≥ ``tau``, self-matches excluded. The query matrix is
    broadcast once via ``ray.put``; each block emits only its matching
    rows (one Q×B matmul, boolean select — the exchange is the result
    size, never Q×N). -> (qid, nid, score) sorted by (qid, nid)."""
    qunit = _unit(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    qref = ray.put((qids, qunit))
    out_schema = pa.schema(
        [("qid", pa.int64()), ("nid", pa.int64()), ("score", pa.float64())]
    )

    def block_range(t: pa.Table) -> pa.Table:
        q_ids, q_unit = ray.get(qref)
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids, vecs = _to_matrix(t, id_col, vec_col)
        cos = q_unit @ _unit(vecs).T  # Q x B
        hit = cos >= tau
        hit &= ids[None, :] != q_ids[:, None]
        qi, bi = np.nonzero(hit)
        return pa.table(
            {
                "qid": pa.array(q_ids[qi], pa.int64()),
                "nid": pa.array(ids[bi], pa.int64()),
                "score": pa.array(sql_round(cos[qi, bi]), pa.float64()),
            },
            schema=out_schema,
        )

    out = pa.concat_tables(
        ray.get(
            emb_ds.map_batches(block_range, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    from ..util import sorted_table

    return sorted_table(out, ["qid", "nid"]) if out.num_rows else out


_KNN_PARTIAL_SCHEMA = pa.schema(
    [("qid", pa.int64()), ("nid", pa.int64()), ("score_raw", pa.float64())]
)


def knn_graph(
    emb_ds,
    *,
    k: int = 5,
    broadcast_cutoff: int = 100_000,
    nlist: int = 64,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """All-vectors cosine kNN edge list (qid, nid, score) — every
    corpus vector is a query. Two regimes, same schema and tie-break
    (higher score first, then lower nid) as :func:`ann_topk_bruteforce`:

    - N <= broadcast_cutoff: EXACT — delegates to the brute-force
      baseline with the whole id/vector matrix as the query set (the
      documented small-corpus regime; O(N²) flops, gated).
    - N > broadcast_cutoff: the IVF scale path — fit the coarse
      quantizer, then ONE map_batches expands each vector into nprobe
      (cell, unit, is_member) rows (member row only in its assigned
      cell), ONE sort co-locates cells into group-complete blocks,
      per-cell chunked matmuls emit per-(query, cell) top-k partials,
      and a second narrow sort by qid merges partials to the final
      top-k. No corpus broadcast, no O(N²) regime: compute is
      Σ_cell |queries probing it| × |members|, exchange is N × nprobe
      rows. With nprobe = nlist the result is exhaustive and equals the
      brute-force baseline exactly (tested); smaller nprobe trades
      recall, measured in tests/test_datapipes.py."""
    from ..derive import key_grouped_block_map
    from ..util import sorted_table

    mat_tbl = emb_ds.select_columns([id_col, vec_col]).materialize()
    n_total = mat_tbl.count()
    if n_total == 0:
        return pa.schema(
            [("qid", pa.int64()), ("nid", pa.int64()), ("score", pa.float64())]
        ).empty_table()
    if n_total <= broadcast_cutoff:
        rows = pa.concat_tables(
            ray.get(mat_tbl.to_arrow_refs()), promote_options="default"
        )
        ids, vecs = _to_matrix(rows, id_col, vec_col)
        return ann_topk_bruteforce(
            mat_tbl, ids, vecs, k=k, id_col=id_col, vec_col=vec_col
        )

    nlist = min(nlist, n_total)
    nprobe = min(nprobe, nlist)
    idx = IVFIndex(nlist=nlist).fit(mat_tbl, id_col=id_col, vec_col=vec_col)
    cref = ray.put(idx.centroids)

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("cell", pa.int64()), ("vid", pa.int64()),
                 ("member", pa.bool_()), ("unit", pa.list_(pa.float64()))]
            ).empty_table()
        cents = ray.get(cref)
        ids, vecs = _to_matrix(t, id_col, vec_col)
        unit = _unit(vecs)
        d = _sq_dists(vecs, cents)
        # stable: ties toward the lower cell id, same rule as assign()
        probes = np.argsort(d, axis=1, kind="stable")[:, :nprobe]  # B x nprobe
        b = len(ids)
        cells = probes.T.reshape(-1)  # probe-major: first b rows = assigned
        vid = np.tile(ids.astype(np.int64), nprobe)
        member = np.zeros(b * nprobe, dtype=bool)
        member[:b] = True  # probes[:, 0] == argmin == assigned cell
        flat_unit = np.tile(unit, (nprobe, 1))
        return pa.table(
            {
                "cell": cells.astype(np.int64),
                "vid": vid,
                "member": member,
                "unit": pa.array(flat_unit.tolist(), type=pa.list_(pa.float64())),
            }
        )

    expanded = mat_tbl.map_batches(expand, batch_format="pyarrow")

    def cell_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _KNN_PARTIAL_SCHEMA.empty_table()
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        vid = t.column("vid").to_numpy(zero_copy_only=False)
        member = t.column("member").to_numpy(zero_copy_only=False)
        unit = list_col_matrix(t.column("unit"))
        order = np.argsort(cell, kind="stable")
        cell, vid, member, unit = cell[order], vid[order], member[order], unit[order]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        out_q, out_n, out_s = [], [], []
        for s, e in zip(starts, ends):
            mm = member[s:e]
            if not mm.any():
                continue
            m_ids, m_unit = vid[s:e][mm], unit[s:e][mm]
            q_ids, q_unit = vid[s:e], unit[s:e]  # every row queries
            # chunk queries so the cos temp stays bounded in hot cells
            chunk = max(1, int((1 << 25) // max(len(m_ids), 1)))
            for c0 in range(0, len(q_ids), chunk):
                c1 = min(c0 + chunk, len(q_ids))
                cos = q_unit[c0:c1] @ m_unit.T
                for row, qv in zip(cos, q_ids[c0:c1]):
                    cand = np.flatnonzero(m_ids != qv)
                    if len(cand) == 0:
                        continue
                    top = cand[np.lexsort((m_ids[cand], -row[cand]))][
                        : min(k, len(cand))
                    ]
                    out_q.extend([qv] * len(top))
                    out_n.extend(m_ids[top].tolist())
                    out_s.extend(row[top].tolist())
        if not out_q:
            return _KNN_PARTIAL_SCHEMA.empty_table()
        return pa.table(
            {
                "qid": pa.array(out_q, type=pa.int64()),
                "nid": pa.array(out_n, type=pa.int64()),
                "score_raw": pa.array(out_s, type=pa.float64()),
            },
            schema=_KNN_PARTIAL_SCHEMA,
        )

    partials = key_grouped_block_map(expanded.sort("cell"), ["cell"], cell_topk)

    def merge_topk(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("qid", pa.int64()), ("nid", pa.int64()), ("score", pa.float64())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        qid = t.column("qid").to_numpy(zero_copy_only=False)
        nid = t.column("nid").to_numpy(zero_copy_only=False)
        sc = t.column("score_raw").to_numpy(zero_copy_only=False)
        # members live in exactly one cell, so (qid, nid) pairs are
        # unique across partials — merge is a pure per-qid top-k
        order = np.lexsort((nid, -sc, qid))
        qid, nid, sc = qid[order], nid[order], sc[order]
        starts = np.flatnonzero(np.r_[True, qid[1:] != qid[:-1]])
        ends = np.r_[starts[1:], len(qid)]
        keep = np.concatenate(
            [np.arange(s, min(s + k, e)) for s, e in zip(starts, ends)]
        )
        return pa.table(
            {
                "qid": pa.array(qid[keep], pa.int64()),
                "nid": pa.array(nid[keep], pa.int64()),
                "score": pa.array(sql_round(sc[keep]), pa.float64()),
            }
        )

    merged = key_grouped_block_map(partials.sort("qid"), ["qid"], merge_topk)
    out = pa.concat_tables(
        ray.get(merged.materialize().to_arrow_refs()), promote_options="default"
    )
    return sorted_table(out, ["qid", "nid"]) if out.num_rows else out
