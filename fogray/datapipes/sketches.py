"""Mergeable cardinality sketches over a Dataset column.

:func:`hll_distinct` is a deterministic HyperLogLog (Flajolet et al.
2007, public algorithm): every value hashes through md5 (the same
DuckDB-computable token hash the dedup sketches use, dedup._md5_u64),
the first digest byte picks one of m=256 registers, and the register
keeps the max over (leading zero bits of the remaining 120-bit tail
+ 1). Registers are order-insensitive maxima, so each block emits one
tiny 256-row partial inside ``map_batches`` (pre-aggregation: the
"shuffle" is |blocks| x 256 rows regardless of input size) and the
driver folds them with one elementwise max — the canonical mergeable-
sketch dataflow. The estimate (bias-corrected harmonic mean with the
small-range linear-counting correction) is computed identically by the
SQL oracle, so the result is exact-match checkable despite being an
approximation of COUNT(DISTINCT).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

from ..util import sql_round

HLL_M = 256  # registers; bucket = first md5 digest byte

#: leading-zero-bit count per byte value: 8 - bit_length(v), 8 for v=0
_CLZ8 = np.array([8 - int(v).bit_length() if v else 8 for v in range(256)],
                 dtype=np.int64)


def _bucket_rho(values) -> tuple[np.ndarray, np.ndarray]:
    """Per-value (bucket, rho) arrays: bucket = first md5 digest byte,
    rho = leading-zero bits of the 120-bit tail + 1."""
    if len(values) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    md5 = hashlib.md5
    buf = b"".join(md5(v.encode()).digest() for v in values)
    dig = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)
    bucket = dig[:, 0].astype(np.int64)
    tail = dig[:, 1:]  # 15 bytes = 120 bits
    nz = tail != 0
    has = nz.any(axis=1)
    first = np.argmax(nz, axis=1)
    lz = np.where(
        has,
        first * 8 + _CLZ8[tail[np.arange(len(tail)), first]],
        120,
    )
    return bucket, lz + 1


def _register_partial(values) -> np.ndarray:
    """Dense m-length register array for one batch of string values."""
    regs = np.zeros(HLL_M, dtype=np.int64)
    bucket, rho = _bucket_rho(values)
    np.maximum.at(regs, bucket, rho)
    return regs


def _hll_batch(t: pa.Table, col: str) -> pa.Table:
    vals = t.column(col).cast(pa.string()).to_pylist() if t.num_rows else []
    regs = _register_partial([v for v in vals if v is not None])
    return pa.table(
        {
            "bucket": pa.array(np.arange(HLL_M, dtype=np.int64)),
            "rho_max": pa.array(regs),
            "n_rows": pa.array(
                np.r_[np.int64(t.num_rows), np.zeros(HLL_M - 1, dtype=np.int64)]
            ),
        }
    )


def hll_estimate(regs: np.ndarray) -> float:
    """The HLL estimator both sides compute from identical registers."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))
    return float(raw)


def hll_distinct(ds, col: str) -> pa.Table:
    """-> one row (est_distinct DOUBLE ROUND 6, n_rows BIGINT)."""
    parts = pa.concat_tables(
        ray.get(
            ds.map_batches(lambda t: _hll_batch(t, col), batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    bucket = parts.column("bucket").to_numpy(zero_copy_only=False)
    rho = parts.column("rho_max").to_numpy(zero_copy_only=False)
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, bucket, rho)
    n_rows = int(parts.column("n_rows").to_numpy(zero_copy_only=False).sum())
    return pa.table(
        {
            "est_distinct": pa.array(sql_round(np.array([hll_estimate(regs)]))),
            "n_rows": pa.array([n_rows], type=pa.int64()),
        }
    )


def _hll_group_batch(t: pa.Table, group_col: str, col: str) -> pa.Table:
    """Sparse per-(group, bucket) register partial for one block, plus
    one row-count row per group (bucket = -1, rho_max = row count).
    Partial size <= groups_in_block x (HLL_M + 1) regardless of rows."""
    import pandas as pd

    empty = pa.table(
        {
            "grp": pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
            "rho_max": pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    grp = t.column(group_col).cast(pa.string()).to_pylist()
    vals = t.column(col).cast(pa.string()).to_pylist()
    keep = [i for i, v in enumerate(vals) if v is not None]
    if not keep:
        return empty
    # use_na_sentinel=False: a NULL group value must become its OWN
    # group code (the oracle's GROUP BY keeps NULL as a group); the
    # default -1 sentinel would crash the bincount below
    gcodes, uniq = pd.factorize(
        np.asarray(grp, dtype=object)[keep], use_na_sentinel=False
    )
    bucket, rho = _bucket_rho([vals[i] for i in keep])
    dense = np.zeros(len(uniq) * HLL_M, dtype=np.int64)
    np.maximum.at(dense, gcodes * HLL_M + bucket, rho)
    nz = np.nonzero(dense)[0]
    counts = np.bincount(gcodes, minlength=len(uniq)).astype(np.int64)
    out_g = np.r_[nz // HLL_M, np.arange(len(uniq))]
    return pa.table(
        {
            "grp": pa.array(np.asarray(uniq, dtype=object)[out_g], pa.string()),
            "bucket": pa.array(np.r_[nz % HLL_M, np.full(len(uniq), -1)]),
            "rho_max": pa.array(np.r_[dense[nz], counts]),
        }
    )


def hll_distinct_by(ds, group_col: str, col: str) -> pa.Table:
    """Per-group HyperLogLog distinct — the 100TB-safe replacement for
    ``COUNT(DISTINCT col) GROUP BY group_col``. Same mergeable-sketch
    dataflow as :func:`hll_distinct`, with SPARSE per-(group, bucket)
    partials (only touched registers leave a block), so the exchange is
    |blocks| x groups x <=257 rows no matter how many input rows there
    are; the driver folds with one bincount-max per key and applies the
    identical estimator per group.

    -> (group_col STRING, est_distinct DOUBLE ROUND 6, n_rows BIGINT)
    sorted by group."""
    import pandas as pd

    parts = pa.concat_tables(
        ray.get(
            ds.map_batches(
                lambda t: _hll_group_batch(t, group_col, col),
                batch_format="pyarrow",
            )
            .materialize()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    grp = parts.column("grp").to_numpy(zero_copy_only=False)
    bucket = parts.column("bucket").to_numpy(zero_copy_only=False)
    rho = parts.column("rho_max").to_numpy(zero_copy_only=False)
    gcodes, uniq = pd.factorize(grp)
    order = np.argsort(uniq.astype(str), kind="stable")
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq))
    gcodes = rank[gcodes]
    uniq = np.asarray(uniq, dtype=object)[order]
    is_count = bucket < 0
    n_rows = np.bincount(
        gcodes[is_count], weights=rho[is_count].astype(np.float64),
        minlength=len(uniq),
    ).astype(np.int64)
    regs = np.zeros(len(uniq) * HLL_M, dtype=np.int64)
    np.maximum.at(regs, gcodes[~is_count] * HLL_M + bucket[~is_count], rho[~is_count])
    regs = regs.reshape(len(uniq), HLL_M)
    est = np.array([hll_estimate(regs[g]) for g in range(len(uniq))])
    return pa.table(
        {
            group_col: pa.array(list(uniq), pa.string()),
            "est_distinct": pa.array(sql_round(est)),
            "n_rows": pa.array(n_rows, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005, public algorithm)
# ---------------------------------------------------------------------------

CMS_D, CMS_W = 4, 256  # depth x width; hash j = md5 digest byte j


def _cms_cells(tokens, counts: np.ndarray) -> np.ndarray:
    """(CMS_D, CMS_W) counter partial for distinct tokens with counts."""
    cells = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(tokens) == 0:
        return cells
    md5 = hashlib.md5
    buf = b"".join(md5(w.encode()).digest()[:CMS_D] for w in tokens)
    dig = np.frombuffer(buf, dtype=np.uint8).reshape(-1, CMS_D)
    for j in range(CMS_D):
        np.add.at(cells[j], dig[:, j].astype(np.int64), counts)
    return cells


def _cms_batch(t: pa.Table, text_col: str) -> pa.Table:
    from .text import _token_count_batch

    p = _token_count_batch(t, text_col)
    cells = _cms_cells(
        p.column("token").to_pylist(),
        p.column("n_occ").to_numpy(zero_copy_only=False),
    )
    d = np.repeat(np.arange(CMS_D, dtype=np.int64), CMS_W)
    b = np.tile(np.arange(CMS_W, dtype=np.int64), CMS_D)
    return pa.table({"j": d, "bucket": b, "cell": cells.ravel()})


def cms_token_estimates(ds, k: int = 20, text_col: str = "text") -> pa.Table:
    """Count-min-sketch frequency estimates for the exact top-k tokens:
    -> (token, n_occ, est_count) with est_count >= n_occ (the CMS
    one-sided error). Dataflow is the same mergeable-sketch shape as
    HLL: each block folds its token counts into a tiny CMS_D x CMS_W
    counter partial inside ``map_batches`` (counters are
    order-insensitive SUMs, so the "shuffle" is |blocks| x 1024 rows
    regardless of corpus size) and the driver adds them; the probe set
    comes from the exact heavy-hitter pipeline (:func:`..text.
    top_tokens`). Deterministic md5-byte hashing makes the estimate —
    not just the exact counts — reproducible by the SQL oracle."""
    from .text import top_tokens

    parts = pa.concat_tables(
        ray.get(
            ds.map_batches(lambda t: _cms_batch(t, text_col), batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    cells = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    flat_idx = (
        parts.column("j").to_numpy(zero_copy_only=False) * CMS_W
        + parts.column("bucket").to_numpy(zero_copy_only=False)
    )
    np.add.at(cells, flat_idx, parts.column("cell").to_numpy(zero_copy_only=False))
    cells = cells.reshape(CMS_D, CMS_W)

    top = top_tokens(ds, k=k, text_col=text_col)
    toks = top.column("token").to_pylist()
    if toks:
        buf = b"".join(hashlib.md5(w.encode()).digest()[:CMS_D] for w in toks)
        dig = np.frombuffer(buf, dtype=np.uint8).reshape(-1, CMS_D).astype(np.int64)
        est = np.min(
            np.stack([cells[j, dig[:, j]] for j in range(CMS_D)]), axis=0
        )
    else:
        est = np.empty(0, dtype=np.int64)
    out = pa.table(
        {
            "token": top.column("token"),
            "n_occ": top.column("n_occ"),
            "est_count": pa.array(est, type=pa.int64()),
        }
    )
    import pandas as pd

    df = out.to_pandas().sort_values("token").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002, public algorithm)
# ---------------------------------------------------------------------------

KMV_K = 64  # sketch size: k smallest distinct hashes per group


def _kmv_hash(values) -> np.ndarray:
    """uint64 per value = first 8 md5 digest bytes, big-endian — exactly
    the oracle's ``CAST(('0x' || substr(md5(v), 1, 16)) AS UBIGINT)``."""
    buf = b"".join(hashlib.md5(v.encode()).digest()[:8] for v in values)
    return np.frombuffer(buf, dtype=">u8").astype(np.uint64)


def _bottom_k(gcodes: np.ndarray, hv: np.ndarray, k: int):
    """(gcodes, hv) -> per-group k smallest DISTINCT hashes (dedup +
    sort + rank-within-group, all vectorized)."""
    order = np.lexsort((hv, gcodes))
    g, h = gcodes[order], hv[order]
    first = np.r_[True, (g[1:] != g[:-1]) | (h[1:] != h[:-1])]
    g, h = g[first], h[first]
    starts = np.r_[0, np.flatnonzero(g[1:] != g[:-1]) + 1]
    sizes = np.diff(np.r_[starts, len(g)])
    rank = np.arange(len(g)) - np.repeat(starts, sizes)
    keep = rank < k
    return g[keep], h[keep]


def _kmv_group_batch(t: pa.Table, group_col: str, col: str, k: int) -> pa.Table:
    """One block's partial: per group, the k smallest distinct value
    hashes (cnt = 0) plus one exact row-count row (cnt = rows, hv = 0).
    Partial size <= groups_in_block x (k + 1) regardless of rows."""
    import pandas as pd

    empty = pa.table(
        {
            "grp": pa.array([], pa.string()),
            "hv": pa.array([], pa.uint64()),
            "cnt": pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    grp = t.column(group_col).cast(pa.string()).to_pylist()
    vals = t.column(col).cast(pa.string()).to_pylist()
    keep = [i for i, v in enumerate(vals) if v is not None]
    if not keep:
        return empty
    # use_na_sentinel=False: a NULL group value must become its OWN
    # group code (the oracle's GROUP BY keeps NULL as a group); the
    # default -1 sentinel would crash the bincount below
    gcodes, uniq = pd.factorize(
        np.asarray(grp, dtype=object)[keep], use_na_sentinel=False
    )
    hv = _kmv_hash([vals[i] for i in keep])
    bg, bh = _bottom_k(gcodes, hv, k)
    counts = np.bincount(gcodes, minlength=len(uniq)).astype(np.int64)
    out_g = np.r_[bg, np.arange(len(uniq))]
    return pa.table(
        {
            "grp": pa.array(np.asarray(uniq, dtype=object)[out_g], pa.string()),
            "hv": pa.array(np.r_[bh, np.zeros(len(uniq), np.uint64)], pa.uint64()),
            "cnt": pa.array(
                np.r_[np.zeros(len(bg), np.int64), counts], pa.int64()
            ),
        }
    )


def kmv_distinct_by(ds, group_col: str, col: str, k: int = KMV_K) -> pa.Table:
    """Per-group bottom-k (KMV) distinct estimate — the second
    mergeable-cardinality sketch next to :func:`hll_distinct_by`, with
    a different accuracy/size trade (exact below k distincts, relative
    error ~1/sqrt(k-2) above). Each block ships at most groups x (k+1)
    partial rows; the driver merges bottom-k sets (dedup + re-rank) and
    estimates (k-1) / (h_k / 2^64) from the kth smallest distinct hash,
    or the exact distinct count when fewer than k survive — the exact
    expression the DuckDB oracle evaluates, so an approximation is
    still exact-match checkable.

    -> (group_col STRING, est_distinct DOUBLE ROUND 6, n_rows BIGINT)
    sorted by group."""
    import pandas as pd

    parts = pa.concat_tables(
        ray.get(
            ds.map_batches(
                lambda t: _kmv_group_batch(t, group_col, col, k),
                batch_format="pyarrow",
            )
            .materialize()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    grp = parts.column("grp").to_numpy(zero_copy_only=False)
    hv = parts.column("hv").to_numpy(zero_copy_only=False).astype(np.uint64)
    cnt = parts.column("cnt").to_numpy(zero_copy_only=False)
    gcodes, uniq = pd.factorize(grp)
    order = np.argsort(uniq.astype(str), kind="stable")
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq))
    gcodes = rank[gcodes]
    uniq = np.asarray(uniq, dtype=object)[order]
    is_count = cnt > 0
    n_rows = np.bincount(
        gcodes[is_count], weights=cnt[is_count].astype(np.float64),
        minlength=len(uniq),
    ).astype(np.int64)
    bg, bh = _bottom_k(gcodes[~is_count], hv[~is_count], k)
    m = np.bincount(bg, minlength=len(uniq))
    est = m.astype(np.float64)  # exact when fewer than k distinct hashes
    full = np.flatnonzero(m >= k)
    if len(full):
        # kth smallest (1-indexed) per full group: bh is sorted within
        # each group, and groups are contiguous in bg
        starts = np.searchsorted(bg, full)
        hk = bh[starts + (k - 1)]
        est[full] = (k - 1.0) / (hk.astype(np.float64) / 18446744073709551616.0)
    return pa.table(
        {
            group_col: pa.array(list(uniq), pa.string()),
            "est_distinct": pa.array(sql_round(est)),
            "n_rows": pa.array(n_rows, type=pa.int64()),
        }
    )


def hll_set_ops(
    ds,
    *,
    col: str,
    filter_col: str,
    a_value: str,
    b_value: str,
    value_col: str | None = None,
    min_value: float = 0.0,
) -> pa.Table:
    """HLL set algebra over one pass: cardinality estimates of
    {col : filter=a}, {col : filter=b}, their union (registers over
    rows matching either), and the inclusion-exclusion intersection
    est_a + est_b - est_union — the mergeable-sketch answer to "how
    many users did BOTH" that never shuffles raw values. Each block
    emits THREE 256-register partials (side-tagged), the driver folds
    elementwise maxima; all four estimates are computed identically by
    the SQL oracle from the rounded components, so the approximation is
    exact-match checkable.

    ``value_col``/``min_value`` add a numeric floor to both sides (e.g.
    "users with a HIGH-VALUE click" vs "... purchase") — without it a
    dense corpus makes A = B = union and the check degenerates.

    -> one row (est_a, est_b, est_union, est_intersect), all DOUBLE."""
    sides = {0: a_value, 1: b_value}
    cols = [col, filter_col] + ([value_col] if value_col else [])
    ds = ds.select_columns(cols)

    def batch(t: pa.Table) -> pa.Table:
        f = t.column(filter_col).cast(pa.string()).to_pylist() if t.num_rows else []
        v = t.column(col).cast(pa.string()).to_pylist() if t.num_rows else []
        if value_col is not None and t.num_rows:
            ok = (
                t.column(value_col).to_numpy(zero_copy_only=False) >= min_value
            ).tolist()
        else:
            ok = [True] * len(v)
        regs = []
        tags = []
        for tag, want in sides.items():
            vals = [x for x, fv, o in zip(v, f, ok) if o and fv == want and x is not None]
            regs.append(_register_partial(vals))
            tags.append(np.full(HLL_M, tag, dtype=np.int64))
        vals = [
            x
            for x, fv, o in zip(v, f, ok)
            if o and fv in (a_value, b_value) and x is not None
        ]
        regs.append(_register_partial(vals))
        tags.append(np.full(HLL_M, 2, dtype=np.int64))
        return pa.table(
            {
                "tag": pa.array(np.concatenate(tags)),
                "bucket": pa.array(np.tile(np.arange(HLL_M, dtype=np.int64), 3)),
                "rho_max": pa.array(np.concatenate(regs)),
            }
        )

    from ..util import collect_tables

    parts = collect_tables(ds.map_batches(batch, batch_format="pyarrow"))
    tag = parts.column("tag").to_numpy(zero_copy_only=False)
    bucket = parts.column("bucket").to_numpy(zero_copy_only=False)
    rho = parts.column("rho_max").to_numpy(zero_copy_only=False)
    ests = []
    for want in (0, 1, 2):
        regs = np.zeros(HLL_M, dtype=np.int64)
        m = tag == want
        np.maximum.at(regs, bucket[m], rho[m])
        ests.append(float(sql_round(np.array([hll_estimate(regs)]))[0]))
    inter = float(sql_round(np.array([ests[0] + ests[1] - ests[2]]))[0])
    return pa.table(
        {
            "est_a": pa.array([ests[0]], pa.float64()),
            "est_b": pa.array([ests[1]], pa.float64()),
            "est_union": pa.array([ests[2]], pa.float64()),
            "est_intersect": pa.array([inter], pa.float64()),
        }
    )
