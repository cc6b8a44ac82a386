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


def _register_partial(values) -> np.ndarray:
    """Dense m-length register array for one batch of string values."""
    regs = np.zeros(HLL_M, dtype=np.int64)
    if len(values) == 0:
        return regs
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
    rho = lz + 1
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
