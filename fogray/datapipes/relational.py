"""Generic relational operators for corpus pipelines: grouped top-k and
deterministic hash sampling.

The reference has no relational surface at all (SURVEY.md section 2.6:
its only "top-k" is printing the first 100 attribute slots,
application/pagerank.hpp:123-124, and it has no sampling); both ops are
rebuild-defined, built on the repo's two scale primitives:

- **top-k per group**: ONE sort by the group key, then group-complete
  blocks (fogray.derive.key_grouped_block_map) rank within each group
  with a vectorized lexsort and keep ``rank <= k`` — no window-function
  shuffle beyond the sort, and block output size is bounded by
  k x groups-per-block.
- **hash sample**: keep a row iff a hex prefix of ``md5(key)`` falls
  under a threshold — embarrassingly parallel ``map_batches`` filter,
  no shuffle, deterministic across runs/engines (the property random
  sampling lacks), and stable under repartitioning because the decision
  depends only on the key. This is the standard split-by-hash recipe
  for carving held-out sets out of a 100 TB corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..derive import key_grouped_block_map


def topk_per_group(
    ds,
    *,
    group_col: str,
    order_col: str,
    id_col: str,
    k: int,
) -> rd.Dataset:
    """-> (group_col, id_col, order_col, rk) with rk = 1..k ranking
    ``order_col`` DESC within each group, ties broken by ``id_col`` ASC
    (the ROW_NUMBER() OVER (PARTITION BY g ORDER BY o DESC, id) rule)."""

    proj = ds.select_columns([group_col, id_col, order_col])

    def block_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_col: pa.array([], t.schema.field(group_col).type),
                id_col: pa.array([], t.schema.field(id_col).type),
                order_col: pa.array([], t.schema.field(order_col).type),
                "rk": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        i = t.column(id_col).to_numpy(zero_copy_only=False)
        o = t.column(order_col).to_numpy(zero_copy_only=False)
        # lexsort: group ASC, order DESC, id ASC. DESC goes through a
        # dense ascending rank (np.unique inverse) so it never negates
        # the raw column — negation silently mis-sorts unsigned ints
        # (wraparound) and overflows on INT64_MIN; ranks are < block
        # rows, always safely negatable (and any orderable dtype works).
        _, o_rank = np.unique(o, return_inverse=True)
        order = np.lexsort((i, -o_rank.astype(np.int64), g))
        g, i, o = g[order], i[order], o[order]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        rank = np.arange(len(g)) - np.repeat(starts, np.diff(np.r_[starts, len(g)]))
        mask = rank < k
        return pa.table(
            {
                group_col: pa.array(g[mask]),
                id_col: pa.array(i[mask]),
                order_col: pa.array(o[mask]),
                "rk": (rank[mask] + 1).astype(np.int64),
            }
        )

    return key_grouped_block_map(proj.sort([group_col]), [group_col], block_topk)


def md5_prefix_batch(keys: np.ndarray, nhex: int = 2) -> np.ndarray:
    """First ``nhex`` hex chars of md5(str(key)) per element — the same
    bytes DuckDB's ``substr(md5(CAST(key AS VARCHAR)), 1, nhex)``
    produces, so the sample sets match exactly."""
    return np.array(
        [hashlib.md5(str(x).encode()).hexdigest()[:nhex] for x in keys.tolist()]
    )


def hash_sample(ds, *, key_col: str, max_prefix: str) -> rd.Dataset:
    """Keep rows whose 2-hex-char md5 prefix of ``key_col`` is
    lexically <= ``max_prefix`` — e.g. ``max_prefix="28"`` keeps
    (0x28+1)/256 ~= 16% deterministically."""
    nhex = len(max_prefix)

    def block_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        pref = md5_prefix_batch(keys, nhex)
        return t.filter(pa.array(pref <= max_prefix))

    return ds.map_batches(block_filter, batch_format="pyarrow")
