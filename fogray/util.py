"""Small shared numeric/Dataset helpers."""

from __future__ import annotations

import numpy as np


def sql_round(x, decimals: int = 6) -> np.ndarray:
    """Round half AWAY from zero — the SQL ROUND() rule DuckDB uses.
    numpy's np.round is banker's (half-to-even), which disagrees with
    the oracle exactly on .xxxxx5 boundaries."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def read_parquet_clean(path, *, columns=None, **kw):
    """``ray.data.read_parquet`` with schema metadata stripped at the
    source. The driver's parquet carries a ``pandas`` metadata blob,
    and a pa.schema with metadata is UNHASHABLE — the read operator and
    every downstream sort/groupby reduce then log ``Failed to hash the
    schemas (for deduplication)`` and skip Ray Data's cheap same-schema
    fast path. An explicit metadata-free ``schema=`` (projected to
    ``columns`` when given — read_parquet rejects a full schema with a
    projection) cleans the blocks inside the read task itself; the
    map_batches strip is only the fallback when the driver-side schema
    probe fails (e.g. an empty directory)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    try:
        f = path
        if os.path.isdir(path):
            import glob

            hits = sorted(
                glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            )
            f = hits[0]
        full = pq.read_schema(f)
        names = columns if columns is not None else full.names
        schema = pa.schema([full.field(c).remove_metadata() for c in names])
        return rd.read_parquet(path, schema=schema, columns=columns, **kw)
    except Exception:
        return rd.read_parquet(path, columns=columns, **kw).map_batches(
            lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
        )


def sorted_table(t, cols: list[str]):
    """Arrow table sorted by ``cols`` via numpy lexsort (pandas
    ``sort_values`` measured ~10x slower on multi-million-row frames)."""
    import pyarrow as pa

    if t.num_rows == 0:
        return t
    keys = [t.column(c).to_numpy(zero_copy_only=False) for c in cols]
    order = np.lexsort(tuple(reversed(keys)))
    return t.take(pa.array(order))


def list_col_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow ``list<T>`` column (equal-length lists) -> (rows, dim)
    numpy matrix via flatten + reshape — no per-row Python lists (the
    ``to_pylist`` path this replaces materializes millions of Python
    floats). Raises if the lists are ragged."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype, copy=False)
        return flat.reshape(n, dim)
    offsets = np.asarray(col.offsets)
    widths = np.diff(offsets)
    dim = int(widths[0])
    if not (widths == dim).all():
        raise ValueError("ragged list column; expected fixed-length vectors")
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    # col.flatten() already accounts for any slicing offset
    return flat.reshape(n, dim)


def from_arrow_chunked(table, num_blocks: int = 32):
    """ray.data.from_arrow with the table pre-split into blocks.

    Feeding one giant driver-side table into a groupby/sort is
    pathological: Ray's sort shuffle processes the single input block
    serially (measured 305s vs 17.8s for a 2.4M-row groupby at 32
    CPUs). Slicing is zero-copy."""
    import ray.data as rd

    if table.num_rows == 0:
        return rd.from_arrow(table)
    chunk = max(1, (table.num_rows + num_blocks - 1) // num_blocks)
    return rd.from_arrow(
        [table.slice(i * chunk, chunk) for i in range(num_blocks) if i * chunk < table.num_rows]
    )


def collect_tables(ds, empty_schema=None):
    """Materialize a Dataset and concat its Arrow blocks on the driver,
    dropping the zero-COLUMN blocks Ray emits for empty inputs (they
    break pa.concat_tables). Only for bounded results — partials,
    dimension tables, O(V) state — never the full data. Returns
    ``empty_schema.empty_table()`` (or an empty no-column table) when
    nothing survives."""
    import pyarrow as pa
    import ray

    tabs = [
        t
        for t in ray.get(ds.materialize().to_arrow_refs())
        if t.num_rows > 0 and t.num_columns > 0
    ]
    if tabs:
        return pa.concat_tables(tabs)
    return empty_schema.empty_table() if empty_schema is not None else pa.table({})
