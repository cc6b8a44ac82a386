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
