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
