"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in fogray) calls ray.init()/ray.shutdown().

- ``entry()``: flagship pipeline on sf0.001 — derive the part
  co-occurrence graph from ``lineitem`` and run FOG-semantics PageRank
  on the distributed engine; returns the per-vertex rank table.
- ``queries()`` / ``oracle_sql()``: operator conformance per SURVEY.md
  section 2 — DuckDB-checkable entries come from fogray.queries; the
  iterative/ML-ish pipelines that SQL can't express are registered as
  rows-only entries (no oracle_sql key).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from fogray import queries as q

    return q.q_pagerank("/root/testdata/sf0.001").to_pandas()


def _repo_graph_queries() -> dict[str, Callable[[str], Any]]:
    """Rows-only pipelines over the deterministic synthetic repo table
    (the input_hint-shaped table; no SQL oracle — the FOG-semantics
    correctness gate for these lives in tests/ vs fogray.oracle)."""

    def _derived(sf_dir: str):
        import ray.data as rd

        from fogray import derive, tables

        t = tables.make_repo_table(400, 16, seed=42)
        return derive.derive_edges(rd.from_arrow(t))

    def repo_edges(sf_dir: str):
        return _derived(sf_dir)["edges"].to_pandas().sort_values(["src", "dst"])

    def repo_pagerank(sf_dir: str):
        import numpy as np

        from fogray import algorithms as alg
        from fogray.config import EngineConfig
        from fogray.engine import GraphEngine

        out = _derived(sf_dir)
        e = out["edges"].to_pandas()
        eng = GraphEngine(
            out["num_vertices"],
            arrays=(e["src"].to_numpy(), e["dst"].to_numpy(), e["weight"].to_numpy()),
            cfg=EngineConfig(num_partitions=4),
        )
        try:
            res = alg.pagerank(eng, niters=10)
        finally:
            eng.shutdown()
        import pandas as pd

        return pd.DataFrame(
            {"vid": np.arange(out["num_vertices"]), "rank": np.round(res.state["rank"], 6)}
        )

    def repo_pagerank_dist(sf_dir: str):
        """Same pipeline on the range-partitioned engine
        (fogray.dist_engine) — vertex state sharded across actors,
        actor-to-actor message exchange; exact-parity gate lives in
        tests/test_dist_engine.py."""
        import numpy as np
        import pandas as pd

        from fogray import algorithms as alg
        from fogray.config import EngineConfig
        from fogray.dist_engine import DistGraphEngine

        out = _derived(sf_dir)
        e = out["edges"].to_pandas()
        eng = DistGraphEngine(
            out["num_vertices"],
            arrays=(e["src"].to_numpy(), e["dst"].to_numpy(), e["weight"].to_numpy()),
            cfg=EngineConfig(num_partitions=4),
        )
        try:
            res = alg.pagerank(eng, niters=10)
        finally:
            eng.shutdown()
        return pd.DataFrame(
            {"vid": np.arange(out["num_vertices"]), "rank": np.round(res.state["rank"], 6)}
        )

    return {
        "repo_derive_edges": repo_edges,
        "repo_pagerank": repo_pagerank,
        "repo_pagerank_dist": repo_pagerank_dist,
    }


def queries() -> dict[str, Callable[[str], Any]]:
    from fogray import queries as q

    out: dict[str, Callable[[str], Any]] = dict(q.QUERIES)
    out.update(_repo_graph_queries())
    try:
        from fogray.datapipes import queries as dq

        out.update(dq.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from fogray import queries as q

    out = dict(q.ORACLE_SQL)
    try:
        from fogray.datapipes import queries as dq

        out.update(dq.ORACLE_SQL)
    except ImportError:
        pass
    return out
