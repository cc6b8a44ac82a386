"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in fogray) calls ray.init()/ray.shutdown().

- ``entry()``: flagship pipeline on sf0.001 — derive the part
  co-occurrence graph from ``lineitem`` and run FOG-semantics PageRank
  on the distributed engine; returns the per-vertex rank table.
- ``queries()`` / ``oracle_sql()``: operator conformance per SURVEY.md
  section 2 — graph pipelines from fogray.queries, training-data
  pipelines from fogray.datapipes.queries. ALL 167 queries are
  SQL-oracle-gated: iterative pipelines mirror via recursive or
  unrolled MATERIALIZED CTEs, sketches via md5-based SQL-reproducible
  hashing and estimator-exact integer mirrors; the contraction-style
  iteratives run their superstep loop INSIDE DuckDB — coloring /
  matching as plain recursive CTEs whose working table carries the full
  per-round state (multiple self-references), msf as unrolled Borůvka
  rounds with recursive pointer-chase label resolution.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from fogray import queries as q

    return q.q_pagerank("/root/testdata/sf0.001").to_pandas()


# the input_hint-shaped synthetic repo table used by every repo_* query
# AND re-materialized to parquet for the DuckDB oracle (one deterministic
# table, two independent readers).
_REPO_SHAPE = (400, 16, 42)  # (n_rows, n_repos, seed)
_REPO_ORACLE_PARQUET = "/tmp/fogray_repo_oracle_{}_{}_{}.parquet".format(*_REPO_SHAPE)


def _repo_oracle_parquet() -> str:
    """Write the deterministic repo table where the oracle SQL can read
    it (idempotent; atomic rename so a concurrent writer can't expose a
    torn file)."""
    import os

    if not os.path.exists(_REPO_ORACLE_PARQUET):
        import pyarrow.parquet as pq

        from fogray import tables

        n_rows, n_repos, seed = _REPO_SHAPE
        t = tables.make_repo_table(n_rows, n_repos, seed=seed)
        tmp = f"{_REPO_ORACLE_PARQUET}.tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, _REPO_ORACLE_PARQUET)
    return _REPO_ORACLE_PARQUET


def _repo_oracle_sql() -> dict[str, str]:
    """DuckDB oracles for the repo_* pipelines, over the same
    deterministic table (read from parquet). Notes on equivalences:

    - co-occurrence on ``sha256(content)`` == co-occurrence on
      ``content`` (the hash only renames the grouping key), so the SQL
      groups by raw content;
    - dense vid = rank of repo in sorted distinct repo names; DuckDB's
      default binary collation matches numpy's codepoint sort on these
      ASCII names;
    - the PageRank recursion mirrors the FOG semantics oracle used for
      the co-occurrence graph (fogray/queries.py): per-edge teleport,
      accumulate-no-reset via a unit self-loop row, 10 fixed
      iterations; verts spans ALL repos (isolated vertices hold their
      initial rank 1.0).
    """
    path = _repo_oracle_parquet()
    cap = 256  # derive_edges default max_repos_per_key
    vids_sql = f"""
        SELECT repo, CAST(ROW_NUMBER() OVER (ORDER BY repo) - 1 AS BIGINT) AS vid
        FROM (SELECT DISTINCT repo FROM read_parquet('{path}'))
    """
    edges_sql = f"""
        WITH files AS (
            SELECT repo, path, lang, content FROM read_parquet('{path}')
        ),
        vids AS ({vids_sql}),
        fv AS (
            SELECT f.path, f.lang, f.content, v.vid
            FROM files f JOIN vids v ON v.repo = f.repo
        ),
        chan AS (
            SELECT 'c' AS ch, content AS k1, '' AS k2, vid
            FROM (SELECT DISTINCT content, vid FROM fv)
            UNION ALL
            SELECT 'p', path, lang, vid
            FROM (SELECT DISTINCT path, lang, vid FROM fv)
        ),
        keyed AS (
            SELECT ch, k1, k2, vid,
                   COUNT(*) OVER (PARTITION BY ch, k1, k2) AS grp_n
            FROM chan
        ),
        ok AS (SELECT * FROM keyed WHERE grp_n BETWEEN 2 AND {cap}),
        pairs AS (
            SELECT a.vid AS src, b.vid AS dst
            FROM ok a JOIN ok b
              ON a.ch = b.ch AND a.k1 = b.k1 AND a.k2 = b.k2
             AND a.vid <> b.vid
        )
        SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS weight
        FROM pairs GROUP BY 1, 2
    """
    pagerank_sql = f"""
        WITH RECURSIVE
        edges AS ({edges_sql}),
        verts AS (SELECT vid AS v FROM ({vids_sql})),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        mat AS (
            SELECT e.src AS src, e.dst AS dst,
                   0.85 / d.outdeg AS coef, 0.15 AS konst
            FROM edges e JOIN deg d ON d.src = e.src
            UNION ALL
            SELECT v, v, 1.0, 0.0 FROM verts
        ),
        pr(iter, v, r) AS (
            SELECT 0, v, CAST(1.0 AS DOUBLE) FROM verts
            UNION ALL
            SELECT pr.iter + 1, mat.dst, SUM(mat.coef * pr.r + mat.konst)
            FROM pr JOIN mat ON mat.src = pr.v
            WHERE pr.iter < 10
            GROUP BY pr.iter + 1, mat.dst
        )
        SELECT v AS vid, ROUND(r, 6) AS rank FROM pr WHERE iter = 10 ORDER BY vid
    """
    # the derived graph is symmetric (both co-occurrence directions), so
    # component/label of a vertex = MIN reachable vid, same recursive
    # shape as the co-occurrence oracles in fogray/queries.py
    reach_sql = f"""
        WITH RECURSIVE
        edges AS (SELECT src, dst FROM ({edges_sql})),
        reach(v, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v
        )
        SELECT v AS vid, MIN(r) AS {{label}} FROM reach GROUP BY v ORDER BY vid
    """
    triangles_sql = f"""
        WITH und AS (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ({edges_sql}) WHERE src <> dst
        )
        SELECT COUNT(*) AS triangles
        FROM und p1
        JOIN und p2 ON p2.a = p1.a AND p2.b > p1.b
        JOIN und p3 ON p3.a = p1.b AND p3.b = p2.b
    """
    return {
        "repo_derive_edges": f"SELECT src, dst, weight FROM ({edges_sql}) ORDER BY src, dst",
        "repo_pagerank": pagerank_sql,
        "repo_pagerank_dist": pagerank_sql,
        "repo_cc": reach_sql.format(label="component_root"),
        "repo_lp": reach_sql.format(label="label"),
        "repo_triangles": triangles_sql,
        "repo_dedup": f"""
            SELECT sha256(content) AS sha, COUNT(*) AS n_copies,
                   COUNT(DISTINCT repo) AS n_repos,
                   MIN(repo || ':' || path) AS keeper
            FROM read_parquet('{path}')
            GROUP BY content ORDER BY sha
        """,
    }


def _repo_graph_queries() -> dict[str, Callable[[str], Any]]:
    """Pipelines over the deterministic synthetic repo table (the
    input_hint-shaped table); DuckDB oracles in :func:`_repo_oracle_sql`
    read the same table re-materialized to parquet."""

    import functools

    @functools.lru_cache(maxsize=2)
    def _derived_impl(_session: str):
        import ray.data as rd

        from fogray import derive, tables

        n_rows, n_repos, seed = _REPO_SHAPE
        t = tables.make_repo_table(n_rows, n_repos, seed=seed)
        out = derive.derive_edges(rd.from_arrow(t))
        # tiny, deterministic, consumed by three queries: materialize the
        # edge table once instead of re-running the derive per query
        out["edges"] = out["edges"].to_pandas().sort_values(["src", "dst"])
        return out

    def _derived(sf_dir: str):
        from fogray.queries import _ray_session_key

        return _derived_impl(_ray_session_key())

    def repo_edges(sf_dir: str):
        return _derived(sf_dir)["edges"]

    def repo_pagerank(sf_dir: str):
        import numpy as np

        from fogray import algorithms as alg
        from fogray.config import EngineConfig
        from fogray.engine import GraphEngine

        out = _derived(sf_dir)
        e = out["edges"]
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

        from fogray.util import sql_round

        return pd.DataFrame(
            {"vid": np.arange(out["num_vertices"]), "rank": sql_round(res.state["rank"])}
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
        e = out["edges"]
        eng = DistGraphEngine(
            out["num_vertices"],
            arrays=(e["src"].to_numpy(), e["dst"].to_numpy(), e["weight"].to_numpy()),
            cfg=EngineConfig(num_partitions=4),
        )
        try:
            res = alg.pagerank(eng, niters=10)
        finally:
            eng.shutdown()
        from fogray.util import sql_round

        return pd.DataFrame(
            {"vid": np.arange(out["num_vertices"]), "rank": sql_round(res.state["rank"])}
        )

    def _repo_engine(sf_dir: str):
        from fogray.config import EngineConfig
        from fogray.engine import GraphEngine

        out = _derived(sf_dir)
        e = out["edges"]
        return out, GraphEngine(
            out["num_vertices"],
            arrays=(e["src"].to_numpy(), e["dst"].to_numpy(), e["weight"].to_numpy()),
            cfg=EngineConfig(num_partitions=4),
        )

    def repo_cc(sf_dir: str):
        """North-rule connected components over the repo-derived graph
        (exact component assignments; symmetric graph => root = min
        reachable vid)."""
        import numpy as np
        import pandas as pd

        from fogray import algorithms as alg

        out, eng = _repo_engine(sf_dir)
        try:
            res = alg.connected_components(eng)
        finally:
            eng.shutdown()
        ids = np.unique(out["edges"]["src"].to_numpy())
        return pd.DataFrame(
            {
                "vid": ids.astype(np.int64),
                "component_root": res.state["component_root"][ids].astype(np.int64),
            }
        )

    def repo_lp(sf_dir: str):
        """North-rule label propagation over the repo-derived graph."""
        import numpy as np
        import pandas as pd

        from fogray import algorithms as alg

        out, eng = _repo_engine(sf_dir)
        try:
            res = alg.label_propagation(eng)
        finally:
            eng.shutdown()
        ids = np.unique(out["edges"]["src"].to_numpy())
        return pd.DataFrame(
            {
                "vid": ids.astype(np.int64),
                "label": res.state["component_root"][ids].astype(np.int64),
            }
        )

    def repo_triangles(sf_dir: str):
        """North-rule triangle count over the repo-derived graph."""
        import numpy as np
        import pandas as pd

        from fogray.triangles import triangle_count

        out = _derived(sf_dir)
        e = out["edges"]
        cnt = triangle_count(
            (e["src"].to_numpy(), e["dst"].to_numpy()), out["num_vertices"]
        )
        return pd.DataFrame({"triangles": np.array([cnt], dtype=np.int64)})

    def repo_dedup(sf_dir: str):
        """Exact cross-repo file dedup on the input_hint-shaped table —
        the per-row sha256(content) invariant as an operator: one row
        per distinct content with copy/repo counts and the
        lexicographically-first (repo:path) keeper. Same dataflow as
        datapipes exact_dedup: hash inside map_batches, ONE sort by
        sha, group-complete blocks aggregate vectorized."""
        import hashlib

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        import ray.data as rd

        from fogray import tables
        from fogray.derive import key_grouped_block_map

        n_rows, n_repos, seed = _REPO_SHAPE
        t = tables.make_repo_table(n_rows, n_repos, seed=seed)
        ds = rd.from_arrow(t).repartition(8)

        def sha_batch(b: pa.Table) -> pa.Table:
            shas = [
                hashlib.sha256(c.encode()).hexdigest()
                for c in b.column("content").to_pylist()
            ]
            keeper = pc.binary_join_element_wise(
                b.column("repo").cast(pa.string()),
                b.column("path").cast(pa.string()),
                ":",
            )
            return pa.table(
                {"sha": pa.array(shas), "repo": b.column("repo"), "keeper": keeper}
            )

        def agg(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "sha": pa.array([], pa.string()),
                    "n_copies": pa.array([], pa.int64()),
                    "n_repos": pa.array([], pa.int64()),
                    "keeper": pa.array([], pa.string()),
                }
            )
            if b.num_rows == 0:
                return empty
            sha = np.asarray(b.column("sha").to_pylist(), dtype=object)
            repo = np.asarray(b.column("repo").to_pylist(), dtype=object)
            keep = np.asarray(b.column("keeper").to_pylist(), dtype=object)
            order = np.lexsort((keep, sha))
            sha, repo, keep = sha[order], repo[order], keep[order]
            new_grp = np.r_[True, sha[1:] != sha[:-1]]
            starts = np.flatnonzero(new_grp)
            sizes = np.diff(np.r_[starts, len(sha)])
            # equal repos are contiguous within a keeper-sorted group
            # (shared "repo:" prefix), so distinct repos = run changes
            new_repo = new_grp | np.r_[True, repo[1:] != repo[:-1]]
            n_repos_ = np.add.reduceat(new_repo.astype(np.int64), starts)
            return pa.table(
                {
                    "sha": pa.array(sha[starts]),
                    "n_copies": pa.array(sizes.astype(np.int64)),
                    "n_repos": pa.array(n_repos_),
                    "keeper": pa.array(keep[starts]),
                }
            )

        out = key_grouped_block_map(
            ds.map_batches(sha_batch, batch_format="pyarrow").sort("sha"),
            ["sha"],
            agg,
        )
        import pandas as pd

        df = pa.concat_tables(
            ray.get(out.materialize().to_arrow_refs())
        ).to_pandas()
        return df.sort_values("sha").reset_index(drop=True)

    return {
        "repo_derive_edges": repo_edges,
        "repo_pagerank": repo_pagerank,
        "repo_pagerank_dist": repo_pagerank_dist,
        "repo_cc": repo_cc,
        "repo_lp": repo_lp,
        "repo_triangles": repo_triangles,
        "repo_dedup": repo_dedup,
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
    out.update(_repo_oracle_sql())
    try:
        from fogray.datapipes import queries as dq

        out.update(dq.ORACLE_SQL)
    except ImportError:
        pass
    return out
