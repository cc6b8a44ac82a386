"""Smoke the driver contract: entry() runs and every queries() entry
has either an oracle_sql() key or is an intentional rows-only pipeline."""


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = e.entry()
    assert len(df) > 0
    assert set(df.columns) == {"vid", "rank"}


def test_queries_registry(ray_session):
    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    assert set(sqls).issubset(set(qs))
    # every SQL-checkable graph operator is registered
    for name in ["derive_edges", "pagerank", "connected_components", "bfs",
                 "sssp_tree", "spmv", "triangle_count", "scc", "label_propagation",
                 "out_degrees"]:
        assert name in qs and name in sqls
    # the flagship repo_* pipelines are oracle-gated since round 2
    for name in ("repo_derive_edges", "repo_pagerank", "repo_pagerank_dist",
                 "repo_cc", "repo_lp", "repo_triangles", "repo_dedup"):
        assert name in qs and name in sqls


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    for name, fn in qs.items():
        if name in sqls:
            continue  # covered by test_queries.py / driver
        out = fn("/root/testdata/sf0.001")
        n = len(out)
        assert n >= 0


def test_repo_oracles_match(ray_session):
    """The repo_* flagship pipelines vs their DuckDB oracles (round-2
    addition: the deterministic repo table is re-materialized to parquet
    for SQL; co-occurrence groups by raw content, vids by name rank)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    for name in ("repo_derive_edges", "repo_pagerank", "repo_pagerank_dist",
                 "repo_cc", "repo_lp", "repo_triangles", "repo_dedup"):
        df = qs[name]("/root/testdata/sf0.001")
        odf = duckdb.connect().execute(sqls[name]).fetchdf()
        a = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
        b = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
        assert len(a) == len(b), name
        pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=0, rtol=0)
