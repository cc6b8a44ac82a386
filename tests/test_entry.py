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
    # rows-only flagship pipelines exist
    assert "repo_pagerank" in qs and "repo_pagerank" not in sqls


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
