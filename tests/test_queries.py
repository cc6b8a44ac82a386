"""Replicates the driver's conformance check: each queries() result vs
its oracle_sql() run by DuckDB on the same parquet views — row count,
schema (column names), and order-insensitive value equality."""

import glob
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, con):
    from fogray import queries as q

    got = q.QUERIES[name](SF_DIR)
    got_df = normalize(got.to_pandas())
    want_df = normalize(con.execute(q.ORACLE_SQL[name]).df())
    assert list(got_df.columns) == list(want_df.columns), name
    assert len(got_df) == len(want_df), f"{name}: {len(got_df)} vs {len(want_df)} rows"
    pd.testing.assert_frame_equal(got_df, want_df, check_dtype=False, atol=0, rtol=0)


@pytest.mark.parametrize("name", [
    "derive_edges", "out_degrees", "pagerank", "ppr", "hits", "kcore",
    "connected_components", "label_propagation", "bfs", "sssp_tree",
    "spmv", "triangle_count", "clustering", "scan_similarity", "ktruss",
    "graph_walks", "scc", "src_csv", "src_jsonl", "assortativity",
    "adamic_adar", "harmonic", "diameter", "mis", "two_hop", "betweenness",
    "katz", "modularity", "closeness", "degree_histogram", "transitivity",
    "eigenvector", "sample_fanout", "link_predict", "wpagerank", "reciprocity", "four_cycles", "salsa", "bib_coupling", "co_citation", "anf_reach", "degree_powerlaw", "wl_colors", "densest", "motif_triads", "lpa_freq", "biased_walks", "scc_condensation", "msf", "coloring", "matching", "cc_incremental",
    "temporal_reach", "pagerank_evolve",
])
def test_query_matches_oracle(ray_session, con, name):
    _compare(name, con)


# sf0.01 spot-checks: data properties that sf0.001 lacks (duplicate
# (order, line) rows appear only at the larger scale and broke the
# sequence-edge derivation once) — run the two most structure-sensitive
# queries against the oracle at the driver's own conformance scale.
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con01():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF01, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


@pytest.mark.parametrize("name", ["scc", "derive_edges"])
def test_query_matches_oracle_sf001(ray_session, con01, name):
    from fogray import queries as q

    got = q.QUERIES[name](SF01)
    got_df = normalize(got.to_pandas())
    want_df = normalize(con01.execute(q.ORACLE_SQL[name]).df())
    assert len(got_df) == len(want_df), f"{name}: {len(got_df)} vs {len(want_df)} rows"
    pd.testing.assert_frame_equal(got_df, want_df, check_dtype=False, atol=0, rtol=0)


def test_random_walks_semantics(ray_session):
    """random_walks edge rules against a pure-numpy simulation on a
    directed graph WITH dead ends (the co-occurrence graph is symmetric
    so the query never exercises halting): walkers stop at sinks, every
    step is splitmix53(wid<<32 ^ step) mod outdeg over dst-ascending
    neighbors, and sharding is invariant (1 shard == 8 shards)."""
    import numpy as np
    import pyarrow as pa

    from fogray.sources import splitmix53
    from fogray.walks import random_walks

    rng = np.random.default_rng(11)
    n_edges = 5000
    src = rng.integers(0, 300, n_edges).astype(np.int64)
    dst = rng.integers(0, 400, n_edges).astype(np.int64)  # vids 300..399 are sinks
    m = src != dst
    src, dst = src[m], dst[m]
    # dedup (src, dst)
    key = src * 1000 + dst
    _, first = np.unique(key, return_index=True)
    src, dst = src[first], dst[first]
    tab = pa.table({"src": src, "dst": dst})

    out = random_walks(tab, num_steps=5, num_shards=8).to_pandas()
    out1 = random_walks(tab, num_steps=5, num_shards=1).to_pandas()
    k = ["wid", "step", "vid"]
    assert out.sort_values(k).reset_index(drop=True).equals(
        out1.sort_values(k).reset_index(drop=True)
    )

    # numpy simulation
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    usrc = s[starts]
    offs = np.r_[starts, len(s)]
    rows = set()
    for start in usrc:
        cur, wid = start, start
        rows.add((wid, 0, cur))
        for step in range(5):
            p = np.searchsorted(usrc, cur)
            if p >= len(usrc) or usrc[p] != cur:
                break  # dead end
            deg = offs[p + 1] - offs[p]
            h = int(splitmix53(np.array([(np.uint64(wid) << np.uint64(32))
                                         ^ np.uint64(step)], dtype=np.uint64))[0])
            cur = int(d[offs[p] + h % deg])
            rows.add((wid, step + 1, cur))
    got = set(zip(out.wid, out.step, out.vid))
    assert got == rows
    # dead ends actually exercised: some walks are shorter than max
    lens = out.groupby("wid").step.max()
    assert (lens < 5).any() and (lens == 5).any()


def test_random_walks_dataset_path_parity(ray_session):
    """The Dataset shard-build path (sort + boundary-key planning, edge
    table never on the driver) returns exactly the table path's walks."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fogray.walks import random_walks

    rng = np.random.default_rng(3)
    src = rng.integers(0, 500, 20_000).astype(np.int64)
    dst = rng.integers(0, 500, 20_000).astype(np.int64)
    m = src != dst
    tab = pa.table({"src": src[m], "dst": dst[m]})
    a = random_walks(tab, num_steps=4).to_pandas()
    b = random_walks(rd.from_arrow(tab).repartition(9), num_steps=4).to_pandas()
    k = ["wid", "step", "vid"]
    assert a.sort_values(k).reset_index(drop=True).equals(
        b.sort_values(k).reset_index(drop=True)
    )


def test_random_walks_multi_coordinator_parity(ray_session):
    """Sharding the walker FRONTIER across 4 WalkCoordinator actors
    (same shard pool) returns bit-identical walks to the
    single-coordinator loop — each step is a pure function of
    (wid, step, adjacency)."""
    import numpy as np
    import pyarrow as pa

    from fogray.walks import random_walks

    rng = np.random.default_rng(11)
    src = rng.integers(0, 400, 15_000).astype(np.int64)
    dst = rng.integers(0, 400, 15_000).astype(np.int64)
    m = src != dst
    tab = pa.table({"src": src[m], "dst": dst[m]})
    a = random_walks(tab, num_steps=5, num_coordinators=1).to_pandas()
    b = random_walks(tab, num_steps=5, num_coordinators=4).to_pandas()
    k = ["wid", "step", "vid"]
    assert a.sort_values(k).reset_index(drop=True).equals(
        b.sort_values(k).reset_index(drop=True)
    )
