"""SNAP text readers + graph metadata sidecar (fogray.sources) — the
reference convert front-end parity (SURVEY.md S1/S2/S6/S7)."""

import numpy as np
import pytest

from fogray import sources


EDGELIST = """\
# SNAP-style comment
# src\tdst
0\t1
0\t2
1\t2
3\t0

2\t2
"""

ADJLIST = """\
# comment
0 2 1 2
1 1 2
2 1 2
3 1 0
4 0
"""


@pytest.fixture()
def edge_file(tmp_path):
    p = tmp_path / "g.txt"
    p.write_text(EDGELIST)
    return str(p)


@pytest.fixture()
def adj_file(tmp_path):
    p = tmp_path / "g.adj"
    p.write_text(ADJLIST)
    return str(p)


def test_read_edgelist(ray_session, edge_file):
    t = sources.read_edgelist(edge_file).to_pandas().sort_values(["src", "dst"])
    assert list(zip(t["src"], t["dst"])) == [(0, 1), (0, 2), (1, 2), (2, 2), (3, 0)]
    assert (t["weight"] == 1.0).all()


def test_read_edgelist_weighted_deterministic(ray_session, edge_file):
    t1 = sources.read_edgelist(edge_file, weighted=True).to_pandas().sort_values(["src", "dst"])
    t2 = sources.read_edgelist(edge_file, weighted=True).to_pandas().sort_values(["src", "dst"])
    np.testing.assert_array_equal(t1["weight"].to_numpy(), t2["weight"].to_numpy())
    assert ((t1["weight"] >= 0) & (t1["weight"] < 10)).all()
    # distinct edges get distinct weights (hash-derived, rand() analog)
    assert len(set(np.round(t1["weight"], 12))) == len(t1)


def test_read_adjlist(ray_session, adj_file):
    t = sources.read_adjlist(adj_file).to_pandas().sort_values(["src", "dst"])
    assert list(zip(t["src"], t["dst"])) == [(0, 1), (0, 2), (1, 2), (2, 2), (3, 0)]


def test_adjlist_degree_mismatch(ray_session, tmp_path):
    p = tmp_path / "bad.adj"
    p.write_text("0 3 1 2\n")
    with pytest.raises(Exception, match="degree mismatch|RayTaskError|declared"):
        sources.read_adjlist(str(p)).to_pandas()


def test_edgelist_matches_adjlist(ray_session, edge_file, adj_file):
    """Same graph via both formats -> identical edge tables and weights
    (weights depend only on (src, dst))."""
    a = sources.read_edgelist(edge_file, weighted=True).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = sources.read_adjlist(adj_file, weighted=True).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_graph_meta_roundtrip(ray_session, edge_file, tmp_path):
    ds = sources.read_edgelist(edge_file)
    meta = sources.write_edges_parquet(ds, str(tmp_path / "pkg"))
    assert meta == {
        "min_vertex_id": 0,
        "max_vertex_id": 3,
        "num_edges": 5,
        "max_out_edges": 2,
        "with_weights": True,
    }
    ds2, meta2 = sources.read_edges_parquet(str(tmp_path / "pkg"))
    assert meta2 == meta
    t = ds2.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert len(t) == 5 and t["src"].tolist() == [0, 0, 1, 2, 3]


def test_engine_over_text_source(ray_session, edge_file):
    """End-to-end: SNAP text -> edge Dataset -> engine PageRank matches
    the FOG oracle."""
    from fogray import algorithms as alg
    from fogray import oracle as orc
    from fogray.config import EngineConfig
    from fogray.engine import GraphEngine

    ds = sources.read_edgelist(edge_file).materialize()
    t = ds.to_pandas()
    src, dst = t["src"].to_numpy(), t["dst"].to_numpy()
    n = int(max(src.max(), dst.max())) + 1
    eng = GraphEngine(n, dataset=ds, cfg=EngineConfig(num_partitions=2))
    try:
        res = alg.pagerank(eng, niters=5)
    finally:
        eng.shutdown()
    np.testing.assert_allclose(
        res.state["rank"], orc.pagerank_fog(src, dst, n, 5), rtol=1e-6
    )


def test_read_edges_csv_and_jsonl(ray_session, tmp_path):
    """CSV and JSONL edge sources parse to the same (src, dst) set as
    the text edge-list, with deterministic weights matching."""
    import pyarrow as pa
    import pyarrow.csv as pacsv
    import ray

    t = pa.table({"src": np.array([0, 0, 1, 3, 2], dtype=np.int64),
                  "dst": np.array([1, 2, 2, 0, 2], dtype=np.int64)})
    csv_dir = tmp_path / "csv"; csv_dir.mkdir()
    pacsv.write_csv(t, str(csv_dir / "part-0.csv"))
    jl_dir = tmp_path / "jl"; jl_dir.mkdir()
    t.to_pandas().to_json(str(jl_dir / "part-0.json"), orient="records",
                          lines=True)

    def collect(ds):
        tt = pa.concat_tables(ray.get(ds.materialize().to_arrow_refs()),
                              promote_options="default")
        df = tt.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        return df

    c = collect(sources.read_edges_csv(str(csv_dir), weighted=True))
    j = collect(sources.read_edges_jsonl(str(jl_dir), weighted=True))
    assert c[["src", "dst"]].values.tolist() == sorted(
        [[0, 1], [0, 2], [1, 2], [3, 0], [2, 2]]
    )
    assert c.values.tolist() == j.values.tolist()  # incl. det weights
