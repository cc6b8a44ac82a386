"""Derive stage: repo table -> edge table, vs an independent pandas
oracle; plus the per-row sha256(content) multiset invariant."""

import numpy as np
import pandas as pd
import pytest

from fogray import derive, tables


@pytest.fixture(scope="module")
def repo_table():
    return tables.make_repo_table(300, 14, seed=42)


def test_repo_table_deterministic():
    a = tables.make_repo_table(100, 8, seed=7)
    b = tables.make_repo_table(100, 8, seed=7)
    assert a.equals(b)
    c = tables.make_repo_table(100, 8, seed=8)
    assert not a.equals(c)


def test_schema(repo_table):
    assert repo_table.column_names == ["repo", "path", "commit", "lang", "content"]
    assert repo_table.num_rows == 300


def test_derive_matches_oracle(ray_session, repo_table):
    import ray.data as rd

    out = derive.derive_edges(rd.from_arrow(repo_table))
    got = (
        out["edges"]
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)[["src", "dst", "weight"]]
    )
    expected = derive.derive_edges_oracle(repo_table)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
    assert out["num_vertices"] == repo_table.column("repo").to_pandas().nunique()
    # vid assignment = rank in sorted distinct repos
    repos = out["repos"].to_pandas()
    assert (repos["repo"].to_numpy() == np.sort(repos["repo"].to_numpy())).all()
    assert repos["vid"].tolist() == list(range(len(repos)))


def test_derive_symmetric_and_selffree(ray_session, repo_table):
    import ray.data as rd

    out = derive.derive_edges(rd.from_arrow(repo_table))
    e = out["edges"].to_pandas()
    assert (e["src"] != e["dst"]).all()
    fwd = set(zip(e["src"], e["dst"]))
    assert all((b, a) in fwd for a, b in fwd)  # both directions emitted
    # weights symmetric too
    wmap = {(a, b): w for a, b, w in zip(e["src"], e["dst"], e["weight"])}
    assert all(wmap[(a, b)] == wmap[(b, a)] for (a, b) in wmap)


def test_sha_multiset_invariant(ray_session, repo_table):
    """north_rule: every row preserves content sha256 equality vs input —
    the files dataset's sha multiset must equal the input's."""
    import ray.data as rd

    out = derive.derive_edges(rd.from_arrow(repo_table))
    got = out["files"].to_pandas()["content_sha"].value_counts().to_dict()
    expected = tables.content_sha_multiset(repo_table)
    assert got == expected


def test_boilerplate_cap(ray_session):
    """Keys shared by more repos than the cap are dropped entirely."""
    import pyarrow as pa
    import ray.data as rd

    rows = {
        "repo": [f"r{i}" for i in range(6)] + ["a", "b"],
        "path": ["same.py"] * 6 + ["x.py", "y.py"],
        "commit": ["c"] * 8,
        "lang": ["py"] * 8,
        "content": ["BOILER"] * 6 + ["u1", "u1"],
    }
    t = pa.table(rows)
    out = derive.derive_edges(rd.from_arrow(t), max_repos_per_key=4)
    e = out["edges"].to_pandas()
    oracle = derive.derive_edges_oracle(t, max_repos_per_key=4)
    pd.testing.assert_frame_equal(
        e.sort_values(["src", "dst"]).reset_index(drop=True)[["src", "dst", "weight"]],
        oracle,
        check_dtype=False,
    )
    # the boilerplate content+path key (6 repos > cap) contributes nothing;
    # only a<->b via shared content remains
    vids = out["repos"].to_pandas().set_index("repo")["vid"]
    assert set(zip(e["src"], e["dst"])) == {(vids["a"], vids["b"]), (vids["b"], vids["a"])}
