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


# ---------------------------------------------------------------------------
# plan_key_groups hardening (round-2 fix for the flaky evt_sessions hash:
# the executor may yield sorted blocks out of order or split one reduce
# output — the planner must coalesce by key range, not yielded adjacency)
# ---------------------------------------------------------------------------


def test_plan_key_groups_disjoint_stays_independent():
    bounds = [((0,), (4,)), ((5,), (9,)), ((10,), (12,))]
    assert derive.plan_key_groups(bounds) == [[0], [1], [2]]


def test_plan_key_groups_shared_boundary():
    bounds = [((0,), (5,)), ((5,), (9,)), ((10,), (11,))]
    assert derive.plan_key_groups(bounds) == [[0, 1], [2]]


def test_plan_key_groups_out_of_order_blocks():
    # executor yields the second range first; boundary key 5 is shared
    bounds = [((5,), (9,)), ((0,), (5,)), ((10,), (11,))]
    assert derive.plan_key_groups(bounds) == [[1, 0], [2]]


def test_plan_key_groups_split_reduce_output():
    # one reduce output split mid-key-range: ranges overlap, must merge
    bounds = [((0,), (7,)), ((3,), (9,)), ((10,), (11,))]
    assert derive.plan_key_groups(bounds) == [[0, 1], [2]]


def test_plan_key_groups_empty_and_none_blocks():
    bounds = [None, ((2,), (2,)), None, ((2,), (3,))]
    assert derive.plan_key_groups(bounds) == [[1, 3]]


def test_plan_key_groups_transitive_chain():
    # a long block spanning several later blocks' ranges
    bounds = [((0,), (9,)), ((1,), (2,)), ((3,), (9,)), ((9,), (9,)), ((10,), (10,))]
    assert derive.plan_key_groups(bounds) == [[0, 1, 2, 3], [4]]


def test_key_grouped_block_map_hostile_layout(ray_session):
    """Integration: blocks sorted within but yielded out of order AND one
    key split across two blocks — the sessionize-style numbering that
    went flaky in round 1 must still come out exact."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    # key 10 spans blocks, and blocks are supplied out of global order
    blocks = [
        pa.table({"k": [10, 10, 11], "v": [3, 4, 5]}),   # second half
        pa.table({"k": [1, 2, 10], "v": [0, 1, 2]}),     # first half
        pa.table({"k": [20], "v": [9]}),
    ]
    ds = rd.from_arrow_refs([ray.put(b) for b in blocks])

    def per_key_stats(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        sizes = np.diff(np.r_[starts, len(k)])
        return pa.table(
            {
                "k": k[starts],
                "n": sizes.astype(np.int64),
                "sum_v": np.add.reduceat(v, starts).astype(np.int64),
            }
        )

    out = (
        derive.key_grouped_block_map(ds, ["k"], per_key_stats)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    expected = pd.DataFrame(
        {"k": [1, 2, 10, 11, 20], "n": [1, 1, 3, 1, 1], "sum_v": [0, 1, 9, 5, 9]}
    )
    pd.testing.assert_frame_equal(out, expected, check_dtype=False)
