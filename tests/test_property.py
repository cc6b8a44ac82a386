"""Property-based checks (SURVEY.md section 5.3): random graphs drawn by
hypothesis, engine results vs the pure-numpy FOG oracles and structural
invariants that must hold for ANY graph."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fogray import algorithms as alg
from fogray import oracle as orc
from fogray.config import EngineConfig
from fogray.engine import GraphEngine

_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    m = draw(st.integers(min_value=1, max_value=120))
    src = draw(
        st.lists(st.integers(0, n - 1), min_size=m, max_size=m).map(
            lambda x: np.asarray(x, dtype=np.int64)
        )
    )
    dst = draw(
        st.lists(st.integers(0, n - 1), min_size=m, max_size=m).map(
            lambda x: np.asarray(x, dtype=np.int64)
        )
    )
    wseed = draw(st.integers(0, 2**31 - 1))
    w = (np.arange(m, dtype=np.float64) * 37 + wseed) % 10 + 0.25
    parts = draw(st.integers(1, 5))
    return src, dst, w, n, parts


@given(graphs())
@_settings
def test_pagerank_matches_oracle(ray_session, g):
    src, dst, w, n, parts = g
    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=parts))
    try:
        res = alg.pagerank(eng, niters=4)
    finally:
        eng.shutdown()
    np.testing.assert_allclose(
        res.state["rank"], orc.pagerank_fog(src, dst, n, 4), rtol=1e-6, atol=1e-6
    )


@given(graphs())
@_settings
def test_cc_labels_are_min_reachable(ray_session, g):
    """CC invariant: every label is the minimum vid of the vertex's
    undirected connected component (independent of the oracle's
    propagation schedule)."""
    src, dst, w, n, parts = g
    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=parts))
    try:
        res = alg.connected_components(eng)
    finally:
        eng.shutdown()
    labels = res.state["component_root"].astype(np.int64)
    # union-find ground truth
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(v) for v in range(n)])
    comp_min = np.full(n, -1, dtype=np.int64)
    for v in range(n):
        r = roots[v]
        comp_min[r] = v if comp_min[r] == -1 else min(comp_min[r], v)
    expected = comp_min[roots]
    # vertices with no (non-self-loop) edges keep their own vid
    touched = np.zeros(n, dtype=bool)
    nl = src != dst
    touched[src[nl]] = True
    touched[dst[nl]] = True
    expected[~touched] = np.arange(n)[~touched]
    np.testing.assert_array_equal(labels, expected)


@given(graphs())
@_settings
def test_bfs_levels_are_shortest_hops(ray_session, g):
    src, dst, w, n, parts = g
    root = int(src[0])
    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=parts))
    try:
        res = alg.bfs(eng, root=root)
    finally:
        eng.shutdown()
    # breadth-first ground truth over non-self-loop out-edges
    INF = np.iinfo(np.uint64).max & 0xFFFFFFFF
    lvl = {root: 0}
    frontier = [root]
    adj = {}
    for a, b in zip(src, dst):
        if a != b:
            adj.setdefault(int(a), []).append(int(b))
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in lvl:
                    lvl[v] = lvl[u] + 1
                    nxt.append(v)
        frontier = nxt
    got = res.state["bfs_level"]
    for v in range(n):
        if v in lvl:
            assert int(got[v]) == lvl[v], (v, got[v], lvl[v])
        else:
            assert got[v] >= 2**32 - 1


@given(graphs())
@_settings
def test_triangle_count_matches_bruteforce(ray_session, g):
    from fogray.triangles import triangle_count

    src, dst, w, n, parts = g
    got = triangle_count((src, dst), n)
    # brute force over the undirected simple graph
    es = set()
    for a, b in zip(src, dst):
        if a != b:
            es.add((min(a, b), max(a, b)))
    adj = [set() for _ in range(n)]
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    brute = sum(
        1
        for a, b in es
        for c in (adj[a] & adj[b])
        if c > b
    )
    assert got == brute


@given(graphs())
@_settings
def test_spmv_is_weighted_indegree_sum(ray_session, g):
    src, dst, w, n, parts = g
    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=parts))
    try:
        res = alg.spmv(eng)
    finally:
        eng.shutdown()
    expected = np.zeros(n)
    np.add.at(expected, dst, w)  # x = 1.0 everywhere
    np.testing.assert_allclose(res.state["spmv_value"], expected, rtol=1e-9)


@given(graphs())
@_settings
def test_sample_fanout_is_per_src_hash_topk(ray_session, g):
    """sample_fanout: every src keeps exactly min(fanout, outdeg)
    distinct neighbors, ranked by the splitmix hash — checked against a
    direct numpy ranking of the deduped edge set."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from fogray.sources import splitmix53
    from fogray.walks import sample_fanout

    src, dst, w, n, parts = g
    m = src != dst
    src, dst = src[m], dst[m]
    if len(src) == 0:
        return
    key = src * np.int64(n) + dst
    _, first = np.unique(key, return_index=True)
    src, dst = src[first], dst[first]
    ds = rd.from_arrow(
        pa.table({"src": src, "dst": dst})
    ).repartition(parts)
    out = pa.concat_tables(
        ray.get(sample_fanout(ds, fanout=3).materialize().to_arrow_refs())
    )
    hv = splitmix53((src.astype(np.uint64) << np.uint64(32)) ^ dst.astype(np.uint64))
    import pandas as pd

    want = pd.DataFrame({"src": src, "dst": dst, "hv": hv})
    want = want.sort_values(["src", "hv", "dst"])
    want["rk"] = want.groupby("src").cumcount() + 1
    want = want[want.rk <= 3][["src", "dst", "rk"]]
    got = out.to_pandas()
    k = ["src", "rk"]
    pd.testing.assert_frame_equal(
        got.sort_values(k).reset_index(drop=True).astype("int64"),
        want.sort_values(k).reset_index(drop=True).astype("int64"),
    )


@given(graphs())
@_settings
def test_reciprocity_matches_bruteforce(ray_session, g):
    from fogray.metrics import edge_reciprocity

    src, dst, w, n, parts = g
    m = src != dst
    src, dst = src[m], dst[m]
    key = src * np.int64(n) + dst
    _, first = np.unique(key, return_index=True)
    src, dst = src[first], dst[first]
    if len(src) == 0:
        return
    t = edge_reciprocity((src, dst))
    pairs = set(zip(src.tolist(), dst.tolist()))
    n_recip = sum(1 for a, b in pairs if (b, a) in pairs)
    assert t.column("n_edges")[0].as_py() == len(pairs)
    assert t.column("n_recip")[0].as_py() == n_recip


@given(graphs())
@_settings
def test_triad_census_matches_bruteforce(ray_session, g):
    """Cycle and transitive closed-triad counts vs an O(E·V) brute
    force over the DISTINCT self-loop-free edge set."""
    import pyarrow as pa
    import ray.data as rd

    from fogray.metrics import triad_census

    src, dst, _, n, parts = g
    m = src != dst
    key = np.unique(src[m] * np.int64(n) + dst[m])
    s, d = (key // n).astype(np.int64), (key % n).astype(np.int64)
    adj = np.zeros((n, n), dtype=bool)
    adj[s, d] = True
    walks = int(np.trace(np.linalg.matrix_power(adj.astype(np.int64), 3)))
    trans = 0
    for a, b in zip(s.tolist(), d.tolist()):
        # ordered paths a->m->b closed by the shortcut a->b
        trans += int(np.count_nonzero(adj[a] & adj[:, b]))
    got = triad_census(
        rd.from_arrow(pa.table({"src": s, "dst": d})).repartition(parts), n
    )
    vals = dict(
        zip(got.column("motif").to_pylist(), got.column("cnt").to_pylist())
    )
    assert vals["cycle"] == walks // 3
    assert vals["transitive"] == trans


@given(st.integers(0, 2**31 - 1), st.integers(2, 60))
@_settings
def test_skyline_matches_bruteforce(ray_session, seed, n):
    import pyarrow as pa
    import ray.data as rd

    from fogray.datapipes.relational import skyline

    rng = np.random.default_rng(seed)
    size = rng.integers(1, 8, n).astype(np.int32)
    price = (rng.integers(100, 900, n) / 100.0).astype(np.float64)
    t = pa.table(
        {
            "id": np.arange(n, dtype=np.int64),
            "sz": size,
            "pr": price,
        }
    )
    got = skyline(
        rd.from_arrow(t).repartition(4), id_col="id", max_col="sz", min_col="pr"
    )
    cents = np.round(price * 100).astype(np.int64)
    keep = []
    for i in range(n):
        dominated = np.any(
            (size >= size[i])
            & (cents <= cents[i])
            & ((size > size[i]) | (cents < cents[i]))
        )
        if not dominated:
            keep.append(i)
    assert got.column("id").to_pylist() == keep


@given(graphs())
@_settings
def test_sharded_incremental_cc_matches_broadcast(ray_session, g):
    """Property parity: on ANY random graph (self-loops, duplicates,
    isolated vertices) the range-sharded incremental CC lands on the
    same labels, touched set and per-batch stats as the broadcast
    original — partition count drawn from the same strategy."""
    from fogray import incremental, sharded

    src, dst, _w, n, parts = g
    s2, d2 = np.r_[src, dst], np.r_[dst, src]
    lab_a, touched_a, stats_a = incremental.incremental_cc((s2, d2), n, num_batches=3)
    lab_b, touched_b, stats_b = sharded.incremental_cc_sharded(
        (s2, d2), n, num_batches=3, num_partitions=parts
    )
    np.testing.assert_array_equal(lab_a, lab_b)
    np.testing.assert_array_equal(touched_a, touched_b)
    assert stats_a == stats_b


@given(graphs())
@_settings
def test_sharded_matching_is_maximal_and_matches(ray_session, g):
    """Property parity + maximality: sharded matching equals the
    broadcast original, pairs are vertex-disjoint, and no live edge
    remains between two unmatched vertices (maximality)."""
    from fogray import matching, sharded

    src, dst, _w, n, parts = g
    s2, d2 = np.r_[src, dst], np.r_[dst, src]
    a = matching.greedy_matching((s2, d2), n).to_pandas()
    b = sharded.greedy_matching_sharded(
        (s2, d2), n, num_partitions=parts
    ).to_pandas()
    assert a.values.tolist() == b.values.tolist()
    used = np.zeros(n, dtype=bool)
    flat = np.r_[b["a"].to_numpy(), b["b"].to_numpy()].astype(np.int64)
    assert len(flat) == len(np.unique(flat))
    used[flat] = True
    m = src != dst
    assert not (~used[src[m]] & ~used[dst[m]]).any(), "unmatched live edge left"


@given(graphs())
@_settings
def test_sharded_temporal_matches_broadcast(ray_session, g):
    """Property parity: sharded temporal earliest arrival equals the
    broadcast original on any random temporal graph (times derived
    deterministically from the weight strategy)."""
    from fogray import sharded, temporal

    src, dst, w, n, parts = g
    tt = (w * 3).astype(np.int64)
    a_arr, a_reached = temporal.temporal_earliest_arrival((src, dst, tt), n, 0)
    b_arr, b_reached = sharded.temporal_earliest_arrival_sharded(
        (src, dst, tt), n, 0, num_partitions=parts
    )
    np.testing.assert_array_equal(a_arr, b_arr)
    np.testing.assert_array_equal(a_reached, b_reached)


@given(graphs())
@_settings
def test_sharded_coloring_is_proper_and_matches(ray_session, g):
    """Property parity + properness on simple random graphs: sharded
    JP equals broadcast JP and no edge joins equal colors."""
    from fogray import coloring, sharded

    src, dst, _w, n, parts = g
    m = src != dst
    if not m.any():
        return
    s2, d2 = np.r_[src[m], dst[m]], np.r_[dst[m], src[m]]
    a = coloring.jones_plassmann((s2, d2), n).to_pandas()
    b = sharded.jones_plassmann_sharded(
        (s2, d2), n, num_partitions=parts
    ).to_pandas()
    assert a.values.tolist() == b.values.tolist()
    col = np.full(n, -5, dtype=np.int64)
    col[b["vid"].to_numpy()] = b["color"].to_numpy()
    assert (col[s2] != col[d2]).all()
