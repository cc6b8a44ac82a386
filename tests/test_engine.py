"""Distributed engine vs pure-numpy FOG-semantics oracles on every F2
toy graph plus seeded random digraphs — the allclose(1e-6)/exact gate."""

import numpy as np
import pytest

from fogray import algorithms as alg
from fogray import fixtures as fx
from fogray import oracle as orc
from fogray.config import EngineConfig
from fogray.engine import GraphEngine, expand_ranges

GRAPHS = list(fx.ALL_TOYS.keys()) + ["random64", "random256"]


def load_graph(name):
    if name == "random64":
        return fx.random_graph(64, 0.08, seed=11)
    if name == "random256":
        return fx.random_graph(256, 0.03, seed=23)
    return fx.ALL_TOYS[name]()


@pytest.fixture(scope="module")
def engines(ray_session):
    """One GraphEngine per fixture graph, shared across algorithm tests
    (actors pinned once — the whole point of the design)."""
    cache = {}
    for name in GRAPHS:
        src, dst, w, n = load_graph(name)
        cache[name] = (
            GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=3)),
            (src, dst, w, n),
        )
    yield cache
    for eng, _ in cache.values():
        eng.shutdown()


def test_expand_ranges():
    starts = np.array([0, 5, 5, 9])
    ends = np.array([3, 5, 8, 10])
    assert expand_ranges(starts, ends).tolist() == [0, 1, 2, 5, 6, 7, 9]
    assert len(expand_ranges(np.array([], dtype=int), np.array([], dtype=int))) == 0


def test_degrees(engines):
    for name, (eng, (src, dst, w, n)) in engines.items():
        assert eng.num_edges == len(src), name
        np.testing.assert_array_equal(eng.outdeg, np.bincount(src, minlength=n))
        np.testing.assert_array_equal(eng.indeg, np.bincount(dst, minlength=n))


@pytest.mark.parametrize("name", GRAPHS)
def test_pagerank(engines, name):
    eng, (src, dst, w, n) = engines[name]
    res = alg.pagerank(eng, niters=10)
    expected = orc.pagerank_fog(src, dst, n, niters=10)
    np.testing.assert_allclose(res.state["rank"], expected, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", GRAPHS)
def test_cc(engines, name):
    eng, (src, dst, w, n) = engines[name]
    res = alg.connected_components(eng)
    expected = orc.wcc_fog(src, dst, n)
    np.testing.assert_array_equal(res.state["component_root"].astype(np.int64), expected)


@pytest.mark.parametrize("name", GRAPHS)
def test_label_propagation(engines, name):
    eng, (src, dst, w, n) = engines[name]
    res = alg.label_propagation(eng)
    np.testing.assert_array_equal(
        res.state["component_root"].astype(np.int64), orc.wcc_fog(src, dst, n)
    )


@pytest.mark.parametrize("name", GRAPHS)
def test_bfs(engines, name):
    eng, (src, dst, w, n) = engines[name]
    root = int(src[0])
    res = alg.bfs(eng, root=root)
    expected = orc.bfs_fog(src, dst, n, root=root)
    np.testing.assert_array_equal(
        res.state["bfs_level"].astype(np.uint64), expected
    )


@pytest.mark.parametrize("name", GRAPHS)
def test_sssp(engines, name):
    eng, (src, dst, w, n) = engines[name]
    source = int(src[0])
    res = alg.sssp(eng, source=source)
    eval_, epred = orc.sssp_fog(src, dst, w, n, source=source)
    np.testing.assert_allclose(res.state["value"], eval_, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        res.state["predecessor"].astype(np.uint64), epred
    )


@pytest.mark.parametrize("name", GRAPHS)
def test_spmv(engines, name):
    eng, (src, dst, w, n) = engines[name]
    res = alg.spmv(eng)
    x, y = orc.spmv_fog(src, dst, w, n)
    np.testing.assert_allclose(res.state["spmv_value"], y, rtol=1e-6, atol=1e-6)
    assert res.supersteps == 1


@pytest.mark.parametrize("name", GRAPHS)
def test_scc(engines, name):
    eng, (src, dst, w, n) = engines[name]
    res = alg.scc(eng)
    expected = orc.scc_fog(src, dst, n)
    np.testing.assert_array_equal(
        res.state["component_root"].astype(np.int64), expected, err_msg=name
    )
    assert (res.state["found"] == 1).all()


def test_sparse_combine_path(ray_session):
    """Force the sparse (ids, vals) exchange path (dense_threshold=0) and
    check PageRank still matches — this is the V-too-big-for-dense mode."""
    src, dst, w, n = fx.random_graph(128, 0.05, seed=5)
    eng = GraphEngine(
        n,
        arrays=(src, dst, w),
        cfg=EngineConfig(num_partitions=3, dense_threshold=0),
    )
    try:
        res = alg.pagerank(eng, niters=5)
        np.testing.assert_allclose(
            res.state["rank"], orc.pagerank_fog(src, dst, n, 5), rtol=1e-6
        )
    finally:
        eng.shutdown()


def test_frontier_range_path(ray_session):
    """Force the CSR range-expansion scatter (mask cutoff=1.0 so every
    frontier uses active_ids) and check BFS/CC still match."""
    src, dst, w, n = fx.random_graph(96, 0.05, seed=9)
    eng = GraphEngine(
        n,
        arrays=(src, dst, w),
        cfg=EngineConfig(num_partitions=4, frontier_mask_cutoff=1.0),
    )
    try:
        res = alg.bfs(eng, root=0)
        np.testing.assert_array_equal(
            res.state["bfs_level"].astype(np.uint64), orc.bfs_fog(src, dst, n, 0)
        )
        res2 = alg.connected_components(eng)
        np.testing.assert_array_equal(
            res2.state["component_root"].astype(np.int64), orc.wcc_fog(src, dst, n)
        )
    finally:
        eng.shutdown()


def test_dataset_streaming_construction(ray_session):
    """GraphEngine(dataset=...) builds actors from SORTED BLOCKS (the
    driver holds only refs); block key spans may overlap mid-vertex and
    the gather must settle the duplicates. Multi-block input forces the
    straddle case."""
    import pyarrow as pa
    import ray.data as rd

    src, dst, w, n = fx.random_graph(200, 0.05, seed=77)
    t = pa.table({"src": src, "dst": dst, "weight": w})
    chunk = max(1, len(t) // 7)
    ds = rd.from_arrow([t.slice(i * chunk, chunk) for i in range((len(t) + chunk - 1) // chunk)])
    eng = GraphEngine(n, dataset=ds, cfg=EngineConfig(num_partitions=4))
    try:
        assert eng.num_edges == len(src)
        np.testing.assert_array_equal(eng.outdeg, np.bincount(src, minlength=n))
        res = alg.pagerank(eng, niters=6)
        np.testing.assert_allclose(
            res.state["rank"], orc.pagerank_fog(src, dst, n, 6), rtol=1e-6
        )
        res2 = alg.connected_components(eng)
        np.testing.assert_array_equal(
            res2.state["component_root"].astype(np.int64), orc.wcc_fog(src, dst, n)
        )
        res3 = alg.sssp(eng, source=int(src[0]))
        ev, ep = orc.sssp_fog(src, dst, w, n, source=int(src[0]))
        np.testing.assert_allclose(res3.state["value"], ev, rtol=1e-6)
    finally:
        eng.shutdown()


def test_single_vertex_no_edges(ray_session):
    eng = GraphEngine(
        3,
        arrays=(np.array([0]), np.array([0]), np.array([1.0])),
        cfg=EngineConfig(num_partitions=2),
    )
    try:
        res = alg.connected_components(eng)  # self-loop only: TARGET skips it
        assert res.state["component_root"].astype(int).tolist() == [0, 1, 2]
        pr = alg.pagerank(eng, niters=2)  # GLOBAL counts the self-loop
        np.testing.assert_allclose(
            pr.state["rank"],
            orc.pagerank_fog(np.array([0]), np.array([0]), 3, 2),
            rtol=1e-6,
        )
    finally:
        eng.shutdown()


def _symmetric_random(n=96, p=0.08, seed=31):
    src, dst, w, nn = fx.random_graph(n, p, seed=seed)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    keep = s2 != d2
    s2, d2 = s2[keep], d2[keep]
    order = np.lexsort((d2, s2))
    s2, d2 = s2[order], d2[order]
    first = np.r_[True, (s2[1:] != s2[:-1]) | (d2[1:] != d2[:-1])]
    return s2[first], d2[first], np.ones(first.sum()), nn


def test_ppr_matches_numpy_oracle(ray_session):
    src, dst, w, n = fx.random_graph(128, 0.06, seed=7)
    source = int(src[0])

    def ppr_ref(iters=10):
        r = np.zeros(n)
        r[source] = 1.0
        outdeg = np.bincount(src, minlength=n).astype(np.float64)
        for _ in range(iters):
            vals = 0.85 * r[src] / outdeg[src] + 0.15 * (dst == source)
            r = r + np.bincount(dst, weights=vals, minlength=n)
        return r

    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=3))
    try:
        res = alg.ppr(eng, source, niters=10)
        np.testing.assert_allclose(res.state["rank"], ppr_ref(), rtol=1e-9)
    finally:
        eng.shutdown()


def test_kcore_matches_peeling_oracle(ray_session):
    src, dst, w, n = _symmetric_random()

    def peel(k):
        alive = np.ones(n, dtype=bool)
        while True:
            cnt = np.bincount(dst[alive[src]], minlength=n)
            new = alive & (cnt >= k)
            if (new == alive).all():
                return alive
            alive = new

    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=3))
    try:
        for k in (2, 4, 8):
            res = alg.kcore(eng, k)
            got = res.state["alive"].astype(bool)
            np.testing.assert_array_equal(got, peel(k))
            # the driver-query oracle runs a FIXED 32 recursion rounds;
            # the engine must converge within that bound
            assert res.supersteps <= 32
    finally:
        eng.shutdown()


def test_degree_bounds_properties():
    from fogray.engine import _degree_bounds

    rng = np.random.RandomState(3)
    outdeg = rng.poisson(4, 1000).astype(np.int64)
    indeg = rng.poisson(4, 1000).astype(np.int64)
    for p in (1, 2, 7, 32):
        b = _degree_bounds(outdeg, indeg, 1000, p)
        assert b[0] == 0 and b[-1] == 1000
        assert (np.diff(b) > 0).all()  # strictly increasing => nonempty ranges
        assert len(b) - 1 <= p
    # degenerate single-vertex space
    b = _degree_bounds(np.zeros(1, np.int64), np.zeros(1, np.int64), 1, 4)
    assert b[0] == 0 and b[-1] == 1


def test_bucket_block_partitions_exactly(ray_session):
    """_bucket_block's 2p pieces are a partition of the block: the fwd
    pieces split rows by dst range, the bwd pieces by src range, and
    concatenating either side restores the block's multiset of rows."""
    import pyarrow as pa
    import ray

    from fogray.engine import _bucket_block

    rng = np.random.RandomState(5)
    t = pa.table(
        {
            "src": rng.randint(0, 100, 500).astype(np.int64),
            "dst": rng.randint(0, 100, 500).astype(np.int64),
            "weight": np.ones(500),
        }
    )
    bounds = np.array([0, 10, 37, 90, 100], dtype=np.int64)
    p = len(bounds) - 1
    pieces = ray.get(list(_bucket_block.options(num_returns=2 * p).remote(t, bounds)))
    assert len(pieces) == 2 * p
    for side, key in ((pieces[:p], "dst"), (pieces[p:], "src")):
        rows = 0
        for j, piece in enumerate(side):
            k = piece.column(key).to_numpy(zero_copy_only=False)
            assert ((k >= bounds[j]) & (k < bounds[j + 1])).all()
            rows += piece.num_rows
        assert rows == t.num_rows
        cat = pa.concat_tables(side)
        got = sorted(zip(*[cat.column(c).to_pylist() for c in ("src", "dst")]))
        want = sorted(zip(*[t.column(c).to_pylist() for c in ("src", "dst")]))
        assert got == want


def test_dataset_hub_split_exact(ray_session):
    """One vertex owning most in-edges forces the hub split (multiple
    actors share one emission range); results stay exact."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.RandomState(9)
    n = 64
    src = rng.randint(0, n, 4000).astype(np.int64)
    dst = np.concatenate(
        [np.full(3200, 7, dtype=np.int64), rng.randint(0, n, 800).astype(np.int64)]
    )
    w = np.ones(len(src))
    t = pa.table({"src": src, "dst": dst, "weight": w})
    chunk = len(src) // 5
    ds = rd.from_arrow([t.slice(i * chunk, chunk) for i in range(6) if i * chunk < len(src)])
    eng = GraphEngine(n, dataset=ds, cfg=EngineConfig(num_partitions=4))
    try:
        # the hub range must actually be served by >1 actor
        from collections import Counter

        spans = Counter((lo, hi) for _a, lo, hi in eng.fwd_views)
        assert max(spans.values()) > 1
        res = alg.pagerank(eng, niters=5)
        np.testing.assert_allclose(
            res.state["rank"], orc.pagerank_fog(src, dst, n, 5), rtol=1e-6
        )
        res2 = alg.connected_components(eng)
        np.testing.assert_array_equal(
            res2.state["component_root"].astype(np.int64), orc.wcc_fog(src, dst, n)
        )
    finally:
        eng.shutdown()


def test_combine_duplicates_hub_split_cross_block(ray_session):
    """Hub-split (k>1) + combine_duplicates: duplicate (src, dst) pairs
    placed in DIFFERENT dataset blocks must still collapse to one edge
    with summed weight — sub-actors are routed by read-key hash, not
    block subset, so every copy of a pair co-locates. Degrees, edge
    count and PageRank must match the pre-aggregated build exactly."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.RandomState(21)
    n = 64
    # a dst hub (vertex 7) owning most in-edges forces the hub split;
    # every hub edge is DUPLICATED and the two copies are interleaved
    # so slicing into blocks separates them
    hub_src = rng.randint(0, n, 1600).astype(np.int64)
    base_src = np.concatenate([hub_src, rng.randint(0, n, 400).astype(np.int64)])
    base_dst = np.concatenate(
        [np.full(1600, 7, dtype=np.int64), rng.randint(0, n, 400).astype(np.int64)]
    )
    order = rng.permutation(np.repeat(np.arange(len(base_src)), 2))
    src, dst = base_src[order], base_dst[order]
    w = np.ones(len(src), dtype=np.float64)
    t = pa.table({"src": src, "dst": dst, "weight": w})
    chunk = len(src) // 8
    ds = rd.from_arrow(
        [t.slice(i * chunk, chunk) for i in range(9) if i * chunk < len(src)]
    )
    eng_b = GraphEngine(
        n, dataset=ds, cfg=EngineConfig(num_partitions=4), combine_duplicates=True
    )
    # aggregated ground truth: each distinct (src, dst) once, weight = copies
    import pandas as pd

    agg = (
        pd.DataFrame({"src": src, "dst": dst, "weight": w})
        .groupby(["src", "dst"], as_index=False)["weight"]
        .sum()
    )
    eng_a = GraphEngine(
        n,
        arrays=(
            agg["src"].to_numpy(),
            agg["dst"].to_numpy(),
            agg["weight"].to_numpy(),
        ),
        cfg=EngineConfig(num_partitions=4),
    )
    try:
        from collections import Counter

        spans = Counter((lo, hi) for _a, lo, hi in eng_b.fwd_views)
        assert max(spans.values()) > 1, "hub range must be split across actors"
        assert eng_b.num_edges == eng_a.num_edges == len(agg)
        np.testing.assert_array_equal(eng_b.outdeg, eng_a.outdeg)
        np.testing.assert_array_equal(eng_b.indeg, eng_a.indeg)
        ra = alg.pagerank(eng_a, niters=6)
        rb = alg.pagerank(eng_b, niters=6)
        np.testing.assert_allclose(
            ra.state["rank"], rb.state["rank"], rtol=1e-12, atol=1e-12
        )
        wsum = np.bincount(
            agg["src"].to_numpy(),
            weights=agg["weight"].to_numpy(),
            minlength=n,
        )
        wa = alg.wpagerank(eng_a, wsum, niters=5)
        wb = alg.wpagerank(eng_b, wsum, niters=5)
        np.testing.assert_allclose(
            wa.state["rank"], wb.state["rank"], rtol=1e-12, atol=1e-12
        )
    finally:
        eng_a.shutdown()
        eng_b.shutdown()


def test_gather_plan_matches_naive():
    from fogray.dist_engine import _GatherPlan, _ShardedField

    rng = np.random.RandomState(13)
    n = 500
    bounds = np.array([0, 100, 101, 350, 500], dtype=np.int64)
    full = rng.rand(n)
    slices = [full[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
    key = rng.randint(0, n, 10_000).astype(np.int64)
    plan = _GatherPlan(key, bounds)
    np.testing.assert_array_equal(plan.gather(slices), full[key])
    # the planned field and the generic field agree; plan only fires on
    # the exact key object
    f = _ShardedField(slices, bounds, plan)
    np.testing.assert_array_equal(f[key], full[key])
    other = key[: len(key) // 2].copy()
    np.testing.assert_array_equal(f[other], full[other])
    # empty key
    ek = np.empty(0, dtype=np.int64)
    assert len(_GatherPlan(ek, bounds).gather(slices)) == 0


def test_mis_independent_and_maximal(ray_session):
    """Deterministic-Luby MIS on a symmetric random graph: no two
    adjacent members, every non-member has a member neighbor
    (independence + maximality — valid once converged, which 12 rounds
    comfortably reaches at n=96), and the result is deterministic."""
    src, dst, w, n = _symmetric_random(n=96, p=0.08, seed=41)
    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=3))
    try:
        res = alg.mis(eng, rounds=12)
        status = res.state["status"]
        touched = (eng.outdeg > 0) | (eng.indeg > 0)
        assert not (touched & (status == 0.0)).any(), "unconverged at n=96"
        in_mis = status == 1.0
        assert not (in_mis[src] & in_mis[dst]).any(), "adjacent MIS members"
        covered = np.zeros(n, dtype=bool)
        covered[dst[in_mis[src]]] = True
        assert (covered | in_mis | ~touched).all(), "excluded vertex with no MIS neighbor"
        res2 = alg.mis(eng, rounds=12)
        np.testing.assert_array_equal(status, res2.state["status"])
    finally:
        eng.shutdown()


def test_betweenness_matches_numpy_brandes(ray_session):
    """Engine Brandes (sampled sources, level supersteps) vs a direct
    per-source numpy Brandes on a symmetric random graph whose diameter
    is far below the truncation cap."""
    src, dst, w, n = _symmetric_random(n=80, p=0.1, seed=13)
    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=3))
    try:
        sources = np.flatnonzero(eng.outdeg > 0)[:4]
        res = alg.betweenness(eng, num_sources=4, max_level=6)

        adj = [dst[src == v] for v in range(n)]
        bc_ref = np.zeros(n)
        for s0 in sources:
            from collections import deque

            lv = np.full(n, -1)
            sig = np.zeros(n)
            lv[s0], sig[s0] = 0, 1.0
            order, q = [], deque([int(s0)])
            while q:
                v = q.popleft()
                order.append(v)
                for u in adj[v]:
                    if lv[u] < 0:
                        lv[u] = lv[v] + 1
                        q.append(u)
                    if lv[u] == lv[v] + 1:
                        sig[u] += sig[v]
            delta = np.zeros(n)
            for v in reversed(order):
                for u in adj[v]:
                    if lv[u] == lv[v] + 1:
                        delta[v] += (sig[v] / sig[u]) * (1.0 + delta[u])
            m = lv >= 1
            bc_ref[m] += delta[m]
        np.testing.assert_allclose(res.state["bc"], bc_ref, rtol=1e-9, atol=1e-6)
    finally:
        eng.shutdown()


def test_combine_duplicates_build_matches_aggregated(ray_session):
    """The engine-feed derive path (aggregate=False + engine
    combine_duplicates=True) must produce the same degrees, edge count,
    weights, and per-vertex PageRank as deriving aggregated edges and
    building normally — the fold of derive's (src, dst) sort into the
    bucketed exchange changes only WHERE pairs collapse, not what the
    engine holds."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from fogray import algorithms as alg
    from fogray import derive, tables
    from fogray.config import EngineConfig
    from fogray.engine import GraphEngine

    t = tables.make_repo_table(4000, 80, seed=9)
    src = rd.from_arrow(t)
    res_a = derive.derive_edges(src)
    eng_a = GraphEngine(
        res_a["num_vertices"], dataset=res_a["edges"].materialize(),
        cfg=EngineConfig(num_partitions=4),
    )
    src2 = rd.from_arrow(t)
    res_b = derive.derive_edges(src2, aggregate=False)
    eng_b = GraphEngine(
        res_b["num_vertices"], dataset=res_b["edges"].materialize(),
        cfg=EngineConfig(num_partitions=4), combine_duplicates=True,
    )
    try:
        assert eng_a.num_edges == eng_b.num_edges
        assert np.array_equal(eng_a.outdeg, eng_b.outdeg)
        assert np.array_equal(eng_a.indeg, eng_b.indeg)
        ra = alg.pagerank(eng_a, niters=10)
        rb = alg.pagerank(eng_b, niters=10)
        np.testing.assert_allclose(
            ra.state["rank"], rb.state["rank"], rtol=1e-12, atol=1e-12
        )
        # weighted variant exercises the combined-path weight sums
        et = pa.concat_tables(
            ray.get(res_a["edges"].materialize().to_arrow_refs()),
            promote_options="default",
        )
        wsum = np.bincount(
            et.column("src").to_numpy(zero_copy_only=False),
            weights=et.column("weight").to_numpy(zero_copy_only=False),
            minlength=res_a["num_vertices"],
        )
        wa = alg.wpagerank(eng_a, wsum, niters=6)
        wb = alg.wpagerank(eng_b, wsum, niters=6)
        np.testing.assert_allclose(
            wa.state["rank"], wb.state["rank"], rtol=1e-12, atol=1e-12
        )
    finally:
        eng_a.shutdown()
        eng_b.shutdown()
