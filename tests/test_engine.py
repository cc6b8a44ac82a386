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
