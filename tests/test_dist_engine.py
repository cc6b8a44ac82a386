"""Range-partitioned engine (fogray.dist_engine) vs the same
FOG-semantics oracles — every algorithm, plus hub-split/partition-shape
edge cases and dist-engine checkpoint/resume interop."""

import numpy as np
import pytest

from fogray import algorithms as alg
from fogray import fixtures as fx
from fogray import oracle as orc
from fogray.config import EngineConfig
from fogray.dist_engine import DistGraphEngine

GRAPHS = [
    "path5", "star_hub", "two_cliques_bridge", "selfloops", "isolated",
    "sccs", "random64", "random256",
]


def load_graph(name):
    if name == "random64":
        return fx.random_graph(64, 0.08, seed=11)
    if name == "random256":
        return fx.random_graph(256, 0.03, seed=23)
    return fx.ALL_TOYS[name]()


@pytest.fixture(scope="module")
def engines(ray_session):
    cache = {}
    for name in GRAPHS:
        src, dst, w, n = load_graph(name)
        cache[name] = (
            DistGraphEngine(
                n,
                arrays=(src, dst, w),
                cfg=EngineConfig(num_partitions=3),
                num_state_partitions=3,
            ),
            (src, dst, w, n),
        )
    yield cache
    for eng, _ in cache.values():
        eng.shutdown()


def test_partition_shapes(engines):
    for name, (eng, (src, dst, w, n)) in engines.items():
        assert eng.num_edges == len(src), name
        assert eng.bounds[0] == 0 and eng.bounds[-1] == n
        assert (np.diff(eng.bounds) > 0).all()
        meta = eng.edge_meta
        assert sum(m["fwd_edges"] for m in meta) == len(src)
        assert sum(m["bwd_edges"] for m in meta) == len(src)


@pytest.mark.parametrize("name", GRAPHS)
def test_pagerank(engines, name):
    eng, (src, dst, w, n) = engines[name]
    res = alg.pagerank(eng, niters=10)
    np.testing.assert_allclose(
        res.state["rank"], orc.pagerank_fog(src, dst, n, niters=10), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("name", GRAPHS)
def test_cc(engines, name):
    eng, (src, dst, w, n) = engines[name]
    res = alg.connected_components(eng)
    np.testing.assert_array_equal(
        res.state["component_root"].astype(np.int64), orc.wcc_fog(src, dst, n)
    )


@pytest.mark.parametrize("name", GRAPHS)
def test_bfs(engines, name):
    eng, (src, dst, w, n) = engines[name]
    root = int(src[0])
    res = alg.bfs(eng, root=root)
    np.testing.assert_array_equal(
        res.state["bfs_level"].astype(np.uint64), orc.bfs_fog(src, dst, n, root=root)
    )


@pytest.mark.parametrize("name", GRAPHS)
def test_sssp(engines, name):
    eng, (src, dst, w, n) = engines[name]
    source = int(src[0])
    res = alg.sssp(eng, source=source)
    eval_, epred = orc.sssp_fog(src, dst, w, n, source=source)
    np.testing.assert_allclose(res.state["value"], eval_, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(res.state["predecessor"].astype(np.uint64), epred)


@pytest.mark.parametrize("name", GRAPHS)
def test_spmv(engines, name):
    eng, (src, dst, w, n) = engines[name]
    res = alg.spmv(eng)
    _, y = orc.spmv_fog(src, dst, w, n)
    np.testing.assert_allclose(res.state["spmv_value"], y, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", GRAPHS)
def test_katz(engines, name):
    """Dist-engine parity for the second GLOBAL sum program beyond
    PageRank (fixed 8 iterations, dyadic alpha=1/256)."""
    eng, (src, dst, w, n) = engines[name]
    res = alg.katz(eng, niters=8)
    x = np.ones(n, dtype=np.float64)
    for _ in range(8):
        x = 1.0 + (1.0 / 256.0) * np.bincount(
            dst, weights=x[src], minlength=n
        )
    np.testing.assert_allclose(res.state["x"], x, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("name", GRAPHS)
def test_eigenvector(engines, name):
    """Dist-engine parity for unnormalized power iteration (exact
    integer walk counts from x0=1 — programs.EigenvectorCentrality)."""
    eng, (src, dst, w, n) = engines[name]
    res = alg.eigenvector(eng, niters=4)
    x = np.ones(n, dtype=np.float64)
    for _ in range(4):
        x = np.bincount(dst, weights=x[src], minlength=n)
    np.testing.assert_array_equal(res.state["x"], x)


@pytest.mark.parametrize("name", GRAPHS)
def test_ppr(engines, name):
    """Dist-engine parity for personalized PageRank (FOG pagerank
    mechanics seeded at one source, 10 fixed iterations)."""
    eng, (src, dst, w, n) = engines[name]
    source = int(src[0])
    res = alg.ppr(eng, source, niters=10)
    r = np.zeros(n)
    r[source] = 1.0
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    for _ in range(10):
        vals = 0.85 * r[src] / outdeg[src] + 0.15 * (dst == source)
        r = r + np.bincount(dst, weights=vals, minlength=n)
    np.testing.assert_allclose(res.state["rank"], r, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("name", GRAPHS)
def test_scc(engines, name):
    eng, (src, dst, w, n) = engines[name]
    res = alg.scc(eng)
    np.testing.assert_array_equal(
        res.state["component_root"].astype(np.int64), orc.scc_fog(src, dst, n),
        err_msg=name,
    )
    assert (res.state["found"] == 1).all()


def test_hub_edges_split_across_actors(ray_session):
    """A hub whose edge list exceeds one balanced span must be split
    across edge actors (skew-aware hub splitting) — and results must
    still match."""
    n = 40
    hub_dst = np.arange(1, n, dtype=np.int64)
    src = np.concatenate([np.zeros(n - 1, dtype=np.int64), hub_dst])
    dst = np.concatenate([hub_dst, np.zeros(n - 1, dtype=np.int64)])
    w = np.ones(len(src))
    eng = DistGraphEngine(
        n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=6),
        num_state_partitions=4,
    )
    try:
        # vertex 0 has 39 out-edges but spans hold ~13 edges each: the
        # hub's list MUST straddle >= 2 actors
        spans = [m["fwd_span"] for m in eng.edge_meta]
        first_owners = sum(1 for m in eng.edge_meta if m["fwd_edges"] > 0 and m["fwd_span"][0] == 0)
        assert first_owners >= 2, spans
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


def test_more_state_partitions_than_vertices(ray_session):
    src, dst, w, n = fx.ALL_TOYS["path5"]()
    eng = DistGraphEngine(
        n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=2),
        num_state_partitions=max(16, n * 2),
    )
    try:
        res = alg.bfs(eng, root=0)
        np.testing.assert_array_equal(
            res.state["bfs_level"].astype(np.uint64), orc.bfs_fog(src, dst, n, 0)
        )
    finally:
        eng.shutdown()


def test_dist_dataset_streaming_construction(ray_session):
    """DistGraphEngine(dataset=...): sorted blocks feed the edge actors
    directly (driver holds refs only); degrees from remote partials."""
    import pyarrow as pa
    import ray.data as rd

    src, dst, w, n = fx.random_graph(150, 0.06, seed=55)
    t = pa.table({"src": src, "dst": dst, "weight": w})
    chunk = max(1, len(t) // 5)
    ds = rd.from_arrow([t.slice(i * chunk, chunk) for i in range((len(t) + chunk - 1) // chunk)])
    eng = DistGraphEngine(n, dataset=ds, cfg=EngineConfig(num_partitions=3))
    try:
        assert eng.num_edges == len(src)
        np.testing.assert_array_equal(eng.outdeg, np.bincount(src, minlength=n))
        res = alg.pagerank(eng, niters=5)
        np.testing.assert_allclose(
            res.state["rank"], orc.pagerank_fog(src, dst, n, 5), rtol=1e-6
        )
        res2 = alg.bfs(eng, root=int(src[0]))
        np.testing.assert_array_equal(
            res2.state["bfs_level"].astype(np.uint64),
            orc.bfs_fog(src, dst, n, int(src[0])),
        )
    finally:
        eng.shutdown()


def test_dist_checkpoint_resume(ray_session, tmp_path):
    """Kill-after-superstep-k resume: a fresh dist engine continues from
    the per-partition shards and converges to the identical result."""
    src, dst, w, n = fx.random_graph(80, 0.06, seed=31)
    ck = str(tmp_path / "ck")
    eng = DistGraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=3))
    try:
        full = alg.pagerank(eng, niters=6, ckpt_dir=ck)
    finally:
        eng.shutdown()
    # resume from iter 3 in a brand-new engine with different sharding
    import shutil, os

    for d in sorted(os.listdir(ck)):
        if d.startswith("iter=") and int(d.split("=")[1]) > 3:
            shutil.rmtree(os.path.join(ck, d))
    with open(os.path.join(ck, "LATEST"), "w") as f:
        f.write("iter=000003")
    # same partitioning -> bit-identical result
    eng2 = DistGraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=3))
    try:
        res = alg.pagerank(eng2, niters=6, ckpt_dir=ck, resume=True)
    finally:
        eng2.shutdown()
    np.testing.assert_allclose(res.state["rank"], full.state["rank"], rtol=0, atol=0)
    # different edge/state partitioning -> identical up to fp summation
    # order (well inside the 1e-6 conformance bar)
    eng3 = DistGraphEngine(
        n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=5),
        num_state_partitions=4,
    )
    try:
        res3 = alg.pagerank(eng3, niters=6, ckpt_dir=ck, resume=True)
    finally:
        eng3.shutdown()
    np.testing.assert_allclose(res3.state["rank"], full.state["rank"], rtol=1e-12)


def test_dense_and_dist_checkpoints_interop(ray_session, tmp_path):
    """A checkpoint written by the broadcast engine resumes on the
    range-partitioned engine (same manifest/shard format)."""
    from fogray.engine import GraphEngine

    src, dst, w, n = fx.random_graph(60, 0.07, seed=41)
    ck = str(tmp_path / "ck2")
    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=2))
    try:
        full = alg.pagerank(eng, niters=6, ckpt_dir=ck)
    finally:
        eng.shutdown()
    import os, shutil

    for d in sorted(os.listdir(ck)):
        if d.startswith("iter=") and int(d.split("=")[1]) > 2:
            shutil.rmtree(os.path.join(ck, d))
    with open(os.path.join(ck, "LATEST"), "w") as f:
        f.write("iter=000002")
    eng2 = DistGraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=3))
    try:
        res = alg.pagerank(eng2, niters=6, ckpt_dir=ck, resume=True)
    finally:
        eng2.shutdown()
    # engines sum partials in different orders -> fp-order tolerance only
    np.testing.assert_allclose(res.state["rank"], full.state["rank"], rtol=1e-12)


def test_write_state_parquet(ray_session, tmp_path):
    import pyarrow.parquet as pq

    src, dst, w, n = fx.ALL_TOYS["two_cliques_bridge"]()
    eng = DistGraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=2))
    try:
        alg.connected_components(eng)
        metas = eng.write_state_parquet(str(tmp_path / "out"))
        assert sum(m["rows"] for m in metas) == n
        t = pq.read_table(str(tmp_path / "out"))
        assert len(t) == n
        got = t.sort_by("vid").column("component_root").to_numpy()
        np.testing.assert_array_equal(got.astype(np.int64), orc.wcc_fog(src, dst, n))
    finally:
        eng.shutdown()


def test_pull_mode_asymmetric_partitions(ray_session):
    """Round-2 pull-mode exchange (sum programs scatter their
    emission-target-sorted span): edge-partition count != state
    partition count exercises the span-overlap routing, where each
    edge actor returns partials only for the 1-2 state partitions its
    emission range covers."""
    src, dst, w, n = fx.random_graph(200, 0.05, seed=5)
    eng = DistGraphEngine(
        n,
        arrays=(src, dst, w),
        cfg=EngineConfig(num_partitions=7),
        num_state_partitions=3,
    )
    try:
        res = alg.pagerank(eng, niters=10)
        np.testing.assert_allclose(
            res.state["rank"], orc.pagerank_fog(src, dst, n, niters=10),
            rtol=1e-6, atol=1e-6,
        )
        _, y = orc.spmv_fog(src, dst, w, n)
        res2 = alg.spmv(eng)
        np.testing.assert_allclose(res2.state["spmv_value"], y, rtol=1e-6, atol=1e-6)
    finally:
        eng.shutdown()


def test_pull_mode_single_state_partition(ray_session):
    """P_state=1: scatter_pull's num_returns==1 path (bare tuple, not a
    tuple of tuples)."""
    src, dst, w, n = fx.random_graph(60, 0.1, seed=9)
    eng = DistGraphEngine(
        n,
        arrays=(src, dst, w),
        cfg=EngineConfig(num_partitions=4),
        num_state_partitions=1,
    )
    try:
        res = alg.pagerank(eng, niters=5)
        np.testing.assert_allclose(
            res.state["rank"], orc.pagerank_fog(src, dst, n, niters=5),
            rtol=1e-6, atol=1e-6,
        )
    finally:
        eng.shutdown()


def test_dist_parity_sf01_cooccurrence(ray_session):
    """Broadcast-vs-dist parity on the REAL sf0.1 co-occurrence graph
    (VERDICT r1 item 10): cc (integer state) must agree bit-for-bit;
    pagerank agrees to summation-order drift only (the broadcast
    resident loop's per-slice pipelined partials associate float adds
    differently than the dist engine's pull-mode fold — the
    dense_gather contract explicitly admits order drift, which the
    round-6 oracle gate absorbs; 1e-12 relative is ~6 orders tighter
    than that gate)."""
    from fogray import queries as q
    from fogray.engine import GraphEngine

    ds, n = q.cooccurrence_edges_ds("/root/testdata/sf0.1")
    bro = GraphEngine(n, dataset=ds, cfg=EngineConfig(num_partitions=4))
    dist = DistGraphEngine(n, dataset=ds, cfg=EngineConfig(num_partitions=4))
    try:
        cc_a = alg.connected_components(bro).state["component_root"]
        cc_b = alg.connected_components(dist).state["component_root"]
        np.testing.assert_array_equal(cc_a, cc_b)
        pr_a = alg.pagerank(bro, niters=5).state["rank"]
        pr_b = alg.pagerank(dist, niters=5).state["rank"]
        np.testing.assert_allclose(pr_a, pr_b, rtol=1e-12, atol=0)
    finally:
        bro.shutdown()
        dist.shutdown()


def test_dist_parity_sf01_scc_sequence(ray_session):
    """SCC parity dist vs broadcast on the sf0.1 directed sequence
    graph (multi-pass fwd/bwd coloring with re-init rules)."""
    import ray.data as rd

    from fogray import queries as q
    from fogray.engine import GraphEngine

    t = q.sequence_edges("/root/testdata/sf0.1")
    src = t.column("src").to_numpy(zero_copy_only=False)
    dst = t.column("dst").to_numpy(zero_copy_only=False)
    n = int(max(src.max(), dst.max())) + 1
    bro = GraphEngine(n, arrays=(src, dst, None), cfg=EngineConfig(num_partitions=4))
    dist = DistGraphEngine(n, arrays=(src, dst, None), cfg=EngineConfig(num_partitions=4))
    try:
        a = alg.scc(bro).state["component_root"]
        b = alg.scc(dist).state["component_root"]
        np.testing.assert_array_equal(a, b)
    finally:
        bro.shutdown()
        dist.shutdown()


@pytest.mark.parametrize("name", GRAPHS)
def test_wpagerank(engines, name):
    """Dist-engine parity for weighted PageRank (per-edge share scaled
    by weight over the source's out-weight sum, FOG mechanics)."""
    eng, (src, dst, w, n) = engines[name]
    wsum = np.bincount(src, weights=w, minlength=n)
    res = alg.wpagerank(eng, wsum, niters=10)
    r = np.ones(n, dtype=np.float64)
    ws = np.maximum(wsum, 1.0)
    for _ in range(10):
        vals = 0.85 * r[src] / ws[src] * w + 0.15
        r = r + np.bincount(dst, weights=vals, minlength=n)
    np.testing.assert_allclose(res.state["rank"], r, rtol=1e-9, atol=1e-9)
