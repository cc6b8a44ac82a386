"""Sanity checks for the FOG-semantics oracles themselves (known-by-
construction expectations, FIXTURES.md F2/F3)."""

import numpy as np
import pytest

from fogray import fixtures as fx
from fogray import oracle as orc


def test_pagerank_per_edge_teleport_star():
    # hub has in-degree k: rank(hub) after 1 iter = 1 + sum(0.85*1/1 + 0.15)
    # over k spokes = 1 + k*1.0 (pagerank.hpp:75-76 per-edge teleport)
    k = 50
    src, dst, w, n = fx.star_hub(k)
    r = orc.pagerank_fog(src, dst, n, niters=1)
    assert r[0] == pytest.approx(1.0 + k * (0.85 * 1.0 / 1 + 0.15))
    # spoke: receives one update from hub with outdeg k
    assert r[1] == pytest.approx(1.0 + 0.85 * 1.0 / k + 0.15)


def test_pagerank_accumulates_monotonically():
    src, dst, w, n = fx.cycle4()
    r1 = orc.pagerank_fog(src, dst, n, niters=1)
    r2 = orc.pagerank_fog(src, dst, n, niters=2)
    assert (r2 > r1).all()  # no reset between iterations (pagerank.hpp:105)


def test_pagerank_selfloops_counted():
    src, dst, w, n = fx.selfloops()
    r = orc.pagerank_fog(src, dst, n, niters=1)
    # vertex 0: edges 0->0, 0->1 (outdeg 2). incoming to 0: 0->0 and 2->0
    expected0 = 1.0 + (0.85 * 1.0 / 2 + 0.15) + (0.85 * 1.0 / 1 + 0.15)
    assert r[0] == pytest.approx(expected0)
    # vertex 3 has only a self-loop: sends to itself
    assert r[3] == pytest.approx(1.0 + 0.85 + 0.15)


def test_wcc_two_cliques_bridge():
    src, dst, w, n = fx.two_cliques_bridge()
    labels = orc.wcc_fog(src, dst, n)
    assert (labels == 0).all()
    assert orc.component_count(labels) == 1


def test_wcc_isolated():
    src, dst, w, n = fx.isolated()
    labels = orc.wcc_fog(src, dst, n)
    assert labels[3] == 3 and labels[5] == 5
    assert labels[0] == labels[1] == labels[2] == labels[4] == 0
    assert orc.component_count(labels) == 3


def test_bfs_path():
    src, dst, w, n = fx.path5()
    lv = orc.bfs_fog(src, dst, n, root=0)
    assert lv.tolist() == [0, 1, 2, 3, 4]
    lv2 = orc.bfs_fog(src, dst, n, root=2)
    assert lv2[0] == orc.UNREACHED and lv2[4] == 2


def test_sssp_path():
    src, dst, w, n = fx.path5()
    val, pred = orc.sssp_fog(src, dst, w, n, source=0)
    assert val[0] == 0
    assert val[4] == pytest.approx(w.sum())
    assert pred[4] == 3 and pred[0] == orc.UNREACHED


def test_sssp_epsilon_guard():
    # two paths to 2: direct weight 1.0 vs via 1 with total 1.0005 —
    # within EPSILON, the first accepted value survives the guard
    src = np.array([0, 0, 1])
    dst = np.array([2, 1, 2])
    w = np.array([1.0005, 0.5, 0.5005])
    val, pred = orc.sssp_fog(src, dst, w, 3, source=0)
    # superstep 1: 2 gets 1.0005 (direct), 1 gets 0.5
    # superstep 2: candidate 1.0005 via 1 — FLOAT_EQ -> rejected
    assert val[2] == pytest.approx(1.0005)
    assert pred[2] == 0


def test_scc_known():
    src, dst, w, n = fx.sccs_graph()
    roots = orc.scc_fog(src, dst, n)
    assert roots.tolist() == [0, 0, 0, 3, 3, 3, 6, 7]


def test_scc_cycle_vs_path():
    src, dst, w, n = fx.cycle4()
    assert orc.scc_fog(src, dst, n).tolist() == [0, 0, 0, 0]
    src, dst, w, n = fx.path5()
    assert orc.scc_fog(src, dst, n).tolist() == [0, 1, 2, 3, 4]


def test_spmv():
    src, dst, w, n = fx.dup_edges()
    x, y = orc.spmv_fog(src, dst, w, n)
    assert y[1] == pytest.approx(w[0] + w[1] + w[2])  # duplicates all counted
    assert y[0] == pytest.approx(w[5])


def test_triangles():
    src, dst, w, n = fx.triangles_graph()
    assert orc.triangle_count_bruteforce(src, dst, n) == 2
    src, dst, w, n = fx.two_cliques_bridge()
    # each K4 has C(4,3)=4 triangles
    assert orc.triangle_count_bruteforce(src, dst, n) == 8
    src, dst, w, n = fx.selfloops()
    assert orc.triangle_count_bruteforce(src, dst, n) == 1


def test_wcc_matches_networkx_style_bruteforce_random():
    src, dst, w, n = fx.random_graph(64, 0.05, seed=3)
    labels = orc.wcc_fog(src, dst, n)
    # brute force: repeated min-label relaxation to fixpoint
    ref = np.arange(n)
    for _ in range(n):
        prev = ref.copy()
        for u, v in zip(src, dst):
            m = min(ref[u], ref[v])
            ref[u] = ref[v] = m
        if (prev == ref).all():
            break
    # ref is an upper bound fixpoint of symmetric relaxation
    assert (labels == ref).all()
