"""Unit oracles for fogray.metrics (assortativity, Adamic-Adar) and
the A-ES weighted sample — independent numpy/brute-force checks on
small hand graphs plus layout-invariance under repartitioning."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from fogray.metrics import adamic_adar, degree_assortativity


def _edges_ds(src, dst, parts=3):
    t = pa.table(
        {
            "src": pa.array(np.asarray(src, dtype=np.int64)),
            "dst": pa.array(np.asarray(dst, dtype=np.int64)),
        }
    )
    return rd.from_arrow(t).repartition(parts)


def test_assortativity_matches_corrcoef(ray_session):
    rng = np.random.default_rng(7)
    n = 50
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    od = np.bincount(src, minlength=n)
    idg = np.bincount(dst, minlength=n)
    r = degree_assortativity(_edges_ds(src, dst), od, idg)
    want = np.corrcoef(od[src], idg[dst])[0, 1]
    assert r == pytest.approx(want, rel=1e-12)
    # layout invariance: exact same float at a different block count
    assert degree_assortativity(_edges_ds(src, dst, parts=7), od, idg) == r


def test_assortativity_degenerate(ray_session):
    # regular graph: zero variance on both marginals -> None (SQL NULL)
    src = [0, 1, 2, 3]
    dst = [1, 2, 3, 0]
    od = np.bincount(src, minlength=4)
    idg = np.bincount(dst, minlength=4)
    assert degree_assortativity(_edges_ds(src, dst), od, idg) is None


def _brute_aa(src, dst, n, k):
    """Brute-force common-neighbor / Adamic-Adar oracle."""
    adj = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = [len(a) for a in adj]
    rows = []
    for u in range(n):
        for v in range(u + 1, n):
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if not common:
                continue
            aa = sum(1.0 / math.log(deg[w]) for w in sorted(common))
            rows.append((u, v, len(common), aa))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


def test_adamic_adar_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    n = 30
    src = rng.integers(0, n, 120)
    dst = rng.integers(0, n, 120)
    out = adamic_adar(_edges_ds(src, dst), n, k=15).to_pandas()
    want = _brute_aa(src, dst, n, 15)
    assert len(out) == len(want)
    for i, (u, v, cn, aa) in enumerate(want):
        row = out.iloc[i]
        assert (row.u, row.v, row.cn, row.rk) == (u, v, cn, i + 1)
        assert row.aa == pytest.approx(aa, abs=2e-6)


def test_adamic_adar_sparse_path_matches_dense(ray_session):
    """Force the wedge-partial sort path (dense_max_vertices=0) and
    check it agrees exactly with the dense matmul path and brute
    force — both regimes must implement the same operator."""
    rng = np.random.default_rng(5)
    n = 25
    src = rng.integers(0, n, 90)
    dst = rng.integers(0, n, 90)
    dense = adamic_adar(_edges_ds(src, dst), n, k=12).to_pandas()
    sparse = adamic_adar(
        _edges_ds(src, dst), n, k=12, dense_max_vertices=0
    ).to_pandas()
    assert dense[["u", "v", "cn", "rk"]].values.tolist() == \
        sparse[["u", "v", "cn", "rk"]].values.tolist()
    assert np.allclose(dense["aa"], sparse["aa"], atol=2e-6)
    want = _brute_aa(src, dst, n, 12)
    assert [[r[0], r[1], r[2]] for r in want] == \
        dense[["u", "v", "cn"]].values.tolist()
    # cap agreement across regimes
    dc = adamic_adar(
        _edges_ds(src, dst), n, k=12, max_apex_degree=4
    ).to_pandas()
    sc = adamic_adar(
        _edges_ds(src, dst), n, k=12, max_apex_degree=4, dense_max_vertices=0
    ).to_pandas()
    assert dc[["u", "v", "cn", "rk"]].values.tolist() == \
        sc[["u", "v", "cn", "rk"]].values.tolist()


def test_link_predict_extra_scores_both_regimes(ray_session):
    """extra_scores=True (ra + pref) must agree between the dense CSR
    regime and the wedge-partial sort regime, and with brute force."""
    import math

    rng = np.random.default_rng(7)
    n = 28
    src = rng.integers(0, n, 100)
    dst = rng.integers(0, n, 100)
    dense = adamic_adar(_edges_ds(src, dst), n, k=10, extra_scores=True).to_pandas()
    sparse = adamic_adar(
        _edges_ds(src, dst), n, k=10, extra_scores=True, dense_max_vertices=0
    ).to_pandas()
    assert list(dense.columns) == ["u", "v", "cn", "aa", "ra", "pref", "rk"]
    assert dense[["u", "v", "cn", "pref", "rk"]].values.tolist() == \
        sparse[["u", "v", "cn", "pref", "rk"]].values.tolist()
    assert np.allclose(dense["ra"], sparse["ra"], atol=2e-6)
    # brute-force ra / pref for the winners
    adj = {u: set() for u in range(n)}
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {u: len(adj[u]) for u in range(n)}
    for row in dense.itertuples():
        common = adj[row.u] & adj[row.v]
        assert row.ra == pytest.approx(sum(1.0 / deg[w] for w in common), abs=2e-6)
        assert row.pref == deg[row.u] * deg[row.v]


def test_adamic_adar_apex_cap(ray_session):
    # star + one extra edge: hub 0 has degree 4; capping below that
    # removes every wedge through the hub
    src = [0, 0, 0, 0, 1]
    dst = [1, 2, 3, 4, 2]
    full = adamic_adar(_edges_ds(src, dst), 5, k=20).to_pandas()
    assert len(full) > 0
    capped = adamic_adar(
        _edges_ds(src, dst), 5, k=20, max_apex_degree=3
    ).to_pandas()
    # only wedges at apexes 1 / 2 (degree 2) survive; pairs through the
    # hub with no other common neighbor vanish
    assert set(map(tuple, capped[["u", "v"]].values)) <= set(
        map(tuple, full[["u", "v"]].values)
    )
    assert len(capped) < len(full)


def test_weighted_sample_matches_bruteforce(ray_session):
    from fogray.datapipes.relational import weighted_sample

    rng = np.random.default_rng(11)
    n = 1000
    keys = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 500, n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(keys), "w": pa.array(w)})

    def brute(k):
        h = np.array(
            [
                int(hashlib.md5(f"{x}:aes".encode()).hexdigest()[:16], 16)
                for x in keys
            ],
            dtype=np.uint64,
        )
        u = (h.astype(np.float64) + 0.5) / float(1 << 64)
        sk = np.log(u) / w.astype(np.float64)
        return set(keys[np.argsort(-sk)[:k]].tolist())

    got = weighted_sample(
        rd.from_arrow(t).repartition(5), key_col="doc_id", weight_col="w", k=50
    )
    assert set(got.column("doc_id").to_pylist()) == brute(50)
    # sorted output, weights carried through
    ids = got.column("doc_id").to_pylist()
    assert ids == sorted(ids)
    wmap = dict(zip(keys.tolist(), w.tolist()))
    assert got.column("w").to_pylist() == [wmap[i] for i in ids]
    # layout invariance
    got2 = weighted_sample(
        rd.from_arrow(t).repartition(13), key_col="doc_id", weight_col="w", k=50
    )
    assert got2.equals(got)


def test_weighted_sample_biases_toward_weight(ray_session):
    """Heavier rows must be sampled (much) more often: one row with
    1000x the weight of 999 peers should essentially always appear."""
    from fogray.datapipes.relational import weighted_sample

    n = 1000
    w = np.ones(n, dtype=np.int64)
    w[123] = 100_000
    t = pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64)), "w": pa.array(w)}
    )
    got = weighted_sample(
        rd.from_arrow(t).repartition(4), key_col="doc_id", weight_col="w", k=20
    )
    assert 123 in got.column("doc_id").to_pylist()


def test_two_hop_shuffle_matches_broadcast(ray_session):
    """The Dataset-native shuffle path (mid-sort cross-join + global
    key-sort distinct) must agree exactly with the broadcast-CSR chunk
    path and a brute-force python oracle, including 0-reach vertices
    with out-edges."""
    from fogray.metrics import two_hop_size

    rng = np.random.default_rng(17)
    n = 60
    src = rng.integers(0, n, 300).astype(np.int64)
    dst = rng.integers(0, n, 300).astype(np.int64)
    m = src != dst
    # distinct directed pairs (operator contract)
    keys = np.unique(src[m] * n + dst[m])
    src, dst = keys // n, keys % n
    bc = two_hop_size(_edges_ds(src, dst), n, closure="broadcast").to_pandas()
    sh = two_hop_size(_edges_ds(src, dst), n, closure="shuffle").to_pandas()
    assert bc.values.tolist() == sh.values.tolist()
    out = {}
    adj = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj.setdefault(s, set()).add(d)
    for v in sorted(adj):
        reach = set()
        for u in adj[v]:
            reach |= adj.get(u, set())
        reach.discard(v)
        out[v] = len(reach)
    assert dict(zip(bc.vid.tolist(), bc.two_hop.tolist())) == out


def test_four_cycles_bruteforce(ray_session):
    """four_cycles vs itertools enumeration on a random simple graph."""
    from itertools import combinations

    from fogray.metrics import four_cycles

    rng = np.random.default_rng(9)
    n = 14
    src = rng.integers(0, n, 60)
    dst = rng.integers(0, n, 60)
    adj = {u: set() for u in range(n)}
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    want = 0
    for u, v in combinations(range(n), 2):
        c = len(adj[u] & adj[v])
        want += c * (c - 1) // 2
    want //= 2
    got = four_cycles(_edges_ds(src, dst), n).column("c4")[0].as_py()
    assert got == want
    # sparse (wedge-sort) regime must agree with the dense chunk kernel
    got_sparse = four_cycles(
        _edges_ds(src, dst), n, dense_max_vertices=0
    ).column("c4")[0].as_py()
    assert got_sparse == want


# ---------------------------------------------------------------------------
# Borůvka MSF vs pure-python Kruskal (the unique MSF under strict
# (weight, a, b) order — the exactness oracle MSF's iterative
# contraction cannot get from SQL)
# ---------------------------------------------------------------------------


def _kruskal(n, edges_wab):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, a, b in sorted(edges_wab):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def _random_weighted_graph(seed, n, m):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, size=m)
    b = rng.integers(0, n, size=m)
    keep = a != b
    a, b = a[keep], b[keep]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    key = lo * n + hi
    _, idx = np.unique(key, return_index=True)
    lo, hi = lo[idx], hi[idx]
    # integer-valued double weights with deliberate TIES (mod 7) so the
    # strict (w, a, b) order is what disambiguates
    w = (rng.integers(1, 8, size=len(lo))).astype(np.float64)
    return lo, hi, w


@pytest.mark.parametrize("seed,n,m", [(1, 40, 120), (2, 200, 900), (3, 500, 3000)])
def test_boruvka_msf_matches_kruskal(ray_session, seed, n, m):
    from fogray.msf import boruvka_msf

    lo, hi, w = _random_weighted_graph(seed, n, m)
    # symmetric directed input, as the co-occurrence derivation emits
    src = np.r_[lo, hi]
    dst = np.r_[hi, lo]
    ww = np.r_[w, w]
    t = pa.table({"src": src, "dst": dst, "weight": ww})
    ds = rd.from_arrow(t).repartition(5)
    got = boruvka_msf(ds, n)
    want = _kruskal(n, list(zip(w.tolist(), lo.tolist(), hi.tolist())))
    got_rows = list(
        zip(
            got.column("a").to_pylist(),
            got.column("b").to_pylist(),
            got.column("weight").to_pylist(),
        )
    )
    assert got_rows == want


def test_boruvka_msf_empty_and_singleton(ray_session):
    from fogray.msf import boruvka_msf

    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "weight": pa.array([], pa.float64()),
        }
    )
    out = boruvka_msf(rd.from_arrow(empty), 4)
    assert out.num_rows == 0


# ---------------------------------------------------------------------------
# Jones-Plassmann coloring vs a pure-python replica of the same rounds
# ---------------------------------------------------------------------------


def _jp_replica(n, pairs, prio):
    """Sequential replay of the Jones-Plassmann rounds with identical
    winner and mex rules — the exactness oracle for the distributed
    implementation."""
    adj = {v: set() for v in set(x for p in pairs for x in p)}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    color = {v: -1 for v in adj}
    while any(c == -1 for c in color.values()):
        winners = [
            v
            for v in adj
            if color[v] == -1
            and all(color[w] != -1 or prio[w] < prio[v] for w in adj[v])
        ]
        assigned = {}
        for v in winners:
            used = {color[w] for w in adj[v] if color[w] != -1}
            c = 0
            while c in used:
                c += 1
            assigned[v] = c
        color.update(assigned)
    return color


def test_jones_plassmann_proper_and_deterministic(ray_session):
    from fogray.coloring import jones_plassmann
    from fogray.sources import det_weight

    rng = np.random.default_rng(7)
    n, m = 120, 500
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    a, b = a[keep], b[keep]
    src = np.r_[a, b].astype(np.int64)
    dst = np.r_[b, a].astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(5)
    got = jones_plassmann(ds, n)
    vids = got.column("vid").to_numpy(zero_copy_only=False)
    cols = got.column("color").to_numpy(zero_copy_only=False)
    cmap = dict(zip(vids.tolist(), cols.tolist()))
    # proper coloring: no edge monochromatic
    for x, y in zip(a.tolist(), b.tolist()):
        assert cmap[x] != cmap[y], (x, y)
    # deterministic
    got2 = jones_plassmann(
        rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(9), n
    )
    assert got.equals(got2)
    # exact round-replica match
    touched = np.unique(np.r_[a, b])
    h = det_weight(touched.astype(np.uint64), np.zeros(len(touched), dtype=np.uint64))
    rank = np.argsort(np.argsort(h, kind="stable"), kind="stable")
    prio = dict(zip(touched.tolist(), rank.tolist()))
    want = _jp_replica(n, list(zip(a.tolist(), b.tolist())), prio)
    assert cmap == want


# ---------------------------------------------------------------------------
# greedy maximal matching vs a pure-python replica of the same rounds
# ---------------------------------------------------------------------------


def _matching_replica(pairs):
    from fogray.sources import det_weight

    live = {}
    edges = set()
    for x, y in pairs:
        if x != y:
            edges.add((min(x, y), max(x, y)))
            live[x] = True
            live[y] = True
    out = []
    while True:
        cands = [(a, b) for a, b in edges if live[a] and live[b]]
        if not cands:
            break
        pick = {}
        for a, b in cands:
            h = float(
                det_weight(
                    np.array([a], dtype=np.uint64), np.array([b], dtype=np.uint64)
                )[0]
            )
            for v in (a, b):
                k = (h, a, b)
                if v not in pick or k < pick[v]:
                    pick[v] = k
        for a, b in cands:
            h = float(
                det_weight(
                    np.array([a], dtype=np.uint64), np.array([b], dtype=np.uint64)
                )[0]
            )
            if pick.get(a) == (h, a, b) and pick.get(b) == (h, a, b):
                out.append((a, b))
                live[a] = False
                live[b] = False
    return sorted(out)


def test_greedy_matching_maximal_and_replica(ray_session):
    from fogray.matching import greedy_matching

    rng = np.random.default_rng(11)
    n, m = 150, 600
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    a, b = a[keep], b[keep]
    src = np.r_[a, b].astype(np.int64)
    dst = np.r_[b, a].astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(6)
    got = greedy_matching(ds, n)
    rows = list(zip(got.column("a").to_pylist(), got.column("b").to_pylist()))
    # a matching: endpoints distinct
    used = [x for p in rows for x in p]
    assert len(used) == len(set(used))
    # maximal: every edge has a matched endpoint
    us = set(used)
    for x, y in zip(a.tolist(), b.tolist()):
        assert x in us or y in us
    assert rows == _matching_replica(list(zip(a.tolist(), b.tolist())))


def test_superstep_ops_on_star_graph(ray_session):
    """Skew smoke: a hub-and-spokes star (one vertex adjacent to all)
    is the worst-case degree distribution for the broadcast-superstep
    family — coloring must 2-color it, matching must pick exactly one
    hub edge, MSF must keep all spokes, triads must find none."""
    from fogray.coloring import jones_plassmann
    from fogray.matching import greedy_matching
    from fogray.metrics import triad_census
    from fogray.msf import boruvka_msf

    n = 64
    hub = 0
    spokes = np.arange(1, n, dtype=np.int64)
    src = np.r_[np.zeros(n - 1, dtype=np.int64), spokes]
    dst = np.r_[spokes, np.zeros(n - 1, dtype=np.int64)]
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    col = jones_plassmann(ds, n)
    cm = dict(zip(col.column("vid").to_pylist(), col.column("color").to_pylist()))
    assert all(cm[int(s)] != cm[hub] for s in spokes)
    assert max(cm.values()) <= 1  # 2-colorable
    mt = greedy_matching(
        rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4), n
    )
    assert mt.num_rows == 1 and mt.column("a")[0].as_py() == hub
    w = np.ones(len(src), dtype=np.float64)
    msf = boruvka_msf(
        rd.from_arrow(pa.table({"src": src, "dst": dst, "weight": np.r_[w]})), n
    )
    assert msf.num_rows == n - 1  # every spoke edge is in the forest
    tc = triad_census(
        rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4), n
    )
    assert tc.column("cnt").to_pylist() == [0, 0]


def test_biased_walks_match_replica(ray_session):
    """node2vec-style biased walks vs a sequential replica of the
    integer-weight pick rule (return 1 / triangle 4 / explore 2)."""
    from fogray.sources import splitmix53
    from fogray.walks import biased_walks

    rng = np.random.default_rng(3)
    n, m = 40, 200
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    a, b = a[keep].astype(np.int64), b[keep].astype(np.int64)
    key = np.unique(a * n + b)
    a, b = key // n, key % n
    got = biased_walks(pa.table({"src": a, "dst": b}), num_steps=5, num_shards=3)

    adj: dict = {}
    for x, y in zip(a.tolist(), b.tolist()):
        adj.setdefault(x, []).append(y)
    for x in adj:
        adj[x].sort()
    nbr = set(zip(a.tolist(), b.tolist()))
    rows = []
    for w0 in sorted(adj):
        prev, cur = -1, w0
        rows.append((w0, 0, w0))
        for k in range(5):
            cands = adj.get(cur, [])
            if not cands:
                break
            ws = [1 if c == prev else (4 if (prev, c) in nbr else 2) for c in cands]
            h = int(splitmix53(np.array([(w0 << 32) ^ k], dtype=np.uint64))[0])
            r = h % sum(ws)
            c0 = 0
            for c, wt in zip(cands, ws):
                if c0 + wt > r:
                    nxt = c
                    break
                c0 += wt
            rows.append((w0, k + 1, nxt))
            prev, cur = cur, nxt
    gotr = sorted(
        zip(
            got.column("wid").to_pylist(),
            got.column("step").to_pylist(),
            got.column("vid").to_pylist(),
        )
    )
    assert gotr == sorted(rows)


def test_incremental_cc_matches_static_and_is_order_invariant(ray_session):
    """Streaming-arrival CC: after every batch the labels are at the
    min-label fixpoint of the accumulated edges; the final labels are
    independent of the batch count and equal the static fixpoint."""
    import ray.data as rd

    from fogray.incremental import incremental_cc

    rng = np.random.RandomState(17)
    n = 300
    # several components: ring groups with random chords inside a group
    src, dst = [], []
    for g in range(6):
        ids = np.arange(g * 50, g * 50 + 50)
        src.extend(ids.tolist())
        dst.extend(np.roll(ids, 1).tolist())
        for _ in range(30):
            a, b = rng.choice(ids, 2, replace=False)
            src.append(a)
            dst.append(b)
    src = np.array(src + dst)  # symmetrize
    dst = np.array(dst + src[: len(dst)].tolist())
    t = pa.table({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})

    def static_labels():
        lab = np.arange(n, dtype=np.int64)
        while True:
            nl = lab.copy()
            np.minimum.at(nl, dst, lab[src])
            np.minimum.at(nl, src, lab[dst])
            if np.array_equal(nl, lab):
                return lab
            lab = nl

    want = static_labels()
    for nb in (1, 3, 5):
        labels, touched, stats = incremental_cc(
            rd.from_arrow(t), n, num_batches=nb
        )
        assert np.array_equal(labels[touched], want[touched]), nb
        assert len(stats) == nb
        assert sum(s["new_edges"] for s in stats) == t.num_rows
        # labels only ever decrease => total updates bounded and the
        # last batches of a settled graph do little work
        assert all(s["rounds"] >= 0 for s in stats)


def test_temporal_earliest_arrival_respects_time(ray_session):
    """Time-respecting reachability differs from static reachability:
    an edge available BEFORE its predecessor's arrival must not be
    traversed. Chain 0-(t=5)->1-(t=3)->2: vertex 2 unreachable even
    though statically connected; with a second later edge 1-(t=7)->2
    it becomes reachable at 7."""
    from fogray.temporal import temporal_earliest_arrival

    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    t = np.array([5, 3], dtype=np.int64)
    arrival, reached = temporal_earliest_arrival((src, dst, t), 3, 0)
    assert arrival[0] == -1 and arrival[1] == 5
    assert 2 not in reached  # t=3 edge closed by the time we reach 1

    src = np.array([0, 1, 1], dtype=np.int64)
    dst = np.array([1, 2, 2], dtype=np.int64)
    t = np.array([5, 3, 7], dtype=np.int64)
    arrival, reached = temporal_earliest_arrival((src, dst, t), 3, 0)
    assert arrival[2] == 7  # the later copy of the edge works

    # earliest arrival is min over all time-respecting paths: the
    # slower first hop can still yield the faster total
    src = np.array([0, 0, 1, 3], dtype=np.int64)
    dst = np.array([1, 3, 2, 2], dtype=np.int64)
    t = np.array([1, 2, 9, 4], dtype=np.int64)
    arrival, _ = temporal_earliest_arrival((src, dst, t), 4, 0)
    assert arrival[2] == 4  # via 0->3(2)->2(4), not 0->1(1)->2(9)


def test_pagerank_warm_start_continues_accumulation(ray_session):
    """init_rank warm start must continue the FOG accumulate-no-reset
    history: warm(5+5) differs from cold(10) on the full graph, and
    warm with all-ones equals cold exactly (the identity case)."""
    from fogray import algorithms as alg
    from fogray import fixtures as fx
    from fogray.config import EngineConfig
    from fogray.engine import GraphEngine

    src, dst, w, n = fx.two_cliques_bridge()
    eng = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=2))
    try:
        cold = alg.pagerank(eng, niters=10).state["rank"]
        ones = alg.pagerank(
            eng, niters=10, init_rank=np.ones(n, dtype=np.float64)
        ).state["rank"]
        np.testing.assert_array_equal(cold, ones)
        half = alg.pagerank(eng, niters=5).state["rank"]
        warm = alg.pagerank(eng, niters=5, init_rank=half).state["rank"]
        # 5+5 on the SAME graph == 10 straight (accumulation is a pure
        # function of the state), exact to the bit
        np.testing.assert_array_equal(cold, warm)
        # warm from a DIFFERENT state is a different history
        warm2 = alg.pagerank(eng, niters=5, init_rank=2.0 * half).state["rank"]
        assert not np.allclose(warm2, cold)
    finally:
        eng.shutdown()


def test_dynamic_cc_deletions_split_and_match_static_each_batch(ray_session):
    """Fully-dynamic CC (inserts + deletes): after EVERY stream prefix
    the labels equal the static min-label components of the live edge
    set (union-find oracle); deletions actually fire and reset whole
    components."""
    import ray.data as rd

    from fogray import oracle as orc
    from fogray.incremental import dynamic_cc, update_tagger

    rng = np.random.RandomState(23)
    n = 240
    s0 = rng.randint(0, n, 700).astype(np.int64)
    d0 = rng.randint(0, n, 700).astype(np.int64)
    src, dst = np.r_[s0, d0], np.r_[d0, s0]
    t = pa.table({"src": src, "dst": dst})
    nb = 4
    # replay the tags locally to know the live set after each prefix
    tagged = update_tagger(nb)(t)
    arr = tagged.column("arrival").to_numpy(zero_copy_only=False)
    rem = tagged.column("removal").to_numpy(zero_copy_only=False)
    assert ((rem == -1) | (rem > arr)).all()
    assert (rem >= 0).any(), "workload must contain deletions"

    labels, touched, stats = dynamic_cc(rd.from_arrow(t), n, num_batches=nb)
    assert sum(st["deleted_edges"] for st in stats) == int((rem >= 0).sum())
    assert any(st["reset_vertices"] > 0 for st in stats)
    live = rem == -1
    want = orc.wcc_fog(src[live], dst[live], n)
    np.testing.assert_array_equal(labels, want)

    # intermediate exactness: after batches 0..b the live set is
    # {arrival <= b AND (removal == -1 OR removal > b)}
    for b in range(nb - 1):
        m = (arr <= b) & ((rem == -1) | (rem > b))
        want_b = orc.wcc_fog(src[m], dst[m], n)
        lab_b, _t, st_b = dynamic_cc(
            rd.from_arrow(t), n, num_batches=nb, stop_after=b
        )
        np.testing.assert_array_equal(lab_b, want_b, err_msg=f"batch {b}")
        assert len(st_b) == b + 1


def test_hyperball_equals_hll_of_exact_balls(ray_session):
    """HLL-merge along edges == HLL of the exact reach set (register
    max is union), so per-(v, hop) estimates must equal estimates
    computed from exact BFS balls — bit-for-bit, not approximately."""
    import ray.data as rd

    from fogray.hyperball import _vid_registers, hll_estimate_rows, hyperball
    from fogray.util import sql_round

    rng = np.random.RandomState(41)
    n = 120
    src = rng.randint(0, n, 400).astype(np.int64)
    dst = rng.randint(0, n, 400).astype(np.int64)
    t = pa.table({"src": src, "dst": dst})
    got = hyperball(rd.from_arrow(t), n, max_hops=3).to_pandas()

    # exact out-balls by BFS over adjacency
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[a].append(b)
    touched = np.unique(np.r_[src, dst])
    base = np.zeros((n, 256), dtype=np.uint8)
    base[touched] = _vid_registers(touched)
    rows = []
    for v in touched:
        ball = {int(v)}
        for h in range(0, 4):
            if h > 0:
                ball = ball | {w for u in ball for w in adj[u]}
            members = np.array(sorted(ball), dtype=np.int64)
            regs = base[members].max(axis=0)
            rows.append((int(v), h, sql_round(
                hll_estimate_rows(regs[None, :]))[0]))
    import pandas as pd

    exp = pd.DataFrame(rows, columns=["vid", "hop", "est_ball"]) \
        .sort_values(["vid", "hop"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values(["vid", "hop"]).reset_index(drop=True), exp
    )
    # monotone: balls only grow with hops
    for v, grp in got.groupby("vid"):
        e = grp.sort_values("hop")["est_ball"].to_numpy()
        assert (np.diff(e) >= -1e-9).all()
