import pytest

from fogray import fixtures as fx
from fogray import oracle as orc
from fogray.triangles import triangle_count


@pytest.mark.parametrize(
    "name", ["triangles", "two_cliques_bridge", "selfloops", "dup_edges", "path5", "star_hub"]
)
def test_triangles_toys(ray_session, name):
    src, dst, w, n = fx.ALL_TOYS[name]()
    assert triangle_count((src, dst), n) == orc.triangle_count_bruteforce(src, dst, n)


def test_triangles_random(ray_session):
    src, dst, w, n = fx.random_graph(96, 0.08, seed=31)
    assert triangle_count((src, dst), n) == orc.triangle_count_bruteforce(src, dst, n)


@pytest.mark.parametrize("closure", ["broadcast", "shuffle"])
def test_triangles_closure_paths_agree(ray_session, closure):
    src, dst, w, n = fx.random_graph(80, 0.1, seed=17)
    assert triangle_count((src, dst), n, closure=closure) == orc.triangle_count_bruteforce(
        src, dst, n
    )


def test_triangle_per_edge_bruteforce(ray_session):
    from fogray import fixtures as fx
    from fogray.triangles import triangle_per_edge

    for seed in (3, 29):
        src, dst, w, n = fx.random_graph(80, 0.12, seed=seed)
        a, b, common, deg = triangle_per_edge((src, dst), n)
        adj = [set() for _ in range(n)]
        for s, d in zip(src, dst):
            if s != d:
                adj[s].add(d)
                adj[d].add(s)
        assert (a < b).all()
        for i in range(len(a)):
            assert common[i] == len(adj[a[i]] & adj[b[i]])
        assert all(deg[v] == len(adj[v]) for v in range(n))


def test_triangle_per_edge_empty_and_triangle_free(ray_session):
    import numpy as np

    from fogray.triangles import triangle_per_edge

    a, b, c, deg = triangle_per_edge(
        (np.array([0]), np.array([0])), 3
    )  # self-loop only -> empty simple graph
    assert len(a) == 0 and (deg == 0).all()
    # a path graph has edges but zero triangles
    a, b, c, deg = triangle_per_edge(
        (np.array([0, 1, 2]), np.array([1, 2, 3])), 4
    )
    assert len(a) == 3 and (c == 0).all()


def test_ktruss_matches_bruteforce(ray_session):
    import numpy as np

    from fogray import fixtures as fx
    from fogray.triangles import ktruss_edges

    def brute(src, dst, n, k, rounds):
        edges = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
        for _ in range(rounds):
            adj = {}
            for a, b in edges:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            nxt = {
                (a, b)
                for a, b in edges
                if len(adj.get(a, set()) & adj.get(b, set())) >= k - 2
            }
            if nxt == edges:
                break
            edges = nxt
            if not edges:
                break
        return sorted(edges)

    for seed, k in ((3, 3), (3, 4), (11, 5)):
        src, dst, w, n = fx.random_graph(60, 0.15, seed=seed)
        a, b = ktruss_edges((src, dst), n, k=k, rounds=4)
        got = sorted(zip(a.tolist(), b.tolist()))
        assert got == brute(src, dst, n, k, 4), (seed, k)


def test_apex_wedges_noncontiguous_ids(ray_session):
    """_apex_wedges must enumerate exactly the wedges OWNED by the given
    apex ids, for any (non-contiguous) id set — Ray can bundle
    non-adjacent range blocks into one map task, and the old
    [ids[0], ids[-1]] span double-counted apexes it did not own."""
    import numpy as np
    from fogray.triangles import _apex_wedges

    # CSR over 6 ranks: rank r's neighbors (ascending)
    adj = {0: [1, 2, 3], 1: [2, 4], 2: [5], 3: [], 4: [5], 5: []}
    offs = np.cumsum([0] + [len(adj[r]) for r in range(6)]).astype(np.int64)
    nb = np.concatenate([np.array(adj[r], dtype=np.int64) for r in range(6)])

    def brute(ids):
        out = []
        for u in ids:
            ns = adj[u]
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    out.append((u, ns[i], ns[j]))
        return sorted(out)

    for ids in ([0, 1, 2, 3, 4, 5], [0, 4], [5], [1, 3, 5], [2]):
        a, f, s = _apex_wedges(np.array(ids, dtype=np.int64), offs, nb)
        assert sorted(zip(a.tolist(), f.tolist(), s.tolist())) == brute(ids), ids

@pytest.mark.parametrize("closure", ["broadcast", "shuffle"])
def test_triangle_per_vertex_paths_agree(ray_session, closure):
    import numpy as np

    from fogray.triangles import triangle_per_vertex

    for seed in (7, 23):
        src, dst, w, n = fx.random_graph(90, 0.1, seed=seed)
        vids, tri, deg = triangle_per_vertex((src, dst), n, closure=closure)
        adj = [set() for _ in range(n)]
        for s, d in zip(src, dst):
            if s != d:
                adj[s].add(d)
                adj[d].add(s)
        exp = {
            v: sum(1 for u in adj[v] for w2 in adj[v] if u < w2 and w2 in adj[u])
            for v in range(n)
            if adj[v]
        }
        got = dict(zip(vids.tolist(), tri.tolist()))
        assert got == exp, (seed, closure)
        assert all(deg[i] == len(adj[v]) for i, v in enumerate(vids))


@pytest.mark.parametrize("closure", ["broadcast", "shuffle"])
def test_triangle_per_edge_paths_agree(ray_session, closure):
    from fogray.triangles import triangle_per_edge

    src, dst, w, n = fx.random_graph(80, 0.12, seed=29)
    a, b, common, deg = triangle_per_edge((src, dst), n, closure=closure)
    adj = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    got = sorted(zip(a.tolist(), b.tolist(), common.tolist()))
    exp = sorted(
        (u, v, len(adj[u] & adj[v])) for u in range(n) for v in adj[u] if u < v
    )
    assert got == exp, closure


def test_ktruss_shuffle_closure(ray_session):
    from fogray.triangles import ktruss_edges

    src, dst, w, n = fx.random_graph(60, 0.15, seed=3)
    ab_b = sorted(zip(*[x.tolist() for x in ktruss_edges((src, dst), n, k=4, rounds=4)]))
    ab_s = sorted(
        zip(*[x.tolist() for x in ktruss_edges((src, dst), n, k=4, rounds=4, closure="shuffle")])
    )
    assert ab_b == ab_s and len(ab_b) > 0
