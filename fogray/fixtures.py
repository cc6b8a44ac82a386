"""Deterministic toy graphs (FIXTURES.md F2) shared by tests and docs.

Each fixture returns ``(src, dst, weight, n)`` numpy arrays with dense u32
vertex ids, directed edges, self-loops/duplicates allowed — exactly the
reference's data model (headers/types.hpp:35-48). Weights are
hash-derived floats in [0, 10), replacing the reference's irreproducible
convert-time ``rand()`` weights (convert/process_adjlist.cpp:25-30).
"""

from __future__ import annotations

import hashlib

import numpy as np


def det_weights(src: np.ndarray, dst: np.ndarray, seed: int = 42) -> np.ndarray:
    """Deterministic per-edge weight in [0, 10): a keyed hash of
    (seed, src, dst, occurrence-index), mirroring type1_edge's weight
    range without the reference's rand() (process_adjlist.cpp:25-30)."""
    out = np.empty(len(src), dtype=np.float64)
    seen: dict[tuple[int, int], int] = {}
    for i, (u, v) in enumerate(zip(src.tolist(), dst.tolist())):
        k = seen.get((u, v), 0)
        seen[(u, v)] = k + 1
        h = hashlib.sha256(f"{seed}:{u}:{v}:{k}".encode()).digest()
        out[i] = (int.from_bytes(h[:8], "big") / 2**64) * 10.0
    return out


def _mk(edges: list[tuple[int, int]], n: int, seed: int = 42):
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    return src, dst, det_weights(src, dst, seed), n


def path5():
    return _mk([(0, 1), (1, 2), (2, 3), (3, 4)], 5)


def cycle4():
    return _mk([(0, 1), (1, 2), (2, 3), (3, 0)], 4)


def star_hub(k: int = 50):
    """Hub 0 <-> spokes 1..k: exercises skew and the per-edge teleport rule
    (hub in-degree k gains 0.15*k per iteration, pagerank.hpp:75-76)."""
    edges = [(0, i) for i in range(1, k + 1)] + [(i, 0) for i in range(1, k + 1)]
    return _mk(edges, k + 1)


def two_cliques_bridge():
    """K4 (0-3) + K4 (4-7) + one directed bridge 3->4: CC must merge the
    cliques across fwd/bwd passes (cc.hpp:112-133)."""
    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(4):
                if i != j:
                    edges.append((base + i, base + j))
    edges.append((3, 4))
    return _mk(edges, 8)


def selfloops():
    """Self-loops: counted by GLOBAL engines (cpu_thread.cpp:509-535),
    skipped by TARGET engines (cpu_thread.cpp:236-240)."""
    return _mk([(0, 0), (0, 1), (1, 1), (1, 2), (2, 0), (3, 3)], 4)


def isolated():
    """Vertices 3,5 have no edges: outdeg-0 emits nothing
    (cpu_thread.cpp:464-474); isolated vertices stay self-rooted."""
    return _mk([(0, 1), (1, 2), (2, 0), (4, 0)], 6)


def dup_edges():
    """Duplicate (u,v) pairs are kept (the converter never dedups);
    degree and PageRank divisor count per-occurrence."""
    return _mk([(0, 1), (0, 1), (0, 1), (1, 2), (1, 2), (2, 0)], 3)


def triangles_graph():
    """Two triangles sharing edge (1,2) plus a pendant: 2 triangles."""
    return _mk([(0, 1), (1, 2), (2, 0), (1, 3), (3, 2), (3, 4)], 5)


def sccs_graph():
    """Two 3-cycles {0,1,2} and {3,4,5} joined 2->3, plus sink 6 and a
    pure self-loop vertex 7: SCCs {0,1,2},{3,4,5},{6},{7}."""
    return _mk(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3), (5, 6), (7, 7)],
        8,
    )


def random_graph(n: int = 64, p: float = 0.08, seed: int = 7, self_loops: bool = True):
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < p
    if not self_loops:
        np.fill_diagonal(mask, False)
    src, dst = np.nonzero(mask)
    return src.astype(np.int64), dst.astype(np.int64), det_weights(src, dst, seed), n


ALL_TOYS = {
    "path5": path5,
    "cycle4": cycle4,
    "star_hub": star_hub,
    "two_cliques_bridge": two_cliques_bridge,
    "selfloops": selfloops,
    "isolated": isolated,
    "dup_edges": dup_edges,
    "triangles": triangles_graph,
    "sccs": sccs_graph,
}
