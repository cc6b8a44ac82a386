"""Pure-numpy float64 oracles implementing FOG's exact algorithm semantics.

These are the reference outputs for the distributed engine's tests
(``allclose(1e-6)`` for float results, exact equality for labels/levels).
Each function documents the reference semantics it encodes with
``file:line`` citations into /root/reference (studied, not copied).

Conventions shared with the engine:
- vertices are dense ids ``0..n-1``; edges are parallel arrays
  ``(src, dst, weight)`` (duplicates and self-loops allowed, kept);
- all float math is float64 and all reductions are order-insensitive
  (the reference computes in float32 with thread-interleaved apply order,
  ``fogsrc/cpu_thread.cpp:650-675``; at test scale float64 +
  order-insensitive reduction agrees to well under 1e-6);
- ``UNREACHED = 2**32 - 1`` mirrors the reference's ``UINT_MAX`` /
  ``(u32_t)-1`` sentinels.
"""

from __future__ import annotations

import numpy as np

UNREACHED = np.uint64(2**32 - 1)  # reference u32 "infinity" for BFS levels / preds
EPSILON = 1e-3  # FLOAT_EQ epsilon, headers/types.hpp:17-19


def _as_arrays(src, dst, weight=None):
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if weight is None:
        weight = np.ones(len(src), dtype=np.float64)
    else:
        weight = np.asarray(weight, dtype=np.float64)
    return src, dst, weight


def pagerank_fog(src, dst, n: int, niters: int = 10) -> np.ndarray:
    """FOG PageRank (application/pagerank.hpp:43-128), GLOBAL engine.

    Reference semantics (deliberately non-standard, replicated exactly):
    - init rank = 1.0 for every vertex (pagerank.hpp:45);
    - per iteration, every vertex with outdeg>0 scatters along EVERY
      out-edge (self-loops included — GLOBAL scatter has no dest==i
      skip, fogsrc/cpu_thread.cpp:509-535) the update
      ``0.85*rank(u)/outdeg(u) + 0.15`` (pagerank.hpp:75 — the teleport
      term is added once PER EDGE, so a vertex with in-degree k gains
      0.15*k per iteration);
    - gather ACCUMULATES onto the previous rank, no reset
      (pagerank.hpp:105): ``r_{k+1}(v) = r_k(v) + sum_{u->v} upd``;
    - fixed iteration count, all vertices scheduled every iteration
      (fog_engine.cpp:124-125; default 10, headers/options_utils.h:40-41).
    """
    src, dst, _ = _as_arrays(src, dst)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    rank = np.ones(n, dtype=np.float64)
    # outdeg[src] > 0 by construction for every edge
    for _ in range(niters):
        contrib = 0.85 * rank[src] / outdeg[src] + 0.15
        rank = rank + np.bincount(dst, weights=contrib, minlength=n)
    return rank


def wcc_fog(src, dst, n: int) -> np.ndarray:
    """FOG WCC labels (application/cc.hpp): min-label propagation over both
    edge directions (paired fwd/bwd supersteps, cc.hpp:112-133) to fixpoint.

    The fixpoint is provably ``label(v) = min vertex id in v's weakly
    connected component`` (monotone min-propagation along edges taken in
    both directions); computed here with union-find. Isolated vertices are
    never scheduled (cc.hpp:40-45) and keep ``label = vid``.
    """
    src, dst, _ = _as_arrays(src, dst)
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(src.tolist(), dst.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by smaller id so the final find gives min-vid labels
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return np.array([find(v) for v in range(n)], dtype=np.int64)


def component_count(labels: np.ndarray) -> int:
    """cc.hpp:137-148: number of vertices that are their own root."""
    return int(np.sum(labels == np.arange(len(labels))))


def bfs_fog(src, dst, n: int, root: int) -> np.ndarray:
    """FOG BFS levels (application/bfs.hpp), TARGET engine, out-edges only,
    self-loops skipped (cpu_thread.cpp:236-240). Unreached = UNREACHED."""
    src, dst, _ = _as_arrays(src, dst)
    level = np.full(n, UNREACHED, dtype=np.uint64)
    level[root] = 0
    frontier = {root}
    # adjacency as sorted CSR for determinism-free traversal
    order = np.argsort(src, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    starts = np.searchsorted(s_sorted, np.arange(n))
    ends = np.searchsorted(s_sorted, np.arange(n) + 1)
    depth = 0
    while frontier:
        depth += 1
        nxt = set()
        for u in frontier:
            for v in d_sorted[starts[u] : ends[u]].tolist():
                if v != u and level[v] > depth:
                    level[v] = depth
                    nxt.add(v)
        frontier = nxt
    return level


def sssp_fog(src, dst, weight, n: int, source: int):
    """FOG SSSP (application/sssp.hpp), TARGET engine, self-loops skipped.

    Semantics: init value=inf, pred=UNREACHED; source value=0
    (sssp.hpp:38-51). Scatter ``value(u)+w(u,v)`` with pred=u
    (sssp.hpp:60-75). Gather accepts an update iff
    ``not FLOAT_EQ(upd, value) and upd < value`` — the 1e-3 epsilon guard
    (sssp.hpp:95-106, types.hpp:17-19).

    Documented deviation from the reference: the reference applies updates
    sequentially in thread-interleaved order; within the 1e-3 epsilon band
    that order can pick different (value, pred) pairs. This oracle (and
    the engine) combine all of a superstep's updates by lexicographic
    (value, pred) minimum BEFORE applying the guard, which is
    deterministic and agrees with the reference whenever distinct path
    lengths differ by more than 1e-3.
    """
    src, dst, weight = _as_arrays(src, dst, weight)
    keep = src != dst
    src, dst, weight = src[keep], dst[keep], weight[keep]
    value = np.full(n, np.inf, dtype=np.float64)
    pred = np.full(n, UNREACHED, dtype=np.uint64)
    value[source] = 0.0
    active = np.zeros(n, dtype=bool)
    active[source] = True
    while active.any():
        m = active[src]
        if not m.any():
            break
        es, ed, ew = src[m], dst[m], weight[m]
        upd_val = value[es] + ew
        upd_pred = es
        # lexicographic (value, pred) min per destination
        order = np.lexsort((upd_pred, upd_val, ed))
        ed, upd_val, upd_pred = ed[order], upd_val[order], upd_pred[order]
        first = np.ones(len(ed), dtype=bool)
        first[1:] = ed[1:] != ed[:-1]
        ed, upd_val, upd_pred = ed[first], upd_val[first], upd_pred[first]
        cur = value[ed]
        accept = (~((upd_val > cur - EPSILON) & (upd_val < cur + EPSILON))) & (upd_val < cur)
        changed = ed[accept]
        value[changed] = upd_val[accept]
        pred[changed] = upd_pred[accept].astype(np.uint64)
        active = np.zeros(n, dtype=bool)
        active[changed] = True
    return value, pred


def scc_fog(src, dst, n: int) -> np.ndarray:
    """FOG SCC roots (application/scc.hpp fwd-bwd min coloring).

    The reference peels SCCs with alternating forward min-propagation and
    backward confirmation passes (scc.hpp:46-207); each SCC ends with
    ``component_root = min vertex id in the SCC`` (vertices with
    outdeg==0 or indeg==0 are trivial singletons, scc.hpp:48-54; self-loop
    edges are skipped by TARGET scatter so a pure-self-loop vertex is also
    a singleton with root = its own id). Computed here with iterative
    Tarjan: root(v) = min id of v's SCC — provably identical (see
    tests/test_oracle.py for the cross-check against a direct simulation
    of the pass structure).
    """
    src, dst, _ = _as_arrays(src, dst)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    order = np.argsort(src, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    starts = np.searchsorted(s_sorted, np.arange(n))
    ends = np.searchsorted(s_sorted, np.arange(n) + 1)

    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    stack: list[int] = []
    roots = np.arange(n, dtype=np.int64)
    counter = 0

    for start in range(n):
        if index[start] != -1:
            continue
        work = [(start, starts[start])]
        index[start] = low[start] = counter
        counter += 1
        stack.append(start)
        on_stack[start] = True
        while work:
            v, ei = work[-1]
            if ei < ends[v]:
                work[-1] = (v, ei + 1)
                w = int(d_sorted[ei])
                if index[w] == -1:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, starts[w]))
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            else:
                work.pop()
                if work:
                    pv = work[-1][0]
                    low[pv] = min(low[pv], low[v])
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        comp.append(w)
                        if w == v:
                            break
                    root = min(comp)
                    for w in comp:
                        roots[w] = root
    return roots


def spmv_fog(src, dst, weight, n: int):
    """FOG SpMV (application/spmv.hpp): x=1.0, one GLOBAL iteration,
    self-loops included: y(v) = sum_{u->v} x(u)*w(u,v) (spmv.hpp:52-90)."""
    src, dst, weight = _as_arrays(src, dst, weight)
    x = np.ones(n, dtype=np.float64)
    y = np.bincount(dst, weights=x[src] * weight, minlength=n).astype(np.float64)
    return x, y


def label_propagation_fog(src, dst, n: int) -> np.ndarray:
    """Synchronous min-label propagation over undirected edges == FOG WCC
    gather semantics exposed as its own pipeline (SURVEY.md section 2.4)."""
    return wcc_fog(src, dst, n)


def triangle_count_bruteforce(src, dst, n: int) -> int:
    """Triangle count on the undirected simple graph (self-loops and
    duplicate/parallel edges collapsed). Reference lists this as future
    work (TODO.list:17-20); semantics defined in SURVEY.md section 2.4."""
    src, dst, _ = _as_arrays(src, dst)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    pairs = set(zip(a.tolist(), b.tolist()))
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    count = 0
    for u, v in pairs:
        count += len(adj[u] & adj[v])
    return count // 3
