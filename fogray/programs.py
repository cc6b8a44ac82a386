"""Vertex programs: FOG's compile-time template contract
(``A::{init, scatter_one_edge, gather_one_update, before/after_iteration,
finalize}``, headers/fog_engine.hpp:43-44, README.txt:67-70) re-expressed
as a Python protocol whose hooks are VECTORIZED over numpy edge/state
arrays instead of per-edge calls.

Contract (consumed by :mod:`fogray.engine`):

- ``init(n, outdeg, indeg, **params) -> (state, frontier)`` — build the
  dense per-vertex state arrays (the ``.attr`` array analog) and the
  initial frontier (None == all vertices scheduled, GLOBAL engines).
- ``scatter(state, s, d, w, direction) -> (dest, vals[, preds])`` — runs
  INSIDE edge-partition actors on frontier-filtered edge arrays; must be
  pure numpy (no Python loops).
- ``combine`` — 'sum' | 'min' | 'min_pred': the order-insensitive
  reduction applied per destination (all six reference gathers are
  commutative/associative: sum or (conditional) min, SURVEY.md 2.3).
- ``apply(state, ids, vals, preds) -> changed_ids`` — driver-side FOG
  ``gather_one_update`` rule applied to the combined updates.
- ``done(completed_iters, frontier_count, params) -> bool``.

Engine kinds: 'global' (all vertices scheduled every superstep,
self-loops included — fogsrc/cpu_thread.cpp:509-535) vs 'target'
(frontier-scheduled, self-loop edges skipped — cpu_thread.cpp:236-240).
"""

from __future__ import annotations

import numpy as np

from .oracle import EPSILON, UNREACHED

FWD, BWD = "fwd", "bwd"

#: shared empty changed-ids return for fixed-iteration dense applies
_EMPTY_IDS = np.empty(0, dtype=np.int64)


class VertexProgram:
    name: str = "abstract"
    engine: str = "global"  # 'global' | 'target'
    paired_fwd_bwd: bool = False  # CC: each iteration = fwd then bwd superstep
    combine: str = "sum"  # 'sum' | 'min' | 'min_pred'
    #: state fields holding VERTEX IDS (shifted to absolute vids when a
    #: program is initialized per vid-range slice in the dist engine)
    vid_valued_fields: tuple[str, ...] = ()

    @property
    def skip_self_loops(self) -> bool:
        return self.engine == "target"

    def init(self, n, outdeg, indeg, **params):
        raise NotImplementedError

    def init_span(self, lo, hi, outdeg, indeg, **params):
        """Slice-local init for the range-partitioned engine
        (fogray.dist_engine): build state/frontier for vids [lo, hi)
        given the range's degree slices. Default: run :meth:`init` on
        the slice and shift vid-valued identity fields to absolute vids.
        Programs seeding a single vertex (BFS/SSSP) override this."""
        state, frontier = self.init(hi - lo, outdeg, indeg, **params)
        for k in self.vid_valued_fields:
            state[k] = state[k] + lo
        return state, frontier

    def scatter_view(self, state):
        """What the engines ship to scatter actors each superstep.
        Default: the full state dict. Programs whose scatter reads a
        derived quantity override this to ship ONE derived array
        (smaller broadcast, and the O(V) derivation runs once on the
        driver instead of once per actor). CONTRACT: the derivation
        must be ELEMENT-WISE over the state arrays — the dist engine
        applies it independently per vid-range slice
        (StatePartitionActor.export), which is only exact for
        element-wise functions."""
        return state

    def scatter(self, state, s, d, w, direction):
        """Vectorized edge kernel -> (dest_vids, values[, preds]).

        EMISSION-TARGET CONTRACT: updates MUST be emitted at ``d`` for
        the forward direction and at ``s`` for the backward direction.
        The engines partition edges by that target vid range and each
        range actor pre-combines into its own span — an emission
        outside [lo, hi) would corrupt/abort the span partial. The
        engine asserts this per scatter (cheap bounds check)."""
        raise NotImplementedError

    def dense_gather(self, state):
        """Optional fused-kernel declaration for GLOBAL sum programs
        whose per-edge value is ``arr[read_vid] (*w) (+ c)``: return
        ``(arr, use_weight, add_const)`` and the broadcast engine's
        dense path computes the scatter itself in CACHE-BLOCKED chunks
        (gather -> +c/*w -> bincount per ~2M-edge slice), so the three
        O(E)-sized float64 temporaries the generic path materializes
        per superstep never round-trip DRAM. Semantics are identical
        per edge; only the float summation order changes (within the
        6-decimal oracle round, like the actor partitioning already
        does). Return None (default) to use :meth:`scatter`."""
        return None

    def apply(self, state, ids, vals, preds=None):
        raise NotImplementedError

    def apply_dense(self, state, acc):
        """Optional dense-combine apply: ``acc`` is the FULL combined
        update vector (zeros where nothing arrived). Programs whose
        update rule is identity on zero entries implement this to skip
        the engine's O(V) flatnonzero + gather (driver-SERIAL work that
        caps multi-worker scaling). Must return the changed-ids array
        (may be empty for fixed-iteration programs — nothing consumes
        it there); return None (default) for the generic sparse apply."""
        return None

    def done(self, completed_iters, frontier_count, params) -> bool:
        if self.engine == "target":
            return frontier_count == 0
        raise NotImplementedError

    def fixed_iters(self, params) -> int | None:
        """Superstep count known a priori (``done`` depends only on the
        completed count), or None for convergence-driven programs.
        Non-None (together with ``dense_gather`` + ``apply_dense``)
        enables the broadcast engine's RESIDENT pipelined loop: state
        lives sliced in the range-owner actors, supersteps chain
        through object refs, and the driver does O(P) bookkeeping per
        superstep instead of O(V) fold + put (the Amdahl serial term
        that capped multi-worker scaling). Requires ``apply_dense`` and
        ``scatter_view`` to be ELEMENT-WISE over the state arrays (the
        same contract the dist engine already imposes on
        ``scatter_view``)."""
        return None


class PageRank(VertexProgram):
    """FOG PageRank — application/pagerank.hpp:43-128. See
    :func:`fogray.oracle.pagerank_fog` for the exact (non-standard)
    semantics replicated here: per-edge teleport, accumulate-no-reset,
    self-loops included, fixed iteration count."""

    name = "pagerank"
    engine = "global"
    combine = "sum"

    def init(self, n, outdeg, indeg, **params):
        # init_rank: warm-start for evolving-graph re-analytics (the
        # pagerank_evolve query) — continue accumulation from a prior
        # phase's ranks instead of the cold all-ones state
        r0 = params.get("init_rank")
        rank = (
            np.asarray(r0, dtype=np.float64).copy()
            if r0 is not None
            else np.ones(n, dtype=np.float64)
        )
        return {"rank": rank}, None

    def scatter_view(self, state):
        # outdeg>0 guaranteed for every scattered src (zero-outdeg
        # vertices emit nothing, cpu_thread.cpp:464-474), so the guard
        # only silences the irrelevant lanes' divide-by-zero.
        return {"contrib": 0.85 * state["rank"] / np.maximum(state["outdeg"], 1.0)}

    def scatter(self, state, s, d, w, direction):
        # Broadcast engine ships the precomputed contrib (one O(V)
        # driver-side derivation replaces the second O(E) random gather
        # — per-edge memory traffic is the superstep bottleneck). The
        # dist engine's sharded-field state supports only per-edge
        # gathers, so it keeps the original two-gather form.
        if "contrib" in state:
            return d, state["contrib"][s] + 0.15
        return d, 0.85 * state["rank"][s] / state["outdeg"][s] + 0.15

    def dense_gather(self, state):
        # broadcast path only (the dist engine ships sharded fields,
        # not the derived contrib)
        if "contrib" in state:
            return state["contrib"], False, 0.15
        return None

    def apply(self, state, ids, vals, preds=None):
        state["rank"][ids] += vals  # accumulate, pagerank.hpp:105
        return ids

    def apply_dense(self, state, acc):
        state["rank"] += acc  # += of the zero entries is identity
        return _EMPTY_IDS

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= params.get("niters", 10)

    def fixed_iters(self, params):
        return int(params.get("niters", 10))


class PersonalizedPageRank(VertexProgram):
    """Personalized PageRank with the same FOG mechanics as
    :class:`PageRank` (per-edge damping, accumulate-no-reset, fixed
    iteration count — application/pagerank.hpp:43-128), except mass
    starts at ONE source vertex and the per-edge teleport lands only on
    edges INTO the source: vals = 0.85*r(s)/outdeg(s) + 0.15*(d==src).
    Mirrored exactly by the ``ppr`` recursive-SQL oracle."""

    name = "ppr"
    engine = "global"
    combine = "sum"

    def __init__(self, source: int = 0):
        self.source = int(source)

    def init(self, n, outdeg, indeg, **params):
        rank = np.zeros(n, dtype=np.float64)
        if 0 <= self.source < n:
            rank[self.source] = 1.0
        return {"rank": rank}, None

    def init_span(self, lo, hi, outdeg, indeg, **params):
        rank = np.zeros(hi - lo, dtype=np.float64)
        if lo <= self.source < hi:
            rank[self.source - lo] = 1.0
        return {"rank": rank}, None

    def scatter_view(self, state):
        return {"contrib": 0.85 * state["rank"] / np.maximum(state["outdeg"], 1.0)}

    def scatter(self, state, s, d, w, direction):
        if "contrib" in state:
            vals = state["contrib"][s]
        else:
            vals = 0.85 * state["rank"][s] / state["outdeg"][s]
        vals[d == self.source] += 0.15
        return d, vals

    def apply(self, state, ids, vals, preds=None):
        state["rank"][ids] += vals
        return ids

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= params.get("niters", 10)


class WeightedPageRank(VertexProgram):
    """Weighted FOG-semantics PageRank: the same non-standard mechanics
    as :class:`PageRank` (per-edge teleport 0.15, accumulate-no-reset,
    self-loops via the unit CTE row, fixed iterations —
    application/pagerank.hpp:43-128) with every edge's share scaled by
    its weight: val(u→v) = (0.85·r(u)/wsum(u))·w(u,v) + 0.15, where
    wsum(u) = Σ_out-edges w. The float association (0.85·r)/wsum·w is
    written term-for-term like the SQL mirror; wsum is computed once
    by an O(V) per-block fold and lives IN state so scatter_view stays
    element-wise (the resident/dist slicing contract)."""

    name = "wpagerank"
    engine = "global"
    combine = "sum"

    def __init__(self, wsum=None):
        self.wsum = None if wsum is None else np.asarray(wsum, dtype=np.float64)

    def init(self, n, outdeg, indeg, **params):
        if self.wsum is None or len(self.wsum) != n:
            raise ValueError("WeightedPageRank requires a full wsum array")
        return {
            "rank": np.ones(n, dtype=np.float64),
            "wsum": np.maximum(self.wsum, 1.0),
        }, None

    def init_span(self, lo, hi, outdeg, indeg, **params):
        if self.wsum is None:
            raise ValueError("WeightedPageRank requires a full wsum array")
        return {
            "rank": np.ones(hi - lo, dtype=np.float64),
            "wsum": np.maximum(self.wsum[lo:hi], 1.0),
        }, None

    def scatter_view(self, state):
        return {"contrib": 0.85 * state["rank"] / state["wsum"]}

    def scatter(self, state, s, d, w, direction):
        if "contrib" in state:
            return d, state["contrib"][s] * w + 0.15
        return d, 0.85 * state["rank"][s] / state["wsum"][s] * w + 0.15

    def dense_gather(self, state):
        return state["contrib"], True, 0.15

    def apply(self, state, ids, vals, preds=None):
        state["rank"][ids] += vals
        return ids

    def apply_dense(self, state, acc):
        state["rank"] += acc
        return _EMPTY_IDS

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= params.get("niters", 10)

    def fixed_iters(self, params):
        return int(params.get("niters", 10))


class KCoreRound(VertexProgram):
    """ONE degree-recount round of k-core peeling over a SYMMETRIC edge
    set (every edge stored in both directions, as the co-occurrence
    graph is): every vertex emits its alive flag along out-edges, so
    each vertex gathers its alive-neighbor count; apply() kills
    vertices whose count dropped below k and reports the flips. Driven
    to fixpoint by :func:`fogray.algorithms.kcore` (the same
    external-driver pattern as SCC); k-core peeling is monotone, so
    rounds are idempotent once converged — which is what lets the SQL
    oracle run a FIXED iteration count."""

    name = "kcore_round"
    engine = "global"
    combine = "sum"

    def __init__(self, k: int = 2):
        self.k = int(k)

    def init(self, n, outdeg, indeg, **params):
        return {"alive": np.ones(n, dtype=np.float64)}, None

    def scatter_view(self, state):
        return {"alive": state["alive"]}

    def scatter(self, state, s, d, w, direction):
        return d, state["alive"][s]

    def dense_gather(self, state):
        return state["alive"], False, 0.0

    def apply(self, state, ids, vals, preds=None):
        # dense combine drops zero sums, so rebuild the full count
        # vector: a vertex with NO alive neighbors has count 0 < k.
        deg_alive = np.zeros(len(state["alive"]), dtype=np.float64)
        deg_alive[ids] = vals
        new_alive = state["alive"] * (deg_alive >= self.k)
        changed = np.flatnonzero(new_alive != state["alive"])
        state["alive"] = new_alive
        return changed

    def apply_dense(self, state, acc):
        new_alive = state["alive"] * (acc >= self.k)
        changed = np.flatnonzero(new_alive != state["alive"])
        state["alive"] = new_alive
        return changed

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= 1


class HitsAuthority(VertexProgram):
    """One authority half-step of HITS (Kleinberg 1999, public
    algorithm; no FOG counterpart — SURVEY.md 2.4 extension): every
    vertex sends its hub score along out-edges, so each vertex gathers
    auth_raw(v) = sum of hub(u) over in-edges. The external driver
    (:func:`fogray.algorithms.hits`) max-normalizes between half-steps;
    GLOBAL engine => self-loops included, matching the SQL oracle."""

    name = "hits_auth"
    engine = "global"
    combine = "sum"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("HITS state is managed by fogray.algorithms.hits")

    def scatter_view(self, state):
        return {"hub": state["hub"]}

    def scatter(self, state, s, d, w, direction):
        return d, state["hub"][s]

    def dense_gather(self, state):
        return state["hub"], False, 0.0

    def apply(self, state, ids, vals, preds=None):
        # dense rebuild: vertices receiving no update have auth_raw 0
        a = np.zeros(len(state["auth"]), dtype=np.float64)
        a[ids] = vals
        state["auth"] = a
        return ids

    def apply_dense(self, state, acc):
        state["auth"] = acc  # acc IS the dense rebuild
        return _EMPTY_IDS

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= 1


class HitsHub(VertexProgram):
    """The hub half-step: runs on the BACKWARD (dst-sorted / CSC) edge
    views — each vertex gathers hub_raw(u) = sum of auth(v) over its
    OUT-edges by emitting at ``s`` per the emission-target contract."""

    name = "hits_hub"
    engine = "global"
    combine = "sum"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("HITS state is managed by fogray.algorithms.hits")

    def scatter_view(self, state):
        return {"auth": state["auth"]}

    def scatter(self, state, s, d, w, direction):
        return s, state["auth"][d]

    def dense_gather(self, state):
        return state["auth"], False, 0.0

    def apply(self, state, ids, vals, preds=None):
        h = np.zeros(len(state["hub"]), dtype=np.float64)
        h[ids] = vals
        state["hub"] = h
        return ids

    def apply_dense(self, state, acc):
        state["hub"] = acc
        return _EMPTY_IDS

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= 1


class SalsaAuth(VertexProgram):
    """One authority half-step of SALSA (Lempel & Moran 2000, public
    algorithm): every vertex sends hub/outdeg along out-edges, so each
    vertex gathers auth(v) = Σ_in hub(u)/outdeg(u) — the random-walk
    (degree-normalized) twin of HITS. State is managed by
    :func:`fogray.algorithms.salsa`, which precomputes the per-vertex
    ``hub_over_out`` array before each half-step (one O(V) divide
    replaces an O(E) per-edge divide)."""

    name = "salsa_auth"
    engine = "global"
    combine = "sum"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("SALSA state is managed by fogray.algorithms.salsa")

    def scatter_view(self, state):
        return {"hub_over_out": state["hub_over_out"]}

    def scatter(self, state, s, d, w, direction):
        return d, state["hub_over_out"][s]

    def dense_gather(self, state):
        return state["hub_over_out"], False, 0.0

    def apply(self, state, ids, vals, preds=None):
        a = np.zeros(len(state["auth"]), dtype=np.float64)
        a[ids] = vals
        state["auth"] = a
        return ids

    def apply_dense(self, state, acc):
        state["auth"] = acc
        return _EMPTY_IDS

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= 1


class SalsaHub(VertexProgram):
    """One hub half-step of SALSA: hub(u) = Σ_out auth(v)/indeg(v),
    gathered on the BACKWARD edge views (emission target = src)."""

    name = "salsa_hub"
    engine = "global"
    combine = "sum"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("SALSA state is managed by fogray.algorithms.salsa")

    def scatter_view(self, state):
        return {"auth_over_in": state["auth_over_in"]}

    def scatter(self, state, s, d, w, direction):
        return s, state["auth_over_in"][d]

    def dense_gather(self, state):
        return state["auth_over_in"], False, 0.0

    def apply(self, state, ids, vals, preds=None):
        h = np.zeros(len(state["hub"]), dtype=np.float64)
        h[ids] = vals
        state["hub"] = h
        return ids

    def apply_dense(self, state, acc):
        state["hub"] = acc
        return _EMPTY_IDS

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= 1


class AnfMin(VertexProgram):
    """One max-propagation superstep of the ANF/HyperBall neighborhood
    function (Palmer et al. 2002 / Boldi et al. 2011, public
    algorithms) for ONE HLL bucket, expressed through the engine's MIN
    machinery on NEGATED registers: reg(v) <- min(reg(v), min_in reg(u))
    with reg = -rho. Driven per (bucket, hop) by
    :func:`fogray.algorithms.anf_registers`."""

    name = "anf_min"
    engine = "global"
    combine = "min"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("ANF state is managed by fogray.algorithms.anf_registers")

    def scatter_view(self, state):
        return {"reg": state["reg"]}

    def scatter(self, state, s, d, w, direction):
        return d, state["reg"][s]

    def apply(self, state, ids, vals, preds=None):
        cur = state["reg"][ids]
        take = vals < cur
        state["reg"][ids[take]] = vals[take]
        return ids[take]

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= 1


class SpMV(VertexProgram):
    """FOG SpMV — application/spmv.hpp: x=1.0, y=0.0; one GLOBAL
    iteration of y(v) += x(u)*w(u,v); self-loops included."""

    name = "spmv"
    engine = "global"
    combine = "sum"

    def init(self, n, outdeg, indeg, **params):
        return {
            "origin_value": np.ones(n, dtype=np.float64),
            "spmv_value": np.zeros(n, dtype=np.float64),
        }, None

    def scatter_view(self, state):
        return {"origin_value": state["origin_value"]}

    def scatter(self, state, s, d, w, direction):
        return d, state["origin_value"][s] * w

    def dense_gather(self, state):
        return state["origin_value"], True, 0.0

    def apply(self, state, ids, vals, preds=None):
        state["spmv_value"][ids] += vals
        return ids

    def apply_dense(self, state, acc):
        state["spmv_value"] += acc
        return _EMPTY_IDS

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= 1


class ConnectedComponents(VertexProgram):
    """FOG WCC — application/cc.hpp. TARGET engine; each iteration is a
    forward superstep then a backward superstep over the SAME frontier
    (the frontier bitmap is only cleared during the backward pass for
    fwd/bwd programs, cpu_thread.cpp:187-189,334-336; after_iteration
    flips direction and decrements loop_counter, cc.hpp:112-133), with
    the forward pass's gathered min-labels visible to the backward
    scatter. Gather: min label, schedule on change (cc.hpp:87-98)."""

    name = "cc"
    engine = "target"
    paired_fwd_bwd = True
    combine = "min"
    vid_valued_fields = ("component_root",)

    def init(self, n, outdeg, indeg, **params):
        state = {"component_root": np.arange(n, dtype=np.int64)}
        frontier = (outdeg > 0) | (indeg > 0)  # cc.hpp:40-45
        return state, frontier

    def scatter_view(self, state):
        return {"component_root": state["component_root"]}

    def scatter(self, state, s, d, w, direction):
        if direction == FWD:
            return d, state["component_root"][s]
        return s, state["component_root"][d]  # cc.hpp:56-63 backward

    def apply(self, state, ids, vals, preds=None):
        cur = state["component_root"][ids]
        m = vals < cur
        state["component_root"][ids[m]] = vals[m]
        return ids[m]


class LabelPropagation(ConnectedComponents):
    """Synchronous min-label propagation exposed as its own pipeline
    (SURVEY.md 2.4) — semantics identical to CC's gather (cc.hpp:87-98);
    labels start at vid and converge when no label changes."""

    name = "label_propagation"


class BFS(VertexProgram):
    """FOG BFS — application/bfs.hpp. TARGET, out-edges only, self-loops
    skipped; level=0 at root else UINT_MAX; upd=level(u)+1; min-gather
    with schedule-on-change."""

    name = "bfs"
    engine = "target"
    combine = "min"

    def init(self, n, outdeg, indeg, **params):
        root = int(params["root"])
        level = np.full(n, np.float64(UNREACHED))
        level[root] = 0.0
        frontier = np.zeros(n, dtype=bool)
        frontier[root] = True
        return {"bfs_level": level}, frontier

    def init_span(self, lo, hi, outdeg, indeg, **params):
        root = int(params["root"])
        level = np.full(hi - lo, np.float64(UNREACHED))
        frontier = np.zeros(hi - lo, dtype=bool)
        if lo <= root < hi:
            level[root - lo] = 0.0
            frontier[root - lo] = True
        return {"bfs_level": level}, frontier

    def scatter_view(self, state):
        return {"bfs_level": state["bfs_level"]}

    def scatter(self, state, s, d, w, direction):
        return d, state["bfs_level"][s] + 1.0

    def apply(self, state, ids, vals, preds=None):
        cur = state["bfs_level"][ids]
        m = vals < cur
        state["bfs_level"][ids[m]] = vals[m]
        return ids[m]


class SSSP(VertexProgram):
    """FOG SSSP — application/sssp.hpp. TARGET, weighted, self-loops
    skipped; gather guard ``not FLOAT_EQ(upd, value) and upd < value``
    with EPSILON=1e-3 (sssp.hpp:95-106, types.hpp:17-19). Updates of a
    superstep are combined by lexicographic (value, pred) min before the
    guard — see the documented deviation in fogray.oracle.sssp_fog."""

    name = "sssp"
    engine = "target"
    combine = "min_pred"

    def init(self, n, outdeg, indeg, **params):
        source = int(params["source"])
        value = np.full(n, np.inf, dtype=np.float64)
        value[source] = 0.0
        pred = np.full(n, np.float64(UNREACHED))
        frontier = np.zeros(n, dtype=bool)
        frontier[source] = True
        return {"value": value, "predecessor": pred}, frontier

    def init_span(self, lo, hi, outdeg, indeg, **params):
        source = int(params["source"])
        value = np.full(hi - lo, np.inf, dtype=np.float64)
        pred = np.full(hi - lo, np.float64(UNREACHED))
        frontier = np.zeros(hi - lo, dtype=bool)
        if lo <= source < hi:
            value[source - lo] = 0.0
            frontier[source - lo] = True
        return {"value": value, "predecessor": pred}, frontier

    def scatter_view(self, state):
        return {"value": state["value"]}

    def scatter(self, state, s, d, w, direction):
        return d, state["value"][s] + w, s.astype(np.float64)

    def apply(self, state, ids, vals, preds=None):
        cur = state["value"][ids]
        accept = (~((vals > cur - EPSILON) & (vals < cur + EPSILON))) & (vals < cur)
        ch = ids[accept]
        state["value"][ch] = vals[accept]
        state["predecessor"][ch] = preds[accept]
        return ch


class MISMinPrio(VertexProgram):
    """Half-step 1 of one deterministic-Luby MIS round (Luby 1986,
    public algorithm; no FOG counterpart — SURVEY.md 2.4 extension):
    every still-undecided vertex sends its (priority, vid) along
    out-edges; each receiver gathers the lexicographic min over its
    UNDECIDED neighbors (TARGET engine, frontier = undecided mask, so
    decided vertices cost nothing and self-loops are skipped — a vertex
    never competes with itself). Priorities are splitmix53(vid): 53-bit
    integers exact in float64, mirrored bit-for-bit by the oracle's
    mod-2^64 HUGEINT chain; the vid tiebreak makes the order total even
    under a hash collision. Driven by :func:`fogray.algorithms.mis`."""

    name = "mis_min_prio"
    engine = "target"
    combine = "min_pred"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("MIS state is managed by fogray.algorithms.mis")

    def scatter_view(self, state):
        return {"prio": state["prio"]}

    def scatter(self, state, s, d, w, direction):
        return d, state["prio"][s], s.astype(np.float64)

    def apply(self, state, ids, vals, preds=None):
        # dense rebuild: a vertex with NO undecided neighbor gathers
        # nothing -> (inf, inf) -> it always wins and joins the MIS.
        state["min_prio"].fill(np.inf)
        state["min_vid"].fill(np.inf)
        state["min_prio"][ids] = vals
        state["min_vid"][ids] = preds
        return ids


class MISNotify(VertexProgram):
    """Half-step 2: the round's new MIS entrants notify their neighbors
    (TARGET, frontier = entrants mask); undecided receivers become
    excluded. Emitted value is a constant — only the receiver set
    matters."""

    name = "mis_notify"
    engine = "target"
    combine = "min"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("MIS state is managed by fogray.algorithms.mis")

    def scatter_view(self, state):
        return {"prio": state["prio"][:1]}  # nothing read; keep the ship tiny

    def scatter(self, state, s, d, w, direction):
        return d, np.ones(len(np.asarray(d)), dtype=np.float64)

    def apply(self, state, ids, vals, preds=None):
        und = ids[state["status"][ids] == 0.0]
        state["status"][und] = 2.0
        return und


class KatzCentrality(VertexProgram):
    """Katz centrality (Katz 1953, public algorithm): fixed-iteration
    x_{t+1}(v) = 1 + alpha * sum over in-edges of x_t(u), GLOBAL engine
    (self-loops included, like the SQL mirror's plain edge join). Alpha
    defaults to the dyadic 1/256 — well under 1/lambda_max for the
    co-occurrence graphs, so values stay O(1) and float drift vs the
    oracle's summation order stays far beneath the 6-decimal round
    (the PageRank argument; a large alpha would amplify drift through
    the iterations faster than the round absorbs it)."""

    name = "katz"
    engine = "global"
    combine = "sum"

    def __init__(self, alpha: float = 1.0 / 256.0):
        self.alpha = float(alpha)

    def init(self, n, outdeg, indeg, **params):
        return {"x": np.ones(n, dtype=np.float64)}, None

    def scatter_view(self, state):
        return {"x": state["x"]}

    def scatter(self, state, s, d, w, direction):
        return d, state["x"][s]

    def dense_gather(self, state):
        return state["x"], False, 0.0

    def apply(self, state, ids, vals, preds=None):
        xn = np.ones(len(state["x"]), dtype=np.float64)
        xn[ids] = 1.0 + self.alpha * vals
        state["x"] = xn
        return ids

    def apply_dense(self, state, acc):
        state["x"] = 1.0 + self.alpha * acc
        return _EMPTY_IDS

    def apply_dist(self, state, ids, vals, preds=None):
        # span-view form of apply(): the whole-array replacement above
        # can't land through a _SpanState, so reset the slice to the
        # zero-in-sum value and overwrite the gathered ids in place.
        sh = state["x"]
        sh.arr[:] = 1.0
        sh[ids] = 1.0 + self.alpha * vals
        return ids

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= params.get("niters", 8)

    def fixed_iters(self, params):
        return int(params.get("niters", 8))


class EigenvectorCentrality(VertexProgram):
    """Eigenvector centrality by unnormalized power iteration (von
    Mises & Pollaczek-Geiringer 1929, public algorithm): fixed-iteration
    x_{t+1}(v) = sum over in-edges of x_t(u) from x_0 = 1, normalized
    ONCE at the end by max(x) (power iteration is scale-invariant, so
    skipping per-round normalization changes nothing but magnitude).
    With x_0 = 1 and unweighted edges every intermediate x_t(v) is the
    INTEGER count of t-walks ending at v — exact in float64 while the
    corpus-wide walk count stays < 2^53, which bounds the default
    niters=4 far below drift on every driver graph (sf0.01
    co-occurrence: ~3.5e11 total 4-walks). The final division by the
    shared max and the 6-decimal round are then bit-identical between
    engine and SQL oracle. GLOBAL engine, like Katz/SpMV."""

    name = "eigenvector"
    engine = "global"
    combine = "sum"

    def init(self, n, outdeg, indeg, **params):
        return {"x": np.ones(n, dtype=np.float64)}, None

    def scatter_view(self, state):
        return {"x": state["x"]}

    def scatter(self, state, s, d, w, direction):
        return d, state["x"][s]

    def dense_gather(self, state):
        return state["x"], False, 0.0

    def apply(self, state, ids, vals, preds=None):
        xn = np.zeros(len(state["x"]), dtype=np.float64)
        xn[ids] = vals
        state["x"] = xn
        return ids

    def apply_dense(self, state, acc):
        state["x"] = acc
        return _EMPTY_IDS

    def apply_dist(self, state, ids, vals, preds=None):
        sh = state["x"]
        sh.arr[:] = 0.0
        sh[ids] = vals
        return ids

    def done(self, completed_iters, frontier_count, params):
        return completed_iters >= params.get("niters", 4)

    def fixed_iters(self, params):
        return int(params.get("niters", 4))


class BrandesSigma(VertexProgram):
    """One shortest-path-count level of Brandes' betweenness (Brandes
    2001, public algorithm; no FOG counterpart — SURVEY.md 2.4
    extension): level-l vertices (the frontier) send their sigma along
    out-edges; the scatter masks emissions to EXACTLY next-level
    targets (level[d] == level[s] + 1 — shortest-path DAG edges only),
    so each level-(l+1) vertex gathers sigma(v) = sum of sigma over its
    predecessors. Driven level-by-level by
    :func:`fogray.algorithms.betweenness`. Sigma stays float64 on both
    engine and oracle (exact while < 2^53 — documented bound)."""

    name = "brandes_sigma"
    engine = "target"
    combine = "sum"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("state is managed by fogray.algorithms.betweenness")

    def scatter_view(self, state):
        return {"sig": state["sig"], "level": state["level"]}

    def scatter(self, state, s, d, w, direction):
        ok = state["level"][d] == state["level"][s] + 1.0
        return d[ok], state["sig"][s[ok]]

    def apply(self, state, ids, vals, preds=None):
        state["sig"][ids] = vals
        return ids


class BrandesDelta(VertexProgram):
    """One dependency-accumulation level of Brandes: level-(l+1)
    vertices w (the frontier) send (sigma(v)/sigma(w)) * (1 + delta(w))
    to each shortest-path predecessor v (the level mask selects
    level[d] == level[s] - 1); the gather sums the terms, finalizing
    delta for level l in one superstep. Reads state at BOTH endpoints —
    the broadcast engine ships the full scatter view, so this is
    per-edge vectorized, not a per-edge gather round-trip."""

    name = "brandes_delta"
    engine = "target"
    combine = "sum"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("state is managed by fogray.algorithms.betweenness")

    def scatter_view(self, state):
        return {
            "sig": state["sig"],
            "level": state["level"],
            "delta": state["delta"],
        }

    def scatter(self, state, s, d, w, direction):
        ok = state["level"][d] == state["level"][s] - 1.0
        sk, dk = s[ok], d[ok]
        return dk, (state["sig"][dk] / state["sig"][sk]) * (
            1.0 + state["delta"][sk]
        )

    def apply(self, state, ids, vals, preds=None):
        state["delta"][ids] = vals
        return ids


class SCCForward(VertexProgram):
    """One forward min-propagation pass of FOG's SCC fwd-bwd coloring
    (application/scc.hpp:149-156): min over updates, accepted only by
    not-yet-found vertices. Driven by fogray.algorithms.scc's outer loop
    (scc.hpp:189-207 finalize flips direction; fog_engine.cpp:103-231)."""

    name = "scc_fwd"
    engine = "target"
    combine = "min"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("SCC state is managed by fogray.algorithms.scc")

    def scatter(self, state, s, d, w, direction):
        dest, vals = d, state["component_root"][s]
        # gather guard depends only on superstep-start dest state =>
        # evaluated at scatter time (equivalent, see SURVEY.md 2.3)
        keep = (vals < state["component_root"][dest]) & (state["found"][dest] == 0)
        return dest[keep], vals[keep]

    def scatter_dist(self, state, s, d, w, direction):
        # range-partitioned engine: dest state is non-local, so the
        # scatter-time guard (an emission-dedup optimization) is dropped;
        # min-combine + the identical re-check in apply() give the same
        # accepted value per dest.
        return d, state["component_root"][s]

    def apply(self, state, ids, vals, preds=None):
        cur = state["component_root"][ids]
        m = (vals < cur) & (state["found"][ids] == 0)
        state["component_root"][ids[m]] = vals[m]
        return ids[m]


class SCCBackward(VertexProgram):
    """One backward confirmation pass (scc.hpp:157-166): scheduled v sends
    component_root(v) to its in-sources; u accepts iff the value equals
    prev_root(u) and u is not found -> u joins the SCC (found=true)."""

    name = "scc_bwd"
    engine = "target"
    combine = "min"

    def init(self, n, outdeg, indeg, **params):
        raise RuntimeError("SCC state is managed by fogray.algorithms.scc")

    #: dist engine: the bwd gather is "accept iff ANY incoming root ==
    #: prev_root(dest)" — not expressible as a min once the dest-side
    #: guard moves out of scatter, so partials are unique (dest, val)
    #: PAIRS (a valid pre-combine for an any-equals predicate); apply()
    #: tolerates repeated dest ids.
    dist_combine = "pair_unique"

    def scatter(self, state, s, d, w, direction):
        dest, vals = s, state["component_root"][d]
        keep = (vals == state["prev_root"][dest]) & (state["found"][dest] == 0)
        return dest[keep], vals[keep]

    def scatter_dist(self, state, s, d, w, direction):
        return s, state["component_root"][d]

    def apply(self, state, ids, vals, preds=None):
        m = (vals == state["prev_root"][ids]) & (state["found"][ids] == 0)
        ch = ids[m]
        state["component_root"][ch] = vals[m]
        state["found"][ch] = 1
        return ch


PROGRAMS = {
    p.name: p
    for p in (
        PageRank(),
        HitsAuthority(),
        HitsHub(),
        SalsaAuth(),
        SalsaHub(),
        AnfMin(),
        SpMV(),
        ConnectedComponents(),
        LabelPropagation(),
        BFS(),
        SSSP(),
        SCCForward(),
        SCCBackward(),
        MISMinPrio(),
        MISNotify(),
        BrandesSigma(),
        BrandesDelta(),
        KatzCentrality(),
        EigenvectorCentrality(),
    )
}
