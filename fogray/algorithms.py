"""Public algorithm entry points over a :class:`fogray.engine.GraphEngine`.

Each function returns a :class:`fogray.engine.RunResult` whose ``state``
holds the per-vertex attribute arrays with the reference's field names
(pagerank: ``rank``; cc: ``component_root``; bfs: ``bfs_level``; sssp:
``predecessor``/``value``; scc: ``prev_root``/``component_root``/
``found``; spmv: ``origin_value``/``spmv_value`` — headers cited in
fogray.programs).
"""

from __future__ import annotations

import time

import numpy as np

from .checkpoint import latest_checkpoint, load_checkpoint, write_checkpoint
from .engine import GraphEngine, RunResult
from .oracle import UNREACHED
from .programs import BWD, FWD, PROGRAMS


def pagerank(engine: GraphEngine, niters: int = 10, *, ckpt_dir=None,
             resume=False, init_rank=None) -> RunResult:
    params = {"niters": niters}
    if init_rank is not None:
        params["init_rank"] = init_rank
    return engine.run(
        PROGRAMS["pagerank"], params, ckpt_dir=ckpt_dir, resume=resume
    )


def connected_components(engine: GraphEngine, *, ckpt_dir=None, resume=False) -> RunResult:
    return engine.run(PROGRAMS["cc"], {}, ckpt_dir=ckpt_dir, resume=resume)


def label_propagation(engine: GraphEngine, *, ckpt_dir=None, resume=False) -> RunResult:
    return engine.run(PROGRAMS["label_propagation"], {}, ckpt_dir=ckpt_dir, resume=resume)


def bfs(engine: GraphEngine, root: int, *, ckpt_dir=None, resume=False) -> RunResult:
    return engine.run(PROGRAMS["bfs"], {"root": root}, ckpt_dir=ckpt_dir, resume=resume)


def sssp(engine: GraphEngine, source: int, *, ckpt_dir=None, resume=False) -> RunResult:
    return engine.run(PROGRAMS["sssp"], {"source": source}, ckpt_dir=ckpt_dir, resume=resume)


def spmv(engine: GraphEngine, *, ckpt_dir=None, resume=False) -> RunResult:
    return engine.run(PROGRAMS["spmv"], {}, ckpt_dir=ckpt_dir, resume=resume)


def wpagerank(
    engine: GraphEngine, wsum, niters: int = 10, *, ckpt_dir=None, resume=False
) -> RunResult:
    """Weighted FOG-semantics PageRank (programs.WeightedPageRank);
    ``wsum`` is the O(V) per-vertex out-weight sum (exact float64 —
    co-occurrence weights are integer counts)."""
    from .programs import WeightedPageRank

    return engine.run(
        WeightedPageRank(wsum), {"niters": niters}, ckpt_dir=ckpt_dir, resume=resume
    )


def katz(engine: GraphEngine, niters: int = 8, *, ckpt_dir=None, resume=False) -> RunResult:
    return engine.run(
        PROGRAMS["katz"], {"niters": niters}, ckpt_dir=ckpt_dir, resume=resume
    )


def eigenvector(engine: GraphEngine, niters: int = 4, *, ckpt_dir=None, resume=False) -> RunResult:
    """Power-iteration eigenvector centrality (unnormalized walk
    counts; see programs.EigenvectorCentrality). Caller normalizes by
    max(x) once at the end."""
    return engine.run(
        PROGRAMS["eigenvector"], {"niters": niters}, ckpt_dir=ckpt_dir, resume=resume
    )


def ppr(engine: GraphEngine, source: int, niters: int = 10, *, ckpt_dir=None, resume=False) -> RunResult:
    """Personalized PageRank seeded at ``source`` (FOG pagerank
    mechanics; see programs.PersonalizedPageRank)."""
    from .programs import PersonalizedPageRank

    return engine.run(
        PersonalizedPageRank(source), {"niters": niters},
        ckpt_dir=ckpt_dir, resume=resume,
    )


def hits(engine: GraphEngine, niters: int = 5) -> RunResult:
    """HITS hubs-and-authorities over the directed edge set: per
    iteration, an authority half-step on the FORWARD edge views
    (auth_raw(v) = sum of hub over in-edges) then a hub half-step on
    the BACKWARD views (hub_raw(u) = sum of auth over out-edges), each
    followed by a driver-side max-normalize (exactly mirrorable in SQL,
    unlike an L2 norm's sqrt-of-ulp-drifting-sum). No intermediate
    rounding: like the pagerank oracle, drift vs DuckDB's summation
    order stays orders of magnitude under the final 6-decimal round.
    Same external-driver pattern as :func:`kcore`."""
    from .dist_engine import DistGraphEngine
    from .programs import PROGRAMS as _P

    if isinstance(engine, DistGraphEngine):
        raise NotImplementedError(
            "hits' max-normalize needs a global reduce between half-steps; "
            "run it on fogray.engine.GraphEngine (HITS state is two floats "
            "per vertex, so broadcast is the right engine here)"
        )
    t_start = time.perf_counter()
    n = engine.n
    state = {
        "hub": np.ones(n, dtype=np.float64),
        "auth": np.zeros(n, dtype=np.float64),
    }
    metrics: list[dict] = []
    steps = 0
    for _ in range(niters):
        for prog_name, field_, direction in (
            ("hits_auth", "auth", FWD),
            ("hits_hub", "hub", BWD),
        ):
            _, m = engine.superstep(_P[prog_name], state, None, direction)
            mx = state[field_].max() if n else 0.0
            if mx > 0:
                state[field_] = state[field_] / mx
            steps += 1
            m["superstep"] = steps
            metrics.append(m)
    return RunResult(
        state=state,
        frontier=None,
        supersteps=steps,
        metrics=metrics,
        num_edges=engine.num_edges,
        wall_seconds=time.perf_counter() - t_start,
    )


def anf_registers(
    engine: GraphEngine, bucket: np.ndarray, rho: np.ndarray,
    m: int = 16, hops: int = 2
) -> np.ndarray:
    """ANF/HyperBall register propagation: every vertex starts with its
    own single HLL register (md5-derived bucket + leading-zero-run rho,
    the repo's integer-exact sketch hashing), and ``hops`` rounds of
    per-bucket MAX over in-neighbors ∪ self spread them — afterwards
    register (v, b) holds the max rho of any bucket-b vertex within
    ``hops`` of v, so the standard HLL estimator on v's row estimates
    |ball(v, hops)| including v. Runs as m × hops engine supersteps of
    the MIN machinery on negated registers (exact: registers are small
    integers in float64). Returns the (n, m) register matrix."""
    n = engine.n
    regs = np.zeros((n, m), dtype=np.float64)
    from .programs import PROGRAMS as _P

    for b in range(m):
        x = np.zeros(n, dtype=np.float64)
        mask = bucket == b
        x[mask] = -rho[mask].astype(np.float64)
        state = {"reg": x}
        for _ in range(hops):
            engine.superstep(_P["anf_min"], state, None, FWD)
        regs[:, b] = -state["reg"]
    return regs


def salsa(engine: GraphEngine, niters: int = 4) -> RunResult:
    """SALSA hubs-and-authorities (Lempel & Moran 2000): per iteration
    an authority half-step auth(v) = Σ_in hub(u)/outdeg(u) on the
    FORWARD views, then a hub half-step hub(u) = Σ_out auth(v)/indeg(v)
    on the BACKWARD views, from hub₀ = 1. No normalization — the
    degree-normalized walk conserves mass (unlike HITS). Zero-outdeg
    vertices never scatter, so their hub is finalized to the empty-sum
    0 once at the end (the oracle's COALESCE), exactly like zero-indeg
    authorities stay 0. The per-vertex hub/outdeg (auth/indeg) arrays
    are derived ONCE per half-step — an O(V) divide instead of O(E)."""
    from .dist_engine import DistGraphEngine
    from .programs import PROGRAMS as _P

    if isinstance(engine, DistGraphEngine):
        raise NotImplementedError(
            "salsa's half-step schedule is driven externally; run it on "
            "fogray.engine.GraphEngine (state is two floats per vertex)"
        )
    t_start = time.perf_counter()
    n = engine.n
    out_safe = np.maximum(engine.outdeg.astype(np.float64), 1.0)
    in_safe = np.maximum(engine.indeg.astype(np.float64), 1.0)
    state = {
        "hub": np.ones(n, dtype=np.float64),
        "auth": np.zeros(n, dtype=np.float64),
    }
    metrics: list[dict] = []
    steps = 0
    for _ in range(niters):
        state["hub_over_out"] = state["hub"] / out_safe
        _, m = engine.superstep(_P["salsa_auth"], state, None, FWD)
        steps += 1
        m["superstep"] = steps
        metrics.append(m)
        state["auth_over_in"] = state["auth"] / in_safe
        _, m = engine.superstep(_P["salsa_hub"], state, None, BWD)
        steps += 1
        m["superstep"] = steps
        metrics.append(m)
    state["hub"][engine.outdeg == 0] = 0.0  # empty out-sum
    return RunResult(
        state=state,
        frontier=None,
        supersteps=steps,
        metrics=metrics,
        num_edges=engine.num_edges,
        wall_seconds=time.perf_counter() - t_start,
    )


def kcore(engine: GraphEngine, k: int, *, max_rounds: int = 10_000) -> RunResult:
    """k-core decomposition by synchronous peeling over a symmetric
    edge set: every round recounts alive-neighbor degrees in one GLOBAL
    superstep (programs.KCoreRound) and kills vertices below k; stops
    at the fixpoint (no flips). The same external-driver pattern as
    :func:`scc` — the program holds no convergence state."""
    from .dist_engine import DistGraphEngine
    from .programs import KCoreRound

    if isinstance(engine, DistGraphEngine):
        raise NotImplementedError(
            "kcore's fixpoint driver uses the broadcast superstep API; "
            "run it on fogray.engine.GraphEngine (peeling state is one "
            "float per vertex, so broadcast is the right engine here)"
        )
    t_start = time.perf_counter()
    prog = KCoreRound(k)
    state, _ = prog.init(engine.n, engine.outdeg, engine.indeg)
    state["outdeg"] = engine.outdeg.astype(np.float64)
    metrics: list[dict] = []
    rounds = 0
    while rounds < max_rounds:
        changed, m = engine.superstep(prog, state, None, FWD)
        rounds += 1
        m["superstep"] = rounds
        metrics.append(m)
        if len(changed) == 0:
            break
    return RunResult(
        state=state,
        frontier=None,
        supersteps=rounds,
        metrics=metrics,
        num_edges=engine.num_edges,
        wall_seconds=time.perf_counter() - t_start,
    )


def betweenness(
    engine: GraphEngine, *, num_sources: int = 4, max_level: int = 6
) -> RunResult:
    """Sampled Brandes betweenness (Brandes 2001): for each of the
    ``num_sources`` lowest vids with out-edges, BFS levels, then one
    sigma superstep per level downward and one delta superstep per
    level upward (programs.BrandesSigma / BrandesDelta — the frontier
    is the level set, the scatter masks to shortest-path-DAG edges).
    bc(v) = sum of delta over sources, v != source. Paths are truncated
    at ``max_level`` hops on BOTH engine and oracle (the unrolled SQL
    needs a fixed level count; real eccentricities here are 3-4, so the
    cap is inert at test scale — at larger diameters it makes this the
    standard k-hop-bounded betweenness approximation). Per-source cost:
    one BFS + <= 2·max_level supersteps over pinned edge actors; the
    sample size is a constant, not a function of V."""
    from .programs import BrandesDelta, BrandesSigma

    t_start = time.perf_counter()
    n = engine.n
    psig, pdel = BrandesSigma(), BrandesDelta()
    sources = np.flatnonzero(engine.outdeg > 0)[:num_sources]
    bc = np.zeros(n, dtype=np.float64)
    metrics: list[dict] = []
    steps = 0
    for s0 in sources:
        lv = bfs(engine, root=int(s0)).state["bfs_level"]
        reached = lv < np.float64(UNREACHED)
        maxl = min(int(lv[reached].max()), max_level) if reached.any() else 0
        state = {
            "sig": np.zeros(n, dtype=np.float64),
            "level": lv,
            "delta": np.zeros(n, dtype=np.float64),
        }
        state["sig"][s0] = 1.0
        for lev in range(maxl):
            _, m = engine.superstep(psig, state, lv == lev, FWD)
            steps += 1
            m["superstep"] = steps
            metrics.append(m)
        for lev in range(maxl, 0, -1):
            _, m = engine.superstep(pdel, state, lv == lev, FWD)
            steps += 1
            m["superstep"] = steps
            metrics.append(m)
        mask = reached & (lv >= 1.0) & (lv <= maxl)
        bc[mask] += state["delta"][mask]
    return RunResult(
        state={"bc": bc},
        frontier=None,
        supersteps=steps,
        metrics=metrics,
        num_edges=engine.num_edges,
        wall_seconds=time.perf_counter() - t_start,
    )


def mis(engine: GraphEngine, *, rounds: int = 12) -> RunResult:
    """Deterministic-Luby maximal independent set over a SYMMETRIC edge
    set: each round is two frontier supersteps — (1) undecided vertices
    exchange (splitmix53-priority, vid) and the lexicographic-min winner
    against its undecided neighborhood joins the MIS (a vertex with no
    undecided neighbor always joins: maximality), (2) entrants notify
    neighbors, which become excluded. Runs AT MOST ``rounds`` rounds so
    the fixed-unroll SQL oracle stays exact even unconverged; stopping
    early at the no-undecided fixpoint is equivalent because empty
    rounds are no-ops on both sides. Same external-driver pattern as
    :func:`kcore`."""
    from .dist_engine import DistGraphEngine
    from .programs import MISMinPrio, MISNotify
    from .sources import splitmix53

    if isinstance(engine, DistGraphEngine):
        raise NotImplementedError(
            "mis's entrant decision is a driver-side O(V) vectorized rule; "
            "run it on fogray.engine.GraphEngine (MIS state is a few floats "
            "per vertex, so broadcast is the right engine here)"
        )
    t_start = time.perf_counter()
    n = engine.n
    prio = splitmix53(np.arange(n, dtype=np.uint64)).astype(np.float64)
    state = {
        "status": np.zeros(n, dtype=np.float64),  # 0 undecided / 1 in / 2 out
        "prio": prio,
        "min_prio": np.full(n, np.inf),
        "min_vid": np.full(n, np.inf),
    }
    p1, p2 = MISMinPrio(), MISNotify()
    touched = (engine.outdeg > 0) | (engine.indeg > 0)
    vids = np.arange(n, dtype=np.float64)
    metrics: list[dict] = []
    steps = 0
    for _ in range(rounds):
        undecided = touched & (state["status"] == 0.0)
        if not undecided.any():
            break
        _, m1 = engine.superstep(p1, state, undecided, FWD)
        steps += 1
        m1["superstep"] = steps
        metrics.append(m1)
        wins = (state["prio"] < state["min_prio"]) | (
            (state["prio"] == state["min_prio"]) & (vids < state["min_vid"])
        )
        entrants = undecided & wins
        state["status"][entrants] = 1.0
        _, m2 = engine.superstep(p2, state, entrants, FWD)
        steps += 1
        m2["superstep"] = steps
        metrics.append(m2)
    return RunResult(
        state=state,
        frontier=None,
        supersteps=steps,
        metrics=metrics,
        num_edges=engine.num_edges,
        wall_seconds=time.perf_counter() - t_start,
    )


def _scc_build(state, lo, hi, outdeg, indeg):
    """Slice-local SCC state construction + trivial-SCC marking
    (scc.hpp:48-54): deg-0 vertices are their own components."""
    vids = np.arange(lo, hi, dtype=np.float64)
    state.clear()
    state["prev_root"] = np.full(hi - lo, np.float64(UNREACHED))
    state["component_root"] = vids.copy()
    state["found"] = np.zeros(hi - lo, dtype=np.int64)
    trivial = (outdeg == 0) | (indeg == 0)
    state["found"][trivial] = 1
    state["prev_root"][trivial] = vids[trivial]
    state["component_root"][trivial] = vids[trivial]
    return ~trivial


def _scc_init_fwd(state, lo, hi, outdeg, indeg):
    """Pre-forward re-init (scc.hpp:69-77), slice-local."""
    vids = np.arange(lo, hi, dtype=np.float64)
    m = state["component_root"] != state["prev_root"]
    state["prev_root"][m] = state["component_root"][m]
    state["component_root"][m] = vids[m]
    return m


def _scc_init_bwd(state, lo, hi, outdeg, indeg):
    """Pre-backward re-init (scc.hpp:78-99), slice-local."""
    vids = np.arange(lo, hi, dtype=np.float64)
    changed = state["component_root"] != state["prev_root"]
    state["prev_root"][changed] = state["component_root"][changed]
    state["component_root"][changed] = vids[changed]
    own_root = changed & (state["component_root"] == state["prev_root"])
    state["found"][own_root] = 1
    unchanged_unfound = (~changed) & (state["found"] == 0)
    state["found"][unchanged_unfound] = 1
    return own_root | unchanged_unfound


def scc_dist(engine, *, ckpt_dir=None, resume=False, max_rounds: int = 10_000) -> RunResult:
    """FOG SCC on the range-partitioned engine: the init phases run as
    slice-local transforms INSIDE the state actors (engine.map_state) —
    the multi-pass driver never sees a vertex array, only counts."""
    t_start = time.perf_counter()
    out_loop, direction = 0, FWD
    superstep_no = 0
    metrics: list[dict] = []
    frontier_count = engine.map_state(_scc_build)
    resumed_mid_pass = False
    if resume and ckpt_dir:
        got = engine._resume(ckpt_dir, "scc", {})
        if got is not None:
            superstep_no, metrics, frontier_count = got
            out_loop = metrics[-1]["out_loop"]
            direction = metrics[-1]["direction"]
            if frontier_count > 0:
                resumed_mid_pass = True
            else:
                direction = BWD if direction == FWD else FWD
                out_loop += 1

    while out_loop < max_rounds:
        if resumed_mid_pass:
            resumed_mid_pass = False
        elif out_loop == 0 and superstep_no == 0:
            pass  # frontier from _scc_build
        elif direction == FWD:
            frontier_count = engine.map_state(_scc_init_fwd)
        else:
            frontier_count = engine.map_state(_scc_init_bwd)
        if frontier_count == 0:
            break

        prog = PROGRAMS["scc_fwd"] if direction == FWD else PROGRAMS["scc_bwd"]
        while frontier_count:
            m = engine._superstep(prog, direction)
            frontier_count = sum(
                __import__("ray").get(
                    [a.swap_frontier.remote() for a in engine.state_actors]
                )
            )
            superstep_no += 1
            m.update(
                {"superstep": superstep_no, "out_loop": out_loop, "direction": direction}
            )
            metrics.append(m)
            if ckpt_dir and engine.cfg.ckpt_interval and superstep_no % engine.cfg.ckpt_interval == 0:
                engine._write_checkpoint(ckpt_dir, superstep_no, "scc", {}, metrics)

        direction = BWD if direction == FWD else FWD
        out_loop += 1

    state, frontier = engine.collect_state()
    return RunResult(
        state=state,
        frontier=None,
        supersteps=superstep_no,
        metrics=metrics,
        num_edges=engine.num_edges,
        wall_seconds=time.perf_counter() - t_start,
    )


def scc(engine: GraphEngine, *, ckpt_dir=None, resume=False, max_rounds: int = 10_000) -> RunResult:
    """FOG SCC: the multi-pass forward/backward coloring driver
    (application/scc.hpp re-init logic at :46-102, finalize direction
    flips at :189-207, outer loop fog_engine.cpp:103-231).

    Round structure: an *init phase* (re-derives schedule + state from the
    previous pass, exactly the scc.hpp rules) followed by a
    single-direction pass run to fixpoint. The outer loop stops when an
    init phase schedules nothing (fog_engine.cpp:112-115).
    """
    from .dist_engine import DistGraphEngine

    if isinstance(engine, DistGraphEngine):
        return scc_dist(engine, ckpt_dir=ckpt_dir, resume=resume, max_rounds=max_rounds)
    t_start = time.perf_counter()
    n = engine.n
    state = {
        "prev_root": np.full(n, np.float64(UNREACHED)),
        "component_root": np.arange(n, dtype=np.float64),
        "found": np.zeros(n, dtype=np.int64),
    }
    out_loop, direction = 0, FWD
    superstep_no = 0
    metrics: list[dict] = []
    resume_frontier: np.ndarray | None = None
    if resume and ckpt_dir:
        found_ck = latest_checkpoint(ckpt_dir)
        if found_ck is not None:
            state, resume_frontier, superstep_no, metrics = load_checkpoint(
                found_ck, "scc", {}
            )
            out_loop = metrics[-1]["out_loop"]
            direction = metrics[-1]["direction"]
            if resume_frontier is None or not resume_frontier.any():
                # checkpoint landed exactly on a pass boundary
                direction = BWD if direction == FWD else FWD
                out_loop += 1
                resume_frontier = None

    vids = np.arange(n, dtype=np.float64)
    while out_loop < max_rounds:
        # ---- init phase (scc.hpp:46-102), skipped when resuming mid-pass
        if resume_frontier is not None:
            frontier = resume_frontier
            resume_frontier = None
        elif out_loop == 0:
            trivial = (engine.outdeg == 0) | (engine.indeg == 0)  # scc.hpp:48-54
            state["found"][trivial] = 1
            state["prev_root"][trivial] = vids[trivial]
            state["component_root"][trivial] = vids[trivial]
            frontier = ~trivial
        elif direction == FWD:
            m = state["component_root"] != state["prev_root"]  # scc.hpp:69-77
            state["prev_root"][m] = state["component_root"][m]
            state["component_root"][m] = vids[m]
            frontier = m
        else:
            changed = state["component_root"] != state["prev_root"]  # scc.hpp:78-99
            state["prev_root"][changed] = state["component_root"][changed]
            state["component_root"][changed] = vids[changed]
            # newly-minted own roots (vid == old component_root) are found+scheduled
            own_root = changed & (state["component_root"] == state["prev_root"])
            state["found"][own_root] = 1
            unchanged_unfound = (~changed) & (state["found"] == 0)
            state["found"][unchanged_unfound] = 1
            frontier = own_root | unchanged_unfound

        if not frontier.any():
            break  # init phase scheduled nothing, fog_engine.cpp:112-115

        # ---- one direction's pass to fixpoint ----
        prog = PROGRAMS["scc_fwd"] if direction == FWD else PROGRAMS["scc_bwd"]
        while frontier.any():
            changed_ids, m = engine.superstep(prog, state, frontier, direction)
            frontier = np.zeros(n, dtype=bool)
            frontier[changed_ids] = True
            superstep_no += 1
            m.update(
                {"superstep": superstep_no, "out_loop": out_loop, "direction": direction}
            )
            metrics.append(m)
            if ckpt_dir and engine.cfg.ckpt_interval and superstep_no % engine.cfg.ckpt_interval == 0:
                # frontier is re-derivable from state by the next init
                # phase only at pass boundaries; checkpoint carries it.
                write_checkpoint(
                    ckpt_dir, superstep_no, "scc", {}, state, frontier, metrics,
                    shards=engine.cfg.ckpt_shards,
                )

        direction = BWD if direction == FWD else FWD  # scc.hpp:189-207
        out_loop += 1

    return RunResult(
        state=state,
        frontier=None,
        supersteps=superstep_no,
        metrics=metrics,
        num_edges=engine.num_edges,
        wall_seconds=time.perf_counter() - t_start,
    )
