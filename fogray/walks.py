"""Deterministic random-walk corpus generation (DeepWalk-style).

No reference counterpart (FOG has no sampling surface; SURVEY.md
section 2.6) — rebuild-defined as a training-data operator: the walk
table (walker, step, vertex) is the standard input for skip-gram graph
embeddings, and determinism is what makes it oracle-checkable and
resumable. The next-step choice is ``splitmix53(wid << 32 ^ step) mod
out_degree`` with neighbors ranked by ascending dst — a pure function
of (walker, step, adjacency), so any two runs (and the DuckDB
recursive-CTE mirror) agree bit-for-bit.

Dataflow: adjacency is sharded by contiguous src range across an actor
pool, every vertex's full neighbor list in exactly ONE shard (the same
group-complete invariant the engines rely on). Shards come from either
a driver-side table (degree-balanced split points snapped to src
boundaries) or, for edge tables that must never touch the driver, a
``ray.data.Dataset``: ONE sort by src, then the boundary-key planner
(fogray.derive.plan_key_groups — block order is NOT trusted) assigns
whole blocks to shards and each actor fetches only its refs from the
object store. The coordinator holds only the walker frontier (one vid
per live walker) and per step routes each walker id+position to the
shard owning its current vertex with one ``searchsorted`` — per-step
traffic is O(live walkers), never O(edges), and the L steps are L
small RPC waves against pinned adjacency, exactly the engine's
superstep shape. At cluster scale the walker frontier itself shards by
walker id across coordinators; the routing loop is unchanged (each
coordinator talks to the same shard pool), which is why the per-shard
API takes explicit (wids, curs, step) arrays rather than global state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .sources import splitmix53


@ray.remote
class WalkShard:
    """Pinned adjacency for one contiguous src range: edges (src, dst)
    sorted by (src, dst), CSR offsets built once in ``__init__``.
    Accepts a table or a list of object refs (fetched here,
    off-driver, like the engine actors)."""

    def __init__(self, tab):
        if isinstance(tab, list):
            tabs = [t if isinstance(t, pa.Table) else ray.get(t) for t in tab]
            tabs = [t for t in tabs if t.num_rows]
            tab = (
                pa.concat_tables(tabs, promote_options="default")
                if tabs
                else pa.table({"src": pa.array([], pa.int64()),
                               "dst": pa.array([], pa.int64())})
            )
        s = tab.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = tab.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, s))
        s, self.dst = s[order], d[order]
        self._src_sorted = s
        self._fused = None  # built lazily for biased-walk membership
        starts = (
            np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            if len(s)
            else np.empty(0, dtype=np.int64)
        )
        self.usrc = s[starts] if len(s) else np.empty(0, dtype=np.int64)
        self.offsets = np.r_[starts, len(s)]

    def start_vids(self) -> np.ndarray:
        return self.usrc

    def step(self, wids: np.ndarray, curs: np.ndarray, step_no: int) -> np.ndarray:
        """Next vid per walker (-1 = dead end: current vertex has no
        out-edges in the graph). All curs must lie in this shard's src
        range; vertices absent from the edge table resolve to -1."""
        if len(curs) == 0:
            return np.empty(0, dtype=np.int64)
        pos = np.searchsorted(self.usrc, curs)
        pos = np.minimum(pos, max(len(self.usrc) - 1, 0))
        found = (self.usrc[pos] == curs) if len(self.usrc) else np.zeros(len(curs), bool)
        deg = self.offsets[pos + 1] - self.offsets[pos]
        nxt = np.full(len(curs), -1, dtype=np.int64)
        ok = found & (deg > 0)
        if ok.any():
            h = splitmix53(
                (wids[ok].astype(np.uint64) << np.uint64(32))
                ^ np.uint64(int(step_no))
            )
            idx = (h % deg[ok].astype(np.uint64)).astype(np.int64)
            nxt[ok] = self.dst[self.offsets[pos[ok]] + idx]
        return nxt

    def cand_lists(self, curs: np.ndarray):
        """Ragged candidate lists for the biased (second-order) walk:
        -> (lengths, flat_dst) with each cur's out-neighbors in
        ascending dst order (absent vertices get length 0)."""
        if len(curs) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        from .engine import expand_ranges

        pos = np.searchsorted(self.usrc, curs)
        pos = np.minimum(pos, max(len(self.usrc) - 1, 0))
        found = (
            (self.usrc[pos] == curs) if len(self.usrc) else np.zeros(len(curs), bool)
        )
        lo = np.where(found, self.offsets[pos], 0)
        hi = np.where(found, self.offsets[pos + 1], 0)
        return (hi - lo).astype(np.int64), self.dst[expand_ranges(lo, hi)]

    def members(self, prevs: np.ndarray, cands: np.ndarray) -> np.ndarray:
        """Membership mask per (prev, cand) pair: cand ∈ N(prev)? ONE
        vectorized searchsorted over the shard's fused (src, dst) key
        array (lexsorted (src, dst) ⇒ src·K + dst is globally sorted
        for K > max dst) — no per-pair Python."""
        if len(prevs) == 0:
            return np.empty(0, dtype=bool)
        if len(self.dst) == 0:
            return np.zeros(len(prevs), dtype=bool)
        if self._fused is None:
            k = np.int64(int(self.dst.max()) + 1)
            self._fused = (self._src_sorted * k + self.dst, k)
        fused, k = self._fused
        q = prevs.astype(np.int64) * k + cands.astype(np.int64)
        # cands >= k (larger than any dst here) can't be members
        ok = cands < k
        pos = np.minimum(np.searchsorted(fused, q), len(fused) - 1)
        return ok & (fused[pos] == q)


def _shards_from_table(edges: pa.Table, num_shards: int):
    """Driver-table path: degree-balanced split points snapped to src
    run boundaries; each shard gets its slice via the object store."""
    s = edges.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    d = edges.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(s, kind="stable")
    s, d = s[order], d[order]
    p = max(1, min(num_shards, len(s) // 1024 or 1))
    cut_rows = (len(s) * np.arange(1, p)) // p
    run_starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    cuts = np.unique(run_starts[np.searchsorted(run_starts, cut_rows, side="left")])
    cuts = cuts[(cuts > 0) & (cuts < len(s))]
    starts_idx = np.r_[0, cuts]
    ends_idx = np.r_[cuts, len(s)]
    tab = pa.table({"src": s, "dst": d})
    shards = [
        WalkShard.remote(ray.put(tab.slice(int(a), int(b - a))))
        for a, b in zip(starts_idx, ends_idx)
    ]
    return shards, s[starts_idx]


def _shards_from_dataset(edges, num_shards: int):
    """Dataset path: ONE sort by src; the boundary-key planner groups
    blocks so every src is complete in one group (executor block order
    untrusted — fogray.derive.plan_key_groups), contiguous groups are
    chunked into <= num_shards actor sets, and each actor fetches only
    its block refs — the edge table never lands on the driver."""
    from .derive import _first_last_keys, plan_key_groups

    sorted_ds = edges.select_columns(["src", "dst"]).sort("src")
    refs = sorted_ds.materialize().to_arrow_refs()
    bounds = ray.get([_first_last_keys.remote(r, ["src"]) for r in refs])
    groups = plan_key_groups(bounds)
    if not groups:
        return [], np.empty(0, dtype=np.int64)
    # groups come back planner-ordered by first key, ranges disjoint
    group_first = [min(bounds[i][0][0] for i in g) for g in groups]
    n_chunks = max(1, min(num_shards, len(groups)))
    chunk_ids = np.array_split(np.arange(len(groups)), n_chunks)
    shards, shard_lo = [], []
    for ids in chunk_ids:
        if len(ids) == 0:
            continue
        chunk_refs = [refs[i] for gi in ids for i in groups[gi]]
        shards.append(WalkShard.remote(chunk_refs))
        shard_lo.append(group_first[int(ids[0])])
    return shards, np.asarray(shard_lo, dtype=np.int64)


def _walk_loop(shards, shard_lo: np.ndarray, start: np.ndarray, num_steps: int):
    """The per-step routing loop for one walker-frontier partition:
    route each live walker's current vertex to its owning shard (one
    searchsorted), one RPC wave per step against the SHARED pinned
    shard pool, drop dead-ended walkers. Pure in (start walkers,
    adjacency) — every frontier partition produces the same rows its
    walkers would produce in any other partition, which is what makes
    the multi-coordinator split exact. Returns (wid, step, vid)
    arrays including step 0."""
    wids = start.copy()
    curs = start.copy()
    out_w = [wids]
    out_s = [np.zeros(len(wids), dtype=np.int64)]
    out_v = [curs]
    for k in range(num_steps):
        if len(curs) == 0:
            break
        owner = np.clip(np.searchsorted(shard_lo, curs, side="right") - 1, 0, None)
        nxt = np.empty(len(curs), dtype=np.int64)
        futs, masks = [], []
        for i, sh in enumerate(shards):
            m = owner == i
            if m.any():
                futs.append(sh.step.remote(wids[m], curs[m], k))
                masks.append(m)
        for m, r in zip(masks, ray.get(futs)):
            nxt[m] = r
        alive = nxt >= 0
        wids, curs = wids[alive], nxt[alive]
        out_w.append(wids)
        out_s.append(np.full(len(wids), k + 1, dtype=np.int64))
        out_v.append(curs)
    return np.concatenate(out_w), np.concatenate(out_s), np.concatenate(out_v)


@ray.remote
class WalkCoordinator:
    """One walker-frontier partition's driver: owns a wid slice and
    runs :func:`_walk_loop` against the shared shard pool. Frontier
    state and output rows live here, not on the main driver — per-step
    driver traffic drops from O(all live walkers) to zero, and output
    assembly is C object-store tables. Coordinators never talk to each
    other: the next-step function is pure in (wid, step, adjacency),
    so the wid-space split is embarrassingly parallel."""

    def __init__(self, shards, shard_lo: np.ndarray):
        self.shards = shards
        self.shard_lo = shard_lo

    def run(self, start: np.ndarray, num_steps: int) -> pa.Table:
        w, s, v = _walk_loop(self.shards, self.shard_lo, start, num_steps)
        return pa.table({"wid": w, "step": s, "vid": v})


def random_walks(
    edges,
    *,
    num_steps: int,
    num_shards: int = 8,
    num_coordinators: int = 1,
) -> pa.Table:
    """One walk per distinct src vertex (wid = start vid), ``num_steps``
    deterministic steps; a walker halts at a vertex with no out-edges.
    Returns (wid, step, vid) including step 0. ``edges`` is a (src,
    dst) pyarrow Table (driver path) or ray.data.Dataset (distributed
    build; the edge table never materializes on the driver).

    ``num_coordinators`` > 1 shards the walker FRONTIER by wid range
    across that many :class:`WalkCoordinator` actors against the same
    shard pool — output is identical to the single-coordinator run
    (pytest-asserted) because each step is a pure function of
    (wid, step, adjacency)."""
    empty = pa.table(
        {
            "wid": pa.array([], pa.int64()),
            "step": pa.array([], pa.int64()),
            "vid": pa.array([], pa.int64()),
        }
    )
    if isinstance(edges, pa.Table):
        if edges.num_rows == 0:
            return empty
        shards, shard_lo = _shards_from_table(edges, num_shards)
    else:
        shards, shard_lo = _shards_from_dataset(edges, num_shards)
        if not shards:
            return empty

    start_vids = np.sort(np.concatenate(ray.get([sh.start_vids.remote() for sh in shards])))
    c = max(1, min(int(num_coordinators), len(start_vids) or 1))
    if c == 1:
        w, s, v = _walk_loop(shards, shard_lo, start_vids, num_steps)
        return pa.table({"wid": w, "step": s, "vid": v})
    coords = [WalkCoordinator.remote(shards, shard_lo) for _ in range(c)]
    slices = np.array_split(start_vids, c)
    tabs = ray.get(
        [
            co.run.remote(sl, num_steps)
            for co, sl in zip(coords, slices)
            if len(sl)
        ]
    )
    for co in coords:
        ray.kill(co)
    return pa.concat_tables(
        [t for t in tabs if t.num_rows], promote_options="default"
    ) if any(t.num_rows for t in tabs) else empty


# ---------------------------------------------------------------------------
# fan-out neighbor sampling (the GraphSAGE layer primitive)
# ---------------------------------------------------------------------------


def _fanout_block(t: pa.Table, fanout: int) -> pa.Table:
    """Per-src top-``fanout`` by (hv, dst) within one block — used both
    as the per-block pre-combine (partial top-k) and, after the one
    (src, hv, dst) sort makes src groups block-complete, as the final
    global selection. Vectorized: lexsort + group-run positions."""
    if t.num_rows == 0:
        return pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "hv": pa.array([], pa.uint64()),
            }
        )
    src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    if "hv" in t.column_names:
        hv = t.column("hv").to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        hv = splitmix53((src.astype(np.uint64) << np.uint64(32)) ^ dst.astype(np.uint64))
    o = np.lexsort((dst, hv, src))
    src, dst, hv = src[o], dst[o], hv[o]
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    sizes = np.diff(np.r_[starts, len(src)])
    rank = np.arange(len(src), dtype=np.int64) - np.repeat(starts, sizes)
    keep = rank < fanout
    return pa.table(
        {
            "src": pa.array(src[keep]),
            "dst": pa.array(dst[keep]),
            "hv": pa.array(hv[keep], pa.uint64()),
        }
    )


def sample_fanout(edges, fanout: int = 4) -> "ray.data.Dataset":
    """Deterministic per-vertex fan-out sampling: for every src keep
    the ≤``fanout`` out-neighbors with the smallest
    ``splitmix53((src << 32) ^ dst)`` (ties by dst — splitmix ties are
    measure-zero but the order must be total). This is the per-layer
    neighbor sampler a GraphSAGE-style trainer runs over the full edge
    table each epoch.

    Dataset-native at any scale: each block first pre-combines to its
    LOCAL per-src top-``fanout`` (the only exchange-volume knob —
    ≤ fanout rows per (src, block)), then ONE (src, hv, dst) sort makes
    src groups block-complete and the same kernel picks the global
    winners. No CSR, no broadcast, no driver-side edge rows; the
    exchange ships ≤ blocks × fanout rows per vertex.

    -> Dataset (src, dst, rk) with rk 1..fanout by (hv, dst).
    """
    import ray.data as rd

    from .derive import key_grouped_block_map

    partial = edges.select_columns(["src", "dst"]).map_batches(
        lambda t: _fanout_block(t, fanout), batch_format="pyarrow"
    )
    merged = key_grouped_block_map(
        partial.sort(["src", "hv", "dst"]),
        ["src"],
        lambda t: _fanout_block(t, fanout),
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        hv = t.column("hv").to_numpy(zero_copy_only=False)
        o = np.lexsort((dst, hv, src))
        src, dst = src[o], dst[o]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        sizes = np.diff(np.r_[starts, len(src)])
        rank = np.arange(len(src), dtype=np.int64) - np.repeat(starts, sizes)
        return pa.table(
            {
                "src": pa.array(src.astype(np.int64)),
                "dst": pa.array(dst.astype(np.int64)),
                "rk": pa.array(rank + 1),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# biased second-order walks (node2vec p/q semantics, integer weights)
# ---------------------------------------------------------------------------


def _biased_walk_loop(
    shards,
    shard_lo: np.ndarray,
    start: np.ndarray,
    num_steps: int,
    w_return: int,
    w_near: int,
    w_far: int,
):
    """Second-order walk rounds: per step, wave A fetches each walker's
    ascending candidate list from the shard owning its CURRENT vertex,
    wave B batches (prev, candidate) membership probes to the shard
    owning its PREVIOUS vertex, then the integer-weight pick is one
    global searchsorted over the flat inclusive-cumsum (weights are
    positive, so the flat cumsum is strictly increasing and the
    per-walker pick needs no Python loop). Step 0 has prev = -1, which
    matches nothing — every candidate gets w_far, a uniform first hop.
    All state is (wid, prev, cur) arrays; per-step traffic is
    O(Σ candidate-degree of live walkers)."""
    wids = start.copy()
    prev = np.full(len(start), -1, dtype=np.int64)
    curs = start.copy()
    out_w = [wids.copy()]
    out_s = [np.zeros(len(wids), dtype=np.int64)]
    out_v = [curs.copy()]
    for k in range(num_steps):
        if len(curs) == 0:
            break
        owner = np.clip(np.searchsorted(shard_lo, curs, side="right") - 1, 0, None)
        lens = np.zeros(len(curs), dtype=np.int64)
        flats: list[np.ndarray] = [None] * len(shards)
        masks: list = [None] * len(shards)
        futs = {}
        for i, sh in enumerate(shards):
            m = owner == i
            if m.any():
                futs[i] = sh.cand_lists.remote(curs[m])
                masks[i] = m
        for i, f in futs.items():
            ln, fl = ray.get(f)
            lens[masks[i]] = ln
            flats[i] = fl
        # assemble flat candidates in WALKER order
        flat = np.empty(int(lens.sum()), dtype=np.int64)
        ends = np.cumsum(lens)
        starts_ = ends - lens
        for i, f in futs.items():
            idx = np.flatnonzero(masks[i])
            pos = 0
            # vectorized scatter: contiguous per-walker runs
            from .engine import expand_ranges

            runs = expand_ranges(starts_[idx], ends[idx])
            flat[runs] = flats[i]
        alive_w = lens > 0
        # membership wave: (prev, cand) per candidate of walkers with prev >= 0
        cand_prev = np.repeat(prev, lens)
        member = np.zeros(len(flat), dtype=bool)
        probe = cand_prev >= 0
        if probe.any():
            p_owner = np.clip(
                np.searchsorted(shard_lo, cand_prev[probe], side="right") - 1, 0, None
            )
            pidx = np.flatnonzero(probe)
            mfuts, mmasks = [], []
            for i, sh in enumerate(shards):
                m = p_owner == i
                if m.any():
                    sel = pidx[m]
                    mfuts.append(sh.members.remote(cand_prev[sel], flat[sel]))
                    mmasks.append(sel)
            for sel, r in zip(mmasks, ray.get(mfuts)):
                member[sel] = r
        w = np.where(
            flat == np.repeat(prev, lens),
            np.int64(w_return),
            np.where(member, np.int64(w_near), np.int64(w_far)),
        ).astype(np.int64)
        cum = np.cumsum(w)
        totals = np.where(alive_w, cum[ends - 1] - np.where(starts_ > 0, cum[starts_ - 1], 0), 0)
        h = splitmix53(
            (wids.astype(np.uint64) << np.uint64(32)) ^ np.uint64(int(k))
        )
        nxt = np.full(len(curs), -1, dtype=np.int64)
        aw = np.flatnonzero(alive_w)
        if len(aw):
            r = (h[aw] % totals[aw].astype(np.uint64)).astype(np.int64)
            base = np.where(starts_[aw] > 0, cum[starts_[aw] - 1], 0)
            pick = np.searchsorted(cum, base + r, side="right")
            nxt[aw] = flat[pick]
        alive = nxt >= 0
        prev = curs[alive]
        wids, curs = wids[alive], nxt[alive]
        out_w.append(wids.copy())
        out_s.append(np.full(len(wids), k + 1, dtype=np.int64))
        out_v.append(curs.copy())
    return np.concatenate(out_w), np.concatenate(out_s), np.concatenate(out_v)


def biased_walks(
    edges,
    *,
    num_steps: int,
    num_shards: int = 8,
    w_return: int = 1,
    w_near: int = 4,
    w_far: int = 2,
) -> pa.Table:
    """node2vec-style biased second-order walks (Grover & Leskovec
    2016), one walk per distinct src vertex, fully deterministic:
    candidate x from cur with previous vertex prev gets INTEGER weight
    w_return if x == prev, w_near if x ∈ N(prev), else w_far
    (w_return/w_far = 1/p, w_near/w_far = 1/q scaled integral — integer
    cumsums make the pick r = splitmix53(wid<<32 ^ step) mod Σw exact on
    both sides, no float thresholds). -> (wid, step, vid) incl. step 0.
    """
    empty = pa.table(
        {
            "wid": pa.array([], pa.int64()),
            "step": pa.array([], pa.int64()),
            "vid": pa.array([], pa.int64()),
        }
    )
    if isinstance(edges, pa.Table):
        if edges.num_rows == 0:
            return empty
        shards, shard_lo = _shards_from_table(edges, num_shards)
    else:
        shards, shard_lo = _shards_from_dataset(edges, num_shards)
        if not shards:
            return empty
    start_vids = np.sort(
        np.concatenate(ray.get([sh.start_vids.remote() for sh in shards]))
    )
    w, s, v = _biased_walk_loop(
        shards, shard_lo, start_vids, num_steps, w_return, w_near, w_far
    )
    return pa.table({"wid": w, "step": s, "vid": v})
