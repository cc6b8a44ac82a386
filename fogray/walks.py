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
pool (degree-balanced split points snapped to src boundaries, so every
vertex's full neighbor list lives in exactly ONE shard — the same
group-complete invariant the engines rely on). The coordinator holds
only the walker frontier (one vid per live walker) and per step routes
each walker id+position to the shard owning its current vertex with
one ``searchsorted`` — per-step traffic is O(live walkers), never
O(edges), and the L steps are L small RPC waves against pinned
adjacency, exactly the engine's superstep shape. At cluster scale the
walker frontier itself shards by walker id across coordinators; the
routing loop is unchanged (each coordinator talks to the same shard
pool), which is why the per-shard API takes explicit (wids, curs,
step) arrays rather than global state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .sources import splitmix53


@ray.remote
class WalkShard:
    """Pinned adjacency for one contiguous src range: edges (src, dst)
    sorted by (src, dst), CSR offsets built once in ``__init__``."""

    def __init__(self, tab: pa.Table):
        s = tab.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = tab.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, s))
        s, self.dst = s[order], d[order]
        starts = (
            np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            if len(s)
            else np.empty(0, dtype=np.int64)
        )
        self.usrc = s[starts] if len(s) else np.empty(0, dtype=np.int64)
        self.offsets = np.r_[starts, len(s)]

    def ready(self) -> bool:
        return True

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


def random_walks(
    edges: pa.Table,
    *,
    num_steps: int,
    num_shards: int = 8,
) -> pa.Table:
    """One walk per distinct src vertex (wid = start vid), ``num_steps``
    deterministic steps; a walker halts at a vertex with no out-edges.
    Returns (wid, step, vid) including step 0. ``edges`` is the (src,
    dst) table; order does not matter (shards re-sort their slice)."""
    s = edges.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    d = edges.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(s) == 0:
        return pa.table(
            {
                "wid": pa.array([], pa.int64()),
                "step": pa.array([], pa.int64()),
                "vid": pa.array([], pa.int64()),
            }
        )
    order = np.argsort(s, kind="stable")
    s, d = s[order], d[order]
    # degree-balanced shard bounds snapped to src run boundaries so each
    # vertex's whole neighbor list lands in exactly one shard
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
    shard_lo = s[starts_idx]  # shard i owns src in [shard_lo[i], shard_lo[i+1])
    ray.get([sh.ready.remote() for sh in shards])

    start_vids = s[run_starts]
    wids = start_vids.copy()
    curs = start_vids.copy()
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
    return pa.table(
        {
            "wid": np.concatenate(out_w),
            "step": np.concatenate(out_s),
            "vid": np.concatenate(out_v),
        }
    )
