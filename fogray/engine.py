"""The superstep runtime: FOG's scatter/gather engine
(fogsrc/fog_engine.cpp, fogsrc/cpu_thread.cpp) rebuilt on Ray.

Architecture (Ray-Data-first, designed for a multi-node cluster):

- **Edge partitions pinned in stateful actors.** The edge table (a
  ``ray.data.Dataset`` or arrays) is split into P partitions; each
  :class:`EdgePartitionActor` builds, ONCE in ``__init__``, a src-sorted
  view (CSR analog of the ``.edge``/``.index`` files,
  fogsrc/index_vert_array.cpp:25-167) and a dst-sorted view (CSC analog
  of ``.in-edge``/``.in-index`` — note the converter's entire external
  radix-sort + k-way-merge subsystem, convert/process_in_edge.cpp,
  collapses into one in-actor argsort). Actors live across supersteps,
  so edges are read from storage exactly once per job.

- **Vertex state is a dense driver-side array set, broadcast per
  superstep** via a single ``ray.put`` — the ``.attr`` array analog
  (fog_engine.cpp:377-403). On a cluster the object is shipped once per
  node and mapped zero-copy by every actor on it; this is the
  "broadcast small side instead of shuffle join" pattern (state is O(V),
  edges are O(E) >> O(V)).

- **Scatter is vectorized numpy** over frontier-filtered edge arrays
  (no per-edge calls — FOG's per-edge ``scatter_one_edge`` loop,
  cpu_thread.cpp:230-328, becomes array kernels), and each partition
  PRE-COMBINES its updates per destination (sum/min) before anything
  leaves the actor — the combiner that makes the per-superstep message
  exchange O(V) instead of O(E) per partition and that replaces FOG's
  per-(segment,cpu) update strips (cpu_thread.cpp:290-326). This
  pre-combine is also the skew answer: a hub vertex's millions of
  incoming updates collapse to <= P partial values before the exchange
  (FOG's analog machinery is work stealing, fog_engine.cpp:560-758).

- **Gather is a pairwise tree-reduce of the P partials** in Ray tasks
  (dense float accumulators for sum programs when V is small enough,
  sparse (ids, vals) partials otherwise), then the FOG
  ``gather_one_update`` rule is applied on the driver and the next
  frontier derived (add_schedule analog, fog_engine.cpp:2162-2214).

- **Per-superstep checkpoints** (state + frontier sharded by vid range,
  with an atomic manifest) make runs resumable mid-algorithm — FOG has
  no mid-run checkpoint (SURVEY.md section 4).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import ray

from .checkpoint import latest_checkpoint, load_checkpoint, write_checkpoint
from .config import EngineConfig
from .programs import BWD, FWD, VertexProgram


# ---------------------------------------------------------------------------
# vectorized helpers
# ---------------------------------------------------------------------------

def expand_ranges(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate [starts[i], ends[i]) index ranges, fully vectorized."""
    lens = (ends - starts).astype(np.int64)
    nz = lens > 0
    starts, lens = starts[nz].astype(np.int64), lens[nz]
    if len(starts) == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(int(lens.sum()), dtype=np.int64)
    out[0] = starts[0]
    cum = np.cumsum(lens)
    out[cum[:-1]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(out)


def _combine_sparse_sum(ids_a, vals_a, ids_b, vals_b):
    ids = np.concatenate([ids_a, ids_b])
    vals = np.concatenate([vals_a, vals_b])
    uids, inv = np.unique(ids, return_inverse=True)
    return uids, np.bincount(inv, weights=vals, minlength=len(uids))


def _combine_sparse_min(ids_a, vals_a, ids_b, vals_b):
    ids = np.concatenate([ids_a, ids_b])
    vals = np.concatenate([vals_a, vals_b])
    order = np.lexsort((vals, ids))
    ids, vals = ids[order], vals[order]
    first = np.ones(len(ids), dtype=bool)
    first[1:] = ids[1:] != ids[:-1]
    return ids[first], vals[first]


def _combine_sparse_min_pred(ids_a, vals_a, preds_a, ids_b, vals_b, preds_b):
    ids = np.concatenate([ids_a, ids_b])
    vals = np.concatenate([vals_a, vals_b])
    preds = np.concatenate([preds_a, preds_b])
    order = np.lexsort((preds, vals, ids))
    ids, vals, preds = ids[order], vals[order], preds[order]
    first = np.ones(len(ids), dtype=bool)
    first[1:] = ids[1:] != ids[:-1]
    return ids[first], vals[first], preds[first]


def local_combine(kind: str, n: int, dense: bool, dest, vals, preds=None):
    """Per-partition pre-combine of scattered updates by destination."""
    if kind == "sum":
        if dense:
            return ("dense", np.bincount(dest, weights=vals, minlength=n))
        uids, inv = np.unique(dest, return_inverse=True)
        return ("sparse", uids, np.bincount(inv, weights=vals, minlength=len(uids)))
    if kind == "min":
        order = np.lexsort((vals, dest))
        d, v = dest[order], vals[order]
        first = np.ones(len(d), dtype=bool)
        if len(d):
            first[1:] = d[1:] != d[:-1]
        return ("sparse", d[first], v[first])
    if kind == "min_pred":
        order = np.lexsort((preds, vals, dest))
        d, v, p = dest[order], vals[order], preds[order]
        first = np.ones(len(d), dtype=bool)
        if len(d):
            first[1:] = d[1:] != d[:-1]
        return ("sparse", d[first], v[first], p[first])
    raise ValueError(kind)


@ray.remote
def _reduce_pair(kind: str, a, b):
    """Tree-reduce combiner over two partials (runs in a worker so the
    exchange volume never funnels through the driver serially)."""
    pa_, pb = a[0], b[0]
    emitted = a[-1] + b[-1]
    if pa_[0] == "dense":
        return (("dense", pa_[1] + pb[1]), emitted)
    if kind == "sum":
        return (("sparse",) + _combine_sparse_sum(pa_[1], pa_[2], pb[1], pb[2]), emitted)
    if kind == "min":
        return (("sparse",) + _combine_sparse_min(pa_[1], pa_[2], pb[1], pb[2]), emitted)
    return (
        ("sparse",)
        + _combine_sparse_min_pred(pa_[1], pa_[2], pa_[3], pb[1], pb[2], pb[3]),
        emitted,
    )


# ---------------------------------------------------------------------------
# the pinned edge-partition actor
# ---------------------------------------------------------------------------

@ray.remote
class EdgePartitionActor:
    """Holds one edge partition as src-sorted and dst-sorted numpy views,
    built once (the rebuild of the mmapped ``index_vert_array`` CSR/CSC,
    fogsrc/index_vert_array.cpp:25-336). ``scatter`` runs the program's
    vectorized kernel over frontier-filtered edges and pre-combines."""

    def __init__(self, block_refs: list, n: int, has_weights: bool):
        # Ray emits empty map-output blocks as ZERO-COLUMN tables
        # (see fogray._ray_patches) — drop them before concatenating
        tables: list[pa.Table] = [
            t for t in ray.get(list(block_refs)) if t.num_rows > 0
        ]
        vid_t = np.int32 if n <= 2**31 - 1 else np.int64
        def _col(name, dtype):
            if not tables:
                return np.empty(0, dtype=dtype)
            return np.concatenate(
                [t.column(name).to_numpy(zero_copy_only=False) for t in tables]
            ).astype(dtype, copy=False)

        src = _col("src", vid_t)
        dst = _col("dst", vid_t)
        if has_weights:
            w = _col("weight", np.float64)
        else:
            w = np.ones(len(src), dtype=np.float64)
        del tables
        self.n = n
        fwd = np.argsort(src, kind="stable")
        self.fs, self.fd, self.fw = src[fwd], dst[fwd], w[fwd]
        bwd = np.argsort(dst, kind="stable")
        self.bs, self.bd, self.bw = src[bwd], dst[bwd], w[bwd]
        self.num_edges = len(src)

    def stats(self) -> dict:
        return {"edges": self.num_edges}

    def degree_partials(self):
        """Sparse (vid, count) partials for out- and in-degree; combined
        on the driver into the dense degree arrays (the converter's
        max_out_edges/degree bookkeeping, convert/process_edgelist.cpp)."""
        us, cs = np.unique(self.fs, return_counts=True)
        ud, cd = np.unique(self.bd, return_counts=True)
        return us.astype(np.int64), cs, ud.astype(np.int64), cd

    def scatter(
        self,
        program: VertexProgram,
        bcast,  # (state_dict, frontier_bool_or_None, active_ids_or_None)
        direction: str,
        dense: bool,
    ):
        state, frontier, active_ids = bcast
        if direction == FWD:
            s, d, w = self.fs, self.fd, self.fw
            key_sorted = self.fs
        else:
            s, d, w = self.bs, self.bd, self.bw
            key_sorted = self.bd

        if active_ids is not None:
            # sparse frontier: touch only active vertices' edge ranges
            # (bitmap-walk scatter analog, cpu_thread.cpp:168-171)
            starts = np.searchsorted(key_sorted, active_ids, side="left")
            ends = np.searchsorted(key_sorted, active_ids, side="right")
            idx = expand_ranges(starts, ends)
            s, d, w = s[idx], d[idx], w[idx]
        elif frontier is not None:
            m = frontier[key_sorted]
            s, d, w = s[m], d[m], w[m]

        if program.skip_self_loops and len(s):
            m = s != d  # cpu_thread.cpp:236-240 (TARGET skips self-loops)
            s, d, w = s[m], d[m], w[m]

        if len(s) == 0:
            if program.combine == "sum" and dense:
                return (("dense", np.zeros(self.n, dtype=np.float64)), 0)
            empty = np.empty(0, dtype=np.int64)
            ef = np.empty(0, dtype=np.float64)
            if program.combine == "min_pred":
                return (("sparse", empty, ef, ef.copy()), 0)
            return (("sparse", empty, ef), 0)

        out = program.scatter(state, s.astype(np.int64), d.astype(np.int64), w, direction)
        dest, vals = out[0], np.asarray(out[1], dtype=np.float64)
        preds = np.asarray(out[2], dtype=np.float64) if len(out) > 2 else None
        emitted = len(dest)
        partial = local_combine(program.combine, self.n, dense, dest, vals, preds)
        if partial[0] == "sparse":
            partial = ("sparse",) + tuple(
                np.asarray(x, dtype=np.float64) if i else np.asarray(x, dtype=np.int64)
                for i, x in enumerate(partial[1:])
            )
        return (partial, emitted)


# ---------------------------------------------------------------------------
# driver-side engine
# ---------------------------------------------------------------------------

@dataclass
class RunResult:
    state: dict[str, np.ndarray]
    frontier: np.ndarray | None
    supersteps: int
    metrics: list[dict] = field(default_factory=list)
    num_edges: int = 0
    wall_seconds: float = 0.0

    @property
    def edges_per_sec_per_iter(self) -> float:
        if self.wall_seconds == 0 or self.supersteps == 0:
            return 0.0
        return self.num_edges * self.supersteps / self.wall_seconds


class GraphEngine:
    """Driver-side orchestration of the superstep loop
    (fog_engine.cpp:91-243 rebuilt as a Python loop over Ray rounds)."""

    def __init__(
        self,
        n: int,
        *,
        dataset=None,
        arrays=None,
        cfg: EngineConfig | None = None,
        has_weights: bool = True,
    ):
        self.n = int(n)
        self.cfg = cfg or EngineConfig()
        p = self.cfg.num_partitions
        if p is None:
            p = max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))
        if dataset is not None:
            refs = dataset.to_arrow_refs()
        elif arrays is not None:
            src, dst, w = arrays
            t = pa.table(
                {
                    "src": np.asarray(src, dtype=np.int64),
                    "dst": np.asarray(dst, dtype=np.int64),
                    "weight": np.asarray(
                        w if w is not None else np.ones(len(src)), dtype=np.float64
                    ),
                }
            )
            chunk = max(1, (len(t) + p - 1) // p)
            refs = [ray.put(t.slice(i * chunk, chunk)) for i in range(p) if i * chunk < max(len(t), 1)]
            if not refs:
                refs = [ray.put(t)]
        else:
            raise ValueError("need dataset= or arrays=")
        p = min(p, len(refs)) or 1
        groups: list[list] = [[] for _ in range(p)]
        for i, r in enumerate(refs):
            groups[i % p].append(r)
        self.actors = [
            EdgePartitionActor.options(num_cpus=self.cfg.num_cpus_per_actor).remote(
                g, self.n, has_weights
            )
            for g in groups
        ]
        stats = ray.get([a.stats.remote() for a in self.actors])
        self.num_edges = sum(s["edges"] for s in stats)
        self.outdeg, self.indeg = self._degrees()

    def _degrees(self):
        outdeg = np.zeros(self.n, dtype=np.int64)
        indeg = np.zeros(self.n, dtype=np.int64)
        for us, cs, ud, cd in ray.get([a.degree_partials.remote() for a in self.actors]):
            np.add.at(outdeg, us, cs)
            np.add.at(indeg, ud, cd)
        return outdeg, indeg

    # -- one superstep -----------------------------------------------------

    def _broadcast(self, state, frontier):
        active_ids = None
        f = frontier
        if frontier is not None:
            count = int(frontier.sum())
            if count <= self.cfg.frontier_mask_cutoff * self.n:
                active_ids = np.flatnonzero(frontier).astype(np.int64)
                f = None
        else:
            count = self.n
        return ray.put((state, f, active_ids)), count

    def superstep(self, program: VertexProgram, state, frontier, direction: str):
        """scatter -> pre-combine -> tree-reduce gather -> apply. Returns
        (changed_ids, metrics)."""
        t0 = time.perf_counter()
        dense = program.combine == "sum" and self.n <= self.cfg.dense_threshold
        bcast, active_count = self._broadcast(state, frontier)
        futs = [
            a.scatter.remote(program, bcast, direction, dense) for a in self.actors
        ]
        while len(futs) > 1:
            nxt = []
            for i in range(0, len(futs) - 1, 2):
                nxt.append(_reduce_pair.remote(program.combine, futs[i], futs[i + 1]))
            if len(futs) % 2:
                nxt.append(futs[-1])
            futs = nxt
        (partial, emitted) = ray.get(futs[0])
        if partial[0] == "dense":
            acc = partial[1]
            ids = np.flatnonzero(acc)
            vals, preds = acc[ids], None
        else:
            ids = partial[1]
            vals = partial[2]
            preds = partial[3] if len(partial) > 3 else None
        changed = program.apply(state, ids, vals, preds)
        del bcast
        metrics = {
            "direction": direction,
            "active": active_count,
            "updates_emitted": int(emitted),
            "updates_applied": int(len(ids)),
            "changed": int(len(changed)),
            "wall_s": time.perf_counter() - t0,
        }
        return changed, metrics

    # -- full runs ---------------------------------------------------------

    def run(
        self,
        program: VertexProgram,
        params: dict | None = None,
        *,
        ckpt_dir: str | None = None,
        resume: bool = False,
        max_supersteps: int = 10_000,
    ) -> RunResult:
        params = params or {}
        t_start = time.perf_counter()
        state, frontier = program.init(self.n, self.outdeg, self.indeg, **params)
        state["outdeg"] = self.outdeg.astype(np.float64)
        completed = 0
        metrics: list[dict] = []
        if resume and ckpt_dir:
            found = latest_checkpoint(ckpt_dir)
            if found is not None:
                state, frontier, completed, metrics = load_checkpoint(
                    found, program.name, params
                )
        frontier_count = self.n if frontier is None else int(frontier.sum())
        while not program.done(completed, frontier_count, params):
            if completed >= max_supersteps:
                raise RuntimeError(f"{program.name}: exceeded {max_supersteps} supersteps")
            iter_metrics: list[dict] = []
            if program.paired_fwd_bwd:
                # cc.hpp:112-133: fwd then bwd over the SAME frontier; the
                # fwd pass's applied labels are visible to the bwd scatter
                nxt = np.zeros(self.n, dtype=bool)
                for direction in (FWD, BWD):
                    changed, m = self.superstep(program, state, frontier, direction)
                    nxt[changed] = True
                    iter_metrics.append(m)
                frontier = nxt
            else:
                changed, m = self.superstep(program, state, frontier, FWD)
                iter_metrics.append(m)
                if program.engine == "target":
                    frontier = np.zeros(self.n, dtype=bool)
                    frontier[changed] = True
            frontier_count = self.n if frontier is None else int(frontier.sum())
            completed += 1
            metrics.append(
                {
                    "superstep": completed,
                    "frontier_next": frontier_count,
                    "passes": iter_metrics,
                    "wall_s": sum(p["wall_s"] for p in iter_metrics),
                }
            )
            if ckpt_dir and self.cfg.ckpt_interval and completed % self.cfg.ckpt_interval == 0:
                write_checkpoint(
                    ckpt_dir,
                    completed,
                    program.name,
                    params,
                    state,
                    frontier,
                    metrics,
                    shards=self.cfg.ckpt_shards,
                )
        return RunResult(
            state=state,
            frontier=frontier,
            supersteps=completed,
            metrics=metrics,
            num_edges=self.num_edges,
            wall_seconds=time.perf_counter() - t_start,
        )

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
