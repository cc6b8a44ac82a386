"""Fully-distributed superstep engine: vertex state SHARDED across
stateful actors by explicit vid ranges — the multi-node scale path.

:class:`fogray.engine.GraphEngine` broadcasts the dense vertex state
from the driver each superstep (right when state is small relative to
edges, O(V) << O(E)); at 10^8+ vertices the driver becomes both a
memory ceiling and a serialization funnel. This engine removes the
driver from the data path entirely:

- **Vertex state lives in :class:`StatePartitionActor`\\ s**, one per
  contiguous vid range (explicit RANGE partitioning — the rebuild of
  FOG's attribute *segments*, headers/config.hpp:57-68, where
  ``VID_TO_SEGMENT`` ranged the ``.attr`` file; here each segment is
  pinned in an actor instead of LRU-paged from disk,
  fog_engine.cpp:1060-1313). Range bounds are drawn from the cumulative
  DEGREE histogram, not the vid count, so hub-heavy prefixes don't
  overload one actor.

- **Edge partitions are balanced by EDGE COUNT**, splitting a hub
  vertex's edge list across several :class:`DistEdgeActor`\\ s when it
  exceeds a partition (skew-aware splitting of hub vertices — FOG's
  analog is mid-scatter work stealing, fog_engine.cpp:560-758, which
  re-splits an overloaded CPU's range; here the split is static because
  edge counts are known up front). Each actor holds a src-sorted span
  (CSR analog) and a dst-sorted span (CSC analog) built once in
  ``__init__``.

- **The per-superstep message exchange is actor -> object store ->
  actor.** Scatter returns ``num_returns=P`` per-destination-range
  partials (each pre-combined by sum/min inside the edge actor — the
  combiner that caps a hub's in-flight updates at one value per edge
  partition); the driver passes the *refs* straight to the owning state
  actors, which fetch and reduce them locally. No O(V) or O(E) bytes
  ever transit the driver — it only routes ObjectRefs and reads scalar
  counts, so superstep cost at the driver is O(P^2) refs.

- **Scatter-side locality is by construction**: the forward view is
  partitioned by src and forward kernels read state/frontier only at
  ``s``; the backward view by dst, reading only at ``d`` (see
  fogray.programs — the SCC backward guard, the one dest-side read, is
  moved into the apply via unique-(dest,val) pairs, combine
  ``pair_unique``). Each edge actor therefore needs only the state
  slices overlapping its contiguous src (or dst) span, shipped as
  shared-object refs, once per superstep per direction.

- **Checkpoints are written in parallel by the state actors** (one
  vid-range shard each, sha256 lineage), the driver only writes the
  manifest — same on-disk format as fogray.checkpoint, so dense-engine
  and dist-engine checkpoints are mutually resumable.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import ray

from .checkpoint import _params_key, latest_checkpoint
from .config import EngineConfig
from .engine import RunResult, expand_ranges
from .programs import BWD, FWD, VertexProgram


class _Shifted:
    """A vid-range slice of a per-vertex array, indexable by ABSOLUTE
    vid — so vertex-program kernels written against dense arrays
    (``state["rank"][s]``) run unmodified on a partition slice."""

    __slots__ = ("arr", "lo")

    def __init__(self, arr: np.ndarray, lo: int):
        self.arr = arr
        self.lo = lo

    def __getitem__(self, idx):
        return self.arr[idx - self.lo]

    def __setitem__(self, idx, val):
        self.arr[idx - self.lo] = val


class _SpanState:
    """dict-of-_Shifted view over one or more concatenated slices."""

    def __init__(self, arrays: dict[str, np.ndarray], lo: int):
        self._arrays = arrays
        self._lo = lo

    def __getitem__(self, field: str) -> _Shifted:
        return _Shifted(self._arrays[field], self._lo)

    def __contains__(self, field) -> bool:
        return field in self._arrays


class _GatherPlan:
    """Precomputed routing of ONE static index array (an edge view's
    read-key column) through the state partition bounds: built once per
    (actor, direction), reused every superstep. Turns the sharded
    gather from per-superstep searchsorted + P boolean-mask passes over
    O(E_span) indices into P contiguous fancy-gathers + one inverse
    permutation (~2 passes)."""

    __slots__ = ("key", "order", "cuts", "rel")

    def __init__(self, key: np.ndarray, bounds: np.ndarray):
        self.key = key
        part = np.searchsorted(bounds, key, side="right") - 1
        order = np.argsort(part, kind="stable")
        self.order = order.astype(np.int32) if len(order) < 2**31 else order
        sp = part[self.order]
        P = len(bounds) - 1
        self.cuts = np.searchsorted(sp, np.arange(P + 1))
        rel = np.asarray(key, dtype=np.int64)[self.order] - bounds[sp]
        self.rel = rel.astype(np.int32) if (len(rel) == 0 or rel.max() < 2**31) else rel

    def gather(self, slices: list[np.ndarray]) -> np.ndarray:
        dtype = slices[0].dtype if slices else np.float64
        out_sorted = np.empty(len(self.key), dtype=dtype)
        for j in range(len(self.cuts) - 1):
            a, b = self.cuts[j], self.cuts[j + 1]
            if b > a:
                out_sorted[a:b] = slices[j][self.rel[a:b]]
        out = np.empty_like(out_sorted)
        out[self.order] = out_sorted
        return out


class _ShardedField:
    """Read-only per-vertex field assembled from the state partitions'
    exported slices WITHOUT concatenating them: absolute-vid fancy
    indexing routes each index to its owning slice (one searchsorted +
    one pass per touched partition). The slices stay zero-copy plasma
    views, so a pull-mode edge actor reads O(V) shared bytes but
    allocates only O(indices-it-reads) heap. When indexed with the
    exact array a :class:`_GatherPlan` was built for, the precomputed
    routing is used instead."""

    __slots__ = ("slices", "bounds", "plan")

    def __init__(self, slices: list[np.ndarray], bounds: np.ndarray, plan=None):
        self.slices = slices
        self.bounds = bounds
        self.plan = plan

    def __getitem__(self, idx):
        if self.plan is not None and idx is self.plan.key:
            return self.plan.gather(self.slices)
        idx = np.asarray(idx, dtype=np.int64)
        out = np.empty(idx.shape, dtype=self.slices[0].dtype)
        part = np.searchsorted(self.bounds, idx, side="right") - 1
        for j in np.unique(part):
            m = part == j
            out[m] = self.slices[j][idx[m] - self.bounds[j]]
        return out


class _ShardedState:
    """dict-of-_ShardedField over all state partitions (pull-mode
    scatter: read state at ANY vid, no dense copy)."""

    def __init__(self, slices: list[dict], bounds: np.ndarray, plan=None):
        self._slices = slices
        self._bounds = bounds
        self._plan = plan

    def __getitem__(self, field: str) -> _ShardedField:
        return _ShardedField(
            [sl[field] for sl in self._slices], self._bounds, self._plan
        )

    def __contains__(self, field) -> bool:
        return bool(self._slices) and field in self._slices[0]


def _combine_for_range(kind: str, lo: int, hi: int, dest, vals, preds=None):
    """Pre-combine updates destined for vid range [lo, hi); dest is
    absolute. Returns a partial tuple (see apply_updates)."""
    if kind == "sum":
        span = hi - lo
        if len(dest) == 0:
            return ("sparse_sum", np.empty(0, np.int64), np.empty(0, np.float64))
        if len(dest) < span // 4:
            # sparse partial: far fewer updates than the span is wide —
            # shipping a dense span-sized array would be mostly zeros
            # (the round-1 O(P_e x V) exchange pathology)
            uids, inv = np.unique(dest, return_inverse=True)
            return (
                "sparse_sum",
                uids.astype(np.int64),
                np.bincount(inv, weights=vals, minlength=len(uids)),
            )
        return ("dense", np.bincount(dest - lo, weights=vals, minlength=span))
    if len(dest) == 0:
        e = np.empty(0, dtype=np.int64)
        f = np.empty(0, dtype=np.float64)
        if kind == "min_pred":
            return ("sparse", e, f, f.copy())
        return ("sparse", e, f)
    if kind == "min":
        order = np.lexsort((vals, dest))
        d, v = dest[order], vals[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = d[1:] != d[:-1]
        return ("sparse", d[first].astype(np.int64), v[first].astype(np.float64))
    if kind == "min_pred":
        order = np.lexsort((preds, vals, dest))
        d, v, p = dest[order], vals[order], preds[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = d[1:] != d[:-1]
        return (
            "sparse",
            d[first].astype(np.int64),
            v[first].astype(np.float64),
            p[first].astype(np.float64),
        )
    if kind == "pair_unique":
        bits = np.ascontiguousarray(vals, dtype=np.float64).view(np.int64)
        pairs = np.stack([dest.astype(np.int64), bits], axis=1)
        uniq = np.unique(pairs, axis=0)
        return (
            "sparse",
            np.ascontiguousarray(uniq[:, 0]),
            np.ascontiguousarray(uniq[:, 1]).view(np.float64),
        )
    raise ValueError(kind)


@ray.remote
class DistEdgeActor:
    """One edge-count-balanced span of the src-sorted edge array (CSR
    side) plus one span of the dst-sorted array (CSC side), pinned as
    numpy in ``__init__`` (index_vert_array rebuild,
    fogsrc/index_vert_array.cpp:25-336). A span may begin/end mid-vertex
    — that IS the hub split."""

    def __init__(self, fwd_blocks: list, bwd_blocks: list, state_bounds: np.ndarray,
                 presorted: bool = True):
        def _cat(blocks, cols, sort_by):
            ts = [t for t in ray.get(list(blocks)) if t.num_rows > 0 and t.num_columns > 0]
            out = []
            for c in cols:
                if not ts:
                    out.append(np.empty(0, dtype=np.float64 if c == "weight" else np.int64))
                elif c == "weight" and c not in ts[0].column_names:
                    out.append(np.ones(sum(len(t) for t in ts), dtype=np.float64))
                else:
                    out.append(
                        np.concatenate(
                            [t.column(c).to_numpy(zero_copy_only=False) for t in ts]
                        )
                    )
            if not presorted and len(out[0]):
                order = np.argsort(out[sort_by], kind="stable")
                out = [x[order] for x in out]
            return tuple(out)

        # fwd view must be src-sorted, bwd view dst-sorted; blocks from
        # ds.sort(...) arrive sorted (presorted=True), driver-sliced
        # lexsorted arrays too
        self.fs, self.fd, self.fw = _cat(fwd_blocks, ("src", "dst", "weight"), 0)
        self.bs, self.bd, self.bw = _cat(bwd_blocks, ("src", "dst", "weight"), 1)
        # int32 vids when they fit: the scatter wave is memory-bandwidth
        # bound, so halving the edge-array bytes is ~free throughput
        vmax = max(
            (int(a.max()) for a in (self.fs, self.fd, self.bs, self.bd) if len(a)),
            default=0,
        )
        if vmax < np.iinfo(np.int32).max:
            self.fs, self.fd = self.fs.astype(np.int32), self.fd.astype(np.int32)
            self.bs, self.bd = self.bs.astype(np.int32), self.bd.astype(np.int32)
        self.bounds = state_bounds  # vid range bounds of the state partitions
        # per-direction pull-mode plans, built lazily on first use:
        # (read-side _GatherPlan, per-state-partition emission cut/rel)
        self._pull_plans: dict = {}
        # state-partition spans this actor's views overlap (driver reads
        # these once to know which slice refs to ship each superstep)
        self.fwd_span = self._span_of(self.fs)
        self.bwd_span = self._span_of(self.bd)

    def _span_of(self, keys: np.ndarray) -> tuple[int, int]:
        if len(keys) == 0:
            return (0, 0)
        lo_p = int(np.searchsorted(self.bounds, int(keys[0]), side="right") - 1)
        hi_p = int(np.searchsorted(self.bounds, int(keys[-1]), side="right") - 1)
        return (lo_p, hi_p + 1)  # [lo_p, hi_p) state partition index range

    def meta(self) -> dict:
        return {
            "fwd_edges": len(self.fs),
            "bwd_edges": len(self.bs),
            "fwd_span": self.fwd_span,
            "bwd_span": self.bwd_span,
        }

    def degree_partials(self):
        us, cs = np.unique(self.fs, return_counts=True)
        ud, cd = np.unique(self.bd, return_counts=True)
        return us.astype(np.int64), cs, ud.astype(np.int64), cd

    def scatter(self, program: VertexProgram, direction: str, *slices):
        """PUSH-mode scatter: run the program's vectorized kernel over
        the READ-side-sorted span (fwd view for FWD), filtered by the
        span's frontier slice, and return one pre-combined partial PER
        STATE PARTITION (invoked with num_returns=P; Ray ships each
        straight to its consumer). Right for sparse-frontier programs:
        few updates => sparse partials. For all-active sum programs use
        :meth:`scatter_pull` (one range-local partial, O(V) exchange)."""
        if direction == FWD:
            s, d, w, key = self.fs, self.fd, self.fw, self.fs
            span = self.fwd_span
        else:
            s, d, w, key = self.bs, self.bd, self.bw, self.bd
            span = self.bwd_span
        lo = int(self.bounds[span[0]]) if span[1] > span[0] else 0
        arrays = {}
        if slices:
            for f in slices[0]:
                arrays[f] = (
                    np.concatenate([sl[f] for sl in slices])
                    if len(slices) > 1
                    else slices[0][f]
                )
        state = _SpanState(arrays, lo)

        frontier = arrays.get("__frontier")
        if frontier is not None and len(key):
            if frontier.mean() < 0.05:
                # sparse frontier: CSR range expansion over the sorted
                # key instead of an O(E) mask (bitmap-walk analog,
                # cpu_thread.cpp:168-171)
                active = np.flatnonzero(frontier) + lo
                starts = np.searchsorted(key, active, side="left")
                ends = np.searchsorted(key, active, side="right")
                from .engine import expand_ranges as _er

                idx = _er(starts, ends)
                s, d, w = s[idx], d[idx], w[idx]
            else:
                m = frontier[key - lo]
                s, d, w = s[m], d[m], w[m]
        if program.skip_self_loops and len(s):
            m = s != d
            s, d, w = s[m], d[m], w[m]

        combine = getattr(program, "dist_combine", program.combine)
        P = len(self.bounds) - 1
        if len(s) == 0:
            return tuple(
                (
                    _combine_for_range(
                        combine,
                        int(self.bounds[j]),
                        int(self.bounds[j + 1]),
                        np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.float64),
                    ),
                    0,
                )
                for j in range(P)
            )

        scatter = getattr(program, "scatter_dist", program.scatter)
        out = scatter(state, s, d, w, direction)
        dest = np.asarray(out[0], dtype=np.int64)
        vals = np.asarray(out[1], dtype=np.float64)
        preds = np.asarray(out[2], dtype=np.float64) if len(out) > 2 else None

        # route by destination range: one searchsorted, then per-range
        # pre-combine (the update_map/strip routing of cpu_thread.cpp:
        # 290-326, minus the overflow machinery — backpressure is Ray's)
        part = np.searchsorted(self.bounds, dest, side="right") - 1
        order = np.argsort(part, kind="stable")
        dest, vals, part = dest[order], vals[order], part[order]
        if preds is not None:
            preds = preds[order]
        cuts = np.searchsorted(part, np.arange(P + 1))
        outs = []
        for j in range(P):
            a, b = cuts[j], cuts[j + 1]
            outs.append(
                (
                    _combine_for_range(
                        combine,
                        int(self.bounds[j]),
                        int(self.bounds[j + 1]),
                        dest[a:b],
                        vals[a:b],
                        preds[a:b] if preds is not None else None,
                    ),
                    int(b - a),
                )
            )
        return tuple(outs)

    def scatter_pull(self, program: VertexProgram, direction: str, *slices):
        """PULL-mode scatter for sum-combine programs (emission-target
        partitioning — the round-2 fix for the O(P_e x V) exchange):
        scatter over the view sorted by the EMISSION key (FWD emits at
        dst => the dst-sorted span; BWD emits at src => the src-sorted
        span), so this actor only ever produces updates for its own
        contiguous key range — ONE range-local dense partial split at
        the state-partition boundaries it overlaps (usually 1-2), O(V)
        exchange total across all edge actors, independent of P_e.

        The read side (state at arbitrary src for FWD) comes from ALL
        state partitions' exported slices: the object store dedupes the
        fetch per node (zero-copy plasma mappings) and
        :class:`_ShardedField` indexes them without a dense concatenate,
        so per-actor heap is O(edges-in-span), not O(V). Invoked with
        ``num_returns = span[1]-span[0]`` (from :meth:`meta`)."""
        combine = getattr(program, "dist_combine", program.combine)
        if combine != "sum":
            raise ValueError("pull scatter requires sum combine")
        if direction == FWD:
            s, d, w = self.bs, self.bd, self.bw  # dst-sorted: emission-sorted
            emit_arr, read_key = d, s
            span = self.bwd_span
        else:
            s, d, w = self.fs, self.fd, self.fw  # src-sorted
            emit_arr, read_key = s, d
            span = self.fwd_span
        nparts = span[1] - span[0]
        emit_lo = int(emit_arr[0]) if len(emit_arr) else 0
        emit_hi = int(emit_arr[-1]) + 1 if len(emit_arr) else 0

        # plans for the STATIC arrays, built once per direction: the
        # read-side gather routing and the emission cuts/relative
        # targets at the state-partition boundaries. Valid only while
        # the views are unfiltered — any frontier / self-loop filtering
        # below falls back to the generic paths.
        plans = self._pull_plans.get(direction)
        if plans is None:
            read_plan = _GatherPlan(read_key, self.bounds)
            emit_cuts = {}
            for j in range(span[0], span[1]):
                lo = max(int(self.bounds[j]), emit_lo)
                hi = min(int(self.bounds[j + 1]), emit_hi)
                a, b = np.searchsorted(emit_arr, (lo, hi))
                rel = np.asarray(emit_arr[a:b], dtype=np.int64) - lo
                if len(rel) == 0 or rel.max() < 2**31:
                    rel = rel.astype(np.int32)
                emit_cuts[j] = (lo, hi, int(a), int(b), rel)
            plans = (read_plan, emit_cuts)
            self._pull_plans[direction] = plans
        read_plan, emit_cuts = plans

        state = _ShardedState(list(slices), self.bounds, plan=read_plan)
        filtered = False
        if "__frontier" in state and len(read_key):
            m = state["__frontier"][read_key]
            s, d, w = s[m], d[m], w[m]
            filtered = True
        if program.skip_self_loops and len(s):
            m = s != d
            s, d, w = s[m], d[m], w[m]
            filtered = True

        def _cut(j):
            lo = max(int(self.bounds[j]), emit_lo)
            hi = min(int(self.bounds[j + 1]), emit_hi)
            return lo, hi

        if len(s) == 0:
            outs = []
            for j in range(span[0], span[1]):
                lo, hi = _cut(j)
                outs.append(
                    (("dense_at", lo, np.zeros(max(hi - lo, 0), dtype=np.float64)), 0)
                )
            return tuple(outs) if nparts != 1 else outs[0]

        scatter = getattr(program, "scatter_dist", program.scatter)
        out = scatter(state, s, d, w, direction)
        vals = np.asarray(out[1], dtype=np.float64)
        outs = []
        if not filtered and out[0] is emit_arr:
            # identity fast path: the program emitted the untouched
            # (emission-key-sorted) target array — reuse the precomputed
            # cuts and relative targets, no per-superstep allocation
            for j in range(span[0], span[1]):
                lo, hi, a, b, rel = emit_cuts[j]
                outs.append(
                    (
                        (
                            "dense_at",
                            lo,
                            np.bincount(
                                rel, weights=vals[a:b], minlength=max(hi - lo, 0)
                            ),
                        ),
                        int(b - a),
                    )
                )
            return tuple(outs) if nparts != 1 else outs[0]
        dest = np.asarray(out[0], dtype=np.int64)  # sorted: emission-key order
        for j in range(span[0], span[1]):
            lo, hi = _cut(j)
            a, b = np.searchsorted(dest, (lo, hi))
            outs.append(
                (
                    (
                        "dense_at",
                        lo,
                        np.bincount(
                            dest[a:b] - lo, weights=vals[a:b], minlength=max(hi - lo, 0)
                        ),
                    ),
                    int(b - a),
                )
            )
        return tuple(outs) if nparts != 1 else outs[0]


@ray.remote
class StatePartitionActor:
    """Owns vids [lo, hi): the per-vertex attribute slice, the frontier
    slice, and the degree slices. Applies combined updates with the
    program's gather rule, maintains the frontier, exports its slice as
    one shared object per superstep, and writes its own checkpoint
    shard (per-partition lineage, north_rule)."""

    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = int(lo), int(hi)
        self.state: dict[str, np.ndarray] = {}
        # double-buffered frontier (FOG's two context bitmaps per CPU,
        # fog_engine.cpp:2366-2549): scatter reads `frontier`, gather
        # schedules into `next_frontier`, the driver swaps at iteration
        # end — so CC's bwd pass sees the iteration-start frontier even
        # after the fwd pass applied changes.
        self.frontier: np.ndarray | None = None
        self.next_frontier: np.ndarray | None = None

    def set_degrees(self, outdeg_slice: np.ndarray, indeg_slice: np.ndarray):
        self.outdeg = outdeg_slice
        self.indeg = indeg_slice

    def init_program(self, program: VertexProgram, params: dict):
        """Slice-local init via the program's span hook."""
        state, frontier = program.init_span(
            self.lo, self.hi, self.outdeg, self.indeg, **params
        )
        state["outdeg"] = self.outdeg.astype(np.float64)
        self.state = state
        self.frontier = frontier
        self.next_frontier = (
            np.zeros(self.hi - self.lo, dtype=bool) if frontier is not None else None
        )
        return int(frontier.sum()) if frontier is not None else (self.hi - self.lo)

    def transform(self, fn, *args):
        """Run a slice-local vectorized transform (SCC init phases):
        fn(state, lo, hi, outdeg, indeg, *args) -> frontier_slice | None.
        Returns the new frontier count."""
        out = fn(self.state, self.lo, self.hi, self.outdeg, self.indeg, *args)
        if out is not None:
            self.frontier = out
            self.next_frontier = np.zeros(self.hi - self.lo, dtype=bool)
        return int(self.frontier.sum()) if self.frontier is not None else self.hi - self.lo

    def export(self, program: VertexProgram | None = None):
        """One shared object per superstep: the slice arrays + frontier
        (fetched via the object store by every edge actor whose span
        overlaps — on a cluster each node materializes it at most once).
        When a program is given, its ``scatter_view`` derivation runs
        HERE, per slice (element-wise by contract, so slice-local is
        exact): the derived array is usually smaller than the full
        state, and programs like PageRank then read ONE field per edge
        instead of two."""
        out = dict(self.state if program is None else program.scatter_view(self.state))
        if self.frontier is not None:
            out["__frontier"] = self.frontier
        return out

    def apply_updates(self, program: VertexProgram, *partials):
        """Reduce the P_e pre-combined partials for this range and apply
        the gather rule (gather_one_update analog, applied once per dest
        on the combined value — valid because every program's gather is
        commutative/associative, SURVEY.md 2.3). Changed vertices are
        scheduled into the NEXT frontier buffer."""
        combine = getattr(program, "dist_combine", program.combine)
        parts = [p for (p, _emitted) in partials]
        emitted = sum(e for (_p, e) in partials)
        if combine == "sum":
            # partials may mix dense (whole range), dense_at (pull-mode
            # sub-range) and sparse_sum (few updates) — accumulate all
            # into one range-sized buffer
            acc = np.zeros(self.hi - self.lo, dtype=np.float64)
            for p in parts:
                if p[0] == "dense":
                    acc += p[1]
                elif p[0] == "dense_at":
                    off = p[1] - self.lo
                    acc[off : off + len(p[2])] += p[2]
                else:  # sparse_sum: absolute ids, pre-combined vals
                    np.add.at(acc, p[1] - self.lo, p[2])
            idx = np.flatnonzero(acc)
            ids = idx + self.lo
            vals, preds = acc[idx], None
        else:
            ids = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
            vals = np.concatenate([p[2] for p in parts]) if parts else np.empty(0)
            preds = (
                np.concatenate([p[3] for p in parts])
                if parts and len(parts[0]) > 3
                else None
            )
            if len(ids) and combine != "pair_unique":
                c = _combine_for_range(combine, self.lo, self.hi, ids, vals, preds)
                ids, vals = c[1], c[2]
                preds = c[3] if len(c) > 3 else None
        view = _SpanState(self.state, self.lo)
        apply = getattr(program, "apply_dist", program.apply)
        changed = apply(view, ids, vals, preds)
        if self.next_frontier is not None and len(changed):
            self.next_frontier[np.asarray(changed, dtype=np.int64) - self.lo] = True
        return {"changed": int(len(changed)), "emitted": int(emitted)}

    def swap_frontier(self) -> int:
        """End of iteration: next buffer becomes current (the
        CONTEXT_PHASE flip, fog_engine.cpp:112-115)."""
        if self.frontier is None:
            return self.hi - self.lo
        self.frontier = self.next_frontier
        self.next_frontier = np.zeros(self.hi - self.lo, dtype=bool)
        return int(self.frontier.sum())

    def frontier_count(self) -> int:
        return int(self.frontier.sum()) if self.frontier is not None else self.hi - self.lo

    def get_state(self):
        return self.state, self.frontier, self.lo, self.hi

    def checkpoint_shard(self, directory: str, shard_idx: int) -> dict:
        """Write this partition's shard (fogray.checkpoint layout)."""
        import pyarrow.parquet as pq

        cols: dict = {"vid": np.arange(self.lo, self.hi, dtype=np.int64)}
        for k, v in self.state.items():
            cols[k] = v
        if self.frontier is not None:
            cols["active"] = self.frontier
        path = os.path.join(directory, f"shard-{shard_idx:05d}.parquet")
        pq.write_table(pa.table(cols), path)
        with open(path, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        return {
            "file": os.path.basename(path),
            "vid_lo": self.lo,
            "vid_hi": self.hi,
            "rows": self.hi - self.lo,
            "sha256": digest,
        }

    def load_shards(self, directory: str, shards_meta: list[dict], fields: list[str],
                    has_frontier: bool):
        """Restore this range from any overlapping checkpoint shards
        (ranges need not match the writing run's partitioning)."""
        import pyarrow.parquet as pq

        n = self.hi - self.lo
        arrays: dict[str, np.ndarray] = {}
        frontier = np.zeros(n, dtype=bool) if has_frontier else None
        for s in shards_meta:
            if s["vid_hi"] <= self.lo or s["vid_lo"] >= self.hi:
                continue
            fp = os.path.join(directory, s["file"])
            with open(fp, "rb") as f:
                if hashlib.sha256(f.read()).hexdigest() != s["sha256"]:
                    raise ValueError(f"checkpoint shard corrupt: {fp}")
            t = pq.read_table(fp)
            vids = t.column("vid").to_numpy(zero_copy_only=False)
            m = (vids >= self.lo) & (vids < self.hi)
            at = vids[m] - self.lo
            for k in fields:
                col = t.column(k).to_numpy(zero_copy_only=False)
                if k not in arrays:
                    arrays[k] = np.empty(n, dtype=col.dtype)
                arrays[k][at] = col[m]
            if frontier is not None:
                frontier[at] = t.column("active").to_numpy(zero_copy_only=False)[m]
        self.state = arrays
        self.frontier = frontier
        self.next_frontier = np.zeros(n, dtype=bool) if frontier is not None else None
        return self.frontier_count()

    def field_names(self) -> tuple[list[str], bool]:
        return sorted(self.state.keys()), self.frontier is not None


class DistGraphEngine:
    """Driver-side orchestration; holds only ObjectRefs and scalar
    counters. Mirrors :class:`fogray.engine.GraphEngine`'s run() API."""

    def __init__(
        self,
        n: int,
        *,
        arrays=None,
        dataset=None,
        cfg: EngineConfig | None = None,
        num_state_partitions: int | None = None,
    ):
        self.n = int(n)
        self.cfg = cfg or EngineConfig()
        p_edge = self.cfg.num_partitions
        if p_edge is None:
            p_edge = max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))
        p_state = num_state_partitions or p_edge

        import os as _os, time as _time
        _dbg = _os.environ.get("FOGRAY_BUILD_DEBUG")
        _t0 = _time.perf_counter()
        def _mark(name):
            nonlocal _t0
            if _dbg:
                print(f"[distbuild] {name}: {_time.perf_counter()-_t0:.1f}s", flush=True)
                _t0 = _time.perf_counter()
        dataset_blocks = None
        if dataset is not None:
            # streaming construction (same bucketed exchange as
            # GraphEngine._init_from_dataset, instead of two sorts +
            # one actor per sorted block, which flooded the node with
            # worker processes when the sort was wide): one metadata
            # pass computes degrees; after the state bounds are fixed,
            # one map wave scatters every block into per-range pieces
            # and each range's actor fetches only its pieces. The
            # driver holds only ObjectRefs and O(V) degree ints.
            from .engine import _block_degrees

            refs = dataset.materialize().to_arrow_refs()
            metas = ray.get([_block_degrees.remote(r) for r in refs])
            self.num_edges = sum(m[4] for m in metas)
            dataset_blocks = [r for r, m in zip(refs, metas) if m[4]]
            if dataset_blocks:
                us = np.concatenate([m[0] for m in metas if m[4]])
                cs = np.concatenate([m[1] for m in metas if m[4]])
                ud = np.concatenate([m[2] for m in metas if m[4]])
                cd = np.concatenate([m[3] for m in metas if m[4]])
                outdeg = np.bincount(us, weights=cs, minlength=self.n).astype(np.int64)
                indeg = np.bincount(ud, weights=cd, minlength=self.n).astype(np.int64)
            else:
                outdeg = np.zeros(self.n, dtype=np.int64)
                indeg = np.zeros(self.n, dtype=np.int64)
            deg = outdeg + indeg
            _mark("degrees_meta")
        else:
            src, dst, w = arrays
            src = np.asarray(src, dtype=np.int64)
            dst = np.asarray(dst, dtype=np.int64)
            w = (
                np.asarray(w, dtype=np.float64)
                if w is not None
                else np.ones(len(src), dtype=np.float64)
            )
            self.num_edges = len(src)
            outdeg = np.bincount(src, minlength=self.n)
            indeg = np.bincount(dst, minlength=self.n)
            deg = outdeg + indeg

        # degree-weighted state range bounds: each state partition owns
        # ~equal total degree, so one hub-heavy vid range doesn't
        # overload an actor (skew-aware RANGE partitioning).
        cum = np.cumsum(deg + 1)  # +1 keeps empty-vertex spans splittable
        total = cum[-1]
        bounds = [0]
        for j in range(1, p_state):
            b = max(int(np.searchsorted(cum, total * j / p_state)), bounds[-1] + 1)
            if b >= self.n:
                break
            bounds.append(b)
        bounds.append(max(self.n, 1))
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1

        bounds_ref = self.bounds
        empty_tab = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
             "weight": pa.array([], pa.float64())}
        )
        if dataset is not None:
            if not dataset_blocks:
                self.edge_actors = [
                    DistEdgeActor.options(
                        num_cpus=self.cfg.num_cpus_per_actor
                    ).remote([ray.put(empty_tab)], [ray.put(empty_tab)], bounds_ref)
                ]
            else:
                from .engine import _bucket_block

                nb = len(dataset_blocks)
                pieces = [
                    _bucket_block.options(num_returns=2 * self.P).remote(
                        r, self.bounds
                    )
                    for r in dataset_blocks
                ]
                if self.P == 1:
                    pieces = [[x, y] for x, y in pieces]
                # piece layout per block: P by-dst pieces then P by-src
                # pieces; the dist fwd view is SRC-sorted (read side)
                # and the bwd view DST-sorted, so fwd takes the by-src
                # half and bwd the by-dst half. Hub-heavy ranges get
                # multiple actors, each serving a block-subset.
                cum_in = np.concatenate([[0], np.cumsum(indeg)])
                cum_out = np.concatenate([[0], np.cumsum(outdeg)])
                in_cnt = cum_in[self.bounds[1:]] - cum_in[self.bounds[:-1]]
                out_cnt = cum_out[self.bounds[1:]] - cum_out[self.bounds[:-1]]
                target = max(1, self.num_edges // max(p_edge, 1))
                self.edge_actors = []
                for j in range(self.P):
                    heavier = int(max(in_cnt[j], out_cnt[j]))
                    k = max(1, min(8, nb, (heavier + target // 2) // target))
                    for c in range(k):
                        b0, b1 = (nb * c) // k, (nb * (c + 1)) // k
                        self.edge_actors.append(
                            DistEdgeActor.options(
                                num_cpus=self.cfg.num_cpus_per_actor
                            ).remote(
                                [pieces[b][self.P + j] for b in range(b0, b1)],
                                [pieces[b][j] for b in range(b0, b1)],
                                bounds_ref,
                                False,
                            )
                        )
        else:
            # edge-count-balanced spans of the two sorted views (hub
            # edges split across actors when a vertex's list exceeds a
            # span). Single-key stable sorts: no kernel depends on the
            # secondary order within a src (resp. dst) run, and argsort
            # costs half a lexsort on 10^7+ edges.
            fwd_order = np.argsort(src, kind="stable")
            bwd_order = np.argsort(dst, kind="stable")
            p_edge = max(1, min(p_edge, max(1, self.num_edges)))
            fwd_blocks, bwd_blocks = [], []
            for i in range(p_edge):
                a = (self.num_edges * i) // p_edge
                b = (self.num_edges * (i + 1)) // p_edge
                fidx, bidx = fwd_order[a:b], bwd_order[a:b]
                fwd_blocks.append(
                    ray.put(
                        pa.table({"src": src[fidx], "dst": dst[fidx], "weight": w[fidx]})
                    )
                )
                bwd_blocks.append(
                    ray.put(
                        pa.table({"src": src[bidx], "dst": dst[bidx], "weight": w[bidx]})
                    )
                )
            self.edge_actors = [
                DistEdgeActor.options(num_cpus=self.cfg.num_cpus_per_actor).remote(
                    [fwd_blocks[i]], [bwd_blocks[i]], bounds_ref
                )
                for i in range(p_edge)
            ]
        _mark("edge_actors_submitted")
        self.state_actors = [
            StatePartitionActor.options(num_cpus=self.cfg.num_cpus_per_actor).remote(
                int(self.bounds[j]), int(self.bounds[j + 1])
            )
            for j in range(self.P)
        ]
        _mark("state_actors_submitted")
        self.edge_meta = ray.get([a.meta.remote() for a in self.edge_actors])
        _mark("edge_meta")

        # degrees: combined once on the driver (O(V) ints, setup-time
        # only), sliced to the state actors
        self.outdeg, self.indeg = outdeg, indeg
        ray.get(
            [
                self.state_actors[j].set_degrees.remote(
                    outdeg[self.bounds[j] : self.bounds[j + 1]],
                    indeg[self.bounds[j] : self.bounds[j + 1]],
                )
                for j in range(self.P)
            ]
        )
        _mark("set_degrees")

    # ------------------------------------------------------------------

    def _superstep(self, program: VertexProgram, direction: str):
        t0 = time.perf_counter()
        combine = getattr(program, "dist_combine", program.combine)
        slices = [a.export.remote(program) for a in self.state_actors]
        if combine == "sum":
            # PULL mode (sum/global programs): each edge actor scatters
            # its emission-target-sorted span and returns partials only
            # for the 1-2 state partitions that span overlaps — O(V)
            # exchange total. Read-side state: all slice refs (plasma
            # dedupes per node; _ShardedField reads them zero-copy).
            spans: list[tuple[int, int]] = []
            per_edge: list[list] = []
            for i, ea in enumerate(self.edge_actors):
                span = self.edge_meta[i]["bwd_span" if direction == FWD else "fwd_span"]
                spans.append(span)
                nret = span[1] - span[0]
                if nret <= 0:
                    per_edge.append([])
                    continue
                refs = ea.scatter_pull.options(num_returns=nret).remote(
                    program, direction, *slices
                )
                per_edge.append([refs] if nret == 1 else list(refs))
            stats = ray.get(
                [
                    self.state_actors[j].apply_updates.remote(
                        program,
                        *[
                            per_edge[i][j - spans[i][0]]
                            for i in range(len(self.edge_actors))
                            if per_edge[i] and spans[i][0] <= j < spans[i][1]
                        ],
                    )
                    for j in range(self.P)
                ]
            )
        else:
            # PUSH mode (sparse-frontier min/pair programs): scatter the
            # read-side-sorted span (needs only its overlapping state
            # slices), route sparse pre-combined partials to every
            # destination partition.
            per_edge = []
            for i, ea in enumerate(self.edge_actors):
                span = self.edge_meta[i]["fwd_span" if direction == FWD else "bwd_span"]
                need = slices[span[0] : span[1]]
                refs = ea.scatter.options(num_returns=self.P).remote(
                    program, direction, *need
                )
                if self.P == 1:
                    refs = [refs]
                per_edge.append(refs)
            stats = ray.get(
                [
                    self.state_actors[j].apply_updates.remote(
                        program, *[per_edge[i][j] for i in range(len(per_edge))]
                    )
                    for j in range(self.P)
                ]
            )
        return {
            "direction": direction,
            "updates_emitted": sum(s["emitted"] for s in stats),
            "changed": sum(s["changed"] for s in stats),
            "wall_s": time.perf_counter() - t0,
        }

    def map_state(self, fn, *args) -> int:
        """Slice-local transform on every state partition (SCC init
        phases); returns the global frontier count."""
        return sum(ray.get([a.transform.remote(fn, *args) for a in self.state_actors]))

    def _write_checkpoint(self, ckpt_dir, iteration, program_name, params, metrics):
        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(ckpt_dir, f"iter={iteration:06d}")
        tmp = final + f".tmp-{os.getpid()}"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(tmp)
        shard_meta = ray.get(
            [
                self.state_actors[j].checkpoint_shard.remote(tmp, j)
                for j in range(self.P)
            ]
        )
        fields, has_frontier = ray.get(self.state_actors[0].field_names.remote())
        manifest = {
            "iteration": iteration,
            "program": program_name,
            "params_key": _params_key(program_name, params),
            "num_vertices": self.n,
            "state_fields": fields,
            "has_frontier": has_frontier,
            "frontier_count": None,
            "shards": shard_meta,
            "metrics": metrics,
        }
        mtmp = os.path.join(tmp, "manifest.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(tmp, "manifest.json"))
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.replace(tmp, final)
        ltmp = os.path.join(ckpt_dir, f".LATEST.tmp-{os.getpid()}")
        with open(ltmp, "w") as f:
            f.write(os.path.basename(final))
        os.replace(ltmp, os.path.join(ckpt_dir, "LATEST"))

    def _resume(self, ckpt_dir, program_name, params):
        found = latest_checkpoint(ckpt_dir)
        if found is None:
            return None
        with open(os.path.join(found, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest["params_key"] != _params_key(program_name, params):
            raise ValueError(
                f"checkpoint at {found} was written by a different program/params"
            )
        counts = ray.get(
            [
                a.load_shards.remote(
                    found,
                    manifest["shards"],
                    manifest["state_fields"],
                    manifest["has_frontier"],
                )
                for a in self.state_actors
            ]
        )
        return manifest["iteration"], manifest["metrics"], sum(counts)

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
        frontier_count = sum(
            ray.get(
                [a.init_program.remote(program, params) for a in self.state_actors]
            )
        )
        completed = 0
        metrics: list[dict] = []
        if resume and ckpt_dir:
            got = self._resume(ckpt_dir, program.name, params)
            if got is not None:
                completed, metrics, frontier_count = got

        while not program.done(completed, frontier_count, params):
            if completed >= max_supersteps:
                raise RuntimeError(f"{program.name}: exceeded {max_supersteps} supersteps")
            if program.paired_fwd_bwd:
                # cc.hpp:112-133: fwd then bwd over the SAME frontier
                # (both scatter from the current buffer; changes land in
                # the next buffer), fwd-applied labels visible to bwd
                iter_metrics = [
                    self._superstep(program, FWD),
                    self._superstep(program, BWD),
                ]
            else:
                iter_metrics = [self._superstep(program, FWD)]
            frontier_count = sum(
                ray.get([a.swap_frontier.remote() for a in self.state_actors])
            )
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
                self._write_checkpoint(ckpt_dir, completed, program.name, params, metrics)
        state, frontier = self.collect_state()
        return RunResult(
            state=state,
            frontier=frontier,
            supersteps=completed,
            metrics=metrics,
            num_edges=self.num_edges,
            wall_seconds=time.perf_counter() - t_start,
        )

    def collect_state(self):
        """Assemble the dense result arrays (test/report scale only —
        at corpus scale use write_state_parquet)."""
        parts = ray.get([a.get_state.remote() for a in self.state_actors])
        fields = parts[0][0].keys()
        state = {
            k: np.concatenate([p[0][k] for p in parts]) for k in fields
        }
        frontier = (
            np.concatenate([p[1] for p in parts]) if parts[0][1] is not None else None
        )
        return state, frontier

    def write_state_parquet(self, out_dir: str) -> list[dict]:
        """Partitioned result output: one vid-range file per state
        partition, written in parallel by the owning actors."""
        os.makedirs(out_dir, exist_ok=True)
        return ray.get(
            [
                self.state_actors[j].checkpoint_shard.remote(out_dir, j)
                for j in range(self.P)
            ]
        )

    def shutdown(self):
        for a in self.edge_actors + self.state_actors:
            ray.kill(a)
        self.edge_actors, self.state_actors = [], []
