"""The superstep runtime: FOG's scatter/gather engine
(fogsrc/fog_engine.cpp, fogsrc/cpu_thread.cpp) rebuilt on Ray.

Architecture (Ray-Data-first, designed for a multi-node cluster):

- **Edge partitions pinned in stateful actors, partitioned by the
  EMISSION-TARGET vid range.** Each :class:`EdgeViewActor` owns a
  contiguous vid range and holds, built ONCE in ``__init__``: the edges
  whose *dst* falls in its range (src-sorted — the forward-scatter
  view) and the edges whose *src* falls in its range (dst-sorted — the
  backward view for CC/SCC reverse passes). This is FOG's update
  routing turned inside out: instead of scattering anywhere and
  bucketing updates into per-destination-segment strips
  (cpu_thread.cpp:290-326, types.hpp:169-172), every actor only ever
  PRODUCES updates for its own range — so the whole per-superstep
  exchange is ONE range-sized partial per actor, O(V) total,
  independent of the partition count. (The earlier tree-reduce design
  shipped P partials of size V — O(P*V) — and therefore got *slower*
  with more CPUs.)

- **Vertex state is a dense driver-side array set, broadcast per
  superstep** via a single ``ray.put`` — the ``.attr`` array analog
  (fog_engine.cpp:377-403). On a cluster the object is shipped once per
  node and mapped zero-copy by every actor on it; scatter may read
  state at ANY src because the full state is present (this is the
  "broadcast small side instead of shuffle join" pattern; state is
  O(V), edges are O(E) >> O(V)). The broadcast engine's ceiling is
  state-fits-on-the-driver; beyond that use fogray.dist_engine, which
  range-shards the state itself.

- **Scatter is vectorized numpy** over frontier-filtered edge arrays
  (no per-edge calls — FOG's per-edge ``scatter_one_edge`` loop,
  cpu_thread.cpp:230-328, becomes array kernels), and each partition
  pre-combines per destination (sum/min) INSIDE its own range before
  anything moves — a hub vertex's in-edges collapse to at most
  ``actors_per_range`` partial values.

- **Skew**: range bounds are degree-weighted, and a range whose edge
  count exceeds its fair share is served by MULTIPLE actors (the hub's
  edge list is split across them; the driver adds their few range-sized
  partials) — the static replacement for FOG's mid-scatter work
  stealing (fog_engine.cpp:560-758).

- **Gather**: the driver concatenates the disjoint range partials and
  applies the FOG ``gather_one_update`` rule once, vectorized
  (fog_engine.cpp:1046-1780 collapses into one numpy apply), then
  derives the next frontier (add_schedule analog,
  fog_engine.cpp:2162-2214).

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
from .programs import _EMPTY_IDS, BWD, FWD, VertexProgram


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


# ---------------------------------------------------------------------------
# the pinned edge-view actor (emission-target range partitioned)
# ---------------------------------------------------------------------------

def _fused_dense_partial(
    arr: np.ndarray,
    ks: np.ndarray,
    rel: np.ndarray,
    w: np.ndarray,
    use_w: bool,
    span: int,
    a: int,
    b: int,
    key_off: int = 0,
    ch: int = 2_000_000,
) -> np.ndarray:
    """The fused cache-blocked dense sum kernel over edge rows
    [a, b): gather -> (*w) -> bincount per ~2M-edge slice, so the O(E)
    float64 value temporary stays L2/L3-resident instead of streaming
    DRAM three times. The per-edge additive constant (PageRank's
    teleport) is NOT handled here — callers add ``add_c * rel_cnt``
    once per view (the edge-count weighted constant term), which
    removes an entire O(E) read+write pass from the superstep."""
    part = np.zeros(span, dtype=np.float64)
    off = ks.dtype.type(key_off)
    for c in range(a, b, ch):
        d = min(c + ch, b)
        idx = ks[c:d] - off if key_off else ks[c:d]
        vals = arr[idx]
        if use_w:
            vals = vals * w[c:d]
        part += np.bincount(rel[c:d], weights=vals, minlength=span)
    return part


class _View:
    """One scatter view's pinned arrays: edges read-key-sorted, plus the
    precomputed range-relative emission targets for the dense hot path."""

    __slots__ = ("s", "d", "w", "key_sorted", "emit_arr", "emit_rel", "_rel_cnt")

    def __init__(self, tab, lo: int, hi: int, emit_key: str, combine: bool = False):
        if isinstance(tab, list):
            tabs = [t if isinstance(t, pa.Table) else ray.get(t) for t in tab]
            tabs = [t for t in tabs if t.num_rows and t.num_columns]
            tab = pa.concat_tables(tabs, promote_options="default") if tabs else None
        if tab is None or tab.num_rows == 0:
            self.s = self.d = np.empty(0, dtype=np.int64)
            self.w = np.empty(0, dtype=np.float64)
        elif combine:
            # pre-aggregation folded into the exchange (derive's
            # ``aggregate=False`` path skips its (src, dst) sort): the
            # range's slice is full-lexsorted and duplicate (src, dst)
            # rows collapse with summed weights HERE — weights are
            # integer-valued counts, so the sum is exact in any order
            src = tab.column("src").to_numpy(zero_copy_only=False)
            dst = tab.column("dst").to_numpy(zero_copy_only=False)
            w = (
                tab.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
                if "weight" in tab.column_names
                else tab.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
            )
            read_key = src if emit_key == "dst" else dst
            other = dst if emit_key == "dst" else src
            order = np.lexsort((other, read_key))
            src, dst, w = src[order], dst[order], w[order]
            first = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
            if not first.all():
                starts = np.flatnonzero(first)
                w = np.add.reduceat(w, starts)
                src, dst = src[starts], dst[starts]
            self.s, self.d, self.w = src, dst, w
        else:
            src = tab.column("src").to_numpy(zero_copy_only=False)
            dst = tab.column("dst").to_numpy(zero_copy_only=False)
            w = (
                tab.column("weight").to_numpy(zero_copy_only=False)
                if "weight" in tab.column_names
                else np.ones(len(src), dtype=np.float64)
            )
            read_key = src if emit_key == "dst" else dst
            order = np.argsort(read_key, kind="stable")
            self.s, self.d, self.w = src[order], dst[order], w[order]
        # The scatter wave is memory-bandwidth-bound. The sparse/frontier
        # paths keep s/d int32 when vids fit (halves their edge-array
        # traffic), but the DENSE hot path's index arrays (key_sorted
        # feeding fancy-gather, emit_rel feeding bincount) are stored
        # intp: numpy silently CASTS any non-intp index array to intp
        # per call, a hidden O(E) write+read round-trip per superstep
        # that costs more DRAM traffic than the wider resident dtype
        # reads (~24B/edge saved each superstep, measured).
        vmax = max(int(self.s.max()), int(self.d.max())) if len(self.s) else 0
        if vmax < np.iinfo(np.int32).max:
            self.s = self.s.astype(np.int32)
            self.d = self.d.astype(np.int32)
        self.emit_arr = self.d if emit_key == "dst" else self.s
        self.emit_rel = self.emit_arr.astype(np.intp) - lo
        self.key_sorted = (self.s if emit_key == "dst" else self.d).astype(np.intp)
        self._rel_cnt: np.ndarray | None = None

    def rel_cnt(self, span: int) -> np.ndarray:
        """Per-relative-target edge counts (float64, span-sized), built
        once and cached: lets the dense kernel fold a per-edge additive
        constant into ONE ``acc += c * rel_cnt`` instead of an O(E)
        pass (and its temp traffic) every superstep."""
        if self._rel_cnt is None:
            self._rel_cnt = np.bincount(
                self.emit_rel, minlength=span
            ).astype(np.float64)
        return self._rel_cnt


@ray.remote
class EdgeViewActor:
    """Serves the scatter views for one emission-target vid range
    [lo, hi): the forward view (edges whose dst lies in the range,
    sorted by src) and the backward view (edges whose src lies in the
    range, sorted by dst) — the rebuild of the mmapped
    ``index_vert_array`` CSR/CSC, fogsrc/index_vert_array.cpp:25-336,
    both built once in ``__init__`` (one actor PROCESS per range, not
    one per view: actor startup is the dominant build cost on a fresh
    session). ``scatter`` runs the program's vectorized kernel over
    frontier-filtered edges and pre-combines into ONE range-sized
    partial. Ranges may OVERLAP (a hot range split across actors): the
    driver adds/combines the partials, so overlap costs only a few
    duplicate entries."""

    def __init__(self, parts: dict, lo: int, hi: int, seg_bounds=None,
                 combine: bool = False):
        # parts: {"fwd": table/ref/list-of-refs/None, "bwd": ...}. Refs
        # nested inside the dict are NOT dereferenced by Ray — fetched
        # here, off-driver.
        self.lo, self.hi = int(lo), int(hi)
        # engine-wide range bounds: the classic dense path segments its
        # fused-kernel chunk grid by these so its float association
        # order matches the resident pipelined path's per-slice
        # partials EXACTLY — classic (checkpointed) and resident runs
        # of the same program stay bit-identical (resume invariant)
        self.seg_bounds = (
            None if seg_bounds is None else np.asarray(seg_bounds, dtype=np.int64)
        )
        self.views: dict[str, _View] = {}
        for dirn, emit_key in ((FWD, "dst"), (BWD, "src")):
            tab = parts.get(dirn)
            if tab is not None and not isinstance(tab, (pa.Table, list)):
                tab = ray.get(tab)
            self.views[dirn] = _View(tab, self.lo, self.hi, emit_key, combine)
        self.resident_state: dict | None = None
        # cumulative per-phase wall clocks (seconds), cheap enough to
        # keep always-on; read back via get_prof() for scaling forensics
        self.prof: dict[str, float] = {}

    def _prof_add(self, key: str, dt: float) -> None:
        self.prof[key] = self.prof.get(key, 0.0) + dt

    def get_prof(self) -> dict:
        return dict(self.prof)

    def ready(self) -> bool:
        return True

    def degree_partials(self):
        """Sparse exact degree partials from the FWD view (each edge
        lives in exactly ONE actor's fwd view — ranges partition by dst
        and hub splits partition by src-hash on the combine path, so
        duplicates collapse before counting and the driver fold is
        exact). Used by the combine build path, whose metadata-pass
        degrees overcount cross-block duplicate pairs."""
        vw = self.views[FWD]
        us, cs = np.unique(np.asarray(vw.s, dtype=np.int64), return_counts=True)
        ud, cd = np.unique(np.asarray(vw.d, dtype=np.int64), return_counts=True)
        return us, cs, ud, cd, len(vw.s)

    def warm(self, n: int) -> bool:
        """One untimed pass of the fused kernel over the FWD view with a
        dummy all-ones state: a fresh actor process pays a large
        one-time cost on its FIRST heavy kernel invocation (page-fault /
        THP-compaction effects after the build's big allocations —
        measured 0.15-0.8s per actor, 5x a steady superstep), so the
        engine build absorbs it instead of the first timed superstep."""
        vw = self.views.get(FWD)
        if vw is None or len(vw.key_sorted) == 0:
            return True
        arr = np.ones(n, dtype=np.float64)
        span = self.hi - self.lo
        ks, rel, w = vw.key_sorted, vw.emit_rel, vw.w
        acc = np.zeros(span, dtype=np.float64)
        ch = 2_000_000
        for a in range(0, len(ks), ch):
            b = min(a + ch, len(ks))
            acc += np.bincount(
                rel[a:b], weights=arr[ks[a:b]] * w[a:b], minlength=span
            )
        return bool(acc is not None)

    # -- resident pipelined mode (GLOBAL fixed-iteration sum programs) --
    #
    # The classic superstep loop pays an O(V) driver-SERIAL toll per
    # superstep (state ray.put + partial fold + dense apply) — the
    # Amdahl term that capped measured 2->8 CPU scaling at ~0.70. In
    # resident mode the state lives SLICED in each range's owner actor
    # (this is each node applying updates for its own partition — the
    # multi-node shape), supersteps chain through object refs, and the
    # driver only wires futures: O(P) per superstep, no data.

    def set_resident(self, state_slice: dict) -> bool:
        """Install this range owner's state slice (vids [lo, hi))."""
        self.resident_state = {k: np.array(v) for k, v in state_slice.items()}
        return True

    def resident_apply_view(self, program: VertexProgram, make_view: bool, *partials):
        """Sum this range's scatter partials (Ray derefs them — they
        never touch the driver), apply the program's element-wise dense
        rule to the resident slice, and return the next superstep's
        scatter-view slice (stored to plasma by Ray; the driver only
        forwards the ref). Partial sum order matches the classic
        driver fold (list order), so results are bit-identical."""
        t0 = time.perf_counter()
        if partials:
            acc = partials[0]
            if len(partials) > 1:
                acc = acc.copy()
                for p in partials[1:]:
                    acc += p
            program.apply_dense(self.resident_state, acc)
        view = program.scatter_view(self.resident_state) if make_view else None
        self._prof_add("apply_view_s", time.perf_counter() - t0)
        return view, {"lo": self.lo, "hi": self.hi}

    def resident_superstep(
        self, program: VertexProgram, view_refs, direction: str, bounds,
        make_view: bool,
    ):
        """One whole superstep in ONE actor task — scatter + apply +
        next view — for the common single-actor-per-range layout, where
        this actor's scatter acc IS the complete partial for its own
        range (emission-target partitioning). Fusing the apply into the
        scatter task halves per-superstep task dispatches and keeps the
        range partial in-process (no plasma round-trip for the acc),
        which is pure per-superstep fixed cost — the Amdahl term the
        4N-CPU level pays 4x more often per second than the N level.
        Values are bit-identical to the two-task path: the acc is
        computed by the same kernel and applied exactly as
        resident_apply_view does with one partial."""
        acc = self.resident_scatter(program, view_refs, direction, bounds)
        t0 = time.perf_counter()
        program.apply_dense(self.resident_state, acc)
        view = program.scatter_view(self.resident_state) if make_view else None
        self._prof_add("apply_view_s", time.perf_counter() - t0)
        return view, {"lo": self.lo, "hi": self.hi}

    def resident_scatter(
        self, program: VertexProgram, view_refs, direction: str, bounds=None
    ):
        """The fused cache-blocked dense kernel over this actor's edges,
        reading the state view from the owners' slice refs.

        With ``bounds`` (the owners' slice boundaries): the edges are
        read-key-sorted, so each owner slice k feeds exactly the
        contiguous segment ks ∈ [bounds[k], bounds[k+1]) — process each
        segment AS ITS SLICE REF BECOMES READY (ray.wait), gathering
        slice-relative. A straggling owner then delays only its own
        segment, not the whole kernel (the global per-superstep barrier
        becomes per-slice dataflow), and the O(V) view concat
        disappears entirely. Segment partials are summed in FIXED slice
        order, so the result is independent of arrival order."""
        t0 = time.perf_counter()
        vw = self.views[direction]
        span = self.hi - self.lo
        ks, rel, w = vw.key_sorted, vw.emit_rel, vw.w
        ch = 2_000_000
        wait_s = 0.0
        add_c = 0.0
        if bounds is None or any(isinstance(r, dict) for r in view_refs):
            slices = [r if isinstance(r, dict) else ray.get(r) for r in view_refs]
            view = {
                k: np.concatenate([s[k] for s in slices])
                for k in slices[0].keys()
            }
            arr, use_w, add_c = program.dense_gather(view)
            acc = _fused_dense_partial(
                arr, ks, rel, w, use_w, span, 0, len(ks), ch=ch
            )
            edges_done = len(ks)
        else:
            bounds = np.asarray(bounds, dtype=np.int64)
            seg = np.searchsorted(ks, bounds)
            parts: list = [None] * len(view_refs)
            idx_of = {r: i for i, r in enumerate(view_refs)}
            not_ready = list(view_refs)
            edges_done = 0
            while not_ready:
                tw = time.perf_counter()
                ready, not_ready = ray.wait(not_ready, num_returns=1)
                wait_s += time.perf_counter() - tw
                for r in ready:
                    i = idx_of[r]
                    a, b = int(seg[i]), int(seg[i + 1])
                    if a == b:
                        continue
                    tg = time.perf_counter()
                    sl = ray.get(r)
                    tgath = time.perf_counter()
                    arr, use_w, add_c = program.dense_gather(sl)
                    tf = time.perf_counter()
                    parts[i] = _fused_dense_partial(
                        arr, ks, rel, w, use_w, span, a, b,
                        key_off=int(bounds[i]), ch=ch,
                    )
                    tdone = time.perf_counter()
                    self._prof_add("seg_get_s", tgath - tg)
                    self._prof_add("seg_gather_s", tf - tgath)
                    self._prof_add("seg_fused_s", tdone - tf)
                    edges_done += b - a
            tfold = time.perf_counter()
            acc = np.zeros(span, dtype=np.float64)
            for p in parts:
                if p is not None:
                    acc += p
            self._prof_add("seg_fold_s", time.perf_counter() - tfold)
        if add_c:
            # constant per-edge term folded in as counts (see
            # _fused_dense_partial): every edge lands in exactly one
            # segment, so ONE count-weighted add covers the whole view
            acc += add_c * vw.rel_cnt(span)
        t3 = time.perf_counter()
        self._prof_add("view_wait_s", wait_s)
        self._prof_add("kernel_s", t3 - t0 - wait_s)
        self._prof_add("kernel_edges", float(edges_done))
        self.prof.setdefault("kernel_steps", []).append(round(t3 - t0, 4))
        return acc

    def get_resident_state(self) -> dict:
        state, self.resident_state = self.resident_state, None
        return state

    def scatter(
        self,
        program: VertexProgram,
        bcast,  # (state_dict, frontier_bool_or_None, active_ids_or_None)
        direction: str,
        dense: bool,
    ):
        view = self.views[direction]
        s, d, w = view.s, view.d, view.w
        key_sorted = view.key_sorted
        state, frontier, active_ids = bcast

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

        span = self.hi - self.lo
        if (
            dense
            and frontier is None
            and active_ids is None
            and not program.skip_self_loops
            and program.combine == "sum"
        ):
            dg = program.dense_gather(state)
            if dg is not None:
                # fused cache-blocked kernel (see _fused_dense_partial),
                # chunk grid segmented by the engine-wide range bounds
                # so the association order is bit-identical to the
                # resident pipelined path's per-slice partial fold
                arr, use_w, add_c = dg
                ks, rel = view.key_sorted, view.emit_rel
                acc = np.zeros(span, dtype=np.float64)
                if self.seg_bounds is not None:
                    seg = np.searchsorted(ks, self.seg_bounds)
                    for i in range(len(seg) - 1):
                        a, b = int(seg[i]), int(seg[i + 1])
                        if a < b:
                            acc += _fused_dense_partial(
                                arr, ks, rel, view.w, use_w, span, a, b
                            )
                else:
                    acc += _fused_dense_partial(
                        arr, ks, rel, view.w, use_w, span, 0, len(ks)
                    )
                if add_c:
                    acc += add_c * view.rel_cnt(span)
                return (("dense", acc), len(ks))

        if len(s) == 0:
            if program.combine == "sum" and dense:
                return (("dense", np.zeros(span, dtype=np.float64)), 0)
            empty = np.empty(0, dtype=np.int64)
            ef = np.empty(0, dtype=np.float64)
            if program.combine == "min_pred":
                return (("sparse", empty, ef, ef.copy()), 0)
            return (("sparse", empty, ef), 0)

        out = program.scatter(state, s, d, w, direction)
        dest = out[0]
        vals = np.asarray(out[1], dtype=np.float64)
        preds = np.asarray(out[2], dtype=np.float64) if len(out) > 2 else None
        emitted = len(dest)
        # identity fast path: the program emitted THIS VIEW's untouched
        # emission array (every GLOBAL sum program does), whose range
        # membership holds by construction — reuse the precomputed
        # relative targets (comparing against emit_arr specifically so a
        # contract-violating program emitting the READ key still hits
        # the loud range check below instead of silent corruption)
        identity = dest is view.emit_arr
        if not identity:
            dest = np.asarray(dest, dtype=np.int64)
            if emitted and (int(dest.min()) < self.lo or int(dest.max()) >= self.hi):
                # loud failure beats a negative-bincount error / silently
                # corrupted span partial (VertexProgram.scatter contract)
                raise ValueError(
                    f"{program.name}: scatter emitted outside its "
                    f"emission-target range [{self.lo}, {self.hi})"
                )
        if program.combine == "sum" and dense:
            rel = view.emit_rel if identity else dest - self.lo
            return (
                ("dense", np.bincount(rel, weights=vals, minlength=span)),
                emitted,
            )
        partial = local_combine(program.combine, span, False, dest, vals, preds)
        partial = ("sparse",) + tuple(
            np.asarray(x, dtype=np.float64) if i else np.asarray(x, dtype=np.int64)
            for i, x in enumerate(partial[1:])
        )
        return (partial, emitted)


def _degree_bounds(outdeg, indeg, n: int, p: int) -> np.ndarray:
    """Degree-weighted vid-range bounds: p contiguous ranges holding
    roughly equal edge shares (FOG's vid-mod-P striping replaced by
    balanced ranges; the +1 keeps empty-degree spans splittable)."""
    deg = outdeg + indeg
    cum = np.cumsum(deg + 1)
    total = int(cum[-1])
    bounds = [0]
    for j in range(1, p):
        b = max(int(np.searchsorted(cum, total * j / p)), bounds[-1] + 1)
        if b >= n:
            break
        bounds.append(b)
    bounds.append(max(n, 1))
    return np.asarray(bounds, dtype=np.int64)


@ray.remote
def _bucket_block(tab: pa.Table, bounds: np.ndarray):
    """Scatter ONE edge block into 2p range pieces — p forward pieces
    (bucketed by dst) then p backward pieces (bucketed by src). Called
    with ``num_returns=2p`` so every piece is its own object and each
    range's actor fetches ONLY its pieces: the map stage of a bucketed
    exchange, replacing a full Ray-Data sort (the actors re-sort their
    narrow slice locally anyway, so the sort's sampling + global
    ordering work bought nothing)."""
    p = len(bounds) - 1
    if tab.num_rows == 0 or tab.num_columns == 0:
        empty = tab.slice(0, 0)
        return tuple(empty for _ in range(2 * p))
    out = []
    for key in ("dst", "src"):
        k = tab.column(key).to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds[1:-1], k, side="right")
        order = np.argsort(part, kind="stable")
        cuts = np.searchsorted(part[order], np.arange(p + 1))
        for j in range(p):
            out.append(tab.take(order[cuts[j] : cuts[j + 1]]))
    return tuple(out)


@ray.remote
def _hash_split(tab: pa.Table, k: int, key: str):
    """Split one range piece into k sub-pieces by a multiplicative hash
    of the scatter-read key (src for fwd pieces, dst for bwd). Used
    ONLY for hub-split ranges on the combine build path: duplicate
    (src, dst) rows share the key, so every copy of a pair lands in the
    SAME sub-actor and the per-actor pre-combine collapses it.
    (Block-subset routing left cross-block duplicates in different
    sub-actors, uncollapsed — double-counted degrees and per-edge
    contributions on skewed graphs.) Called with ``num_returns=k``."""
    if tab.num_rows == 0 or tab.num_columns == 0:
        empty = tab.slice(0, 0)
        return tuple(empty for _ in range(k))
    col = tab.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
    h = (col * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    part = (h % np.uint64(k)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    cuts = np.searchsorted(part[order], np.arange(k + 1))
    return tuple(tab.take(order[cuts[c] : cuts[c + 1]]) for c in range(k))


@ray.remote
def _block_degrees(tab: pa.Table):
    """Per-block sparse degree partials (driver combines into dense).
    Empty blocks arrive ZERO-COLUMN (see fogray._ray_patches)."""
    if tab.num_rows == 0 or tab.num_columns == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, e, 0
    s = tab.column("src").to_numpy(zero_copy_only=False)
    d = tab.column("dst").to_numpy(zero_copy_only=False)
    us, cs = np.unique(s, return_counts=True)
    ud, cd = np.unique(d, return_counts=True)
    return us, cs, ud, cd, len(s)

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
        combine_duplicates: bool = False,
    ):
        self.n = int(n)
        self.cfg = cfg or EngineConfig()
        p = self.cfg.num_partitions
        if p is None:
            p = max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))

        # the engine keeps two independent actor lists — forward view
        # (emit at dst) and backward view (emit at src) — each a list of
        # (actor, lo, hi); ranges may overlap (hub split / block-based
        # construction), the gather tolerates duplicates
        self.fwd_views: list[tuple] = []
        self.bwd_views: list[tuple] = []

        if dataset is not None:
            self._init_from_dataset(dataset, has_weights, combine_duplicates)
        elif arrays is not None:
            src, dst, w = arrays
            src = np.asarray(src, dtype=np.int64)
            dst = np.asarray(dst, dtype=np.int64)
            w = (
                np.asarray(w, dtype=np.float64)
                if w is not None and has_weights
                else np.ones(len(src), dtype=np.float64)
            )
            self._init_from_arrays(src, dst, w, p)
        else:
            raise ValueError("need dataset= or arrays=")
        ray.get(
            [a.ready.remote() for a, _, _ in self.fwd_views + self.bwd_views]
        )
        if dataset is not None and combine_duplicates and self.fwd_views:
            # the metadata-pass degrees counted duplicate (src, dst)
            # rows once per block (fine for range bounds, wrong for
            # program semantics — FOG outdeg divides rank); fold the
            # EXACT post-combine degrees back from the actors
            parts = ray.get(
                [a.degree_partials.remote() for a, _, _ in self.fwd_views]
            )
            us = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
            cs = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
            ud = np.concatenate([p[2] for p in parts]) if parts else np.empty(0, np.int64)
            cd = np.concatenate([p[3] for p in parts]) if parts else np.empty(0, np.int64)
            self.outdeg = np.bincount(us, weights=cs, minlength=self.n).astype(np.int64)
            self.indeg = np.bincount(ud, weights=cd, minlength=self.n).astype(np.int64)
            self.num_edges = int(sum(p[4] for p in parts))
        # absorb each fresh actor process's one-time first-kernel cost
        # (page-fault/THP effects after the build's big allocations;
        # 0.15-0.8s per actor measured) into the build, where it
        # belongs, instead of the first timed superstep
        ray.get([a.warm.remote(self.n) for a, _, _ in self.fwd_views])

    def _init_from_arrays(self, src, dst, w, p):
        """Driver-held arrays (test/report scale): degree-weighted range
        bounds; ranges whose edge share exceeds ~E/P get multiple actors
        (hub split). ONE actor per range holds both views."""
        self.num_edges = len(src)
        self.outdeg = np.bincount(src, minlength=self.n)
        self.indeg = np.bincount(dst, minlength=self.n)
        bounds = _degree_bounds(self.outdeg, self.indeg, self.n, p)

        target = max(1, self.num_edges // max(p, 1))
        fwd_order = np.argsort(dst, kind="stable")
        fwd_cuts = np.searchsorted(dst[fwd_order], bounds)
        bwd_order = np.argsort(src, kind="stable")
        bwd_cuts = np.searchsorted(src[bwd_order], bounds)
        for j in range(len(bounds) - 1):
            fidx = fwd_order[fwd_cuts[j] : fwd_cuts[j + 1]]
            bidx = bwd_order[bwd_cuts[j] : bwd_cuts[j + 1]]
            # split a range across actors only when it is well past its
            # fair share (round, don't ceil: ceil split every range that
            # landed a few % over target, yielding ~1.5x more actors
            # than CPUs — two uneven scheduling waves per superstep
            # instead of one)
            k = max(1, min(8, (max(len(fidx), len(bidx)) + target // 2) // target))
            lo, hi = int(bounds[j]), int(bounds[j + 1])
            for c in range(k):
                parts = {}
                for dirn, idx in ((FWD, fidx), (BWD, bidx)):
                    part = idx[(len(idx) * c) // k : (len(idx) * (c + 1)) // k]
                    parts[dirn] = ray.put(
                        pa.table(
                            {"src": src[part], "dst": dst[part], "weight": w[part]}
                        )
                    )
                actor = EdgeViewActor.options(
                    num_cpus=self.cfg.num_cpus_per_actor
                ).remote(parts, lo, hi, bounds)
                self.fwd_views.append((actor, lo, hi))
                self.bwd_views.append((actor, lo, hi))

    def _init_from_dataset(self, dataset, has_weights, combine=False):
        """Streaming construction via a bucketed exchange: one metadata
        pass computes degrees (and so degree-weighted range bounds),
        then one map wave scatters every block into per-range pieces
        (``_bucket_block``, 2p objects per block) and each range's actor
        fetches ONLY its pieces and key-sorts its narrow slice locally.
        The driver touches only ObjectRefs and degree partials — the
        edge table is never materialized driver-side (the scale path for
        edge tables that dwarf one machine; this is the map+reduce
        shuffle the converter's external sort performs,
        convert/process_in_edge.cpp, minus the global ordering the
        range-local argsort makes redundant)."""
        self.outdeg = np.zeros(self.n, dtype=np.int64)
        self.indeg = np.zeros(self.n, dtype=np.int64)
        p = self.cfg.num_partitions
        if p is None:
            p = max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))
        refs = dataset.materialize().to_arrow_refs()
        metas = ray.get([_block_degrees.remote(r) for r in refs])
        self.num_edges = sum(m[4] for m in metas)
        block_refs = [r for r, m in zip(refs, metas) if m[4]]
        if not block_refs:
            return
        # one vectorized bincount over the concatenated per-block unique
        # partials (a per-block np.add.at loop cost seconds at 100+ blocks)
        us = np.concatenate([m[0] for m in metas if m[4]])
        cs = np.concatenate([m[1] for m in metas if m[4]])
        ud = np.concatenate([m[2] for m in metas if m[4]])
        cd = np.concatenate([m[3] for m in metas if m[4]])
        self.outdeg = np.bincount(us, weights=cs, minlength=self.n).astype(np.int64)
        self.indeg = np.bincount(ud, weights=cd, minlength=self.n).astype(np.int64)
        bounds = _degree_bounds(self.outdeg, self.indeg, self.n, p)
        np_ranges = len(bounds) - 1
        pieces = [
            _bucket_block.options(num_returns=2 * np_ranges).remote(r, bounds)
            for r in block_refs
        ]
        if np_ranges == 1:
            pieces = [[a, b] for a, b in pieces]
        # per-range edge counts (exact, from the degree arrays) drive
        # the hub split: a range well past its fair share gets multiple
        # actors, each serving a block-subset of the range's pieces
        cum_in = np.concatenate([[0], np.cumsum(self.indeg)])
        cum_out = np.concatenate([[0], np.cumsum(self.outdeg)])
        fwd_cnt = cum_in[bounds[1:]] - cum_in[bounds[:-1]]
        bwd_cnt = cum_out[bounds[1:]] - cum_out[bounds[:-1]]
        target = max(1, self.num_edges // max(p, 1))
        nb = len(block_refs)
        for j in range(np_ranges):
            lo, hi = int(bounds[j]), int(bounds[j + 1])
            heavier = int(max(fwd_cnt[j], bwd_cnt[j]))
            k = max(1, min(8, nb, (heavier + target // 2) // target))
            if combine and k > 1:
                # hub split + pre-combine: sub-actors must see ALL
                # copies of a duplicate (src, dst) pair, so route by
                # read-key hash, not block subset (see _hash_split)
                fwd_sub = [
                    _hash_split.options(num_returns=k).remote(pieces[b][j], k, "src")
                    for b in range(nb)
                ]
                bwd_sub = [
                    _hash_split.options(num_returns=k).remote(
                        pieces[b][np_ranges + j], k, "dst"
                    )
                    for b in range(nb)
                ]
                for c in range(k):
                    parts = {
                        FWD: [fwd_sub[b][c] for b in range(nb)],
                        BWD: [bwd_sub[b][c] for b in range(nb)],
                    }
                    actor = EdgeViewActor.options(
                        num_cpus=self.cfg.num_cpus_per_actor
                    ).remote(parts, lo, hi, bounds, combine)
                    self.fwd_views.append((actor, lo, hi))
                    self.bwd_views.append((actor, lo, hi))
                continue
            for c in range(k):
                b0, b1 = (nb * c) // k, (nb * (c + 1)) // k
                parts = {
                    FWD: [pieces[b][j] for b in range(b0, b1)],
                    BWD: [pieces[b][np_ranges + j] for b in range(b0, b1)],
                }
                actor = EdgeViewActor.options(
                    num_cpus=self.cfg.num_cpus_per_actor
                ).remote(parts, lo, hi, bounds, combine)
                self.fwd_views.append((actor, lo, hi))
                self.bwd_views.append((actor, lo, hi))

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
        """scatter (each actor pre-combines into its own range) ->
        driver adds the disjoint range partials -> apply. Exchange is
        O(V) total regardless of the actor count. Returns
        (changed_ids, metrics)."""
        t0 = time.perf_counter()
        views = self.fwd_views if direction == FWD else self.bwd_views
        span_max = max((hi - lo for _, lo, hi in views), default=1)
        dense = program.combine == "sum" and span_max <= self.cfg.dense_threshold
        # ship only what scatter reads (programs with a derived scatter
        # input compute it ONCE here instead of once per actor)
        bcast, active_count = self._broadcast(program.scatter_view(state), frontier)
        futs = [a.scatter.remote(program, bcast, direction, dense) for a, _, _ in views]
        results = ray.get(futs)
        emitted = sum(r[1] for r in results)
        if dense:
            acc = np.zeros(self.n, dtype=np.float64)
            for (partial, _e), (_a, lo, hi) in zip(results, views):
                acc[lo:hi] += partial[1]
            # dense-apply fast path: programs whose update rule works on
            # the whole combined vector skip the flatnonzero + gather
            # (O(V) driver-serial work that caps multi-worker scaling —
            # adding the zero entries is identity for these rules)
            applied = program.apply_dense(state, acc)
            if applied is not None:
                del bcast
                metrics = {
                    "direction": direction,
                    "active": active_count,
                    "updates_emitted": int(emitted),
                    "updates_applied": int(self.n),
                    # fixed-iteration programs return the shared empty
                    # sentinel (counting changes would cost the O(V)
                    # scan the dense apply exists to skip): report -1 =
                    # "not computed", NOT 0 — the sparse path's count
                    # of updated vertices keeps its meaning
                    "changed": -1 if applied is _EMPTY_IDS else int(len(applied)),
                    "wall_s": time.perf_counter() - t0,
                }
                return applied, metrics
            ids = np.flatnonzero(acc)
            vals, preds = acc[ids], None
        else:
            id_parts = [r[0][1] for r in results]
            val_parts = [r[0][2] for r in results]
            ids = np.concatenate(id_parts) if id_parts else np.empty(0, np.int64)
            vals = np.concatenate(val_parts) if val_parts else np.empty(0)
            preds = (
                np.concatenate([r[0][3] for r in results])
                if results and len(results[0][0]) > 3
                else None
            )
            if len(ids):
                # hub-split ranges can contribute duplicate dests; one
                # driver-side combine settles them (cheap: |ids| <= V)
                c = local_combine(program.combine, self.n, False, ids, vals, preds)
                ids, vals = c[1], c[2]
                preds = c[3] if len(c) > 3 else None
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
        if completed == 0 and ckpt_dir is None and frontier is None:
            niters = program.fixed_iters(params)
            if (
                self.cfg.resident
                and niters is not None
                and niters >= 2
                and program.engine == "global"
                and not program.paired_fwd_bwd
                and program.combine == "sum"
                and type(program).apply_dense is not VertexProgram.apply_dense
                and self.fwd_views
                and max(hi - lo for _, lo, hi in self.fwd_views)
                <= self.cfg.dense_threshold
                and program.dense_gather(program.scatter_view(state)) is not None
            ):
                return self._run_resident(program, state, niters, t_start)
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

    def _run_resident(
        self, program: VertexProgram, state: dict, niters: int, t_start: float
    ) -> RunResult:
        """Resident pipelined loop for GLOBAL fixed-iteration dense sum
        programs (PageRank/Katz shape): state is sliced into each
        range's OWNER actor once; every superstep is a scatter wave
        (each actor's fused kernel reads the owners' view-slice refs)
        chained into an apply wave (each owner sums its range's
        partials and applies element-wise) — all through object refs,
        with every iteration's tasks submitted up front. Driver work
        per superstep: O(P) future wiring, zero data. Partial-sum and
        apply order are DETERMINISTIC (fixed slice order, independent
        of arrival order), but the per-slice segmentation associates
        float adds differently than the classic path's global chunk
        grid — drift is summation-order-only, the class the round-6
        oracle gate absorbs (see dense_gather's contract). This is the
        multi-node execution shape:
        each "node" (range owner) keeps its own state partition, and
        the per-superstep exchange is one range-sized partial per edge
        actor plus the O(V) view fan-out."""
        # fwd_views lists hub-split actors of one range consecutively
        ranges: list[tuple[int, int]] = []
        range_actors: list[list] = []
        for a, lo, hi in self.fwd_views:
            if ranges and ranges[-1] == (lo, hi):
                range_actors[-1].append(a)
            else:
                ranges.append((lo, hi))
                range_actors.append([a])
        owners = [acts[0] for acts in range_actors]
        # owner slice boundaries for the per-slice pipelined scatter —
        # ranges are contiguous ascending by construction
        bounds = [lo for lo, hi in ranges] + [ranges[-1][1]]
        ray.get(
            [
                o.set_resident.remote({k: v[lo:hi] for k, v in state.items()})
                for o, (lo, hi) in zip(owners, ranges)
            ]
        )
        two = {"num_returns": 2}
        view_refs = [
            o.resident_apply_view.options(**two).remote(program, True)[0]
            for o in owners
        ]
        infos: list = []
        fused = all(len(acts) == 1 for acts in range_actors)
        for it in range(niters):
            last = it == niters - 1
            if fused:
                # single actor per range: the actor's scatter acc is the
                # complete partial for its own range, so scatter + apply
                # + next-view run as ONE task (see resident_superstep)
                nxt_views, infos = [], []
                for o in owners:
                    v, i = o.resident_superstep.options(**two).remote(
                        program, view_refs, FWD, bounds, not last
                    )
                    nxt_views.append(v)
                    infos.append(i)
                view_refs = nxt_views
                continue
            partial_futs = [
                [
                    a.resident_scatter.remote(program, view_refs, FWD, bounds)
                    for a in acts
                ]
                for acts in range_actors
            ]
            nxt_views, infos = [], []
            for o, pf in zip(owners, partial_futs):
                v, i = o.resident_apply_view.options(**two).remote(
                    program, not last, *pf
                )
                nxt_views.append(v)
                infos.append(i)
            view_refs = nxt_views
        ray.get(infos)  # barrier: the final applies are done
        slices = ray.get([o.get_resident_state.remote() for o in owners])
        for k in list(state.keys()):
            state[k] = np.concatenate([s[k] for s in slices])
        wall = time.perf_counter() - t_start
        per = wall / max(niters, 1)
        metrics = [
            {
                "superstep": i + 1,
                "frontier_next": self.n,
                "passes": [
                    {
                        "direction": FWD,
                        "active": self.n,
                        "updates_emitted": int(self.num_edges),
                        "updates_applied": int(self.n),
                        "changed": -1,  # not computed (see superstep())
                        "wall_s": per,
                    }
                ],
                "wall_s": per,  # pipelined: per-superstep walls are wall/niters
                "pipelined": True,
            }
            for i in range(niters)
        ]
        return RunResult(
            state=state,
            frontier=None,
            supersteps=niters,
            metrics=metrics,
            num_edges=self.num_edges,
            wall_seconds=wall,
        )

    def shutdown(self):
        seen = set()
        for a, _, _ in self.fwd_views + self.bwd_views:
            if a._actor_id not in seen:
                seen.add(a._actor_id)
                ray.kill(a)
        self.fwd_views, self.bwd_views = [], []
