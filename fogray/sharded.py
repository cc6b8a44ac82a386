"""Range-sharded flavors of the broadcast-superstep operator family
(fogray/incremental.py, fogray/temporal.py, fogray/coloring.py,
fogray/matching.py): identical semantics and outputs, with the O(V)
driver state and per-round O(V) broadcast removed.

The broadcast originals ship the full O(V) state pair via ``ray.put``
each round and fold O(V) minima/maxima on the driver — fine at
repo-graph V, a ~8-16 GB-per-round ceiling at V≈10⁹. This module
applies the dist-engine shape (fogray/dist_engine.py — FOG's segmented
``.attr`` machinery, fogsrc/fog_engine.cpp:1060-1313, where attribute
state never lives whole in one place) to the whole family:

- **Vertex state lives SLICED in P :class:`_MinShard` /
  :class:`_ColorShard` / :class:`_MatchShard` actors**, one per
  contiguous vid range (bounds degree-weighted so hub-heavy prefixes
  don't overload one shard).
- **Edges live in P :class:`_EdgeShard` actors, bucketed ONCE by src
  range** (one map wave, ``num_returns=P``); shards ACCUMULATE blocks
  across calls — the streaming-insert path ``incremental_cc`` needs.
  Every kernel in this family reads state only at ``src`` and emits
  only at ``dst`` (the coloring/matching kernels are reformulated
  from "read both endpoints" to "emit src-side facts at dst" — exact,
  because the edge sets are symmetric), so edge shard j needs exactly
  state slice j.
- **The per-round exchange is actor → object store → actor**: each
  state shard exports its O(V/P) slice (ONE object, fetched only by
  the co-ranged edge shard); each edge shard pre-combines per dst and
  ``ray.put``\\ s one partial per destination range; the driver routes
  O(P²) ObjectRefs and reads scalar counts — zero payload bytes
  transit the driver at any V.

Parity: every sharded operator is pytest-asserted bit-identical to its
broadcast original (labels, arrivals, colors, matched pairs, per-batch
stats), and the registered driver queries reuse the originals' SQL
oracles unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .util import from_arrow_chunked

_INF = np.int64(1) << 62


# ---------------------------------------------------------------------------
# shared infra: degree-weighted bounds + src-range bucketing
# ---------------------------------------------------------------------------

@ray.remote
def _src_meta(tab: pa.Table):
    """(unique srcs, counts, rows) of one edge block."""
    if tab.num_rows == 0 or tab.num_columns == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, 0
    s = tab.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    us, cs = np.unique(s, return_counts=True)
    return us, cs, len(s)


@ray.remote
def _bucket_src(tab: pa.Table, bounds: np.ndarray, cols: tuple):
    """Scatter ONE edge block into P pieces by src range
    (``num_returns=P`` — each piece is its own object, fetched only by
    its range's edge shard; the map stage of the bucketed exchange)."""
    p = len(bounds) - 1
    tab = tab.select(list(cols)) if tab.num_columns else tab
    if tab.num_rows == 0 or tab.num_columns == 0:
        empty = tab.slice(0, 0)
        return tuple(empty for _ in range(p)) if p > 1 else empty
    s = tab.column("src").to_numpy(zero_copy_only=False)
    part = np.searchsorted(bounds[1:-1], s, side="right")
    order = np.argsort(part, kind="stable")
    cuts = np.searchsorted(part[order], np.arange(p + 1))
    out = tuple(tab.take(order[cuts[j] : cuts[j + 1]]) for j in range(p))
    return out if p > 1 else out[0]


def _degree_bounds(edges_refs, n: int, p: int | None):
    """Range bounds weighted by out-degree (+1 per vid so empty spans
    stay splittable) from one metadata pass; the driver holds only the
    O(V)-int degree fold — never edges. ``p=None`` auto-sizes: capped
    at half the CPUs (and 16), scaled DOWN so each shard owns ≥ ~300k
    edges — at small inputs the per-round actor-call fixed costs
    dominate, at corpus scale the cap rules."""
    metas = ray.get([_src_meta.remote(r) for r in edges_refs])
    total_edges = int(sum(m[2] for m in metas))
    if p is None:
        cap = max(2, min(16, int(ray.cluster_resources().get("CPU", 8)) // 2))
        p = max(2, min(cap, total_edges // 300_000 + 1))
    outdeg = np.zeros(n, dtype=np.int64)
    us = [m[0] for m in metas if m[2]]
    if us:
        u = np.concatenate(us)
        c = np.concatenate([m[1] for m in metas if m[2]])
        outdeg = np.bincount(u, weights=c, minlength=n).astype(np.int64)
    cum = np.cumsum(outdeg + 1)
    total = int(cum[-1]) if len(cum) else 0  # n == 0: one empty span
    bounds = [0]
    for j in range(1, p):
        b = max(int(np.searchsorted(cum, total * j / p)), bounds[-1] + 1)
        if b >= n:
            break
        bounds.append(b)
    bounds.append(max(n, 1))
    return np.asarray(bounds, dtype=np.int64), total_edges


def _route(ref_lists, c):
    """Column c of the scatter ref matrix, Nones dropped."""
    return [rl[c] for rl in ref_lists if rl is not None and rl[c] is not None]


# ---------------------------------------------------------------------------
# edge shards (accumulating, src-range partitioned)
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0)
class _EdgeShard:
    """Edges whose src falls in [lo, hi), accumulated across ``add``
    calls. Scatter kernels read state ONLY at src (the range's own
    exported slice) and emit per-dst pre-combined partials, split by
    destination range and ``ray.put`` straight to the object store."""

    def __init__(self, idx: int, bounds, weighted: bool = False):
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.lo = int(self.bounds[idx])
        self.hi = int(self.bounds[idx + 1])
        self.P = len(self.bounds) - 1
        self.s = np.empty(0, dtype=np.int64)
        self.d = np.empty(0, dtype=np.int64)
        self.w = np.empty(0, dtype=np.int64) if weighted else None

    def add(self, *pieces):
        """Append edge pieces; returns (rows added, per-dst-range refs
        of the DISTINCT endpoint vids of the added edges — the
        disturbance seed for incremental frontiers)."""
        tabs = [t for t in pieces if t.num_rows and t.num_columns]
        added = 0
        ep_refs: list = [None] * self.P
        if tabs:
            s = np.concatenate(
                [t.column("src").to_numpy(zero_copy_only=False) for t in tabs]
            ).astype(np.int64)
            d = np.concatenate(
                [t.column("dst").to_numpy(zero_copy_only=False) for t in tabs]
            ).astype(np.int64)
            added = len(s)
            self.s = np.concatenate([self.s, s])
            self.d = np.concatenate([self.d, d])
            if self.w is not None:
                w = np.concatenate(
                    [t.column("t").to_numpy(zero_copy_only=False) for t in tabs]
                ).astype(np.int64)
                self.w = np.concatenate([self.w, w])
            eps = np.unique(np.r_[s, d])
            cuts = np.searchsorted(eps, self.bounds)
            for c in range(self.P):
                part = eps[cuts[c] : cuts[c + 1]]
                if len(part):
                    ep_refs[c] = ray.put(part)
        return added, ep_refs

    # -- kernels ----------------------------------------------------------

    def _emit_min(self, d, cand):
        """Pre-combine min per dst, split by dst range. Returned as P
        separate values — callers invoke with ``num_returns=P`` so the
        driver holds each partial's ref AT SUBMISSION and can route it
        to the destination state shard without a mid-round ray.get
        barrier (one barrier per round: the apply counts)."""
        if len(d) == 0:
            return tuple(None for _ in range(self.P)) if self.P > 1 else None
        order = np.lexsort((cand, d))
        d, cand = d[order], cand[order]
        first = np.r_[True, d[1:] != d[:-1]]
        d, cand = d[first], cand[first]
        cuts = np.searchsorted(d, self.bounds)
        out = tuple(
            pa.table({"v": d[cuts[c] : cuts[c + 1]], "c": cand[cuts[c] : cuts[c + 1]]})
            if cuts[c + 1] > cuts[c]
            else None
            for c in range(self.P)
        )
        return out if self.P > 1 else out[0]

    def scatter_min_label(self, export):
        """CC kernel: frontier srcs emit their label at dst."""
        vals, frontier = export
        rel = self.s - self.lo
        m = frontier[rel]
        if not m.any():
            return tuple(None for _ in range(self.P)) if self.P > 1 else None
        return self._emit_min(self.d[m], vals[rel[m]])

    def scatter_min_time(self, export):
        """Temporal kernel: frontier srcs emit each FEASIBLE edge's
        time (arrival[src] <= t) at dst."""
        vals, frontier = export
        rel = self.s - self.lo
        m = frontier[rel] & (vals[rel] <= self.w)
        if not m.any():
            return tuple(None for _ in range(self.P)) if self.P > 1 else None
        return self._emit_min(self.d[m], self.w[m])

    def scatter_maxregs(self, regs):
        """HyperBall kernel (transposed edge feed — see
        hyperball_sharded): per-dst elementwise max of the own-range
        src register rows, via a build-once dst-sorted permutation +
        one ``maximum.reduceat`` per hop; partials route by dst range
        as raw (ids, matrix) numpy pairs."""
        if len(self.s) == 0:
            return tuple(None for _ in range(self.P)) if self.P > 1 else None
        hb = getattr(self, "_hb", None)
        if hb is None:
            rel = self.s - self.lo
            order = np.argsort(self.d, kind="stable")
            d = self.d[order]
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            ids = d[starts]
            hb = self._hb = {
                "rel": rel[order],
                "starts": starts,
                "ids": ids,
                "cuts": np.searchsorted(ids, self.bounds),
            }
        mx = np.maximum.reduceat(regs[hb["rel"]], hb["starts"], axis=0)
        ids, cuts = hb["ids"], hb["cuts"]
        out = tuple(
            (ids[cuts[c] : cuts[c + 1]], mx[cuts[c] : cuts[c + 1]])
            if cuts[c + 1] > cuts[c]
            else None
            for c in range(self.P)
        )
        return out if self.P > 1 else out[0]

    def scatter_match(self, alive):
        """Matching proposal kernel: every live-src edge proposes its
        (h, a, b) key at dst (h = the deterministic splitmix edge
        weight, a/b canonical endpoints; self-loops ignored), min-
        combined per dst. Edges whose src died are PRUNED from the
        shard (an edge dies with either endpoint; the src side is the
        one this shard can see) — each round scans only live-src
        edges."""
        from .sources import det_weight

        rel = self.s - self.lo
        keep = alive[rel]
        if not keep.all():
            self.s, self.d = self.s[keep], self.d[keep]
        s, d = self.s, self.d
        nl = s != d
        s, d = s[nl], d[nl]
        if len(s) == 0:
            return tuple(None for _ in range(self.P)) if self.P > 1 else None
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        h = det_weight(a.astype(np.uint64), b.astype(np.uint64))
        order = np.lexsort((b, a, h, d))
        d, h, a, b = d[order], h[order], a[order], b[order]
        first = np.r_[True, d[1:] != d[:-1]]
        d, h, a, b = d[first], h[first], a[first], b[first]
        cuts = np.searchsorted(d, self.bounds)
        out = tuple(
            pa.table(
                {
                    "v": d[cuts[c] : cuts[c + 1]],
                    "h": h[cuts[c] : cuts[c + 1]],
                    "a": a[cuts[c] : cuts[c + 1]],
                    "b": b[cuts[c] : cuts[c + 1]],
                }
            )
            if cuts[c + 1] > cuts[c]
            else None
            for c in range(self.P)
        )
        return out if self.P > 1 else out[0]

    def _color_view(self):
        """Build-once dst-sorted view for the coloring kernel: edge
        arrays sorted by dst with per-dst group starts, so each round's
        kind-0 maxima are ONE masked gather + ``maximum.reduceat`` —
        no per-round sort. Self-loops are dropped up front — a vertex
        must not compete with (or constrain) itself; the broadcast
        original instead falls out of its loop leaving self-looped
        vertices uncolored, a degenerate input either way (coloring is
        defined on simple graphs; the co-occurrence derivation emits
        none)."""
        if getattr(self, "_cv", None) is None:
            nl = self.s != self.d
            s, d = self.s[nl], self.d[nl]
            order = np.argsort(d, kind="stable")
            s, d = s[order], d[order]
            starts = (
                np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
                if len(d)
                else np.empty(0, dtype=np.int64)
            )
            uniq_d = d[starts]
            dcuts = np.searchsorted(uniq_d, self.bounds)
            self._cv = {
                "rel_s": s - self.lo,
                "d": d,
                "starts": starts,
                "uniq_d": uniq_d,
                "dcuts": dcuts,
                "emitted": np.zeros(len(s), dtype=bool),
            }
        return self._cv

    def scatter_color(self, export):
        """Jones-Plassmann kernel, reformulated from the broadcast
        version's dst-side reads to src-side facts emitted at dst
        (exact on the symmetric edge set): kind-0 = uncolored src's
        priority, max-combined per dst via ``maximum.reduceat`` over
        the build-once dst-sorted view (the winner test input);
        kind-1 = distinct (dst, colored src's color) pairs (the mex
        input). A colored src's color never changes, so each edge
        emits its kind-1 fact ONCE (``emitted`` mask; the receiving
        state shard accumulates the pairs): total kind-1 volume is
        O(E) over the whole run — the broadcast original re-emits
        every colored edge every round."""
        color, prio = export
        cv = self._color_view()
        rel_s, starts, uniq_d = cv["rel_s"], cv["starts"], cv["uniq_d"]
        if len(rel_s) == 0:
            return tuple(None for _ in range(self.P)) if self.P > 1 else None
        csrc = color[rel_s]
        live = csrc == -1
        vals = np.where(live, prio[rel_s], -1)
        mx = np.maximum.reduceat(vals, starts) if len(starts) else vals[:0]
        new = (csrc >= 0) & ~cv["emitted"]
        n1 = d1 = c1 = None
        if new.any():
            cv["emitted"] |= new
            d1, c1 = cv["d"][new], csrc[new]
            order = np.lexsort((c1, d1))
            d1, c1 = d1[order], c1[order]
            keep = np.r_[True, (d1[1:] != d1[:-1]) | (c1[1:] != c1[:-1])]
            d1, c1 = d1[keep], c1[keep]
            n1 = np.searchsorted(d1, self.bounds)
        dcuts = cv["dcuts"]
        out = []
        for c in range(self.P):
            parts_d, parts_k, parts_v = [], [], []
            a, b = dcuts[c], dcuts[c + 1]
            if b > a:
                md = mx[a:b]
                has = md >= 0
                if has.any():
                    parts_d.append(uniq_d[a:b][has])
                    parts_k.append(np.zeros(int(has.sum()), dtype=np.int8))
                    parts_v.append(md[has])
            if n1 is not None and n1[c + 1] > n1[c]:
                i, j = n1[c], n1[c + 1]
                parts_d.append(d1[i:j])
                parts_k.append(np.ones(j - i, dtype=np.int8))
                parts_v.append(c1[i:j])
            out.append(
                pa.table(
                    {
                        "v": np.concatenate(parts_d),
                        "kind": np.concatenate(parts_k),
                        "val": np.concatenate(parts_v),
                    }
                )
                if parts_d
                else None
            )
        return tuple(out) if self.P > 1 else out[0]


# ---------------------------------------------------------------------------
# matching state shards (mutual-minimum maximal matching)
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0)
class _MatchShard:
    """Hoepman mutual-minimum matching state for vids [lo, hi): alive
    mask + this round's pick (fused a*n+b edge key). Two half-step
    exchanges per round: fold routed proposal minima into picks and
    emit partner claims; resolve routed claims into matched pairs."""

    def __init__(self, idx: int, bounds, n: int):
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.lo = int(self.bounds[idx])
        self.hi = int(self.bounds[idx + 1])
        self.P = len(self.bounds) - 1
        self.n = int(n)
        self.alive = np.ones(self.hi - self.lo, dtype=bool)
        self.pick = np.full(self.hi - self.lo, -1, dtype=np.int64)

    def export(self):
        return self.alive

    def fold_picks(self, *parts):
        """Routed (v, h, a, b) proposal minima -> per-alive-vid pick
        (lexicographic (h, a, b) min); emit each picker's claim at its
        partner's range. Returns (#alive vids holding a pick — the
        live-edge termination signal, per-range claim refs)."""
        self.pick[:] = -1
        none = [None] * self.P
        parts = [p for p in parts if p is not None and p.num_rows]
        if not parts:
            return 0, none
        v = np.concatenate(
            [p.column("v").to_numpy(zero_copy_only=False) for p in parts]
        )
        h = np.concatenate(
            [p.column("h").to_numpy(zero_copy_only=False) for p in parts]
        )
        a = np.concatenate(
            [p.column("a").to_numpy(zero_copy_only=False) for p in parts]
        )
        b = np.concatenate(
            [p.column("b").to_numpy(zero_copy_only=False) for p in parts]
        )
        rel = v - self.lo
        keep = self.alive[rel]
        if not keep.any():
            return 0, none
        rel, h, a, b = rel[keep], h[keep], a[keep], b[keep]
        order = np.lexsort((b, a, h, rel))
        rel, a, b = rel[order], a[order], b[order]
        first = np.r_[True, rel[1:] != rel[:-1]]
        rel, a, b = rel[first], a[first], b[first]
        self.pick[rel] = a * np.int64(self.n) + b
        vv = rel + self.lo
        o = np.where(vv == b, a, b)
        oo = np.argsort(o, kind="stable")
        o, a, b = o[oo], a[oo], b[oo]
        cuts = np.searchsorted(o, self.bounds)
        refs = []
        for c in range(self.P):
            i, j = cuts[c], cuts[c + 1]
            refs.append(
                ray.put(pa.table({"o": o[i:j], "a": a[i:j], "b": b[i:j]}))
                if j > i
                else None
            )
        return int(len(rel)), refs

    def resolve(self, *claims):
        """Routed partner claims -> mutual picks become matched: both
        endpoints leave the graph; the shard owning endpoint ``a``
        reports the pair."""
        if not claims:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        o = np.concatenate(
            [c.column("o").to_numpy(zero_copy_only=False) for c in claims]
        )
        a = np.concatenate(
            [c.column("a").to_numpy(zero_copy_only=False) for c in claims]
        )
        b = np.concatenate(
            [c.column("b").to_numpy(zero_copy_only=False) for c in claims]
        )
        rel = o - self.lo
        mutual = self.alive[rel] & (self.pick[rel] == a * np.int64(self.n) + b)
        self.alive[rel[mutual]] = False
        out = mutual & (o == a)
        return pa.table({"a": a[out], "b": b[out]})


# ---------------------------------------------------------------------------
# min-fixpoint state shards (CC labels / temporal arrivals)
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0)
class _MinShard:
    """int64 min-fixpoint state for vids [lo, hi): value array +
    frontier + touched mask, updated from routed per-range partials."""

    def __init__(self, idx: int, bounds, fill: str):
        bounds = np.asarray(bounds, dtype=np.int64)
        self.lo = int(bounds[idx])
        self.hi = int(bounds[idx + 1])
        span = self.hi - self.lo
        self.val = (
            np.arange(self.lo, self.hi, dtype=np.int64)
            if fill == "vid"
            else np.full(span, _INF, dtype=np.int64)
        )
        self.frontier = np.zeros(span, dtype=bool)
        self.touched = np.zeros(span, dtype=bool)

    def seed_frontier(self, *id_arrays):
        """Mark absolute vids as frontier + touched (disturbance seed)."""
        for ids in id_arrays:
            rel = np.asarray(ids, dtype=np.int64) - self.lo
            self.frontier[rel] = True
            self.touched[rel] = True
        return int(self.frontier.sum())

    def seed_value(self, vid: int, value: int):
        rel = vid - self.lo
        self.val[rel] = value
        self.frontier[rel] = True
        self.touched[rel] = True
        return 1

    def export(self):
        return self.val, self.frontier

    def apply(self, *parts):
        """Fold routed min partials (None/empty slots from the
        num_returns scatter are skipped); improved vids become next
        frontier. Returns the improvement count (the driver's only
        per-round read)."""
        self.frontier[:] = False
        total = 0
        parts = [p for p in parts if p is not None and p.num_rows]
        if parts:
            v = np.concatenate(
                [p.column("v").to_numpy(zero_copy_only=False) for p in parts]
            )
            c = np.concatenate(
                [p.column("c").to_numpy(zero_copy_only=False) for p in parts]
            )
            rel = v - self.lo
            cand = np.full(self.hi - self.lo, _INF, dtype=np.int64)
            np.minimum.at(cand, rel, c)
            improved = cand < self.val
            if improved.any():
                self.val[improved] = cand[improved]
                self.frontier = improved
                self.touched |= improved
                total = int(improved.sum())
        return total

    def lookup(self, *tables):
        """Answer routed value queries: for each table of vids ``q`` in
        this range, reply (q, val[q]) — put to the store, refs back
        (the root-resolution service the MSF relabel exchange uses)."""
        out = []
        for t in tables:
            q = t.column("q").to_numpy(zero_copy_only=False)
            out.append(ray.put(pa.table({"q": q, "r": self.val[q - self.lo]})))
        return out

    def fetch(self):
        return self.val, self.touched

    def write_shard(self, out_dir: str, idx: int) -> dict:
        """Write this range's (vid, value, touched) as one parquet
        shard (atomic rename) — the corpus-scale result path that
        never assembles the dense arrays anywhere."""
        import os

        import pyarrow.parquet as pq

        t = pa.table(
            {
                "vid": np.arange(self.lo, self.hi, dtype=np.int64),
                "value": self.val,
                "touched": self.touched,
            }
        )
        path = os.path.join(out_dir, f"part-{idx:05d}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return {"path": path, "rows": t.num_rows, "lo": self.lo, "hi": self.hi}

    def load_shard(self, path: str) -> int:
        """Restore this range's state from a checkpoint shard written
        by :meth:`write_shard` (resume path); frontier resets (a
        checkpoint is only taken at a settled fixpoint)."""
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["vid", "value", "touched"])
        vid = t.column("vid").to_numpy(zero_copy_only=False)
        if len(vid) != self.hi - self.lo or (len(vid) and vid[0] != self.lo):
            raise ValueError("checkpoint shard does not match this range")
        self.val = t.column("value").to_numpy(zero_copy_only=False).astype(np.int64)
        self.touched = (
            t.column("touched").to_numpy(zero_copy_only=False).astype(bool)
        )
        self.frontier[:] = False
        return len(vid)


# ---------------------------------------------------------------------------
# coloring state shards + distributed priority ranks
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0)
class _ColorShard:
    """Jones-Plassmann state for vids [lo, hi): color (-2 off-graph,
    -1 live, >=0 done) and priority (global rank of the splitmix
    hash, installed by the distributed rank pipeline)."""

    def __init__(self, idx: int, bounds):
        bounds = np.asarray(bounds, dtype=np.int64)
        self.lo = int(bounds[idx])
        self.hi = int(bounds[idx + 1])
        span = self.hi - self.lo
        self.color = np.full(span, -2, dtype=np.int64)
        self.prio = np.full(span, -1, dtype=np.int64)
        # accumulated kind-1 mex inputs: (rel vid, neighbor color) —
        # each edge contributes ONE pair over the whole run (the edge
        # shard drops a colored-src edge after emitting), compacted
        # each round to still-live targets
        self.acc_v = np.empty(0, dtype=np.int64)
        self.acc_c = np.empty(0, dtype=np.int64)

    def set_prios(self, *pieces):
        """Install (v, prio) pieces; touched vids become live."""
        for t in pieces:
            if t.num_rows == 0:
                continue
            rel = t.column("v").to_numpy(zero_copy_only=False) - self.lo
            self.prio[rel] = t.column("prio").to_numpy(zero_copy_only=False)
            self.color[rel] = -1
        return int((self.color == -1).sum())

    def export(self):
        return self.color, self.prio

    def apply_color(self, *parts):
        """Fold kind-0 maxima -> winners; append kind-1 pairs to the
        accumulator and mex the winners' accumulated colors; compact
        the accumulator to still-live targets. Returns the remaining
        live count."""
        from .coloring import _mex_fold

        live = self.color == -1
        span = self.hi - self.lo
        maxnbr = np.full(span, -1, dtype=np.int64)
        parts = [p for p in parts if p is not None and p.num_rows]
        if parts:
            v = np.concatenate(
                [p.column("v").to_numpy(zero_copy_only=False) for p in parts]
            )
            kind = np.concatenate(
                [p.column("kind").to_numpy(zero_copy_only=False) for p in parts]
            )
            val = np.concatenate(
                [p.column("val").to_numpy(zero_copy_only=False) for p in parts]
            )
            rel = v - self.lo
            m0 = kind == 0
            if m0.any():
                np.maximum.at(maxnbr, rel[m0], val[m0])
            m1 = kind == 1
            if m1.any():
                self.acc_v = np.concatenate([self.acc_v, rel[m1]])
                self.acc_c = np.concatenate([self.acc_c, val[m1]])
        winners = live & (self.prio > maxnbr)
        if winners.any():
            if len(self.acc_v):
                mw = winners[self.acc_v]
                mex = _mex_fold(self.acc_v[mw], self.acc_c[mw], span)
            else:
                mex = np.zeros(span, dtype=np.int64)
            w = np.flatnonzero(winners)
            self.color[w] = mex[w]
            if len(self.acc_v):
                # winners are colored: their accumulated pairs are dead
                keep = (self.color == -1)[self.acc_v]
                self.acc_v = self.acc_v[keep]
                self.acc_c = self.acc_c[keep]
        return int(live.sum() - winners.sum())

    def fetch(self):
        return self.color


@ray.remote
def _hv_meta(tab: pa.Table):
    """(rows, first_h, first_v) of one rank block (None key if empty)."""
    if tab.num_rows == 0 or tab.num_columns == 0:
        return 0, None, None
    return (
        tab.num_rows,
        float(tab.column("h")[0].as_py()),
        int(tab.column("v")[0].as_py()),
    )


@ray.remote
def _rank_bucket(tab: pa.Table, offset: int, bounds: np.ndarray):
    """Assign global ranks offset..offset+rows-1 in (h, v) order and
    bucket the (v, prio) pairs by vid range (``num_returns=P``)."""
    P = len(bounds) - 1
    empty = pa.table(
        {"v": pa.array([], pa.int64()), "prio": pa.array([], pa.int64())}
    )
    if tab.num_rows == 0 or tab.num_columns == 0:
        return tuple(empty for _ in range(P)) if P > 1 else empty
    h = tab.column("h").to_numpy(zero_copy_only=False)
    v = tab.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((v, h))
    v = v[order]
    prio = np.arange(offset, offset + len(v), dtype=np.int64)
    vo = np.argsort(v, kind="stable")
    v, prio = v[vo], prio[vo]
    cuts = np.searchsorted(v, bounds)
    out = tuple(
        pa.table({"v": v[cuts[c] : cuts[c + 1]], "prio": prio[cuts[c] : cuts[c + 1]]})
        for c in range(P)
    )
    return out if P > 1 else out[0]


def _install_ranks(edges, bounds, state_shards):
    """Distributed priority computation, bit-identical to the broadcast
    version's ``rank of splitmix hash over sorted touched vids``: the
    distinct endpoint set is deduped by a group-complete pass over ONE
    (h, v) sort; each deduped block gets a rank offset from a
    driver-side cumsum of BLOCK COUNTS (O(blocks), never O(V)); ranks
    assign per block and bucket straight to the owning state shards.
    Returns the total live count."""
    from .derive import key_grouped_block_map
    from .sources import det_weight

    def ep_h(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table(
                {"h": pa.array([], pa.float64()), "v": pa.array([], pa.int64())}
            )
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        v = np.unique(np.r_[s, d]).astype(np.int64)
        h = det_weight(v.astype(np.uint64), np.zeros(len(v), dtype=np.uint64))
        return pa.table({"h": h, "v": v})

    def dedup(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, h))
        h, v = h[order], v[order]
        keep = np.r_[True, v[1:] != v[:-1]]  # equal v => equal h
        return pa.table({"h": h[keep], "v": v[keep]})

    hv = edges.map_batches(ep_h, batch_format="pyarrow").sort(["h", "v"])
    deduped = key_grouped_block_map(hv, ["h", "v"], dedup).materialize()
    refs = deduped.to_arrow_refs()
    metas = ray.get([_hv_meta.remote(r) for r in refs])
    order = sorted(
        (i for i in range(len(refs)) if metas[i][0]),
        key=lambda i: (metas[i][1], metas[i][2]),
    )
    P = len(bounds) - 1
    offset = 0
    piece_cols: list[list] = [[] for _ in range(P)]
    for i in order:
        pieces = _rank_bucket.options(num_returns=P if P > 1 else 1).remote(
            refs[i], offset, bounds
        )
        if P == 1:
            pieces = [pieces]
        for c in range(P):
            piece_cols[c].append(pieces[c])
        offset += metas[i][0]
    live = ray.get(
        [
            state_shards[c].set_prios.remote(*piece_cols[c])
            for c in range(P)
            if piece_cols[c]
        ]
    )
    return sum(live)


def jones_plassmann_sharded(edges, n: int,
                            num_partitions: int | None = None) -> pa.Table:
    """Sharded flavor of :func:`fogray.coloring.jones_plassmann` —
    identical colors (same rank-of-hash priorities, computed
    distributedly), state sharded by vid range, per-round exchange =
    pre-combined per-dst-range partials routed actor-to-actor. The
    final (vid, color) table is assembled on the driver because it IS
    the result; at corpus scale collect per-shard parquet instead."""
    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table(
                {
                    "src": np.asarray(src, dtype=np.int64),
                    "dst": np.asarray(dst, dtype=np.int64),
                }
            )
        )
    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.count() == 0:
        return pa.table(
            {"vid": pa.array([], pa.int64()), "color": pa.array([], pa.int64())}
        )
    state, edge, bounds, refs, cols = _build_shards(
        edges, n, num_partitions, weighted=False, fill="vid",
        state_cls=_ColorShard,
    )
    P = len(bounds) - 1
    try:
        _add_blocks(edge, refs, bounds, cols)
        live = _install_ranks(edges, bounds, state)
        while live > 0:
            exports = [s.export.remote() for s in state]
            ref_lists = [
                e.scatter_color.options(num_returns=P).remote(exports[j])
                if P > 1
                else [e.scatter_color.remote(exports[j])]
                for j, e in enumerate(edge)
            ]
            prev = live
            live = sum(
                ray.get(
                    [
                        state[c].apply_color.remote(*[rl[c] for rl in ref_lists])
                        for c in range(P)
                    ]
                )
            )
            if live >= prev:  # cannot happen: the max live priority wins
                raise RuntimeError("jones_plassmann_sharded made no progress")
        color = np.concatenate(ray.get([s.fetch.remote() for s in state]))
    finally:
        _shutdown(state, edge)
    touched = np.flatnonzero(color != -2)
    return pa.table(
        {
            "vid": pa.array(touched.astype(np.int64)),
            "color": pa.array(color[touched].astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# Borůvka MSF (sharded): cached endpoint comps + CC-based contraction
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0)
class _MsfEdgeShard:
    """Canonical (a < b, w) graph edges with CACHED endpoint component
    labels (ca, cb), initially (a, b). Each round the cache refreshes
    via a distinct-comp request/reply exchange against the sharded CC
    label service (:meth:`_MinShard.lookup`) — the exchange is bounded
    by the shard's DISTINCT active comps, which halve per round —
    then intra-component edges are pruned and each surviving cross
    edge proposes itself to BOTH endpoint comps, min-combined per comp
    and routed by comp range. Edges never move after the initial
    bucketing; only comp-sized metadata is exchanged."""

    def __init__(self, idx: int, bounds):
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        self.a = np.empty(0, dtype=np.int64)
        self.b = np.empty(0, dtype=np.int64)
        self.w = np.empty(0, dtype=np.float64)
        self.ca = np.empty(0, dtype=np.int64)
        self.cb = np.empty(0, dtype=np.int64)

    def add(self, *pieces):
        tabs = [t for t in pieces if t.num_rows and t.num_columns]
        if not tabs:
            return 0
        s = np.concatenate(
            [t.column("src").to_numpy(zero_copy_only=False) for t in tabs]
        ).astype(np.int64)
        d = np.concatenate(
            [t.column("dst").to_numpy(zero_copy_only=False) for t in tabs]
        ).astype(np.int64)
        w = np.concatenate(
            [t.column("weight").to_numpy(zero_copy_only=False) for t in tabs]
        ).astype(np.float64)
        keep = s < d  # one canonical row per undirected edge
        self.a = np.concatenate([self.a, s[keep]])
        self.b = np.concatenate([self.b, d[keep]])
        self.w = np.concatenate([self.w, w[keep]])
        self.ca = self.a.copy()
        self.cb = self.b.copy()
        return int(keep.sum())

    def make_requests(self):
        """Per-comp-range refs of the DISTINCT cached comp ids."""
        q = np.unique(np.r_[self.ca, self.cb])
        cuts = np.searchsorted(q, self.bounds)
        return [
            ray.put(pa.table({"q": q[cuts[c] : cuts[c + 1]]}))
            if cuts[c + 1] > cuts[c]
            else None
            for c in range(self.P)
        ]

    def apply_relabel(self, *replies):
        """Apply routed (q, root) replies to the cache; prune settled
        intra-component edges. Returns the surviving cross-edge count."""
        if replies:
            q = np.concatenate(
                [r.column("q").to_numpy(zero_copy_only=False) for r in replies]
            )
            r = np.concatenate(
                [r.column("r").to_numpy(zero_copy_only=False) for r in replies]
            )
            order = np.argsort(q, kind="stable")
            q, r = q[order], r[order]
            self.ca = r[np.searchsorted(q, self.ca)]
            self.cb = r[np.searchsorted(q, self.cb)]
        cross = self.ca != self.cb
        if not cross.all():
            for f in ("a", "b", "w", "ca", "cb"):
                setattr(self, f, getattr(self, f)[cross])
        return len(self.a)

    def propose(self):
        """Per-comp lexicographic (w, a, b)-min cross-edge candidates,
        both endpoint comps, routed by comp range."""
        if len(self.a) == 0:
            return [None] * self.P
        comp = np.r_[self.ca, self.cb]
        w = np.r_[self.w, self.w]
        a = np.r_[self.a, self.a]
        b = np.r_[self.b, self.b]
        order = np.lexsort((b, a, w, comp))
        comp, w, a, b = comp[order], w[order], a[order], b[order]
        first = np.r_[True, comp[1:] != comp[:-1]]
        comp, w, a, b = comp[first], w[first], a[first], b[first]
        cuts = np.searchsorted(comp, self.bounds)
        out = []
        for c in range(self.P):
            i, j = cuts[c], cuts[c + 1]
            out.append(
                ray.put(
                    pa.table(
                        {"comp": comp[i:j], "w": w[i:j], "a": a[i:j], "b": b[i:j]}
                    )
                )
                if j > i
                else None
            )
        return out


@ray.remote
def _fold_picks_msf(*parts):
    """Fold one comp range's routed candidate partials: lex-min per
    comp, then exact-dup collapse (mutual pairs pick the same edge).
    Returns (#picked rows, ref to the (a, b, weight) pick table)."""
    if not parts:
        return 0, None
    comp = np.concatenate(
        [p.column("comp").to_numpy(zero_copy_only=False) for p in parts]
    )
    w = np.concatenate([p.column("w").to_numpy(zero_copy_only=False) for p in parts])
    a = np.concatenate([p.column("a").to_numpy(zero_copy_only=False) for p in parts])
    b = np.concatenate([p.column("b").to_numpy(zero_copy_only=False) for p in parts])
    order = np.lexsort((b, a, w, comp))
    comp, w, a, b = comp[order], w[order], a[order], b[order]
    first = np.r_[True, comp[1:] != comp[:-1]]
    w, a, b = w[first], a[first], b[first]
    order = np.lexsort((b, a))
    a, b, w = a[order], b[order], w[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    a, b, w = a[keep], b[keep], w[keep]
    return len(a), ray.put(pa.table({"a": a, "b": b, "weight": w}))


@ray.remote
def _bucket_sym(tab: pa.Table, bounds: np.ndarray):
    """Symmetrize a pick table (a, b) into (src, dst) both ways and
    bucket by src range (``num_returns=P``) — the CC feed batch."""
    P = len(bounds) - 1
    s = np.r_[
        tab.column("a").to_numpy(zero_copy_only=False),
        tab.column("b").to_numpy(zero_copy_only=False),
    ]
    d = np.r_[
        tab.column("b").to_numpy(zero_copy_only=False),
        tab.column("a").to_numpy(zero_copy_only=False),
    ]
    order = np.argsort(s, kind="stable")
    s, d = s[order], d[order]
    cuts = np.searchsorted(s, bounds)
    out = tuple(
        pa.table({"src": s[cuts[c] : cuts[c + 1]], "dst": d[cuts[c] : cuts[c + 1]]})
        for c in range(P)
    )
    return out if P > 1 else out[0]


def boruvka_msf_sharded(edges, n: int,
                        num_partitions: int | None = None) -> pa.Table:
    """Sharded flavor of :func:`fogray.msf.boruvka_msf` — the identical
    unique MSF under the strict (weight, a, b) order, with the O(V)
    per-round comp broadcast and driver hook/pointer-jump replaced by:
    cached endpoint comps in the edge shards (refreshed by a
    distinct-comp request/reply exchange, halving per round), per-comp
    candidate routing, and contraction via the sharded incremental-CC
    machinery (picked edges feed the label shards as a batch; min-vid
    labels are a valid union-find representative, so the picked-edge
    SET — and thus the MSF — is unchanged; pytest-asserted equal).
    Only the final O(V)-edge forest is assembled on the driver."""
    if not isinstance(edges, rd.Dataset):
        src, dst, w = edges
        edges = from_arrow_chunked(
            pa.table(
                {
                    "src": np.asarray(src, dtype=np.int64),
                    "dst": np.asarray(dst, dtype=np.int64),
                    "weight": np.asarray(w, dtype=np.float64),
                }
            )
        )
    edges = edges.select_columns(["src", "dst", "weight"]).materialize()
    label, ccedge, bounds, refs, _cols = _build_shards(
        edges, n, num_partitions, weighted=False, fill="vid"
    )
    P = len(bounds) - 1
    msfedge = [_MsfEdgeShard.remote(j, bounds) for j in range(P)]
    pick_refs = []
    try:
        pieces = [
            _bucket_src.options(num_returns=P if P > 1 else 1).remote(
                r, bounds, ("src", "dst", "weight")
            )
            for r in refs
        ]
        if P == 1:
            pieces = [[x] for x in pieces]
        ray.get(
            [
                msfedge[j].add.remote(*[pieces[b][j] for b in range(len(pieces))])
                for j in range(P)
            ]
        )
        max_rounds = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
        for rnd in range(max_rounds):
            if rnd > 0:
                # refresh cached comps from the CC labels (2 routed
                # exchanges bounded by distinct active comps)
                reqs = ray.get([e.make_requests.remote() for e in msfedge])
                replies: list[list] = [[] for _ in range(P)]
                for c in range(P):
                    owners_in = [
                        (i, reqs[i][c]) for i in range(P) if reqs[i][c] is not None
                    ]
                    if not owners_in:
                        continue
                    outs = ray.get(
                        label[c].lookup.remote(*[r for _i, r in owners_in])
                    )
                    for (i, _r), ref in zip(owners_in, outs):
                        replies[i].append(ref)
                remaining = ray.get(
                    [
                        msfedge[i].apply_relabel.remote(*replies[i])
                        for i in range(P)
                    ]
                )
                if sum(remaining) == 0:
                    break
            cand_lists = ray.get([e.propose.remote() for e in msfedge])
            folds = ray.get(
                [
                    _fold_picks_msf.remote(*_route(cand_lists, c))
                    for c in range(P)
                ]
            )
            if sum(f[0] for f in folds) == 0:
                break
            round_refs = [f[1] for f in folds if f[1] is not None]
            pick_refs.extend(round_refs)
            # contraction: feed picked edges into the sharded CC
            sym = [
                _bucket_sym.options(num_returns=P if P > 1 else 1).remote(r, bounds)
                for r in round_refs
            ]
            if P == 1:
                sym = [[x] for x in sym]
            adds = ray.get(
                [
                    ccedge[j].add.remote(*[sym[b][j] for b in range(len(sym))])
                    for j in range(P)
                ]
            )
            ep_cols = [
                [eps[c] for _a, eps in adds if eps[c] is not None]
                for c in range(P)
            ]
            seeded = sum(
                ray.get(
                    [
                        label[c].seed_frontier.remote(*ep_cols[c])
                        for c in range(P)
                        if ep_cols[c]
                    ]
                )
            )
            _min_rounds(label, ccedge, "scatter_min_label", seeded)
        tabs = [t for t in ray.get(pick_refs) if t.num_rows]
    finally:
        _shutdown(label, ccedge, msfedge)
    if not tabs:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "weight": pa.array([], pa.float64()),
            }
        )
    t = pa.concat_tables(tabs)
    a = t.column("a").to_numpy(zero_copy_only=False)
    b = t.column("b").to_numpy(zero_copy_only=False)
    w = t.column("weight").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b, w = a[order], b[order], w[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return pa.table(
        {
            "a": pa.array(a[keep].astype(np.int64)),
            "b": pa.array(b[keep].astype(np.int64)),
            "weight": pa.array(w[keep], pa.float64()),
        }
    )


def _build_shards(edges, n: int, p: int | None, weighted: bool, fill: str,
                  state_cls=None, bounds_override=None, state_factory=None):
    """Bucket a materialized edge Dataset by src range into P edge
    shards + P state shards. Returns (state, edge, bounds, refs).
    ``bounds_override`` (resume path) adopts previously-persisted range
    bounds instead of re-deriving them — recomputed bounds depend on
    the CPU count, which may differ on the resuming machine.
    ``state_factory(j, bounds)`` spawns a custom state actor per range
    (the ONE place bounds + actor construction live — every operator
    routes through here)."""
    refs = edges.to_arrow_refs()
    if bounds_override is not None:
        bounds = np.asarray(bounds_override, dtype=np.int64)
    else:
        bounds, _total = _degree_bounds(refs, n, p)
    P = len(bounds) - 1
    cols = ("src", "dst", "t") if weighted else ("src", "dst")
    if state_factory is not None:
        state = [state_factory(j, bounds) for j in range(P)]
    else:
        cls = state_cls or _MinShard
        if cls is _MinShard:
            state = [cls.remote(j, bounds, fill) for j in range(P)]
        else:
            state = [cls.remote(j, bounds) for j in range(P)]
    edge = [_EdgeShard.remote(j, bounds, weighted) for j in range(P)]
    return state, edge, bounds, refs, cols


def _add_blocks(edge_shards, block_refs, bounds, cols):
    """One bucketing map wave + routed adds. Returns (rows added,
    per-state-range endpoint ref columns)."""
    P = len(bounds) - 1
    if not block_refs:
        return 0, [[] for _ in range(P)]
    pieces = [
        _bucket_src.options(num_returns=P if P > 1 else 1).remote(r, bounds, cols)
        for r in block_refs
    ]
    if P == 1:
        pieces = [[x] for x in pieces]
    adds = ray.get(
        [
            edge_shards[j].add.remote(*[pieces[b][j] for b in range(len(pieces))])
            for j in range(P)
        ]
    )
    added = sum(a for a, _ in adds)
    ep_cols = [
        [eps[c] for _a, eps in adds if eps[c] is not None] for c in range(P)
    ]
    return added, ep_cols


def _min_rounds(state_shards, edge_shards, method: str, seeded: int):
    """Frontier-limited min-fixpoint rounds; returns (rounds, updates).
    Per round the driver submits O(P) actor calls and routes O(P²)
    refs; scatter methods run with ``num_returns=P`` so every
    partial's ref exists AT SUBMISSION and the whole round pipelines
    down to ONE driver barrier (the P apply counts) — no payload ever
    touches the driver."""
    P = len(state_shards)
    rounds, updates, front = 0, 0, seeded
    while front > 0:
        rounds += 1
        exports = [s.export.remote() for s in state_shards]
        ref_lists = [
            getattr(e, method).options(num_returns=P).remote(exports[j])
            if P > 1
            else [getattr(e, method).remote(exports[j])]
            for j, e in enumerate(edge_shards)
        ]
        counts = ray.get(
            [
                state_shards[c].apply.remote(*[rl[c] for rl in ref_lists])
                for c in range(P)
            ]
        )
        front = sum(counts)
        updates += front
    return rounds, updates


def _fetch_min(state_shards):
    parts = ray.get([s.fetch.remote() for s in state_shards])
    val = np.concatenate([p[0] for p in parts])
    touched = np.concatenate([p[1] for p in parts])
    return val, touched


def _shutdown(*actor_lists):
    for actors in actor_lists:
        for a in actors:
            ray.kill(a)


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def _latest_cc_manifest(ckpt_dir: str):
    """Newest complete per-batch checkpoint manifest, or None."""
    import json
    import os

    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if not (name.startswith("manifest-batch") and name.endswith(".json")):
            continue
        with open(os.path.join(ckpt_dir, name)) as f:
            m = json.load(f)
        if all(os.path.exists(p) for p in m["shards"]) and (
            best is None or m["batch"] > best["batch"]
        ):
            best = m
    return best


def incremental_cc_sharded(edges, n: int, num_batches: int = 4,
                           num_partitions: int | None = None,
                           out_dir: str | None = None,
                           ckpt_dir: str | None = None,
                           resume: bool = False):
    """Sharded flavor of :func:`fogray.incremental.incremental_cc` —
    identical batches (splitmix arrival tags), labels, touched set and
    per-batch stats, with state sharded and edges accumulating in the
    shard actors instead of the O(V) per-round broadcast.

    With ``out_dir`` set, the state shards write one (vid, value,
    touched) parquet shard each IN PARALLEL and the dense arrays are
    never assembled anywhere — the corpus-scale result path; the
    return is then (None, None, stats) with the shard manifest
    appended to stats.

    With ``ckpt_dir`` set, each completed batch writes a per-shard
    checkpoint (parallel shard parquet + atomic json manifest);
    ``resume=True`` restores the newest complete checkpoint (the
    shards reload their slices in parallel, already-arrived edge
    batches re-bucket WITHOUT re-running any propagation rounds) and
    continues from the next batch — same final labels and stats as an
    uninterrupted run (pytest-asserted)."""
    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table(
                {
                    "src": np.asarray(src, dtype=np.int64),
                    "dst": np.asarray(dst, dtype=np.int64),
                }
            )
        )

    from .incremental import arrival_picker, arrival_tagger

    tagged = (
        edges.select_columns(["src", "dst"])
        .map_batches(arrival_tagger(num_batches), batch_format="pyarrow")
        .materialize()
    )
    m_resume = _latest_cc_manifest(ckpt_dir) if (resume and ckpt_dir) else None
    if m_resume is not None:
        if m_resume["num_batches"] != num_batches or (
            m_resume["bounds"][-1] != max(n, 1)
        ):
            raise ValueError("checkpoint does not match this input/configuration")
    state, edge, bounds, _refs, cols = _build_shards(
        tagged, n, num_partitions, weighted=False, fill="vid",
        bounds_override=m_resume["bounds"] if m_resume else None,
    )
    P = len(bounds) - 1

    pick = arrival_picker

    stats: list[dict] = []
    start_batch = 0
    try:
        if m_resume is not None:
            ray.get(
                [
                    state[j].load_shard.remote(m_resume["shards"][j])
                    for j in range(P)
                ]
            )
            stats = list(m_resume["stats"])
            start_batch = m_resume["batch"] + 1
            # already-arrived batches re-bucket into the edge shards in
            # ONE filtered pass (needed for future propagation); NO
            # rounds, no frontier seeding — their fixpoint is the
            # checkpointed state

            def pick_arrived(t: pa.Table, hi=start_batch) -> pa.Table:
                keep = pa.compute.less(t.column("arrival"), hi)
                return t.filter(keep).drop_columns(["arrival"])

            prev = tagged.map_batches(
                pick_arrived, batch_format="pyarrow"
            ).materialize()
            _add_blocks(edge, prev.to_arrow_refs(), bounds, cols)
        for b in range(start_batch, num_batches):
            batch_ds = tagged.map_batches(
                pick(b), batch_format="pyarrow"
            ).materialize()
            added, ep_cols = _add_blocks(edge, batch_ds.to_arrow_refs(), bounds, cols)
            seeded = sum(
                ray.get(
                    [
                        state[c].seed_frontier.remote(*ep_cols[c])
                        for c in range(P)
                        if ep_cols[c]
                    ]
                )
            )
            rounds, updates = _min_rounds(state, edge, "scatter_min_label", seeded)
            stats.append(
                {"new_edges": int(added), "rounds": rounds, "updates": updates}
            )
            if ckpt_dir is not None:
                import json
                import os

                bdir = os.path.join(ckpt_dir, f"batch={b}")
                os.makedirs(bdir, exist_ok=True)
                manifest = ray.get(
                    [state[j].write_shard.remote(bdir, j) for j in range(P)]
                )
                mpath = os.path.join(ckpt_dir, f"manifest-batch{b}.json")
                tmp = f"{mpath}.tmp.{os.getpid()}"
                with open(tmp, "w") as f:
                    json.dump(
                        {
                            "batch": b,
                            "num_batches": num_batches,
                            "bounds": [int(x) for x in bounds],
                            "stats": stats,
                            "shards": [s["path"] for s in manifest],
                        },
                        f,
                    )
                os.replace(tmp, mpath)
        if out_dir is not None:
            import os

            os.makedirs(out_dir, exist_ok=True)
            manifest = ray.get(
                [state[j].write_shard.remote(out_dir, j) for j in range(P)]
            )
            stats.append({"shards": manifest})
            labels = touched = None
        else:
            labels, touched = _fetch_min(state)
            # bounds cover [0, max(n, 1)) so n == 0 yields one dummy vid
            labels, touched = labels[:n], np.flatnonzero(touched[:n])
    finally:
        _shutdown(state, edge)
    return labels, touched, stats


def greedy_matching_sharded(edges, n: int,
                            num_partitions: int | None = None) -> pa.Table:
    """Sharded flavor of :func:`fogray.matching.greedy_matching` —
    identical matched pairs, with the O(V) alive-mask broadcast
    replaced by sliced alive state and two routed half-step exchanges
    per round (proposal minima in, partner claims across). Matched
    pairs stream back as per-round per-shard refs; only the final
    matching (the result itself) is assembled on the driver."""
    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table(
                {
                    "src": np.asarray(src, dtype=np.int64),
                    "dst": np.asarray(dst, dtype=np.int64),
                }
            )
        )
    edges = edges.select_columns(["src", "dst"]).materialize()
    state, edge, bounds, refs, cols = _build_shards(
        edges, n, num_partitions, weighted=False, fill="vid",
        state_factory=lambda j, b: _MatchShard.remote(j, b, n),
    )
    P = len(bounds) - 1
    pair_refs = []
    try:
        _add_blocks(edge, refs, bounds, cols)
        while True:
            exports = [s.export.remote() for s in state]
            prop_lists = [
                e.scatter_match.options(num_returns=P).remote(exports[j])
                if P > 1
                else [e.scatter_match.remote(exports[j])]
                for j, e in enumerate(edge)
            ]
            folds = ray.get(
                [
                    state[c].fold_picks.remote(*[pl[c] for pl in prop_lists])
                    for c in range(P)
                ]
            )
            if sum(f[0] for f in folds) == 0:
                break
            claim_lists = [f[1] for f in folds]
            pair_refs.extend(
                state[c].resolve.remote(*_route(claim_lists, c)) for c in range(P)
            )
        tabs = [t for t in ray.get(pair_refs) if t.num_rows]
    finally:
        _shutdown(state, edge)
    if not tabs:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(tabs)
    a = t.column("a").to_numpy(zero_copy_only=False)
    b = t.column("b").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    return pa.table(
        {
            "a": pa.array(a[order].astype(np.int64)),
            "b": pa.array(b[order].astype(np.int64)),
        }
    )


def temporal_earliest_arrival_sharded(edges, n: int, source: int,
                                      num_partitions: int | None = None,
                                      out_dir: str | None = None):
    """Sharded flavor of
    :func:`fogray.temporal.temporal_earliest_arrival` — identical
    arrival times and reached set, state sharded by vid range. With
    ``out_dir`` set, shards write (vid, value=arrival, touched)
    parquet in parallel and nothing dense assembles anywhere
    (returns (None, None))."""
    if not isinstance(edges, rd.Dataset):
        src, dst, tt = edges
        edges = from_arrow_chunked(
            pa.table(
                {
                    "src": np.asarray(src, dtype=np.int64),
                    "dst": np.asarray(dst, dtype=np.int64),
                    "t": np.asarray(tt, dtype=np.int64),
                }
            )
        )
    edges = edges.select_columns(["src", "dst", "t"]).materialize()
    state, edge, bounds, refs, cols = _build_shards(
        edges, n, num_partitions, weighted=True, fill="inf"
    )
    try:
        _add_blocks(edge, refs, bounds, cols)
        j = int(np.searchsorted(bounds[1:], source, side="right"))
        seeded = ray.get(state[j].seed_value.remote(source, -1))
        _min_rounds(state, edge, "scatter_min_time", seeded)
        if out_dir is not None:
            import os

            os.makedirs(out_dir, exist_ok=True)
            P = len(bounds) - 1
            ray.get([state[j].write_shard.remote(out_dir, j) for j in range(P)])
            return None, None
        arrival, _touched = _fetch_min(state)
        arrival = arrival[:n]  # bounds cover [0, max(n, 1))
    finally:
        _shutdown(state, edge)
    return arrival, np.flatnonzero(arrival < _INF)


# ---------------------------------------------------------------------------
# sharded HyperBall (per-vertex HLL register matrices, max-combine)
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0)
class _RegShard:
    """HyperBall register state for vids [lo, hi): a (span, 256) uint8
    matrix, updated by routed per-range elementwise maxima. Per hop it
    also returns its slice's estimates, so the driver only ever holds
    O(V) floats of RESULT, never register payload."""

    def __init__(self, idx: int, bounds):
        bounds = np.asarray(bounds, dtype=np.int64)
        self.lo = int(bounds[idx])
        self.hi = int(bounds[idx + 1])
        self.regs = np.zeros((self.hi - self.lo, 256), dtype=np.uint8)
        self.touched = np.zeros(self.hi - self.lo, dtype=bool)

    def seed(self, *id_arrays):
        """Install singleton sketches for the touched vids."""
        from .hyperball import _vid_registers

        for ids in id_arrays:
            ids = np.asarray(ids, dtype=np.int64)
            rel = ids - self.lo
            self.regs[rel] = np.maximum(self.regs[rel], _vid_registers(ids))
            self.touched[rel] = True
        return int(self.touched.sum())

    def export(self):
        return self.regs

    def apply_max(self, *parts):
        """Fold routed (ids, matrix) maxima into the slice."""
        for p in parts:
            if p is None:
                continue
            ids, mx = p
            if len(ids):
                np.maximum.at(self.regs, ids - self.lo, mx)
        return True

    def estimates(self):
        """(touched vids, HLL estimates of their current sketches)."""
        from .hyperball import hll_estimate_rows

        rel = np.flatnonzero(self.touched)
        return rel + self.lo, hll_estimate_rows(self.regs[rel])


def hyperball_sharded(edges, n: int, max_hops: int = 3,
                      num_partitions: int | None = None) -> pa.Table:
    """Sharded flavor of :func:`fogray.hyperball.hyperball` — identical
    estimates, with the (V, 256) register matrix SLICED across range
    shards instead of broadcast whole each hop. HyperBall reads at dst
    and emits at src, so the edges feed the src-range-bucketed
    :class:`_EdgeShard` machinery TRANSPOSED (src/dst swapped): each
    edge shard reads exactly its own range's register slice and routes
    per-src pre-combined maxima by src range."""
    from .util import sql_round

    if not isinstance(edges, rd.Dataset):
        src, dst = edges
        edges = from_arrow_chunked(
            pa.table(
                {
                    "src": np.asarray(src, dtype=np.int64),
                    "dst": np.asarray(dst, dtype=np.int64),
                }
            )
        )

    def swap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        return pa.table({"src": t.column("dst"), "dst": t.column("src")})

    swapped = (
        edges.select_columns(["src", "dst"])
        .map_batches(swap, batch_format="pyarrow")
        .materialize()
    )
    state, edge, bounds, refs, cols = _build_shards(
        swapped, n, num_partitions, weighted=False, fill="vid",
        state_factory=lambda j, b: _RegShard.remote(j, b),
    )
    P = len(bounds) - 1
    try:
        _added, ep_cols = _add_blocks(edge, refs, bounds, cols)
        ray.get(
            [
                state[c].seed.remote(*ep_cols[c])
                for c in range(P)
                if ep_cols[c]
            ]
        )
        out_v, out_h, out_e = [], [], []

        def collect(hop: int):
            parts = ray.get([s.estimates.remote() for s in state])
            v = np.concatenate([p[0] for p in parts])
            e = np.concatenate([p[1] for p in parts])
            out_v.append(v)
            out_h.append(np.full(len(v), hop, dtype=np.int64))
            out_e.append(e)

        collect(0)
        for hop in range(1, max_hops + 1):
            exports = [s.export.remote() for s in state]
            ref_lists = [
                e.scatter_maxregs.options(num_returns=P).remote(exports[j])
                if P > 1
                else [e.scatter_maxregs.remote(exports[j])]
                for j, e in enumerate(edge)
            ]
            ray.get(
                [
                    state[c].apply_max.remote(*[rl[c] for rl in ref_lists])
                    for c in range(P)
                ]
            )
            collect(hop)
    finally:
        _shutdown(state, edge)
    if not out_v:
        return pa.table(
            {
                "vid": pa.array([], pa.int64()),
                "hop": pa.array([], pa.int64()),
                "est_ball": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "vid": pa.array(np.concatenate(out_v)),
            "hop": pa.array(np.concatenate(out_h)),
            "est_ball": pa.array(sql_round(np.concatenate(out_e))),
        }
    ).sort_by([("vid", "ascending"), ("hop", "ascending")])
