"""Incremental connected components over a streaming edge-arrival
sequence — the streaming-graph-update operator class (CDC-style edge
inserts) the batch engine doesn't cover.

Semantics: edges arrive in deterministic batches; after each arrival
the min-label components of the accumulated edge set are restored by
FRONTIER-LIMITED propagation — only vertices whose label just changed
(seeded by the new edges' endpoints) scatter in the next round, so a
batch that touches a settled region costs rounds proportional to the
disturbance, not the graph. The final fixpoint is independent of the
arrival order and equals the static min-label components of the union
edge set (pytest-asserted for shuffled batch splits; the driver oracle
is the SAME recursive-reachability SQL as the static
``connected_components`` query).

Scale shape (the coloring/matching/msf broadcast-superstep pattern):
arrived edge blocks stay PINNED in the object store and accumulate
across batches; each round ships the O(V) (labels, frontier) pair once
via ``ray.put``; blocks emit per-dst minimum candidate partials only
for edges whose src is in the frontier (bounded by the disturbance);
the driver folds O(V) minima. Edges never collect on the driver.

Reference provenance: FOG's cc application (application/cc.hpp) is the
batch fixpoint this operator restores incrementally; the frontier
mechanics mirror fog_engine's target/frontier scatter
(fog_engine.cpp:426-520) applied to a growing edge set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .sources import splitmix53
from .util import from_arrow_chunked

_CAND_SCHEMA = pa.schema([("v", pa.int64()), ("lab", pa.int64())])


def arrival_tagger(num_batches: int):
    """Batch transform appending the deterministic splitmix arrival tag
    (hash of the canonical edge, mod num_batches). SHARED by
    incremental_cc and fogray.sharded.incremental_cc_sharded — their
    oracle/stats parity depends on both forming identical batches, so
    there is exactly one copy of this hash."""

    def tag(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        h = splitmix53((a << np.uint64(32)) ^ b)
        return t.append_column(
            "arrival", pa.array((h % np.uint64(num_batches)).astype(np.int64))
        )

    return tag


def arrival_picker(b: int):
    """Batch transform selecting one arrival batch (tag dropped)."""

    def f(t: pa.Table) -> pa.Table:
        keep = pa.compute.equal(t.column("arrival"), b)
        return t.filter(keep).drop_columns(["arrival"])

    return f


def _min_label_partials(t: pa.Table, state_ref) -> pa.Table:
    """Per-dst minimum candidate labels from frontier srcs, pre-combined
    per block (sort + reduceat; output bounded by distinct dsts)."""
    if t.num_rows == 0 or t.num_columns == 0:
        return _CAND_SCHEMA.empty_table()
    labels, frontier = (
        ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
    )
    s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    m = frontier[s]
    if not m.any():
        return _CAND_SCHEMA.empty_table()
    s, d = s[m], d[m]
    lab = labels[s]
    # keep only candidates that could lower the dst label
    better = lab < labels[d]
    if not better.any():
        return _CAND_SCHEMA.empty_table()
    d, lab = d[better], lab[better]
    order = np.lexsort((lab, d))
    d, lab = d[order], lab[order]
    first = np.r_[True, d[1:] != d[:-1]]
    return pa.table(
        {"v": d[first], "lab": lab[first]}, schema=_CAND_SCHEMA
    )


def incremental_cc(edges, n: int, num_batches: int = 4):
    """Stream the SYMMETRIC directed edge Dataset (columns src, dst) in
    ``num_batches`` deterministic arrival batches (splitmix hash of the
    canonical edge) and maintain min-label components incrementally.

    -> (labels[n], touched_ids, stats) where stats is one dict per
    batch: {"new_edges", "rounds", "updates"} — updates = total label
    lowerings the batch caused (0 for a batch that changes nothing).
    """
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

    tagged = (
        edges.select_columns(["src", "dst"])
        .map_batches(arrival_tagger(num_batches), batch_format="pyarrow")
        .materialize()
    )
    pick = arrival_picker

    labels = np.arange(n, dtype=np.int64)
    touched = np.zeros(n, dtype=bool)
    arrived_refs: list = []
    partial_task = ray.remote(_min_label_partials)
    endpoint_task = ray.remote(_batch_endpoints)
    stats: list[dict] = []
    for b in range(num_batches):
        batch_ds = tagged.map_batches(pick(b), batch_format="pyarrow").materialize()
        new_refs = batch_ds.to_arrow_refs()
        # endpoints of the new edges seed the frontier
        ep_parts = ray.get([endpoint_task.remote(r) for r in new_refs])
        new_edge_count = sum(p[1] for p in ep_parts)
        eps = (
            np.unique(np.concatenate([p[0] for p in ep_parts]))
            if ep_parts
            else np.empty(0, dtype=np.int64)
        )
        touched[eps] = True
        arrived_refs.extend(new_refs)
        frontier = np.zeros(n, dtype=bool)
        frontier[eps] = True
        rounds = 0
        updates = 0
        while frontier.any():
            rounds += 1
            state_ref = ray.put((labels, frontier))
            tabs = [
                t
                for t in ray.get(
                    [partial_task.remote(r, state_ref) for r in arrived_refs]
                )
                if t.num_rows > 0 and t.num_columns > 0
            ]
            frontier = np.zeros(n, dtype=bool)
            if not tabs:
                break
            part = pa.concat_tables(tabs)
            v = part.column("v").to_numpy(zero_copy_only=False)
            lab = part.column("lab").to_numpy(zero_copy_only=False)
            cand = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(cand, v, lab)
            improved = cand < labels
            if improved.any():
                labels[improved] = cand[improved]
                frontier = improved
                updates += int(improved.sum())
        stats.append(
            {"new_edges": int(new_edge_count), "rounds": rounds, "updates": updates}
        )
    return labels, np.flatnonzero(touched), stats


def _batch_endpoints(t: pa.Table):
    """(distinct endpoint ids, edge count) of one arrived block."""
    if t.num_rows == 0 or t.num_columns == 0:
        return np.empty(0, dtype=np.int64), 0
    s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    return np.unique(np.r_[s, d]), len(s)


# ---------------------------------------------------------------------------
# fully-dynamic flavor: insertions AND deletions (decremental CC)
# ---------------------------------------------------------------------------

def update_tagger(num_batches: int):
    """Batch transform appending BOTH lifecycle tags: ``arrival`` (the
    insert batch, same splitmix hash as :func:`arrival_tagger`) and
    ``removal`` (the delete batch, or -1 = never deleted): roughly a
    third of the edges — chosen by an independent second hash — are
    deleted at a deterministic later batch. Deletions are the hard
    half of streaming updates: they can SPLIT components, so the
    operator must recompute affected components, not just propagate."""

    def tag(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        key = (a << np.uint64(32)) ^ b
        arr = (splitmix53(key) % np.uint64(num_batches)).astype(np.int64)
        h2 = splitmix53(key ^ np.uint64(0x9E3779B97F4A7C15))
        head = np.maximum(np.int64(num_batches) - 1 - arr, 1)
        rem = arr + 1 + (h2 % head.astype(np.uint64)).astype(np.int64)
        deletable = ((h2 % np.uint64(3)) == 0) & (arr < num_batches - 1)
        rem = np.where(deletable, rem, np.int64(-1))
        return t.append_column("arrival", pa.array(arr)).append_column(
            "removal", pa.array(rem)
        )

    return tag


def _live_filter(b: int):
    """Rows inserted at batch ``b`` (tags kept for later delete passes)."""

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.equal(t.column("arrival"), b))

    return f


@ray.remote
def _drop_removed(t: pa.Table, b: int):
    """Rewrite one live block without the edges deleted at batch b;
    returns (new block, (distinct endpoints of dropped edges, count))."""
    if t.num_rows == 0 or t.num_columns == 0:
        return t, (np.empty(0, dtype=np.int64), 0)
    rm = pa.compute.equal(t.column("removal"), b)
    gone = t.filter(rm)
    if gone.num_rows == 0:
        return t, (np.empty(0, dtype=np.int64), 0)
    keep = t.filter(pa.compute.invert(rm))
    s = gone.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    d = gone.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    return keep, (np.unique(np.r_[s, d]), int(gone.num_rows))


def dynamic_cc(edges, n: int, num_batches: int = 4,
               stop_after: int | None = None):
    """Fully-dynamic min-label connected components over a streaming
    batch sequence with INSERTS and DELETES (tags from
    :func:`update_tagger`). Per batch: (1) delete-tagged edges are
    dropped from the pinned live blocks (block rewrite tasks — blocks
    shrink, nothing collects on the driver); (2) every component
    touching a deleted edge is RESET — all its members return to
    singleton labels and join the frontier (a deletion can split a
    component, so its labels must be recomputed, not propagated);
    (3) the batch's inserts arrive and seed the frontier too;
    (4) one frontier-limited min-label propagation restores the
    fixpoint over the live edge set. After every batch the labels
    equal the STATIC min-label components of the live edges
    (pytest-asserted per batch); the driver oracle checks the final
    state against the never-deleted edge set.

    -> (labels[n], touched_ids, stats); stats per batch adds
    "deleted_edges" and "reset_vertices" to the incremental_cc shape.
    ``stop_after=b`` processes only batches 0..b (a stream prefix) —
    the per-batch exactness tests drive intermediate states with it.
    """
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
    tagged = (
        edges.select_columns(["src", "dst"])
        .map_batches(update_tagger(num_batches), batch_format="pyarrow")
        .materialize()
    )
    labels = np.arange(n, dtype=np.int64)
    touched = np.zeros(n, dtype=bool)
    live_refs: list = []
    partial_task = ray.remote(_min_label_partials)
    endpoint_task = ray.remote(_batch_endpoints)
    stats: list[dict] = []
    last = num_batches if stop_after is None else min(stop_after + 1, num_batches)
    for b in range(last):
        # (1) deletions from the accumulated live blocks
        del_eps = np.empty(0, dtype=np.int64)
        deleted = 0
        if live_refs:
            rewritten = [
                _drop_removed.options(num_returns=2).remote(r, b)
                for r in live_refs
            ]
            eps_parts = ray.get([e for _t, e in rewritten])
            live_refs = [t for t, _e in rewritten]  # blocks stay in the store
            deleted = sum(c for _p, c in eps_parts)
            if deleted:
                del_eps = np.unique(
                    np.concatenate([p for p, _c in eps_parts if len(p)])
                )
        # (2) reset every component touching a deleted edge
        reset_count = 0
        frontier = np.zeros(n, dtype=bool)
        if len(del_eps):
            roots = np.unique(labels[del_eps])
            members = np.isin(labels, roots)
            labels[members] = np.flatnonzero(members)
            frontier[members] = True
            reset_count = int(members.sum())
        # (3) this batch's inserts
        batch_ds = tagged.map_batches(
            _live_filter(b), batch_format="pyarrow"
        ).materialize()
        new_refs = batch_ds.to_arrow_refs()
        ep_parts = ray.get([endpoint_task.remote(r) for r in new_refs])
        new_edge_count = sum(p[1] for p in ep_parts)
        eps = (
            np.unique(np.concatenate([p[0] for p in ep_parts]))
            if ep_parts
            else np.empty(0, dtype=np.int64)
        )
        touched[eps] = True
        touched[del_eps] = True
        live_refs.extend(new_refs)
        frontier[eps] = True
        # (4) frontier-limited propagation to the live fixpoint
        rounds = 0
        updates = 0
        while frontier.any():
            rounds += 1
            state_ref = ray.put((labels, frontier))
            tabs = [
                t
                for t in ray.get(
                    [partial_task.remote(r, state_ref) for r in live_refs]
                )
                if t.num_rows > 0 and t.num_columns > 0
            ]
            frontier = np.zeros(n, dtype=bool)
            if not tabs:
                break
            part = pa.concat_tables(tabs)
            v = part.column("v").to_numpy(zero_copy_only=False)
            lab = part.column("lab").to_numpy(zero_copy_only=False)
            cand = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(cand, v, lab)
            improved = cand < labels
            if improved.any():
                labels[improved] = cand[improved]
                frontier = improved
                updates += int(improved.sum())
        stats.append(
            {
                "new_edges": int(new_edge_count),
                "deleted_edges": int(deleted),
                "reset_vertices": reset_count,
                "rounds": rounds,
                "updates": updates,
            }
        )
    return labels, np.flatnonzero(touched), stats
