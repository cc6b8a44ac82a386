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
