"""HyperBall: the approximate neighborhood function (Boldi & Vigna
2013, public algorithm) — per-vertex HyperLogLog sketches of the
h-hop reachability balls, merged along edges one superstep per hop.
THE web-scale tool for distance distributions: exact per-vertex ball
sizes need O(V²) state, HyperBall needs 256 bytes per vertex.

Semantics: ``ball(v, h)`` = vertices reachable FROM v within h
out-hops (v itself at h=0). Per hop, every vertex's register array
absorbs the elementwise MAX of its out-neighbors' arrays — because
HLL registers of a union are the elementwise max, the hop-h array IS
the HLL sketch of the exact ball, so the estimate is a deterministic
function of the exact reach set. That makes the oracle EXACT: SQL
computes the true reach sets (bounded-hop recursion), rebuilds the
same md5 registers over the members (the established HLL mirror,
fogray/datapipes/sketches.py), and applies the identical estimator —
both sides agree to the 6-decimal round.

Scale shape: the broadcast-superstep pattern (pinned edge blocks, one
``ray.put`` of the (V, 256) uint8 register matrix per hop, per-block
per-src ``maximum.reduceat`` partials, driver folds elementwise
maxima). Register state is 256 B/vertex — 256 GB at V=10⁹, which is
exactly the case for the range-sharded flavor (fogray/sharded.py's
exchange applies verbatim: registers slice by vid range, partials
route by range); the broadcast flavor here is the single-box path.

Reference provenance: the superstep loop is FOG's GLOBAL scatter
shape (fog_engine.cpp:91-243) with a 256-byte max-combine payload —
the vertex attribute is the sketch itself.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .util import from_arrow_chunked

_M = 256  # registers per sketch (md5 first byte = bucket)

#: leading-zero-bit count per byte value (8 for 0) — sketches.py's table
_CLZ8 = np.array(
    [8 - int(v).bit_length() if v else 8 for v in range(256)], dtype=np.int64
)


def _vid_registers(vids: np.ndarray) -> np.ndarray:
    """(len(vids), 256) uint8 register arrays of the singleton sets
    {v}: bucket = first md5 byte of str(v), rho = leading-zero bits of
    the 120-bit tail + 1 — byte-identical to the established HLL
    kernel (fogray/datapipes/sketches.py:_bucket_rho) so the SQL
    mirror replays it verbatim."""
    out = np.zeros((len(vids), _M), dtype=np.uint8)
    if len(vids) == 0:
        return out
    md5 = hashlib.md5
    buf = b"".join(md5(str(int(v)).encode()).digest() for v in vids)
    dig = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)
    bucket = dig[:, 0].astype(np.int64)
    tail = dig[:, 1:]
    nz = tail != 0
    has = nz.any(axis=1)
    first = np.argmax(nz, axis=1)
    lz = np.where(
        has, first * 8 + _CLZ8[tail[np.arange(len(tail)), first]], 120
    )
    out[np.arange(len(vids)), bucket] = (lz + 1).astype(np.uint8)
    return out


def hll_estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Vectorized HLL estimator over (rows, 256) registers — the same
    bias-corrected formula with the linear-counting small branch as
    sketches.hll_estimate (and its SQL mirror)."""
    m = float(_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    ssum = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    raw = alpha * m * m / ssum
    zeros = (regs == 0).sum(axis=1)
    small = (raw <= 2.5 * m) & (zeros > 0)
    return np.where(
        small, m * np.log(m / np.maximum(zeros, 1)), raw
    )


def _ball_partials(tab: pa.Table, regs_ref):
    """Per-src elementwise-max of out-neighbor register rows for one
    pinned edge block: sort by src, ONE ``maximum.reduceat`` over the
    gathered dst rows. -> (src ids, (groups, 256) maxima)."""
    if tab.num_rows == 0 or tab.num_columns == 0:
        return np.empty(0, dtype=np.int64), np.zeros((0, _M), dtype=np.uint8)
    regs = ray.get(regs_ref) if isinstance(regs_ref, ray.ObjectRef) else regs_ref
    s = tab.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    d = tab.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(s, kind="stable")
    s, d = s[order], d[order]
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    mx = np.maximum.reduceat(regs[d], starts, axis=0)
    return s[starts], mx


def hyperball(edges, n: int, max_hops: int = 3) -> pa.Table:
    """Approximate neighborhood function over the directed edge
    Dataset (columns src, dst). -> (vid, hop, est_ball ROUND 6) for
    every vertex appearing in the edge set, hops 0..max_hops, sorted
    by (vid, hop)."""
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
    edges = edges.select_columns(["src", "dst"]).materialize()
    block_refs = edges.to_arrow_refs()

    def uniq_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"v": pa.array([], pa.int64())})
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"v": np.unique(np.r_[s, d]).astype(np.int64)})

    tabs = [
        t
        for t in ray.get(
            edges.map_batches(uniq_block, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not tabs:
        return pa.table(
            {
                "vid": pa.array([], pa.int64()),
                "hop": pa.array([], pa.int64()),
                "est_ball": pa.array([], pa.float64()),
            }
        )
    touched = np.unique(
        np.concatenate([t.column("v").to_numpy(zero_copy_only=False) for t in tabs])
    )
    regs = np.zeros((n, _M), dtype=np.uint8)
    regs[touched] = _vid_registers(touched)

    out_v, out_h, out_e = [touched], [np.zeros(len(touched), np.int64)], [
        hll_estimate_rows(regs[touched])
    ]
    task = ray.remote(_ball_partials)
    for hop in range(1, max_hops + 1):
        regs_ref = ray.put(regs)
        parts = ray.get([task.remote(r, regs_ref) for r in block_refs])
        nxt = regs.copy()
        for ids, mx in parts:
            if len(ids):
                np.maximum.at(nxt, ids, mx)
        regs = nxt
        out_v.append(touched)
        out_h.append(np.full(len(touched), hop, dtype=np.int64))
        out_e.append(hll_estimate_rows(regs[touched]))
    return pa.table(
        {
            "vid": pa.array(np.concatenate(out_v)),
            "hop": pa.array(np.concatenate(out_h)),
            "est_ball": pa.array(sql_round(np.concatenate(out_e))),
        }
    ).sort_by([("vid", "ascending"), ("hop", "ascending")])
