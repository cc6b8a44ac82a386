"""Windowed / sessionized operators over the ``events`` stream table
``(event_id, ts, user_id, event_type, value, props)``.

The reference is strictly batch-iterative (SURVEY.md section 2.6: no
streaming, windows, or watermarks), so these are rebuild-defined
operators for the corpus-pipeline role, built on the same two
primitives as everything else here:

- **tumbling window**: assign ``window_start = ts - (ts % width)``
  inside ``map_batches`` (vectorized timestamp arithmetic), PRE-COMBINE
  each input batch into per-(window, type) partials (count/sum/max are
  decomposable), then sort only the partials and merge per
  group-complete block (fogray.derive.key_grouped_block_map). The
  shuffle ships partials, never raw events, so a hot window/key cannot
  concentrate the event stream into one task (skew guard) and shuffle
  volume is O(#distinct keys per block), not O(events).
- **sliding (hopping) window**: per-batch pre-aggregate at *slide*
  granularity (the only pass over raw events), expand the already-small
  partials ``width/slide``× and combine with ONE sort — the single
  all-to-all of the whole pipeline. The ×hops blowup never touches the
  event stream, so a 1h/15m window over 100 TB of events shuffles
  slide-level partials, not 4× the input.
- **sessionization**: sort by (user, ts); within a group-complete user
  block, a session starts wherever the gap to the previous event
  exceeds ``gap`` — one vectorized diff/cumsum per block (the classic
  gap-based session assignment; at corpus scale the sort is the only
  shuffle).

Both are SQL-expressible and carry exact DuckDB oracle entries in
fogray.datapipes.queries.

Timestamp domain: window assignment ``ts - (ts % width)`` uses numpy's
floor-mod, which for PRE-EPOCH (negative) timestamps floors toward
-inf while the DuckDB oracle's ``%`` is sign-preserving — the
operators therefore assume non-negative (post-1970) timestamps, which
every driver events table satisfies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..derive import key_grouped_block_map
from ..util import sql_round


_PARTIAL_SCHEMA = pa.schema(
    [
        ("w", pa.int64()),
        ("event_type", pa.string()),
        ("n", pa.int64()),
        ("s", pa.float64()),
        ("m", pa.float64()),
    ]
)


def _window_partials(t: pa.Table) -> pa.Table:
    """Per-batch (w, event_type) -> (count, sum, max) partials — the
    pre-combine that keeps raw events out of the shuffle."""
    if t.num_rows == 0:
        return _PARTIAL_SCHEMA.empty_table()
    w = t.column("w").to_numpy(zero_copy_only=False)
    et = t.column("event_type").to_numpy(zero_copy_only=False)
    v = t.column("value").to_numpy(zero_copy_only=False)
    order = np.lexsort((et, w))
    w, et, v = w[order], et[order], v[order]
    starts = np.flatnonzero(np.r_[True, (w[1:] != w[:-1]) | (et[1:] != et[:-1])])
    sizes = np.diff(np.r_[starts, len(w)])
    return pa.table(
        {
            "w": w[starts],
            "event_type": pa.array(et[starts]),
            "n": sizes.astype(np.int64),
            "s": np.add.reduceat(v, starts),
            "m": np.maximum.reduceat(v, starts),
        }
    )


def _merge_partials_block(t: pa.Table) -> pa.Table:
    """Group-complete merge of (w, event_type) partials -> final stats."""
    empty = pa.table(
        {
            "window_start": pa.array([], pa.timestamp("us")),
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.float64()),
            "max_value": pa.array([], pa.float64()),
        }
    )
    if t.num_rows == 0:
        return empty
    w = t.column("w").to_numpy(zero_copy_only=False)
    et = t.column("event_type").to_numpy(zero_copy_only=False)
    n = t.column("n").to_numpy(zero_copy_only=False)
    s = t.column("s").to_numpy(zero_copy_only=False)
    m = t.column("m").to_numpy(zero_copy_only=False)
    order = np.lexsort((et, w))
    w, et, n, s, m = w[order], et[order], n[order], s[order], m[order]
    starts = np.flatnonzero(np.r_[True, (w[1:] != w[:-1]) | (et[1:] != et[:-1])])
    return pa.table(
        {
            "window_start": pa.array(w[starts], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "event_type": pa.array(et[starts]),
            "n_events": np.add.reduceat(n, starts).astype(np.int64),
            "sum_value": sql_round(np.add.reduceat(s, starts)),
            "max_value": np.maximum.reduceat(m, starts),
        }
    )


def tumbling_window_stats(ds, *, width_minutes: int = 60) -> rd.Dataset:
    """-> (window_start: timestamp[us], event_type, n_events, sum_value,
    max_value) per tumbling window of ``width_minutes``. Two-level:
    per-batch partials, then one sort of the partials only."""
    width_us = np.int64(width_minutes) * 60 * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = ts - (ts % width_us)
        return pa.table(
            {
                "w": win,
                "event_type": t.column("event_type"),
                "value": t.column("value"),
            }
        )

    pre = ds.map_batches(assign, batch_format="pyarrow").map_batches(
        _window_partials, batch_format="pyarrow"
    )
    return key_grouped_block_map(
        pre.sort(["w", "event_type"]), ["w", "event_type"], _merge_partials_block
    )


def sliding_window_stats(
    ds, *, width_minutes: int = 60, slide_minutes: int = 15
) -> rd.Dataset:
    """-> (window_start: timestamp[us], event_type, n_events, sum_value,
    max_value) per hopping window of ``width_minutes`` advancing every
    ``slide_minutes``; an event at t lands in the ``width/slide``
    windows whose start w satisfies w <= t < w + width.

    Two-level dataflow (see module docstring): slide-granularity
    tumbling partials first, then each partial is replicated into the
    ``hops`` windows covering its slide and combined (count/sum/max are
    all decomposable)."""
    if width_minutes % slide_minutes:
        raise ValueError("width_minutes must be a multiple of slide_minutes")
    slide_us = np.int64(slide_minutes) * 60 * 1_000_000
    hops = width_minutes // slide_minutes

    def assign(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "w": ts - (ts % slide_us),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
            }
        )

    pre = ds.map_batches(assign, batch_format="pyarrow").map_batches(
        _window_partials, batch_format="pyarrow"
    )

    offsets = np.arange(hops, dtype=np.int64) * slide_us

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        out = t.take(pa.array(np.repeat(np.arange(t.num_rows), hops)))
        w = out.column("w").to_numpy(zero_copy_only=False) - np.tile(
            offsets, t.num_rows
        )
        return out.set_column(
            out.schema.get_field_index("w"), "w", pa.array(w, pa.int64())
        )

    # unmerged per-batch partials are expanded directly (duplicates for
    # one (w, type) merge in the final combine), so the WHOLE pipeline
    # has exactly ONE all-to-all — the sort of the expanded partials.
    expanded = pre.map_batches(expand, batch_format="pyarrow")
    return key_grouped_block_map(
        expanded.sort(["w", "event_type"]), ["w", "event_type"], _merge_partials_block
    )


def sessionize(ds, *, gap_minutes: int = 30) -> rd.Dataset:
    """-> (user_id, session_id, session_start: timestamp[us], n_events,
    duration_s). A session breaks where the gap between a user's
    consecutive events exceeds ``gap_minutes``; session_id numbers a
    user's sessions from 0 in time order.

    Skew contract: session assignment is NOT decomposable (a session
    can span any two adjacent events), so ONE task must see a user's
    whole (user_id, ts)-sorted history — the same per-key contract
    every keyed stream sessionizer has. Only the two projected columns
    ship, and the per-block kernel is a vectorized diff/cumsum, so a
    pathological single user costs one task O(rows) numpy, not a
    Python loop (tests pin 10^6 events on one user)."""
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def sessions_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
                "duration_s": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap_break = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        new_session = new_user | gap_break
        starts = np.flatnonzero(new_session)
        sizes = np.diff(np.r_[starts, len(u)])
        ends = starts + sizes - 1
        # session_id = per-user running index
        sess_user = u[starts]
        first_of_user = np.r_[True, sess_user[1:] != sess_user[:-1]]
        grp = np.cumsum(first_of_user) - 1
        idx = np.arange(len(starts))
        sid = idx - np.maximum.accumulate(np.where(first_of_user, idx, 0))
        return pa.table(
            {
                "user_id": sess_user.astype(np.int64),
                "session_id": sid.astype(np.int64),
                "session_start": pa.array(ts[starts], type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": sizes.astype(np.int64),
                "duration_s": sql_round((ts[ends] - ts[starts]) / 1e6),
            }
        )

    return key_grouped_block_map(
        ds.select_columns(["user_id", "ts"]).sort(["user_id", "ts"]),
        ["user_id"],
        sessions_block,
    )


def funnel(ds, *, stages: tuple = ("view", "click", "purchase")) -> rd.Dataset:
    """Ordered conversion funnel per user: the first ``stages[0]`` event,
    the first ``stages[1]`` event STRICTLY after it, and the first
    ``stages[2]`` strictly after that; ``depth`` counts the stages
    reached. Users with no stage-0 event are dropped.

    Same skew contract as :func:`sessionize`: stage matching is not
    decomposable (stage k's anchor depends on stage k-1's time), so one
    task sees a user's whole (user_id, ts)-projected history — three
    columns only, vectorized min-reductions inside the block.

    -> (user_id, ts_view, ts_click, ts_purchase, depth).
    """
    s1, s2, s3 = stages

    def funnel_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "ts_view": pa.array([], pa.timestamp("us")),
                "ts_click": pa.array([], pa.timestamp("us")),
                "ts_purchase": pa.array([], pa.timestamp("us")),
                "depth": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((ts, u))
        u, ts, et = u[order], ts[order], et[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        gi = np.cumsum(new_user) - 1
        n = int(gi[-1]) + 1
        users = u[new_user]
        inf = np.iinfo(np.int64).max
        t1 = np.full(n, inf, dtype=np.int64)
        m1 = et == s1
        np.minimum.at(t1, gi[m1], ts[m1])
        t2 = np.full(n, inf, dtype=np.int64)
        m2 = (et == s2) & (ts > t1[gi])
        np.minimum.at(t2, gi[m2], ts[m2])
        t3 = np.full(n, inf, dtype=np.int64)
        m3 = (et == s3) & (ts > t2[gi])
        np.minimum.at(t3, gi[m3], ts[m3])
        keep = t1 < inf
        t1, t2, t3, users = t1[keep], t2[keep], t3[keep], users[keep]
        depth = 1 + (t2 < inf).astype(np.int64) + (t3 < inf).astype(np.int64)

        def ts_col(x):
            return pa.array(x, mask=(x == inf)).cast(pa.timestamp("us"))

        return pa.table(
            {
                "user_id": pa.array(users.astype(np.int64)),
                "ts_view": ts_col(t1),
                "ts_click": ts_col(t2),
                "ts_purchase": ts_col(t3),
                "depth": pa.array(depth, pa.int64()),
            }
        )

    return key_grouped_block_map(
        ds.select_columns(["user_id", "ts", "event_type"]).sort(["user_id", "ts"]),
        ["user_id"],
        funnel_block,
    )


def user_sequence_stats(ds) -> rd.Dataset:
    """Per-event sequence features for training-data assembly: 1-based
    event index per user (``seq``, ordered by ts with event_id
    tie-break), seconds since the user's previous event (``gap_s``,
    null on the first), and the running cumulative ``value``
    (``cum_value``).

    Money-exact running sum: ``value`` carries 2 decimals, so the
    cumulative is an int64 cents cumsum divided by 100.0 at the end —
    bit-identical to the oracle's BIGINT window SUM regardless of
    summation order (float cumsum association would drift from DuckDB's
    segment-tree window aggregation).

    One sort by (user_id, ts, event_id) is the only shuffle; each
    group-complete user block vectorizes with cumsum/diff (same skew
    contract as :func:`sessionize` — running features are inherently
    sequential per user, but only three narrow columns ship).

    -> (event_id, user_id, seq, gap_s, cum_value).
    """

    def stats_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "seq": pa.array([], pa.int64()),
                "gap_s": pa.array([], pa.float64()),
                "cum_value": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        # intra-group order from the executor is untrusted: re-sort
        order = np.lexsort((eid, ts, u))
        u, ts, eid, v = u[order], ts[order], eid[order], v[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new_user)
        seq = np.arange(len(u), dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, len(u)])
        ) + 1
        gap = np.empty(len(u), dtype=np.float64)
        gap[0] = np.nan
        gap[1:] = (ts[1:] - ts[:-1]) / 1e6
        gap[new_user] = np.nan
        cents = np.round(v * 100.0).astype(np.int64)
        cum = np.cumsum(cents)
        base = np.repeat(np.r_[np.int64(0), cum[starts[1:] - 1]],
                         np.diff(np.r_[starts, len(u)]))
        cum_value = (cum - base) / 100.0
        return pa.table(
            {
                "event_id": pa.array(eid.astype(np.int64)),
                "user_id": pa.array(u.astype(np.int64)),
                "seq": pa.array(seq),
                "gap_s": pa.array(gap, pa.float64(), from_pandas=True),
                "cum_value": pa.array(cum_value, pa.float64()),
            }
        )

    return key_grouped_block_map(
        ds.select_columns(["event_id", "ts", "user_id", "value"]).sort(
            ["user_id", "ts", "event_id"]
        ),
        ["user_id"],
        stats_block,
    )


def event_transitions(ds) -> rd.Dataset:
    """Global event-type transition counts (the behavioral "bigram
    table"): for every adjacent pair of one user's events in (ts,
    event_id) order, count (from_type -> to_type). One sort ships three
    narrow columns; each group-complete block emits pre-aggregated
    (from, to, n) partials, and the final fold touches only
    #types^2-sized partial rows (tiny), folded in a single reduce
    block.

    -> (from_type, to_type, n)
    """

    def trans_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        codes, uniq = pd.factorize(et, use_na_sentinel=False)
        order = np.lexsort((eid, ts, u))
        uo, co = u[order], codes[order]
        same_user = uo[1:] == uo[:-1]
        frm, to = co[:-1][same_user], co[1:][same_user]
        if not len(frm):
            return empty
        k = len(uniq)
        cnt = np.bincount(frm * k + to, minlength=k * k)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "from_type": pa.array(uniq[nz // k].tolist(), pa.string()),
                "to_type": pa.array(uniq[nz % k].tolist(), pa.string()),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    partials = key_grouped_block_map(
        ds.select_columns(["event_id", "ts", "user_id", "event_type"]).sort(
            ["user_id", "ts", "event_id"]
        ),
        ["user_id"],
        trans_block,
    )

    def fold(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .groupby(["from_type", "to_type"], as_index=False)["n"]
            .sum()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    # partials are #types^2 rows per block — repartition(1) is a tiny
    # tree-reduce, not a data funnel
    return partials.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


def cohort_retention(ds) -> rd.Dataset:
    """Cohort retention matrix: users grouped by their first active day
    (``cohort_day`` = epoch days of MIN ts), counted on each later
    active-day offset. One sort by user_id; each group-complete block
    reduces a user's whole history to its distinct (cohort_day,
    day_offset) rows — already deduped per user — then pre-aggregates
    per block, so the final fold sees #days^2-sized partials only.

    Timestamps are assumed non-negative (see the module note on
    floor-mod vs SQL %).

    -> (cohort_day, day_offset, n_users)
    """
    _DAY_US = 86_400_000_000

    def cohort_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_day": pa.array([], pa.int64()),
                "day_offset": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        day = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // _DAY_US
        )
        order = np.lexsort((day, u))
        uo, do = u[order], day[order]
        starts = np.flatnonzero(np.r_[True, uo[1:] != uo[:-1]])
        cohort = np.repeat(do[starts], np.diff(np.r_[starts, len(uo)]))
        off = do - cohort
        # distinct (user, offset): sorted, so adjacent-dedup
        keep = np.r_[True, (uo[1:] != uo[:-1]) | (off[1:] != off[:-1])]
        ck, ok = cohort[keep], off[keep]
        # fused int64 pair key (avoids np.unique(axis=0)'s void-view sort)
        span = int(ok.max()) + 1
        ukey, cnt = np.unique(ck * span + ok, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array((ukey // span).astype(np.int64)),
                "day_offset": pa.array((ukey % span).astype(np.int64)),
                "n_users": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = key_grouped_block_map(
        ds.select_columns(["user_id", "ts"]).sort(["user_id"]),
        ["user_id"],
        cohort_block,
    )

    def fold(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .groupby(["cohort_day", "day_offset"], as_index=False)["n_users"]
            .sum()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return partials.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


def latest_per_key(ds, *, key_col: str, ts_col: str, tie_col: str) -> rd.Dataset:
    """CDC-style compaction: keep each key's LATEST row (max ts, ties
    broken by max ``tie_col`` — a total order, so the winner is unique
    and layout-independent). Two-level: each block pre-compacts to one
    candidate row per key (only those move), ONE sort on the key
    co-locates candidates, a group-complete fold picks the winner.

    -> (key_col, ts_col, tie_col, value) — the surviving rows.
    """

    def compact(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                ts_col: pa.array([], pa.timestamp("us")),
                tie_col: pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        ts = t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = t.column(tie_col).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        # last row per key under ascending (key, ts, tie)
        order = np.lexsort((tie, ts, k))
        k, ts, tie, v = k[order], ts[order], tie[order], v[order]
        last = np.r_[k[1:] != k[:-1], True]
        return pa.table(
            {
                key_col: pa.array(k[last].astype(np.int64)),
                ts_col: pa.array(ts[last]).cast(pa.timestamp("us")),
                tie_col: pa.array(tie[last].astype(np.int64)),
                "value": pa.array(v[last], pa.float64()),
            }
        )

    pre = ds.select_columns([key_col, ts_col, tie_col, "value"]).map_batches(
        compact, batch_format="pyarrow"
    )
    return key_grouped_block_map(pre.sort([key_col]), [key_col], compact)


def window_topk(ds, *, width_minutes: int = 60, k: int = 3) -> rd.Dataset:
    """Top-``k`` users by summed value inside each tumbling window —
    the windowed leaderboard. Two-level: per-batch (window, user) EXACT
    int64-cents partials (only those move), ONE sort on the window key,
    then a group-complete fold that finishes the sums and ranks
    (cents DESC, user ASC — an all-integer total order, deterministic
    in any layout).

    -> (window_start timestamp[us], user_id, sum_value DOUBLE, rk 1..k)
    """
    width_us = np.int64(width_minutes) * 60 * 1_000_000
    part_schema = pa.schema(
        [("w", pa.int64()), ("user_id", pa.int64()), ("c", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = ts - (ts % width_us)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.round(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.lexsort((u, w))
        w, u, cents = w[order], u[order], cents[order]
        starts = np.flatnonzero(np.r_[True, (w[1:] != w[:-1]) | (u[1:] != u[:-1])])
        return pa.table(
            {
                "w": w[starts],
                "user_id": u[starts].astype(np.int64),
                "c": np.add.reduceat(cents, starts).astype(np.int64),
            },
            schema=part_schema,
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "window_start": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
                "rk": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        w = t.column("w").to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, w))
        w, u, c = w[order], u[order], c[order]
        starts = np.flatnonzero(np.r_[True, (w[1:] != w[:-1]) | (u[1:] != u[:-1])])
        w, u = w[starts], u[starts]
        c = np.add.reduceat(c, starts)
        # rank within window: cents DESC, user ASC (c positive int64)
        order = np.lexsort((u, -c, w))
        w, u, c = w[order], u[order], c[order]
        wstarts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        rk = np.arange(len(w), dtype=np.int64) - np.repeat(
            wstarts, np.diff(np.r_[wstarts, len(w)])
        ) + 1
        keep = rk <= k
        return pa.table(
            {
                "window_start": pa.array(w[keep]).cast(pa.timestamp("us")),
                "user_id": pa.array(u[keep].astype(np.int64)),
                "sum_value": pa.array(c[keep] / 100.0, pa.float64()),
                "rk": pa.array(rk[keep]),
            }
        )

    parts = ds.select_columns(["ts", "user_id", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return key_grouped_block_map(parts.sort(["w"]), ["w"], fold)


def ewma(ds, *, window: int = 16) -> rd.Dataset:
    """Trailing exponentially-weighted mean (alpha = 1/2, truncated to
    the last ``window`` events) of ``value`` per user, ordered by
    (ts, event_id) — the smoothing feature next to :func:`rolling_mean`.
    EXACT despite being float: the weights 2^-k are dyadic and the
    value hundredths are small integers, so every product cents·2^-k
    and the bounded window sum are exactly representable in float64
    (span < 53 bits while cents < 2^37 at window 16) — num and den
    match the oracle's band-join SUMs bit-for-bit in ANY summation
    order, with one division + 6-decimal round at the end. The window
    loop is ``window`` vector ops per block, not a per-row scan.

    -> (event_id, user_id, ewma)
    """

    def ewma_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ewma": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid, v = u[order], eid[order], v[order]
        cents = np.round(v * 100.0).astype(np.int64)
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        rank = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, n])
        )
        num = np.zeros(n, dtype=np.float64)
        den = np.zeros(n, dtype=np.float64)
        idx = np.arange(n, dtype=np.int64)
        for k in range(window):
            ok = rank >= k
            w = 0.5**k
            num[ok] += cents[idx[ok] - k] * w
            den[ok] += w
        from ..util import sql_round

        out = sql_round((num / den) / 100.0)
        return pa.table(
            {
                "event_id": pa.array(eid.astype(np.int64)),
                "user_id": pa.array(u.astype(np.int64)),
                "ewma": pa.array(out, pa.float64()),
            }
        )

    return key_grouped_block_map(
        ds.select_columns(["event_id", "ts", "user_id", "value"]).sort(
            ["user_id", "ts", "event_id"]
        ),
        ["user_id"],
        ewma_block,
    )


def rolling_mean(ds, *, window: int = 3) -> rd.Dataset:
    """Trailing per-user rolling mean of ``value`` over the last
    ``window`` events (SQL ``ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW``), ordered by (ts, event_id) — the smoothed-feature
    companion to :func:`user_sequence_stats`. Money-exact: the window
    sum runs over int64 hundredths (cumsum difference, one vector op
    per block), and the mean divides exactly like the oracle
    (``AVG(cents) / 100``).

    -> (event_id, user_id, roll_mean)
    """

    def roll_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "roll_mean": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid, v = u[order], eid[order], v[order]
        cents = np.round(v * 100.0).astype(np.int64)
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        rank = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, n])
        )
        cum = np.cumsum(cents)
        lo = np.arange(n) - np.minimum(rank, window - 1)  # window start idx
        ws = cum - np.where(lo > 0, cum[lo - 1], 0)
        cnt = np.minimum(rank + 1, window)
        from ..util import sql_round

        rm = sql_round((ws / cnt) / 100.0)
        return pa.table(
            {
                "event_id": pa.array(eid.astype(np.int64)),
                "user_id": pa.array(u.astype(np.int64)),
                "roll_mean": pa.array(rm, pa.float64()),
            }
        )

    return key_grouped_block_map(
        ds.select_columns(["event_id", "ts", "user_id", "value"]).sort(
            ["user_id", "ts", "event_id"]
        ),
        ["user_id"],
        roll_block,
    )


def late_events(ds, *, lateness_s: int = 60) -> rd.Dataset:
    """Watermark-style late-event detection: replaying each user's
    stream in a deterministic ARRIVAL permutation (the splitmix53 hash
    of event_id — the synthetic events are generated in event-time
    order, so a fixture permutation stands in for network arrival,
    exactly like the PII injection fixture), an event is late when its
    event time ``ts`` lags the user's running watermark — the max ts of
    all PRIOR arrivals — by more than ``lateness_s`` seconds. The
    out-of-orderness signal every streaming ingest needs before
    windowing. ONE (user_id, hv, event_id) sort; each group-complete
    user block is a segmented shifted running max (integer
    microseconds, exact).

    -> (user_id, n_events, n_late) per user — only O(users) rows leave
    each block.
    """
    from ..sources import splitmix53

    def add_hv(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        x = (eid.astype(np.uint64) << np.uint64(32)) ^ eid.astype(np.uint64)
        return t.append_column("hv", pa.array(splitmix53(x), pa.uint64()))

    def late_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_late": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        hv = t.column("hv").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, hv, u))
        u, ts = u[order], ts[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new_user)
        sizes = np.diff(np.r_[starts, len(u)])
        # running max of ts within each user run, shifted by one
        cm = np.maximum.accumulate(ts)
        # reset at user boundaries: recompute via segmented trick
        seg_base = np.repeat(starts, sizes)
        idx = np.arange(len(u))
        cm = ts.copy()
        # segmented cumulative max: iterate log2(maxrun) doublings
        shift = 1
        while shift < sizes.max():
            src = idx - shift
            valid = src >= seg_base
            np.maximum(cm, np.where(valid, cm[np.maximum(src, 0)], np.iinfo(np.int64).min), out=cm, where=valid)
            shift <<= 1
        prev_max = np.empty(len(u), dtype=np.int64)
        prev_max[1:] = cm[:-1]
        # first arrival has no watermark: seed with its own ts so the
        # subtraction below cannot wrap int64 (min - 60s overflows)
        prev_max[new_user] = ts[new_user]
        late = ts < prev_max - np.int64(lateness_s) * np.int64(1_000_000)
        late[new_user] = False
        n_late = np.add.reduceat(late.astype(np.int64), starts)
        return pa.table(
            {
                "user_id": pa.array(u[starts].astype(np.int64)),
                "n_events": pa.array(sizes.astype(np.int64)),
                "n_late": pa.array(n_late.astype(np.int64)),
            }
        )

    return key_grouped_block_map(
        ds.select_columns(["event_id", "ts", "user_id"])
        .map_batches(add_hv, batch_format="pyarrow")
        .sort(["user_id", "hv", "event_id"]),
        ["user_id"],
        late_block,
    )


def rolling_median(ds, *, window: int = 5) -> rd.Dataset:
    """Trailing per-user rolling MEDIAN of ``value`` over the last
    ``window`` events (SQL ``MEDIAN(...) OVER (ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)``), ordered by (ts, event_id) — the
    outlier-robust twin of :func:`rolling_mean`. Exact: medians select
    (or average two of) the int64-cents values, so both sides compute
    the identical rational before the shared 6-decimal round. The
    window is materialized as ``window`` shifted views of the block
    (vector ops, no per-row loop); ramp-up rows use the short prefix
    like the SQL window.

    -> (event_id, user_id, roll_median)
    """

    def roll_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "roll_median": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid, v = u[order], eid[order], v[order]
        cents = np.round(v * 100.0).astype(np.int64)
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        rank = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, n])
        )
        cnt = np.minimum(rank + 1, window).astype(np.int64)
        # (n, window) matrix of the trailing values: column j holds the
        # value j rows back, padded with +inf outside the window/run
        mat = np.full((n, window), np.iinfo(np.int64).max, dtype=np.int64)
        idx = np.arange(n)
        for j in range(window):
            src = idx - j
            ok = (src >= 0) & (j <= rank)
            mat[ok, j] = cents[src[ok]]
        mat.sort(axis=1)
        lo_i = (cnt - 1) // 2
        hi_i = cnt // 2
        med = (mat[idx, lo_i] + mat[idx, hi_i]) / 2.0 / 100.0
        from ..util import sql_round

        return pa.table(
            {
                "event_id": pa.array(eid.astype(np.int64)),
                "user_id": pa.array(u.astype(np.int64)),
                "roll_median": pa.array(sql_round(med), pa.float64()),
            }
        )

    return key_grouped_block_map(
        ds.select_columns(["event_id", "ts", "user_id", "value"]).sort(
            ["user_id", "ts", "event_id"]
        ),
        ["user_id"],
        roll_block,
    )


def cumulative_stats(ds) -> rd.Dataset:
    """Per-user running totals over the FULL history — the
    ``SUM/COUNT OVER (PARTITION BY user ORDER BY ts, event_id ROWS
    UNBOUNDED PRECEDING)`` prefix scan. Same shape as
    :func:`rolling_mean` (ONE (user, ts, event_id) sort, group-complete
    blocks, one vectorized cumsum per block) but unbounded: the prefix
    never crosses blocks because the planner puts each user's whole
    history in one task. Money-exact int64 hundredths.

    -> (event_id, user_id, cum_n BIGINT, cum_value DOUBLE)
    """

    def cum_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "cum_n": pa.array([], pa.int64()),
                "cum_value": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid, v = u[order], eid[order], v[order]
        cents = np.round(v * 100.0).astype(np.int64)
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        rank = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, n])
        )
        cum = np.cumsum(cents)
        base = np.repeat(np.where(starts > 0, cum[starts - 1], 0), np.diff(np.r_[starts, n]))
        return pa.table(
            {
                "event_id": pa.array(eid.astype(np.int64)),
                "user_id": pa.array(u.astype(np.int64)),
                "cum_n": pa.array(rank + 1),
                "cum_value": pa.array(sql_round((cum - base) / 100.0), pa.float64()),
            }
        )

    return key_grouped_block_map(
        ds.select_columns(["event_id", "ts", "user_id", "value"]).sort(
            ["user_id", "ts", "event_id"]
        ),
        ["user_id"],
        cum_block,
    )


def burst_stats(ds, *, window_s: int = 3600) -> rd.Dataset:
    """Per-user peak burst rate: the maximum number of events inside
    ANY trailing ``window_s`` window ending at an event (inclusive on
    both window edges, matching SQL ``RANGE BETWEEN INTERVAL PRECEDING
    AND CURRENT ROW`` — peer timestamps all count). The
    rate-limit / abuse signal every event-ingest pipeline wants. ONE
    (user, ts) sort; inside each user's group-complete run the window
    count is two vectorized searchsorteds, no per-event loop.

    -> (user_id, max_burst BIGINT)
    """
    us = np.int64(window_s) * 1_000_000  # ts is microseconds

    def burst_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "max_burst": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        out_u = u[starts]
        out_b = np.empty(len(starts), dtype=np.int64)
        for i, (s, e) in enumerate(zip(starts, ends)):
            w = ts[s:e]
            lo = np.searchsorted(w, w - us, side="left")
            hi = np.searchsorted(w, w, side="right")
            out_b[i] = int((hi - lo).max())
        return pa.table(
            {
                "user_id": pa.array(out_u.astype(np.int64)),
                "max_burst": pa.array(out_b),
            }
        )

    return key_grouped_block_map(
        ds.select_columns(["user_id", "ts"]).sort(["user_id", "ts"]),
        ["user_id"],
        burst_block,
    )


# ---------------------------------------------------------------------------
# windowed co-action graph components (streaming window x graph)
# ---------------------------------------------------------------------------

_COACTION_SCHEMA = pa.schema(
    [
        ("window_day", pa.int64()),
        ("n_users", pa.int64()),
        ("n_pairs", pa.int64()),
        ("n_components", pa.int64()),
        ("largest_component", pa.int64()),
    ]
)


def windowed_coaction_components(ds, *, group_cap: int = 256) -> rd.Dataset:
    """Per tumbling day window: build the user co-action graph (users
    sharing an event_type within the window are linked; groups past
    ``group_cap`` distinct users are DROPPED — the boilerplate guard,
    mirrored by the oracle) and report its component structure:
    (window_day, n_users, n_pairs, n_components, largest_component).
    n_users counts every evented user (uncapped); users without a
    surviving pair are singleton components.

    The streaming-window x graph composition: ONE sort co-locates
    (window, type) groups for the vectorized pair expansion, a second
    sort makes windows group-complete for the per-window min-label
    fixpoint (vectorized np.minimum rounds — no per-edge Python), and
    a third tiny exchange folds the per-window distinct-user counts.
    Raw events shuffle once; everything after is pair/stat rows."""

    def du_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"w": pa.array([], pa.int64()),
                 "event_type": pa.array([], pa.string()),
                 "user_id": pa.array([], pa.int64())}
            )
        w = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // np.int64(86_400_000_000)
        )
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        dic = et.dictionary_encode()
        codes = np.asarray(dic.indices, dtype=np.int64)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        # fused int key: within-block distinct (w, type, user) — code
        # and user ranges fit well under the shifts
        key = ((w * np.int64(len(dic.dictionary) + 1) + codes) << np.int64(32)) | u
        _, idx = np.unique(key, return_index=True)
        return pa.table(
            {
                "w": pa.array(w[idx]),
                "event_type": et.take(pa.array(idx)),
                "user_id": pa.array(u[idx]),
            }
        )

    du = ds.map_batches(du_partial, batch_format="pyarrow").materialize()

    empty_pairs = pa.schema(
        [("w", pa.int64()), ("ua", pa.int64()), ("ub", pa.int64())]
    )

    def expand_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_pairs.empty_table()
        w = t.column("w").to_numpy(zero_copy_only=False)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        dic = et.dictionary_encode()
        codes = np.asarray(dic.indices, dtype=np.int64)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        key = w * np.int64(len(dic.dictionary) + 1) + codes
        order = np.argsort(key, kind="stable")
        key, w, u = key[order], w[order], u[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], len(key)]
        ow, oa, ob = [], [], []
        for s, e in zip(starts, ends):
            users = np.unique(u[s:e])
            n = len(users)
            if n < 2 or n > group_cap:
                continue  # the cap contract, mirrored by the oracle
            ai, bi = np.triu_indices(n, 1)
            ow.append(np.full(len(ai), w[s], dtype=np.int64))
            oa.append(users[ai])
            ob.append(users[bi])
        if not ow:
            return empty_pairs.empty_table()
        return pa.table(
            {
                "w": np.concatenate(ow),
                "ua": np.concatenate(oa).astype(np.int64),
                "ub": np.concatenate(ob).astype(np.int64),
            },
            schema=empty_pairs,
        )

    pairs = key_grouped_block_map(
        du.sort(["w", "event_type"]), ["w", "event_type"], expand_pairs
    ).materialize()

    def window_components(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("w", pa.int64()), ("n_pair_users", pa.int64()),
                 ("n_pairs", pa.int64()), ("n_comp", pa.int64()),
                 ("largest", pa.int64())]
            ).empty_table()
        w = t.column("w").to_numpy(zero_copy_only=False)
        ua = t.column("ua").to_numpy(zero_copy_only=False)
        ub = t.column("ub").to_numpy(zero_copy_only=False)
        order = np.lexsort((ub, ua, w))
        w, ua, ub = w[order], ua[order], ub[order]
        # dedup pairs found via several event types
        first = np.r_[
            True, (w[1:] != w[:-1]) | (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1])
        ]
        w, ua, ub = w[first], ua[first], ub[first]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        ends = np.r_[starts[1:], len(w)]
        rows = []
        for s, e in zip(starts, ends):
            a, b = ua[s:e], ub[s:e]
            users, inv = np.unique(np.r_[a, b], return_inverse=True)
            ia, ib = inv[: e - s], inv[e - s :]
            lab = np.arange(len(users), dtype=np.int64)
            while True:
                nl = lab.copy()
                np.minimum.at(nl, ib, lab[ia])
                np.minimum.at(nl, ia, lab[ib])
                # pointer-jump keeps rounds logarithmic in path length
                nl = nl[nl]
                if np.array_equal(nl, lab):
                    break
                lab = nl
            _, sizes = np.unique(lab, return_counts=True)
            rows.append(
                (int(w[s]), len(users), int(e - s), len(sizes), int(sizes.max()))
            )
        cols = list(zip(*rows))
        return pa.table(
            {
                "w": pa.array(np.asarray(cols[0], dtype=np.int64)),
                "n_pair_users": pa.array(np.asarray(cols[1], dtype=np.int64)),
                "n_pairs": pa.array(np.asarray(cols[2], dtype=np.int64)),
                "n_comp": pa.array(np.asarray(cols[3], dtype=np.int64)),
                "largest": pa.array(np.asarray(cols[4], dtype=np.int64)),
            }
        )

    import ray

    if pairs.count() == 0:
        pair_stats = {}
    else:
        ps = pa.concat_tables(
            ray.get(
                key_grouped_block_map(pairs.sort(["w"]), ["w"], window_components)
                .materialize()
                .to_arrow_refs()
            ),
            promote_options="default",
        )
        pair_stats = {
            int(wv): (int(pu), int(np_), int(nc), int(lg))
            for wv, pu, np_, nc, lg in zip(
                ps.column("w").to_pylist(),
                ps.column("n_pair_users").to_pylist(),
                ps.column("n_pairs").to_pylist(),
                ps.column("n_comp").to_pylist(),
                ps.column("largest").to_pylist(),
            )
        }

    def wu_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"w": pa.array([], pa.int64()), "user_id": pa.array([], pa.int64())}
            )
        w = t.column("w").to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        key = (w << np.int64(32)) | u  # users < 2^32
        _, idx = np.unique(key, return_index=True)
        return pa.table({"w": pa.array(w[idx]), "user_id": pa.array(u[idx])})

    def wu_count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"w": pa.array([], pa.int64()), "n_users": pa.array([], pa.int64())}
            )
        w = t.column("w").to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        key = (w << np.int64(32)) | u
        order = np.argsort(key, kind="stable")
        key = key[order]
        keep = np.r_[True, key[1:] != key[:-1]]
        w = (key[keep] >> np.int64(32)).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        ends = np.r_[starts[1:], len(w)]
        return pa.table(
            {
                "w": pa.array(w[starts].astype(np.int64)),
                "n_users": pa.array((ends - starts).astype(np.int64)),
            }
        )

    wu = pa.concat_tables(
        ray.get(
            key_grouped_block_map(
                du.map_batches(wu_partial, batch_format="pyarrow").sort(["w", "user_id"]),
                ["w"],
                wu_count,
            )
            .materialize()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    ww = wu.column("w").to_numpy(zero_copy_only=False)
    nu = wu.column("n_users").to_numpy(zero_copy_only=False)
    order = np.argsort(ww, kind="stable")
    out = []
    for wv, n_users in zip(ww[order], nu[order]):
        pu, np_, nc, lg = pair_stats.get(int(wv), (0, 0, 0, 0))
        n_components = int(n_users) - pu + nc
        largest = lg if lg > 0 else (1 if n_users > 0 else 0)
        out.append((int(wv), int(n_users), np_, n_components, largest))
    cols = list(zip(*out)) if out else [[], [], [], [], []]
    return rd.from_arrow(
        pa.table(
            {
                "window_day": pa.array(np.asarray(cols[0], dtype=np.int64)),
                "n_users": pa.array(np.asarray(cols[1], dtype=np.int64)),
                "n_pairs": pa.array(np.asarray(cols[2], dtype=np.int64)),
                "n_components": pa.array(np.asarray(cols[3], dtype=np.int64)),
                "largest_component": pa.array(np.asarray(cols[4], dtype=np.int64)),
            },
            schema=_COACTION_SCHEMA,
        )
    )
