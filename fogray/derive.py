"""Derive stage: Parquet source-code table -> repo-level edge table.

The rebuild's replacement for FOG's ``convert`` front-end
(convert/convert.cpp:126-153 ingested SNAP text; our front-end is the
`input_hint` repo table). Per SURVEY.md section 2.4:

- edges ``src_repo -> dst_repo`` arise from co-occurrence on
  ``sha256(content)`` (exact-duplicate files across repos) and on
  ``(path, lang)``;
- ``weight`` = total co-occurrence count over both channels (float64) —
  deterministic, replacing the reference's irreproducible convert-time
  ``rand()`` weights (convert/process_adjlist.cpp:25-30);
- dense vertex ids = rank of repo name in sorted distinct repos
  (the converter's dense-u32 vid space, convert/convert.cpp:21-30).

Scale design:
- ``content`` is dropped immediately after hashing inside the first
  ``map_batches`` — only the 64-char sha flows further (SURVEY.md 7.4:
  the wide column never reaches a shuffle);
- both co-occurrence channels are ONE ``groupby`` each; pair emission is
  vectorized per group; ``max_repos_per_key`` caps pathological
  boilerplate keys (a blob shared by K repos emits K*(K-1) pairs — keys
  above the cap are dropped as boilerplate, the standard web-pipeline
  answer to quadratic hub blow-up; the cap is part of the operator's
  contract and mirrored by the test oracle);
- the repo->vid map is O(#repos) and is broadcast (ray.put) to the
  mapping stage — a broadcast join, not a shuffle join.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count

from .util import read_parquet_clean


@ray.remote
def _block_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _sha_slice(t: pa.Table, off: int, length: int) -> pa.Table:
    """Fused splitter + hasher for low-block-count inputs: each task
    reads a ROW RANGE of the shared block (a zero-copy plasma read on
    the block's node — the wide ``content`` column is never copied or
    exchanged) and returns only the narrow hashed slice."""
    return add_content_sha(t.slice(off, length))


def add_content_sha(batch: pa.Table) -> pa.Table:
    """(repo,path,commit,lang,content) -> (repo,path,commit,lang,content_sha).

    sha256 has no vectorized Arrow kernel; the per-row hash loop is the
    unavoidable CPU cost (it parallelizes across blocks). The wide
    ``content`` column is dropped here, before anything shuffles.
    """
    shas = [hashlib.sha256(c.encode()).hexdigest() for c in batch.column("content").to_pylist()]
    return batch.drop_columns(["content"]).append_column("content_sha", pa.array(shas))



def _join_parts(cap: int = 32) -> int:
    """Join partition count sized to the session (one aggregator actor
    per partition; oversubscribing a small session deadlocks)."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(cap, cpus))

def safe_inner_join(a: rd.Dataset, b: rd.Dataset, on: tuple, num_partitions: int | None = None,
                    **join_kwargs) -> rd.Dataset:
    """Inner join that tolerates an ENTIRELY empty side. Ray 2.49's hash
    join learns input schemas only from non-empty blocks (see
    fogray._ray_patches); an all-empty input leaves aggregator
    partitions with zero-column tables and ``finalize`` crashes. An
    inner join with an empty side is empty, so short-circuit to a
    single empty block — the (guarded) map_batches that follows every
    join in this package restores the proper schema. Both sides are
    materialized first (the hash shuffle would buffer them in
    aggregators anyway), making the emptiness check a metadata read."""
    a, b = a.materialize(), b.materialize()
    if a.count() == 0 or b.count() == 0:
        return rd.from_arrow(pa.table({}))
    return a.join(
        b,
        join_type="inner",
        num_partitions=num_partitions or _join_parts(),
        on=on,
        **join_kwargs,
    )


def empty_guard(fn, schema: pa.Schema):
    """Wrap a post-join ``map_batches`` fn: Ray 2.49's hash join emits
    ZERO-COLUMN blocks for empty partitions, which break column access
    and make downstream operators see mixed schemas ("no match or
    multiple matches for key field"). Empty inputs short-circuit to a
    correctly-typed empty table."""

    def wrapped(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        return fn(t)

    return wrapped


# ---------------------------------------------------------------------------
# sort-partitioned group expansion (the fast path for co-occurrence)
# ---------------------------------------------------------------------------
#
# ``ds.sort(keys)`` range-partitions rows by key value, so equal keys land
# in one reduce partition — which makes per-BLOCK group processing exact,
# UNLESS the executor ever splits one reduce output into multiple blocks.
# Rather than rely on that implementation detail, key_grouped_block_map
# reads each block's first/last key (one tiny task per block) and
# coalesces adjacent blocks that share a boundary key before applying the
# per-group-complete transform. This replaces the
# distinct-groupby + self-join + count-groupby pipeline (three all-to-all
# exchanges over the pair-expanded data) with ONE sort of the input and
# ONE sort of the pre-aggregated pairs — the same collapse the reference's
# converter achieves with its radix-sort + k-way merge
# (convert/process_in_edge.cpp), done by Ray Data's sort shuffle.


@ray.remote
def _first_last_keys(table: pa.Table, key_cols: list[str]):
    if table.num_rows == 0:
        return None
    first = tuple(table.column(c)[0].as_py() for c in key_cols)
    last = tuple(table.column(c)[-1].as_py() for c in key_cols)
    return first, last


@ray.remote
def _apply_to_group(fn, *tables: pa.Table) -> pa.Table:
    t = pa.concat_tables(tables, promote_options="default") if len(tables) > 1 else tables[0]
    return fn(t)


def plan_key_groups(bounds: list) -> list[list[int]]:
    """Pure planning step for :func:`key_grouped_block_map`: given each
    block's (first_key, last_key) boundary tuples (None for empty
    blocks), return index groups such that every key group's rows land
    in exactly one group of blocks.

    ``ds.sort`` range-partitions by key, but the executor does NOT
    guarantee that ``to_arrow_refs()`` yields the reduce outputs in
    global order, nor that one reduce output stays one block. Relying
    on yielded order made the round-1 ``evt_sessions`` hash flaky (a
    key group split across two un-coalesced groups restarts its
    session numbering — row count preserved, values wrong). So:

    1. order blocks by their own boundary keys (first, then last);
    2. coalesce a block into the current group when its first key is
       <= the group's max last key (shared boundary OR range overlap —
       overlap covers split/out-of-order reduce outputs).

    Blocks whose key ranges are disjoint stay independent, so data
    still never moves unless ranges actually touch."""
    items = sorted(
        ((b[0], b[1], i) for i, b in enumerate(bounds) if b is not None),
        key=lambda x: (x[0], x[1]),
    )
    groups: list[list[int]] = []
    group_last = None
    for first, last, i in items:
        if groups and first <= group_last:
            groups[-1].append(i)
            group_last = max(group_last, last)
        else:
            groups.append([i])
            group_last = last
    return groups


def key_grouped_block_map(sorted_ds: rd.Dataset, key_cols: list[str], fn) -> rd.Dataset:
    """Apply ``fn`` (pa.Table -> pa.Table) to blocks of a key-sorted
    Dataset such that every key group is entirely inside one call.
    ``sorted_ds`` MUST be sorted by ``key_cols`` (each block internally
    sorted; blocks covering key ranges). The boundary check costs one
    metadata-sized task per block; block layout/order is NOT trusted —
    see :func:`plan_key_groups`. ``fn`` must not assume row order
    within its input (every caller in this repo re-lexsorts)."""
    refs = sorted_ds.materialize().to_arrow_refs()
    bounds = ray.get([_first_last_keys.remote(r, key_cols) for r in refs])
    groups = plan_key_groups(bounds)
    if not groups:
        return sorted_ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
    out = [_apply_to_group.remote(fn, *[refs[i] for i in g]) for g in groups]
    return rd.from_arrow_refs(out)


def make_pair_expander(
    key_cols: list[str], value_col: str, cap: int | None, on_overflow: str = "drop"
):
    """Block transform: rows sorted by ``key_cols`` -> all ordered
    distinct-value pairs per key group, pre-aggregated to (src, dst,
    cnt). Vectorized (no per-group Python); groups of size < 2 or
    > cap (boilerplate blow-up guard) are dropped — the cap is part of
    the operator contract, mirrored by the oracle.

    ``on_overflow="raise"`` turns the cap into a LOUD guard instead of
    a silent drop — for callers whose oracle has NO cap (LSH candidate
    buckets): expansion is O(group²), so a group past the cap means
    the caller must re-block, not lose pairs silently."""

    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
    )

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        # hash-factorize string keys to int codes first: sorting /
        # comparing 10^6 strings with np.lexsort costs ~10s where the
        # factorize + int sort costs ~1s. Codes are block-local (groups
        # only need consistent codes, not globally ordered ones).
        comb = None
        for c in key_cols:
            codes, uniques = pd.factorize(
                t.column(c).to_numpy(zero_copy_only=False),
                sort=False,
                use_na_sentinel=False,
            )
            codes = codes.astype(np.int64)
            if comb is None:
                comb = codes
            else:
                comb = comb * np.int64(len(uniques)) + codes
        vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((vals, comb))
        comb, vals = comb[order], vals[order]
        # distinct (key, value) rows
        if len(vals) > 1:
            dup = np.r_[False, (comb[1:] == comb[:-1]) & (vals[1:] == vals[:-1])]
            comb, vals = comb[~dup], vals[~dup]
        if len(vals) == 0:
            return empty
        new_grp = comb[1:] != comb[:-1] if len(vals) > 1 else np.empty(0, bool)
        starts = np.flatnonzero(np.r_[True, new_grp])
        sizes = np.diff(np.r_[starts, len(vals)])
        ok = sizes >= 2
        if cap is not None:
            if on_overflow == "raise" and bool((sizes > cap).any()):
                big = int(sizes.max())
                raise ValueError(
                    f"pair expansion: a {key_cols} group holds {big} values "
                    f"> cap={cap}; all-pairs is O(group^2) "
                    f"(~{big * (big - 1) // 2:,} pairs in one task). "
                    "Re-block with a finer key or raise the cap knowingly."
                )
            ok &= sizes <= cap
        starts, sizes = starts[ok], sizes[ok]
        if len(starts) == 0:
            return empty
        # expand per SIZE CLASS with 2-D gathers (group sizes are <= cap,
        # so there are few distinct sizes; an index-arithmetic expansion
        # over all pairs cost ~8 O(total-pairs) passes incl. two integer
        # divisions). Only UNORDERED pairs (i<j) are generated — ordered
        # co-occurrence counts are symmetric, so count once and mirror.
        lo_parts, hi_parts = [], []
        for s in np.unique(sizes):
            st = starts[sizes == s]
            block = vals[st[:, None] + np.arange(s)]
            ii, jj = np.triu_indices(int(s), k=1)
            a = block[:, ii].ravel()
            b = block[:, jj].ravel()
            lo_parts.append(a)
            hi_parts.append(b)
        a = np.concatenate(lo_parts)
        b = np.concatenate(hi_parts)
        # values within a group are sorted ascending and distinct, so
        # a < b always: (a, b) is already the canonical unordered pair
        n_hi = int(b.max()) + 1 if len(b) else 1
        assert int(a.max() if len(a) else 0) < (1 << 62) // max(n_hi, 1), (
            "pair key would overflow int64; vid space too large for fused key"
        )
        # pre-aggregate on a fused int64 pair key (np.unique over 2-D
        # rows falls back to a slow void-view sort)
        code = a * np.int64(n_hi) + b
        code.sort()
        firsts = np.flatnonzero(np.r_[True, code[1:] != code[:-1]])
        cnt = np.diff(np.r_[firsts, len(code)])
        u = code[firsts]
        ua, ub = u // np.int64(n_hi), u % np.int64(n_hi)
        cnt = cnt.astype(np.int64)
        return pa.table(
            {
                "src": np.concatenate([ua, ub]),
                "dst": np.concatenate([ub, ua]),
                "cnt": np.concatenate([cnt, cnt]),
            }
        )

    return expand


def sum_pair_counts(t: pa.Table) -> pa.Table:
    """Block transform over (src, dst, cnt) sorted by (src, dst): exact
    per-pair totals (each pair is group-complete in its block)."""
    if t.num_rows == 0:
        return pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "weight": pa.array([], pa.float64()),
            }
        )
    src = t.column("src").to_numpy(zero_copy_only=False)
    dst = t.column("dst").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    src, dst, cnt = src[order], dst[order], cnt[order]
    starts = np.flatnonzero(np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])])
    return pa.table(
        {
            "src": src[starts],
            "dst": dst[starts],
            "weight": np.add.reduceat(cnt, starts).astype(np.float64),
        }
    )


def cooccurrence_pair_counts(
    keyed: rd.Dataset, key_cols: list[str], value_col: str, cap: int | None
) -> rd.Dataset:
    """(key, value) rows -> (src, dst, weight) co-occurrence pair counts
    (ordered pairs of distinct values sharing a key; weight = number of
    shared keys). Two sort shuffles total."""
    pairs = key_grouped_block_map(
        keyed.sort(key_cols), key_cols, make_pair_expander(key_cols, value_col, cap)
    )
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                }
            )
        )
    return key_grouped_block_map(pairs.sort(["src", "dst"]), ["src", "dst"], sum_pair_counts)


def derive_edges(
    source,
    *,
    max_repos_per_key: int | None = 256,
    channels: tuple[str, ...] = ("content", "pathlang"),
    aggregate: bool = True,
) -> dict:
    """``source``: parquet path/dir or a ``ray.data.Dataset`` of the repo
    table. Returns ``{"edges": Dataset(src,dst,weight), "files": Dataset,
    "repos": pyarrow.Table(repo,vid), "num_vertices": int}``.

    Dataflow (per channel: one sort shuffle; plus one final sort of the
    pre-aggregated pairs): files -> +content_sha (content dropped) ->
    +vid (broadcast repo->vid lookup) -> sort by channel key ->
    group-complete block pair expansion (distinct repos per key, cap
    guard, per-block pre-agg) -> union channels -> sort by (src, dst)
    -> per-block exact weight totals."""
    ds = source if isinstance(source, rd.Dataset) else read_parquet_clean(source)
    # a driver-built table arrives as ONE block, which would serialize
    # every downstream stage (map parallelism AND the sort's partition
    # count follow the block count). NOT ds.repartition(): that routes
    # the still-wide ``content`` column through the full all-to-all
    # exchange operator (~2s of the flagship's derive stage). Instead,
    # fan out RANGE tasks over the shared block(s): each fetch is a
    # zero-copy plasma read, the content bytes are never copied or
    # exchanged, and the sha pass is fused into the same task wave.
    try:
        nb = ds.num_blocks()
    except Exception:
        nb = None
    min_parallel = max(2 * int(ray.cluster_resources().get("CPU", 8)), 16)
    if nb is not None and 0 < nb < min_parallel:
        refs = ds.materialize().to_arrow_refs()
        sizes = ray.get([_block_rows.remote(r) for r in refs])
        k = -(-min_parallel // max(len(refs), 1))
        out_refs = []
        for r, sz in zip(refs, sizes):
            step = max(1, -(-sz // k))
            for i in range(0, sz, step):
                out_refs.append(_sha_slice.remote(r, i, step))
        files = rd.from_arrow_refs(out_refs).materialize()
    else:
        # materialized once: both the distinct-repo pass and the vid
        # pass consume it, and the wide ``content`` column is gone
        files = ds.map_batches(add_content_sha, batch_format="pyarrow").materialize()

    # dense vid assignment: sorted distinct repo names. Per-block
    # distinct partials, then ONE coalescing dedup round before the
    # driver touches anything (a groupby-count shuffle here cost more
    # than the rest of the stage; but collecting raw per-block uniques
    # directly is worst-case O(#files) driver memory when every block
    # sees fresh repos — the second round bounds the driver collect at
    # O(#repos x coalesced-partitions)).
    def _repo_partial(t: pa.Table) -> pa.Table:
        # Arrow-native distinct: pc.unique on the string column stays
        # zero-copy C++ (the prior numpy astype(str) round-trip through
        # Python objects was ~1s of the flagship derive stage)
        col = t.column("repo")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({"repo": pc.unique(col)})

    uniq = files.map_batches(_repo_partial, batch_format="pyarrow").materialize()
    coalesce = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    if uniq.num_blocks() > coalesce:
        uniq = (
            uniq.repartition(coalesce)
            .map_batches(_repo_partial, batch_format="pyarrow")
            .materialize()
        )
    parts = pa.concat_tables(
        ray.get(uniq.to_arrow_refs()), promote_options="default"
    )
    # Arrow-native final dedup + sort (coalesce partitions are row- not
    # key-disjoint, so this may see several copies of the full repo set;
    # pc.unique keeps the O(partials) pass in C++ — only the final
    # #repos-sized array crosses into numpy for the searchsorted lookups)
    col = parts.column("repo")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    uniq_arr = pc.unique(col)
    uniq_arr = uniq_arr.take(pc.sort_indices(uniq_arr))
    repo_names = np.asarray(uniq_arr.to_pylist(), dtype=str)
    num_vertices = len(repo_names)
    names_ref = ray.put(repo_names)

    def add_vid(batch: pa.Table) -> pa.Table:
        names = ray.get(names_ref)
        vid = np.searchsorted(
            names, batch.column("repo").to_numpy(zero_copy_only=False).astype(str)
        )
        return batch.append_column("vid", pa.array(vid.astype(np.int64)))

    files_vid = files.map_batches(add_vid, batch_format="pyarrow").materialize()

    channel_keys = {"content": ["content_sha"], "pathlang": ["path", "lang"]}

    def _run_channel(ch: str):
        key_cols = channel_keys[ch]
        keyed = files_vid.select_columns(key_cols + ["vid"])
        return key_grouped_block_map(
            keyed.sort(key_cols),
            key_cols,
            make_pair_expander(key_cols, "vid", max_repos_per_key),
        ).materialize()

    if len(channels) > 1:
        # the channel pipelines are independent sort+expand dataflows
        # over the same materialized input — run their streaming
        # executions CONCURRENTLY (one driver thread each) so the two
        # all-to-all sorts overlap instead of serializing
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(len(channels)) as ex:
            pair_sets = list(ex.map(_run_channel, channels))
    else:
        pair_sets = [_run_channel(ch) for ch in channels]

    pairs = pair_sets[0]
    for extra in pair_sets[1:]:
        pairs = pairs.union(extra)
    pairs = pairs.materialize()

    if pairs.count() == 0:
        edges = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                }
            )
        )
    elif not aggregate:
        # engine-feed path: skip the (src, dst) all-to-all — the
        # engine's bucketed exchange re-partitions the pairs anyway and
        # its actors collapse duplicate (src, dst) rows with exact
        # integer-count sums during their local lexsort
        # (GraphEngine(combine_duplicates=True)). The returned "edges"
        # carry PARTIAL weights in ``cnt`` — aggregate=True remains the
        # contract for every non-engine consumer.
        edges = pairs
    else:
        edges = key_grouped_block_map(
            pairs.sort(["src", "dst"]), ["src", "dst"], sum_pair_counts
        )
    repos_table = pa.table(
        {"repo": repo_names, "vid": np.arange(num_vertices, dtype=np.int64)}
    )
    return {
        "edges": edges,
        "files": files,
        "repos": repos_table,
        "num_vertices": num_vertices,
    }


def derive_edges_oracle(table: pa.Table, *, max_repos_per_key: int | None = 256,
                        channels: tuple[str, ...] = ("content", "pathlang")) -> pd.DataFrame:
    """Single-process pandas recomputation of :func:`derive_edges` for
    tests (same contract, independent implementation)."""
    df = table.to_pandas()
    df["content_sha"] = [hashlib.sha256(c.encode()).hexdigest() for c in df["content"]]
    names = np.sort(df["repo"].unique().astype(str))
    vid = {r: i for i, r in enumerate(names)}
    rows = []
    keys = []
    if "content" in channels:
        keys.append(df.groupby("content_sha")["repo"])
    if "pathlang" in channels:
        keys.append(df.groupby(["path", "lang"])["repo"])
    for grouped in keys:
        for _, repos in grouped:
            rs = sorted(set(repos))
            if len(rs) < 2 or (max_repos_per_key is not None and len(rs) > max_repos_per_key):
                continue
            for r1 in rs:
                for r2 in rs:
                    if r1 != r2:
                        rows.append((vid[r1], vid[r2]))
    pairs = pd.DataFrame(rows, columns=["src", "dst"])
    out = pairs.groupby(["src", "dst"]).size().reset_index(name="weight")
    out["weight"] = out["weight"].astype(np.float64)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)
