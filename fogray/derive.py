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
import ray
import ray.data as rd
from ray.data.aggregate import Count


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


def _pairs_via_join(files: rd.Dataset, key_cols: list[str], cap: int | None) -> rd.Dataset:
    """Distinct (key, repo) -> all ordered repo pairs sharing a key, as
    hash joins (vectorized all-to-all; per-key ``map_groups`` would be a
    Python call per key). The boilerplate cap is a count-groupby +
    semi-join against the eligible keys — no key list ever funnels
    through the driver."""
    kr = (
        files.select_columns(key_cols + ["repo"])
        .groupby(key_cols + ["repo"])
        .aggregate(Count(alias_name="c"))
        .select_columns(key_cols + ["repo"])
        .materialize()
    )
    sizes = kr.groupby(key_cols).aggregate(Count(alias_name="k"))

    def eligible(t: pa.Table) -> pa.Table:
        k = t.column("k")
        m = pa.compute.greater_equal(k, 2)
        if cap is not None:
            m = pa.compute.and_(m, pa.compute.less_equal(k, cap))
        return t.filter(m).select(key_cols)

    keys_ok = sizes.map_batches(eligible, batch_format="pyarrow")
    kr_ok = safe_inner_join(
        kr, keys_ok, on=tuple(key_cols), right_suffix="_r"
    ).map_batches(
        empty_guard(
            lambda t: t.select(key_cols + ["repo"]),
            pa.schema([(c, pa.string()) for c in key_cols + ["repo"]]),
        ),
        batch_format="pyarrow",
    )
    # a dataset feeding BOTH sides of a self-join is materialized so the
    # shared lineage executes once (read-once, then fan out).
    kr_ok = kr_ok.materialize()
    a = kr_ok.map_batches(
        lambda t: t.rename_columns(key_cols + ["src_repo"]), batch_format="pyarrow"
    )
    b = kr_ok.map_batches(
        lambda t: t.rename_columns(key_cols + ["dst_repo"]), batch_format="pyarrow"
    )
    return safe_inner_join(a, b, on=tuple(key_cols)).map_batches(
        empty_guard(
            lambda t: t.filter(
                pa.compute.not_equal(t.column("src_repo"), t.column("dst_repo"))
            ).select(["src_repo", "dst_repo"]),
            pa.schema([("src_repo", pa.string()), ("dst_repo", pa.string())]),
        ),
        batch_format="pyarrow",
    )


def derive_edges(
    source,
    *,
    max_repos_per_key: int | None = 256,
    channels: tuple[str, ...] = ("content", "pathlang"),
) -> dict:
    """``source``: parquet path/dir or a ``ray.data.Dataset`` of the repo
    table. Returns ``{"edges": Dataset(src,dst,weight), "files": Dataset,
    "repos": pyarrow.Table(repo,vid), "num_vertices": int}``."""
    ds = source if isinstance(source, rd.Dataset) else rd.read_parquet(source)
    files = ds.map_batches(add_content_sha, batch_format="pyarrow")

    # dense vid assignment: sorted distinct repo names. The distinct set
    # is produced by a pre-aggregated groupby (count is irrelevant, the
    # shuffle only carries one row per repo per block); the resulting
    # O(#repos) table is collected and broadcast.
    repo_rows = files.groupby("repo").aggregate(Count(alias_name="n_files")).to_pandas()
    repo_names = np.sort(repo_rows["repo"].to_numpy().astype(str))
    num_vertices = len(repo_names)
    names_ref = ray.put(repo_names)

    # each channel's pair expansion is materialized before the union:
    # Ray 2.49's hash-shuffle join aggregators mis-bind key schemas when
    # two different-keyed joins execute concurrently in one streaming
    # plan, so the channel pipelines run one after another.
    pair_sets = []
    if "content" in channels:
        pair_sets.append(
            _pairs_via_join(files, ["content_sha"], max_repos_per_key).materialize()
        )
    if "pathlang" in channels:
        pair_sets.append(
            _pairs_via_join(files, ["path", "lang"], max_repos_per_key).materialize()
        )

    pairs = pair_sets[0]
    for extra in pair_sets[1:]:
        pairs = pairs.union(extra)

    def to_vids(batch: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(names_ref)
        return pd.DataFrame(
            {
                "src": np.searchsorted(names, batch["src_repo"].to_numpy().astype(str)).astype(np.int64),
                "dst": np.searchsorted(names, batch["dst_repo"].to_numpy().astype(str)).astype(np.int64),
            }
        )

    edges = (
        pairs.map_batches(to_vids, batch_format="pandas")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="cnt"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("cnt"),
                "weight",
                t.column("cnt").cast(pa.float64()),
            ),
            batch_format="pyarrow",
        )
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
