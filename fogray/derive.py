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


def _emit_pairs(group: pd.DataFrame, cap: int | None) -> pd.DataFrame:
    repos = np.unique(group["repo"].to_numpy())
    k = len(repos)
    if k < 2 or (cap is not None and k > cap):
        return pd.DataFrame({"src_repo": [], "dst_repo": []})
    a, b = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
    m = a.ravel() != b.ravel()
    return pd.DataFrame({"src_repo": repos[a.ravel()[m]], "dst_repo": repos[b.ravel()[m]]})


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

    pair_sets = []
    if "content" in channels:
        content_pairs = (
            files.select_columns(["content_sha", "repo"])
            .groupby("content_sha")
            .map_groups(lambda g: _emit_pairs(g, max_repos_per_key), batch_format="pandas")
        )
        pair_sets.append(content_pairs)
    if "pathlang" in channels:
        path_pairs = (
            files.map_batches(
                lambda t: t.select(["path", "lang", "repo"]).append_column(
                    "pl",
                    pa.array(
                        [f"{p}\x00{l}" for p, l in zip(t.column("path").to_pylist(),
                                                       t.column("lang").to_pylist())]
                    ),
                ).select(["pl", "repo"]),
                batch_format="pyarrow",
            )
            .groupby("pl")
            .map_groups(lambda g: _emit_pairs(g, max_repos_per_key), batch_format="pandas")
        )
        pair_sets.append(path_pairs)

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
