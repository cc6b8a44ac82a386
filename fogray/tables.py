"""Deterministic synthetic source-code repo table (FIXTURES.md F1).

Exactly the `input_hint` schema: ``(repo: string, path: string,
commit: string, lang: string, content: string)``. Seeded and fully
deterministic — the generator is pure functions of (seed, row index), so
any scale regenerates identically (tests at ~200 rows, bench at millions;
the 10^12-file production table has the same shape).

Cross-repo edges arise from two controlled co-occurrence channels:
- a fraction of rows reuse a shared ``blob_id`` -> identical ``content``
  across repos (exact-duplicate files, the content-sha channel);
- paths are drawn from a shared pool -> (path, lang) co-occurrence.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANG_BY_EXT = {
    "py": "py", "c": "c", "cc": "cpp", "rs": "rs",
    "go": "go", "js": "js", "java": "java",
}
EXTS = list(LANG_BY_EXT)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def make_repo_table(
    n_rows: int = 200,
    n_repos: int = 12,
    *,
    seed: int = 42,
    n_paths: int | None = None,
    n_blobs: int | None = None,
    dup_frac: float = 0.3,
) -> pa.Table:
    """Build the repo table as one pyarrow table (driver-side; bench
    scales write it sharded via :func:`write_repo_table`).

    - ``repo``: ``org{i//4}/repo{i}`` over ``n_repos`` repos, row
      assignment hash-striped so every repo gets rows at any scale.
    - ``path``: pool of ``n_paths`` templated paths shared across repos.
    - ``commit``: sha of (repo, k) — unique per row within a repo.
    - ``lang``: keyed by path extension.
    - ``content``: deterministic text derived from ``blob_id``; a
      ``dup_frac`` fraction of rows draw ``blob_id`` from a small shared
      pool (cross-repo exact duplicates), the rest are unique blobs.
    """
    rng = np.random.default_rng(seed)
    n_paths = n_paths or max(8, n_rows // 4)
    n_blobs = n_blobs or max(4, n_rows // 8)

    repo_idx = rng.integers(0, n_repos, n_rows)
    path_idx = rng.integers(0, n_paths, n_rows)
    dup = rng.random(n_rows) < dup_frac
    blob_pool = rng.integers(0, n_blobs, n_rows)

    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_rows):
        r = int(repo_idx[i])
        p = int(path_idx[i])
        repo = f"org{r // 4}/repo{r}"
        ext = EXTS[p % len(EXTS)]
        path = f"src/mod{p % 7}/file{p}.{ext}"
        if dup[i]:
            blob = f"shared-{int(blob_pool[i])}"
        else:
            blob = f"unique-{seed}-{i}"
        token = _sha(f"{seed}:{blob}")
        body = f"// blob {blob}\n" + f"// {token}\n" * (3 + p % 5)
        repos.append(repo)
        paths.append(path)
        commits.append(_sha(f"{repo}:{i}")[:40])
        langs.append(LANG_BY_EXT[ext])
        contents.append(body)

    return pa.table(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def write_repo_table(out_dir: str, n_rows: int, n_repos: int, *, seed: int = 42,
                     rows_per_file: int = 250_000, **kw) -> str:
    """Write the table as a directory of parquet shards (deterministic
    per-shard generation => a rerun reproduces byte-identical inputs)."""
    os.makedirs(out_dir, exist_ok=True)
    n_files = max(1, (n_rows + rows_per_file - 1) // rows_per_file)
    for f in range(n_files):
        lo = f * rows_per_file
        hi = min(n_rows, lo + rows_per_file)
        t = make_repo_table(hi - lo, n_repos, seed=seed + f * 1_000_003, **kw)
        pq.write_table(t, os.path.join(out_dir, f"part-{f:05d}.parquet"))
    return out_dir


def content_sha_multiset(table: pa.Table) -> dict[str, int]:
    """Per-row invariant helper: multiset of sha256(content)."""
    out: dict[str, int] = {}
    for c in table.column("content").to_pylist():
        h = _sha(c)
        out[h] = out.get(h, 0) + 1
    return out
