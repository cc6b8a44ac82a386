"""Resumable partitioned-parquet sink.

The brief's output contract for 100 TB jobs: write one directory per
key-range/partition — never one giant file — so a failed run can be
re-launched and SKIP already-finished partitions. The reference has no
sink beyond whole-file writes (convert/convert.cpp writes a single
binary image per graph); this is rebuild-defined on the repo's standard
exchange:

- partition id = md5-prefix hash of the key column (deterministic,
  repartition-stable, and SQL-mirrorable — the round-trip driver query
  ``sink_partitioned`` recomputes it in DuckDB);
- ONE sort by partition id; each group-complete block holds whole
  partitions and writes them as ``part=K/data.parquet`` via tmp-file +
  atomic rename, then drops a ``part=K/_DONE`` marker;
- on resume, a partition with an existing ``_DONE`` marker is skipped
  without re-serializing (the manifest row reports ``skipped=1``);
- the returned manifest (one row per partition) is the unit a driver
  would checkpoint.

Writes happen inside the block tasks (distributed, no driver funnel);
only the tiny manifest flows back.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..derive import key_grouped_block_map


def partition_ids(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic partition id per key: first 2 md5 hex chars as an
    int, mod ``num_partitions`` — DuckDB computes the identical value as
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 2)) AS INT)
    % num_partitions``."""
    return np.array(
        [
            int(hashlib.md5(str(x).encode()).hexdigest()[:2], 16) % num_partitions
            for x in keys.tolist()
        ],
        dtype=np.int64,
    )


def write_partitioned(
    ds,
    out_dir: str,
    *,
    key_col: str,
    num_partitions: int = 16,
) -> pa.Table:
    """Write ``ds`` as ``out_dir/part=K/data.parquet`` (K = stable hash
    of ``key_col``), skipping partitions already marked ``_DONE`` from a
    previous (possibly failed) run. Rows within a partition are written
    sorted by ``key_col`` so re-runs are byte-stable.

    Returns the manifest: (part, rows, skipped) — one row per partition
    that exists after the call.
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = list(ds.schema().names)

    def assign(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "__part", pa.array(partition_ids(keys, num_partitions))
        )

    manifest_schema = pa.schema(
        [("part", pa.int64()), ("rows", pa.int64()), ("skipped", pa.int64())]
    )

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return manifest_schema.empty_table()
        parts = t.column("__part").to_numpy(zero_copy_only=False)
        order = np.argsort(parts, kind="stable")
        ps = parts[order]
        starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
        bounds = np.r_[starts, len(ps)]
        rows = []
        for i, st in enumerate(starts):
            p = int(ps[st])
            pdir = os.path.join(out_dir, f"part={p}")
            done = os.path.join(pdir, "_DONE")
            sel = order[st : bounds[i + 1]]
            if os.path.exists(done):
                rows.append((p, len(sel), 1))
                continue
            os.makedirs(pdir, exist_ok=True)
            sub = t.take(pa.array(sel)).select(cols)
            # byte-stable partition content: sort by key
            sub = sub.sort_by(key_col)
            tmp = os.path.join(pdir, ".data.parquet.tmp")
            pq.write_table(sub, tmp)
            os.replace(tmp, os.path.join(pdir, "data.parquet"))
            with open(done, "w") as f:
                f.write(str(len(sel)))
            rows.append((p, len(sel), 0))
        return pa.table(
            {
                "part": pa.array([r[0] for r in rows], pa.int64()),
                "rows": pa.array([r[1] for r in rows], pa.int64()),
                "skipped": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    import ray

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    manifest = key_grouped_block_map(
        assigned.sort("__part"), ["__part"], write_block
    )
    # the manifest is <= num_partitions rows — collecting it is not a
    # data funnel
    parts_tables = ray.get(manifest.materialize().to_arrow_refs())
    out = pa.concat_tables([p for p in parts_tables if p.num_rows] or
                           [manifest_schema.empty_table()])
    return out.sort_by("part")


def read_partitioned(out_dir: str) -> rd.Dataset:
    """Read back a :func:`write_partitioned` directory, verifying every
    partition carries its ``_DONE`` marker (a missing marker means an
    interrupted writer — fail loudly rather than return partial data)."""
    parts = sorted(
        d for d in os.listdir(out_dir)
        if d.startswith("part=") and os.path.isdir(os.path.join(out_dir, d))
    )
    files = []
    for d in parts:
        if not os.path.exists(os.path.join(out_dir, d, "_DONE")):
            raise ValueError(f"partition {d} has no _DONE marker (partial write?)")
        files.append(os.path.join(out_dir, d, "data.parquet"))
    return rd.read_parquet(files)


def write_jsonl_partitioned(
    ds,
    out_dir: str,
    *,
    key_col: str,
    num_partitions: int = 16,
) -> pa.Table:
    """JSONL twin of :func:`write_partitioned` — the corpus-export
    format every downstream tokenizer toolchain reads. Same resumable
    contract: ``out_dir/part=K/data.jsonl`` + ``_DONE`` markers,
    partitions skipped when already marked, rows key-sorted so re-runs
    are byte-stable. Serialization is Arrow-side per partition
    (pandas ``to_json(lines=True)``, vectorized) — no driver funnel.

    Returns the manifest: (part, rows, skipped)."""
    os.makedirs(out_dir, exist_ok=True)
    cols = list(ds.schema().names)

    def assign(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "__part", pa.array(partition_ids(keys, num_partitions))
        )

    manifest_schema = pa.schema(
        [("part", pa.int64()), ("rows", pa.int64()), ("skipped", pa.int64())]
    )

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return manifest_schema.empty_table()
        parts = t.column("__part").to_numpy(zero_copy_only=False)
        order = np.argsort(parts, kind="stable")
        ps = parts[order]
        starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
        bounds = np.r_[starts, len(ps)]
        rows = []
        for i, st in enumerate(starts):
            p = int(ps[st])
            pdir = os.path.join(out_dir, f"part={p}")
            done = os.path.join(pdir, "_DONE")
            sel = order[st : bounds[i + 1]]
            if os.path.exists(done):
                rows.append((p, len(sel), 1))
                continue
            os.makedirs(pdir, exist_ok=True)
            sub = t.take(pa.array(sel)).select(cols).sort_by(key_col)
            tmp = os.path.join(pdir, ".data.jsonl.tmp")
            sub.to_pandas().to_json(
                tmp, orient="records", lines=True, force_ascii=True
            )
            os.replace(tmp, os.path.join(pdir, "data.jsonl"))
            with open(done, "w") as f:
                f.write(str(len(sel)))
            rows.append((p, len(sel), 0))
        return pa.table(
            {
                "part": pa.array([r[0] for r in rows], pa.int64()),
                "rows": pa.array([r[1] for r in rows], pa.int64()),
                "skipped": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    import ray

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    manifest = key_grouped_block_map(
        assigned.sort("__part"), ["__part"], write_block
    )
    parts_tables = ray.get(manifest.materialize().to_arrow_refs())
    out = pa.concat_tables(
        [p for p in parts_tables if p.num_rows and p.num_columns]
        or [manifest_schema.empty_table()]
    )
    return out.sort_by("part")


def read_jsonl_partitioned(out_dir: str) -> rd.Dataset:
    """Read back a :func:`write_jsonl_partitioned` directory with the
    same _DONE-marker verification as :func:`read_partitioned`."""
    parts = sorted(
        d for d in os.listdir(out_dir)
        if d.startswith("part=") and os.path.isdir(os.path.join(out_dir, d))
    )
    files = []
    for d in parts:
        if not os.path.exists(os.path.join(out_dir, d, "_DONE")):
            raise ValueError(f"partition {d} has no _DONE marker (partial write?)")
        files.append(os.path.join(out_dir, d, "data.jsonl"))
    return rd.read_json(files)
