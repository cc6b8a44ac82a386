"""End-to-end corpus curation — the composed training-data pipeline:

    quality filter -> exact dedup -> deterministic hash sample

This is the headline "user story" shape for a 100 TB pretraining-corpus
build, expressed as ONE streaming Dataset pipeline (no materialization
between stages except the dedup sort, the single unavoidable all-to-all):

1. **quality filter** — :func:`..text.quality_score_batch` kernels per
   block, keep ``q_score >= min_q``; pure ``map_batches``, streams.
2. **exact dedup of the survivors** — sha256(text) key, ONE sort; each
   group-complete block keeps a row iff its doc_id is the group minimum
   (the keeper). Content is dropped before the sort — only
   (sha, doc_id, carried metadata) enters the exchange, so the shuffle
   ships hashes, never documents.
3. **deterministic sample** — md5-prefix-of-doc_id filter
   (:func:`..relational.hash_sample` rule): shuffle-free,
   repartition-stable, reproducible across runs and engines.

Every stage reuses an already-oracle-gated kernel, so the composition is
itself exactly SQL-mirrored (one CTE per stage).

The reference has no corpus surface at all — rebuild-defined, required
by the training-data brief.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..derive import key_grouped_block_map


def curate_corpus(
    docs,
    *,
    min_q: float = 0.25,
    sample_max_prefix: str = "7f",
    text_col: str = "text",
) -> "pa.Table":
    """-> (doc_id, source, q_score) of curated survivors, doc_id-sorted.

    ``min_q`` compares against the 6-decimal ROUNDED score (both sides
    of the oracle gate apply the same rounding, so the threshold cut is
    exact, not float-fuzzy)."""
    from .text import quality_score_batch

    meta_schema = pa.schema(
        [
            ("sha", pa.string()),
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("q_score", pa.float64()),
        ]
    )

    def score_filter_sha(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return meta_schema.empty_table()
        q = quality_score_batch(t, text_col).column("q_score")
        keep = np.flatnonzero(q.to_numpy(zero_copy_only=False) >= min_q)
        if len(keep) == 0:
            return meta_schema.empty_table()
        kept = t.take(pa.array(keep))
        shas = [
            hashlib.sha256(c.encode()).hexdigest()
            for c in kept.column(text_col).to_pylist()
        ]
        return pa.table(
            {
                "sha": pa.array(shas, pa.string()),
                "doc_id": kept.column("doc_id"),
                "source": kept.column("source"),
                "q_score": q.take(pa.array(keep)),
            },
            schema=meta_schema,
        )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()), ("q_score", pa.float64())]
    )

    def keep_group_min(t: pa.Table) -> pa.Table:
        """Block is group-complete in sha: keeper = min doc_id per sha,
        then the md5-prefix sample on the keeper's doc_id."""
        if t.num_rows == 0:
            return out_schema.empty_table()
        sha = np.asarray(t.column("sha").to_pylist(), dtype=object)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, sha))
        sha_s, did_s = sha[order], did[order]
        starts = np.r_[True, sha_s[1:] != sha_s[:-1]]
        keepers = order[np.flatnonzero(starts)]
        kd = did[keepers]
        md5 = hashlib.md5
        nhex = len(sample_max_prefix)
        pref = np.asarray(
            [md5(str(int(v)).encode()).hexdigest()[:nhex] for v in kd], dtype=object
        )
        keepers = keepers[pref <= sample_max_prefix]
        kept = t.take(pa.array(np.sort(keepers)))
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "source": kept.column("source"),
                "q_score": kept.column("q_score"),
            },
            schema=out_schema,
        )

    meta = docs.map_batches(score_filter_sha, batch_format="pyarrow")
    return key_grouped_block_map(meta.sort("sha"), ["sha"], keep_group_min)


def curate_corpus_to(
    docs,
    out_dir: str,
    *,
    min_q: float = 0.25,
    sample_max_prefix: str = "7f",
    text_col: str = "text",
    num_partitions: int = 16,
) -> pa.Table:
    """Resumable end of the curation pipeline: the curated survivors
    (the dedup sort's output) land as a partitioned parquet directory
    via :func:`..sink.write_partitioned` — one ``part=K`` directory per
    md5-bucket of ``doc_id``, each sealed by a ``_DONE`` marker written
    only after its bytes are atomically in place.

    A run killed mid-write leaves exactly the finished partitions
    marked; re-invoking with the same arguments recomputes the (pure,
    deterministic) pipeline but SKIPS re-serializing every marked
    partition (``skipped=1`` in the returned manifest), so the restart
    cost of the long corpus job is the dataflow, never the sink —
    kill-after-stage-k resume is pytest-asserted by reproducing the
    exact crash directory state and re-running.

    Returns the manifest table (part, rows, skipped)."""
    from .sink import write_partitioned

    curated = curate_corpus(
        docs,
        min_q=min_q,
        sample_max_prefix=sample_max_prefix,
        text_col=text_col,
    )
    return write_partitioned(
        curated, out_dir, key_col="doc_id", num_partitions=num_partitions
    )
