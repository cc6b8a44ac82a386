"""Driver-conformance queries for the training-data operators, over the
``documents`` and ``embeddings`` tables in a testdata sf dir.

SQL-oracled entries (exact DuckDB parity — integer-derived doubles or
values rounded to 6 decimals with sub-ulp engine agreement, verified in
tests/test_datapipes.py):
  txt_stats, txt_fingerprint, dd_exact, dd_ngram_jaccard (word-set
  Jaccard blocked by ``source``), dd_embed_cosine, ann_topk, rel_topk,
  rel_sample, evt_window, evt_sliding, evt_asof (DuckDB ASOF JOIN
  parity), evt_sessions.

Rows-only entries (deterministic but not SQL-expressible; verified
against pure-Python oracles / recall bounds in pytest):
  txt_langid, dd_minhash_lsh, dd_simhash, ann_ivf, mm_features.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from . import dedup, multimodal, similarity, text
from ..util import read_parquet_clean


def _docs(sf_dir: str) -> rd.Dataset:
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"))


def _embs(sf_dir: str) -> rd.Dataset:
    return read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        ray.get(ds.materialize().to_arrow_refs()), promote_options="default"
    )


def _nonempty(t: pa.Table, schema: pa.Schema) -> pa.Table:
    return t if t.num_rows or t.num_columns else schema.empty_table()


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def q_txt_stats(sf_dir: str) -> pa.Table:
    return _collect(text.text_stats(_docs(sf_dir)))


def q_txt_fingerprint(sf_dir: str) -> pa.Table:
    return _collect(text.fingerprints(_docs(sf_dir)))


def q_txt_langid(sf_dir: str) -> pa.Table:
    return _collect(text.lang_id(_docs(sf_dir)))


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def q_dd_exact(sf_dir: str) -> pa.Table:
    return _collect(dedup.exact_dedup(_docs(sf_dir)))


def q_dd_ngram_jaccard(sf_dir: str) -> pa.Table:
    return _nonempty(
        _collect(dedup.jaccard_pairs(_docs(sf_dir), block_col="source", threshold=0.5)),
        pa.schema([("da", pa.int64()), ("db", pa.int64()), ("jaccard", pa.float64())]),
    )


def q_dd_minhash_lsh(sf_dir: str) -> pa.Table:
    return _nonempty(
        _collect(
            dedup.minhash_lsh_pairs(
                _docs(sf_dir), num_perm=32, bands=8, shingle_words=3, threshold=0.5
            )
        ),
        pa.schema([("da", pa.int64()), ("db", pa.int64()), ("jaccard", pa.float64())]),
    )


def q_dd_simhash(sf_dir: str) -> pa.Table:
    return _collect(dedup.simhash(_docs(sf_dir)))


def q_dd_embed_cosine(sf_dir: str) -> pa.Table:
    return _nonempty(
        _collect(dedup.embedding_cosine_pairs(_embs(sf_dir), threshold=0.4)),
        pa.schema([("va", pa.int64()), ("vb", pa.int64()), ("cos", pa.float64())]),
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _query_vectors(sf_dir: str, n: int = 10) -> tuple[np.ndarray, np.ndarray]:
    t = _collect(_embs(sf_dir))
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    m = ids < n
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)[m]
    return ids[m], vecs


def q_ann_topk(sf_dir: str) -> pa.Table:
    qids, qvecs = _query_vectors(sf_dir)
    return similarity.ann_topk_bruteforce(_embs(sf_dir), qids, qvecs, k=10)


def q_ann_ivf(sf_dir: str) -> pa.Table:
    qids, qvecs = _query_vectors(sf_dir)
    return similarity.ann_topk_ivf(
        _embs(sf_dir), qids, qvecs, k=10, nlist=16, nprobe=4
    )


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def q_mm_features(sf_dir: str) -> pa.Table:
    return _collect(multimodal.media_features(_docs(sf_dir)))


# ---------------------------------------------------------------------------
# generic relational ops (grouped top-k, deterministic sampling)
# ---------------------------------------------------------------------------


def q_rel_topk(sf_dir: str) -> pa.Table:
    from . import relational
    from ..util import sorted_table

    t = _collect(
        relational.topk_per_group(
            _docs(sf_dir), group_col="source", id_col="doc_id", order_col="n_chars", k=5
        )
    )
    return sorted_table(t, ["source", "rk"])


def q_rel_sample(sf_dir: str) -> pa.Table:
    from . import relational
    from ..util import sorted_table

    t = _collect(
        relational.hash_sample(
            _docs(sf_dir).select_columns(["doc_id", "source", "n_chars"]),
            key_col="doc_id",
            max_prefix="28",
        )
    )
    return sorted_table(t, ["doc_id"])


# ---------------------------------------------------------------------------
# windowed / sessionized stream operators (events table)
# ---------------------------------------------------------------------------


def _events(sf_dir: str) -> rd.Dataset:
    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"))


def q_evt_window(sf_dir: str) -> pa.Table:
    from . import streams
    from ..util import sorted_table

    t = _collect(streams.tumbling_window_stats(_events(sf_dir), width_minutes=60))
    return sorted_table(t, ["window_start", "event_type"])


def q_evt_sliding(sf_dir: str) -> pa.Table:
    from . import streams
    from ..util import sorted_table

    t = _collect(
        streams.sliding_window_stats(_events(sf_dir), width_minutes=60, slide_minutes=15)
    )
    return sorted_table(t, ["window_start", "event_type"])


def q_evt_asof(sf_dir: str) -> pa.Table:
    """As-of join within the event stream: each click event picks the
    same user's most recent view at-or-before it (inner; ties on the
    view side resolved to MAX(value) — deterministic, mirrored by the
    oracle's pre-aggregated right side)."""
    import pyarrow.compute as pc

    from . import relational
    from ..util import sorted_table, sql_round

    def _side(event_type: str, cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("event_type"), event_type)).select(cols)

        return f

    ev = _events(sf_dir)
    left = ev.map_batches(
        _side("click", ["event_id", "user_id", "ts"]), batch_format="pyarrow"
    )
    right = ev.map_batches(
        _side("view", ["user_id", "ts", "value"]), batch_format="pyarrow"
    )
    t = _collect(
        relational.asof_join(
            left, right, key_col="user_id", ts_col="ts", payload_col="value",
            suffix="_view",
        )
    )
    t = t.set_column(
        t.schema.get_field_index("value_view"),
        "value_view",
        pa.array(sql_round(t.column("value_view").to_numpy(zero_copy_only=False))),
    )
    return sorted_table(t, ["event_id"])


def q_evt_sessions(sf_dir: str) -> pa.Table:
    from . import streams
    from ..util import sorted_table

    t = _collect(streams.sessionize(_events(sf_dir), gap_minutes=30))
    return sorted_table(t, ["user_id", "session_id"])


QUERIES = {
    "txt_stats": q_txt_stats,
    "txt_fingerprint": q_txt_fingerprint,
    "txt_langid": q_txt_langid,
    "dd_exact": q_dd_exact,
    "dd_ngram_jaccard": q_dd_ngram_jaccard,
    "dd_minhash_lsh": q_dd_minhash_lsh,
    "dd_simhash": q_dd_simhash,
    "dd_embed_cosine": q_dd_embed_cosine,
    "ann_topk": q_ann_topk,
    "ann_ivf": q_ann_ivf,
    "mm_features": q_mm_features,
    "rel_topk": q_rel_topk,
    "rel_sample": q_rel_sample,
    "evt_window": q_evt_window,
    "evt_sliding": q_evt_sliding,
    "evt_asof": q_evt_asof,
    "evt_sessions": q_evt_sessions,
}

_EMB_D = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

ORACLE_SQL = {
    "txt_stats": r"""
        SELECT doc_id,
               LENGTH(text) AS n_chars_obs,
               LENGTH(regexp_split_to_array(text, '\s+')) AS n_tokens,
               LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
               LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
               ROUND(
                 LEAST(1.0, LENGTH(regexp_split_to_array(text, '\s+')) / 100.0)
                 * LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                 / GREATEST(LENGTH(text), 1), 6) AS quality
        FROM documents ORDER BY doc_id
    """,
    "txt_fingerprint": """
        SELECT doc_id, md5(text) AS md5_fp FROM documents ORDER BY doc_id
    """,
    "dd_exact": """
        SELECT d.doc_id, m.canonical_id
        FROM documents d
        JOIN (SELECT text, MIN(doc_id) AS canonical_id FROM documents GROUP BY text) m
          ON m.text = d.text
        ORDER BY d.doc_id
    """,
    "dd_ngram_jaccard": r"""
        WITH words AS (
            SELECT DISTINCT doc_id, source,
                   unnest(regexp_split_to_array(text, '\s+')) AS w
            FROM documents
        ),
        cnt AS (SELECT doc_id, COUNT(*) AS nw FROM words GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ni
            FROM words a
            JOIN words b ON a.source = b.source AND a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT da, db,
               ROUND(ni / (ca.nw + cb.nw - ni), 6) AS jaccard
        FROM inter
        JOIN cnt ca ON ca.doc_id = da
        JOIN cnt cb ON cb.doc_id = db
        WHERE ni / (ca.nw + cb.nw - ni) >= 0.5
        ORDER BY da, db
    """,
    "dd_embed_cosine": f"""
        SELECT a.vec_id AS va, b.vec_id AS vb,
               ROUND(list_cosine_similarity(
                   {_EMB_D.replace('embedding', 'a.embedding')},
                   {_EMB_D.replace('embedding', 'b.embedding')}), 6) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(
                   {_EMB_D.replace('embedding', 'a.embedding')},
                   {_EMB_D.replace('embedding', 'b.embedding')}) >= 0.4
        ORDER BY va, vb
    """,
    "ann_topk": f"""
        WITH q AS (
            SELECT vec_id AS qid, {_EMB_D} AS qe FROM embeddings WHERE vec_id < 10
        ),
        s AS (
            SELECT q.qid, e.vec_id AS nid,
                   list_cosine_similarity(q.qe, {_EMB_D.replace('embedding', 'e.embedding')}) AS sc
            FROM q CROSS JOIN embeddings e
            WHERE e.vec_id <> q.qid
        ),
        r AS (
            SELECT qid, nid, sc,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sc DESC, nid) AS rn
            FROM s
        )
        SELECT qid, nid, ROUND(sc, 6) AS score FROM r WHERE rn <= 10
        ORDER BY qid, nid
    """,
    "rel_topk": """
        SELECT source, doc_id, n_chars,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
        FROM documents QUALIFY rk <= 5 ORDER BY source, rk
    """,
    "rel_sample": """
        SELECT doc_id, source, n_chars FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '28'
        ORDER BY doc_id
    """,
    "evt_asof": """
        SELECT c.event_id, c.user_id, c.ts, v.ts AS ts_view,
               ROUND(v.pv, 6) AS value_view
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') c
        ASOF JOIN (SELECT user_id, ts, MAX(value) AS pv FROM events
                   WHERE event_type = 'view' GROUP BY 1, 2) v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY c.event_id
    """,
    "evt_window": """
        SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS sum_value,
               MAX(value) AS max_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "evt_sliding": """
        WITH hops AS (SELECT unnest(range(4)) AS k),
        x AS (
            SELECT (epoch_us(ts) - epoch_us(ts) % 900000000) - k * 900000000 AS w,
                   event_type, value
            FROM events CROSS JOIN hops
        )
        SELECT make_timestamp(w) AS window_start, event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS sum_value,
               MAX(value) AS max_value
        FROM x GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "evt_sessions": """
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(brk) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) - 1 AS session_id
            FROM marked
        )
        SELECT user_id, session_id, MIN(ts) AS session_start,
               COUNT(*) AS n_events,
               ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1e6, 6) AS duration_s
        FROM sess GROUP BY 1, 2 ORDER BY 1, 2
    """,
}
