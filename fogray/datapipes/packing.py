"""Training-batch assembly operators: deterministic global shuffle /
shard assignment, token-budget sequence packing, and benchmark
decontamination.

These are the last mile of a pretraining data pipeline at 100 TB: the
curated corpus must be (a) shuffled REPRODUCIBLY so every re-run and
every mid-run resumption sees the same order, (b) packed into
fixed-token-budget training sequences, and (c) checked for eval-set
contamination before anything trains on it.

Scale shape shared by (a) and (b): ONE distributed sort of a NARROW
projection (hash key / token count only — the document payload never
moves), then a metadata-sized driver step (one (count, weight,
boundary-keys) tuple per block), then a per-block vectorized rank /
prefix map. Block layout and order are NOT trusted (the round-1
``evt_sessions`` lesson, fogray/derive.py): the global order is
re-derived from each block's own boundary keys, and a violated
monotonicity assertion fails loudly instead of mis-numbering.

Decontamination (c) broadcasts the BENCHMARK side: eval suites are
KBs-to-MBs against a corpus of TBs, so the distinct benchmark shingle
set is ``ray.put`` once and every corpus block probes it with one
searchsorted — no shuffle touches the corpus. The shingle hash is the
same md5-seeded Karp-Rabin roll the MinHash sketch uses
(fogray.datapipes.dedup._batch_shingle_hashes), which keeps the whole
operator DuckDB-expressible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .dedup import _batch_shingle_hashes, _md5_u64
from ..util import sql_round


@ray.remote
def _block_meta(t: pa.Table, key_cols: list[str], weight_col: str | None):
    """(first_key, last_key, n_rows, weight_sum) of one block — the only
    thing the driver ever sees per block."""
    if t.num_rows == 0:
        return None
    first = tuple(t.column(c)[0].as_py() for c in key_cols)
    last = tuple(t.column(c)[-1].as_py() for c in key_cols)
    w = (
        int(t.column(weight_col).to_numpy(zero_copy_only=False).sum())
        if weight_col
        else t.num_rows
    )
    return first, last, t.num_rows, w


def ordered_block_prefix(sorted_ds, key_cols: list[str], weight_col: str | None = None):
    """Blocks of a key-sorted Dataset in GLOBAL key order, plus the
    exclusive prefix sums of per-block row counts and weight sums.

    Requires globally UNIQUE sort keys (every caller here sorts by a
    unique id or a unique (hash, id) pair), so block key ranges are
    disjoint and ordering blocks by their own boundary keys is total.
    Executor block order is NOT trusted; overlapping ranges raise
    rather than silently mis-rank. Returns (refs, row_base, weight_base).
    """
    refs = sorted_ds.materialize().to_arrow_refs()
    metas = ray.get([_block_meta.remote(r, key_cols, weight_col) for r in refs])
    items = sorted(
        ((m[0], m[1], i) for i, m in enumerate(metas) if m is not None),
        key=lambda x: (x[0], x[1]),
    )
    for (_, last, _), (nfirst, _, _) in zip(items, items[1:]):
        if nfirst <= last:
            raise ValueError(
                "ordered_block_prefix: overlapping block key ranges — "
                f"sort keys not unique ({last!r} >= {nfirst!r})"
            )
    ordered = [refs[i] for _, _, i in items]
    counts = np.array([metas[i][2] for _, _, i in items], dtype=np.int64)
    weights = np.array([metas[i][3] for _, _, i in items], dtype=np.int64)
    row_base = np.cumsum(counts) - counts
    weight_base = np.cumsum(weights) - weights
    return ordered, row_base, weight_base


# ---------------------------------------------------------------------------
# deterministic global shuffle + shard assignment
# ---------------------------------------------------------------------------


def _shuffle_key_batch(t: pa.Table, key_col: str, seed: int) -> pa.Table:
    keys = t.column(key_col).to_numpy(zero_copy_only=False)
    sk = _md5_u64([f"{k}:{seed}" for k in keys.tolist()])
    return t.append_column("sk", pa.array(sk, pa.uint64()))


@ray.remote
def _assign_positions(t: pa.Table, key_col: str, base: int, num_shards: int) -> pa.Table:
    sk = t.column("sk").to_numpy(zero_copy_only=False)
    k = t.column(key_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((k, sk))  # intra-block row order is not trusted either
    pos = base + np.arange(len(k), dtype=np.int64)
    return pa.table(
        {
            key_col: pa.array(k[order]),
            "pos": pa.array(pos, pa.int64()),
            "shard": pa.array(pos % num_shards, pa.int64()),
        }
    )


def global_shuffle(ds, *, key_col: str = "doc_id", seed: int = 7, num_shards: int = 8):
    """Deterministic global shuffle: every row gets a reproducible
    global position (rank of ``md5(key || ':' || seed)``, ties — i.e.
    64-bit prefix collisions — broken by key) and a round-robin shard
    id, so shards are balanced to within one row and a re-run or a
    resumed run produces the identical order. Only (key, 8-byte hash)
    ever moves: ONE narrow sort + per-block metadata.

    -> (key_col, pos, shard) rows.
    """
    proj = ds.select_columns([key_col]).map_batches(
        lambda t: _shuffle_key_batch(t, key_col, seed), batch_format="pyarrow"
    )
    s = proj.sort(["sk", key_col])
    refs, row_base, _ = ordered_block_prefix(s, ["sk", key_col])
    out = [
        _assign_positions.remote(r, key_col, int(b), num_shards)
        for r, b in zip(refs, row_base)
    ]
    if not out:
        return rd.from_arrow(
            pa.table(
                {key_col: pa.array([], pa.int64()),
                 "pos": pa.array([], pa.int64()),
                 "shard": pa.array([], pa.int64())}
            )
        )
    return rd.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# token-budget sequence packing
# ---------------------------------------------------------------------------


def _ntokens_batch(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Whitespace token count per doc, EXCLUDING empty tokens (matches
    DuckDB ``length(list_filter(regexp_split_to_array(text, '\\s+'),
    x -> x <> ''))`` — arrow's split emits '' at leading/trailing
    whitespace, so those are subtracted)."""
    txt = t.column(text_col)
    lists = pc.utf8_split_whitespace(txt)
    n_all = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    if len(flat):
        par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        emp = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        n_all = n_all - np.bincount(par[emp], minlength=t.num_rows).astype(np.int64)
    return pa.table(
        {id_col: t.column(id_col), "n_tokens": pa.array(n_all, pa.int64())}
    )


@ray.remote
def _pack_block(t: pa.Table, id_col: str, token_base: int, budget: int) -> pa.Table:
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    nt = t.column("n_tokens").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")  # ids unique; block order untrusted
    ids, nt = ids[order], nt[order]
    start = token_base + np.cumsum(nt) - nt
    return pa.table(
        {
            id_col: pa.array(ids),
            "n_tokens": pa.array(nt, pa.int64()),
            "seq_id": pa.array(start // budget, pa.int64()),
            "seq_off": pa.array(start % budget, pa.int64()),
        }
    )


def pack_sequences(ds, *, budget: int = 256, id_col: str = "doc_id", text_col: str = "text"):
    """Streaming concat-and-chop sequence packing (the GPT-style
    pretraining layout): documents in ``id_col`` order are conceptually
    concatenated and split every ``budget`` tokens; each doc reports the
    training sequence its FIRST token lands in (``seq_id``) and the
    offset inside it (``seq_off``). Deterministic — the packing of doc
    i depends only on the exclusive prefix sum of token counts before
    it, computed from per-block token-sum metadata, never a collect.

    -> (id_col, n_tokens, seq_id, seq_off) rows.
    """
    counts = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: _ntokens_batch(t, id_col, text_col), batch_format="pyarrow"
    )
    s = counts.sort(id_col)
    refs, _, tok_base = ordered_block_prefix(s, [id_col], weight_col="n_tokens")
    out = [
        _pack_block.remote(r, id_col, int(b), budget)
        for r, b in zip(refs, tok_base)
    ]
    if not out:
        return rd.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "seq_id": pa.array([], pa.int64()),
                 "seq_off": pa.array([], pa.int64())}
            )
        )
    return rd.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def _mix_partial_batch(t: pa.Table, source_col: str, text_col: str) -> pa.Table:
    """Per-batch (source, n_docs, n_tokens) partials: the exact
    whitespace token-count kernel (:func:`_ntokens_batch`) grouped to
    one row per distinct source via factorize + bincount — the
    exchange ships one row per source per block, never documents."""
    import pandas as pd

    if t.num_rows == 0:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    ntok = (
        _ntokens_batch(t.append_column("__rid", pa.array(np.arange(t.num_rows))),
                       "__rid", text_col)
        .column("n_tokens")
        .to_numpy(zero_copy_only=False)
    )
    src = np.asarray(t.column(source_col).to_pylist(), dtype=object)
    codes, uniq = pd.factorize(src, use_na_sentinel=False)
    n_docs = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    # float64 bincount weights are exact below 2^53 — token counts are
    # tiny integers
    n_tokens = np.bincount(
        codes, weights=ntok.astype(np.float64), minlength=len(uniq)
    ).astype(np.int64)
    return pa.table(
        {
            "source": pa.array(uniq.tolist(), pa.string()),
            "n_docs": pa.array(n_docs),
            "n_tokens": pa.array(n_tokens),
        }
    )


def mixture_weights(
    ds,
    *,
    budget: int = 1_000_000,
    source_col: str = "source",
    text_col: str = "text",
) -> pa.Table:
    """Temperature-based source mixing weights for corpus sampling
    (the multi-source resampling step of LLM pretraining pipelines,
    e.g. the alpha-smoothed mixing of GPT-3 / XLM-R; public method):
    per source s, p_s = tokens_s / total_tokens and
    w_s = sqrt(p_s) / sum(sqrt(p_r)) — alpha = 1/2 upweights small
    sources — plus the expected token draw for a ``budget``-token
    epoch.

    Scale shape: per-block partials collapse to one (source, n_docs,
    n_tokens) row per distinct source (exact int64 counts), the
    groupby shuffles only those rows, and the final normalization is
    a driver fold over n_sources rows. The floats are the identical
    expression over exact integers on both engine and oracle (the
    repo-wide oracle rule); the 6-decimal round absorbs the one
    order-sensitive term (the n_sources-long sqrt sum).

    -> (source, n_docs, n_tokens, weight, expected_tokens)."""
    agg = (
        ds.select_columns([source_col, text_col])
        .map_batches(
            lambda t: _mix_partial_batch(t, source_col, text_col),
            batch_format="pyarrow",
        )
        .groupby("source")
        .sum(["n_docs", "n_tokens"])
        .map_batches(
            lambda t: t.rename_columns(["source", "n_docs", "n_tokens"]),
            batch_format="pyarrow",
        )
    )
    parts = pa.concat_tables(
        ray.get(agg.materialize().to_arrow_refs()), promote_options="default"
    )
    empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "weight": pa.array([], pa.float64()),
            "expected_tokens": pa.array([], pa.int64()),
        }
    )
    if parts.num_rows == 0:
        return empty
    df = parts.to_pandas().sort_values("source").reset_index(drop=True)
    tok = df["n_tokens"].to_numpy().astype(np.int64)
    total = int(tok.sum())
    if total == 0:
        return empty
    wraw = np.sqrt(tok.astype(np.float64) / float(total))
    wn = wraw / wraw.sum()
    return pa.table(
        {
            "source": pa.array(df["source"].tolist(), pa.string()),
            "n_docs": pa.array(df["n_docs"].to_numpy().astype(np.int64)),
            "n_tokens": pa.array(tok),
            "weight": pa.array(sql_round(wn)),
            "expected_tokens": pa.array(
                sql_round(wn * float(budget), 0).astype(np.int64)
            ),
        }
    )


def _doc_distinct_shingles(texts: list[str], n_words: int):
    """Per-doc DISTINCT shingle hashes for a batch: (flat uint64 hashes,
    doc index per hash) — the multiset from _batch_shingle_hashes
    deduped within each doc by one lexsort."""
    flat, offs = _batch_shingle_hashes(texts, n_words)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(offs))
    if not len(flat):
        return flat, doc_idx
    order = np.lexsort((flat, doc_idx))
    f, d = flat[order], doc_idx[order]
    keep = np.r_[True, (f[1:] != f[:-1]) | (d[1:] != d[:-1])]
    return f[keep], d[keep]


def benchmark_overlap(
    ds,
    *,
    bench_mod: int = 37,
    n_words: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_frac: float = 0.5,
):
    """Decontamination against a held-out benchmark: docs with
    ``id % bench_mod == 0`` form the eval set; every OTHER doc reports
    how many of its distinct word ``n_words``-grams appear anywhere in
    the eval set. Benchmark shingles are collected + deduped (eval
    suites are tiny next to the corpus — the broadcast small side),
    ``ray.put`` once; each corpus block probes the sorted array with
    searchsorted. Shingle hash = dedup's md5-seeded Karp-Rabin roll,
    so DuckDB reproduces it exactly.

    -> (id_col, n_ngrams, n_overlap, overlap_frac, contaminated) for
    non-benchmark docs with >= 1 shingle.
    """
    proj = ds.select_columns([id_col, text_col])

    def bench_block(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        m = (ids % bench_mod) == 0
        if not m.any():
            return pa.table({"sh": pa.array([], pa.uint64())})
        texts = t.filter(pa.array(m)).column(text_col).to_pylist()
        flat, _ = _batch_shingle_hashes(texts, n_words)
        return pa.table({"sh": pa.array(np.unique(flat), pa.uint64())})

    parts = ray.get(
        proj.map_batches(bench_block, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    bench = np.unique(
        np.concatenate(
            [p.column("sh").to_numpy(zero_copy_only=False) for p in parts]
            or [np.zeros(0, dtype=np.uint64)]
        )
    )
    bench_ref = ray.put(bench)

    def scan_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_ngrams": pa.array([], pa.int64()),
                "n_overlap": pa.array([], pa.int64()),
                "overlap_frac": pa.array([], pa.float64()),
                "contaminated": pa.array([], pa.int64()),
            }
        )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        m = (ids % bench_mod) != 0
        if not m.any():
            return empty
        ids = ids[m]
        texts = t.filter(pa.array(m)).column(text_col).to_pylist()
        f, d = _doc_distinct_shingles(texts, n_words)
        n_ngrams = np.bincount(d, minlength=len(texts))
        b = ray.get(bench_ref)
        if len(b) and len(f):
            idx = np.searchsorted(b, f)
            idx[idx == len(b)] = 0
            hit = b[idx] == f
            n_overlap = np.bincount(d[hit], minlength=len(texts))
        else:
            n_overlap = np.zeros(len(texts), dtype=np.int64)
        keep = n_ngrams > 0
        frac = sql_round(n_overlap[keep] / n_ngrams[keep])
        return pa.table(
            {
                id_col: pa.array(ids[keep]),
                "n_ngrams": pa.array(n_ngrams[keep], pa.int64()),
                "n_overlap": pa.array(n_overlap[keep], pa.int64()),
                "overlap_frac": pa.array(frac, pa.float64()),
                "contaminated": pa.array(
                    (n_overlap[keep] >= flag_frac * n_ngrams[keep]).astype(np.int64)
                ),
            }
        )

    return proj.map_batches(scan_block, batch_format="pyarrow")
