"""Text-analysis operators over a documents table
``(doc_id:int64, text:string, ...)`` — all vectorized per Arrow batch.

SQL-mirrorable definitions (the DuckDB oracle in
fogray.datapipes.queries computes the same expressions):

- ``n_tokens``  = length(regexp_split_to_array(text, '\\s+'))
- ``n_alpha``   = length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
- ``n_digit``   = length(regexp_replace(text, '[^0-9]', '', 'g'))
- ``quality``   = ROUND(LEAST(1.0, n_tokens/100.0) * n_alpha/GREATEST(n_chars,1), 6)
- ``md5_fp``    = md5(text)

The language-ID scorer is also SQL-mirrored (per-marker non-overlapping
substring counts via length(replace(...)) deltas, argmax with
lang-ascending tie-break). The rolling-hash winnowing fingerprints are
not SQL-expressible; they are deterministic and verified against
pure-Python oracles in tests/test_datapipes.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import sql_round

# ---------------------------------------------------------------------------
# token / quality stats
# ---------------------------------------------------------------------------


def text_stats_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, text, ...) -> (doc_id, n_chars_obs, n_tokens, n_alpha,
    n_digit, quality). Pure pyarrow.compute kernels — zero Python rows."""
    txt = t.column(text_col)
    n_chars = pc.utf8_length(txt).cast(pa.int64())
    n_tokens = pc.list_value_length(pc.split_pattern_regex(txt, r"\s+")).cast(pa.int64())
    n_alpha = pc.utf8_length(pc.replace_substring_regex(txt, "[^A-Za-z]", "")).cast(pa.int64())
    n_digit = pc.utf8_length(pc.replace_substring_regex(txt, "[^0-9]", "")).cast(pa.int64())
    nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    na = n_alpha.to_numpy(zero_copy_only=False).astype(np.float64)
    nc = np.maximum(n_chars.to_numpy(zero_copy_only=False).astype(np.float64), 1.0)
    quality = sql_round(np.minimum(1.0, nt / 100.0) * (na / nc))
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_chars_obs": n_chars,
            "n_tokens": n_tokens,
            "n_alpha": n_alpha,
            "n_digit": n_digit,
            "quality": pa.array(quality, type=pa.float64()),
        }
    )


def text_stats(ds, text_col: str = "text"):
    return ds.map_batches(
        lambda t: text_stats_batch(t, text_col), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# quality scoring (BPE-ish token counts + stopword ratio)
# ---------------------------------------------------------------------------

#: BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation
#: (RE2 syntax, identical in pyarrow.compute and DuckDB regexp_extract_all)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny closed-class list for the stopword-density signal (the operator
#: contract — broadcast list, vectorized membership — is what matters)
STOPWORDS = ("a", "an", "and", "in", "is", "it", "of", "or", "the", "to")


def quality_score_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, text, ...) -> (doc_id, n_bpe_tokens, n_stopwords,
    stop_ratio, q_score). SQL-mirrored definitions:

    - n_bpe_tokens = length(regexp_extract_all(text, BPE_TOKEN_RE))
    - n_stopwords  = whitespace tokens of lower(text) that are STOPWORDS
    - stop_ratio   = ROUND(n_stopwords / GREATEST(n_ws_tokens, 1), 6)
    - q_score      = ROUND(LEAST(1, n_bpe/200) * (1 - 0.5*ratio), 6)

    Pure pyarrow.compute kernels + one reduceat; zero Python rows."""
    txt = t.column(text_col).combine_chunks()
    n_bpe = pc.count_substring_regex(txt, BPE_TOKEN_RE).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    toks = pc.split_pattern_regex(pc.utf8_lower(txt), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_ws = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]  # zero-copy slices carry shifted offsets
    n_stop = np.add.reduceat(
        np.r_[is_stop, 0], np.minimum(offs[:-1], len(is_stop))
    )
    n_stop[n_ws == 0] = 0
    ratio = n_stop / np.maximum(n_ws, 1)
    q = np.minimum(1.0, n_bpe / 200.0) * (1.0 - 0.5 * ratio)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_bpe_tokens": pa.array(n_bpe),
            "n_stopwords": pa.array(n_stop.astype(np.int64)),
            "stop_ratio": pa.array(sql_round(ratio)),
            "q_score": pa.array(sql_round(q)),
        }
    )


def quality_scores(ds, text_col: str = "text"):
    return ds.map_batches(
        lambda t: quality_score_batch(t, text_col), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# corpus-level heavy hitters (top-k tokens)
# ---------------------------------------------------------------------------


def _token_count_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-block partial token counts — the pre-aggregation that keeps
    the groupby shuffle to |vocab| rows per block instead of one row
    per token occurrence. Empty tokens (leading/trailing whitespace
    split artifacts) are dropped on BOTH sides of the oracle."""
    txt = t.column(text_col).combine_chunks()
    flat = pc.list_flatten(pc.split_pattern_regex(txt, r"\s+"))
    words = flat.to_numpy(zero_copy_only=False)
    words = words[words != ""]
    uniq, cnt = np.unique(words, return_counts=True)
    return pa.table(
        {"token": pa.array(uniq.tolist(), type=pa.string()),
         "n_occ": pa.array(cnt.astype(np.int64))}
    )


def _block_topk(t: pa.Table, k: int) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        return pa.table(
            {"token": pa.array([], pa.string()), "n_occ": pa.array([], pa.int64())}
        )
    tok = np.asarray(t.column("token").to_pylist(), dtype=object)
    n = t.column("n_occ").to_numpy(zero_copy_only=False)
    order = np.lexsort((tok, -n))[:k]
    return pa.table(
        {"token": pa.array(tok[order].tolist(), type=pa.string()),
         "n_occ": pa.array(n[order].astype(np.int64))}
    )


def top_tokens(ds, k: int = 20, text_col: str = "text") -> pa.Table:
    """Global top-k most frequent whitespace tokens: per-block partial
    counts -> groupby("token").sum (shuffles only distinct tokens) ->
    per-block partial top-k over the disjoint groupby output -> tiny
    driver merge. Ties break toward the lexicographically smaller
    token, mirrored by the oracle's ROW_NUMBER ordering."""
    import ray

    agg = (
        ds.map_batches(lambda t: _token_count_batch(t, text_col), batch_format="pyarrow")
        .groupby("token")
        .sum("n_occ")
        .map_batches(
            lambda t: t.rename_columns(["token", "n_occ"]), batch_format="pyarrow"
        )
        .map_batches(lambda t: _block_topk(t, k), batch_format="pyarrow")
    )
    parts = pa.concat_tables(
        ray.get(agg.materialize().to_arrow_refs()), promote_options="default"
    )
    return _block_topk(parts, k)


def _bpe_pair_partial_batch(t: pa.Table, text_col: str) -> pa.Table:
    """Per-batch adjacent-CHARACTER pair counts within whitespace
    tokens -> (pk, n) partials with the pair fused into one int64 key
    (cp1 << 21 | cp2 — code points < 2^21). The whole batch is joined
    into ONE string with single-space token separators (C-level
    join/split, no per-row Python), decoded to fixed-width UTF-32 code
    points, and the pair extraction is a numpy shift-compare — pairs
    touching the separator are masked out, so only within-token
    adjacency counts (cross-token and cross-doc pairs never form)."""
    texts = t.column(text_col).to_pylist()
    empty = pa.table(
        {"pk": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )
    if not texts:
        return empty
    toks = " ".join(s for s in texts if s).split()
    if not toks:
        return empty
    a = np.frombuffer(
        " ".join(toks).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    if len(a) < 2:
        return empty
    sp = np.int64(ord(" "))
    c1, c2 = a[:-1], a[1:]
    valid = (c1 != sp) & (c2 != sp)
    if not valid.any():
        return empty
    key = (c1[valid] << np.int64(21)) | c2[valid]
    uk, cnt = np.unique(key, return_counts=True)
    return pa.table({"pk": pa.array(uk), "n": pa.array(cnt.astype(np.int64))})


def bpe_pairs(ds, k: int = 20, text_col: str = "text") -> pa.Table:
    """Top-``k`` most frequent adjacent character pairs within
    whitespace tokens across the corpus — the greedy pair-selection
    step of one BPE tokenizer-training merge round (Sennrich et al.
    2016, public algorithm). Rank by count DESC with (c1, c2) ASC
    tie-break.

    Scale shape: each block pre-collapses to at most alphabet² fused
    int64 pair keys (a few hundred rows regardless of block text
    volume), the groupby shuffles only those keys, and the final rank
    folds the disjoint groupby output driver-side — bounded by
    alphabet², never by corpus size. -> (c1, c2, n, rk)."""
    import ray

    agg = (
        ds.map_batches(
            lambda t: _bpe_pair_partial_batch(t, text_col),
            batch_format="pyarrow",
        )
        .groupby("pk")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["pk", "n"]), batch_format="pyarrow"
        )
    )
    parts = pa.concat_tables(
        ray.get(agg.materialize().to_arrow_refs()), promote_options="default"
    )
    empty = pa.table(
        {
            "c1": pa.array([], pa.string()),
            "c2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "rk": pa.array([], pa.int64()),
        }
    )
    if parts.num_rows == 0:
        return empty
    df = parts.to_pandas()
    pk = df["pk"].to_numpy()
    # alphabet²-bounded decode — the chr loop runs over distinct pairs,
    # not corpus tokens
    df["c1"] = [chr(int(x)) for x in pk >> 21]
    df["c2"] = [chr(int(x)) for x in pk & ((1 << 21) - 1)]
    df = (
        df.sort_values(["n", "c1", "c2"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "c1": pa.array(df["c1"].tolist(), pa.string()),
            "c2": pa.array(df["c2"].tolist(), pa.string()),
            "n": pa.array(df["n"].to_numpy().astype(np.int64)),
            "rk": pa.array(np.arange(1, len(df) + 1, dtype=np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# iterated BPE training (full merge loop over the word-frequency vocab)
# ---------------------------------------------------------------------------

_BPE_STATE_SCHEMA = pa.schema([("w", pa.string()), ("n", pa.int64())])
_BPE_PARTIAL_SCHEMA = pa.schema(
    [("c1", pa.string()), ("c2", pa.string()), ("cnt", pa.int64())]
)


def _bpe_symbolize(t: pa.Table) -> pa.Table:
    """(token, n_occ) -> (w, n) where w is the SPACED symbol string
    ' c h a r s ' — the canonical BPE working form: a merge (x, y) is
    the literal replace ' x y ' -> ' xy ', and both numpy/pyarrow and
    DuckDB replace() are leftmost-nonoverlapping, so the fixpoint of
    that replace IS the greedy per-word BPE merge application
    (property-tested against an explicit per-symbol greedy replica in
    tests/test_datapipes.py)."""
    if t.num_rows == 0 or t.num_columns == 0:
        return _BPE_STATE_SCHEMA.empty_table()
    toks = t.column("token").to_pylist()
    n = t.column("n_occ").to_numpy(zero_copy_only=False).astype(np.int64)
    spaced = [" " + " ".join(w) + " " for w in toks]  # vocab-sized, not corpus
    return pa.table(
        {"w": pa.array(spaced, pa.string()), "n": pa.array(n)},
        schema=_BPE_STATE_SCHEMA,
    )


def _bpe_sym_pair_counts(t: pa.Table) -> pa.Table:
    """Weighted adjacent-SYMBOL pair counts of one vocab block (all
    adjacent positions, overlapping included — the standard get_stats).
    Vectorized: flatten the split symbol lists once, mask cross-word
    adjacency via offsets, np.unique over fused pair strings."""
    if t.num_rows == 0 or t.num_columns == 0:
        return _BPE_PARTIAL_SCHEMA.empty_table()
    w = t.column("w").combine_chunks() if isinstance(
        t.column("w"), pa.ChunkedArray
    ) else t.column("w")
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    # split and drop the '' artifacts of the leading/trailing separator
    lists = pc.split_pattern(w, " ")
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    offs = lists.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]
    widx = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(offs))
    keep = flat != ""
    flat, widx = flat[keep], widx[keep]
    if len(flat) < 2:
        return _BPE_PARTIAL_SCHEMA.empty_table()
    same = widx[:-1] == widx[1:]
    if not same.any():
        return _BPE_PARTIAL_SCHEMA.empty_table()
    a, b = flat[:-1][same], flat[1:][same]
    wt = n[widx[:-1][same]]
    fused = a.astype(object) + "\x1f" + b.astype(object)
    uniq, inv = np.unique(fused.astype(str), return_inverse=True)
    cnt = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(cnt, inv, wt)
    c1, c2 = zip(*(u.split("\x1f") for u in uniq))  # distinct pairs only
    return pa.table(
        {
            "c1": pa.array(list(c1), pa.string()),
            "c2": pa.array(list(c2), pa.string()),
            "cnt": pa.array(cnt),
        },
        schema=_BPE_PARTIAL_SCHEMA,
    )


def _bpe_apply_merge(t: pa.Table, pat: str, rep: str) -> pa.Table:
    """Apply one merge to a vocab block: leftmost-nonoverlapping
    literal replace iterated to the per-block fixpoint (pyarrow
    replace_substring is C-level across the whole column)."""
    if t.num_rows == 0 or t.num_columns == 0:
        return _BPE_STATE_SCHEMA.empty_table()
    w = t.column("w")
    if isinstance(w, pa.ChunkedArray):
        w = w.combine_chunks()
    while True:
        w2 = pc.replace_substring(w, pattern=pat, replacement=rep)
        if pc.all(pc.equal(w2, w)).as_py():
            break
        w = w2
    return pa.table({"w": w, "n": t.column("n")}, schema=_BPE_STATE_SCHEMA)


def bpe_train(ds, rounds: int = 12, text_col: str = "text") -> pa.Table:
    """Full iterated BPE tokenizer training (Sennrich et al. 2016):
    ``rounds`` greedy merge selections over the corpus word-frequency
    vocabulary. -> (rk, c1, c2, n): the merge table, rank-ordered; ties
    on count break toward lexicographically smaller (c1, c2).

    Scale shape: the corpus collapses ONCE to distinct-word counts (the
    top_tokens groupby — only the vocabulary shuffles); the merge loop
    is then a superstep iteration over PINNED vocab blocks (the
    msf/coloring pattern): each round folds per-block pair-count
    partials (bounded by symbols² per block, not corpus size), picks
    the argmax pair on the driver, and rewrites blocks task-to-task in
    the object store — the vocab never collects on the driver."""
    import ray

    vocab = (
        ds.map_batches(lambda t: _token_count_batch(t, text_col), batch_format="pyarrow")
        .groupby("token")
        .sum("n_occ")
        .map_batches(
            lambda t: t.rename_columns(["token", "n_occ"]), batch_format="pyarrow"
        )
        .map_batches(_bpe_symbolize, batch_format="pyarrow")
        .materialize()
    )
    refs = vocab.to_arrow_refs()
    count_task = ray.remote(_bpe_sym_pair_counts)
    apply_task = ray.remote(_bpe_apply_merge)
    out_c1, out_c2, out_n = [], [], []
    for _ in range(rounds):
        parts = [
            t
            for t in ray.get([count_task.remote(r) for r in refs])
            if t.num_rows > 0 and t.num_columns > 0
        ]
        if not parts:
            break
        agg = (
            pa.concat_tables(parts, promote_options="default")
            .group_by(["c1", "c2"])
            .aggregate([("cnt", "sum")])
        )
        c1 = np.asarray(agg.column("c1").to_pylist(), dtype=object)
        c2 = np.asarray(agg.column("c2").to_pylist(), dtype=object)
        cnt = agg.column("cnt_sum").to_numpy(zero_copy_only=False)
        best = np.lexsort((c2, c1, -cnt))[0]
        bc1, bc2, bn = str(c1[best]), str(c2[best]), int(cnt[best])
        out_c1.append(bc1)
        out_c2.append(bc2)
        out_n.append(bn)
        pat = f" {bc1} {bc2} "
        rep = f" {bc1}{bc2} "
        refs = [apply_task.remote(r, pat, rep) for r in refs]
    return pa.table(
        {
            "rk": pa.array(np.arange(1, len(out_c1) + 1, dtype=np.int64)),
            "c1": pa.array(out_c1, pa.string()),
            "c2": pa.array(out_c2, pa.string()),
            "n": pa.array(np.asarray(out_n, dtype=np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# unigram language-model scoring (corpus self-perplexity proxy)
# ---------------------------------------------------------------------------


def _split_tokens(t: pa.Table, text_col: str):
    """-> (flat_words, doc_row_index) with empty split artifacts dropped."""
    txt = t.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    toks = pc.split_pattern_regex(txt, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    row = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    keep = flat != ""
    return flat[keep], row[keep]


def token_entropy(ds, text_col: str = "text"):
    """Per-document Shannon entropy (bits) of the token distribution —
    the repetition/diversity quality signal: H = log2(n) - Σc·log2(c)/n
    over per-token counts c, 0.0 for token-free docs. Docs are
    independent, so this is a PURE map_batches pass (no shuffle, no
    global state — cheaper than unigram_nll's two-pass corpus model);
    per-block everything is vectorized (one fused (row, token) bincount,
    one add.at). Float drift vs the oracle's summation order stays
    orders of magnitude under the 6-decimal round (the unigram_nll/LN
    argument).

    -> (doc_id, entropy)
    """
    import pandas as pd

    def ent(t: pa.Table) -> pa.Table:
        words, row = _split_tokens(t, text_col)
        nt = np.bincount(row, minlength=len(t)).astype(np.float64)
        s = np.zeros(len(t), dtype=np.float64)
        if len(words):
            codes, uniq = pd.factorize(words)
            k = len(uniq)
            # sparse fused-key count (np.unique, not a dense rowsxvocab
            # bincount — a text block's rows x distinct-tokens product
            # can be huge)
            ukey, cnt = np.unique(row * k + codes, return_counts=True)
            c = cnt.astype(np.float64)
            np.add.at(s, ukey // k, c * np.log2(c))
        h = np.zeros(len(t), dtype=np.float64)
        ok = nt > 0
        h[ok] = np.log2(nt[ok]) - s[ok] / nt[ok]
        return pa.table(
            {"doc_id": t.column("doc_id"), "entropy": pa.array(sql_round(h))}
        )

    return ds.map_batches(ent, batch_format="pyarrow")


def hapax_ratio(ds, text_col: str = "text"):
    """Per-document hapax legomena ratio: once-occurring tokens /
    distinct tokens — the vocabulary-freshness quality signal next to
    :func:`token_entropy`, and the same PURE map_batches shape (no
    shuffle, no global state; sparse fused-key unique per block).

    -> (doc_id, n_distinct, n_hapax, hapax_ratio) — ratio NULL for
    token-free docs.
    """
    import pandas as pd

    def hx(t: pa.Table) -> pa.Table:
        words, row = _split_tokens(t, text_col)
        nd = np.zeros(len(t), dtype=np.int64)
        nh = np.zeros(len(t), dtype=np.int64)
        if len(words):
            codes, uniq = pd.factorize(words)
            ukey, cnt = np.unique(row * len(uniq) + codes, return_counts=True)
            urow = ukey // len(uniq)
            np.add.at(nd, urow, 1)
            np.add.at(nh, urow[cnt == 1], 1)
        ratio = np.full(len(t), np.nan)
        ok = nd > 0
        ratio[ok] = sql_round(nh[ok] / nd[ok])
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_distinct": pa.array(nd),
                "n_hapax": pa.array(nh),
                "hapax_ratio": pa.array(ratio, pa.float64(), from_pandas=True),
            }
        )

    return ds.map_batches(hx, batch_format="pyarrow")


def bigram_nll(ds, text_col: str = "text"):
    """Per-document average negative log-likelihood under the corpus's
    own BIGRAM model — the second-order companion to
    :func:`unigram_nll`: nll(doc) = AVG over adjacent pairs of
    -LN(c(w1,w2) / c(w1,·)), 0.0 for docs with < 2 tokens. No smoothing
    needed: the corpus scores itself, so every scored bigram was
    counted.

    Two passes: (1) per-block pair-count partials (the bigram_lm
    pre-combine) folded with ONE sort + group-complete blocks, then the
    model table broadcast ONCE via ``ray.put`` (the bigram vocabulary is
    the small side at corpus scale; beyond driver memory the scoring
    join becomes the repo's sort-exchange instead); (2) each batch
    searchsorteds its fused "w1\\nw2" pair keys ('\\n' is whitespace, so
    it cannot occur inside a token) and segment-averages per doc.

    -> (doc_id, bigram_nll)
    """
    import ray

    from ..derive import key_grouped_block_map

    partials = ds.select_columns(["doc_id", text_col]).map_batches(
        lambda t: _pair_partial_batch(t, text_col), batch_format="pyarrow"
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        df = t.to_pandas().groupby(["w1", "w2"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    ct = pa.concat_tables(
        ray.get(
            key_grouped_block_map(partials.sort(["w1", "w2"]), ["w1", "w2"], fold)
            .materialize()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    w1 = np.asarray(ct.column("w1").to_pylist(), dtype=object)
    w2 = np.asarray(ct.column("w2").to_pylist(), dtype=object)
    c = ct.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    keys = np.asarray([a + "\n" + b for a, b in zip(w1, w2)], dtype=object)
    order = np.argsort(keys, kind="stable")
    keys, c = keys[order], c[order]
    # per-w1 denominators (sum of bigram counts starting with w1)
    uw1, inv = np.unique(w1, return_inverse=True)
    den = np.bincount(inv, weights=ct.column("n").to_numpy(zero_copy_only=False)
                      .astype(np.float64), minlength=len(uw1))
    model_ref = ray.put((keys, c, uw1, den))

    def score(t: pa.Table) -> pa.Table:
        keys_, c_, uw1_, den_ = ray.get(model_ref)
        words, row = _split_tokens(t, text_col)
        s = np.zeros(len(t), dtype=np.float64)
        nb = np.zeros(len(t), dtype=np.int64)
        if len(words) >= 2:
            adj = row[1:] == row[:-1]
            if adj.any():
                a = words[:-1][adj]
                b = words[1:][adj]
                r = row[:-1][adj]
                pk = np.asarray([x + "\n" + y for x, y in zip(a, b)], dtype=object)
                # checked lookups: the contract is "the corpus scores
                # itself" (every scored pair was counted). A dataset
                # that wasn't the model corpus would otherwise silently
                # read a NEIGHBORING pair's count (or IndexError at the
                # array end) — fail loudly instead.
                ip = np.minimum(np.searchsorted(keys_, pk), len(keys_) - 1)
                iw = np.minimum(np.searchsorted(uw1_, a), len(uw1_) - 1)
                if not (np.all(keys_[ip] == pk) and np.all(uw1_[iw] == a)):
                    raise ValueError(
                        "bigram_nll: scored batch contains pairs absent "
                        "from the model corpus — score the corpus the "
                        "model was counted on"
                    )
                ci = c_[ip]
                di = den_[iw]
                lp = -np.log(ci / di)
                np.add.at(s, r, lp)
                nb = np.bincount(r, minlength=len(t)).astype(np.int64)
        nll = np.where(nb > 0, s / np.maximum(nb, 1), 0.0)
        return pa.table(
            {"doc_id": t.column("doc_id"), "bigram_nll": pa.array(sql_round(nll))}
        )

    return ds.map_batches(score, batch_format="pyarrow")


def unigram_nll(ds, text_col: str = "text"):
    """Per-document average negative log-likelihood under the corpus's
    own unigram model — the classic cheap quality/outlier signal (a
    perplexity proxy without a trained LM). Two passes:

    1. global token counts: per-block partial counts -> groupby sum
       (shuffles only distinct tokens), collected and broadcast ONCE
       (``ray.put`` — the vocabulary is the small side);
    2. scoring: each batch searchsorteds its tokens against the sorted
       vocabulary and segment-averages -ln(count/total) per doc.

    nll(doc) = ROUND(AVG over tokens of -LN(c(token)/N), 6); 0.0 for
    token-free docs — mirrored exactly by the SQL oracle."""
    import ray

    counts = (
        ds.map_batches(lambda t: _token_count_batch(t, text_col), batch_format="pyarrow")
        .groupby("token")
        .sum("n_occ")
    )
    ct = pa.concat_tables(
        ray.get(counts.materialize().to_arrow_refs()), promote_options="default"
    )
    vt = np.asarray(ct.column(0).to_pylist(), dtype=object)
    vc = ct.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vt, kind="stable")
    vt, vc = vt[order], vc[order].astype(np.float64)
    total = float(vc.sum())
    vocab_ref = ray.put((vt, vc, total))

    def score(t: pa.Table) -> pa.Table:
        v_tok, v_cnt, tot = ray.get(vocab_ref)
        words, row = _split_tokens(t, text_col)
        s = np.zeros(len(t), dtype=np.float64)
        nt = np.zeros(len(t), dtype=np.int64)
        if len(words):
            idx = np.searchsorted(v_tok, words)
            lp = -np.log(v_cnt[idx] / tot)
            np.add.at(s, row, lp)
            nt = np.bincount(row, minlength=len(t)).astype(np.int64)
        nll = np.where(nt > 0, s / np.maximum(nt, 1), 0.0)
        return pa.table(
            {"doc_id": t.column("doc_id"), "nll": pa.array(sql_round(nll))}
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def md5_fingerprint_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [hashlib.md5(s.encode()).hexdigest() for s in t.column(text_col).to_pylist()]
    return pa.table({"doc_id": t.column("doc_id"), "md5_fp": pa.array(fps)})


_RH_BASE = np.uint64(1_000_003)
_RH_MOD_MASK = np.uint64((1 << 61) - 1)


def rolling_fingerprints(text: str, k: int = 8) -> np.ndarray:
    """Karp-Rabin rolling hashes of every k-byte window, vectorized:
    h(i) = sum_j b[i+j] * BASE^(k-1-j) mod 2^64 (numpy wraparound).
    Deterministic; used for winnowing-style document fingerprints."""
    b = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        return np.zeros(0, dtype=np.uint64)
    powers = _RH_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    # windows via strided cumulative trick: conv of b with powers
    n = len(b) - k + 1
    out = np.zeros(n, dtype=np.uint64)
    for j in range(k):  # k is tiny (8); the n-length ops are vectorized
        out += b[j : j + n] * powers[j]
    return out


def winnow_fingerprint_batch(
    t: pa.Table, text_col: str = "text", k: int = 8, keep: int = 4
) -> pa.Table:
    """Per doc: the ``keep`` smallest distinct k-byte rolling hashes
    (a winnowing sketch — two docs sharing long substrings share sketch
    entries). Output one row per (doc_id, fp).

    Whole-batch vectorized: all docs' bytes are concatenated once, every
    within-doc window's Karp-Rabin hash comes from k shifted-slice
    multiply-adds over the flat byte array, and the per-doc
    distinct+smallest-``keep`` selection is one lexsort by (doc, hash)
    with an adjacent-duplicate mask and an in-doc rank cut."""
    encs = [s.encode() for s in t.column(text_col).to_pylist()]
    byte_lens = np.fromiter((len(b) for b in encs), dtype=np.int64, count=len(encs))
    flat = np.frombuffer(b"".join(encs), dtype=np.uint8).astype(np.uint64)
    doc_offs = np.r_[0, np.cumsum(byte_lens)]
    win_counts = np.maximum(byte_lens - k + 1, 0)
    total = int(win_counts.sum())
    if total == 0:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()), "fp": pa.array([], type=pa.int64())}
        )
    win_offs = np.r_[0, np.cumsum(win_counts)]
    # window start byte positions, never crossing a doc boundary
    base = np.repeat(doc_offs[:-1], win_counts) + (
        np.arange(total) - np.repeat(win_offs[:-1], win_counts)
    )
    powers = _RH_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    h = np.zeros(total, dtype=np.uint64)
    for j in range(k):  # k is tiny (8); the total-length ops are vectorized
        h += flat[base + j] * powers[j]
    row = np.repeat(np.arange(len(encs)), win_counts)
    order = np.lexsort((h, row))
    r, v = row[order], h[order]
    first = np.r_[True, (r[1:] != r[:-1]) | (v[1:] != v[:-1])]
    r, v = r[first], v[first]
    starts = np.r_[True, r[1:] != r[:-1]]
    rank = np.arange(len(r)) - np.repeat(np.flatnonzero(starts), np.diff(np.r_[np.flatnonzero(starts), len(r)]))
    m = rank < keep
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(ids[r[m]], type=pa.int64()),
            "fp": pa.array(v[m].astype(np.int64)),
        }
    )


def fingerprints(ds, text_col: str = "text"):
    """doc_id -> md5 whole-document fingerprint (exact-dup key)."""
    return ds.map_batches(
        lambda t: md5_fingerprint_batch(t, text_col), batch_format="pyarrow"
    )


def winnow_fingerprints(ds, text_col: str = "text", k: int = 8, keep: int = 4):
    return ds.map_batches(
        lambda t: winnow_fingerprint_batch(t, text_col, k, keep),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# language identification (character n-gram profile heuristic)
# ---------------------------------------------------------------------------

# Compact per-language marker profiles: characteristic stopwords and
# character sequences. A real system would learn profiles from corpora;
# the operator contract (vectorized scoring over batches, profiles
# broadcast once per actor) is what matters at scale.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the ", " and ", " of ", " is ", " to ", "ing ", " that "),
    "fr": (" le ", " la ", " les ", " et ", " est ", " une ", " dans "),
    "es": (" el ", " los ", " las ", " es ", " una ", " que ", "ción"),
    "de": (" der ", " die ", " das ", " und ", " ist ", " ein ", "sch"),
    "zh": ("的", "是", "在", "了", "和", "有", "中"),
}


class LangId:
    """Actor-pool language-ID stage: profiles are compiled ONCE per actor
    in __init__ (the stateful-setup pattern — FOG analog: per-thread
    attr buffers); __call__ scores each batch vectorized per language
    via substring counts."""

    def __init__(self, profiles: dict[str, tuple[str, ...]] | None = None):
        self.profiles = profiles or LANG_PROFILES
        self.langs = sorted(self.profiles)

    def __call__(self, t: pa.Table) -> pa.Table:
        txt = t.column("text")
        scores = np.zeros((len(t), len(self.langs)), dtype=np.float64)
        length = np.maximum(
            pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.float64), 1.0
        )
        for j, lang in enumerate(self.langs):
            for marker in self.profiles[lang]:
                scores[:, j] += pc.count_substring(txt, marker).to_numpy(
                    zero_copy_only=False
                )
        scores /= length[:, None]
        best = np.argmax(scores, axis=1)
        none = scores.max(axis=1) == 0.0
        pred = np.array(self.langs, dtype=object)[best]
        pred[none] = "und"
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "pred_lang": pa.array(pred.tolist()),
                "lang_score": pa.array(sql_round(scores.max(axis=1))),
            }
        )


def lang_id(ds, concurrency: int = 4):
    return ds.map_batches(LangId, concurrency=(1, concurrency), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TF-IDF (top-k terms per document)
# ---------------------------------------------------------------------------


def _doc_freq_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-block partial DOCUMENT frequencies: distinct tokens per doc,
    counted once per doc. Each document is one row (one block owns it
    whole), so summing the partials per token is the exact corpus DF."""
    import pandas as pd

    words, row = _split_tokens(t, text_col)
    if len(words) == 0:
        return pa.table(
            {"token": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())}
        )
    codes, uniques = pd.factorize(words, sort=False, use_na_sentinel=False)
    nv = np.int64(len(uniques))
    vi = np.unique(row.astype(np.int64) * nv + codes) % nv
    cnt = np.bincount(vi, minlength=len(uniques))
    nz = np.flatnonzero(cnt)
    return pa.table(
        {"token": pa.array(np.asarray(uniques, dtype=object)[nz].tolist(), type=pa.string()),
         "n_docs": pa.array(cnt[nz].astype(np.int64))}
    )


def tfidf_topk(ds, k: int = 5, text_col: str = "text"):
    """Top-k TF-IDF terms per document: tfidf = tf * LN(N / df).

    Dataflow (the unigram_nll pattern): (1) per-block DF partials ->
    groupby("token").sum — the shuffle carries only distinct tokens —
    collected and broadcast ONCE (the sorted vocabulary is the small
    side); (2) scoring pass: each block fuses (doc_row, vocab_index)
    into one int64 key, np.unique gives per-doc term frequencies, and a
    vectorized per-doc rank keeps the top k by (score DESC, token ASC)
    — the vocab index IS the lexicographic tiebreak, since the
    broadcast vocabulary is sorted. ROUND(...,6) on both sides;
    mirrored exactly by the DuckDB window-rank oracle."""
    import ray

    df_tab = (
        ds.map_batches(lambda t: _doc_freq_batch(t, text_col), batch_format="pyarrow")
        .groupby("token")
        .sum("n_docs")
    )
    ct = pa.concat_tables(
        ray.get(df_tab.materialize().to_arrow_refs()), promote_options="default"
    )
    vt = np.asarray(ct.column(0).to_pylist(), dtype=object)
    vc = ct.column(1).to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(vt, kind="stable")
    vt, vc = vt[order], vc[order]
    n_docs = float(ds.count())
    vocab_ref = ray.put((vt.astype(str), vc))

    def score(t: pa.Table) -> pa.Table:
        v_tok, v_df = ray.get(vocab_ref)
        words, row = _split_tokens(t, text_col)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tfidf": pa.array([], pa.float64()),
            }
        )
        if len(words) == 0:
            return empty
        vidx = np.searchsorted(v_tok, words.astype(str))
        nv = np.int64(len(v_tok))
        assert int(row.max()) < (1 << 62) // max(int(nv), 1)
        key = row * nv + vidx
        key.sort()
        firsts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        tf = np.diff(np.r_[firsts, len(key)]).astype(np.float64)
        u = key[firsts]
        r, vi = u // nv, u % nv
        score_ = tf * np.log(n_docs / v_df[vi])
        # per-doc rank by (score DESC, vocab index ASC == token ASC)
        ordr = np.lexsort((vi, -score_, r))
        r_s, vi_s, sc_s = r[ordr], vi[ordr], score_[ordr]
        starts = np.flatnonzero(np.r_[True, r_s[1:] != r_s[:-1]])
        rank = np.arange(len(r_s)) - np.repeat(starts, np.diff(np.r_[starts, len(r_s)]))
        keep = rank < k
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[r_s[keep]].astype(np.int64)),
                "token": pa.array(v_tok[vi_s[keep]].tolist(), type=pa.string()),
                "tfidf": pa.array(sql_round(sc_s[keep])),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# repetition signal (duplicate-bigram fraction)
# ---------------------------------------------------------------------------


def repetition_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-doc repetition signal: the fraction of word
    bigrams that are duplicates of an earlier bigram in the same doc
    (``1 - distinct/total``). Reuses dedup's vectorized Karp-Rabin
    shingle kernel at n_words=2, so the DuckDB oracle reproduces it
    bit-for-bit; docs with zero tokens are dropped (they have no
    bigrams on either side)."""
    from .dedup import _batch_shingle_hashes

    texts = t.column(text_col).to_pylist()
    flat, offs = _batch_shingle_hashes(texts, 2)
    n_bigrams = np.diff(offs)
    d = np.repeat(np.arange(len(texts), dtype=np.int64), n_bigrams)
    if len(flat):
        order = np.lexsort((flat, d))
        f, dd = flat[order], d[order]
        keep_d = np.r_[True, (f[1:] != f[:-1]) | (dd[1:] != dd[:-1])]
        n_distinct = np.bincount(dd[keep_d], minlength=len(texts))
    else:
        n_distinct = np.zeros(len(texts), dtype=np.int64)
    m = n_bigrams > 0
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)[m]
    rep = sql_round(1.0 - n_distinct[m] / n_bigrams[m])
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "n_bigrams": pa.array(n_bigrams[m], pa.int64()),
            "n_distinct": pa.array(n_distinct[m], pa.int64()),
            "rep_ratio": pa.array(rep, pa.float64()),
        }
    )


def repetition(ds, text_col: str = "text"):
    return ds.map_batches(
        lambda t: repetition_batch(t, text_col), batch_format="pyarrow"
    )


def _pair_partial_batch(t: pa.Table, text_col: str) -> pa.Table:
    """Per-batch adjacent-token pair counts -> (w1, w2, n) partials:
    factorize to int codes, fused-key bincount — no string sorting (the
    perf-playbook rule), no cross-doc pairs. Shared by
    :func:`bigram_lm` and :func:`token_pmi`."""
    import pandas as pd

    empty = pa.table(
        {
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    token_lists = [s.split() for s in t.column(text_col).to_pylist()]
    lens = np.fromiter(
        (len(x) for x in token_lists), dtype=np.int64, count=len(token_lists)
    )
    flat = [w for lst in token_lists for w in lst]
    if not flat:
        return empty
    toks = np.asarray(flat, dtype=object)
    T = len(toks)
    if T < 2:
        return empty
    offs = np.r_[0, np.cumsum(lens)]
    # a pair starts at every position except a doc's last token
    valid = np.ones(T - 1, dtype=bool)
    last = offs[1:][lens > 0] - 1
    valid[last[last < T - 1]] = False
    a_idx = np.flatnonzero(valid)
    if not len(a_idx):
        return empty
    codes, uniq = pd.factorize(toks, use_na_sentinel=False)
    c1, c2 = codes[a_idx], codes[a_idx + 1]
    nu = len(uniq)
    key = c1.astype(np.int64) * nu + c2
    ukey, cnt = np.unique(key, return_counts=True)
    return pa.table(
        {
            "w1": pa.array(uniq[ukey // nu].tolist(), pa.string()),
            "w2": pa.array(uniq[ukey % nu].tolist(), pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        }
    )


def bigram_lm(ds, *, k: int = 3, text_col: str = "text"):
    """Distributed bigram language-model table: the top-``k`` next
    tokens per preceding token across the corpus, ranked by count DESC
    with token ASC tie-break — the count-based n-gram LM build step of
    a data pipeline (quality filtering, perplexity priors).

    ONE exchange: each input block pre-aggregates its adjacent-token
    pair counts (factorize to int codes, fused-key bincount — no string
    sorting, the perf-playbook rule), so the sort by ``w1`` ships
    (w1, w2, partial n) rows, already collapsed per block; each
    group-complete block then folds partials and ranks per w1. The rank
    kernel never trusts intra-block row order.

    -> (w1, w2, n, rk) with rk in 1..k.
    """
    import pandas as pd
    import ray.data as rd

    from ..derive import key_grouped_block_map

    partials = ds.select_columns([text_col]).map_batches(
        lambda t: _pair_partial_batch(t, text_col), batch_format="pyarrow"
    )

    def rank_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "rk": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = (
            t.to_pandas()
            .groupby(["w1", "w2"], as_index=False)["n"]
            .sum()
            .sort_values(["w1", "n", "w2"], ascending=[True, False, True])
        )
        g = df["w1"].to_numpy()
        starts = np.r_[True, g[1:] != g[:-1]]
        sidx = np.flatnonzero(starts)
        rk = (
            np.arange(len(g), dtype=np.int64)
            - np.repeat(sidx, np.diff(np.r_[sidx, len(g)]))
            + 1
        )
        df = df.assign(rk=rk)
        return pa.Table.from_pandas(df[rk <= k], preserve_index=False)

    return key_grouped_block_map(partials.sort(["w1"]), ["w1"], rank_block)


def token_pmi(ds, *, k: int = 50, text_col: str = "text") -> pa.Table:
    """Top-``k`` adjacent-token pairs by count, with pointwise mutual
    information — the collocation / vocab-merge-candidate table of a
    tokenizer-construction pipeline. ``pmi = ln(n * N / (c1 * c2))``
    where n = pair count, N = total pairs, c1 = count of w1 as a LEFT
    pair element, c2 = count of w2 as a RIGHT element (all corpus-wide
    exact counts).

    Dataflow: per-batch pair partials (:func:`_pair_partial_batch`),
    sort by w1 (group-complete fold -> final n + per-w1 left totals),
    then sort the already-aggregated pair table by w2 (per-w2 right
    totals + per-block partial top-k); the driver merges k-sized
    partials and computes pmi on k rows. Raw tokens are never shuffled
    twice — the second exchange moves the aggregated pair table.

    -> pa.Table (w1, w2, n, pmi, rk), rk 1..k by (n DESC, w1, w2).
    """
    import ray
    import ray.data as rd

    from ..derive import key_grouped_block_map

    partials = ds.select_columns([text_col]).map_batches(
        lambda t: _pair_partial_batch(t, text_col), batch_format="pyarrow"
    )

    def fold_w1(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "c1": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas().groupby(["w1", "w2"], as_index=False)["n"].sum()
        df["c1"] = df.groupby("w1")["n"].transform("sum")
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = key_grouped_block_map(partials.sort(["w1"]), ["w1"], fold_w1)

    def topk_w2(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "c1": pa.array([], pa.int64()),
                "c2": pa.array([], pa.int64()),
                "bn": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        df["c2"] = df.groupby("w2")["n"].transform("sum")
        df["bn"] = df["n"].sum()  # block partial of N on every row
        df = df.sort_values(["n", "w1", "w2"], ascending=[False, True, True])
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    tops = key_grouped_block_map(pairs.sort(["w2"]), ["w2"], topk_w2)

    # N needs ALL blocks' partial sums, not just surviving top-k rows:
    # each block reports its bn once (constant per block); sum distinct
    # block contributions via one tiny per-block count pass
    blocks = ray.get(tops.materialize().to_arrow_refs())
    total = 0
    rows = []
    for b in blocks:
        if b.num_rows:
            total += int(b.column("bn")[0].as_py())
            rows.append(b)
    if not rows:
        return pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "pmi": pa.array([], pa.float64()),
                "rk": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(rows).to_pandas()
    merged = merged.sort_values(
        ["n", "w1", "w2"], ascending=[False, True, True]
    ).head(k)
    n = merged["n"].to_numpy().astype(np.float64)
    c1 = merged["c1"].to_numpy().astype(np.float64)
    c2 = merged["c2"].to_numpy().astype(np.float64)
    pmi = sql_round(np.log((n * float(total)) / (c1 * c2)))
    return pa.table(
        {
            "w1": pa.array(merged["w1"].tolist(), pa.string()),
            "w2": pa.array(merged["w2"].tolist(), pa.string()),
            "n": pa.array(merged["n"].to_numpy().astype(np.int64)),
            "pmi": pa.array(pmi, pa.float64()),
            "rk": pa.array(np.arange(1, len(merged) + 1, dtype=np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# PII scrubbing (email / phone redaction)
# ---------------------------------------------------------------------------

#: RE2 patterns — identical semantics in pyarrow.compute (RE2) and DuckDB
#: regexp_* (RE2), so the scrubber is exactly SQL-mirrorable.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def inject_pii_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic PII fixture (the synthetic corpus has none): docs
    with doc_id % 3 == 0 get one email appended, doc_id % 5 == 0 one
    phone number — both derived from doc_id so the SQL oracle rebuilds
    the identical strings and the scrubber is gated on text that
    actually matches. Vectorized (numpy string kernels, no row loop)."""
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    sid = ids.astype(np.str_)
    email = np.where(
        ids % 3 == 0,
        np.char.add(np.char.add(" contact user", sid), "@mail.example.com"),
        "",
    )
    tail = np.char.zfill((ids % 10000).astype(np.str_), 4)
    phone = np.where(
        ids % 5 == 0, np.char.add(" call 555-010-", tail), ""
    )
    joined = pc.binary_join_element_wise(
        t.column(text_col).cast(pa.string()),
        pa.array(email, pa.string()),
        pa.array(phone, pa.string()),
        "",
    )
    return t.set_column(
        t.schema.get_field_index(text_col), text_col, joined
    )


def pii_scrub_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, text, ...) -> (doc_id, n_emails, n_phones, red_len,
    red_md5): count and redact emails first (``[EMAIL]``), then phone
    numbers (``[PHONE]``) on the email-redacted text — the order is the
    contract (an email's digits can never be double-counted as a
    phone). Pure RE2 kernels; counts are non-overlapping matches, the
    same rule as DuckDB's regexp_extract_all."""
    txt = t.column(text_col).cast(pa.string())
    n_emails = pc.count_substring_regex(txt, EMAIL_RE).cast(pa.int64())
    t1 = pc.replace_substring_regex(txt, EMAIL_RE, "[EMAIL]")
    n_phones = pc.count_substring_regex(t1, PHONE_RE).cast(pa.int64())
    t2 = pc.replace_substring_regex(t1, PHONE_RE, "[PHONE]")
    red_len = pc.utf8_length(t2).cast(pa.int64())
    md5s = [hashlib.md5(s.encode()).hexdigest() for s in t2.to_pylist()]
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_emails": n_emails,
            "n_phones": n_phones,
            "red_len": red_len,
            "red_md5": pa.array(md5s, pa.string()),
        }
    )


def pii_scrub(ds, text_col: str = "text", inject: bool = False):
    """Email/phone redaction over a documents Dataset. ``inject=True``
    prepends the deterministic PII fixture stage (tests/bench only)."""
    if inject:
        ds = ds.map_batches(
            lambda t: inject_pii_batch(t, text_col), batch_format="pyarrow"
        )
    return ds.map_batches(
        lambda t: pii_scrub_batch(t, text_col), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# token-window chunking (RAG / context packing)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 16
CHUNK_STRIDE = 12  # overlap = CHUNK_TOKENS - CHUNK_STRIDE


def chunk_batch(
    t: pa.Table,
    text_col: str = "text",
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> pa.Table:
    """flat_map one documents batch into overlapping token windows:
    chunk c covers tokens [c·stride, c·stride + window) for every
    start < n_tokens (whitespace tokens, empties dropped — the same
    rule as ``list_filter(regexp_split_to_array(text, '\\s+'),
    x -> x <> '')``). Emits (doc_id, chunk_id, start_tok, n_tok,
    chunk_md5) where chunk_md5 hashes the single-space re-join of the
    window (whitespace-normalized, like the fingerprint ops). Token
    splitting is per-document (same budget as md5_fingerprint_batch);
    a 100-TB corpus runs this inside map_batches, so the loop is over
    one batch's docs, never the corpus."""
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_id", pa.int64()),
            ("start_tok", pa.int64()),
            ("n_tok", pa.int64()),
            ("chunk_md5", pa.string()),
        ]
    )
    if t.num_rows == 0:
        return out_schema.empty_table()
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    docs, chunks, starts, ntoks, md5s = [], [], [], [], []
    for did, s in zip(ids, t.column(text_col).to_pylist()):
        toks = s.split()
        for c, start in enumerate(range(0, len(toks), stride)):
            win = toks[start:start + window]
            docs.append(did)
            chunks.append(c)
            starts.append(start)
            ntoks.append(len(win))
            md5s.append(hashlib.md5(" ".join(win).encode()).hexdigest())
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "chunk_id": pa.array(chunks, pa.int64()),
            "start_tok": pa.array(starts, pa.int64()),
            "n_tok": pa.array(ntoks, pa.int64()),
            "chunk_md5": pa.array(md5s, pa.string()),
        },
        schema=out_schema,
    )


def chunk_documents(ds, text_col: str = "text", window: int = CHUNK_TOKENS,
                    stride: int = CHUNK_STRIDE):
    return ds.map_batches(
        lambda t: chunk_batch(t, text_col, window, stride),
        batch_format="pyarrow",
    )
