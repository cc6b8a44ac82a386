"""Deduplication operators over a documents table.

Five families, per the standard web-pipeline toolbox:

- :func:`exact_dedup` — sha256(text) hash-partition + per-group min
  doc_id (one groupby + one hash join back to docs);
- :func:`jaccard_pairs` — exact near-dup pairs by token-set Jaccard
  within a blocking key (blocked self-join on (block, token) — the
  relational candidate generation; the block key bounds the quadratic
  blow-up the way LSH bands do probabilistically);
- :class:`MinHasher` / :func:`minhash_lsh_pairs` — MinHash signatures
  over word shingles, LSH banding (band-hash groupby join for candidate
  pairs), exact shingle-Jaccard verification;
- :func:`simhash` / :func:`simhash_pairs` — 64-bit SimHash with
  band-blocked Hamming-distance candidate pairs;
- :func:`embedding_cosine_pairs` — near-dup pairs by embedding cosine:
  brute block-pairwise matmul against a broadcast matrix (small-N
  baseline) or random-hyperplane LSH bucketing (the scale path);
- :func:`allpairs_jaccard` — EXACT all-pairs shingle Jaccard via prefix
  filtering (Bayardo et al. 2007): rare-first prefixes bound candidate
  generation without blocking keys or probabilistic banding.

All hashing is deterministic (md5-prefix token hashes / Karp-Rabin /
seeded numpy) and chosen to be SQL-replicable: DuckDB computes the same
token hash as ``('0x' || substr(md5(tok), 1, 16))::UBIGINT``, so the
simhash and MinHash+LSH operators carry full DuckDB oracles in addition
to the pure-Python oracles in tests/test_datapipes.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..derive import (
    _join_parts,
    cooccurrence_pair_counts,
    empty_guard,
    key_grouped_block_map,
    make_pair_expander,
    safe_inner_join,
)
from ..util import list_col_matrix, sql_round

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _sha_batch(t: pa.Table, text_col: str) -> pa.Table:
    shas = [hashlib.sha256(s.encode()).hexdigest() for s in t.column(text_col).to_pylist()]
    return pa.table({"doc_id": t.column("doc_id"), "sha": pa.array(shas)})


def exact_dedup(ds, text_col: str = "text") -> rd.Dataset:
    """-> (doc_id, canonical_id): canonical = min doc_id sharing
    sha256(text). ONE sort by sha range-partitions each hash group into
    a single block, where the per-group min and the assignment are one
    vectorized pass (replaces groupby + join-back: one exchange instead
    of two, nothing re-shuffled)."""
    shas = ds.map_batches(lambda t: _sha_batch(t, text_col), batch_format="pyarrow")

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "canonical_id": pa.array([], pa.int64())}
            )
        sha = t.column("sha").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, sha))
        sha, doc = sha[order], doc[order]
        starts = np.flatnonzero(np.r_[True, sha[1:] != sha[:-1]])
        sizes = np.diff(np.r_[starts, len(sha)])
        canon = np.repeat(doc[starts], sizes)  # min doc per sha (doc-sorted)
        return pa.table({"doc_id": doc, "canonical_id": canon})

    return key_grouped_block_map(shas.sort("sha"), ["sha"], assign)


# ---------------------------------------------------------------------------
# blocked token-set Jaccard (exact)
# ---------------------------------------------------------------------------


def _doc_tokens_batch(t: pa.Table, text_col: str, block_col: str | None) -> pa.Table:
    """One row per distinct (doc_id[, block], token) — whole-batch
    vectorized: flatten every doc's tokens, one lexsort by (doc,
    token), adjacent-duplicate mask for per-doc distinctness (same
    per-doc sorted order as the sorted(set(...)) loop it replaces)."""
    toks = pc.split_pattern_regex(t.column(text_col), r"\s+").to_pylist()
    lens = np.fromiter((len(x) for x in toks), dtype=np.int64, count=len(toks))
    flat = np.asarray([w for lst in toks for w in lst], dtype=object)
    row = np.repeat(np.arange(len(toks)), lens)
    if len(flat):
        order = np.lexsort((flat, row))
        r, v = row[order], flat[order]
        keep = np.r_[True, (r[1:] != r[:-1]) | (v[1:] != v[:-1])]
        r, v = r[keep], v[keep]
    else:
        r, v = np.empty(0, dtype=np.int64), flat
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    cols = {"doc_id": pa.array(doc_ids[r], type=pa.int64())}
    if block_col:
        blocks = np.asarray(t.column(block_col).to_pylist(), dtype=object)
        cols["block"] = pa.array(blocks[r].tolist())
    else:
        # unblocked corpus = one global group; a constant key lets the
        # no-block path reuse the same groupby/map_groups dataflow (the
        # single group runs in ONE WORKER task, never on the driver)
        cols["block"] = pa.array(np.zeros(len(r), dtype=np.int64))
    cols["tok"] = pa.array(v.tolist(), type=pa.string())
    return pa.table(cols)


def jaccard_pairs(
    ds,
    *,
    text_col: str = "text",
    block_col: str | None = "source",
    threshold: float = 0.5,
    max_block_docs: int = 25_000,
) -> rd.Dataset:
    """Exact token-set Jaccard >= threshold pairs (da < db), candidates
    blocked by ``block_col`` (a shared token outside the block never
    pairs — the operator's documented blocking contract, mirrored by
    the SQL oracle).

    Dataflow: ONE hash shuffle co-locating each block's distinct
    (doc, token) rows, then per-block vectorized set algebra — binary
    doc x token incidence matrix, intersections = one matmul. A
    token-level self-join emits |docs-sharing-token|^2 rows per token
    (measured ~50M rows at sf0.1) where the matmul form ships nothing.
    The incidence matrix is accumulated in TOKEN CHUNKS (inter +=
    m_c @ m_c.T), so a hot block's working set is O(docs^2 +
    docs*chunk), never O(docs * vocab); the docs^2 intersection matrix
    is the operator's inherent all-pairs cost and bounds block sizing
    (~25k docs/block in 8 GiB — the same per-block contract LSH
    banding has). ``block_col=None`` routes the whole corpus through
    one group (one worker task, not the driver) — small-corpus only.

    ``max_block_docs`` is the LOUD guard on that inherent docs² cost:
    a block (or the whole corpus under ``block_col=None``) holding
    more docs raises with the bound instead of silently attempting a
    multi-GiB intersection matrix — past it, use the MinHash-LSH path
    (:func:`minhash_lsh_pairs`), whose banding bounds bucket sizes
    probabilistically."""
    words = ds.map_batches(
        lambda t: _doc_tokens_batch(t, text_col, block_col), batch_format="pyarrow"
    )

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        docs, doc_inv = np.unique(g["doc_id"].to_numpy(), return_inverse=True)
        if len(docs) > max_block_docs:
            blk = g["block"].iloc[0] if len(g) else "?"
            raise ValueError(
                f"jaccard_pairs: block {blk!r} holds {len(docs)} docs > "
                f"max_block_docs={max_block_docs}; the exact all-pairs "
                f"kernel is O(docs^2) per block (~{8 * len(docs) ** 2 / 2 ** 30:.1f} "
                "GiB intersection matrix). Use a finer block_col or the "
                "MinHash-LSH path (minhash_lsh_pairs) for blocks this size."
            )
        if len(docs) < 2:
            z = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"da": z, "db": z, "jaccard": z.astype(np.float64)})
        toks, tok_inv = np.unique(g["tok"].to_numpy(), return_inverse=True)
        # float32 chunks: counts are exact integers < 2^24, matmul is
        # 2x cheaper; accumulate + divide in float64 so the rounded
        # jaccard is bit-identical to the all-at-once form.
        # cap 2^22 keeps every float32 partial count < 2^24 (exact)
        chunk = max(1, min(1 << 22, (32 << 20) // max(len(docs), 1)))
        inter = np.zeros((len(docs), len(docs)), dtype=np.float64)
        order = np.argsort(tok_inv, kind="stable")
        d_sorted, t_sorted = doc_inv[order], tok_inv[order]
        for lo in range(0, len(toks), chunk):
            hi = min(lo + chunk, len(toks))
            sel = slice(
                np.searchsorted(t_sorted, lo), np.searchsorted(t_sorted, hi)
            )
            m = np.zeros((len(docs), hi - lo), dtype=np.float32)
            m[d_sorted[sel], t_sorted[sel] - lo] = 1.0
            inter += (m @ m.T).astype(np.float64)
        sizes = np.bincount(doc_inv, minlength=len(docs)).astype(np.float64)
        union = sizes[:, None] + sizes[None, :] - inter
        j = inter / np.maximum(union, 1.0)
        ai, bi = np.nonzero(np.triu(j >= threshold, k=1))
        return pd.DataFrame(
            {
                "da": docs[ai],
                "db": docs[bi],
                "jaccard": sql_round(j[ai, bi]),
            }
        )

    return words.groupby("block").map_groups(block_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)
_FNV = np.uint64(1099511628211)


def _md5_u64(words, cache: dict | None = None) -> np.ndarray:
    """First 8 md5 bytes per word, big-endian uint64 — the token hash
    every dedup sketch builds on. Chosen over crc32 because DuckDB can
    compute the identical value (``('0x' || substr(md5(w), 1,
    16))::UBIGINT``), which is what makes the simhash / MinHash oracles
    SQL-expressible. One frombuffer over the joined digests beats a
    per-word int.from_bytes; an optional ``cache`` dict (token -> 8
    digest bytes) amortizes re-hashes across an actor's batches —
    corpus vocabulary overlaps heavily batch to batch."""
    md5 = hashlib.md5
    if cache is None:
        buf = b"".join(md5(w.encode()).digest()[:8] for w in words)
    else:
        get = cache.get
        parts = []
        for w in words:
            h = get(w)
            if h is None:
                h = md5(w.encode()).digest()[:8]
                cache[w] = h
            parts.append(h)
        buf = b"".join(parts)
    return np.frombuffer(buf, dtype=">u8").astype(np.uint64)


def _batch_shingle_hashes(texts: list[str], n_words: int, cache: dict | None = None):
    """Vectorized word-shingle hashing for a whole batch: tokenize, hash
    each DISTINCT token once (vocab dedup — the per-shingle-string hash
    loop this replaces re-hashed every occurrence), then roll a
    Karp-Rabin polynomial over the token-hash windows with numpy slices.
    Returns (flat_shingle_hashes uint64, doc_offsets len=#docs+1);
    shingles are a multiset (min-hash only needs the min)."""
    token_lists = [s.split() for s in texts]
    lens = np.fromiter((len(x) for x in token_lists), dtype=np.int64, count=len(token_lists))
    flat = [w for lst in token_lists for w in lst]
    if not flat:
        return np.zeros(0, dtype=np.uint64), np.zeros(len(texts) + 1, dtype=np.int64)
    uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
    uh = _md5_u64(uniq, cache)
    th = uh[inv]  # per-token 64-bit hash
    tok_offs = np.r_[0, np.cumsum(lens)]
    # windows of n_words consecutive token hashes, but never across docs:
    # shingle count per doc = max(len-n+1, 1 if len>0 else 0)
    sh_counts = np.where(lens == 0, 0, np.maximum(lens - n_words + 1, 1))
    sh_offs = np.r_[0, np.cumsum(sh_counts)]
    total = int(sh_offs[-1])
    out = np.zeros(total, dtype=np.uint64)
    # polynomial roll: out = ((h0*F + h1)*F + h2)... vectorized across all
    # windows at once, one slice-shift per window position
    starts = np.repeat(tok_offs[:-1], sh_counts)  # window start per shingle
    win = np.repeat(np.minimum(lens, n_words), sh_counts)  # window length
    pos = np.arange(total) - np.repeat(sh_offs[:-1], sh_counts)
    base = starts + pos
    for k in range(n_words):
        m = win > k
        out[m] = out[m] * _FNV + th[base[m] + k]
    return out, sh_offs


def _doc_shingles(text: str, n_words: int) -> np.ndarray:
    """Distinct shingle hashes of one document (the single-doc view of
    :func:`_batch_shingle_hashes` — same values)."""
    flat, offs = _batch_shingle_hashes([text], n_words)
    return np.unique(flat)


class MinHasher:
    """Actor-pool MinHash stage: the permutation coefficients are drawn
    ONCE per actor in __init__ from a fixed seed (stateful-setup
    pattern); __call__ computes the whole batch's signatures in one
    (num_perm x batch_shingles) pass with a segmented min per doc."""

    def __init__(self, num_perm: int = 32, shingle_words: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.shingle_words = shingle_words
        self._hash_cache: dict = {}  # token -> digest bytes, per actor

    def signature(self, text: str) -> np.ndarray:
        x = _doc_shingles(text, self.shingle_words)
        if len(x) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        h = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return h.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        flat, offs = _batch_shingle_hashes(t.column("text").to_pylist(),
                                           self.shingle_words, self._hash_cache)
        sigs = np.zeros((len(ids), self.num_perm), dtype=np.uint64)
        if len(flat):
            h = (self.a[:, None] * flat[None, :] + self.b[:, None]) % _MERSENNE
            nonempty = np.flatnonzero(np.diff(offs) > 0)
            seg = np.minimum.reduceat(h, offs[nonempty], axis=1)
            sigs[nonempty] = seg.T
        cols = {"doc_id": pa.array(ids, type=pa.int64())}
        cols["sig"] = pa.array(sigs.astype(np.int64).tolist(),
                               type=pa.list_(pa.int64(), self.num_perm))
        return pa.table(cols)


def exact_pair_verify(ds, cand, *, threshold: float, pack_rows):
    """Exact set-Jaccard verification of candidate pairs as a
    DISTRIBUTED sort-join (shared by the MinHash-LSH and prefix-filter
    all-pairs joins): the doc -> packed-distinct-int64-set table stays a
    Dataset (never collected on the driver) and the candidate pairs are
    attached with the repo's sort + group-complete pattern instead of
    hash joins (a Ray 2.49 hash join costs ~15s of aggregator fixed
    overhead per all-to-all at this scale; the sort-based exchange is
    ~5x cheaper). Stage 1: candidate sides exploded to (doc_id, da, db,
    side) rows, unioned with the set rows, ONE sort by doc_id, per-doc
    block attach of the packed payload. Stage 2: ONE sort by (da, db)
    brings each pair's two sides together; the block kernel computes
    every pair's exact Jaccard in one lexsort over the flattened
    (pair, value) rows — values are unique within a side, so adjacent
    duplicates after a (pair, value) sort are exactly the intersection.

    ``pack_rows(t) -> (doc_id, sh BINARY)`` packs each doc's sorted
    distinct int64 items little-endian. -> Dataset (da, db, jaccard >=
    threshold)."""
    mixed_schema = pa.schema(
        [("doc_id", pa.int64()), ("da", pa.int64()), ("db", pa.int64()),
         ("side", pa.int64()), ("sh", pa.binary())]
    )

    def _sh_mixed(t: pa.Table) -> pa.Table:
        s = pack_rows(t)
        n = s.num_rows
        neg = np.full(n, -1, dtype=np.int64)
        return pa.table(
            {"doc_id": s.column("doc_id"), "da": neg, "db": neg,
             "side": neg, "sh": s.column("sh")},
            schema=mixed_schema,
        )

    def _cand_mixed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return mixed_schema.empty_table()
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        n = len(da)
        return pa.table(
            {
                "doc_id": np.concatenate([da, db]),
                "da": np.concatenate([da, da]),
                "db": np.concatenate([db, db]),
                "side": np.repeat(np.array([0, 1], dtype=np.int64), n),
                "sh": pa.array([b""] * (2 * n), type=pa.binary()),
            },
            schema=mixed_schema,
        )

    def _attach(t: pa.Table) -> pa.Table:
        """Group-complete per doc_id: copy the doc's shingle payload
        (its side==-1 row) onto its candidate-side rows, dropping
        duplicate cross-band candidate rows."""
        if t.num_rows == 0:
            return mixed_schema.empty_table()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        da_c = t.column("da").to_numpy(zero_copy_only=False)
        db_c = t.column("db").to_numpy(zero_copy_only=False)
        # per doc: shingle row (-1) first, then candidate rows grouped
        # so duplicate (doc, side, da, db) rows land adjacent
        order = np.lexsort((db_c, da_c, side, doc))
        doc_s, side_s = doc[order], side[order]
        da_s, db_s = da_c[order], db_c[order]
        uniq = np.r_[
            True,
            (doc_s[1:] != doc_s[:-1]) | (side_s[1:] != side_s[:-1])
            | (da_s[1:] != da_s[:-1]) | (db_s[1:] != db_s[:-1]),
        ]
        order, doc_s, side_s = order[uniq], doc_s[uniq], side_s[uniq]
        starts = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
        sizes = np.diff(np.r_[starts, len(doc_s)])
        # a doc with no shingle row (candidate id outside the corpus)
        # would mis-attach; every corpus doc emits one, so assert
        if not (side_s[starts] == -1).all():
            raise ValueError("candidate doc_id missing from shingle table")
        sh_idx = np.repeat(starts, sizes)
        out = t.take(pa.array(order))
        out = out.set_column(
            out.schema.get_field_index("sh"), "sh",
            out.column("sh").take(pa.array(sh_idx)),
        )
        return out.filter(pa.array(side_s >= 0))

    sh_mixed = ds.map_batches(_sh_mixed, batch_format="pyarrow")
    cand_mixed = cand.map_batches(
        empty_guard(_cand_mixed, mixed_schema), batch_format="pyarrow"
    )
    attached = key_grouped_block_map(
        sh_mixed.union(cand_mixed).sort("doc_id"), ["doc_id"], _attach
    ).materialize()
    if attached.count() == 0:
        return rd.from_arrow(
            pa.schema(
                [("da", pa.int64()), ("db", pa.int64()), ("jaccard", pa.float64())]
            ).empty_table()
        )
    def _unpack(col) -> tuple[np.ndarray, np.ndarray]:
        """Binary column of packed int64s -> (flat values, lengths)."""
        arr = col.combine_chunks()
        lens = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64) // 8
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)
        offs = offs[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        flat = np.frombuffer(data[offs[0] : offs[-1]].tobytes(), dtype=np.int64)
        return flat, lens

    verify_schema = pa.schema(
        [("da", pa.int64()), ("db", pa.int64()), ("jaccard", pa.float64())]
    )

    def verify(t: pa.Table) -> pa.Table:
        """Group-complete per (da, db): two rows per pair (side 0 = da's
        packed shingles, side 1 = db's)."""
        if t.num_rows == 0:
            return verify_schema.empty_table()
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, db, da))
        t = t.take(pa.array(order))
        da, db = da[order], db[order]
        if len(da) % 2:
            raise ValueError("candidate pair without both sides")
        flat, lens = _unpack(t.column("sh"))
        n = len(da) // 2
        la, lb = lens[0::2], lens[1::2]
        row = np.repeat(np.repeat(np.arange(n), 2), lens)
        order2 = np.lexsort((flat, row))
        rs, vs = row[order2], flat[order2]
        dup = (rs[1:] == rs[:-1]) & (vs[1:] == vs[:-1]) if len(rs) else np.zeros(0, bool)
        ni = np.bincount(rs[:-1][dup], minlength=n)
        union = np.maximum(la + lb - ni, 1)
        j = ni / union
        keep = (la > 0) & (lb > 0) & (j >= threshold)
        return pa.table(
            {
                "da": pa.array(da[0::2][keep], type=pa.int64()),
                "db": pa.array(db[0::2][keep], type=pa.int64()),
                "jaccard": pa.array(sql_round(j[keep]), type=pa.float64()),
            }
        )

    return key_grouped_block_map(
        attached.sort(["da", "db", "side"]), ["da", "db"], verify
    )



def minhash_signatures(ds, num_perm: int = 32, shingle_words: int = 3,
                       concurrency: int = 4) -> rd.Dataset:
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_words": shingle_words},
        concurrency=(1, concurrency),
        batch_format="pyarrow",
    )


def minhash_lsh_pairs(
    ds,
    *,
    num_perm: int = 32,
    bands: int = 8,
    shingle_words: int = 3,
    threshold: float = 0.5,
    concurrency: int = 4,
    max_bucket_docs: int = 20_000,
) -> rd.Dataset:
    """MinHash -> LSH band buckets -> candidate pairs (band-bucket self
    join) -> exact shingle-Jaccard verify. Returns (da, db, jaccard)
    with jaccard >= threshold, da < db.

    Scale notes: the only all-to-alls are the (band, band_hash) groupby
    join (bucket sizes bounded by banding) and the verify joins of the
    candidate pairs back to the doc -> shingle Dataset on doc_id — the
    shingle table is shuffled by the join, never collected or broadcast,
    so verification is bounded by the candidate count, not the corpus.
    ``max_bucket_docs`` is a LOUD guard (candidate expansion is
    O(bucket²) and the oracle carries no cap, so an overflowing bucket
    — a giant identical-document cluster — raises rather than silently
    dropping pairs or attempting ~bucket²/2 rows in one task)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    sigs = minhash_signatures(ds, num_perm, shingle_words, concurrency)

    def band_rows(t: pa.Table) -> pa.Table:
        from ..sources import splitmix53

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sig = list_col_matrix(t.column("sig"), dtype=np.int64).astype(np.uint64)
        out_doc, out_band, out_hash = [], [], []
        for bidx in range(bands):
            chunk = sig[:, bidx * rows_per_band : (bidx + 1) * rows_per_band]
            # vectorized splitmix fold over the band's lanes (replaces
            # a per-doc zlib.crc32 Python loop): identical band
            # signatures -> identical bucket, and a 64-bit digest makes
            # spurious bucket collisions (the only way this hash could
            # surface — a collision pair must still pass exact-Jaccard
            # verify AND would only mismatch the oracle if it passed)
            # ~2^32 times rarer than crc32's 32 bits.
            h = np.full(len(chunk), np.uint64(bidx + 1))
            for j in range(rows_per_band):
                h = splitmix53(h ^ chunk[:, j])
            bh = h.astype(np.int64)
            out_doc.append(ids)
            out_band.append(np.full(len(ids), bidx, dtype=np.int64))
            out_hash.append(bh)
        return pa.table(
            {
                "doc_id": np.concatenate(out_doc),
                "band": np.concatenate(out_band),
                "bh": np.concatenate(out_hash),
            }
        )

    # candidate pairs = docs sharing an LSH (band, band-hash) bucket:
    # the same sort + group-complete pair-expansion dataflow as the
    # derive stage, but WITHOUT the (src, dst) dedup-sum sort — the
    # pair weight is unused and duplicate cross-band candidates (at
    # most `bands` copies of a pair) are collapsed inside the attach
    # stage's doc groups instead, saving one full all-to-all.
    buckets = sigs.map_batches(band_rows, batch_format="pyarrow")
    cand = key_grouped_block_map(
        buckets.sort(["band", "bh"]),
        ["band", "bh"],
        make_pair_expander(
            ["band", "bh"], "doc_id", cap=max_bucket_docs, on_overflow="raise"
        ),
    ).map_batches(
        empty_guard(
            lambda t: t.filter(pc.less(t.column("src"), t.column("dst")))
            .select(["src", "dst"])
            .rename_columns(["da", "db"]),
            pa.schema([("da", pa.int64()), ("db", pa.int64())]),
        ),
        batch_format="pyarrow",
    )

    def _shingle_rows(t: pa.Table) -> pa.Table:
        """doc_id -> its sorted distinct shingle hashes, packed as one
        BINARY value of little-endian int64s (Acero hash joins carry
        binary payloads but not list columns)."""
        flat, offs = _batch_shingle_hashes(t.column("text").to_pylist(), shingle_words)
        n = len(t)
        row = np.repeat(np.arange(n), np.diff(offs))
        order = np.lexsort((flat, row))
        r, v = row[order], flat[order]
        keep = np.r_[True, (r[1:] != r[:-1]) | (v[1:] != v[:-1])] if len(r) else np.zeros(0, bool)
        r, v = r[keep], v[keep]
        byte_offs = (np.r_[0, np.cumsum(np.bincount(r, minlength=n))] * 8).astype(np.int32)
        arr = pa.Array.from_buffers(
            pa.binary(),
            n,
            [None, pa.py_buffer(byte_offs.tobytes()),
             pa.py_buffer(v.astype("<i8").tobytes())],
        )
        return pa.table({"doc_id": t.column("doc_id"), "sh": arr})

    return exact_pair_verify(
        ds, cand, threshold=threshold, pack_rows=_shingle_rows
    )


def dedup_clusters(pairs: pa.Table, doc_ids: np.ndarray) -> pa.Table:
    """Union-find over near-dup pairs -> (doc_id, cluster_root). The
    pair list is the SMALL side (post-threshold); at corpus scale this
    is exactly a connected-components run on the dup graph, for which
    fogray.algorithms.connected_components is the distributed path."""
    parent = {int(d): int(d) for d in doc_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(pairs.column("da").to_pylist(), pairs.column("db").to_pylist()):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    return pa.table(
        {
            "doc_id": pa.array(sorted(parent), type=pa.int64()),
            "cluster_root": pa.array([find(d) for d in sorted(parent)], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_batch(t: pa.Table, text_col: str) -> pa.Table:
    """Whole-batch SimHash: tokenize once, md5-hash each DISTINCT token
    once (vocab dedup, the _batch_shingle_hashes pattern), then one
    segmented reduceat accumulates every doc's 64 signed bit-sums — no
    per-doc or per-bit Python. The md5-prefix token hash keeps the whole
    signature DuckDB-expressible (see the module docstring)."""
    texts = t.column(text_col).to_pylist()
    token_lists = [s.split() for s in texts]
    lens = np.fromiter((len(x) for x in token_lists), dtype=np.int64, count=len(texts))
    flat = [w for lst in token_lists for w in lst]
    out = np.zeros(len(texts), dtype=np.uint64)
    if flat:
        uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
        h64 = _md5_u64(uniq)[inv]
        signs = (
            2 * ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            - 1
        )
        offs = np.r_[0, np.cumsum(lens)]
        nonempty = np.flatnonzero(lens > 0)
        acc = np.add.reduceat(signs, offs[nonempty], axis=0)
        pw = np.uint64(1) << np.arange(64, dtype=np.uint64)
        out[nonempty] = ((acc > 0) * pw).sum(axis=1, dtype=np.uint64)
    return pa.table(
        {"doc_id": t.column("doc_id"), "simhash": pa.array(out.astype(np.int64))}
    )


def simhash(ds, text_col: str = "text") -> rd.Dataset:
    return ds.map_batches(
        lambda t: _simhash_batch(t, text_col), batch_format="pyarrow"
    )


def simhash_pairs(ds, *, text_col: str = "text", max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs with Hamming(simhash) <= max_hamming: block by the
    four 16-bit quarters (a pair within distance 3 matches exactly on
    >= 1 quarter — pigeonhole), candidate join per quarter, vectorized
    popcount verify."""
    sh = simhash(ds, text_col).materialize()

    def quarters(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        qs, docs, hs = [], [], []
        for q in range(4):
            qs.append(
                ((h >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.int64)
                + np.int64(q << 16)
            )
            docs.append(ids)
            hs.append(h.astype(np.int64))
        return pa.table(
            {
                "doc_id": np.concatenate(docs),
                "q": np.concatenate(qs),
                "h": np.concatenate(hs),
            }
        )

    qds = sh.map_batches(quarters, batch_format="pyarrow").materialize()
    a = qds.map_batches(
        lambda t: t.rename_columns(["da", "q", "ha"]), batch_format="pyarrow"
    )
    b = qds.map_batches(
        lambda t: t.rename_columns(["db", "q", "hb"]), batch_format="pyarrow"
    )

    def verify(t: pa.Table) -> pa.Table:
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        ha = t.column("ha").to_numpy(zero_copy_only=False).astype(np.uint64)
        hb = t.column("hb").to_numpy(zero_copy_only=False).astype(np.uint64)
        m = da < db
        da, db, ha, hb = da[m], db[m], ha[m], hb[m]
        x = ha ^ hb
        pop = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            pop += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = pop <= max_hamming
        return pa.table(
            {"da": da[keep], "db": db[keep], "hamming": pop[keep]}
        )

    return (
        safe_inner_join(a, b, on=("q",))
        .map_batches(
            empty_guard(
                verify,
                pa.schema(
                    [("da", pa.int64()), ("db", pa.int64()), ("hamming", pa.int64())]
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby(["da", "db"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(
    emb_ds,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_cutoff: int = 100_000,
    num_planes: int = 10,
    num_tables: int = 4,
    seed: int = 11,
) -> rd.Dataset:
    """(va, vb, cos) pairs with cosine >= threshold, va < vb.

    N <= broadcast_cutoff: EXACT — the full normalized matrix is
    broadcast once (ray.put) and every block computes block x corpus
    cosines as one float64 matmul.

    N > broadcast_cutoff: the LSH scale path — ``num_tables``
    independent random-hyperplane bucketings; vectors sharing a bucket
    in ANY table are candidates, verified with the same exact matmul
    kernel per bucket, deduped across tables. Reported cosines are
    exact (precision 1.0); recall is the LSH collision probability
    (1 - (1 - (1 - theta/pi)^planes)^tables per pair — near-identical
    vectors collide with prob -> 1). Dataflow: ONE map_batches expands
    each vector into num_tables (table|bucket key, unit vector) rows,
    ONE sort co-locates buckets into group-complete blocks, pair
    emission is a per-bucket chunked matmul, and a final sort dedups
    pairs found by several tables — no joins, no driver collection."""
    mat_tbl = emb_ds.select_columns([id_col, vec_col]).materialize()
    n_total = mat_tbl.count()
    if n_total > broadcast_cutoff:
        return _lsh_cosine_pairs(
            mat_tbl,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            num_planes=num_planes,
            num_tables=num_tables,
            seed=seed,
        )
    rows = pa.concat_tables(ray.get(mat_tbl.to_arrow_refs()), promote_options="default")
    ids = rows.column(id_col).to_numpy(zero_copy_only=False)
    vecs = list_col_matrix(rows.column(vec_col))
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    ref = ray.put((ids, unit))

    def block_pairs(t: pa.Table) -> pa.Table:
        all_ids, all_unit = ray.get(ref)
        bids = t.column(id_col).to_numpy(zero_copy_only=False)
        bvec = list_col_matrix(t.column(vec_col))
        bn = np.linalg.norm(bvec, axis=1)
        bn[bn == 0] = 1.0
        bunit = bvec / bn[:, None]
        cos = bunit @ all_unit.T
        bi, aj = np.nonzero((cos >= threshold) & (bids[:, None] < all_ids[None, :]))
        return pa.table(
            {
                "va": bids[bi],
                "vb": all_ids[aj],
                "cos": sql_round(cos[bi, aj]),
            }
        )

    return mat_tbl.map_batches(block_pairs, batch_format="pyarrow")


def _lsh_cosine_pairs(
    mat_tbl,
    *,
    threshold: float,
    id_col: str,
    vec_col: str,
    num_planes: int,
    num_tables: int,
    seed: int,
) -> rd.Dataset:
    """The bucketed scale path of :func:`embedding_cosine_pairs` — see
    its docstring for the dataflow and recall contract."""

    class Expander:
        """Stateful stage: the num_tables plane matrices are drawn once
        per actor from the fixed seed; __call__ emits each vector's
        (key, unit vector) row per table in one vectorized pass."""

        def __init__(self, dim_hint=None):
            self.planes = None

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            vecs = list_col_matrix(t.column(vec_col))
            if self.planes is None:
                rng = np.random.RandomState(seed)
                self.planes = [
                    rng.standard_normal((vecs.shape[1], num_planes))
                    for _ in range(num_tables)
                ]
            n = np.linalg.norm(vecs, axis=1)
            n[n == 0] = 1.0
            unit = vecs / n[:, None]
            keys, out_ids = [], []
            pw = 1 << np.arange(num_planes, dtype=np.int64)
            for ti, pl in enumerate(self.planes):
                bucket = (((unit @ pl) > 0) * pw).sum(axis=1).astype(np.int64)
                keys.append(bucket + np.int64(ti << num_planes))
                out_ids.append(ids)
            reps = num_tables
            flat_unit = np.tile(unit, (reps, 1))
            return pa.table(
                {
                    "key": np.concatenate(keys),
                    "vid": np.concatenate(out_ids),
                    "unit": pa.array(
                        flat_unit.tolist(), type=pa.list_(pa.float64())
                    ),
                }
            )

    expanded = mat_tbl.map_batches(
        Expander, concurrency=(1, _join_parts()), batch_format="pyarrow"
    )

    empty_pairs = pa.schema(
        [("va", pa.int64()), ("vb", pa.int64()), ("cos", pa.float64())]
    )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_pairs.empty_table()
        key = t.column("key").to_numpy(zero_copy_only=False)
        vid = t.column("vid").to_numpy(zero_copy_only=False)
        unit = list_col_matrix(t.column("unit"))
        order = np.argsort(key, kind="stable")
        key, vid, unit = key[order], vid[order], unit[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], len(key)]
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            gu, gv = unit[s:e], vid[s:e]
            # chunk rows so the cos temp stays ~256 MB even in hot buckets
            chunk = max(1, int((1 << 25) // max(m, 1)))
            for c0 in range(0, m, chunk):
                c1 = min(c0 + chunk, m)
                cos = gu[c0:c1] @ gu.T
                ai, bj = np.nonzero(
                    (cos >= threshold) & (gv[c0:c1, None] < gv[None, :])
                )
                out_a.append(gv[c0:c1][ai])
                out_b.append(gv[bj])
                out_c.append(cos[ai, bj])
        if not out_a:
            return empty_pairs.empty_table()
        return pa.table(
            {
                "va": np.concatenate(out_a),
                "vb": np.concatenate(out_b),
                "cos": sql_round(np.concatenate(out_c)),
            }
        )

    pairs = key_grouped_block_map(expanded.sort("key"), ["key"], bucket_pairs)
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return rd.from_arrow(empty_pairs.empty_table())

    def dedup_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_pairs.empty_table()
        a = t.column("va").to_numpy(zero_copy_only=False)
        b = t.column("vb").to_numpy(zero_copy_only=False)
        c = t.column("cos").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, c = a[order], b[order], c[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table({"va": a[first], "vb": b[first], "cos": c[first]})

    return key_grouped_block_map(pairs.sort(["va", "vb"]), ["va", "vb"], dedup_pairs)


def hyperplane_buckets(emb_ds, *, num_planes: int = 12, seed: int = 11,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Random-hyperplane LSH bucket id per vector — the scale path for
    cosine near-dup: vectors sharing a bucket are the only candidate
    pairs (run :func:`embedding_cosine_pairs`'s kernel per bucket)."""

    class Bucketer:
        def __init__(self):
            rng = np.random.RandomState(seed)
            self.planes = None
            self.rng = rng

        def __call__(self, t: pa.Table) -> pa.Table:
            vecs = list_col_matrix(t.column(vec_col))
            if self.planes is None:
                self.planes = np.random.RandomState(seed).standard_normal(
                    (vecs.shape[1], num_planes)
                )
            bits = (vecs @ self.planes) > 0
            bucket = (bits * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)
            return pa.table(
                {"vec_id": t.column(id_col), "bucket": pa.array(bucket)}
            )

    return emb_ds.map_batches(Bucketer, concurrency=(1, 2), batch_format="pyarrow")


def span_overlap(ds, *, n_words: int = 3, id_col: str = "doc_id",
                 text_col: str = "text") -> rd.Dataset:
    """Cross-doc n-gram duplication signal: for each doc, the fraction
    of its DISTINCT word ``n_words``-grams that appear in at least one
    OTHER document. Complements the within-doc repetition ratio
    (:func:`fogray.datapipes.text.repetition`) — high ``shared_frac``
    flags boilerplate / mirrored spans the exact-dedup pass misses.

    Scale shape: docs never meet each other — stage 1 ships only
    distinct (shingle-hash, doc_id) pairs (16 bytes/row); stage 2 is a
    group-complete pass over the sh-sorted pairs that counts docs per
    shingle AND pre-aggregates per-doc partials inside the block, so
    the second exchange carries one row per (block, doc), not per
    shingle; stage 3 sums partials per doc. Two narrow sorts total, no
    joins. Shingle hash = the md5-seeded Karp-Rabin roll, so DuckDB
    reproduces it exactly (oracle `dd_span_overlap`).

    -> (id_col, n_shingles, n_shared, shared_frac) for docs with >= 1
    shingle.
    """
    from .packing import _doc_distinct_shingles

    proj = ds.select_columns([id_col, text_col])

    def pairs_block(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        f, d = _doc_distinct_shingles(texts, n_words)
        return pa.table(
            {
                "sh": pa.array(f, pa.uint64()),
                id_col: pa.array(ids[d].astype(np.int64)),
            }
        )

    pairs = proj.map_batches(pairs_block, batch_format="pyarrow")

    def per_sh_block(t: pa.Table) -> pa.Table:
        sh = t.column("sh").to_numpy(zero_copy_only=False)
        doc = t.column(id_col).to_numpy(zero_copy_only=False)
        # group size per shingle ((sh, doc) rows are already distinct)
        _, inv, cnt = np.unique(sh, return_inverse=True, return_counts=True)
        shared = cnt[inv] >= 2
        udoc, dinv = np.unique(doc, return_inverse=True)
        return pa.table(
            {
                id_col: pa.array(udoc),
                "n_sh": pa.array(np.bincount(dinv, minlength=len(udoc)).astype(np.int64)),
                "n_shared": pa.array(
                    np.bincount(dinv, weights=shared, minlength=len(udoc)).astype(np.int64)
                ),
            }
        )

    partials = key_grouped_block_map(pairs.sort("sh"), ["sh"], per_sh_block)

    def per_doc_block(t: pa.Table) -> pa.Table:
        doc = t.column(id_col).to_numpy(zero_copy_only=False)
        n_sh = t.column("n_sh").to_numpy(zero_copy_only=False)
        n_shared = t.column("n_shared").to_numpy(zero_copy_only=False)
        udoc, dinv = np.unique(doc, return_inverse=True)
        tot = np.bincount(dinv, weights=n_sh, minlength=len(udoc)).astype(np.int64)
        shr = np.bincount(dinv, weights=n_shared, minlength=len(udoc)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(udoc),
                "n_shingles": pa.array(tot),
                "n_shared": pa.array(shr),
                "shared_frac": pa.array(sql_round(shr / tot), pa.float64()),
            }
        )

    return key_grouped_block_map(partials.sort(id_col), [id_col], per_doc_block)


# ---------------------------------------------------------------------------
# exact all-pairs Jaccard join with prefix filtering (Bayardo et al. 2007)
# ---------------------------------------------------------------------------


def allpairs_jaccard(
    ds,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    shingle_words: int = 3,
    max_token_docs: int = 20_000,
) -> rd.Dataset:
    """EXACT all-pairs shingle-set Jaccard >= ``threshold`` with prefix
    filtering — the scalable replacement for the O(docs²)-per-block
    ``jaccard_pairs`` contract: instead of comparing every pair inside
    a block, each doc emits only its ``|d| - ceil(t·|d|) + 1`` RAREST
    items (global (df, hash) order), and completeness is the classic
    prefix-filter lemma: the globally rarest item of A∩B must sit in
    BOTH prefixes, else the suffix (< t·|A| items) couldn't contain an
    intersection of size >= t·|A|. Candidates meet in ONE sort by
    prefix item (rare-first ordering keeps groups tiny; an item whose
    prefix group exceeds ``max_token_docs`` raises LOUDLY — same
    contract as the LSH bucket guard), then the shared
    :func:`exact_pair_verify` sort-join computes exact Jaccard. Items
    are ``shingle_words``-word Karp-Rabin shingles (the MinHash item
    domain — single tokens don't discriminate on small vocabularies).

    -> Dataset (da, db, jaccard), da < db."""

    def doc_token_hashes(t: pa.Table):
        """(sorted distinct per-doc shingle hashes flat, lens)."""
        texts = t.column(text_col).to_pylist()
        cache: dict = {}
        flat_all, offs = _batch_shingle_hashes(texts, shingle_words, cache)
        outs = [
            np.unique(flat_all[offs[i] : offs[i + 1]]) for i in range(len(texts))
        ]
        lens = np.array([len(o) for o in outs], dtype=np.int64)
        flat = (
            np.concatenate(outs) if outs else np.empty(0, np.uint64)
        )
        # bit-exact reinterpret (values >= 2^63 must not overflow-check)
        return flat.astype(np.uint64).view(np.int64), lens

    # pass 1: token document frequencies (distinct per doc), pre-combined
    df_schema = pa.schema([("tok", pa.int64()), ("df", pa.int64())])

    def df_partial(t: pa.Table) -> pa.Table:
        flat, lens = doc_token_hashes(t)
        if not len(flat):
            return df_schema.empty_table()
        uk, c = np.unique(flat, return_counts=True)
        return pa.table({"tok": uk, "df": c.astype(np.int64)}, schema=df_schema)

    from ..util import collect_tables

    dft = collect_tables(
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok")
        .sum("df"),
        pa.schema([("tok", pa.int64()), ("sum(df)", pa.int64())]),
    )
    toks = dft.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    dfs = dft.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(toks, kind="stable")
    toks, dfs = toks[o], dfs[o]
    # global rank: rare-first (df ASC, hash ASC); rank array aligned to
    # the hash-sorted vocab for searchsorted mapping
    rank_of = np.empty(len(toks), dtype=np.int64)
    rank_of[np.lexsort((toks, dfs))] = np.arange(len(toks), dtype=np.int64)
    vocab_ref = ray.put((toks, rank_of))

    pre_schema = pa.schema([("rk", pa.int64()), ("doc_id", pa.int64())])

    def prefix_rows(t: pa.Table) -> pa.Table:
        vt, vr = ray.get(vocab_ref)
        flat, lens = doc_token_hashes(t)
        if not len(flat):
            return pre_schema.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        rks = vr[np.searchsorted(vt, flat)]
        row = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        order = np.lexsort((rks, row))
        row_s, rk_s = row[order], rks[order]
        starts = np.flatnonzero(np.r_[True, row_s[1:] != row_s[:-1]])
        sizes = np.diff(np.r_[starts, len(row_s)])
        plen = sizes - np.ceil(threshold * sizes).astype(np.int64) + 1
        pos = np.arange(len(row_s), dtype=np.int64) - np.repeat(starts, sizes)
        keep = pos < np.repeat(plen, sizes)
        return pa.table(
            {
                "rk": rk_s[keep],
                "doc_id": ids[row_s[keep]].astype(np.int64),
            },
            schema=pre_schema,
        )

    prefixes = ds.map_batches(prefix_rows, batch_format="pyarrow")
    cand = key_grouped_block_map(
        prefixes.sort(["rk", "doc_id"]),
        ["rk"],
        make_pair_expander(["rk"], "doc_id", cap=max_token_docs, on_overflow="raise"),
    ).map_batches(
        empty_guard(
            lambda t: t.filter(pc.less(t.column("src"), t.column("dst")))
            .select(["src", "dst"])
            .rename_columns(["da", "db"]),
            pa.schema([("da", pa.int64()), ("db", pa.int64())]),
        ),
        batch_format="pyarrow",
    )

    def pack_rows(t: pa.Table) -> pa.Table:
        flat, lens = doc_token_hashes(t)
        byte_offs = (np.r_[0, np.cumsum(lens)] * 8).astype(np.int32)
        arr = pa.Array.from_buffers(
            pa.binary(),
            len(t),
            [None, pa.py_buffer(byte_offs.tobytes()),
             pa.py_buffer(flat.astype("<i8").tobytes())],
        )
        return pa.table({"doc_id": t.column("doc_id"), "sh": arr})

    return exact_pair_verify(ds, cand, threshold=threshold, pack_rows=pack_rows)
