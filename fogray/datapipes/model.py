"""Learned-model featurization: a hashed bag-of-tokens logistic quality
scorer, trained with distributed partial-gradient supersteps and
deployed as a weights-in-``__init__`` actor-pool inference stage — the
missing "model scoring" stage of a training-data pipeline (the decode
stub in multimodal.py and LangId in text.py establish the actor-pool
shape; this one carries real trained weights and a real batched forward
pass).

Exactness discipline (what makes the driver/SQL gate possible):

- **Fixed-point training.** Weights are int64 micro-units (1e-6).
  Every per-doc gradient contribution is quantized to micro ints, so
  block partials accumulate with EXACT integer addition — training is
  bit-identical under any partitioning, and the distributed trainer
  (:func:`train_distributed`, raw tasks over pinned block refs, the
  msf/coloring superstep pattern) equals the pure-numpy replica
  (:func:`train_local`) weight-for-weight. The learning-rate step is
  integer floor division.
- **Hardware-exact logistic.** The squashing function is the algebraic
  sigmoid p = 0.5 + 0.5·z/(1+|z|) — only IEEE +,*,/ ops, so numpy and
  DuckDB produce the same double bit-for-bit (libm ``exp`` does not
  guarantee that across implementations).
- **md5 feature hashing.** bucket = int(md5(token)[:8], 16) % DIM,
  mirrored by DuckDB ``CAST(('0x' || substr(md5(tok),1,8)) AS
  UBIGINT) % DIM`` — the established SQL-reproducible hash of the
  sketches family.

The model is trained offline on a deterministic synthetic corpus
(:func:`make_training_docs`, varying stopword density; labels y = 1 iff
5·n_stopwords >= n_tokens) and deployed to score the documents table —
the realistic train-once / score-the-corpus shape. The SQL oracle reads
the exported weight table from parquet and replays the forward pass.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..util import list_col_matrix, sql_round
from .text import STOPWORDS

#: hashed feature buckets (bias lives at index DIM)
DIM = 64
#: fixed-point scale: weights / gradients quantize to 1e-6
MICRO = 1_000_000
#: full-batch gradient-descent rounds
ITERS = 24

_SCORE_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("logit_micro", pa.int64()), ("score", pa.float64())]
)


def _token_buckets(words: np.ndarray) -> np.ndarray:
    """md5 bucket per token — hashed over DISTINCT tokens only (the
    per-block vocabulary), then gathered back through the inverse."""
    uniq, inv = np.unique(words, return_inverse=True)
    ub = np.fromiter(
        (int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % DIM for w in uniq),
        dtype=np.int64,
        count=len(uniq),
    )
    return ub[inv]


def _features(t: pa.Table, text_col: str = "text"):
    """(doc_ids, X[B, DIM] int64 bucket counts, n_tok, n_stop) for one
    batch — one vectorized pass over the lowercase whitespace tokens
    (empty split artifacts dropped, as everywhere in text.py)."""
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    txt = t.column(text_col).combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(txt), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]
    doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(offs))
    keep = words != ""
    words, doc_idx = words[keep], doc_idx[keep]
    X = np.zeros((len(ids), DIM), dtype=np.int64)
    n_tok = np.bincount(doc_idx, minlength=len(ids))
    n_stop = np.zeros(len(ids), dtype=np.int64)
    if len(words):
        np.add.at(X, (doc_idx, _token_buckets(words)), 1)
        is_stop = np.isin(words, np.asarray(STOPWORDS))
        n_stop = np.bincount(doc_idx[is_stop], minlength=len(ids))
    return ids, X, n_tok.astype(np.int64), n_stop.astype(np.int64)


def _labels(n_tok: np.ndarray, n_stop: np.ndarray) -> np.ndarray:
    """Weak-supervision quality label: 1 iff stopword density >= 0.2
    (integer comparison — no float threshold)."""
    return ((5 * n_stop >= n_tok) & (n_tok > 0)).astype(np.int64)


def _forward(X: np.ndarray, w_micro: np.ndarray):
    """(logit_micro int64, p double) — z is exact int64, p uses the
    algebraic sigmoid (IEEE-exact, see module docstring)."""
    z_micro = X @ w_micro[:DIM] + w_micro[DIM]
    z = z_micro / float(MICRO)
    p = 0.5 + 0.5 * z / (1.0 + np.abs(z))
    return z_micro, p


def _grad_partial(t: pa.Table, w_ref) -> pa.Table:
    """One block's exact-integer gradient partial: g[b] = Σ_docs
    rint((p - y)·MICRO)·cnt_b, bias at index DIM, plus the quantized
    squared-error loss partial — a single row, mergeable by int sum."""
    w = ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else np.asarray(w_ref)
    if t.num_rows == 0:
        g = np.zeros(DIM + 1, dtype=np.int64)
        return pa.table(
            {"g": pa.array([g.tolist()], pa.list_(pa.int64())),
             "loss_micro": pa.array([0], pa.int64()),
             "n": pa.array([0], pa.int64())}
        )
    _, X, n_tok, n_stop = _features(t)
    y = _labels(n_tok, n_stop)
    _, p = _forward(X, w)
    e_micro = np.rint((p - y) * MICRO).astype(np.int64)
    g = np.empty(DIM + 1, dtype=np.int64)
    g[:DIM] = X.T @ e_micro
    g[DIM] = int(e_micro.sum())
    loss = int(np.rint((p - y) ** 2 * MICRO).astype(np.int64).sum())
    return pa.table(
        {"g": pa.array([g.tolist()], pa.list_(pa.int64())),
         "loss_micro": pa.array([loss], pa.int64()),
         "n": pa.array([len(y)], pa.int64())}
    )


def _apply_update(w: np.ndarray, G: np.ndarray, n: int) -> np.ndarray:
    """lr = 0.125/n full-batch step in integer arithmetic (floor div;
    the largest power-of-two rate with monotone loss on the training
    corpus — lr=0.5/n oscillates on the heavy stopword buckets)."""
    return w - G // (8 * max(n, 1))


def train_local(docs: pa.Table, iters: int = ITERS):
    """Pure-numpy replica of the distributed trainer — identical
    fixed-point arithmetic, so weights match bit-for-bit. Returns
    (w_micro[DIM+1], loss_history)."""
    _, X, n_tok, n_stop = _features(docs)
    y = _labels(n_tok, n_stop)
    w = np.zeros(DIM + 1, dtype=np.int64)
    hist = []
    for _ in range(iters):
        _, p = _forward(X, w)
        e_micro = np.rint((p - y) * MICRO).astype(np.int64)
        G = np.empty(DIM + 1, dtype=np.int64)
        G[:DIM] = X.T @ e_micro
        G[DIM] = int(e_micro.sum())
        hist.append(int(np.rint((p - y) ** 2 * MICRO).astype(np.int64).sum()))
        w = _apply_update(w, G, len(y))
    return w, hist


def train_distributed(docs_ds, iters: int = ITERS):
    """Full-batch GD as partial-gradient supersteps: doc blocks pinned
    once (``to_arrow_refs``), each round broadcasts the O(DIM) weight
    vector via ``ray.put`` and folds exact-int partials — per-round
    exchange is blocks × (DIM+1) ints, independent of corpus size.
    Returns (w_micro, loss_history), bit-identical to train_local."""
    refs = docs_ds.materialize().to_arrow_refs()
    task = ray.remote(_grad_partial)
    w = np.zeros(DIM + 1, dtype=np.int64)
    hist = []
    for _ in range(iters):
        w_ref = ray.put(w)
        tabs = [
            t
            for t in ray.get([task.remote(r, w_ref) for r in refs])
            if t.num_rows > 0 and t.num_columns > 0
        ]
        G = np.zeros(DIM + 1, dtype=np.int64)
        loss = 0
        n = 0
        for t in tabs:
            G += list_col_matrix(t.column("g"), dtype=np.int64).sum(axis=0)
            loss += int(pc.sum(t.column("loss_micro")).as_py() or 0)
            n += int(pc.sum(t.column("n")).as_py() or 0)
        hist.append(loss)
        w = _apply_update(w, G, n)
    return w, hist


class QualityScorer:
    """Actor-pool inference stage: weights fetched ONCE per actor in
    ``__init__`` (pass ``ray.put(w)`` via fn_constructor_kwargs),
    ``__call__`` is one int64 matmul + the algebraic sigmoid per batch."""

    def __init__(self, weights):
        self.w = (
            ray.get(weights)
            if isinstance(weights, ray.ObjectRef)
            else np.asarray(weights, dtype=np.int64)
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SCORE_SCHEMA.empty_table()
        ids, X, _, _ = _features(t)
        z_micro, p = _forward(X, self.w)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "logit_micro": pa.array(z_micro.astype(np.int64), pa.int64()),
                "score": pa.array(sql_round(p), pa.float64()),
            },
            schema=_SCORE_SCHEMA,
        )


def model_scores(docs_ds, w_micro, *, concurrency: int = 4):
    """Score every document with the trained model — the batched
    featurization stage. -> Dataset (doc_id, logit_micro, score)."""
    return docs_ds.map_batches(
        QualityScorer,
        fn_constructor_kwargs={"weights": ray.put(np.asarray(w_micro, np.int64))},
        concurrency=(1, concurrency),
        batch_format="pyarrow",
    )


def make_training_docs(n: int = 300, seed: int = 7) -> pa.Table:
    """Deterministic synthetic labeled corpus: stopword density ramps
    across docs, content words drawn from a 500-word vocab — the
    offline training set the scorer ships with (fixed (n, seed) =>
    fixed weights everywhere)."""
    rng = np.random.RandomState(seed)
    stops = list(STOPWORDS)
    texts = []
    for i in range(n):
        length = 20 + (i * 7) % 80
        stop_p = 0.05 + (i % 10) * 0.05
        is_stop = rng.random_sample(length) < stop_p
        stop_pick = rng.randint(0, len(stops), size=length)
        word_pick = rng.randint(0, 500, size=length)
        toks = [
            stops[stop_pick[j]] if is_stop[j] else f"w{word_pick[j]}"
            for j in range(length)
        ]
        texts.append(" ".join(toks))
    return pa.table(
        {"doc_id": np.arange(n, dtype=np.int64), "text": pa.array(texts, pa.string())}
    )
