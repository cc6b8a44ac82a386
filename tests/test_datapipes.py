"""Tests for fogray.datapipes: DuckDB conformance for the SQL-oracled
queries, pure-Python oracles for the rest, planted-duplicate recall for
the dedup family, and recall bounds for IVF ANN."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders",
              "customer", "nation", "part"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    ["txt_stats", "txt_fingerprint", "txt_langid", "txt_langid_eval", "txt_quality",
     "txt_top_tokens", "txt_bpe_pairs", "corpus_mix_weights",
     "txt_cms_tokens", "txt_unigram_nll", "txt_tfidf", "agg_hll_users", "agg_hll_by_type", "agg_window_hll", "dd_exact",
     "dd_ngram_jaccard", "dd_minhash_lsh", "dd_simhash", "dd_cluster",
     "dd_incremental", "feat_assemble",
     "dd_embed_cosine", "ann_topk", "ann_range", "ann_recall", "ann_ivf", "emb_kmeans", "mm_features",
     "mm_frames",
     "rel_topk",
     "rel_sample", "rel_stratified", "rel_join_revenue", "rel_quantiles",
     "rel_group_quantiles", "rel_pivot", "corpus_curate",
     "agg_histogram", "evt_window", "evt_sliding", "evt_asof",
     "evt_range", "evt_sessions", "evt_user_stats", "evt_funnel", "evt_late", "rel_anti", "feat_target_encode", "corpus_select", "evt_ab_test",
     "txt_repetition", "txt_pii_scrub", "txt_chunk", "emb_gram", "emb_pca", "dd_span_overlap", "rel_zscore", "rel_diff",
     "evt_transitions", "evt_retention", "txt_bigram_lm", "rel_split",
     "rel_ntile", "evt_rolling", "evt_rolling_median", "sink_partitioned", "txt_pmi", "rel_rollup",
     "rel_weighted", "rel_corr", "agg_kmv_users", "evt_mode", "evt_ewma",
     "txt_entropy", "rel_interp_quantiles", "evt_window_topk",
     "rel_unpivot", "evt_latest", "txt_bigram_nll", "rel_minmax",
     "txt_hapax", "corpus_stats",
     "evt_cumsum", "rel_skyline", "rel_cube", "rel_mad", "emb_knn_cc",
     "rel_top_share", "rel_gini", "evt_bursts", "agg_hll_setops",
     "sink_jsonl", "corpus_e2e", "dd_allpairs", "txt_model_score",
     "txt_bpe_train", "evt_coaction_cc", "dq_checks"],
)
def test_datapipes_query_matches_oracle(ray_session, con, name):
    from fogray.datapipes import queries as dq

    got = normalize(dq.QUERIES[name](SF_DIR).to_pandas())
    want = normalize(con.execute(dq.ORACLE_SQL[name]).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


# ---------------------------------------------------------------------------
# synthetic corpora with planted duplicates
# ---------------------------------------------------------------------------


def _docs_table():
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long tune about rivers mountains and the endless open road ahead"
    )
    near = base.replace("lazy", "sleepy")  # one token differs
    other = (
        "completely different content about compilers registers allocation "
        "and the joys of undefined behavior in systems programming land"
    )
    rows = {
        "doc_id": list(range(6)),
        "text": [base, base, near, other, other + " extra token", "tiny text"],
        "source": ["s0"] * 6,
    }
    return pa.table(rows)


def test_exact_dedup_planted(ray_session):
    import ray.data as rd

    from fogray.datapipes import dedup

    out = dedup.exact_dedup(rd.from_arrow(_docs_table())).to_pandas()
    canon = dict(zip(out["doc_id"], out["canonical_id"]))
    assert canon[0] == 0 and canon[1] == 0  # exact dup pair
    assert canon[2] == 2 and canon[3] == 3 and canon[4] == 4


def test_jaccard_pairs_block_guard(ray_session):
    """A block past max_block_docs must FAIL LOUDLY (the docs^2 kernel
    is the operator's documented bound), not attempt the matrix."""
    import ray.data as rd

    from fogray.datapipes import dedup

    n = 64
    t = pa.table(
        {
            "doc_id": list(range(n)),
            "text": [f"token{i} shared words here" for i in range(n)],
            "source": ["hot"] * n,  # ONE hot block
        }
    )
    ds = dedup.jaccard_pairs(
        rd.from_arrow(t), block_col="source", threshold=0.5, max_block_docs=16
    )
    with pytest.raises(Exception, match="max_block_docs"):
        ds.materialize()


def test_lsh_bucket_guard_raises():
    """make_pair_expander(on_overflow="raise"): an over-cap group must
    raise with the bound (the minhash_lsh_pairs bucket guard), not
    silently drop its pairs."""
    from fogray.derive import make_pair_expander

    n = 40
    t = pa.table(
        {
            "band": np.zeros(n, dtype=np.int64),
            "bh": np.zeros(n, dtype=np.int64),
            "doc_id": np.arange(n, dtype=np.int64),
        }
    )
    expand = make_pair_expander(["band", "bh"], "doc_id", cap=8, on_overflow="raise")
    with pytest.raises(ValueError, match="cap=8"):
        expand(t)
    # default drop mode: same input silently yields no pairs
    drop = make_pair_expander(["band", "bh"], "doc_id", cap=8)
    assert drop(t).num_rows == 0


def test_jaccard_pairs_vs_oracle(ray_session):
    import ray.data as rd

    from fogray.datapipes import dedup

    t = _docs_table()
    got = (
        dedup.jaccard_pairs(rd.from_arrow(t), block_col="source", threshold=0.5)
        .to_pandas()
        .sort_values(["da", "db"])
        .reset_index(drop=True)
    )
    # pandas oracle
    df = t.to_pandas()
    sets = {r.doc_id: set(r.text.split()) for r in df.itertuples()}
    rows = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= 0.5:
                rows.append((a, b, round(j, 6)))
    want = pd.DataFrame(rows, columns=["da", "db", "jaccard"])
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)
    # the exact-dup pair and both near-dup pairs are found
    pairs = set(zip(got["da"], got["db"]))
    assert (0, 1) in pairs and (0, 2) in pairs and (3, 4) in pairs


def test_minhash_lsh_finds_planted(ray_session):
    import ray.data as rd

    from fogray.datapipes import dedup

    ds = rd.from_arrow(_docs_table())
    out = dedup.minhash_lsh_pairs(
        ds, num_perm=32, bands=8, shingle_words=3, threshold=0.5
    ).to_pandas()
    pairs = set(zip(out["da"], out["db"]))
    assert (0, 1) in pairs  # identical docs always collide
    # jaccard values are EXACT (verification step), so (0,1) == 1.0
    j01 = out.set_index(["da", "db"]).loc[(0, 1), "jaccard"]
    assert j01 == 1.0
    # determinism
    out2 = dedup.minhash_lsh_pairs(
        ds, num_perm=32, bands=8, shingle_words=3, threshold=0.5
    ).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["da", "db"]).reset_index(drop=True),
        out2.sort_values(["da", "db"]).reset_index(drop=True),
    )


def test_minhash_signature_estimates_jaccard():
    from fogray.datapipes.dedup import MinHasher, _doc_shingles

    mh = MinHasher(num_perm=128, shingle_words=2)
    a = "w" + " w".join(str(i) for i in range(200))
    b = "w" + " w".join(str(i) for i in range(100, 300))
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    xa, xb = _doc_shingles(a, 2), _doc_shingles(b, 2)
    true = len(np.intersect1d(xa, xb)) / len(np.union1d(xa, xb))
    assert abs(est - true) < 0.15


def test_simhash_near_pairs(ray_session):
    import ray.data as rd

    from fogray.datapipes import dedup

    out = dedup.simhash_pairs(rd.from_arrow(_docs_table()), max_hamming=8).to_pandas()
    pairs = set(zip(out["da"], out["db"]))
    assert (0, 1) in pairs
    h01 = out.set_index(["da", "db"]).loc[(0, 1), "hamming"]
    assert h01 == 0  # identical text -> identical simhash
    # one-token change stays within a small hamming distance
    assert (0, 2) in pairs


def test_dedup_clusters():
    from fogray.datapipes.dedup import dedup_clusters

    pairs = pa.table({"da": [0, 2, 5], "db": [1, 0, 6], "jaccard": [1.0, 0.9, 0.8]})
    out = dedup_clusters(pairs, np.arange(8)).to_pandas()
    root = dict(zip(out["doc_id"], out["cluster_root"]))
    assert root[0] == root[1] == root[2] == 0
    assert root[5] == root[6] == 5
    assert root[3] == 3 and root[7] == 7


def test_embedding_cosine_pairs_vs_brute(ray_session):
    import ray.data as rd

    from fogray.datapipes import dedup

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    vecs[10] = vecs[4] + 0.01 * rng.standard_normal(16)  # planted near-dup
    t = pa.table(
        {
            "vec_id": np.arange(60, dtype=np.int64),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )
    out = dedup.embedding_cosine_pairs(rd.from_arrow(t), threshold=0.9).to_pandas()
    u = vecs.astype(np.float64)
    u /= np.linalg.norm(u, axis=1)[:, None]
    cos = u @ u.T
    want = {(a, b) for a in range(60) for b in range(a + 1, 60) if cos[a, b] >= 0.9}
    assert set(zip(out["va"], out["vb"])) == want
    assert (4, 10) in want


def test_ann_bruteforce_matches_numpy(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(4)
    vecs = rng.standard_normal((80, 12)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": np.arange(80, dtype=np.int64),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )
    from fogray.datapipes import similarity

    qids = np.arange(3)
    out = similarity.ann_topk_bruteforce(
        rd.from_arrow(t), qids, vecs[:3], k=5
    ).to_pandas()
    u = vecs.astype(np.float64)
    u /= np.linalg.norm(u, axis=1)[:, None]
    for q in qids:
        scores = u @ u[q]
        scores[q] = -np.inf
        top = np.argsort(-scores, kind="stable")[:5]
        got = out[out["qid"] == q]["nid"].to_numpy()
        assert set(got) == set(top)


def test_ann_ivf_recall_on_clusters(ray_session):
    import ray.data as rd

    from fogray.datapipes import similarity

    rng = np.random.RandomState(9)
    centers = rng.standard_normal((8, 16)) * 5
    vecs = np.vstack(
        [centers[i % 8] + 0.3 * rng.standard_normal(16) for i in range(400)]
    ).astype(np.float32)
    t = pa.table(
        {
            "vec_id": np.arange(400, dtype=np.int64),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t)
    qids = np.arange(5)
    brute = similarity.ann_topk_bruteforce(ds, qids, vecs[:5], k=10).to_pandas()
    ivf = similarity.ann_topk_ivf(ds, qids, vecs[:5], k=10, nlist=8, nprobe=3).to_pandas()
    recalls = []
    for q in qids:
        bt = set(brute[brute["qid"] == q]["nid"])
        it = set(ivf[ivf["qid"] == q]["nid"])
        recalls.append(len(bt & it) / len(bt))
    assert np.mean(recalls) >= 0.7, recalls


def _knn_cluster_corpus(n=400, nc=8, dim=16, seed=9):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((nc, dim)) * 5
    vecs = np.vstack(
        [centers[i % nc] + 0.3 * rng.standard_normal(dim) for i in range(n)]
    ).astype(np.float32)
    return pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        }
    )


def test_knn_graph_ivf_exhaustive_equals_bruteforce(ray_session):
    """The IVF-cell dataflow with nprobe == nlist probes every cell, so
    it must equal the exact brute-force kNN graph bit-for-bit — the
    exactness gate on the scale path's plumbing (expansion, cell
    grouping, per-cell top-k, qid merge)."""
    import ray.data as rd

    from fogray.datapipes import similarity

    t = _knn_cluster_corpus()
    ds = rd.from_arrow(t)
    exact = (
        similarity.knn_graph(ds, k=5, broadcast_cutoff=1 << 40)
        .to_pandas()
        .sort_values(["qid", "nid"])
        .reset_index(drop=True)
    )
    scale = (
        similarity.knn_graph(ds, k=5, broadcast_cutoff=0, nlist=8, nprobe=8)
        .to_pandas()
        .sort_values(["qid", "nid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, scale, check_dtype=False, atol=0, rtol=0)


def test_knn_graph_ivf_recall_at_boundary(ray_session):
    """Pruned probing (nprobe < nlist) on a clustered corpus keeps high
    edge recall vs the exact graph — the contract q_emb_knn_cc relies
    on above the broadcast cutoff."""
    import ray.data as rd

    from fogray.datapipes import similarity

    t = _knn_cluster_corpus()
    ds = rd.from_arrow(t)
    exact = similarity.knn_graph(ds, k=5, broadcast_cutoff=1 << 40).to_pandas()
    pruned = similarity.knn_graph(
        ds, k=5, broadcast_cutoff=0, nlist=8, nprobe=3
    ).to_pandas()
    bt = set(zip(exact["qid"], exact["nid"]))
    it = set(zip(pruned["qid"], pruned["nid"]))
    assert len(bt & it) / len(bt) >= 0.7, len(bt & it) / len(bt)


def _greedy_merge_once(syms, x, y):
    """Reference greedy BPE merge application: one left-to-right pass
    over the symbol list, merging non-overlapping (x, y) pairs."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_replace_fixpoint_equals_greedy_merge():
    """The spaced-string encoding's correctness keystone: iterating the
    leftmost-nonoverlapping literal replace ' x y ' -> ' xy ' to its
    fixpoint must equal the per-symbol greedy merge — including the
    tricky overlapping-run cases ('l l l l', 'x y x y', ...) where a
    single replace pass under-merges because it consumes the trailing
    separator. Exhaustive over random symbol runs."""
    rng = np.random.RandomState(11)
    alphabet = ["x", "y", "l", "ab"]
    for trial in range(300):
        k = rng.randint(1, 10)
        syms = [alphabet[j] for j in rng.randint(0, len(alphabet), size=k)]
        x, y = alphabet[rng.randint(0, 3)], alphabet[rng.randint(0, 3)]
        want = _greedy_merge_once(list(syms), x, y)
        s = " " + " ".join(syms) + " "
        pat, rep = f" {x} {y} ", f" {x}{y} "
        while True:
            s2 = s.replace(pat, rep)
            if s2 == s:
                break
            s = s2
        assert s.split() == want, (syms, x, y, s.split(), want)


def test_bpe_train_partition_invariant(ray_session):
    """The merge table must not depend on how the corpus or vocabulary
    is blocked (pair partials fold exactly; replace is per-word)."""
    import ray.data as rd

    from fogray.datapipes import text as T

    docs = pa.table(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": pa.array(
                [
                    "low lower lowest low low",
                    "new newer newest new",
                    "wide wider widest wide wide wide",
                    "low newer low wide",
                    "er er er est est",
                    "lo lo lo low",
                ]
            ),
        }
    )
    a = T.bpe_train(rd.from_arrow(docs), rounds=8).to_pandas()
    b = T.bpe_train(rd.from_arrow(docs).repartition(5), rounds=8).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 8 and (a["n"] > 0).all()
    # a later merge may build on an earlier one (multi-char symbols)
    assert (a["c1"].str.len() + a["c2"].str.len()).max() > 2


def test_model_training_distributed_equals_local(ray_session):
    """Fixed-point training is partition-independent: the distributed
    partial-gradient trainer and the pure-numpy replica must produce
    IDENTICAL int64 weights, and the loss must strictly decrease over
    the early rounds (it's a real training loop, not a stub)."""
    import ray.data as rd

    from fogray.datapipes import model

    docs = model.make_training_docs(200, seed=3)
    w_local, hist_local = model.train_local(docs, iters=12)
    ds = rd.from_arrow(docs).repartition(7)  # uneven blocking on purpose
    w_dist, hist_dist = model.train_distributed(ds, iters=12)
    assert np.array_equal(w_local, w_dist)
    assert hist_local == hist_dist
    assert hist_local[3] < hist_local[0]  # loss actually decreases


def test_model_scorer_actor_pool_scores(ray_session):
    """The inference stage (weights in __init__, batched forward pass)
    agrees with a direct numpy forward pass on the same weights."""
    import ray.data as rd

    from fogray.datapipes import model

    docs = model.make_training_docs(120, seed=5)
    w, _ = model.train_local(docs, iters=8)
    out = (
        model.model_scores(rd.from_arrow(docs), w)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _, X, _, _ = model._features(docs)
    z, p = model._forward(X, w)
    assert np.array_equal(out["logit_micro"].to_numpy(), z)
    from fogray.util import sql_round

    assert np.array_equal(out["score"].to_numpy(), sql_round(p))
    # scores are probabilities and actually separate the label classes
    assert out["score"].between(0, 1).all()


def test_ppm_decode_real_roundtrip(ray_session):
    """synthesize_ppm emits REAL P6 bytes; decode_ppm parses them back
    (magic, dims, maxval, size validation) pixel-exact, and the
    actor-pool stats match a per-image numpy recomputation."""
    import ray.data as rd

    from fogray.datapipes import multimodal

    ids = pa.table({"doc_id": pa.array([0, 5, 17, 123, 2048], pa.int64())})
    ppm = multimodal.synthesize_ppm(rd.from_arrow(ids)).take_all()
    for row in ppm:
        i = row["doc_id"]
        w, h, px = multimodal.decode_ppm(row["payload"])
        assert (w, h) == (8 + i % 9, 8 + i % 7)
        k = np.arange(w * h * 3, dtype=np.int64)
        np.testing.assert_array_equal(px, ((i * 31 + k * 7) % 256).astype(np.uint8))
    # validation is real: corrupt magic / truncated payload must raise
    good = ppm[0]["payload"]
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P5" + good[2:])
    with pytest.raises(ValueError):
        multimodal.decode_ppm(good[:-1])
    stats = (
        multimodal.ppm_decode_stats(rd.from_arrow(ids))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in stats.iterrows():
        i = int(r["doc_id"])
        w, h = 8 + i % 9, 8 + i % 7
        k = np.arange(w * h * 3, dtype=np.int64)
        v = (i * 31 + k * 7) % 256
        assert r["width"] == w and r["height"] == h
        assert r["sum_r"] == v[0::3].sum()
        assert r["sum_g"] == v[1::3].sum()
        assert r["sum_b"] == v[2::3].sum()
        assert r["min_pix"] == v.min() and r["max_pix"] == v.max()


def test_wav_decode_real_roundtrip(ray_session):
    """synthesize_wav emits REAL RIFF/WAVE PCM16 bytes; decode_wav
    validates and parses them sample-exact; corrupt containers raise."""
    import ray.data as rd

    from fogray.datapipes import multimodal

    ids = pa.table({"doc_id": pa.array([0, 3, 64, 777], pa.int64())})
    rows = multimodal.synthesize_wav(rd.from_arrow(ids)).take_all()
    for row in rows:
        i = row["doc_id"]
        rate, samp = multimodal.decode_wav(row["payload"])
        assert rate == 8000
        n = 64 + i % 129
        k = np.arange(n, dtype=np.int64)
        np.testing.assert_array_equal(
            samp.astype(np.int64), (i * 37 + k * 11) % 65536 - 32768
        )
    good = rows[0]["payload"]
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFX" + good[4:])
    with pytest.raises(ValueError):
        multimodal.decode_wav(good[:-2])
    stats = (
        multimodal.wav_decode_stats(rd.from_arrow(ids))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for _, r in stats.iterrows():
        i = int(r["doc_id"])
        n = 64 + i % 129
        v = (i * 37 + np.arange(n, dtype=np.int64) * 11) % 65536 - 32768
        assert r["n_samples"] == n
        assert r["sum_amp"] == v.sum() and r["sum_sq"] == (v * v).sum()
        assert r["min_amp"] == v.min() and r["max_amp"] == v.max()


def test_mm_features_deterministic_and_oracle(ray_session):
    import hashlib

    import ray.data as rd

    from fogray.datapipes import multimodal

    t = _docs_table()
    out = multimodal.media_features(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    out2 = multimodal.media_features(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), out2.reset_index(drop=True))
    # pure-Python oracle for doc 0
    s = t.column("text")[0].as_py()
    seed = hashlib.sha256(s.encode()).digest()
    size = 256 + (len(s) % 1024)
    payload = (seed * (size // len(seed) + 1))[:size]
    w, h = 16 + len(s) % 48, 16 + (len(s) * 7) % 48
    px = multimodal.decode_stub(payload, w, h)
    hist = np.bincount(px.ravel(), minlength=256).astype(np.float64)
    hist /= hist.sum()
    proj = np.random.RandomState(13).standard_normal((256, multimodal.FEATURE_DIM))
    want = hist @ proj
    got = out[out["doc_id"] == 0][[f"feat_{j}" for j in range(8)]].to_numpy()[0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_langid_on_marked_fixture(ray_session):
    import ray.data as rd

    from fogray.datapipes import text as txt

    samples = {
        "en": "the cat and the dog that is going to the park",
        "fr": "le chat et la maison dans le jardin est une merveille",
        "es": "el perro y los gatos es una maravilla que corre",
        "de": "der hund und die katze ist ein schnelles tier",
        "zh": "的学生是在学校和老师",
    }
    rows = {"doc_id": list(range(len(samples))), "text": list(samples.values())}
    out = txt.lang_id(rd.from_arrow(pa.table(rows))).to_pandas().sort_values("doc_id")
    assert list(out["pred_lang"]) == list(samples.keys())


def test_winnow_fingerprints_shared_substrings(ray_session):
    import ray.data as rd

    from fogray.datapipes import text as txt

    a = "abcdefghijklmnopqrstuvwxyz0123456789 shared run of bytes"
    rows = pa.table({"doc_id": [0, 1], "text": [a, "PREFIX " + a]})
    out = txt.winnow_fingerprints(rd.from_arrow(rows)).to_pandas()
    f0 = set(out[out["doc_id"] == 0]["fp"])
    f1 = set(out[out["doc_id"] == 1]["fp"])
    assert f0 and f1
    assert len(f0 & f1) >= 2  # long shared substring -> shared sketch entries


def test_text_stats_kernel_edge_cases():
    from fogray.datapipes.text import text_stats_batch

    t = pa.table({"doc_id": [0, 1], "text": ["", "a b  c 12."]})
    out = text_stats_batch(t).to_pandas()
    assert out.loc[1, "n_tokens"] == 4
    assert out.loc[1, "n_alpha"] == 3
    assert out.loc[1, "n_digit"] == 2


def test_minhash_lsh_exact_oracle_sf01(ray_session):
    """Exact end-to-end oracle at sf0.1 (5000 docs — the only SF whose
    documents table is larger than sf0.001's): candidates recomputed by
    a pure-Python LSH over per-doc signatures, jaccard recomputed
    per-pair from true shingle sets. Pins both the banding and the
    distributed-join verify stage (VERDICT r1 item 5)."""
    import zlib

    import ray.data as rd

    from fogray.datapipes import queries as dq
    from fogray.datapipes.dedup import MinHasher, _doc_shingles

    sf = "/root/testdata/sf0.1"
    docs = rd.read_parquet(
        sf + "/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    mh = MinHasher(num_perm=32, shingle_words=3)
    buckets: dict = {}
    shingles: dict = {}
    for did, txt in zip(docs.doc_id, docs.text):
        sig = mh.signature(txt)
        shingles[did] = _doc_shingles(txt, 3).astype(np.int64)
        for b in range(8):
            key = (b, zlib.crc32(sig[b * 4 : (b + 1) * 4].astype(np.int64).tobytes()))
            buckets.setdefault(key, []).append(did)
    want_rows = []
    seen = set()
    for v in buckets.values():
        v = sorted(set(v))
        for i in range(len(v)):
            for j in range(i + 1, len(v)):
                seen.add((v[i], v[j]))
    for a, b in seen:
        sa, sb = shingles[a], shingles[b]
        if len(sa) == 0 or len(sb) == 0:
            continue
        ni = len(np.intersect1d(sa, sb, assume_unique=True))
        jac = ni / (len(sa) + len(sb) - ni)
        if jac >= 0.5:
            want_rows.append((a, b, round(jac, 6)))
    want = pd.DataFrame(sorted(want_rows), columns=["da", "db", "jaccard"])
    got = (
        dq.q_dd_minhash_lsh(sf)
        .to_pandas()
        .sort_values(["da", "db"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


def test_embedding_cosine_lsh_scale_path(ray_session):
    """>100k vectors trips the LSH bucketed path (VERDICT r1 item 6):
    planted near-identical pairs must be recovered (collision prob -> 1
    for tiny angles across 4 tables) and every reported cosine is exact."""
    import ray.data as rd

    from fogray.datapipes import dedup

    rng = np.random.RandomState(3)
    n, d, p = 110_000, 16, 300
    base = rng.standard_normal((n, d))
    clones = base[:p] + 0.02 * rng.standard_normal((p, d))
    vecs = np.vstack([base, clones])
    ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table(
        {"vec_id": ids,
         "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float64()))}
    )
    out = dedup.embedding_cosine_pairs(
        rd.from_arrow(t).repartition(16), threshold=0.98
    ).to_pandas()
    got = set(zip(out.va, out.vb))
    recall = sum((i, n + i) in got for i in range(p)) / p
    assert recall >= 0.95
    assert out.duplicated(["va", "vb"]).sum() == 0
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sample = out.sample(min(200, len(out)), random_state=0)
    for a, b, c in zip(sample.va, sample.vb, sample.cos):
        assert abs(round(float(unit[a] @ unit[b]), 6) - c) < 1e-9


def test_hot_key_skew_guard(ray_session):
    """A single pathological key — one user / one (window, type) —
    owning 10^6 events must still complete: windows pre-combine per
    batch (raw events never shuffle), sessionize handles the whole
    user in one vectorized block (VERDICT r1 item 9)."""
    import ray.data as rd

    from fogray.datapipes import streams

    n = 1_000_000
    ts = pa.array(np.arange(n, dtype=np.int64) * 1_000_000).cast(pa.timestamp("us"))
    t = pa.table(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": pa.array(["click"] * n),
            "value": np.ones(n, dtype=np.float64),
        }
    )
    ds = rd.from_arrow(t).repartition(16)
    # 1s spacing, 30min gap => one session of n events
    sess = streams.sessionize(ds, gap_minutes=30).to_pandas()
    assert len(sess) == 1
    assert sess.loc[0, "n_events"] == n
    assert sess.loc[0, "duration_s"] == float(n - 1)
    # all events in ceil(n s / 1h) windows of one hot type
    win = streams.tumbling_window_stats(ds, width_minutes=60).to_pandas()
    assert win.n_events.sum() == n
    assert len(win) == -(-n // 3600)
    assert win.sum_value.sum() == float(n)


def test_asof_join_semantics(ray_session):
    """asof_join edge rules: >= includes equal timestamps (right ordered
    before left on ties), tied right (key, ts) rows resolve to MAX
    payload, lefts with no prior right are dropped, and a hot key whose
    whole history lands in one group still vectorizes."""
    import ray.data as rd

    from fogray.datapipes import relational

    def tt(us):
        return pa.array(np.asarray(us, dtype=np.int64)).cast(pa.timestamp("us"))

    left = pa.table(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "user_id": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "ts": tt([5, 10, 20, 7, 3, 9]),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 9], type=pa.int64()),
            "ts": tt([10, 10, 15, 2, 6, 1]),
            "value": pa.array([4.0, 7.0, 1.0, 9.0, 2.0, 0.5]),
        }
    )
    out = (
        relational.asof_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right).repartition(2),
            key_col="user_id",
            ts_col="ts",
            payload_col="value",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 0 (u1, t5)  -> right (u1, t2, 9.0)
    # event 1 (u1, t10) -> tied rights at t10 -> MAX value 7.0 (>= rule)
    # event 2 (u1, t20) -> right (u1, t15, 1.0)
    # event 3 (u2, t7)  -> right (u2, t6, 2.0)
    # event 4 (u2, t3)  -> no prior right: dropped
    # event 5 (u3, t9)  -> no rights for key: dropped
    assert out.event_id.tolist() == [0, 1, 2, 3]
    assert out.value_right.tolist() == [9.0, 7.0, 1.0, 2.0]
    assert pa.array(out.ts_right).cast(pa.int64()).to_pylist() == [2, 10, 15, 6]

    # hot key: one user owns 200k interleaved rows on both sides
    n = 200_000
    hl = pa.table(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "ts": tt(np.arange(n, dtype=np.int64) * 10 + 5),
        }
    )
    hr = pa.table(
        {
            "user_id": np.zeros(n, dtype=np.int64),
            "ts": tt(np.arange(n, dtype=np.int64) * 10),
            "value": np.arange(n, dtype=np.float64),
        }
    )
    hot = relational.asof_join(
        rd.from_arrow(hl).repartition(8),
        rd.from_arrow(hr).repartition(8),
        key_col="user_id",
        ts_col="ts",
        payload_col="value",
    ).to_pandas()
    assert len(hot) == n
    hot = hot.sort_values("event_id").reset_index(drop=True)
    assert (hot.value_right.to_numpy() == np.arange(n, dtype=np.float64)).all()


def test_range_join_semantics(ray_session):
    """range_join edge rules: [lo, hi] inclusive at both ends, matches
    crossing a bucket boundary emitted exactly once (right-copy
    replication dedup), negative gaps excluded, and the whole result
    equals an O(n^2) brute force on a random keyed stream."""
    import ray.data as rd

    from fogray.datapipes import relational

    def tt(us):
        return pa.array(np.asarray(us, dtype=np.int64)).cast(pa.timestamp("us"))

    hi = 100  # band [0, 100] us -> bucket width 100
    left = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1], type=pa.int64()),
            "ts": tt([50, 95, 199, 300]),
            "event_id": np.arange(4, dtype=np.int64),
        }
    )
    # rights: gap 0 (==lo), gap exactly hi, cross-bucket gap, gap hi+1,
    # negative gap, other key
    right = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 1, 2], type=pa.int64()),
            "ts": tt([50, 150, 101, 401, 40, 60]),
            "event_id": np.arange(10, 16, dtype=np.int64),
        }
    )
    out = (
        relational.range_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right).repartition(3),
            key_col="user_id",
            ts_col="ts",
            id_col="event_id",
            lo_us=0,
            hi_us=hi,
        )
        .to_pandas()
        .sort_values(["event_id_l", "event_id_r"])
        .reset_index(drop=True)
    )
    # l0 (t50): r10 gap 0 (== lo), r12 gap 51 (cross-bucket), r11 gap 100 (== hi)
    # l1 (t95): r12 gap 6, r11 gap 55
    # l2 (t199): none (r11 gap -49, r13 gap 202 > hi)
    # l3 (t300): none (r13 gap 101 > hi)
    want = {(0, 10, 0), (0, 11, 100), (0, 12, 51), (1, 11, 55), (1, 12, 6)}
    got = set(zip(out.event_id_l, out.event_id_r, out.gap_us))
    assert got == want

    # brute force on a random keyed stream, including a hot key
    rng = np.random.default_rng(7)
    n = 4000
    keys = rng.integers(0, 8, n)
    keys[: n // 2] = 3  # hot key
    ts = rng.integers(0, 50_000, n)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {"user_id": keys.astype(np.int64), "ts": tt(ts), "event_id": ids}
    )
    lo_us, hi_us = 5, 137
    out = relational.range_join(
        rd.from_arrow(tbl).repartition(7),
        rd.from_arrow(tbl).repartition(5),
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        lo_us=lo_us,
        hi_us=hi_us,
    ).to_pandas()
    got = set(zip(out.event_id_l, out.event_id_r))
    want = set()
    for k in np.unique(keys):
        idx = np.flatnonzero(keys == k)
        gap = ts[idx][None, :] - ts[idx][:, None]  # right - left
        li, ri = np.nonzero((gap >= lo_us) & (gap <= hi_us))
        want |= set(zip(idx[li], idx[ri]))
    assert got == want
    gaps = dict(zip(zip(out.event_id_l, out.event_id_r), out.gap_us))
    for (l, r), g in list(gaps.items())[:100]:
        assert g == ts[r] - ts[l]


def test_hll_by_group_block_invariant(ray_session):
    """Grouped HLL registers are order/layout-insensitive maxima: a
    1-block layout and a 16-block layout yield identical estimates, and
    each group's estimate equals the UNgrouped sketch run on just that
    group's rows (merge correctness, not only plausibility)."""
    import ray.data as rd
    from fogray.datapipes import sketches as sk

    rng = np.random.default_rng(7)
    grp = np.array(["a", "b", "c"])[rng.integers(0, 3, 5000)]
    val = rng.integers(0, 400, 5000).astype(str)
    t = pa.table({"g": grp, "v": val})
    one = sk.hll_distinct_by(rd.from_arrow(t), "g", "v").to_pandas()
    many = sk.hll_distinct_by(
        rd.from_arrow(t).repartition(16), "g", "v"
    ).to_pandas()
    pd.testing.assert_frame_equal(one, many)
    for g in ["a", "b", "c"]:
        sub = t.filter(pa.compute.equal(t.column("g"), g))
        solo = sk.hll_distinct(rd.from_arrow(sub), "v").to_pandas()
        row = one[one.g == g].iloc[0]
        assert row.est_distinct == solo.est_distinct.iloc[0]
        assert row.n_rows == solo.n_rows.iloc[0]


def test_exact_quantiles_layout_invariant(ray_session):
    """Quantiles equal numpy order statistics regardless of input block
    layout (1 vs 13 blocks), including duplicate-heavy data."""
    import ray.data as rd
    from fogray.datapipes import relational as rel

    rng = np.random.default_rng(3)
    v = np.r_[rng.normal(0, 100, 4000), np.full(1000, 42.0)]
    want = np.sort(v)
    t = pa.table({"v": v})
    for parts in (1, 13):
        ds = rd.from_arrow(t).repartition(parts) if parts > 1 else rd.from_arrow(t)
        out = rel.exact_quantiles(ds, "v").to_pandas()
        for q, val in zip(out.q, out.value):
            assert val == want[int(np.floor(q * (len(v) - 1)))]


def test_star_join_rollup_brute_force(ray_session):
    """Star rollup equals the pandas brute force on a synthetic star
    schema with int64-exact money."""
    import ray.data as rd
    from fogray.datapipes import relational as rel

    rng = np.random.default_rng(5)
    n_cust, n_ord, n_li = 50, 300, 1500
    cust = pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_nationkey": rng.integers(0, 5, n_cust),
    })
    nation = pa.table({
        "n_nationkey": np.arange(5, dtype=np.int64),
        "n_name": [f"N{i}" for i in range(5)],
    })
    orders = pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
    })
    li = pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_extendedprice": np.round(rng.uniform(1, 100000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
    })
    got = rel.star_join_rollup(
        rd.from_arrow(li).repartition(7), rd.from_arrow(orders).repartition(3),
        cust, nation,
    ).to_pandas()
    df = li.to_pandas().merge(
        orders.to_pandas(), left_on="l_orderkey", right_on="o_orderkey"
    ).merge(cust.to_pandas(), left_on="o_custkey", right_on="c_custkey").merge(
        nation.to_pandas(), left_on="c_nationkey", right_on="n_nationkey"
    )
    df["rev4"] = (
        np.floor(df.l_extendedprice * 100 + 0.5).astype(np.int64)
        * (100 - np.floor(df.l_discount * 100 + 0.5).astype(np.int64))
    )
    want = (
        df.groupby("n_name")
        .agg(revenue=("rev4", lambda s: s.sum() / 10000.0), n_items=("rev4", "size"))
        .reset_index()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_anti_semi_join_semantics(ray_session):
    """ANTI keeps exactly the left rows whose key is absent from the
    right (duplicates together); SEMI keeps the complement; the two
    partition the left side. Checked against a pandas brute force over
    a layout with duplicate keys on both sides."""
    import ray.data as rd
    from fogray.datapipes import relational as rel

    rng = np.random.default_rng(11)
    lk = rng.integers(0, 40, 300)
    rk = rng.integers(20, 60, 200)
    left = pa.table({"k": lk.astype(str), "v": np.arange(300, dtype=np.int64)})
    right = pa.table({"k": rk.astype(str), "w": np.arange(200, dtype=np.int64)})
    lds = rd.from_arrow(left).repartition(5)
    rds = rd.from_arrow(right).repartition(3)
    import ray as _r

    def collect(ds):
        return pa.concat_tables(
            _r.get(ds.materialize().to_arrow_refs()), promote_options="default"
        ).to_pandas().sort_values("v").reset_index(drop=True)

    anti = collect(rel.key_anti_semi_join(lds, rds, key_col="k"))
    semi = collect(rel.key_anti_semi_join(lds, rds, key_col="k", semi=True))
    rset = set(rk.astype(str))
    want_anti = [v for k, v in zip(lk.astype(str), range(300)) if k not in rset]
    want_semi = [v for k, v in zip(lk.astype(str), range(300)) if k in rset]
    assert anti.v.tolist() == want_anti
    assert semi.v.tolist() == want_semi
    assert len(anti) + len(semi) == 300


def test_sorted_key_join_semantics(ray_session):
    """Dimension join: duplicate left keys all attach the same right
    row, unmatched left rows drop, payload dtypes survive."""
    import ray as _r
    import ray.data as rd
    from fogray.datapipes import relational as rel

    left = pa.table({
        "k": np.array([3, 1, 3, 7, 5], dtype=np.int64),
        "v": np.arange(5, dtype=np.int64),
    })
    right = pa.table({
        "k": np.array([1, 3, 5], dtype=np.int64),
        "name": ["one", "three", "five"],
        "w": np.array([0.5, 1.5, 2.5]),
    })
    out = rel.sorted_key_join(
        rd.from_arrow(left).repartition(2), rd.from_arrow(right), key_col="k"
    )
    got = pa.concat_tables(
        _r.get(out.materialize().to_arrow_refs()), promote_options="default"
    ).to_pandas().sort_values("v").reset_index(drop=True)
    assert got.v.tolist() == [0, 1, 2, 4]  # k=7 dropped
    assert got.name.tolist() == ["three", "one", "three", "five"]
    assert got.w.tolist() == [1.5, 0.5, 1.5, 2.5]


def test_curate_corpus_semantics(ray_session):
    """Planted corpus: the low-quality doc is dropped at stage 1, the
    duplicate keeps the min doc_id at stage 2, and stage 3 applies the
    md5-prefix rule to the keepers only."""
    import hashlib

    import ray.data as rd
    from fogray.datapipes import curate

    rich = (
        "the quick brown fox jumps over a lazy dog and then runs on "
        "through fields of wheat to find the river where it drinks "
    ) * 4
    junk = "zzz"
    docs = pa.table({
        "doc_id": np.arange(6, dtype=np.int64),
        "source": ["s"] * 6,
        "text": [rich, rich, junk, rich + "x", junk, rich + "y"],
    })
    out = curate.curate_corpus(
        rd.from_arrow(docs).repartition(3), min_q=0.25, sample_max_prefix="ff"
    )
    got = pa.concat_tables(
        __import__("ray").get(out.materialize().to_arrow_refs()),
        promote_options="default",
    ).to_pandas().sort_values("doc_id")
    # junk docs (2, 4) fail quality; dup of rich keeps doc 0 not doc 1
    assert got.doc_id.tolist() == [0, 3, 5]
    # with a tighter prefix only doc_ids whose md5 falls under it remain
    keep = [i for i in [0, 3, 5]
            if hashlib.md5(str(i).encode()).hexdigest()[:2] <= "7f"]
    out2 = curate.curate_corpus(
        rd.from_arrow(docs).repartition(3), min_q=0.25, sample_max_prefix="7f"
    )
    got2 = pa.concat_tables(
        __import__("ray").get(out2.materialize().to_arrow_refs()),
        promote_options="default",
    ).to_pandas().sort_values("doc_id")
    assert got2.doc_id.tolist() == keep


def test_cms_one_sided_error(ray_session):
    """CMS never underestimates: est_count >= exact count for every
    probed token, and equals it when no bucket collisions occur."""
    from fogray.datapipes import queries as dq

    t = dq.QUERIES["txt_cms_tokens"](SF_DIR).to_pandas()
    assert len(t) == 20
    assert (t.est_count >= t.n_occ).all()


def test_global_shuffle_permutation_and_determinism(ray_session):
    """Positions are a 0..n-1 permutation, shards balanced to within one
    row, the order equals the local md5-rank recompute, and the result
    is block-layout invariant (1 vs 11 blocks)."""
    import hashlib

    import ray.data as rd
    from fogray.datapipes import packing

    ids = np.arange(1000, dtype=np.int64) * 3 + 1
    t = pa.table({"doc_id": ids, "junk": ids * 2})
    want_order = np.array(
        sorted(ids.tolist(), key=lambda k: (hashlib.md5(f"{k}:7".encode()).digest()[:8], k))
    )
    for parts in (1, 11):
        ds = rd.from_arrow(t).repartition(parts) if parts > 1 else rd.from_arrow(t)
        out = (
            packing.global_shuffle(ds, key_col="doc_id", seed=7, num_shards=8)
            .to_pandas()
            .sort_values("pos")
            .reset_index(drop=True)
        )
        assert np.array_equal(out.pos.to_numpy(), np.arange(1000))
        assert np.array_equal(out.doc_id.to_numpy(), want_order)
        assert np.array_equal(out.shard.to_numpy(), np.arange(1000) % 8)
        counts = out.shard.value_counts()
        assert counts.max() - counts.min() <= 1


def test_pack_sequences_prefix_exact(ray_session):
    """seq_id/seq_off equal the local concat-and-chop recompute in
    doc_id order, regardless of block layout."""
    import ray.data as rd
    from fogray.datapipes import packing

    rng = np.random.default_rng(5)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    texts = [" ".join(["tok"] * int(k)) for k in rng.integers(1, 40, n)]
    t = pa.table({"doc_id": ids, "text": texts})
    nt = np.array([len(s.split()) for s in texts], dtype=np.int64)
    start = np.cumsum(nt) - nt
    for parts in (1, 9):
        ds = rd.from_arrow(t).repartition(parts) if parts > 1 else rd.from_arrow(t)
        out = (
            packing.pack_sequences(ds, budget=64)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert np.array_equal(out.n_tokens.to_numpy(), nt)
        assert np.array_equal(out.seq_id.to_numpy(), start // 64)
        assert np.array_equal(out.seq_off.to_numpy(), start % 64)


def test_ntokens_matches_filtered_split():
    """The arrow token-count kernel subtracts the empty tokens arrow
    emits at leading/trailing whitespace (DuckDB's filtered regexp
    split has none)."""
    from fogray.datapipes.packing import _ntokens_batch

    t = pa.table(
        {"doc_id": np.arange(4, dtype=np.int64),
         "text": ["a  b c", " x y ", "", "one"]}
    )
    out = _ntokens_batch(t, "doc_id", "text")
    assert out.column("n_tokens").to_pylist() == [3, 2, 0, 1]


def test_benchmark_overlap_brute_force(ray_session):
    """n_ngrams / n_overlap / flag equal the python-set brute force over
    the same shingle hashes; benchmark docs are excluded."""
    import ray.data as rd
    from fogray.datapipes import packing
    from fogray.datapipes.dedup import _doc_shingles

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    n = 200
    ids = np.arange(n, dtype=np.int64)
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 25))) for _ in range(n)]
    t = pa.table({"doc_id": ids, "text": texts})
    bench = set()
    for i in range(n):
        if i % 7 == 0:
            bench.update(_doc_shingles(texts[i], 3).tolist())
    out = (
        packing.benchmark_overlap(
            rd.from_arrow(t).repartition(5), bench_mod=7, n_words=3, flag_frac=0.5
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out.doc_id % 7 != 0).all()
    for row in out.itertuples():
        sh = set(_doc_shingles(texts[int(row.doc_id)], 3).tolist())
        assert row.n_ngrams == len(sh)
        assert row.n_overlap == len(sh & bench)
        assert row.contaminated == int(row.n_overlap >= 0.5 * row.n_ngrams)


def test_rate_sample_thresholds(ray_session):
    """Survivors match the per-key md5-u64 threshold rule exactly; a
    rate of 1.0 keeps everything; unknown groups use the default."""
    import hashlib

    import ray.data as rd
    from fogray.datapipes import relational as rel

    n = 800
    ids = np.arange(n, dtype=np.int64)
    groups = np.array(["a", "b", "c", "zzz"])[ids % 4]
    t = pa.table({"doc_id": ids, "source": groups})
    rates = {"a": 0.25, "b": 1.0, "c": 0.5}
    out = rel.rate_sample(
        rd.from_arrow(t).repartition(6),
        group_col="source",
        key_col="doc_id",
        rates=rates,
        default=0.125,
    ).to_pandas()
    kept = set(out.doc_id.tolist())
    for k, g in zip(ids.tolist(), groups.tolist()):
        h = int.from_bytes(hashlib.md5(str(k).encode()).digest()[:8], "big")
        r = rates.get(g, 0.125)
        assert (k in kept) == (r >= 1.0 or h < int(r * (1 << 64)))


def test_ordered_block_prefix_rejects_overlap(ray_session):
    """Out-of-order blocks are re-ordered by boundary keys; overlapping
    key ranges (non-unique sort keys) raise instead of mis-ranking."""
    import ray
    import ray.data as rd
    import pytest

    from fogray.datapipes.packing import ordered_block_prefix

    # disjoint but yielded out of order: bases must follow key order
    t1 = pa.table({"k": np.array([10, 11, 12], dtype=np.int64)})
    t2 = pa.table({"k": np.array([1, 2], dtype=np.int64)})
    refs, row_base, _ = ordered_block_prefix(rd.from_arrow([t1, t2]), ["k"])
    firsts = [ray.get(r).column("k")[0].as_py() for r in refs]
    assert firsts == [1, 10]
    assert row_base.tolist() == [0, 2]

    bad = rd.from_arrow(
        [pa.table({"k": np.array([1, 5], dtype=np.int64)}),
         pa.table({"k": np.array([5, 9], dtype=np.int64)})]
    )
    with pytest.raises(ValueError):
        ordered_block_prefix(bad, ["k"])


def test_funnel_strict_ordering(ray_session):
    """Funnel stage semantics: stage k anchors STRICTLY after stage
    k-1's first hit; users with no stage-0 event are dropped; a click
    preceding the first view does not count; equal timestamps do not
    advance the funnel."""
    import ray.data as rd

    from fogray.datapipes import streams

    def tt(us):
        return pa.array(np.asarray(us, dtype=np.int64)).cast(pa.timestamp("us"))

    rows = [
        # u1: full funnel in order -> depth 3
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2: click BEFORE first view; later click missing -> depth 1
        (2, 5, "click"), (2, 10, "view"),
        # u3: purchase before click -> depth 2 (view, click only)
        (3, 10, "view"), (3, 15, "purchase"), (3, 20, "click"),
        # u4: click AT the view timestamp (not strictly after) -> depth 1
        (4, 10, "view"), (4, 10, "click"),
        # u5: no view at all -> dropped
        (5, 10, "click"), (5, 20, "purchase"),
        # u6: two views; click between them counts (after FIRST view)
        (6, 10, "view"), (6, 15, "click"), (6, 50, "view"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": tt([r[1] for r in rows]),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )
    out = (
        streams.funnel(rd.from_arrow(t).repartition(4))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.index.tolist() == [1, 2, 3, 4, 6]
    assert out.depth.tolist() == [3, 1, 2, 1, 2]
    assert out.loc[1, "ts_click"].value == 20_000 and out.loc[1, "ts_purchase"].value == 30_000
    assert pd.isna(out.loc[2, "ts_click"]) and pd.isna(out.loc[2, "ts_purchase"])
    assert out.loc[3, "ts_click"].value == 20_000 and pd.isna(out.loc[3, "ts_purchase"])
    assert pd.isna(out.loc[4, "ts_click"])
    assert out.loc[6, "ts_view"].value == 10_000 and out.loc[6, "ts_click"].value == 15_000


def test_repetition_ratio(ray_session):
    """Duplicate-bigram repetition: hand-counted ratios, short docs
    (one shortened shingle), and empty docs dropped."""
    import ray.data as rd

    from fogray.datapipes import text as txt

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a b a b a b",   # bigrams ab ba ab ba ab -> 5 total 2 distinct
                    "x y z",          # xy yz -> 0 repetition
                    "solo",           # one shortened shingle -> 0
                    "",               # no tokens -> dropped
                ]
            ),
        }
    )
    out = (
        txt.repetition(rd.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.index.tolist() == [0, 1, 2]
    assert out.loc[0, "n_bigrams"] == 5 and out.loc[0, "n_distinct"] == 2
    assert out.loc[0, "rep_ratio"] == 0.6
    assert out.loc[1, "rep_ratio"] == 0.0 and out.loc[1, "n_bigrams"] == 2
    assert out.loc[2, "n_bigrams"] == 1 and out.loc[2, "rep_ratio"] == 0.0


def test_user_sequence_stats(ray_session):
    """Per-user sequence features: 1-based seq ordered by (ts,
    event_id), null gap on each user's first event, and a money-exact
    running sum (0.10+0.20 must be exactly 0.30, not 0.30000000000004)."""
    import ray.data as rd

    from fogray.datapipes import streams

    def tt(us):
        return pa.array(np.asarray(us, dtype=np.int64)).cast(pa.timestamp("us"))

    # (event_id, user_id, ts_us, value); u1 has a ts tie broken by event_id
    rows = [
        (10, 1, 1_000_000, 0.10),
        (12, 1, 3_000_000, 0.20),
        (11, 1, 3_000_000, 0.30),   # same ts as eid 12 -> eid 11 comes first
        (20, 2, 5_000_000, 185.22),
        (21, 2, 5_500_000, 0.07),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": tt([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    out = (
        streams.user_sequence_stats(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out.loc[[10, 11, 12], "seq"].tolist() == [1, 2, 3]
    assert out.loc[[20, 21], "seq"].tolist() == [1, 2]
    assert pd.isna(out.loc[10, "gap_s"]) and pd.isna(out.loc[20, "gap_s"])
    assert out.loc[11, "gap_s"] == 2.0 and out.loc[12, "gap_s"] == 0.0
    assert out.loc[21, "gap_s"] == 0.5
    # money exactness: int64-cents cumsum, not float accumulation
    assert out.loc[11, "cum_value"] == 0.4 and out.loc[12, "cum_value"] == 0.6
    assert out.loc[21, "cum_value"] == 185.29


def test_span_overlap(ray_session):
    """Cross-doc shared-shingle fraction: hand-built corpus where docs
    0 and 1 share one 3-gram, doc 2 is disjoint, the empty doc is
    dropped, and a short doc's single shortened shingle still counts."""
    import ray.data as rd

    from fogray.datapipes import dedup

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a b c d",      # shingles: abc bcd (2 distinct)
                    "x a b c",      # xab abc  -> shares abc with doc 0
                    "p q r",        # pqr      -> unshared
                    "",             # dropped
                    "p q",          # one shortened shingle 'p q' -> unshared
                ]
            ),
        }
    )
    out = (
        dedup.span_overlap(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.index.tolist() == [0, 1, 2, 4]
    assert out.loc[0, "n_shingles"] == 2 and out.loc[0, "n_shared"] == 1
    assert out.loc[0, "shared_frac"] == 0.5
    assert out.loc[1, "n_shingles"] == 2 and out.loc[1, "n_shared"] == 1
    assert out.loc[2, "n_shared"] == 0 and out.loc[4, "n_shared"] == 0
    assert out.loc[4, "n_shingles"] == 1


def test_grouped_zscore(ray_session):
    """Grouped z-score: numpy-oracle values, NULL for zero-variance
    groups (singleton and constant), broadcast moments exact across
    block layouts."""
    import ray.data as rd

    from fogray.datapipes import relational

    vals = {"a": [1.00, 2.00, 3.00, 6.00], "b": [5.25], "c": [2.00, 2.00]}
    ids, grps, vs = [], [], []
    i = 0
    for g, xs in vals.items():
        for x in xs:
            ids.append(i); grps.append(g); vs.append(x); i += 1
    t = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "event_type": pa.array(grps),
            "value": pa.array(vs, pa.float64()),
        }
    )
    out = (
        relational.grouped_zscore(
            rd.from_arrow(t).repartition(3),
            group_col="event_type", id_col="event_id", value_col="value",
        )
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    a = np.array([100, 200, 300, 600], dtype=np.float64)
    want = np.round((a - a.mean()) / a.std(), 6)
    assert out.loc[[0, 1, 2, 3], "zscore"].tolist() == want.tolist()
    assert pd.isna(out.loc[4, "zscore"])          # singleton group
    assert pd.isna(out.loc[5, "zscore"]) and pd.isna(out.loc[6, "zscore"])


def test_snapshot_diff(ray_session):
    """Snapshot diff statuses: added / removed / changed, unchanged
    dropped; duplicate key within one snapshot raises."""
    import ray.data as rd

    from fogray.datapipes import relational

    old = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a", "b", "c", "d"]),
        }
    )
    new = pa.table(
        {
            "doc_id": pa.array([2, 3, 4, 5], pa.int64()),
            "text": pa.array(["b", "c CHANGED", "d", "e"]),
        }
    )
    out = (
        relational.snapshot_diff(
            rd.from_arrow(old).repartition(2),
            rd.from_arrow(new).repartition(2),
            key_col="doc_id",
            content_col="text",
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out["status"].to_dict() == {1: "removed", 3: "changed", 5: "added"}

    dup = pa.table(
        {"doc_id": pa.array([7, 7], pa.int64()), "text": pa.array(["x", "y"])}
    )
    with pytest.raises(Exception):
        relational.snapshot_diff(
            rd.from_arrow(dup), rd.from_arrow(new),
            key_col="doc_id", content_col="text",
        ).materialize()


def test_event_transitions(ray_session):
    """Behavioral bigram counts: per-user adjacency only, ts order with
    event_id tie-break, no cross-user pairs."""
    import ray.data as rd

    from fogray.datapipes import streams

    def tt(us):
        return pa.array(np.asarray(us, dtype=np.int64)).cast(pa.timestamp("us"))

    rows = [  # (event_id, user_id, ts, type)
        (1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 30, "view"),
        (4, 2, 10, "view"), (5, 2, 20, "view"),
        (7, 3, 10, "click"), (6, 3, 10, "view"),  # tie: eid 6 first
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": tt([r[2] for r in rows]),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    out = (
        streams.event_transitions(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index(["from_type", "to_type"])["n"]
        .to_dict()
    )
    assert out == {
        ("view", "click"): 2,   # u1 + u3 (tie-break puts view@eid6 first)
        ("click", "view"): 1,   # u1
        ("view", "view"): 1,    # u2
    }


def test_cohort_retention(ray_session):
    """Cohort matrix: first active day anchors the cohort; a user
    counts once per distinct active day offset."""
    import ray.data as rd

    from fogray.datapipes import streams

    DAY = 86_400_000_000

    def tt(us):
        return pa.array(np.asarray(us, dtype=np.int64)).cast(pa.timestamp("us"))

    rows = [  # (user, day, intra-day repeats)
        (1, 0), (1, 0), (1, 2),         # cohort 0: offsets 0, 2
        (2, 0), (2, 1),                 # cohort 0: offsets 0, 1
        (3, 2), (3, 2), (3, 3),         # cohort 2: offsets 0, 1
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": tt([r[1] * DAY + 5 for r in rows]),
        }
    )
    out = (
        streams.cohort_retention(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index(["cohort_day", "day_offset"])["n_users"]
        .to_dict()
    )
    assert out == {
        (0, 0): 2, (0, 1): 1, (0, 2): 1,
        (2, 0): 1, (2, 1): 1,
    }


def test_bigram_lm(ray_session):
    """Bigram LM table: adjacent pairs never cross docs; rank is count
    DESC with w2 ASC tie-break; top-k cut."""
    import ray.data as rd

    from fogray.datapipes import text as txt

    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(
                ["a b c", "a b d", "a c", "c a", "b"]  # 'c a' crosses docs only
            ),
        }
    )
    out = (
        txt.bigram_lm(rd.from_arrow(t).repartition(3), k=2)
        .to_pandas()
        .sort_values(["w1", "rk"])
        .reset_index(drop=True)
    )
    recs = list(out.itertuples(index=False, name=None))
    # a: b(2) rk1, c(1) rk2; b: c(1) rk1 (tie w2 asc), d(1) rk2; c: a(1) rk1
    assert recs == [
        ("a", "b", 2, 1), ("a", "c", 1, 2),
        ("b", "c", 1, 1), ("b", "d", 1, 2),
        ("c", "a", 1, 1),
    ]


def test_train_split(ray_session):
    """Deterministic split: matches a hand md5 oracle, stable across
    repartitions, roughly 80/10/10 at 3k keys."""
    import hashlib

    import ray.data as rd

    from fogray.datapipes import relational

    t = pa.table({"doc_id": pa.array(range(3000), pa.int64())})
    out = (
        relational.train_split(rd.from_arrow(t).repartition(4), key_col="doc_id")
        .to_pandas()
        .set_index("doc_id")["split"]
    )

    def want(k):
        p = hashlib.md5(str(k).encode()).hexdigest()[:2]
        return "train" if p <= "cb" else ("val" if p <= "e5" else "test")

    assert all(out[k] == want(k) for k in range(3000))
    frac = out.value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85 and frac["val"] < 0.15

    out2 = (
        relational.train_split(rd.from_arrow(t).repartition(11), key_col="doc_id")
        .to_pandas()
        .set_index("doc_id")["split"]
    )
    assert (out.sort_index() == out2.sort_index()).all()


def test_ntile_bins(ray_session):
    """NTILE semantics: first n%nb bins get the extra row; ordering by
    (value, id); groups independent."""
    import ray.data as rd

    from fogray.datapipes import relational

    # group a: 7 rows -> NTILE(3) sizes 3,2,2; group b: 2 rows -> 1,2
    t = pa.table(
        {
            "event_id": pa.array(range(9), pa.int64()),
            "event_type": pa.array(["a"] * 7 + ["b"] * 2),
            "value": pa.array([5.0, 1.0, 3.0, 2.0, 4.0, 7.0, 6.0, 9.0, 8.0]),
        }
    )
    out = (
        relational.ntile_bins(
            rd.from_arrow(t).repartition(3),
            group_col="event_type", order_col="value",
            id_col="event_id", n_bins=3,
        )
        .to_pandas()
        .set_index("event_id")["bin"]
        .to_dict()
    )
    # group a value order: 1(e1) 2(e3) 3(e2) | 4(e4) 5(e0) | 6(e6) 7(e5)
    assert out == {1: 1, 3: 1, 2: 1, 4: 2, 0: 2, 6: 3, 5: 3, 8: 1, 7: 2}


def test_rolling_mean(ray_session):
    """Trailing 3-event rolling mean: warm-up windows shrink, money
    exactness (0.10/0.20/0.40 -> exact 0.15 and 7/30-free arithmetic),
    per-user isolation."""
    import ray.data as rd

    from fogray.datapipes import streams

    def tt(us):
        return pa.array(np.asarray(us, dtype=np.int64)).cast(pa.timestamp("us"))

    rows = [  # (eid, user, ts, value)
        (1, 1, 10, 0.10), (2, 1, 20, 0.20), (3, 1, 30, 0.40), (4, 1, 40, 0.10),
        (5, 2, 10, 9.00),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": tt([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    out = (
        streams.rolling_mean(rd.from_arrow(t).repartition(2), window=3)
        .to_pandas()
        .set_index("event_id")["roll_mean"]
        .to_dict()
    )
    assert out == {
        1: 0.10, 2: 0.15, 3: round((10 + 20 + 40) / 3 / 100, 6),
        4: round((20 + 40 + 10) / 3 / 100, 6), 5: 9.00,
    }


def test_write_partitioned_resume(ray_session, tmp_path):
    """Resumable sink: all partitions written with _DONE markers; a
    re-run after one partition is wiped rewrites ONLY that partition
    (others report skipped and keep their bytes); read_partitioned
    round-trips and refuses partial partitions."""
    import os
    import shutil

    import ray.data as rd

    from fogray.datapipes import sink

    t = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(200)]),
        }
    )
    out = str(tmp_path / "sink")
    m1 = sink.write_partitioned(
        rd.from_arrow(t).repartition(4), out, key_col="doc_id", num_partitions=4
    ).to_pandas()
    assert m1["skipped"].sum() == 0 and m1["rows"].sum() == 200
    assert sorted(m1["part"]) == [0, 1, 2, 3]

    back = sink.read_partitioned(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == list(range(200))

    # wipe partition 2, keep the rest; record surviving mtimes
    shutil.rmtree(os.path.join(out, "part=2"))
    keep_mtime = {
        p: os.path.getmtime(os.path.join(out, f"part={p}", "data.parquet"))
        for p in (0, 1, 3)
    }
    m2 = sink.write_partitioned(
        rd.from_arrow(t).repartition(4), out, key_col="doc_id", num_partitions=4
    ).to_pandas().set_index("part")
    assert m2.loc[2, "skipped"] == 0
    assert all(m2.loc[p, "skipped"] == 1 for p in (0, 1, 3))
    for p in (0, 1, 3):
        assert os.path.getmtime(os.path.join(out, f"part={p}", "data.parquet")) == keep_mtime[p]

    back2 = sink.read_partitioned(out).to_pandas().sort_values("doc_id")
    assert back2["doc_id"].tolist() == list(range(200))

    # a partition without its marker is a partial write -> loud failure
    os.remove(os.path.join(out, "part=1", "_DONE"))
    with pytest.raises(ValueError):
        sink.read_partitioned(out)


def test_curate_corpus_kill_resume(ray_session, tmp_path):
    """Kill-after-stage-k resume for the long corpus pipeline: seed a
    directory with the EXACT on-disk state a run killed after finishing
    k sink partitions leaves behind (those partitions' bytes + _DONE
    markers, nothing else), re-run curate_corpus_to, and assert the
    finished partitions are skipped untouched (mtime-stable) while the
    completed directory is equivalent to an uninterrupted run."""
    import os
    import shutil

    import ray.data as rd

    from fogray.datapipes import curate, sink

    base = (
        "the quick brown fox jumps over a lazy dog and then runs on "
        "through fields of wheat to find the river where it drinks "
    ) * 4
    n = 240
    docs_t = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": ["s"] * n,
            # i % 200 plants 40 duplicate pairs for the dedup stage
            "text": [base + f"tail {i % 200}" for i in range(n)],
        }
    )
    mk = lambda: rd.from_arrow(docs_t).repartition(4)
    P = 8
    dir_a = str(tmp_path / "full")
    dir_b = str(tmp_path / "crash")
    m_full = curate.curate_corpus_to(
        mk(), dir_a, sample_max_prefix="ff", num_partitions=P
    ).to_pandas()
    assert m_full["skipped"].sum() == 0 and len(m_full) == P
    full = (
        sink.read_partitioned(dir_a)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(full) == 200  # dups collapsed, nothing else dropped

    # crash state: first k=3 partitions finished, the rest never begun
    done_parts = sorted(m_full["part"])[:3]
    os.makedirs(dir_b, exist_ok=True)
    for p in done_parts:
        shutil.copytree(
            os.path.join(dir_a, f"part={p}"), os.path.join(dir_b, f"part={p}")
        )
    mtimes = {
        p: os.path.getmtime(os.path.join(dir_b, f"part={p}", "data.parquet"))
        for p in done_parts
    }

    m2 = (
        curate.curate_corpus_to(
            mk(), dir_b, sample_max_prefix="ff", num_partitions=P
        )
        .to_pandas()
        .set_index("part")
    )
    assert sorted(m2.index) == sorted(m_full["part"])
    assert m2["skipped"].sum() == len(done_parts)
    for p in done_parts:
        assert m2.loc[p, "skipped"] == 1
        assert (
            os.path.getmtime(os.path.join(dir_b, f"part={p}", "data.parquet"))
            == mtimes[p]
        )
    back = (
        sink.read_partitioned(dir_b)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back.equals(full)


def test_token_pmi(ray_session):
    """PMI collocations: exact counts, pmi formula vs hand oracle,
    deterministic ranking."""
    import math

    import ray.data as rd

    from fogray.datapipes import text as txt

    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(["a b", "a b", "a c", "b a"]),
        }
    )
    out = txt.token_pmi(rd.from_arrow(t).repartition(3), k=10).to_pandas()
    recs = {(r.w1, r.w2): r for r in out.itertuples()}
    # pairs: (a,b) n=2, (a,c) n=1, (b,a) n=1; N=4
    # left counts: a->3, b->1; right: b->2, c->1, a->1
    assert recs[("a", "b")].n == 2 and recs[("a", "b")].rk == 1
    assert recs[("a", "b")].pmi == round(math.log(2 * 4 / (3 * 2)), 6)
    assert recs[("a", "c")].pmi == round(math.log(1 * 4 / (3 * 1)), 6)
    assert recs[("b", "a")].pmi == round(math.log(1 * 4 / (1 * 1)), 6)
    assert out["rk"].tolist() == [1, 2, 3]


def test_rollup_stats(ray_session):
    """ROLLUP levels: detail, per-a subtotal (b NULL), grand total
    (both NULL); money-exact sums."""
    import ray.data as rd

    from fogray.datapipes import relational

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y"]),
            "b": pa.array([1, 2, 1], pa.int64()),
            "v": pa.array([0.10, 0.20, 0.30], pa.float64()),
        }
    )
    out = relational.rollup_stats(
        rd.from_arrow(t).repartition(2), col_a="a", col_b="b", value_col="v"
    ).to_pandas()
    key = out.set_index(["a", "b"])  # NaN keys for subtotals
    assert key.loc[("x", 1), "sum_value"] == 0.10
    assert key.loc[("x", 2), "sum_value"] == 0.20
    sub = out[(out["a"] == "x") & (out["b"].isna())]
    assert len(sub) == 1 and sub.iloc[0]["sum_value"] == 0.30 and sub.iloc[0]["n"] == 2
    tot = out[out["a"].isna() & out["b"].isna()]
    assert len(tot) == 1 and tot.iloc[0]["sum_value"] == 0.60 and tot.iloc[0]["n"] == 3


def test_write_jsonl_partitioned_resume(ray_session, tmp_path):
    """JSONL twin of the parquet sink resume contract: wiped partitions
    rewrite, surviving partitions skip byte-identically, and a missing
    _DONE marker fails the read loudly."""
    import os
    import shutil

    import ray.data as rd

    from fogray.datapipes import sink

    t = pa.table(
        {
            "doc_id": pa.array(range(120), pa.int64()),
            "text": pa.array([f'li"ne\n{i}' for i in range(120)]),  # JSON-escaped
        }
    )
    out = str(tmp_path / "jsink")
    m1 = sink.write_jsonl_partitioned(
        rd.from_arrow(t).repartition(4), out, key_col="doc_id", num_partitions=4
    ).to_pandas()
    assert m1["skipped"].sum() == 0 and m1["rows"].sum() == 120

    back = sink.read_jsonl_partitioned(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == list(range(120))
    assert back["text"].tolist() == [f'li"ne\n{i}' for i in range(120)]

    shutil.rmtree(os.path.join(out, "part=0"))
    m2 = sink.write_jsonl_partitioned(
        rd.from_arrow(t).repartition(4), out, key_col="doc_id", num_partitions=4
    ).to_pandas().set_index("part")
    assert m2.loc[0, "skipped"] == 0
    assert all(m2.loc[p, "skipped"] == 1 for p in (1, 2, 3))
    back2 = sink.read_jsonl_partitioned(out).to_pandas()
    assert sorted(back2["doc_id"].tolist()) == list(range(120))

    os.remove(os.path.join(out, "part=3", "_DONE"))
    with pytest.raises(ValueError):
        sink.read_jsonl_partitioned(out)


def test_coaction_components_partition_invariant(ray_session):
    """The windowed co-action component stats must not depend on event
    blocking (distinct-partials dedup across blocks; window-complete
    grouping before the component fold)."""
    import ray.data as rd

    from fogray.datapipes import streams

    rng = np.random.RandomState(23)
    n = 600
    ts = pa.array(
        (np.int64(1_700_000_000_000_000) + rng.randint(0, 5, n).astype(np.int64)
         * np.int64(86_400_000_000)).astype("datetime64[us]")
    )
    t = pa.table(
        {
            "ts": ts,
            "event_type": pa.array([["a", "b", "c"][i] for i in rng.randint(0, 3, n)]),
            "user_id": pa.array(rng.randint(0, 40, n).astype(np.int64)),
        }
    )
    a = (
        streams.windowed_coaction_components(rd.from_arrow(t))
        .to_pandas().sort_values("window_day").reset_index(drop=True)
    )
    b = (
        streams.windowed_coaction_components(rd.from_arrow(t).repartition(7))
        .to_pandas().sort_values("window_day").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_components"] >= 1).all()
    assert (a["largest_component"] <= a["n_users"]).all()


def test_dq_checks_detect_injected_violations(ray_session):
    """The rules must actually fire: inject dupes, an orphan FK, a
    null, and out-of-range values and check the exact counts."""
    import ray.data as rd

    from fogray.datapipes import relational

    cust = pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())})
    orders = pa.table(
        {
            "o_orderkey": pa.array([10, 11, 11, 12], pa.int64()),  # dup 11
            "o_custkey": pa.array([1, 2, 9, 3], pa.int64()),       # orphan 9
            "o_totalprice": pa.array([5.0, None, 2.0, 1.0], pa.float64()),
            "o_qty": pa.array([5, 500, -1, 10], pa.int64()),       # 2 out of range
        }
    )
    tables = {
        "customer": rd.from_arrow(cust).repartition(2),
        "orders": rd.from_arrow(orders).repartition(3),
    }
    out = relational.dq_checks(
        tables,
        [
            {"kind": "unique", "table": "orders", "column": "o_orderkey"},
            {"kind": "fk", "table": "orders", "column": "o_custkey",
             "ref_table": "customer", "ref_column": "c_custkey"},
            {"kind": "not_null", "table": "orders", "column": "o_totalprice"},
            {"kind": "range", "table": "orders", "column": "o_qty",
             "lo": 1, "hi": 50},
        ],
    ).to_pandas().set_index("rule")
    assert out.loc["unique:orders.o_orderkey", "violations"] == 1
    assert out.loc["fk:orders.o_custkey->customer.c_custkey", "violations"] == 1
    assert out.loc["not_null:orders.o_totalprice", "violations"] == 1
    assert out.loc["range:orders.o_qty", "violations"] == 2
    assert (out["total"] == 4).all()


def test_dq_checks_accepted_values_and_min_rows(ray_session):
    """The two r5 rule kinds fire exactly: NOT-IN rows (NULL counts as
    a violation) and table-volume shortfall."""
    import ray.data as rd

    from fogray.datapipes import relational

    t = pa.table(
        {
            "flag": pa.array(["A", "B", None, "A", "Z"], pa.string()),
        }
    )
    out = relational.dq_checks(
        {"t": rd.from_arrow(t).repartition(2)},
        [
            {"kind": "accepted_values", "table": "t", "column": "flag",
             "values": ["A", "B"]},
            {"kind": "min_rows", "table": "t", "at_least": 8},
            {"kind": "min_rows", "table": "t", "at_least": 3},
        ],
    ).to_pandas().set_index("rule")
    assert out.loc["accepted_values:t.flag", "violations"] == 2  # None + Z
    assert out.loc["accepted_values:t.flag", "total"] == 5
    mr = out[out.index == "min_rows:t"]
    assert sorted(mr["violations"].tolist()) == [0, 3]  # 8-5 short, 3 met
    assert (mr["total"] == 5).all()


def test_dq_checks_scale_paths_and_nulls_match_sql(ray_session):
    """The group-complete paths (unique large=True, fk ref_fact=True)
    must agree with the broadcast/driver-fold paths AND with DuckDB's
    COUNT(DISTINCT) / LEFT-JOIN semantics — including NULL keys (a NULL
    key is never distinct; a NULL foreign key is always an orphan)."""
    import duckdb
    import ray.data as rd

    from fogray.datapipes import relational

    rng = np.random.RandomState(5)
    fact_keys = rng.randint(0, 800, 1000).astype(np.int64)
    probe = rng.randint(0, 1000, 1500).astype(np.int64)
    ref_t = pa.table(
        {"rk": pa.array(list(fact_keys[:-3]) + [None, None, None], pa.int64())}
    )
    probe_t = pa.table(
        {"pk": pa.array(list(probe[:-4]) + [None, None, None, None], pa.int64())}
    )
    tables = {
        "ref": rd.from_arrow(ref_t).repartition(5),
        "probe": rd.from_arrow(probe_t).repartition(7),
    }
    base_rules = [
        {"kind": "unique", "table": "ref", "column": "rk"},
        {"kind": "fk", "table": "probe", "column": "pk",
         "ref_table": "ref", "ref_column": "rk"},
    ]
    small = relational.dq_checks(tables, base_rules).to_pandas().set_index("rule")
    large = relational.dq_checks(
        tables,
        [
            {**base_rules[0], "large": True},
            {**base_rules[1], "ref_fact": True},
        ],
    ).to_pandas().set_index("rule")
    pd.testing.assert_frame_equal(small, large)
    con = duckdb.connect()
    con.register("ref_t", ref_t.to_pandas())
    con.register("probe_t", probe_t.to_pandas())
    uq = con.execute(
        "SELECT COUNT(*) - COUNT(DISTINCT rk), COUNT(*) FROM ref_t"
    ).fetchone()
    fk = con.execute(
        "SELECT SUM(CASE WHEN r.rk IS NULL THEN 1 ELSE 0 END), COUNT(*) "
        "FROM probe_t p LEFT JOIN (SELECT DISTINCT rk FROM ref_t) r "
        "ON r.rk = p.pk"
    ).fetchone()
    assert tuple(small.loc["unique:ref.rk"]) == (uq[0], uq[1])
    assert tuple(small.loc["fk:probe.pk->ref.rk"]) == (int(fk[0]), fk[1])
