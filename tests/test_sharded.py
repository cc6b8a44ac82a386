"""Parity of the range-sharded operator flavors (fogray/sharded.py)
with their broadcast originals: identical labels/arrivals/stats on the
same inputs, across partition counts and block layouts."""

import numpy as np
import pyarrow as pa
import pandas as pd
import pytest
import ray.data as rd

from fogray import incremental, sharded, temporal


def _random_edges(rng, n, m):
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    return src, dst


def _sym(src, dst):
    return np.r_[src, dst], np.r_[dst, src]


@pytest.mark.parametrize("p", [None, 1, 3])
def test_incremental_cc_sharded_matches_broadcast(ray_session, p):
    rng = np.random.RandomState(11)
    n = 400
    src, dst = _sym(*_random_edges(rng, n, 900))
    t = pa.table({"src": src, "dst": dst})
    chunk = len(src) // 6
    ds = rd.from_arrow(
        [t.slice(i * chunk, chunk) for i in range(7) if i * chunk < len(src)]
    )
    lab_a, touched_a, stats_a = incremental.incremental_cc(ds, n, num_batches=4)
    ds2 = rd.from_arrow(
        [t.slice(i * chunk, chunk) for i in range(7) if i * chunk < len(src)]
    )
    lab_b, touched_b, stats_b = sharded.incremental_cc_sharded(
        ds2, n, num_batches=4, num_partitions=p
    )
    np.testing.assert_array_equal(lab_a, lab_b)
    np.testing.assert_array_equal(touched_a, touched_b)
    assert stats_a == stats_b


def test_incremental_cc_sharded_parquet_output(ray_session, tmp_path):
    """out_dir path: shards write parquet in parallel, nothing dense is
    assembled; the shard union equals the in-memory result."""
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    n = 150
    src, dst = _sym(*_random_edges(rng, n, 300))
    lab, touched, _ = sharded.incremental_cc_sharded((src, dst), n, num_batches=3)
    out = str(tmp_path / "cc")
    l2, t2, stats = sharded.incremental_cc_sharded(
        (src, dst), n, num_batches=3, out_dir=out
    )
    assert l2 is None and t2 is None
    manifest = stats[-1]["shards"]
    parts = [pq.read_table(m["path"]) for m in manifest]
    cat = pa.concat_tables(parts).sort_by("vid")
    np.testing.assert_array_equal(
        cat.column("value").to_numpy(zero_copy_only=False), lab
    )
    got_touched = np.flatnonzero(
        cat.column("touched").to_numpy(zero_copy_only=False)
    )
    np.testing.assert_array_equal(got_touched, touched)


def test_incremental_cc_sharded_checkpoint_resume(ray_session, tmp_path):
    """Kill-after-batch-1 simulation: checkpoints write per batch; a
    resumed run restores the newest complete manifest, re-buckets the
    already-arrived edges WITHOUT re-running rounds, continues from
    the next batch, and lands on the identical labels and stats."""
    import json
    import os

    rng = np.random.RandomState(13)
    n = 250
    src, dst = _sym(*_random_edges(rng, n, 500))
    ck = str(tmp_path / "ck")
    lab_full, touched_full, stats_full = sharded.incremental_cc_sharded(
        (src, dst), n, num_batches=4, ckpt_dir=ck
    )
    # simulate a crash after batch 1: drop the later manifests
    for b in (2, 3):
        os.remove(os.path.join(ck, f"manifest-batch{b}.json"))
    # resume on a "different machine": another partition count — the
    # manifest's bounds are adopted, not re-derived
    lab_r, touched_r, stats_r = sharded.incremental_cc_sharded(
        (src, dst), n, num_batches=4, ckpt_dir=ck, resume=True,
        num_partitions=2,
    )
    np.testing.assert_array_equal(lab_full, lab_r)
    np.testing.assert_array_equal(touched_full, touched_r)
    assert stats_full == stats_r
    # the resumed run's manifest for the final batch is complete again
    with open(os.path.join(ck, "manifest-batch3.json")) as f:
        m = json.load(f)
    assert m["batch"] == 3 and len(m["shards"]) >= 1
    # mismatched config must refuse, not silently corrupt
    with pytest.raises(ValueError):
        sharded.incremental_cc_sharded(
            (src, dst), n, num_batches=5, ckpt_dir=ck, resume=True
        )


def test_incremental_cc_sharded_order_independent(ray_session):
    """Different batch counts land at the same static fixpoint."""
    rng = np.random.RandomState(3)
    n = 200
    src, dst = _sym(*_random_edges(rng, n, 350))
    lab1, _, _ = sharded.incremental_cc_sharded((src, dst), n, num_batches=2)
    lab2, _, _ = sharded.incremental_cc_sharded((src, dst), n, num_batches=5)
    np.testing.assert_array_equal(lab1, lab2)


@pytest.mark.parametrize("p", [None, 1, 4])
def test_temporal_sharded_matches_broadcast(ray_session, p):
    rng = np.random.RandomState(17)
    n = 300
    m = 1200
    src, dst = _random_edges(rng, n, m)
    tt = rng.randint(0, 50, m).astype(np.int64)
    a_arr, a_reached = temporal.temporal_earliest_arrival(
        (src, dst, tt), n, source=0
    )
    b_arr, b_reached = sharded.temporal_earliest_arrival_sharded(
        (src, dst, tt), n, source=0, num_partitions=p
    )
    np.testing.assert_array_equal(a_arr, b_arr)
    np.testing.assert_array_equal(a_reached, b_reached)


@pytest.mark.parametrize("p", [None, 1, 3])
def test_coloring_sharded_matches_broadcast(ray_session, p):
    from fogray import coloring

    rng = np.random.RandomState(23)
    n = 250
    s0, d0 = _random_edges(rng, n, 700)
    m = s0 != d0  # simple graph: coloring's domain (see scatter_color)
    src, dst = _sym(s0[m], d0[m])
    t = pa.table({"src": src, "dst": dst})
    chunk = len(src) // 5
    blocks = [t.slice(i * chunk, chunk) for i in range(6) if i * chunk < len(src)]
    a = coloring.jones_plassmann(rd.from_arrow(blocks), n).to_pandas()
    b = sharded.jones_plassmann_sharded(
        rd.from_arrow(blocks), n, num_partitions=p
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # proper coloring: no edge joins equal colors
    col = np.full(n, -5, dtype=np.int64)
    col[b["vid"].to_numpy()] = b["color"].to_numpy()
    m = src != dst
    assert (col[src[m]] != col[dst[m]]).all()


@pytest.mark.parametrize("p", [None, 1, 3])
def test_matching_sharded_matches_broadcast(ray_session, p):
    from fogray import matching

    rng = np.random.RandomState(29)
    n = 300
    src, dst = _sym(*_random_edges(rng, n, 800))
    t = pa.table({"src": src, "dst": dst})
    chunk = len(src) // 5
    blocks = [t.slice(i * chunk, chunk) for i in range(6) if i * chunk < len(src)]
    a = matching.greedy_matching(rd.from_arrow(blocks), n).to_pandas()
    b = sharded.greedy_matching_sharded(
        rd.from_arrow(blocks), n, num_partitions=p
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # maximal matching invariants: vertex-disjoint pairs
    used = np.r_[b["a"].to_numpy(), b["b"].to_numpy()]
    assert len(used) == len(np.unique(used))


@pytest.mark.parametrize("p", [None, 1, 3])
def test_msf_sharded_matches_broadcast(ray_session, p):
    from fogray import msf

    rng = np.random.RandomState(31)
    n = 300
    s0, d0 = _random_edges(rng, n, 900)
    w0 = rng.randint(1, 25, 900).astype(np.float64)  # int-valued: exact
    src, dst = _sym(s0, d0)
    w = np.r_[w0, w0]
    t = pa.table({"src": src, "dst": dst, "weight": w})
    chunk = len(src) // 5
    blocks = [t.slice(i * chunk, chunk) for i in range(6) if i * chunk < len(src)]
    a = msf.boruvka_msf(rd.from_arrow(blocks), n).to_pandas()
    b = sharded.boruvka_msf_sharded(
        rd.from_arrow(blocks), n, num_partitions=p
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert len(b) > 0


def test_msf_sharded_matches_kruskal(ray_session):
    """Independent oracle: Kruskal under the same strict (w, a, b)
    total order must produce the identical forest."""
    rng = np.random.RandomState(37)
    n = 120
    s0, d0 = _random_edges(rng, n, 400)
    w0 = rng.randint(1, 15, 400).astype(np.float64)
    src, dst = _sym(s0, d0)
    w = np.r_[w0, w0]
    got = sharded.boruvka_msf_sharded((src, dst, w), n).to_pandas()
    # Kruskal with union-find over distinct canonical edges
    m = s0 != d0
    a0, b0 = np.minimum(s0[m], d0[m]), np.maximum(s0[m], d0[m])
    ww = w0[m]
    order = np.lexsort((b0, a0, ww))
    a0, b0, ww = a0[order], b0[order], ww[order]
    keep = np.r_[True, (a0[1:] != a0[:-1]) | (b0[1:] != b0[:-1]) | (ww[1:] != ww[:-1])]
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ka, kb, kw = [], [], []
    for i in np.flatnonzero(keep):
        ra, rb = find(a0[i]), find(b0[i])
        if ra != rb:
            parent[ra] = rb
            ka.append(a0[i])
            kb.append(b0[i])
            kw.append(ww[i])
    exp = (
        pd.DataFrame({"a": ka, "b": kb, "weight": kw})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("p", [None, 1, 3])
def test_hyperball_sharded_matches_broadcast(ray_session, p):
    from fogray import hyperball as hb

    rng = np.random.RandomState(43)
    n = 200
    src = rng.randint(0, n, 600).astype(np.int64)
    dst = rng.randint(0, n, 600).astype(np.int64)
    t = pa.table({"src": src, "dst": dst})
    blocks = [t.slice(0, 250), t.slice(250, 200), t.slice(450)]
    a = hb.hyperball(rd.from_arrow(blocks), n, max_hops=3).to_pandas()
    b = sharded.hyperball_sharded(
        rd.from_arrow(blocks), n, max_hops=3, num_partitions=p
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_temporal_sharded_parquet_output(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.RandomState(3)
    n = 100
    src, dst = _random_edges(rng, n, 300)
    tt = rng.randint(0, 30, 300).astype(np.int64)
    arr, _ = sharded.temporal_earliest_arrival_sharded((src, dst, tt), n, 0)
    out = str(tmp_path / "arr")
    r = sharded.temporal_earliest_arrival_sharded(
        (src, dst, tt), n, 0, out_dir=out
    )
    assert r == (None, None)
    import glob

    cat = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(out + "/part-*.parquet"))]
    ).sort_by("vid")
    np.testing.assert_array_equal(
        cat.column("value").to_numpy(zero_copy_only=False)[:n], arr
    )


def test_temporal_sharded_time_respecting(ray_session):
    """A path that needs decreasing times must NOT be traversed."""
    # 0 -t=5-> 1 -t=3-> 2 : 2 unreachable; 0 -t=1-> 3 -t=2-> 4 fine
    src = np.array([0, 1, 0, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 4], dtype=np.int64)
    tt = np.array([5, 3, 1, 2], dtype=np.int64)
    arr, reached = sharded.temporal_earliest_arrival_sharded(
        (src, dst, tt), 5, source=0
    )
    assert set(reached.tolist()) == {0, 1, 3, 4}
    assert arr[0] == -1 and arr[1] == 5 and arr[3] == 1 and arr[4] == 2
