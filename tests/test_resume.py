"""Checkpoint/resume: kill after superstep k, resume, byte-identical
final state (FIXTURES.md F2 resume tests; north_rule resumability)."""

import json
import os

import numpy as np
import pytest

from fogray import algorithms as alg
from fogray import fixtures as fx
from fogray import oracle as orc
from fogray.checkpoint import latest_checkpoint, load_checkpoint, write_checkpoint
from fogray.config import EngineConfig
from fogray.engine import GraphEngine
from fogray.programs import PROGRAMS


@pytest.fixture(scope="module")
def eng(ray_session):
    src, dst, w, n = fx.random_graph(128, 0.04, seed=17)
    e = GraphEngine(n, arrays=(src, dst, w), cfg=EngineConfig(num_partitions=3))
    yield e, (src, dst, w, n)
    e.shutdown()


def test_pagerank_resume_identical(eng, tmp_path):
    e, (src, dst, w, n) = eng
    full = alg.pagerank(e, niters=10)

    ck = str(tmp_path / "pr")
    # run with checkpoints, then "crash after superstep 4" by deleting
    # every later checkpoint (LATEST now dangles -> scan fallback)
    alg.pagerank(e, niters=10, ckpt_dir=ck)
    import shutil

    for d in sorted(os.listdir(ck)):
        if d.startswith("iter=") and int(d.split("=")[1]) > 4:
            shutil.rmtree(os.path.join(ck, d))
    found = latest_checkpoint(ck)
    assert found is not None and found.endswith("iter=000004")
    resumed = alg.pagerank(e, niters=10, ckpt_dir=ck, resume=True)
    np.testing.assert_array_equal(resumed.state["rank"], full.state["rank"])
    np.testing.assert_allclose(
        resumed.state["rank"], orc.pagerank_fog(src, dst, n, 10), rtol=1e-6
    )


def test_cc_resume_identical(eng, tmp_path):
    e, (src, dst, w, n) = eng
    full = alg.connected_components(e)
    ck = str(tmp_path / "cc")
    # run with checkpoints, then clobber state and resume from an early one
    alg.connected_components(e, ckpt_dir=ck)
    # simulate crash: delete every checkpoint after iter 1
    iters = sorted(d for d in os.listdir(ck) if d.startswith("iter="))
    assert len(iters) >= 2
    import shutil

    for d in iters[1:]:
        shutil.rmtree(os.path.join(ck, d))
    resumed = alg.connected_components(e, ckpt_dir=ck, resume=True)
    np.testing.assert_array_equal(
        resumed.state["component_root"], full.state["component_root"]
    )


def test_scc_resume_identical(eng, tmp_path):
    e, (src, dst, w, n) = eng
    full = alg.scc(e)
    ck = str(tmp_path / "scc")
    alg.scc(e, ckpt_dir=ck)
    iters = sorted(d for d in os.listdir(ck) if d.startswith("iter="))
    import shutil

    keep = max(1, len(iters) // 2)
    for d in iters[keep:]:
        shutil.rmtree(os.path.join(ck, d))
    # LATEST now dangles; latest_checkpoint must fall back to a scan
    resumed = alg.scc(e, ckpt_dir=ck, resume=True)
    np.testing.assert_array_equal(
        resumed.state["component_root"], full.state["component_root"]
    )
    np.testing.assert_array_equal(resumed.state["found"], full.state["found"])


def test_manifest_lineage_and_corruption(tmp_path):
    state = {"x": np.arange(10, dtype=np.float64)}
    frontier = np.zeros(10, dtype=bool)
    path = write_checkpoint(str(tmp_path), 3, "prog", {"a": 1}, state, frontier, [], shards=3)
    man = json.load(open(os.path.join(path, "manifest.json")))
    assert man["iteration"] == 3
    assert len(man["shards"]) == 3
    assert sum(s["rows"] for s in man["shards"]) == 10
    for s in man["shards"]:
        assert len(s["sha256"]) == 64
    st, fr, it, _ = load_checkpoint(path, "prog", {"a": 1})
    np.testing.assert_array_equal(st["x"], state["x"])
    assert it == 3
    # wrong params refuse to load
    with pytest.raises(ValueError):
        load_checkpoint(path, "prog", {"a": 2})
    # corrupt a shard: detected by sha mismatch
    shard = os.path.join(path, man["shards"][0]["file"])
    with open(shard, "ab") as f:
        f.write(b"junk")
    with pytest.raises(ValueError, match="corrupt"):
        load_checkpoint(path, "prog", {"a": 1})
    # and latest_checkpoint still finds nothing newer/complete... the dir
    # is complete by file-presence, so pointer still resolves:
    assert latest_checkpoint(str(tmp_path)) == path


def test_resume_without_checkpoint_starts_fresh(eng, tmp_path):
    e, (src, dst, w, n) = eng
    res = alg.bfs(e, root=0, ckpt_dir=str(tmp_path / "nothing"), resume=True)
    np.testing.assert_array_equal(
        res.state["bfs_level"].astype(np.uint64), orc.bfs_fog(src, dst, n, 0)
    )


def test_run_job_cli_output_manifest(ray_session, tmp_path):
    """run_job end-to-end via main(): synthetic repo table -> pagerank ->
    partitioned parquet output with a _MANIFEST.json whose per-partition
    lineage (vid ranges, rows, sha256) matches the files on disk."""
    import hashlib
    import json
    import os

    import pyarrow.parquet as pq

    from fogray.run_job import main

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ckpt")
    rc = main([
        "--algorithm", "pagerank", "--synthetic-repos", "8",
        "--files-per-repo", "12", "--niters", "3",
        "--output", out, "--output-shards", "4", "--ckpt-dir", ck,
    ])
    assert rc == 0
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        man = json.load(f)
    assert man["algorithm"] == "pagerank" and man["supersteps"] >= 3
    assert "rank" in man["state_fields"]
    total = 0
    for s in man["shards"]:
        p = os.path.join(out, s["file"])
        with open(p, "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == s["sha256"]
        t = pq.read_table(p)
        assert t.num_rows == s["rows"] == s["vid_hi"] - s["vid_lo"]
        total += t.num_rows
    assert total == man["num_vertices"]
    # checkpoints were written and are resumable
    from fogray.checkpoint import latest_checkpoint

    assert latest_checkpoint(ck) is not None


def test_write_result_column_order_insertion_invariant(tmp_path):
    """A fresh run and a checkpoint-resumed run build the state dict in
    different insertion orders; the sharded writer must emit identical
    bytes for both (the resume invariant extends to the output)."""
    import glob

    import pyarrow.parquet as pq

    from fogray.run_job import _write_result

    n = 40
    a = {"rank": np.arange(n, dtype=np.float64), "outdeg": np.ones(n)}
    b = {"outdeg": np.ones(n), "rank": np.arange(n, dtype=np.float64)}
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    _write_result(a, n, da, 3, {"algorithm": "x"})
    _write_result(b, n, db, 3, {"algorithm": "x"})
    fa = sorted(glob.glob(da + "/part-*.parquet"))
    fb = sorted(glob.glob(db + "/part-*.parquet"))
    assert fa and len(fa) == len(fb)
    for pa_, pb_ in zip(fa, fb):
        assert pq.read_table(pa_).equals(pq.read_table(pb_))
