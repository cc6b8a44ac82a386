"""Graph sources/sinks: the reference ``convert`` front-end rebuilt on
Ray Data.

FOG ingests SNAP-style text graphs through ``convert`` and stores a
binary CSR package (``.desc``/``.index``/``.edge``/``.attr``; see
SURVEY.md section 2.1). The rebuild's canonical interchange format is
the (src, dst, weight) Parquet edge table; these readers cover the two
reference text formats so existing FOG inputs can be ingested:

- :func:`read_edgelist` — ``src\\tdst`` lines with ``#`` comments
  (convert/process_edgelist.cpp:55-314, read_one_edge :347-362).
- :func:`read_adjlist` — ``src n d1 d2 ...`` lines
  (convert/process_adjlist.cpp:32-271).
- deterministic hash-derived weights replace the reference's
  convert-time ``rand()`` weights (process_adjlist.cpp:25-30) so
  downstream results are reproducible (SURVEY.md S6).
- :func:`write_graph_meta` / :func:`read_graph_meta` — the ``.desc``
  metadata sidecar (convert/convert.cpp:144-153; parsed at
  fogsrc/main.cpp:202-212) as JSON next to the edge parquet.
- :func:`write_edges_parquet` — partitioned parquet sink (the
  ``.edge``/``.index`` analog; CSR itself is built lazily inside
  engine actors, fogray.engine / fogray.dist_engine).

Everything streams: text parsing is a vectorized ``map_batches`` over
``read_text`` blocks (pyarrow.compute split/cast — no Python loop per
line), so a multi-TB edge list never funnels through the driver.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

EDGE_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("weight", pa.float64())]
)


def splitmix53(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer truncated to 53 bits (uint64 in/out) — the
    repo's one deterministic hash, shared by the weight generator and
    the random-walk step chooser; each user has an exact DuckDB mirror
    (mod-2^64 HUGEINT arithmetic)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return x >> np.uint64(11)


def det_weight(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Deterministic per-edge weight in [0, 10) — the reproducible
    replacement for convert's ``10.0*rand()/(RAND_MAX+1)``
    (process_adjlist.cpp:25-30): a splitmix-style integer hash of
    (src, dst) scaled to the same range."""
    x = (src.astype(np.uint64) << np.uint64(32)) ^ dst.astype(np.uint64)
    return splitmix53(x).astype(np.float64) / float(1 << 53) * 10.0


def _finish(src: np.ndarray, dst: np.ndarray, weighted: bool) -> pa.Table:
    cols = {"src": src.astype(np.int64), "dst": dst.astype(np.int64)}
    cols["weight"] = (
        det_weight(cols["src"], cols["dst"])
        if weighted
        else np.ones(len(src), dtype=np.float64)
    )
    return pa.table(cols, schema=EDGE_SCHEMA)


def read_edgelist(path: str, *, weighted: bool = False) -> rd.Dataset:
    """SNAP edge-list text -> (src, dst, weight) Dataset. Lines are
    ``src<ws>dst``; ``#``-prefixed lines are comments (the reference
    skips them at process_edgelist.cpp:356). ``weighted=True`` mirrors
    convert's type1 output with deterministic weights."""

    def parse(batch: pa.Table) -> pa.Table:
        text = pc.utf8_trim_whitespace(batch.column("text"))
        keep = pc.and_(
            pc.invert(pc.starts_with(text, "#")), pc.not_equal(text, "")
        )
        text = text.filter(keep)
        if len(text) == 0:
            return EDGE_SCHEMA.empty_table()
        # comma -> space + whitespace split: same [\s,]+ tokenization as
        # a regex split, via two non-regex kernels (~5x faster)
        parts = pc.utf8_split_whitespace(pc.replace_substring(text, ",", " "))
        src = pc.list_element(parts, 0).cast(pa.int64()).to_numpy(zero_copy_only=False)
        dst = pc.list_element(parts, 1).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return _finish(src, dst, weighted)

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def read_adjlist(path: str, *, weighted: bool = False) -> rd.Dataset:
    """SNAP adjacency-list text -> (src, dst, weight) Dataset. Lines are
    ``src n_neighbors d1 d2 ...`` (process_adjlist.cpp:80-160);
    vectorized via list-flatten (the per-line neighbor loop of the
    reference becomes one value_lengths/repeat)."""

    def parse(batch: pa.Table) -> pa.Table:
        text = pc.utf8_trim_whitespace(batch.column("text"))
        keep = pc.and_(
            pc.invert(pc.starts_with(text, "#")), pc.not_equal(text, "")
        )
        text = text.filter(keep)
        if len(text) == 0:
            return EDGE_SCHEMA.empty_table()
        parts = pc.utf8_split_whitespace(pc.replace_substring(text, ",", " ")).cast(
            pa.list_(pa.int64())
        )
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(parts).to_numpy(zero_copy_only=False)
        # per line: [src, n, d1..dn] — degree from the line length, NOT
        # the declared n (the reference trusts n; we validate instead)
        deg = lens - 2
        if (deg < 0).any():
            raise ValueError("adjlist line with fewer than 2 fields")
        starts = np.cumsum(lens) - lens
        srcs = flat[starts]
        declared = flat[starts + 1]
        if (declared != deg).any():
            bad = int(srcs[np.flatnonzero(declared != deg)[0]])
            raise ValueError(f"adjlist: declared degree mismatch at vertex {bad}")
        src = np.repeat(srcs, deg)
        mask = np.ones(len(flat), dtype=bool)
        mask[starts] = False
        mask[starts + 1] = False
        dst = flat[mask]
        return _finish(src, dst, weighted)

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


@ray.remote
def _meta_partial(t: pa.Table):
    # empty blocks can carry a bare/upstream schema (Ray skips the map
    # UDF for them) — they contribute nothing either way
    if t.num_rows == 0 or "src" not in t.schema.names:
        return None
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    u, c = np.unique(s, return_counts=True)
    return (int(s.min()), int(s.max()), int(d.min()), int(d.max()), len(s), u, c)


def graph_meta(edges: rd.Dataset) -> dict:
    """Compute the ``.desc`` facts (convert.cpp:144-153) from an edge
    Dataset: min/max vid, edge count, max out degree. ONE pass of
    per-block partials (no groupby — a degree shuffle costs an
    all-to-all where per-block (src, count) partials combine driver-side
    into an O(V) dense array, the same broadcast-scale state the
    engines already hold)."""
    parts = [
        p
        for p in ray.get(
            [_meta_partial.remote(r) for r in edges.materialize().to_arrow_refs()]
        )
        if p is not None
    ]
    if not parts:
        return {
            "min_vertex_id": 0,
            "max_vertex_id": 0,
            "num_edges": 0,
            "max_out_edges": 0,
            "with_weights": True,
        }
    max_src = max(p[1] for p in parts)
    deg = np.zeros(max_src + 1, dtype=np.int64)
    for _, _, _, _, _, u, c in parts:
        np.add.at(deg, u, c)
    return {
        "min_vertex_id": int(min(min(p[0] for p in parts), min(p[2] for p in parts))),
        "max_vertex_id": int(max(max_src, max(p[3] for p in parts))),
        "num_edges": int(sum(p[4] for p in parts)),
        "max_out_edges": int(deg.max()),
        "with_weights": True,
    }


def write_graph_meta(meta: dict, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "graph.desc.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, path)
    return path


def read_graph_meta(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "graph.desc.json")) as f:
        return json.load(f)


def write_edges_parquet(edges: rd.Dataset, out_dir: str, *, meta: dict | None = None) -> dict:
    """Edge table sink: partitioned parquet (never one giant file) plus
    the metadata sidecar — the rebuild's whole ``convert`` output
    package. Returns the metadata written."""
    edges = edges.materialize()
    edges.write_parquet(out_dir)
    meta = meta or graph_meta(edges)
    write_graph_meta(meta, out_dir)
    return meta


def read_edges_parquet(out_dir: str) -> tuple[rd.Dataset, dict]:
    return rd.read_parquet(out_dir, file_extensions=["parquet"]), read_graph_meta(out_dir)


def read_edges_csv(path: str, *, weighted: bool = False) -> rd.Dataset:
    """CSV edge source (``src,dst`` with header) -> (src, dst, weight)
    Dataset via ``ray.data.read_csv`` — Arrow's native CSV reader with
    explicit column types (no schema inference drift across shards), a
    third on-disk edge format next to the SNAP text readers."""
    import pyarrow.csv as pacsv

    ds = rd.read_csv(
        path,
        convert_options=pacsv.ConvertOptions(
            column_types={"src": pa.int64(), "dst": pa.int64()}
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        return _finish(src, dst, weighted)

    return ds.map_batches(finish, batch_format="pyarrow")


def read_edges_jsonl(path: str, *, weighted: bool = False) -> rd.Dataset:
    """JSON-lines edge source (``{"src": s, "dst": d}`` per line) ->
    (src, dst, weight) Dataset via ``ray.data.read_json``."""
    ds = rd.read_json(path)

    def finish(t: pa.Table) -> pa.Table:
        src = t.column("src").cast(pa.int64()).to_numpy(zero_copy_only=False)
        dst = t.column("dst").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return _finish(src, dst, weighted)

    return ds.map_batches(finish, batch_format="pyarrow")
