"""Multimodal-column plumbing: opaque ``binary`` payload columns with
typed metadata, decoded / featurized by an actor-pool stage.

The container has no image/audio codecs, so the DECODE step is a
deterministic stub (documented below); everything around it — the
payload schema, small-batch actor-pool ``map_batches`` signature,
once-per-actor model setup, and the feature output layout — is the real
Ray plumbing a production decode stage uses.

Schema: ``(doc_id:int64, media_type:string, payload:binary,
width:int32, height:int32)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..util import sql_round

FEATURE_DIM = 8


def synthesize_media(ds, *, text_col: str = "text") -> rd.Dataset:
    """Derive a deterministic fake media payload per document (stand-in
    for reading real image bytes): payload = repeated sha256 stream of
    the text, sized by text length; metadata columns are real."""

    def to_media(t: pa.Table) -> pa.Table:
        from ..engine import expand_ranges

        texts = t.column(text_col).to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "media_type": pa.array([], pa.string()),
                    "payload": pa.array([], pa.binary()),
                    "width": pa.array([], pa.int32()),
                    "height": pa.array([], pa.int32()),
                }
            )
        # per-row sha256 stays a (cheap, 32-byte) loop — everything
        # O(payload bytes) below is vectorized: one (n, 1280) byte
        # tile of the seeds, rows sliced to size with a single
        # expand_ranges gather, and the Arrow binary column built
        # straight from the (offsets, values) buffers.
        seeds = np.frombuffer(
            b"".join(hashlib.sha256(s.encode()).digest() for s in texts),
            dtype=np.uint8,
        ).reshape(n, 32)
        ln = np.fromiter((len(s) for s in texts), dtype=np.int64, count=n)
        size = 256 + (ln % 1024)  # < 1280 = 40 seed reps, always
        tiled = np.tile(seeds, (1, 40))
        flat_pos = expand_ranges(np.arange(n, dtype=np.int64) * 1280,
                                 np.arange(n, dtype=np.int64) * 1280 + size)
        values = tiled.reshape(-1)[flat_pos]
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(size, out=offsets[1:])
        payload = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(values.tobytes())],
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "media_type": pa.array(["image/x-synthetic"] * n),
                "payload": payload,
                "width": pa.array((16 + ln % 48).astype(np.int32)),
                "height": pa.array((16 + (ln * 7) % 48).astype(np.int32)),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


def decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB for the real image decode (no codecs in this container).
    Returns a deterministic pseudo-pixel array shaped (height, width)
    from the payload bytes — the stand-in for e.g. PIL/libjpeg output.
    A production build replaces ONLY this function."""
    b = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    reps = need // len(b) + 1
    return np.tile(b, reps)[:need].reshape(height, width)


class MediaFeaturizer:
    """Actor-pool decode+featurize stage.

    __init__ = the once-per-actor "model load" (here: a seeded random
    projection matrix — the stand-in for loading CLIP/ResNet weights).
    __call__ = per (small) batch: decode each payload (stub), byte
    histogram (vectorized), project to FEATURE_DIM. Use small
    ``batch_size`` for large payloads so batch x concurrency fits in
    the worker heap.
    """

    def __init__(self, seed: int = 13):
        rng = np.random.RandomState(seed)
        self.proj = rng.standard_normal((256, FEATURE_DIM))

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        widths = t.column("width").to_numpy(zero_copy_only=False)
        heights = t.column("height").to_numpy(zero_copy_only=False)
        feats = np.zeros((len(t), FEATURE_DIM), dtype=np.float64)
        for i, payload in enumerate(t.column("payload").to_pylist()):
            px = decode_stub(payload, int(widths[i]), int(heights[i]))
            hist = np.bincount(px.ravel(), minlength=256).astype(np.float64)
            hist /= max(hist.sum(), 1.0)
            feats[i] = hist @ self.proj
        cols: dict = {"doc_id": pa.array(ids, type=pa.int64())}
        for j in range(FEATURE_DIM):
            cols[f"feat_{j}"] = pa.array(sql_round(feats[:, j]))
        return pa.table(cols)


def media_features(ds, *, concurrency: int = 4, batch_size: int = 64) -> rd.Dataset:
    """documents -> synthesized media -> actor-pool featurize."""
    media = synthesize_media(ds)
    return media.map_batches(
        MediaFeaturizer,
        concurrency=(1, concurrency),
        batch_size=batch_size,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# video-style frame sampling over opaque binary payloads
# ---------------------------------------------------------------------------

FRAME_BYTES = 48


def sample_frames(ds, *, fractions=(0.0, 0.25, 0.5, 0.75, 1.0)) -> rd.Dataset:
    """Treat each payload as a frame stream (``FRAME_BYTES`` bytes per
    frame, trailing partial frame dropped) and deterministically sample
    the frames at the given stream fractions — the video analog of the
    image decode stage: chunk -> stride-sample -> per-frame fingerprint.
    Output: (doc_id, frame_idx, frame_fp hex16, n_frames), one row per
    distinct sampled frame.

    Pure ``map_batches`` (no shuffle); per-payload chunking is the
    decode-shaped work a real video pipeline does per row, with a small
    batch size keeping batch x concurrency bounded for large payloads.
    Because the synthetic payload is a tiled sha256 stream, each frame's
    leading 16 bytes are a rotation of the digest — which is what makes
    the stage SQL-mirrorable (substr over sha || sha)."""

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("frame_idx", pa.int64()),
            ("frame_fp", pa.string()),
            ("n_frames", pa.int64()),
        ]
    )

    def frames(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_k, out_fp, out_n = [], [], [], []
        for i, payload in enumerate(t.column("payload").to_pylist()):
            n = len(payload) // FRAME_BYTES
            if n == 0:
                continue
            ks = sorted({int(np.floor(q * (n - 1))) for q in fractions})
            for k in ks:
                frame = payload[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                out_id.append(int(ids[i]))
                out_k.append(k)
                out_fp.append(frame[:16].hex())
                out_n.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_k, pa.int64()),
                "frame_fp": pa.array(out_fp, pa.string()),
                "n_frames": pa.array(out_n, pa.int64()),
            },
            schema=out_schema,
        )

    return ds.map_batches(frames, batch_size=64, batch_format="pyarrow")


def media_frame_samples(ds) -> rd.Dataset:
    """documents -> synthesized media -> frame sampling."""
    return sample_frames(synthesize_media(ds))
