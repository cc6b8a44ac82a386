"""Multimodal-column plumbing: opaque ``binary`` payload columns with
typed metadata, decoded / featurized by an actor-pool stage.

The container has no codec libraries, so the generic DECODE step is a
deterministic stub (documented below) and everything around it — the
payload schema, small-batch actor-pool ``map_batches`` signature,
once-per-actor model setup, and the feature output layout — is the real
Ray plumbing a production decode stage uses. For the one real image
format decodable WITHOUT a codec library — binary P6 PPM — the decode
is REAL: :func:`decode_ppm` parses and validates actual image bytes
and :class:`PpmStats` is the actor-pool stage over them (query
``mm_ppm_decode``, value-gated by a SQL pixel-formula replay).

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
# REAL image decode: binary P6 PPM (pure numpy — no codec library)
# ---------------------------------------------------------------------------
#
# The container has no PIL/libjpeg, but P6 PPM is a real binary image
# format (magic + ASCII dims + maxval + raw RGB bytes) decodable in
# pure numpy — so this stage exercises an ACTUAL byte-level decode
# (magic check, header parse, size validation, channel split), not the
# ``decode_stub`` byte tiling. Pixels are synthesized from a
# deterministic per-(doc, pixel) formula, which a SQL oracle replays
# exactly with generate_series — the decode output is value-gated.

def synthesize_ppm(ds, *, id_col: str = "doc_id") -> rd.Dataset:
    """Per document, build a REAL binary P6 PPM payload: header
    ``P6\\n{w} {h}\\n255\\n`` + w*h*3 raw RGB bytes with
    pixel[k] = (doc_id*31 + k*7) mod 256; w = 8 + doc_id%9,
    h = 8 + doc_id%7. Pixel bytes are vectorized (one expand_ranges
    gather per batch); only the tiny per-row headers loop."""

    def build(t: pa.Table) -> pa.Table:
        from ..engine import expand_ranges

        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "payload": pa.array([], pa.binary()),
                }
            )
        w = 8 + ids % 9
        h = 8 + ids % 7
        npx = w * h * 3
        headers = [b"P6\n%d %d\n255\n" % (wi, hi) for wi, hi in zip(w, h)]
        hlen = np.fromiter((len(x) for x in headers), dtype=np.int64, count=n)
        # vectorized pixel synthesis: global positions -> local k via
        # per-row start subtraction, value = (doc_id*31 + 7k) mod 256
        starts = np.concatenate([[0], np.cumsum(npx)[:-1]])
        flat = expand_ranges(starts, starts + npx)
        k = flat - np.repeat(starts, npx)
        vals = ((np.repeat(ids, npx) * 31 + k * 7) % 256).astype(np.uint8)
        sizes = hlen + npx
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(sizes, out=offsets[1:])
        buf = np.empty(int(sizes.sum()), dtype=np.uint8)
        pos = 0
        pstarts = starts
        for i in range(n):  # header writes: tiny per-row memcpy
            buf[pos : pos + hlen[i]] = np.frombuffer(headers[i], dtype=np.uint8)
            pos += int(hlen[i])
            buf[pos : pos + npx[i]] = vals[pstarts[i] : pstarts[i] + npx[i]]
            pos += int(npx[i])
        payload = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
        )
        return pa.table({"doc_id": pa.array(ids), "payload": payload})

    return ds.map_batches(build, batch_format="pyarrow")


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL P6 parser: validate magic + maxval + payload size, return
    (width, height, uint8 RGB array of length w*h*3)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    nl1 = payload.index(b"\n")
    nl2 = payload.index(b"\n", nl1 + 1)
    nl3 = payload.index(b"\n", nl2 + 1)
    w, h = (int(x) for x in payload[nl1 + 1 : nl2].split())
    if int(payload[nl2 + 1 : nl3]) != 255:
        raise ValueError("unsupported maxval")
    px = np.frombuffer(payload, dtype=np.uint8, offset=nl3 + 1)
    if len(px) != w * h * 3:
        raise ValueError("truncated pixel payload")
    return w, h, px


class PpmStats:
    """Actor-pool decode stage: parse each P6 payload (REAL header
    validation per row), then compute all pixel statistics VECTORIZED
    across the batch — one concat + frombuffer, per-channel
    ``add.reduceat`` (image starts are multiples of 3, so global
    index mod 3 IS the channel), min/max reduceat per image."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        dims, parts = [], []
        for b in t.column("payload").to_pylist():
            w, h, px = decode_ppm(b)
            dims.append((w, h))
            parts.append(px)
        n = len(ids)
        if n == 0:
            return _PPM_STATS_SCHEMA.empty_table()
        allpx = np.concatenate(parts).astype(np.int64)
        sizes = np.array([w * h * 3 for w, h in dims], dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        csum = [
            np.add.reduceat(allpx[c::3], starts // 3) for c in range(3)
        ]
        pmin = np.minimum.reduceat(allpx, starts)
        pmax = np.maximum.reduceat(allpx, starts)
        per_ch = sizes // 3
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(np.array([d[0] for d in dims], np.int64)),
                "height": pa.array(np.array([d[1] for d in dims], np.int64)),
                "sum_r": pa.array(csum[0]),
                "sum_g": pa.array(csum[1]),
                "sum_b": pa.array(csum[2]),
                "mean_r": pa.array(sql_round(csum[0] / per_ch)),
                "mean_g": pa.array(sql_round(csum[1] / per_ch)),
                "mean_b": pa.array(sql_round(csum[2] / per_ch)),
                "min_pix": pa.array(pmin),
                "max_pix": pa.array(pmax),
            },
            schema=_PPM_STATS_SCHEMA,
        )


_PPM_STATS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("sum_r", pa.int64()),
        ("sum_g", pa.int64()),
        ("sum_b", pa.int64()),
        ("mean_r", pa.float64()),
        ("mean_g", pa.float64()),
        ("mean_b", pa.float64()),
        ("min_pix", pa.int64()),
        ("max_pix", pa.int64()),
    ]
)


def ppm_decode_stats(ds, *, concurrency: int = 4,
                     batch_size: int = 64) -> rd.Dataset:
    """documents -> real P6 PPM payloads -> actor-pool decode+stats."""
    return synthesize_ppm(ds).map_batches(
        PpmStats,
        concurrency=(1, concurrency),
        batch_size=batch_size,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# REAL audio decode: RIFF/WAVE PCM16 mono (pure numpy — no codec lib)
# ---------------------------------------------------------------------------
#
# Same discipline as the P6 image decode: RIFF/WAVE with 16-bit PCM is
# a real binary audio container parseable without a codec library, so
# this stage decodes ACTUAL audio bytes (chunk magic, fmt fields, data
# size all validated), with samples from a deterministic per-(doc, k)
# formula a SQL oracle replays exactly.

_WAV_RATE = 8000


def synthesize_wav(ds, *, id_col: str = "doc_id") -> rd.Dataset:
    """Per document, build a REAL RIFF/WAVE payload: canonical 44-byte
    header (PCM, mono, 16-bit, 8 kHz) + n = 64 + doc_id%129 samples
    with sample[k] = ((doc_id*37 + k*11) mod 65536) - 32768."""
    import struct

    def build(t: pa.Table) -> pa.Table:
        from ..engine import expand_ranges

        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "payload": pa.array([], pa.binary()),
                }
            )
        ns = 64 + ids % 129
        starts = np.concatenate([[0], np.cumsum(ns)[:-1]])
        flat = expand_ranges(starts, starts + ns)
        k = flat - np.repeat(starts, ns)
        samples = (
            ((np.repeat(ids, ns) * 37 + k * 11) % 65536) - 32768
        ).astype("<i2")
        sizes = 44 + ns * 2
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(sizes, out=offsets[1:])
        buf = np.empty(int(sizes.sum()), dtype=np.uint8)
        pos = 0
        for i in range(n):  # 44-byte header writes: tiny per-row memcpy
            data_len = int(ns[i]) * 2
            hdr = struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 36 + data_len, b"WAVE", b"fmt ", 16,
                1, 1, _WAV_RATE, _WAV_RATE * 2, 2, 16,
                b"data", data_len,
            )
            buf[pos : pos + 44] = np.frombuffer(hdr, dtype=np.uint8)
            pos += 44
            raw = samples[starts[i] : starts[i] + ns[i]].view(np.uint8)
            buf[pos : pos + data_len] = raw
            pos += data_len
        payload = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
        )
        return pa.table({"doc_id": pa.array(ids), "payload": payload})

    return ds.map_batches(build, batch_format="pyarrow")


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL RIFF/WAVE parser for canonical PCM16 mono files: validate
    RIFF/WAVE/fmt/data magic, PCM format, channel count, bit depth and
    sizes; return (sample_rate, int16 sample array)."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    if payload[12:16] != b"fmt ":
        raise ValueError("missing fmt chunk")
    fmt_len, audio_fmt, channels, rate = struct.unpack("<IHHI", payload[16:28])
    bits = struct.unpack("<H", payload[34:36])[0]
    if fmt_len != 16 or audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError("unsupported WAV encoding")
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    data_len = struct.unpack("<I", payload[40:44])[0]
    if len(payload) != 44 + data_len or data_len % 2:
        raise ValueError("truncated sample payload")
    return rate, np.frombuffer(payload, dtype="<i2", offset=44)


_WAV_STATS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("sample_rate", pa.int64()),
        ("n_samples", pa.int64()),
        ("sum_amp", pa.int64()),
        ("sum_sq", pa.int64()),
        ("min_amp", pa.int64()),
        ("max_amp", pa.int64()),
        ("rms", pa.float64()),
    ]
)


class WavStats:
    """Actor-pool decode stage: parse each RIFF payload (REAL header
    validation per row), then batch-vectorized stats: exact int64
    amplitude/square sums + min/max via per-clip reduceat, RMS rounded
    like the oracle."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        rates, parts = [], []
        for b in t.column("payload").to_pylist():
            rate, samp = decode_wav(b)
            rates.append(rate)
            parts.append(samp)
        if len(ids) == 0:
            return _WAV_STATS_SCHEMA.empty_table()
        alls = np.concatenate(parts).astype(np.int64)
        ns = np.array([len(p) for p in parts], dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(ns)[:-1]])
        ssum = np.add.reduceat(alls, starts)
        ssq = np.add.reduceat(alls * alls, starts)
        smin = np.minimum.reduceat(alls, starts)
        smax = np.maximum.reduceat(alls, starts)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(np.asarray(rates, dtype=np.int64)),
                "n_samples": pa.array(ns),
                "sum_amp": pa.array(ssum),
                "sum_sq": pa.array(ssq),
                "min_amp": pa.array(smin),
                "max_amp": pa.array(smax),
                "rms": pa.array(sql_round(np.sqrt(ssq / ns))),
            },
            schema=_WAV_STATS_SCHEMA,
        )


def wav_decode_stats(ds, *, concurrency: int = 4,
                     batch_size: int = 64) -> rd.Dataset:
    """documents -> real RIFF/WAVE payloads -> actor-pool decode+stats."""
    return synthesize_wav(ds).map_batches(
        WavStats,
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
