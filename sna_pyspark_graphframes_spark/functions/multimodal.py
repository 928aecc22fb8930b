"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas iterators.

Decode is REAL for the uncompressed container formats a pure-Python/NumPy
decoder can handle without codec libraries: 24-bit BMP and binary PPM (P6)
images, and 16-bit PCM WAV audio — ``decode_media`` sniffs magic bytes and
returns decoded pixel / sample arrays. Compressed formats (JPEG, MP3,
video) still need codec libraries that are NOT in this container; they hit
the unknown-format branch, which raises ``NotImplementedError`` (wire
PIL/ffmpeg there on a real cluster). A deterministic digest featurizer
(``_fake_feature``) remains for operators whose job is the Arrow plumbing
contract rather than decoding.

Scale notes: ``mapInPandas`` streams Arrow batches through the Python
worker — constant memory per batch regardless of partition size; binary
payloads never pass through the driver. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it so
batch_rows × payload ≈ tens of MB).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # 'image' | 'audio' | 'video'
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, digest string, "
    "feature array<float>"
)


# ---------------------------------------------------------------------------
# Real codecs (pure Python/NumPy — no external libraries)
# ---------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a 24-bit uncompressed
    BMP (BITMAPINFOHEADER, bottom-up rows, BGR byte order, 4-byte row
    padding — the Windows 3.x baseline every viewer reads)."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up row order, RGB -> BGR
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_bmp(content: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an ``(h, w, 3)`` uint8 RGB
    array. Handles the pixel-data offset from the file header, 4-byte row
    padding, bottom-up vs top-down (negative height) row order, and
    BGR->RGB channel swap."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    offset = struct.unpack_from("<I", content, 10)[0]
    w, h_raw = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP is supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(content: bytes) -> np.ndarray:
    """Decode binary PPM (P6) to ``(h, w, 3)`` uint8 RGB. Parses the
    whitespace/comment-tolerant header per the Netpbm spec."""
    if content[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM is supported")
    raw = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples (``(n,)`` mono or ``(n, ch)``) as a
    canonical RIFF/WAVE file (fmt + data chunks, little-endian)."""
    arr = np.asarray(samples, dtype="<i2")
    n_channels = 1 if arr.ndim == 1 else arr.shape[1]
    data = arr.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """Decode 16-bit PCM RIFF/WAVE to ``(sample_rate, (n, ch) int16)``.
    Walks the chunk list (word-aligned), so files with extra chunks
    (LIST/INFO) decode too."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, sample_rate, n_channels, data = 12, None, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        if cid == b"fmt ":
            fmt_code, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", content, pos + 8
            )
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV is supported (fmt={fmt_code}, bits={bits})"
                )
        elif cid == b"data":
            data = content[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV stream missing fmt or data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    return sample_rate, arr.reshape(-1, n_channels)


def decode_media(content: bytes):
    """Sniff + decode a media payload. Returns ``("image", (h, w, 3)
    uint8)`` or ``("audio", (sample_rate, (n, ch) int16))``. Unknown or
    compressed formats raise ``NotImplementedError`` — that branch is
    where PIL/ffmpeg plug in on a real cluster."""
    if content[:2] == b"BM":
        return "image", decode_bmp(content)
    if content[:2] == b"P6":
        return "image", decode_ppm(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "audio", decode_wav(content)
    raise NotImplementedError(
        "unrecognized/compressed media format; wire PIL/ffmpeg here on a "
        "real cluster (supported without codecs: BMP-24, PPM-P6, WAV-PCM16)"
    )


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: md5-derived pseudo-embedding, so
    tests can assert exact values and the pipeline is reproducible."""
    h = hashlib.md5(content or b"").digest()
    return [round(h[i] / 255.0, 6) for i in range(dim)]


def featurize(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """Extract features from binary media via ``mapInPandas``.

    Input: ``MEDIA_SCHEMA``-shaped DataFrame. Output: ``FEATURE_SCHEMA``.
    Uses the deterministic fake featurizer; swap ``_fake_feature`` for a
    ``decode_media``-based real path (see ``decode_image_stats`` /
    ``decode_audio_stats`` for the decoded equivalents).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "digest": content.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": content.map(_fake_feature),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_ms long, frame_digest string"


def sample_frames(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame sampling: one output row per sampled frame at ``fps``
    frames/second over ``duration_ms`` — ``FRAME_SCHEMA``.

    The real kernel seeks+decodes each frame (ffmpeg — absent here, see
    ``decode_media``'s unknown-format branch); the stand-in derives a
    per-frame digest from
    (content digest, frame index) so row multiplicity, batch shapes and
    per-frame fan-out — the Spark-side contract — are exact and
    oracle-able. Fan-out happens INSIDE the Arrow kernel (one input batch
    → one larger output batch), the same shape a real decoder produces;
    payload bytes cross into Python once per media row, not per frame.
    """
    step_ms = int(1000.0 / fps)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, digs = [], [], [], []
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                base = hashlib.md5(content or b"").hexdigest()
                n = max(0, int(dur)) // step_ms + 1  # frame at t=0 always
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    mss.append(i * step_ms)
                    digs.append(
                        hashlib.md5(f"{base}|{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ms": pd.Series(mss, dtype="int64"),
                    "frame_digest": pd.Series(digs, dtype="object"),
                }
            )

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


THUMB_SCHEMA = "media_id long, out_w int, out_h int, thumb_digest string"


def resize_thumbnails(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Image resize plumbing: ``(media_id, out_w, out_h, thumb_digest)``.

    A real kernel decodes, resizes (PIL — absent here) and re-encodes;
    the stand-in digests (content, WxH) deterministically. One row in →
    one row out, fixed-size metadata back — the batch contract a real
    thumbnailer has."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            base = pdf["content"].map(lambda b: hashlib.md5(b or b"").hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": pd.Series([out_w] * len(pdf), dtype="int32"),
                    "out_h": pd.Series([out_h] * len(pdf), dtype="int32"),
                    "thumb_digest": base.map(
                        lambda d: hashlib.md5(f"{d}|{out_w}x{out_h}".encode()).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(kernel, schema=THUMB_SCHEMA)


# ---------------------------------------------------------------------------
# Real-decode pipeline: planted bytes -> codec -> decoded-value stats.
#
# The planted pixel/sample values are a CLOSED FORM of (media_id, position),
# so a SQL oracle can recompute every decoded value without any decoder —
# the stats only match if the byte-level round trip (row padding, bottom-up
# order, BGR swap, chunk walking, little-endian int16) is decoded correctly.
# The byte FORMAT itself is pinned separately by golden-byte unit tests
# (tests/test_functions.py), so encoder and decoder can't agree on a shared
# mistake.
# ---------------------------------------------------------------------------

IMAGE_STATS_SCHEMA = "media_id long, width int, height int, px_sum long, px_weighted long"
AUDIO_STATS_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "amp_sum long, amp_weighted long"
)


def _plant_pixels(media_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB test image: channel c of pixel (x, y) is
    ``(x + 2y + 17c + media_id) % 256`` — position-sensitive, so any
    row/channel-order decode bug shifts the weighted checksum."""
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return ((x + 2 * y + 17 * c + int(media_id)) % 256).astype(np.uint8)


def _plant_samples(media_id: int, n: int) -> np.ndarray:
    """Deterministic mono PCM: sample i is ``(media_id*31 + i*7) % 2000
    - 1000`` — signed, position-sensitive."""
    i = np.arange(n, dtype=np.int64)
    return ((int(media_id) * 31 + i * 7) % 2000 - 1000).astype(np.int16)


def planted_bmp_media(ids: DataFrame, w: int = 8, h: int = 6) -> DataFrame:
    """``(media_id, content)`` with content = real BMP bytes of the
    planted image. The encode runs distributed inside the Arrow kernel;
    bytes never touch the driver."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["media_id"].map(
                        lambda m: encode_bmp(_plant_pixels(m, w, h))
                    ),
                }
            )

    src = ids.select(F.col(ids.columns[0]).cast("long").alias("media_id"))
    return src.mapInPandas(kernel, schema="media_id long, content binary")


def planted_wav_media(ids: DataFrame, n_samples: int = 240, rate: int = 8000) -> DataFrame:
    """``(media_id, content)`` with content = real RIFF/WAVE PCM16 bytes
    of the planted sample stream."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["media_id"].map(
                        lambda m: encode_wav(_plant_samples(m, n_samples), rate)
                    ),
                }
            )

    src = ids.select(F.col(ids.columns[0]).cast("long").alias("media_id"))
    return src.mapInPandas(kernel, schema="media_id long, content binary")


def decode_image_stats(media: DataFrame) -> DataFrame:
    """REAL image decode via ``decode_media`` (no doc_id peeking — the
    kernel sees only bytes), reduced to oracle-able per-image stats:
    dimensions, pixel sum, and the row-major position-weighted sum
    ``Σ i·v`` (order-sensitive — catches padding/flip/channel bugs)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums, wsums = [], [], [], []
            for content in pdf["content"]:
                kind, px = decode_media(bytes(content))
                assert kind == "image"
                hh, ww = px.shape[:2]
                flat = px.reshape(-1).astype(np.int64)
                ws.append(ww)
                hs.append(hh)
                sums.append(int(flat.sum()))
                wsums.append(int((np.arange(flat.size) * flat).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "px_sum": pd.Series(sums, dtype="int64"),
                    "px_weighted": pd.Series(wsums, dtype="int64"),
                }
            )

    return media.mapInPandas(kernel, schema=IMAGE_STATS_SCHEMA)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode via ``decode_media``, reduced to oracle-able
    per-clip stats: rate/channels/length, amplitude sum, and the
    position-weighted amplitude sum."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, chans, ns, sums, wsums = [], [], [], [], []
            for content in pdf["content"]:
                kind, (rate, arr) = decode_media(bytes(content))
                assert kind == "audio"
                flat = arr.reshape(-1).astype(np.int64)
                rates.append(rate)
                chans.append(arr.shape[1])
                ns.append(arr.shape[0])
                sums.append(int(flat.sum()))
                wsums.append(int((np.arange(flat.size) * flat).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_channels": pd.Series(chans, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "amp_sum": pd.Series(sums, dtype="int64"),
                    "amp_weighted": pd.Series(wsums, dtype="int64"),
                }
            )

    return media.mapInPandas(kernel, schema=AUDIO_STATS_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for tests: treat document text bytes as opaque media payloads
    (the container ships no real image/audio fixtures). ``duration_ms`` is
    derived from ``n_chars`` (deterministic) so duration-driven operators
    (frame sampling) have real fan-out to exercise."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


def audio_frame_energy(media: DataFrame, frame: int = 80) -> DataFrame:
    """``(media_id, frame_idx, n, energy, peak)`` — fixed-width PCM
    frame energies from REAL WAV bytes: per ``frame``-sample window the
    sample count, Σ s² and max |s| — the voice-activity / silence-trim
    primitive of audio data curation (energy thresholding is the
    standard first filter before any model-based VAD). The decode walks
    the RIFF chunk list (``decode_media``); the per-frame math is int64
    — integer arithmetic end to end, so the output is hash-exact in any
    engine. Mono is flattened channel-interleaved (matching
    ``decode_audio_stats``' convention). One Arrow ``mapInPandas``
    kernel — bytes-in, O(n_samples/frame) narrow rows out; frames
    shorter than ``frame`` at the clip tail keep their true ``n``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, fidx, ns, energies, peaks = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                kind, (rate, arr) = decode_media(bytes(content))
                assert kind == "audio"
                s = arr.reshape(-1).astype(np.int64)
                for f0 in range(0, len(s), frame):
                    w = s[f0 : f0 + frame]
                    mids.append(mid)
                    fidx.append(f0 // frame)
                    ns.append(len(w))
                    energies.append(int((w * w).sum()))
                    peaks.append(int(np.abs(w).max()) if len(w) else 0)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "n": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "peak": pd.Series(peaks, dtype="int64"),
                }
            )

    return media.mapInPandas(
        kernel,
        schema="media_id long, frame_idx int, n long, energy long, peak long",
    )
