"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas iterators.

The decode step itself (JPEG decode, audio resample, video frame-sample)
needs codec libraries that are NOT in this container — it is stubbed behind
``decode_stub`` (raises ``NotImplementedError``) and a deterministic fake
(``fake_featurize``) so the Spark-side plumbing — schema, batch iteration,
partitioning, UDF signature — is real and tested end-to-end.

Scale notes: ``mapInPandas`` streams Arrow batches through the Python
worker — constant memory per batch regardless of partition size; binary
payloads never pass through the driver. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it so
batch_rows × payload ≈ tens of MB).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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


def decode_stub(content: bytes, media_type: str):
    """Real decode hook — requires PIL/ffmpeg/torchaudio, absent here."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "environment; wire PIL/ffmpeg here on a real cluster"
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
    ``decode_stub``-based real path on a cluster with codecs.
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
    ``decode_stub``); the stand-in derives a per-frame digest from
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
