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


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for tests: treat document text bytes as opaque media payloads
    (the container ships no real image/audio fixtures)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        F.lit(0).cast("long").alias("duration_ms"),
    )
