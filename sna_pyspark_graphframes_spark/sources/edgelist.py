"""Edge-list file source/sink — parity with the reference's native input.

The reference reads a space-delimited, headerless edge list with schema
inference (``/root/reference/main.py:25-26``) and then fails to rename the
columns (``withColumnRenamed('C0','src')`` no-ops — SURVEY.md §2.5 #1). We
implement the intent: a declared ``src LONG, dst LONG`` schema at scan time,
no inference pass, columns named correctly from the start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), nullable=False),
        T.StructField("dst", T.LongType(), nullable=False),
    ]
)


def read_edge_list(
    spark: SparkSession,
    path: str,
    sep: str = " ",
    comment: str = "#",
) -> DataFrame:
    """Read a ``"<src> <dst>"``-per-line edge list (SNAP format).

    Declared schema → single pass, no inference; the CSV reader is a native
    JVM source so the scan participates in whole-stage codegen.
    """
    return spark.read.csv(path, sep=sep, header=False, schema=EDGE_SCHEMA, comment=comment)


def write_edge_list(edges: DataFrame, path: str, sep: str = " ") -> None:
    """Write ``(src, dst)`` back out in the reference's file format."""
    edges.select("src", "dst").write.mode("overwrite").csv(path, sep=sep, header=False)
