"""Parquet table sources with explicit, declared schemas.

The reference infers schemas at scan time (``/root/reference/main.py:25``,
``inferSchema=True`` — an extra eager pass over the input). We invert that:
every table the engine reads has a declared ``StructType``; the reader
asserts the file matches. At 100 TB this matters twice over — no inference
pass, and Catalyst can prune columns/push filters against a known schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def nanos_to_micros_ts(c: F.Column) -> F.Column:
    """Exact nanosecond-long → microsecond timestamp (floor, matching the
    DuckDB/Arrow parquet readers' ns→us truncation). The division runs in
    DECIMAL, not DOUBLE: epoch nanos (~1.7e18) exceed double's 53-bit
    mantissa, so ``(c/1000).cast("long")`` is off by up to ±128 ns."""
    base = ((c - c % 1000).cast("decimal(20,0)") / 1000).cast("long")
    return F.timestamp_micros(base)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table with its declared schema.

    Parquet is self-describing, so we read it natively and then ``select``
    the declared columns (column pruning reaches the scan; stray extra
    columns in a future file version are ignored rather than breaking us).
    """
    from sna_pyspark_graphframes_spark.session import ensure_session_confs

    ensure_session_confs(spark)  # driver-provided sessions lack our builder confs
    schema = TABLE_SCHEMAS[name]
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    missing = set(schema.fieldNames()) - set(df.columns)
    if missing:
        raise ValueError(f"table {name!r} at {sf_dir} missing columns {sorted(missing)}")
    actual = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        c = normalize_ts(
            F.col(field.name), field.dataType, actual.get(field.name)
        ).alias(field.name)
        cols.append(c)
    return df.select(*cols)


def normalize_ts(c: F.Column, declared: T.DataType, actual: T.DataType | None) -> F.Column:
    """Normalize the on-disk timestamp encoding to the declared TIMESTAMP
    type. Testdata has shipped ``ts`` three ways across driver versions:
    TIMESTAMP(NANOS) (arrives as long under nanosAsLong), TIMESTAMP_NTZ
    (micros, isAdjustedToUTC=false), and plain TIMESTAMP. All three must
    read identically; session timezone is pinned to UTC (session.py) so the
    NTZ→LTZ cast is value-preserving."""
    if not isinstance(declared, T.TimestampType):
        return c
    if isinstance(actual, T.LongType):
        return nanos_to_micros_ts(c)
    if isinstance(actual, T.TimestampNTZType):
        return c.cast("timestamp")
    return c


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or list(TABLE_SCHEMAS))}
