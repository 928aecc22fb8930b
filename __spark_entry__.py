"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``sna_pyspark_graphframes_spark``; this module is
wiring only. Non-SQL-expressible ops (LPA, random-walk sampling, iterative
metrics) appear in ``queries()`` without an ``oracle_sql()`` twin — the
driver records rows-only checks; their value-level correctness is covered
by golden unit tests in ``tests/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.sources import load_table
from sna_pyspark_graphframes_spark.graph import build, metrics

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1): co-purchase graph from lineitem →
    degree of every part → top-10 by degree. Exercises scan → self-join →
    distinct → union (symmetrize) → agg → top-k."""
    lineitem = load_table(spark, SF0001, "lineitem")
    edges = build.copurchase_edges(lineitem)
    return metrics.top_k_by_degree(edges, k=10)


# ---------------------------------------------------------------------------
# queries / oracle_sql — keep keys in lockstep; alias every computed column
# identically on both sides (driver hashes values with columns sorted by name)
# ---------------------------------------------------------------------------

_COPURCHASE_EDGES_SQL = """
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""

_DEGREE_SQL = f"""
    WITH edges AS ({_COPURCHASE_EDGES_SQL}),
    sym AS (
        SELECT src, dst FROM edges
        UNION
        SELECT dst AS src, src AS dst FROM edges
    )
    SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src
"""


def _q_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build.copurchase_edges(load_table(spark, sf_dir, "lineitem"))


def _q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics.degrees(_q_copurchase_edges(spark, sf_dir))


def _q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics.degree_histogram(_q_copurchase_edges(spark, sf_dir))


def _q_top10_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics.top_k_by_degree(_q_copurchase_edges(spark, sf_dir), k=10)


def _q_avg_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics.average_degree(_q_copurchase_edges(spark, sf_dir))


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the relational baseline query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "copurchase_edges": _q_copurchase_edges,
        "degree": _q_degree,
        "degree_histogram": _q_degree_histogram,
        "top10_degree": _q_top10_degree,
        "avg_degree": _q_avg_degree,
        "pricing_summary": _q_pricing_summary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "copurchase_edges": _COPURCHASE_EDGES_SQL,
        "degree": _DEGREE_SQL,
        "degree_histogram": f"""
            WITH deg AS ({_DEGREE_SQL})
            SELECT degree, COUNT(*) AS cnt FROM deg GROUP BY degree
        """,
        "top10_degree": f"""
            WITH deg AS ({_DEGREE_SQL})
            SELECT id, degree FROM deg ORDER BY degree DESC, id ASC LIMIT 10
        """,
        "avg_degree": f"""
            WITH deg AS ({_DEGREE_SQL})
            SELECT ROUND(AVG(degree), 4) AS avg_degree FROM deg
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
    }
