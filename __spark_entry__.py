"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``sna_pyspark_graphframes_spark``; the query/oracle
inventory is ``sna_pyspark_graphframes_spark/registry.py``. Since r10 EVERY
registered query is oracle-paired: iterative/fp algorithms through unrolled
MATERIALIZED-CTE twins, sketches and fp top-k through tolerance twins
(hard exact columns + each engine's own agreement boolean), and the seeded
walks through one-row validity certificates (hard community/walk counts +
one-sided structural booleans); seeded values additionally stay pinned by
golden tests in ``tests/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sna_pyspark_graphframes_spark.registry import oracle_sql, queries  # noqa: F401
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
