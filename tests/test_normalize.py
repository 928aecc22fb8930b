from __future__ import annotations

from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph.build import normalize_edges


def test_normalize_edges_left_join_semantics(spark):
    """Reference shape (/root/reference/main.py:33-37): LEFT joins keep
    every edge row even when an endpoint is missing from the vertex table."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 9)], "src long, dst long")
    vertices = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    out = normalize_edges(edges, vertices)
    assert out.count() == 3  # left joins: the (3,9) edge survives
    assert set(out.columns) == {"src", "dst"}
    rows = {(r.src, r.dst) for r in out.collect()}
    assert rows == {(1, 2), (2, 3), (3, 9)}
