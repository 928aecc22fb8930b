"""Message-passing primitive — the DataFrame equivalent of GraphFrames'
``AggregateMessages`` / GraphX ``aggregateMessages`` (the building block
under the reference's ``labelPropagation`` call,
``/root/reference/main.py:161``; see SURVEY.md §3.2).

One superstep = triplet join (edge + src attrs + dst attrs) → per-edge
message expressions → one aggregate keyed by the receiving vertex. Our
iterative algorithms inline this shape for control over checkpointing;
this standalone form is the user-facing primitive for custom algorithms.

Scale: the triplet join is two keyed equi-joins (broadcast when the vertex
table is small); the aggregate gets map-side partial combine. One shuffle
per superstep is the Pregel lower bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def triplets(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Edge triplets: every edge row joined with its endpoint attributes.
    Vertex columns appear as ``src_<attr>`` / ``dst_<attr>``; edge columns
    keep their names. ``vertices`` must have an ``id`` column."""
    attrs = [c for c in vertices.columns if c != "id"]
    sv = vertices.select(
        F.col("id").alias("src"), *[F.col(c).alias(f"src_{c}") for c in attrs]
    )
    dv = vertices.select(
        F.col("id").alias("dst"), *[F.col(c).alias(f"dst_{c}") for c in attrs]
    )
    return edges.join(sv, "src").join(dv, "dst")


def aggregate_messages(
    edges: DataFrame,
    vertices: DataFrame,
    agg: dict[str, Column],
    to_dst: Column | None = None,
    to_src: Column | None = None,
) -> DataFrame:
    """For each vertex, aggregate the messages its neighbors send along
    edges: ``to_dst`` is evaluated per triplet and delivered to the edge's
    dst, ``to_src`` to its src (give at least one). Message expressions see
    the triplet columns (``src_*``, ``dst_*``, edge attrs); ``agg`` maps
    output column name → aggregate over the delivered ``msg`` column.

    Example — one LPA superstep::

        aggregate_messages(
            sym_edges, labels,
            to_dst=F.col("src_label"),
            agg={"label": F.mode("msg", True)},
        )
    """
    if to_dst is None and to_src is None:
        raise ValueError("provide to_dst and/or to_src")
    t = triplets(edges, vertices)
    parts = []
    if to_dst is not None:
        parts.append(t.select(F.col("dst").alias("id"), to_dst.alias("msg")))
    if to_src is not None:
        parts.append(t.select(F.col("src").alias("id"), to_src.alias("msg")))
    inbox = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return inbox.groupBy("id").agg(
        *[expr.alias(name) for name, expr in agg.items()]
    )
