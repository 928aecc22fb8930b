"""Motif finding — the join-based analog of GraphFrames ``g.find(...)``
(the reference's library exposes motif search; users switching engines get
the common undirected patterns as explicit, Catalyst-planned joins).

Each motif is enumerated exactly once in canonical vertex order, so results
are deterministic and SQL-oracle-able. Inputs are canonical undirected
edges (src < dst, deduped).

Scale: each pattern is a chain of equi-joins on vertex keys — the same
shuffle shape as triangle counting; degree-ordered variants (see
``metrics.triangles_per_vertex``) apply when hubs dominate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph.build import symmetrize


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles ``(a, b, c)`` with a < b < c, each exactly once."""
    e = edges.select("src", "dst")
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def wedges(edges: DataFrame, open_only: bool = True) -> DataFrame:
    """Wedges (paths a–b–c through center b) with a < c, each exactly once:
    ``(a, b, c)``. ``open_only`` drops closed wedges (triangle corners) via
    an anti-join on the closing edge — the GraphFrames negated-edge term."""
    sym = symmetrize(edges, dedup=True)
    w1 = sym.select(F.col("src").alias("b"), F.col("dst").alias("a"))
    w2 = sym.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    w = (
        w1.join(w2, "b")
        .filter(F.col("a") < F.col("c"))
        .select("a", "b", "c")
    )
    if open_only:
        closing = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        # list-form joins move the keys to the front — re-project to (a,b,c)
        w = w.join(closing, ["a", "c"], "left_anti").select("a", "b", "c")
    return w


def four_cycles(edges: DataFrame) -> DataFrame:
    """Chordless-or-not 4-cycles ``(a, b, c, d)``, canonical: a is the
    smallest corner, and its two neighbors in the cycle are ordered
    (b < d) — each cycle exactly once. Plan: two wedge-joins meeting at the
    opposite corner c."""
    sym = symmetrize(edges, dedup=True)
    ab = sym.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = sym.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ad = sym.select(F.col("src").alias("a"), F.col("dst").alias("d"))
    dc = sym.select(F.col("src").alias("d"), F.col("dst").alias("c"))
    cyc = (
        ab.join(bc, "b")
        .join(ad, "a")
        .join(dc, ["d", "c"])
        .filter(
            (F.col("b") < F.col("d"))  # orient the two paths
            & (F.col("a") < F.col("b"))
            & (F.col("a") < F.col("c"))
            & (F.col("a") < F.col("d"))  # a = smallest corner
            & (F.col("c") != F.col("a"))
            & (F.col("b") != F.col("c"))
        )
        .select("a", "b", "c", "d")
    )
    return cyc
