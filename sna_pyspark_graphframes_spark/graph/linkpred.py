"""Link prediction scores — common neighbors, Jaccard coefficient,
Adamic-Adar — for non-adjacent vertex pairs of an undirected graph.

The reference's domain (social-network analysis) treats these as the
standard "which edge forms next" measures (NetworkX exposes them as
``nx.jaccard_coefficient`` etc. — same family as the metrics at
``/root/reference/main.py:129-159``); here they are one wedge join +
aggregates, fully SQL-expressible, so the driver value-checks them.

Scale: the wedge join fans out Σ deg(z)² over shared neighbors z — the
same quadratic risk as triangle counting (SCALE.md). Use ``max_degree`` to
drop super-hubs from the *wedge centers* (standard practice: a
10⁶-follower hub makes every fan-pair a "candidate" and contributes ~0 to
Adamic-Adar anyway, 1/ln(10⁶)); scores for the remaining pairs are exact
on the thinned graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph.build import canonical_edges, symmetrize
from sna_pyspark_graphframes_spark.plans.hints import state_hinted
from sna_pyspark_graphframes_spark.plans.iterate import checkpointed


def link_scores(edges: DataFrame, max_degree: int | None = None) -> DataFrame:
    """``(a, b, cn, jaccard, adamic_adar)`` for every NON-adjacent pair
    ``a < b`` with at least one common neighbor.

    One pass: symmetrize → wedge self-join on the shared center z (its
    degree rides along for Adamic-Adar) → per-pair aggregate → anti-join
    existing edges → degree join for Jaccard's union size. Doubles rounded
    to 4 decimals (oracle hash contract).
    """
    canon = canonical_edges(edges)
    s = symmetrize(canon, dedup=True)
    # The degree table is a |V|-row frame that grows with the graph, so it
    # must not carry an unconditional broadcast hint (unbounded-frame
    # rule, SCALE.md). Checkpoint it once — the three joins below all scan
    # the materialized frame — and hint each join through the shared size
    # gate (broadcast while |V| fits, shuffle-hash beyond).
    deg = checkpointed(
        s.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
    )
    n_vertices = deg.count()
    centers = deg
    if max_degree is not None:
        centers = deg.filter(F.col("degree") <= max_degree)
    # z's degree attached before the wedge join: each wedge (a—z—b) then
    # carries 1/ln(deg(z)) with no third join. deg(z) >= 2 inside a wedge.
    sz = s.join(
        state_hinted(centers.withColumnRenamed("id", "src"), n_vertices),
        "src",
    ).select(F.col("src").alias("z"), "dst", "degree")
    w = (
        sz.alias("x")
        .join(sz.alias("y"), F.col("x.z") == F.col("y.z"))
        .filter(F.col("x.dst") < F.col("y.dst"))
        .select(
            F.col("x.dst").alias("a"),
            F.col("y.dst").alias("b"),
            (F.lit(1.0) / F.log(F.col("x.degree"))).alias("aa_term"),
        )
    )
    pair_scores = w.groupBy("a", "b").agg(
        F.count("*").alias("cn"), F.sum("aa_term").alias("aa")
    )
    non_adjacent = pair_scores.join(
        canon.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = state_hinted(
        deg.select(F.col("id").alias("a"), F.col("degree").alias("da")),
        n_vertices,
    )
    db = state_hinted(
        deg.select(F.col("id").alias("b"), F.col("degree").alias("db")),
        n_vertices,
    )
    return (
        non_adjacent.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            F.round(
                F.col("cn") / (F.col("da") + F.col("db") - F.col("cn")), 4
            ).alias("jaccard"),
            F.round("aa", 4).alias("adamic_adar"),
        )
    )
