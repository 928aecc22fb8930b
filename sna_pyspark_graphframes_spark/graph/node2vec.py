"""Distributed node2vec walks (Grover & Leskovec, KDD'16) — the walk-corpus
generator for graph embeddings, as a pure DataFrame loop.

Unlike the sampler's per-community kernel (one community fits one task,
``graph/sampling.py``), a node2vec walk wanders the WHOLE graph, so the
per-group Arrow kernel shape cannot work at scale. Instead every step is a
set-wide join: all active walks advance together —

    state(walk_id, prev, cur, path)
      ⋈ adjacency on cur        → explode candidate neighbors
      ⋈ adjacency on prev       → the p/q bias needs prev's neighbor set
      weighted choice per walk  → Gumbel trick, hash randomness

The second-order bias: candidate x from cur with previous vertex prev gets
weight 1/p if x = prev (return), 1 if x ∈ N(prev) (triangle step, distance
1), else 1/q (exploration, distance 2). Sampling ∝ weight is the Gumbel
trick — minimize ``-ln(u)/w`` with u uniform per candidate — using
``md5(seed|walk|step|candidate)`` as u, so the walk is deterministic,
placement-independent, and needs NO Python in the loop: every step is two
joins + one explode + one ``min_by`` aggregate, all codegen.

Scale: per step the explode carries Σ deg(cur) rows over active walks —
the same cost class as one message-passing superstep; walks that hit a
dead end stop (kept via left join); lineage is checkpointed per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph.build import adjacency
from sna_pyspark_graphframes_spark.plans.iterate import checkpointed


def _uniform01(*cols) -> F.Column:
    """Deterministic uniform(0,1) from a hash of the argument columns —
    15 md5 hex digits → 60 bits, never exactly 0 (we add 1)."""
    h = F.md5(F.concat_ws("|", *cols))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("double") + 1.0) / float(
        1 << 60
    )


def node2vec_walks(
    edges: DataFrame,
    walk_length: int = 8,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """``(walk_id, path array<long>)`` — one biased walk per start vertex.

    ``starts``: DataFrame with column ``id`` (default: every vertex).
    ``p``: return parameter (high p → avoid backtracking); ``q``: in-out
    parameter (high q → stay local / BFS-like, low q → explore / DFS-like).
    """
    adj = checkpointed(adjacency(edges))
    if starts is None:
        starts = adj.select("id")
    state = checkpointed(
        starts.select(
            F.col("id").alias("walk_id"),
            F.lit(None).cast("long").alias("prev"),
            F.col("id").alias("cur"),
            F.array(F.col("id")).alias("path"),
            F.lit(False).alias("done"),
        )
    )
    inv_p, inv_q = 1.0 / float(p), 1.0 / float(q)
    for step in range(1, walk_length):
        active = state.filter(~F.col("done"))
        cand = (
            active.join(
                adj.select(F.col("id").alias("cur"), F.col("nbrs").alias("cnbrs")),
                "cur",
            )
            .select(
                "walk_id",
                "prev",
                "cur",
                "path",
                F.explode("cnbrs").alias("nxt"),
            )
            .join(
                adj.select(F.col("id").alias("prev"), F.col("nbrs").alias("pnbrs")),
                "prev",
                "left",
            )
        )
        w = (
            F.when(F.col("prev").isNull(), F.lit(1.0))
            .when(F.col("nxt") == F.col("prev"), F.lit(inv_p))
            .when(F.array_contains(F.col("pnbrs"), F.col("nxt")), F.lit(1.0))
            .otherwise(F.lit(inv_q))
        )
        u = _uniform01(
            F.lit(int(seed)), F.col("walk_id"), F.lit(step), F.col("nxt")
        )
        key = -F.log(u) / w
        chosen = cand.groupBy("walk_id").agg(
            F.min_by(F.struct("cur", "nxt", "path"), key).alias("c")
        )
        advanced = chosen.select(
            "walk_id",
            F.col("c.cur").alias("prev"),
            F.col("c.nxt").alias("cur"),
            F.concat("c.path", F.array("c.nxt")).alias("path"),
            F.lit(False).alias("done"),
        )
        # walks whose current vertex has no neighbors produce no candidate
        # rows — keep them, frozen
        stalled = active.join(advanced.select("walk_id"), "walk_id", "left_anti")
        state = checkpointed(
            advanced.unionByName(
                stalled.withColumn("done", F.lit(True))
            ).unionByName(state.filter(F.col("done")))
        )
    return state.select("walk_id", "path")
