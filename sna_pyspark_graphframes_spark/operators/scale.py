"""Skew- and layout-aware operators: the 100 TB posture made explicit.

The reference never confronts skew or data layout — it runs `local[2]`
over one 88k-edge file (``/root/reference/main.py:14``). At cluster
scale the three failure modes these operators address dominate:

* **Hot keys in aggregation** — a handful of group keys receive most of
  the rows (power-law), so one reducer runs long. ``salted_agg`` splits
  each group into ``buckets`` sub-groups on a deterministic salt, pays a
  cheap second aggregation over ``#groups × buckets`` rows, and every
  reducer gets 1/buckets of the hot key.
* **Hot keys in a shuffle join** — same pathology on the join key when
  neither side broadcasts. ``salted_join`` salts the big side and
  replicates the other side once per salt bucket: the hot key's rows
  spread over ``buckets`` tasks at the cost of ``buckets×`` the small
  side (which must therefore be the *moderate* side — for truly small
  dims a plain ``broadcast()`` join needs no salt at all).
* **Re-shuffling co-partitioned data** — two fact tables repeatedly
  joined on the same key should be bucketed once at write time
  (``write_bucketed``); every later join/aggregate on that key is then
  exchange-free. This is the persistent form of the co-located join the
  reference approximates with its manual ``partitionBy(k)``
  (``main.py:184``; SURVEY.md §2.1 #20).

All salts are **deterministic** (hash of caller-named columns, never
``rand()``): results are reproducible and oracle-checkable, and a task
retry re-derives the same salt (a ``rand()`` salt breaks exactly-once
under speculative execution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SALT = "__salt"

# Partial forms of the algebraic aggregates: phase 1 computes them per
# (keys, salt); phase 2 merges the partials per keys. avg is (sum, count)
# merged as sum/count — not directly listed; callers derive it.
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_src: list[str],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output alias -> (fn, column) with fn in sum/count/min/
    max; ``count`` uses ``count(*)`` when column is ``"*"``. ``salt_src``
    names high-cardinality columns whose hash spreads a hot key's rows
    across ``buckets`` sub-groups.

    Identical result to ``df.groupBy(keys).agg(...)`` — the salt only
    changes the physical distribution. (Spark's own partial aggregation
    already combines map-side; the salt additionally splits the *reduce*
    side, which partials cannot do.)
    """
    for alias, (fn, _col) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"{alias}: non-algebraic agg {fn!r} cannot be salted")
    salted = df.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in salt_src]), F.lit(buckets))
    )
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[
            (F.count("*") if fn == "count" and col == "*" else getattr(F, fn)(col)).alias(a)
            for a, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE[fn](a).alias(a) for a, (fn, _col) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    other: DataFrame,
    on: str,
    salt_src: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot join keys spread over ``buckets``
    tasks. ``other`` is replicated once per bucket (explode of a literal
    range — no Python, no shuffle of its own), so choose ``other`` as the
    side small enough to multiply but too big / too dynamic to broadcast.

    Same rows as ``big.join(other, on, how)`` for inner/left joins keyed
    on ``on``; the salt column never leaves this function.
    """
    b = big.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in salt_src]), F.lit(buckets))
    )
    o = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return b.join(o, [on, _SALT], how).drop(_SALT)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int = 8,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key``: every later
    join or aggregation on ``key`` between tables bucketed the same way
    is exchange-free. The cluster-scale contract: bucket your biggest
    repeatedly-joined fact tables once, at ingest."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key.
    The ``merge`` hint pins a sort-merge join, which the bucketed (and
    pre-sorted) layout satisfies without any Exchange — assert that with
    ``tests/test_plans.py::test_bucketed_join_no_exchange``."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right.hint("merge"), on, how)
