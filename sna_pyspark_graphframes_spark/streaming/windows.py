"""Event-time windowing over the ``events`` table — tumbling, sliding, and
session windows, plus sessionization and JSON prop extraction.

Batch and streaming share the same expressions: ``F.window`` /
``F.session_window`` work identically on a static DataFrame and a
``readStream`` source, so each batch operator here has a streaming twin in
``streaming/stream.py`` (watermark + availableNow trigger). The batch forms
are DuckDB-oracle-able (registry.py); the streaming forms are asserted
equal to batch in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per-window, per-type aggregates over fixed windows.
    ``(window_start, event_type, n, total_value)``."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Overlapping windows — each event lands in width/slide windows.
    ``(window_start, n, total_value)``."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows with inactivity gap — ``session_window``
    merges events whose gaps are < gap into one window.
    ``(user_id, session_start, n, total_value)``."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n",
            "total_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign a per-user session index via gaps-and-islands (lag + running
    sum) — the window-function formulation of sessionization, exactly
    SQL-expressible. ``(event_id, user_id, session_idx)``.

    Scale: both windows partition by ``user_id`` — per-user sort, shuffle on
    user_id only; no global ordering anywhere.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp subtraction (interval arithmetic) instead of double casts:
    # valid for TIMESTAMP and TIMESTAMP_NTZ alike, and timezone-independent.
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    with_flag = events.select(
        "event_id",
        "user_id",
        "ts",
        F.when((F.col("ts") - F.lag("ts").over(w)) > gap, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    return with_flag.select(
        "event_id",
        "user_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_idx"),
    )


def extract_props(events: DataFrame) -> DataFrame:
    """JSON prop extraction from the ``props`` string column —
    ``get_json_object`` is codegen'd JVM-side (no Python).
    ``(event_id, k)``."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def props_variant_summary(events: DataFrame) -> DataFrame:
    """Per-event-type stats over a JSON property via Spark 4's VARIANT
    type: ``parse_json`` decodes each ``props`` document ONCE into the
    binary variant encoding, then every extraction is an O(1) typed path
    read (``try_variant_get``) — the scale path when many fields are
    pulled from the same document (repeated ``get_json_object`` calls,
    the ``extract_props`` shape, re-parse the string per call).
    ``(event_type, n_events, sum_k, max_k)``; events whose ``k`` is
    missing or non-numeric count toward ``n_events`` but not the
    aggregates (``try_`` semantics)."""
    v = events.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.try_variant_get("v", "$.k", "bigint").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").cast("long").alias("max_k"),
    )


def late_data_filter(events: DataFrame, watermark_delay: str = "1 hour") -> DataFrame:
    """Batch simulation of watermark semantics: drop events older than
    (max event time − delay) — what a streaming watermark admits in steady
    state. ``(event_id, ts)`` of admitted events.

    The scalar max is computed distributively and broadcast via a cross
    join of a 1-row frame (no collect, no single-partition window).
    """
    delay_s = {"1 hour": 3600, "30 minutes": 1800, "15 minutes": 900}.get(
        watermark_delay, 3600
    )
    mx = events.agg(F.max("ts").alias("max_ts"))
    return (
        events.crossJoin(F.broadcast(mx))
        .filter(
            F.col("ts") >= F.col("max_ts") - F.expr(f"INTERVAL {delay_s} SECONDS")
        )
        .select("event_id", "ts")
    )


def hourly_gap_fill(events: DataFrame) -> DataFrame:
    """Resample with gap filling: hourly event counts per event_type with
    EXPLICIT zero rows for empty hours — ``(hour, event_type, n)`` over
    the dense (hour x type) grid spanning the stream's min..max hour.

    The time-series shape windowed aggregates can't produce (a groupBy
    only emits observed keys): the dense hour spine comes from ONE 1-row
    min/max aggregate exploded through ``sequence`` (no driver loop), the
    type dimension from a distinct broadcast, and observed counts attach
    by left join. At 100 TB the spine is |hours| x |types| rows —
    independent of event count — and only the count aggregate scans the
    stream."""
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = events.select("event_type").distinct()
    counts = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    return (
        spine.crossJoin(F.broadcast(types))
        .join(counts, ["hour", "event_type"], "left")
        .select("hour", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )


def user_daily_moving_avg(events: DataFrame, days: int = 7) -> DataFrame:
    """Rolling window aggregate: per user per active day, the day's total
    value and the ``days``-day trailing moving average (current day + the
    ``days-1`` preceding CALENDAR days, whether active or not) —
    ``(user_id, day, day_value, moving_avg)``.

    The RANGE frame runs over integer day numbers (epoch days), so gaps
    in activity shorten the average's denominator exactly like a
    time-indexed RANGE BETWEEN INTERVAL would; partitioned by user — a
    per-user sort, never global."""
    daily = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    daily = daily.withColumn("dn", F.datediff("day", F.lit("1970-01-01")))
    w = (
        Window.partitionBy("user_id")
        .orderBy("dn")
        .rangeBetween(-(days - 1), 0)
    )
    return daily.select(
        "user_id",
        "day",
        "day_value",
        F.round(F.avg("day_value").over(w), 4).alias("moving_avg"),
    )
