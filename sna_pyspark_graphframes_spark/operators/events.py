"""Behavioral event analytics over the ``events`` table: ordered funnels
and cohort retention — the product-analytics queries an event pipeline
serves next to its windowed aggregates (``streaming/windows.py``).

Both are pure DataFrame compositions (min-aggregates + joins; no windows
over the full event stream, no UDFs). (Reference scope: none — events are
a beyond-reference pipeline component.)

Scale notes: every stage aggregates to per-user rows FIRST (|users| ≪
|events|), so the joins that chain funnel steps / attach cohorts run on
the small per-user table; the only |events|-sized operations are the
initial filtered aggregates, which shuffle once on user_id each. At 100 TB
the event scans prune on ``event_type`` at the parquet reader.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame, steps: Sequence[str] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered funnel: ``(step_idx, step, n_users)`` — how many users
    completed each step IN ORDER (step i+1 counts only events strictly
    after that user's step-i completion time; completion time = the
    earliest qualifying event, the standard first-touch convention).

    One filtered min-aggregate per step, chained by a per-user join —
    each stage's frame is one row per surviving user."""
    reached = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    counts = [(1, steps[0], reached)]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col("event_type") == step)
            .join(reached, "user_id")
            .filter(F.col("ts") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        counts.append((i, step, nxt))
        reached = nxt
    rows = None
    for i, step, frame in counts:
        row = frame.agg(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(step).alias("step"),
            F.count("*").alias("n_users"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: ``(cohort_week, week_offset, n_users)`` —
    users grouped by the ISO week of their FIRST event, counted as
    retained in each subsequent week they produced any event.

    ``week_offset`` is whole weeks between first-event date and event
    date (date arithmetic only — identical across engines regardless of
    sub-second timestamp handling)."""
    first = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (
        events.select("user_id", "ts")
        .join(first, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", F.col("first_ts")).cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("first_ts")) / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov chain trained over per-user event sequences:
    ``(from_type, to_type, n, p)`` where ``p = n / Σ_to n`` rounded to
    6 dp — the transition-matrix estimator behind next-event prediction
    and session simulation (the sequence-model sibling of the NB/
    logreg/OLS trainers in ``functions/ml.py``).

    One window pass (``lead`` over each user's (ts, id)-ordered events —
    the id tie-break makes the sequence, and therefore the counts,
    deterministic under duplicate timestamps) + two hash aggregates on
    the tiny (from, to) key space. At 100 TB the window sort is the one
    shuffle, keyed by user — the same layout every sessionization query
    here already uses; state never leaves the JVM."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        counts.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("p"),
        )
    )


def rate_anomaly(
    events: DataFrame,
    trailing: int = 24,
    threshold: float = 3.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(event_type, window_start, n, z, is_anomaly)`` — per-type
    hourly event counts z-scored against the TRAILING ``trailing``
    complete hours (frame ``[t-trailing, t-1]``): the ingest-rate
    anomaly monitor a pipeline runs on every batch (a stuck producer or
    a crawler burst shows up as |z| > ``threshold`` long before
    downstream stats move). Buckets without a full trailing window are
    dropped (no z to stand on); zero-variance windows emit z = NULL
    (flagged false) rather than dividing by zero. The frame is the
    trailing ``trailing`` OBSERVED buckets — hours with zero events
    produce no row; feed gap-filled buckets (``event_hourly_gap_fill``)
    when wall-clock frames are required.

    Determinism: hourly counts are integers; the trailing mean and
    variance are built EXPLICITLY from SUM / SUM-of-squares / COUNT
    window sums (never the engine's stddev aggregate, whose Welford
    accumulation order is engine-specific) — sums of ≤``trailing``
    small integers are EXACT in fp64, so mean, variance, z and the
    flag are bit-identical in any engine, even at rounding-boundary
    ties. Plan: one hash aggregate to hours, one per-type ordered
    window over the (tiny) bucket table — nothing rescans events."""
    hours = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(-trailing, -1)
    )
    nn = F.col("n").cast("double")
    stats = hours.select(
        "event_type",
        "window_start",
        "n",
        F.count("n").over(w).alias("k"),
        F.sum(nn).over(w).alias("s1"),
        F.sum(nn * nn).over(w).alias("s2"),
    ).filter(F.col("k") == trailing)
    mean = F.col("s1") / F.col("k")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("k")) / (
        F.col("k") - 1
    )
    z = F.when(var > 0, F.round((nn - mean) / F.sqrt(var), 4))
    return stats.select(
        "event_type",
        "window_start",
        "n",
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(threshold), F.lit(False)).alias(
            "is_anomaly"
        ),
    )


def interevent_stats(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    round_dp: int = 6,
) -> DataFrame:
    """``(event_type, n_gaps, mean_gap_s, cv, burstiness)`` — the
    inter-event-time distribution per event type: mean gap in seconds,
    coefficient of variation ``σ/μ``, and the Goh–Barabási burstiness
    ``B = (σ − μ)/(σ + μ)`` (Goh & Barabási 2008) — B→−1 periodic,
    B≈0 Poisson, B→+1 bursty. The temporal-health probe an ingest
    pipeline runs per source/type: a stream that claims to be steady
    but measures bursty is batching upstream.

    Gaps are EXACT INTEGER SECONDS (floor of the microsecond epoch —
    the floor division is identical in any engine — differenced over a
    (sec, id)-ordered lag; the id tie-break makes equal-timestamp gaps
    deterministic), so n, Σg and Σg² are exact BIGINT sums and μ, σ,
    CV, B are a handful of fp ops on identical inputs in any engine —
    identical decimals at ``round_dp``. Seconds, not microseconds, so
    Σg² stays inside int64: gap² ≤ (3e9 s)² ≈ 9e18 only at a
    century-long single gap; realistic per-type sums need
    Σ gap² < 2^63, i.e. ~1e9 gaps of ~1-day spacing — past that,
    aggregate per (type, epoch-week) first. Sub-second cadence floors
    to gap 0 in BOTH engines (documented coarsening, not drift).

    Plan: one lag window per type partition (keyed sort, no global
    window) + one hash aggregate; CV/B are NULL for types with <2 gaps
    or zero mean (undefined, never 0)."""
    g = (
        events.select(
            F.col(type_col).alias("event_type"),
            # unix_seconds = exact integer truncation of the timestamp —
            # matches DuckDB's epoch_us // 1_000_000 without the fp-floor
            # boundary hazard of floor(micros / 1e6)
            F.unix_seconds(F.col(ts_col).cast("timestamp")).alias("__s"),
            F.col(id_col),
        )
        .select(
            "event_type",
            (F.col("__s") - F.lag("__s").over(
                Window.partitionBy("event_type").orderBy("__s", id_col)
            )).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    agg = g.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("sg"),
        F.sum(F.col("gap") * F.col("gap")).cast("long").alias("sg2"),
    )
    mu = F.col("sg") / F.col("n_gaps")
    var = F.col("sg2") / F.col("n_gaps") - mu * mu
    sd = F.sqrt(var)
    return agg.select(
        "event_type",
        "n_gaps",
        F.round(mu, 4).alias("mean_gap_s"),
        F.when((F.col("n_gaps") >= 2) & (mu > 0), F.round(sd / mu, round_dp))
        .alias("cv"),
        F.when(
            (F.col("n_gaps") >= 2) & (sd + mu > 0),
            F.round((sd - mu) / (sd + mu), round_dp),
        ).alias("burstiness"),
    )
