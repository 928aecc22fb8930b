"""Structured Streaming versions of the event-window operators.

``read_event_stream`` treats the testdata events parquet as a file-source
stream (schema declared, no inference — required by streaming sources
anyway); queries run with the ``availableNow`` trigger into a memory sink,
which is exactly the batch-equivalence contract Structured Streaming
guarantees (same expressions → same results, incrementally).

Watermarks bound state: aggregations drop window state older than the
watermark, so a continuous run holds O(active windows × keys) state, not
history. ``foreachBatch``/kafka sinks replace the memory sink in
production; the memory sink here keeps tests hermetic.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet. Streaming sources demand
    a declared schema; we probe the file's actual schema with a batch
    footer read (no data scan) rather than hard-coding the timestamp
    encoding — testdata has shipped ``ts`` as nanos-long, TIMESTAMP_NTZ,
    and TIMESTAMP across driver versions, and the stream must normalize all
    three exactly like the batch path (sources/tables.normalize_ts)."""
    from sna_pyspark_graphframes_spark.session import ensure_session_confs
    from sna_pyspark_graphframes_spark.sources.tables import (
        TABLE_SCHEMAS,
        normalize_ts,
    )

    ensure_session_confs(spark)
    on_disk = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    raw = (
        spark.readStream.schema(on_disk)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    actual = {f.name: f.dataType for f in on_disk.fields}
    declared = TABLE_SCHEMAS["events"]
    return raw.select(
        *[
            normalize_ts(F.col(f.name), f.dataType, actual.get(f.name)).alias(f.name)
            for f in declared.fields
        ]
    )


def run_to_memory(
    result: DataFrame, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame with availableNow into a memory sink;
    return the materialized result as a batch DataFrame. ``append`` mode is
    required for stream-stream joins and dedup (no result rewriting)."""
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_foreach_batch_parquet(
    result: DataFrame, spark: SparkSession, path: str
) -> DataFrame:
    """Execute a streaming DataFrame through a ``foreachBatch`` parquet
    sink (the production sink shape: per-micro-batch arbitrary writes with
    exactly-once via the checkpointed batch id), then read the files back.

    ``foreachBatch`` hands each micro-batch to ordinary batch code — the
    idiomatic bridge to any sink Structured Streaming lacks natively
    (JDBC upserts, multi-table fan-out). Append-only here, so re-reading
    the directory equals the batch result over a finite source."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    q = (
        result.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", path + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(path + "_ckpt", ignore_errors=True)
    return spark.read.schema(result.schema).parquet(path)


def stream_foreach_batch_filtered(
    spark: SparkSession, sf_dir: str, min_value: float = 50.0
) -> DataFrame:
    """Filtered projection of the event stream delivered through the
    foreachBatch parquet sink — append-mode row stream, no state."""
    import hashlib

    ev = read_event_stream(spark, sf_dir).filter(F.col("value") >= min_value).select(
        "event_id", "user_id", "event_type", "value"
    )
    tag = hashlib.md5(f"fb:{sf_dir}".encode()).hexdigest()[:8]
    return run_foreach_batch_parquet(ev, spark, f"/tmp/spark_graft_fb_{tag}")


def stream_tumbling_counts(
    spark: SparkSession, sf_dir: str, width: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of ``windows.tumbling_counts`` with a watermark."""
    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    agg = (
        ev.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    return run_to_memory(agg, spark)


def stream_stream_click_purchase(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: each click joined to the same user's
    purchases in the preceding hour. Both sides watermarked and the join
    condition time-bounded in BOTH directions — that's what lets the join
    state be evicted (unbounded conditions would accumulate both streams
    forever). Inner-join matches emit as they arrive, so availableNow over
    a finite source equals the batch join exactly."""
    clicks = (
        read_event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        read_event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    # Match window tied to the watermark delay, exactly as in the outer
    # variant below (a hardcoded INTERVAL would silently ignore non-default
    # watermarks and diverge from the oracle).
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (F.col("purchase_ts") > F.col("click_ts") - F.expr(f"INTERVAL {watermark}")),
    ).select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts")
    return run_to_memory(joined, spark, output_mode="append")


def stream_dedup_keys(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup (``dropDuplicatesWithinWatermark``) on
    (user_id, event_type): exactly one survivor per key. Projecting only
    the key columns makes the result arrival-order-independent, so the
    batch oracle is a plain DISTINCT."""
    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    out = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return run_to_memory(out, spark, output_mode="append")


def stream_session_windows(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of ``windows.session_windows`` — session_window state
    is merged incrementally and evicted past the watermark."""
    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    agg = (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n", "total_value")
    )
    return run_to_memory(agg, spark)


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched with the static
    customer dimension, rolled up to per-nation purchase revenue.

    Stream-static joins are STATELESS — each micro-batch joins against the
    static side as ordinary batch data, no watermark and no join state.
    The dim side is broadcast (it's the classic small-dimension shape), so
    at scale the streaming side never shuffles for the join; only the
    final aggregate keeps (tiny, per-nation) state. Complete output mode
    over a finite source equals the batch join + aggregate exactly.
    """
    from sna_pyspark_graphframes_spark.sources import load_table

    ev = read_event_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    agg = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
    )
    return run_to_memory(agg, spark, output_mode="complete")


def stream_sliding_counts(
    spark: SparkSession,
    sf_dir: str,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``windows.sliding_counts``: overlapping windows —
    each event contributes to width/slide windows.

    Runs in COMPLETE output mode (``run_to_memory``'s default), where
    Spark retains ALL window state for the lifetime of the query and
    re-emits the full result each trigger — the watermark set here bounds
    late-data admission, but does NOT evict window state in complete mode
    (only append/update modes drop windows the watermark has passed). On
    an unbounded production stream, switch to append mode so state stays
    bounded; complete mode is used here because the finite availableNow
    source makes the full result equal the batch oracle exactly."""
    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    agg = (
        ev.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )
    return run_to_memory(agg, spark)


def stream_stream_click_purchase_outer(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click, with its same-user
    purchases of the preceding hour or NULLs if none arrived.

    The outer side is what makes eviction semantics visible: a null row
    for a click can only be emitted once the watermark passes the click's
    timestamp (no qualifying purchase can arrive after that), so clicks
    younger than ``max(ts) − watermark`` at end-of-stream remain HELD in
    state and are absent from the availableNow result. The SQL oracle
    encodes exactly that rule — matched rows are the batch join; null
    rows only for clicks old enough to have been evicted."""
    clicks = (
        read_event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        read_event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    # The match window is TIED to the watermark delay (ADVICE r3: a
    # hardcoded INTERVAL silently ignored non-default watermarks): a
    # purchase qualifies iff it landed within `watermark` before the click,
    # which is also exactly the bound that lets Spark size the join state.
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (F.col("purchase_ts") > F.col("click_ts") - F.expr(f"INTERVAL {watermark}")),
        "left_outer",
    ).select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts")
    return run_to_memory(joined, spark, output_mode="append")
