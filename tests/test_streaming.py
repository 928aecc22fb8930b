"""Streaming twins must equal their batch forms (Structured Streaming's
batch-equivalence contract), including the custom stateful operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.sources import load_table
from sna_pyspark_graphframes_spark.streaming import windows as swin
from sna_pyspark_graphframes_spark.streaming.stream import (
    stream_session_windows,
    stream_tumbling_counts,
)
from sna_pyspark_graphframes_spark.streaming.stateful import (
    stream_user_running_totals,
    user_running_totals,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_equals_batch(spark, sf_dir):
    batch = swin.tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = stream_tumbling_counts(spark, sf_dir)
    cols = ["window_start", "event_type", "n", "total_value"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_stream_session_equals_batch(spark, sf_dir):
    batch = swin.session_windows(load_table(spark, sf_dir, "events"))
    stream = stream_session_windows(spark, sf_dir)
    cols = ["user_id", "session_start", "n", "total_value"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_stateful_running_totals_equal_batch_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
    stream = stream_user_running_totals(spark, sf_dir)
    cols = ["user_id", "n_events", "total_value", "last_ts"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_stateful_state_survives_micro_batches(spark, sf_dir, tmp_path):
    """GroupState must ACCUMULATE across micro-batches, not just within
    one. Splitting the source into 4 files with maxFilesPerTrigger=1
    forces 4 real micro-batches; the final per-user state (the row with
    the highest n_events — update mode emits one row per touched key per
    batch) must equal the batch aggregate over everything."""
    import uuid

    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "chunks")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = user_running_totals(stream)
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = spark.table(name)
    n_users = res.select("user_id").distinct().count()
    # more emitted rows than keys == keys were updated in >1 micro-batch
    assert res.count() > n_users
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        res.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
    cols = ["user_id", "n_events", "last_ts"]
    assert _rows(batch, cols) == _rows(final, cols)
    # totals accumulate across batches in double; compare at cent precision
    b = {r.user_id: r.total_value for r in batch.collect()}
    f = {r.user_id: r.total_value for r in final.collect()}
    assert all(abs(b[u] - f[u]) < 0.02 for u in b)


def test_stream_stream_join_interval_tracks_watermark(spark, sf_dir):
    """The click↔purchase match window must be derived from the
    ``watermark`` argument in BOTH join variants (ADVICE r3/r4: a
    hardcoded ``INTERVAL 1 HOUR`` silently ignores non-default
    watermarks). With a 2-minute watermark, every matched pair must be
    within 2 minutes, and the batch join at the same bound must agree."""
    from sna_pyspark_graphframes_spark.streaming.stream import (
        stream_stream_click_purchase,
        stream_stream_click_purchase_outer,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (F.col("purchase_ts") > F.col("click_ts") - F.expr("INTERVAL 2 minutes"))
    )
    cols = ["click_id", "user_id", "click_ts", "purchase_id", "purchase_ts"]
    batch_inner = clicks.join(purchases, cond).select(*cols)
    inner = stream_stream_click_purchase(spark, sf_dir, watermark="2 minutes")
    assert _rows(batch_inner, cols) == _rows(inner, cols)
    # The 2-min inner join must be a strict subset of the default 1-hour
    # one on this fixture — i.e. the argument actually changed the bound.
    default_inner = stream_stream_click_purchase(spark, sf_dir)
    assert len(_rows(inner, cols)) < len(_rows(default_inner, cols))
    # Outer variant: matched pairs equal the inner join at the same bound.
    outer = stream_stream_click_purchase_outer(
        spark, sf_dir, watermark="2 minutes"
    )
    matched = outer.filter(F.col("purchase_id").isNotNull())
    assert _rows(batch_inner, cols) == _rows(matched, cols)


def test_late_data_filter_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    admitted = swin.late_data_filter(ev, "1 hour")
    mx = ev.agg(F.max("ts")).collect()[0][0]
    rows = admitted.collect()
    assert len(rows) >= 1
    for r in rows:
        assert (mx - r.ts).total_seconds() <= 3600


class TestTransformWithState:
    def test_tws_equals_batch_aggregate(self, spark, sf_dir):
        """transformWithStateInPandas per-user totals over availableNow
        must equal the batch groupBy (and therefore the
        applyInPandasWithState twin). Skipped where google.protobuf is
        absent — the TWS Python runner hard-imports it at worker init
        (environment gate documented in streaming/stateful.py)."""
        import pytest

        pytest.importorskip("google.protobuf")
        from pyspark.sql import functions as F

        from sna_pyspark_graphframes_spark.streaming.stateful import (
            stream_user_running_totals_tws,
        )

        got = {
            r.user_id: (r.n_events, r.total_value, r.last_ts)
            for r in stream_user_running_totals_tws(spark, sf_dir).collect()
        }
        want = {
            r.user_id: (r.n_events, r.total_value, r.last_ts)
            for r in load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
                F.max("ts").alias("last_ts"),
            )
            .collect()
        }
        assert got == want
