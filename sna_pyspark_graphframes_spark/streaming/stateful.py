"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the arbitrary-state API (the Spark-native replacement for anything the
built-in windowed aggregations can't express).

Demonstrated operator: per-user running activity accumulator — count, value
sum, and last-seen event time survive across micro-batches in GroupState.
With the availableNow trigger over a static source this degenerates to one
batch, so the result must equal the batch groupBy — which is exactly what
``tests/test_streaming.py`` asserts (the state machinery is still fully
exercised: get/update/exists paths run per group).

Scale notes: state lives in the state store keyed by user_id — O(active
users), partitioned with the shuffle; timeouts (``GroupStateTimeout``)
are how production jobs expire idle keys (we use ProcessingTimeTimeout
with no timeout set, i.e., keep state, since the test source is finite).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _accumulate(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            # pd.Timestamp.value is always ns-since-epoch regardless of the
            # series' underlying resolution (ns vs us under Arrow), unlike
            # astype("int64") which returns the raw resolution-dependent int
            last_us = max(last_us, int(pd.Timestamp(pdf["ts"].max()).value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_running_totals(events_stream: DataFrame) -> DataFrame:
    """Stateful per-user accumulator over a streaming events frame."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful operator over the events file-stream (availableNow)
    into a memory sink; returns the materialized result."""
    import uuid

    from sna_pyspark_graphframes_spark.streaming.stream import read_event_stream

    ev = read_event_stream(spark, sf_dir).select("user_id", "ts", "value")
    out = user_running_totals(ev)
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
