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
    from sna_pyspark_graphframes_spark.streaming.stream import (
        read_event_stream,
        run_to_memory,
        state_shuffle_partitions,
    )

    ev = read_event_stream(spark, sf_dir).select("user_id", "ts", "value")
    out = user_running_totals(ev)
    # adaptive state partitions (r15): the pandas-state operator pays a
    # Python/Arrow worker round-trip PER STATE PARTITION per micro-batch
    # — the most expensive flavor of the fixed per-partition cost the
    # shared helper sizes away (see state_shuffle_partitions).
    return run_to_memory(
        out,
        spark,
        output_mode="update",
        state_partitions=state_shuffle_partitions(
            spark, sf_dir, bytes_per_partition=128 << 10
        ),
    )


# --- transformWithStateInPandas (Spark 4's arbitrary-state API) ---------
#
# The successor to applyInPandasWithState above: state is typed and
# composable (ValueState / ListState / MapState via a handle), timers are
# first-class, and initial state can be seeded from a batch frame. Same
# operator semantics as `_accumulate` so the two APIs are
# differential-testable against each other AND against the batch
# aggregate; the state store layout is still keyed by user_id — O(active
# users), partitioned with the shuffle.
#
# ENVIRONMENT GATE: the transformWithState Python runner speaks a
# protobuf protocol to the JVM and hard-imports google.protobuf at
# worker init — absent in this container (no installs allowed), so the
# operator is implemented + equivalence-tested behind a skip (the
# graphframes-import precedent) and NOT registered as a driver query
# (it would err at runtime here, not for any code reason). On a normal
# Spark 4 deployment (protobuf ships with pyspark[connect]) it runs
# as-is.

TWS_STATE_SCHEMA = "n_events LONG, total_value DOUBLE, last_ts_us LONG"


def _make_totals_processor():
    """Build the StatefulProcessor class lazily (the import exists only
    on Spark 4+)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", TWS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            if self._state.exists():
                n, total, last_us = self._state.get()
            else:
                n, total, last_us = 0, 0.0, 0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    last_us = max(
                        last_us, int(pd.Timestamp(pdf["ts"].max()).value // 1000)
                    )
            self._state.update((n, total, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotals


def user_running_totals_tws(events_stream: DataFrame) -> DataFrame:
    """The :func:`user_running_totals` operator on the
    ``transformWithStateInPandas`` API (Spark 4): same per-user
    accumulator, typed ValueState instead of a raw tuple."""
    proc = _make_totals_processor()
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def stream_user_running_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow file-stream run of the transformWithState operator
    into a memory sink; must equal the batch aggregate (and the
    applyInPandasWithState twin) on a finite source."""
    from sna_pyspark_graphframes_spark.streaming.stream import (
        read_event_stream,
        run_to_memory,
        state_shuffle_partitions,
    )

    ev = read_event_stream(spark, sf_dir).select("user_id", "ts", "value")
    out = user_running_totals_tws(ev)
    return run_to_memory(
        out,
        spark,
        output_mode="update",
        state_partitions=state_shuffle_partitions(
            spark, sf_dir, bytes_per_partition=128 << 10
        ),
    )
