"""Golden tests for the temporal join operators (as-of, time-range) on
hand-computed fixtures — boundary semantics (<= vs <, window endpoints) and
NULL behavior are the things the sf-scale oracle can't isolate."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.operators import temporal


def ts(s):
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


LEFT = [
    (1, 10, "2024-01-01T10:00:00", 0.0),  # after p100, before p101
    (2, 10, "2024-01-01T12:00:00", 0.0),  # exactly at p101 (<= includes it)
    (3, 10, "2024-01-01T08:00:00", 0.0),  # before any purchase -> NULL
    (4, 20, "2024-01-01T10:00:00", 0.0),  # user with no purchases -> NULL
]
RIGHT = [
    (100, 10, "2024-01-01T09:00:00", 5.0),
    (101, 10, "2024-01-01T12:00:00", 7.0),
]


class TestAsofJoin:
    def _run(self, spark, strict=False):
        left = _events(spark, [(a, b, ts(c), d) for a, b, c, d in LEFT])
        right = _events(spark, [(a, b, ts(c), d) for a, b, c, d in RIGHT])
        out = temporal.asof_join(
            left.select("event_id", "user_id", "ts"),
            right.select("user_id", "ts", "event_id", "value"),
            on="user_id",
            right_cols=["event_id", "value"],
            prefix="p_",
            strict=strict,
        )
        return {r["event_id"]: r["p_event_id"] for r in out.collect()}

    def test_backward_inclusive(self, spark):
        assert self._run(spark) == {1: 100, 2: 101, 3: None, 4: None}

    def test_strict_excludes_equal_ts(self, spark):
        assert self._run(spark, strict=True) == {1: 100, 2: 100, 3: None, 4: None}

    def test_left_columns_preserved(self, spark):
        left = _events(spark, [(a, b, ts(c), d) for a, b, c, d in LEFT])
        right = _events(spark, [(a, b, ts(c), d) for a, b, c, d in RIGHT])
        out = temporal.asof_join(
            left, right, on="user_id", right_cols=["event_id"], prefix="p_"
        )
        assert set(out.columns) == {
            "event_id", "user_id", "ts", "value", "p_event_id", "p_ts",
        }
        assert out.count() == len(LEFT)


class TestTimeRangeJoin:
    def test_window_endpoints_and_bucket_crossing(self, spark):
        # left at 10:00, window (10:00, 11:00]; right rows straddle the
        # 1-hour bucket boundary — 10:30 (same bucket) and 11:00 (next
        # bucket, still inside the window), 10:00 (excluded: strict lower),
        # 11:00:01 (excluded: above upper)
        left = _events(spark, [(1, 10, ts("2024-01-01T10:00:00"), 0.0)])
        right = _events(
            spark,
            [
                (200, 10, ts("2024-01-01T10:00:00"), 0.0),
                (201, 10, ts("2024-01-01T10:30:00"), 0.0),
                (202, 10, ts("2024-01-01T11:00:00"), 0.0),
                (203, 10, ts("2024-01-01T11:00:01"), 0.0),
                (204, 99, ts("2024-01-01T10:30:00"), 0.0),  # other key
            ],
        )
        out = temporal.time_range_join(
            left.select("event_id", "user_id", "ts"),
            right.select(
                "user_id",
                F.col("ts").alias("fts"),
                F.col("event_id").alias("fid"),
            ),
            on="user_id",
            lower_s=0,
            upper_s=3600,
            left_ts="ts",
            right_ts="fts",
        )
        got = sorted(r["fid"] for r in out.collect())
        assert got == [201, 202]


class TestTimeDecayScore:
    def test_half_life_closed_form(self, spark):
        """Event at t_max decays by 1, one exactly one half-life earlier
        by 0.5, two half-lives by 0.25: 10*1 + 8*0.5 + 4*0.25 = 15.0."""
        from datetime import datetime, timedelta

        from sna_pyspark_graphframes_spark.operators import temporal

        t0 = datetime(2024, 3, 1)
        rows = [
            (1, t0, 10.0),
            (1, t0 - timedelta(days=7), 8.0),
            (1, t0 - timedelta(days=14), 4.0),
            (2, t0 - timedelta(days=7), 6.0),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        got = {
            r.user_id: (r.n_events, r.decayed_value)
            for r in temporal.time_decay_score(df).collect()
        }
        assert got == {1: (3, 15.0), 2: (1, 3.0)}


class TestScd2CarryCols:
    def test_carry_opening_row_column(self, spark):
        from datetime import datetime

        from sna_pyspark_graphframes_spark.operators import temporal

        rows = [
            (1, datetime(2024, 1, 1), 10, "a"),
            (1, datetime(2024, 1, 2), 11, "a"),  # repeat -> collapsed
            (1, datetime(2024, 1, 3), 12, "b"),
        ]
        df = spark.createDataFrame(rows, "k long, ts timestamp, eid long, v string")
        out = temporal.scd2_intervals(
            df, ["k"], ["ts", "eid"], "v", carry_cols=["eid"]
        ).collect()
        got = {(r.v): (r.eid, r.is_current) for r in out}
        # each version carries its OPENING row's eid
        assert got == {"a": (10, False), "b": (12, True)}


class TestKaplanMeier:
    def test_textbook_curve_with_censoring(self, spark):
        """Durations [1 event, 2 censored, 3 event, 4 event, 5 censored]:
        S = 0.8, 0.8, 0.5333, 0.2667, 0.2667 — the classic KM table,
        censored subjects leave the risk set without moving the curve."""
        from datetime import datetime, timedelta

        from sna_pyspark_graphframes_spark.operators import temporal

        base = datetime(2024, 1, 1)
        rows, eid = [], 0

        def ev(uid, day, typ):
            nonlocal eid
            eid += 1
            rows.append((eid, uid, typ, base + timedelta(days=day)))

        for uid in range(1, 6):
            ev(uid, 0, "view")
        ev(1, 1, "purchase")
        ev(2, 2, "click")
        ev(3, 3, "purchase")
        ev(4, 4, "purchase")
        ev(5, 5, "click")
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = {
            r.duration_days: (r.n_risk, r.n_events, r.n_censored, r.survival)
            for r in temporal.kaplan_meier(df).collect()
        }
        assert got[1] == (5, 1, 0, 0.8)
        assert got[2] == (4, 0, 1, 0.8)
        assert got[3] == (3, 1, 0, round(0.8 * 2 / 3, 6))
        assert got[4] == (2, 1, 0, round(0.8 * 2 / 3 * 0.5, 6))
        assert got[5] == (1, 0, 1, round(0.8 * 2 / 3 * 0.5, 6))

    def test_terminal_full_event_drops_to_zero(self, spark):
        """When every remaining at-risk subject has the event, the
        factor hits 0 and S terminates at exactly 0.0 (the zflag path
        — ln(0) is unrepresentable in both engines)."""
        from datetime import datetime, timedelta

        from sna_pyspark_graphframes_spark.operators import temporal

        base = datetime(2024, 1, 1)
        rows = []
        for uid in (1, 2):
            rows.append((uid * 10, uid, "view", base))
            rows.append((uid * 10 + 1, uid, "purchase", base + timedelta(days=2)))
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = temporal.kaplan_meier(df).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.duration_days, r.n_risk, r.n_events, r.survival) == (2, 2, 2, 0.0)
