"""Unit tests for keyword search (functions/search.py) and event
analytics (operators/events.py) — semantics the oracle can't pin (the SQL
twin mirrors the implementation, so order-sensitivity and formula checks
need independent fixtures)."""

from __future__ import annotations

import datetime
import math

from sna_pyspark_graphframes_spark.functions import search as fsearch
from sna_pyspark_graphframes_spark.operators import events as oevents


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def events_df(spark, rows):
    """rows: (event_id, user_id, event_type, minutes-offset)."""
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, uid, et, base + datetime.timedelta(minutes=m))
            for eid, uid, et, m in rows
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )


class TestSearch:
    def test_index_stats(self, spark):
        df = docs_df(spark, ["a b a", "b c", "a"])
        stats = {r.w: (r.df, r.total_tf) for r in fsearch.index_stats(df).collect()}
        assert stats == {"a": (2, 3), "b": (2, 2), "c": (1, 1)}

    def test_postings_tf(self, spark):
        df = docs_df(spark, ["x x y", "y"])
        got = {(r.w, r.doc_id): r.tf for r in fsearch.postings(df).collect()}
        assert got == {("x", 0): 2, ("y", 0): 1, ("y", 1): 1}

    def test_bm25_hand_computed(self, spark):
        # 3 docs, query {q}: doc0 has q twice (len 4), doc1 once (len 2),
        # doc2 none. N=3, df=2, avgdl=(4+2+3)/3=3.
        df = docs_df(spark, ["q q a b", "q c", "d e f"])
        rows = {r.doc_id: (r.score, r.rank) for r in
                fsearch.bm25_topk(df, ["q"], k=10).collect()}
        idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
        k1, b = 1.2, 0.75
        avgdl = 3.0

        def s(tf, dl):
            return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 4)

        assert set(rows) == {0, 1}
        assert rows[0][0] == s(2, 4)
        assert rows[1][0] == s(1, 2)
        # higher tf wins despite longer doc here; ranks dense from 1
        assert {rows[0][1], rows[1][1]} == {1, 2}
        assert (rows[0][0] > rows[1][0]) == (rows[0][1] < rows[1][1])

    def test_bm25_multi_term_sum(self, spark):
        df = docs_df(spark, ["p q", "p", "q"])
        rows = {r.doc_id: r.score for r in fsearch.bm25_topk(df, ["p", "q"], k=3).collect()}
        # doc0 matches both terms: its score is the sum of single-term scores
        single_p = {r.doc_id: r.score for r in fsearch.bm25_topk(df, ["p"], k=3).collect()}
        single_q = {r.doc_id: r.score for r in fsearch.bm25_topk(df, ["q"], k=3).collect()}
        assert abs(rows[0] - (single_p[0] + single_q[0])) < 1e-3


class TestFunnel:
    def test_order_matters(self, spark):
        # user 1 does view->click->purchase (converts fully)
        # user 2 purchases BEFORE clicking: reaches click, not purchase
        # user 3 only views
        ev = events_df(
            spark,
            [
                (1, 1, "view", 0), (2, 1, "click", 10), (3, 1, "purchase", 20),
                (4, 2, "view", 0), (5, 2, "purchase", 5), (6, 2, "click", 10),
                (7, 3, "view", 0),
            ],
        )
        got = {r.step: r.n_users for r in oevents.funnel(ev).collect()}
        assert got == {"view": 3, "click": 2, "purchase": 1}

    def test_strictly_after(self, spark):
        # click at the SAME instant as view does not count (strict >)
        ev = events_df(spark, [(1, 1, "view", 0), (2, 1, "click", 0)])
        got = {r.step: r.n_users for r in oevents.funnel(ev).collect()}
        assert got == {"view": 1, "click": 0, "purchase": 0}

    def test_first_touch_anchor(self, spark):
        # two views: the funnel anchors at the FIRST view, so a click
        # between the views still counts
        ev = events_df(
            spark,
            [(1, 1, "view", 0), (2, 1, "click", 5), (3, 1, "view", 10)],
        )
        got = {r.step: r.n_users for r in oevents.funnel(ev).collect()}
        assert got["click"] == 1


class TestCohortRetention:
    def test_weekly_offsets(self, spark):
        # user 1 first event Mon Jan 1: active week 0 and week 2
        # user 2 first event Jan 10: active week 0 only
        ev = events_df(
            spark,
            [
                (1, 1, "view", 0),
                (2, 1, "click", 60 * 24 * 15),   # day 15 -> week 2
                (3, 2, "view", 60 * 24 * 9),     # Jan 10
            ],
        )
        got = {
            (str(r.cohort_week), r.week_offset): r.n_users
            for r in oevents.cohort_retention(ev).collect()
        }
        assert got == {
            ("2024-01-01", 0): 1,
            ("2024-01-01", 2): 1,
            ("2024-01-08", 0): 1,
        }


class TestChangelog:
    def test_latest_by_key_and_tombstones(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        log = spark.createDataFrame(
            [
                (1, 1, "upsert", "a"),
                (1, 3, "upsert", "c"),   # latest for key 1
                (1, 2, "delete", "b"),
                (2, 1, "upsert", "x"),
                (2, 2, "delete", "y"),   # latest for key 2 is a tombstone
            ],
            "k long, ver long, op string, payload string",
        )
        latest = {
            r.k: (r.ver, r.payload)
            for r in relational.latest_by_key(log, ["k"], ["ver"]).collect()
        }
        assert latest == {1: (3, "c"), 2: (2, "y")}
        snap = {
            r.k: r.payload
            for r in relational.apply_changelog(log, ["k"], ["ver"]).collect()
        }
        # key 2's latest op is delete -> absent from the snapshot
        assert snap == {1: "c"}


class TestTimeSeries:
    def test_gap_fill_emits_zero_hours(self, spark):
        from pyspark.sql import functions as F

        from sna_pyspark_graphframes_spark.streaming import windows as swin

        ev = events_df(
            spark,
            [(1, 1, "view", 0), (2, 1, "view", 150)],  # hours 0 and 2; hour 1 empty
        ).withColumn("value", F.lit(1.0))
        got = {
            (str(r.hour), r.event_type): r.n
            for r in swin.hourly_gap_fill(ev).collect()
        }
        assert got[("2024-01-01 00:00:00", "view")] == 1
        assert got[("2024-01-01 01:00:00", "view")] == 0  # the filled gap
        assert got[("2024-01-01 02:00:00", "view")] == 1
        assert len(got) == 3  # 3 hours x 1 type

    def test_moving_avg_calendar_gap_shrinks_window(self, spark):
        import datetime

        from pyspark.sql import functions as F

        from sna_pyspark_graphframes_spark.streaming import windows as swin

        base = datetime.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [
                # user 1: day0 value 10, day1 value 20, day 9 value 30
                (1, 1, base, 10.0),
                (2, 1, base + datetime.timedelta(days=1), 20.0),
                (3, 1, base + datetime.timedelta(days=9), 30.0),
            ],
            "event_id long, user_id long, ts timestamp, value double",
        )
        got = {
            str(r.day): (r.day_value, r.moving_avg)
            for r in swin.user_daily_moving_avg(ev, days=7).collect()
        }
        assert got["2024-01-01"] == (10.0, 10.0)
        assert got["2024-01-02"] == (20.0, 15.0)       # avg(10, 20)
        # day 9 is >6 days after both earlier days: window holds only itself
        assert got["2024-01-10"] == (30.0, 30.0)


class TestReconcile:
    def test_all_status_branches(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        l = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
        )
        r = spark.createDataFrame(
            [(1, 10.0), (2, 25.0), (4, 40.0)], "k long, v double"
        )
        got = {
            row.k: (row.left_value, row.right_value, row.status)
            for row in relational.reconcile(l, r, ["k"], "v").collect()
        }
        assert got == {
            1: (10.0, 10.0, "matched"),
            2: (20.0, 25.0, "mismatch"),
            3: (30.0, None, "left_only"),
            4: (None, 40.0, "right_only"),
        }

    def test_tolerance_absorbs_drift(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        l = spark.createDataFrame([(1, 10.0)], "k long, v double")
        r = spark.createDataFrame([(1, 10.004)], "k long, v double")
        s = relational.reconcile(l, r, ["k"], "v", tol=0.01).collect()[0].status
        assert s == "matched"


class TestMadOutliers:
    def test_hand_computed_fence(self, spark):
        """Group 'a' = [1..9, 1000]: median 5.5, MAD 2.5, fence
        3.5*2.5/0.6745 = 12.97 -> exactly the 1000 row is an outlier.
        Group 'b' = [10, 20, 30]: median 20, MAD 10, fence 51.9 -> none."""
        from sna_pyspark_graphframes_spark.operators import relational

        rows = [("a", float(v)) for v in list(range(1, 10)) + [1000]] + [
            ("b", 10.0),
            ("b", 20.0),
            ("b", 30.0),
        ]
        df = spark.createDataFrame(rows, "g string, x double")
        got = {
            r.g: (r.n, r.median, r.mad, r.n_outliers)
            for r in relational.mad_outliers(df, "x", "g").collect()
        }
        assert got == {"a": (10, 5.5, 2.5, 1), "b": (3, 20.0, 10.0, 0)}

    def test_constant_group_zero_mad_no_outliers(self, spark):
        """All-equal values: MAD = 0, fence = 0, and no |x-med| exceeds
        it (0 > 0 is false) — degenerate groups never flag."""
        from sna_pyspark_graphframes_spark.operators import relational

        df = spark.createDataFrame(
            [("c", 7.0)] * 5, "g string, x double"
        )
        r = relational.mad_outliers(df, "x", "g").collect()[0]
        assert (r.n, r.median, r.mad, r.n_outliers) == (5, 7.0, 0.0, 0)


class TestPopulationStability:
    def test_identical_slices_zero_psi(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        df = spark.createDataFrame(
            [(float(v),) for v in range(1, 101)], "x double"
        )
        r = relational.population_stability(df, df, "x", n_buckets=4).collect()[0]
        assert (r.n_ref, r.n_new, r.psi) == (100, 100, 0.0)

    def test_nulls_dropped_both_slices(self, spark):
        """ADVICE r12: NULL values must be DROPPED, not bucketed —
        Spark's (v >= e) is NULL on NULL v (a NULL bucket) while a SQL
        CASE twin sends NULLs to bucket 0. With the drop, a slice that
        only differs by NULL rows is identical: PSI 0 and counts
        exclude the NULLs."""
        from sna_pyspark_graphframes_spark.operators import relational

        ref = spark.createDataFrame(
            [(float(v),) for v in range(1, 101)], "x double"
        )
        new = ref.unionAll(
            spark.createDataFrame([(None,)] * 7, "x double")
        )
        r = relational.population_stability(ref, new, "x", n_buckets=4).collect()[0]
        assert (r.n_ref, r.n_new, r.psi) == (100, 100, 0.0)


class TestTrendingEventTypes:
    def test_per_window_top3_with_ties(self, spark):
        from datetime import datetime

        from sna_pyspark_graphframes_spark import registry as R

        # build via the registered fn's own logic on a tiny frame: two
        # 6-hour buckets; bucket 1 has 4 types (one must drop), tie on
        # count breaks by event_type ascending
        rows = (
            [(datetime(2024, 1, 1, 0, 5), t) for t in ["a", "a", "b", "b", "c", "d"]]
            + [(datetime(2024, 1, 1, 7, 0), t) for t in ["x", "y"]]
        )
        df = spark.createDataFrame(rows, "ts timestamp, event_type string")
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        counts = df.groupBy(F.window("ts", "6 hours").alias("w"), "event_type").agg(
            F.count("*").cast("long").alias("n")
        )
        rk = F.row_number().over(
            W.partitionBy("w").orderBy(F.col("n").desc(), "event_type")
        )
        out = (
            counts.withColumn("rank", rk.cast("int"))
            .filter(F.col("rank") <= 3)
            .select(F.col("w.start").alias("ws"), "event_type", "n", "rank")
            .collect()
        )
        got = {(r.ws.hour, r.event_type): (r.n, r.rank) for r in out}
        assert got == {
            (0, "a"): (2, 1),
            (0, "b"): (2, 2),
            (0, "c"): (1, 3),  # c beats d on the type tie-break; d drops
            (6, "x"): (1, 1),
            (6, "y"): (1, 2),
        }


class TestRateAnomaly:
    def test_spike_flagged_steady_not(self, spark):
        """26 hourly buckets of 10 events, then one 100-event spike:
        the spike's z against the trailing-24 window (mean 10, var 0 ->
        NULL z) ... use a slightly varied baseline so variance > 0."""
        from datetime import datetime, timedelta

        from sna_pyspark_graphframes_spark.operators import events as oe

        rows = []
        eid = 0
        base = datetime(2024, 1, 1)
        # alternating 9/11 baseline -> mean 10, sample var ~1.04
        for h in range(26):
            n = 9 if h % 2 == 0 else 11
            if h == 25:
                n = 100  # the spike
            for _ in range(n):
                rows.append((eid, base + timedelta(hours=h), "click"))
                eid += 1
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        out = {r.window_start.hour + 24 * (r.window_start.day - 1): r
               for r in oe.rate_anomaly(df).collect()}
        # buckets 0..23 have incomplete trailing windows -> dropped
        assert min(out) == 24 and len(out) == 2
        assert not out[24].is_anomaly  # 9 vs trailing mean ~10: |z| small
        spike = out[25]
        assert spike.n == 100 and spike.is_anomaly and spike.z > 3

    def test_zero_variance_window_emits_null_unflagged(self, spark):
        from datetime import datetime, timedelta

        from sna_pyspark_graphframes_spark.operators import events as oe

        rows = []
        eid = 0
        base = datetime(2024, 1, 1)
        for h in range(25):
            for _ in range(5):  # constant rate -> var 0
                rows.append((eid, base + timedelta(hours=h), "x"))
                eid += 1
        out = oe.rate_anomaly(df := spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )).collect()
        assert len(out) == 1
        assert out[0].z is None and out[0].is_anomaly is False


class TestKsStatistic:
    def test_identical_slices_zero(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        df = spark.createDataFrame(
            [(float(v),) for v in range(50)], "x double"
        )
        r = relational.ks_statistic(df, df, "x").collect()[0]
        assert (r.n_ref, r.n_new, r.ks_num, r.ks) == (50, 50, 0, 0.0)

    def test_hand_computed_and_matches_brute(self, spark):
        """ref = {1,2,3,4}, new = {3,4,5,6}: D = |F_a - F_b| peaks at
        v=2 (2/4 - 0) = 0.5. Also brute-force ECDF cross-check, and the
        distributed prefix-sum path forced through many range
        partitions must agree."""
        from sna_pyspark_graphframes_spark.operators import relational

        a = spark.createDataFrame([(v,) for v in [1.0, 2.0, 3.0, 4.0]], "x double")
        b = spark.createDataFrame([(v,) for v in [3.0, 4.0, 5.0, 6.0]], "x double")
        r = relational.ks_statistic(a, b, "x").collect()[0]
        assert (r.n_ref, r.n_new) == (4, 4)
        assert r.ks_num == 8  # |2*4 - 0*4| at v=2
        assert r.ks == 0.5
        forced = relational.ks_statistic(a, b, "x", n_range_partitions=5).collect()[0]
        assert (forced.ks_num, forced.ks) == (8, 0.5)

    def test_nulls_dropped(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        a = spark.createDataFrame([(1.0,), (None,), (2.0,)], "x double")
        b = spark.createDataFrame([(1.0,), (2.0,), (None,)], "x double")
        r = relational.ks_statistic(a, b, "x").collect()[0]
        assert (r.n_ref, r.n_new, r.ks) == (2, 2, 0.0)

    def test_empty_side(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        a = spark.createDataFrame([(1.0,)], "x double")
        b = spark.createDataFrame([], "x double")
        r = relational.ks_statistic(a, b, "x").collect()[0]
        assert (r.n_ref, r.n_new, r.ks) == (1, 0, 0.0)


class TestEcdfAndTrimmed:
    def test_ecdf_hand_computed(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        df = spark.createDataFrame(
            [(v,) for v in [1.0, 1.0, 2.0, 5.0]], "x double"
        )
        got = {r.v: (r.n_le, r.ecdf) for r in relational.ecdf(df, "x").collect()}
        assert got == {1.0: (2, 0.5), 2.0: (3, 0.75), 5.0: (4, 1.0)}
        # forced through many range partitions: identical
        forced = {
            r.v: (r.n_le, r.ecdf)
            for r in relational.ecdf(df, "x", n_range_partitions=4).collect()
        }
        assert forced == got

    def test_ecdf_empty_and_null(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        df = spark.createDataFrame([(None,)], "x double")
        assert relational.ecdf(df, "x").count() == 0

    def test_trimmed_mean_drops_tails(self, spark):
        """Group a: 1..9 plus outlier 1000; 5-95% keeps 1..9 (q95 of the
        10 values = 595.45 interpolated... compute exactly instead):
        assert the planted outlier is excluded when bounds say so and
        means/counts follow the exact interpolated quantiles."""
        from sna_pyspark_graphframes_spark.operators import relational

        rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)]
        df = spark.createDataFrame(rows, "g string, x double")
        r = relational.trimmed_stats(df, "x", "g", lo=0.1, hi=0.9).collect()[0]
        # exact interpolated quantiles over 10 values: position 0.1*(10-1)
        # = 0.9 -> q10 = 1 + 0.9*(2-1) = 1.9; position 8.1 -> q90 =
        # 9 + 0.1*(1000-9) = 108.1
        assert (r.n, r.q_lo, r.q_hi) == (10, 1.9, 108.1)
        # kept: 2..9 (1 < 1.9; 1000 > 108.1)
        assert r.n_kept == 8
        assert r.trimmed_mean == round(sum(range(2, 10)) / 8, 4)


class TestRrfFuse:
    def test_overlapping_doc_wins(self, spark):
        """A doc ranked mid-list by BOTH systems outranks docs that are
        top-1 in only one: 1/(60+3)+1/(60+3) > 1/(60+1)."""
        from sna_pyspark_graphframes_spark.functions import search as fs

        r1 = spark.createDataFrame(
            [(10, 1), (11, 2), (99, 3)], "doc_id long, rank int"
        )
        r2 = spark.createDataFrame(
            [(20, 1), (21, 2), (99, 3)], "doc_id long, rank int"
        )
        got = {r.doc_id: (r.n_systems, r.rrf_score, r.rank)
               for r in fs.rrf_fuse([r1, r2]).collect()}
        assert got[99][0] == 2 and got[99][2] == 1  # fused winner
        assert got[99][1] == round(2 / 63, 6)
        assert got[10][1] == got[20][1] == round(1 / 61, 6)
        # tie between the two single-system top-1s breaks by doc_id
        assert got[10][2] == 2 and got[20][2] == 3

    def test_top_cap(self, spark):
        from sna_pyspark_graphframes_spark.functions import search as fs

        r1 = spark.createDataFrame(
            [(i, i + 1) for i in range(5)], "doc_id long, rank int"
        )
        assert fs.rrf_fuse([r1], top=2).count() == 2

    def test_empty_rankings_raise_and_top_zero_is_a_real_cap(self, spark):
        """ADVICE r13: zero systems is a ValueError (no schema to
        return), and top=0 caps to zero rows instead of reading as
        'uncapped'."""
        import pytest

        from sna_pyspark_graphframes_spark.functions import search as fs

        with pytest.raises(ValueError, match="at least one ranking"):
            fs.rrf_fuse([])
        r1 = spark.createDataFrame(
            [(i, i + 1) for i in range(3)], "doc_id long, rank int"
        )
        assert fs.rrf_fuse([r1], top=0).count() == 0


class TestZscoreNormalize:
    def test_hand_computed(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", None)]
        df = spark.createDataFrame(rows, "g string, x double")
        got = {(r.g, r.x): r.z for r in
               relational.zscore_normalize(df, "x", "g").collect()}
        # group a: mean 2, sample sd 1
        assert got[("a", 1.0)] == -1.0
        assert got[("a", 2.0)] == 0.0
        assert got[("a", 3.0)] == 1.0
        # group b: single value -> zero variance -> NULL z; NULL passes through
        assert got[("b", 5.0)] is None
        assert got[("b", None)] is None


class TestNdcgAtK:
    def _frames(self, spark, ranking, rel):
        r = spark.createDataFrame(ranking, "doc_id long, rank int")
        g = spark.createDataFrame(rel, "doc_id long, rel int")
        return r, g

    def test_perfect_ranking_is_one(self, spark):
        from sna_pyspark_graphframes_spark.functions import search as fs

        r, g = self._frames(
            spark, [(1, 1), (2, 2), (3, 3)], [(1, 3), (2, 2), (3, 1)]
        )
        row = fs.ndcg_at_k(r, g, k=10).collect()[0]
        assert row.ndcg == 1.0 and row.dcg == row.idcg
        assert (row.n_ranked, row.n_relevant) == (3, 3)

    def test_hand_computed_reversed(self, spark):
        import math

        from sna_pyspark_graphframes_spark.functions import search as fs

        r, g = self._frames(
            spark, [(3, 1), (2, 2), (1, 3)], [(1, 3), (2, 2), (3, 1)]
        )
        row = fs.ndcg_at_k(r, g, k=10).collect()[0]
        dcg = (2**1 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (
            2**3 - 1
        ) / math.log2(4)
        idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (
            2**1 - 1
        ) / math.log2(4)
        assert row.dcg == round(dcg, 6)
        assert row.idcg == round(idcg, 6)
        assert row.ndcg == round(dcg / idcg, 6)

    def test_unjudged_docs_count_zero_and_k_truncates(self, spark):
        from sna_pyspark_graphframes_spark.functions import search as fs

        # doc 9 unjudged (rel 0); doc 2 relevant but ranked past k
        r, g = self._frames(
            spark, [(9, 1), (1, 2), (2, 3)], [(1, 2), (2, 3)]
        )
        row = fs.ndcg_at_k(r, g, k=2).collect()[0]
        import math

        dcg = 0.0 + (2**2 - 1) / math.log2(3)
        idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3)
        assert row.n_ranked == 2
        assert row.dcg == round(dcg, 6) and row.idcg == round(idcg, 6)

    def test_no_relevant_docs_null(self, spark):
        from sna_pyspark_graphframes_spark.functions import search as fs

        r, g = self._frames(spark, [(1, 1)], [(1, 0)])
        row = fs.ndcg_at_k(r, g, k=10).collect()[0]
        assert row.idcg == 0.0 and row.ndcg is None and row.n_relevant == 0


class TestPrecisionRecallAtK:
    def test_hand_computed(self, spark):
        from sna_pyspark_graphframes_spark.functions import search as fs

        # top-4 ranked: docs 1,2,3,4; relevant (rel>=1): 2,4,9 -> hits 2
        r = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3), (4, 4)], "doc_id long, rank int"
        )
        g = spark.createDataFrame(
            [(2, 1), (4, 2), (9, 3), (3, 0)], "doc_id long, rel int"
        )
        row = fs.precision_recall_at_k(r, g, k=4).collect()[0]
        assert (row.n_hits, row.n_relevant) == (2, 3)
        p, rc = 2 / 4, 2 / 3
        assert row.precision == round(p, 6) and row.recall == round(rc, 6)
        assert row.f1 == round(2 * p * rc / (p + rc), 6)

    def test_min_rel_threshold(self, spark):
        from sna_pyspark_graphframes_spark.functions import search as fs

        r = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
        g = spark.createDataFrame(
            [(1, 1), (2, 2)], "doc_id long, rel int"
        )
        row = fs.precision_recall_at_k(r, g, k=2, min_rel=2).collect()[0]
        assert (row.n_hits, row.n_relevant) == (1, 1)
        assert row.precision == 0.5 and row.recall == 1.0

    def test_no_relevant_docs_null(self, spark):
        from sna_pyspark_graphframes_spark.functions import search as fs

        r = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
        g = spark.createDataFrame([(1, 0)], "doc_id long, rel int")
        row = fs.precision_recall_at_k(r, g, k=5).collect()[0]
        assert row.precision == 0.0
        assert row.recall is None and row.f1 is None


class TestIntereventStats:
    def test_hand_computed_burstiness(self, spark):
        from sna_pyspark_graphframes_spark.operators import events as oe

        # type A at t = 0, 10, 30 s -> gaps 10, 20: mu=15, sigma=5
        ev = events_df(
            spark,
            [(1, 1, "A", 0), (2, 1, "A", 10 / 60), (3, 2, "A", 30 / 60)],
        )
        row = {r.event_type: r for r in oe.interevent_stats(ev).collect()}["A"]
        assert row.n_gaps == 2 and row.mean_gap_s == 15.0
        assert row.cv == round(5 / 15, 6)
        assert row.burstiness == round((5 - 15) / (5 + 15), 6)

    def test_single_event_type_has_no_row(self, spark):
        from sna_pyspark_graphframes_spark.operators import events as oe

        ev = events_df(spark, [(1, 1, "solo", 0), (2, 1, "pair", 0), (3, 2, "pair", 5)])
        types = {r.event_type for r in oe.interevent_stats(ev).collect()}
        assert types == {"pair"}  # 'solo' has no gap

    def test_periodic_burstiness_minus_one(self, spark):
        from sna_pyspark_graphframes_spark.operators import events as oe

        # perfectly periodic: sigma = 0 -> CV 0, B = -1
        ev = events_df(spark, [(i, 1, "tick", i * 5) for i in range(6)])
        row = oe.interevent_stats(ev).collect()[0]
        assert row.cv == 0.0 and row.burstiness == -1.0
