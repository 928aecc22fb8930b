"""Unit tests for the round-14 classical-stats family: Welch's t-test,
the doubled-rank engine (avg_rank2), Spearman, Mann-Whitney U, lag
autocorrelation, and the exact decision stump.

Strategy mirrors TestGiniCoefficient: hand-computed closed forms on tiny
fixtures, a forced-multi-partition invariance check for everything that
rides the distributed prefix-sum engine, and degenerate-input contracts
(empty / constant / single-group inputs emit NULL, never crash).
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.functions import ml as fml
from sna_pyspark_graphframes_spark.operators import relational, temporal


class TestWelchTTest:
    def test_hand_computed(self, spark):
        # a = [1,2,3,4], b = [2,4,6,8,10]
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)] + [
            ("b", float(v)) for v in (2, 4, 6, 8, 10)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = relational.welch_ttest(df, "v", "g", "a", "b").collect()[0]
        ma, mb = 2.5, 6.0
        va = sum((x - ma) ** 2 for x in (1, 2, 3, 4)) / 3  # 5/3
        vb = sum((x - mb) ** 2 for x in (2, 4, 6, 8, 10)) / 4  # 10
        se2 = va / 4 + vb / 5
        t = (ma - mb) / math.sqrt(se2)
        dfw = se2 * se2 / (
            (va / 4) ** 2 / 3 + (vb / 5) ** 2 / 4
        )
        assert (r.n_a, r.n_b) == (4, 5)
        assert r.mean_a == 2.5 and r.mean_b == 6.0
        assert r.t_stat == round(t, 4)
        assert r.df_welch == round(dfw, 2)

    def test_single_row_group_is_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
        )
        r = relational.welch_ttest(df, "v", "g", "a", "b").collect()[0]
        assert r.n_a == 1 and r.t_stat is None and r.df_welch is None

    def test_zero_variance_both_is_null(self, spark):
        df = spark.createDataFrame(
            [("a", 5.0)] * 3 + [("b", 7.0)] * 3, "g string, v double"
        )
        r = relational.welch_ttest(df, "v", "g", "a", "b").collect()[0]
        # se2 = 0 -> t undefined, NULL (not inf)
        assert r.t_stat is None

    def test_nulls_and_other_groups_drop(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", None), ("c", 99.0), ("b", 2.0), ("a", 3.0),
             ("b", 4.0)],
            "g string, v double",
        )
        r = relational.welch_ttest(df, "v", "g", "a", "b").collect()[0]
        assert (r.n_a, r.n_b) == (2, 2)


class TestAvgRank2:
    def test_tie_averaged_ranks_doubled(self, spark):
        # values [10, 20, 20, 30]: avg ranks 1, 2.5, 2.5, 4 -> r2 = 2,5,5,8
        df = spark.createDataFrame(
            [(10.0,), (20.0,), (20.0,), (30.0,)], "v double"
        )
        out = {
            r.v: (r.c, r.r2)
            for r in relational.avg_rank2(df, "v").collect()
        }
        assert out == {10.0: (1, 2), 20.0: (2, 5), 30.0: (1, 8)}

    def test_forced_multi_partition_matches(self, spark):
        import random

        rng = random.Random(14)
        rows = [(float(rng.randint(0, 9)),) for _ in range(150)]
        df = spark.createDataFrame(rows, "v double")
        a = sorted(
            (r.v, r.r2) for r in relational.avg_rank2(df, "v").collect()
        )
        b = sorted(
            (r.v, r.r2)
            for r in relational.avg_rank2(
                df, "v", n_range_partitions=7
            ).collect()
        )
        assert a == b
        # doubled ranks over all rows must sum to 2 * n(n+1)/2
        g = {v: (c, r2) for v, c, r2 in
             ((r.v, r.c, r.r2) for r in
              relational.avg_rank2(df, "v").collect())}
        n = len(rows)
        assert sum(c * r2 for c, r2 in g.values()) == n * (n + 1)


class TestSpearman:
    def test_perfect_monotone(self, spark):
        df = spark.createDataFrame(
            [(1.0, 10.0), (2.0, 20.0), (3.0, 35.0), (4.0, 99.0)],
            "x double, y double",
        )
        r = relational.spearman_corr(df, "x", "y").collect()[0]
        assert r.spearman == 1.0 and r.n == 4

    def test_perfect_reverse(self, spark):
        df = spark.createDataFrame(
            [(1.0, 9.0), (2.0, 7.0), (3.0, 5.0), (4.0, 1.0)],
            "x double, y double",
        )
        r = relational.spearman_corr(df, "x", "y").collect()[0]
        assert r.spearman == -1.0

    def test_ties_match_textbook_formula(self, spark):
        import numpy as np

        rows = [(1.0, 2.0), (1.0, 3.0), (2.0, 2.0), (3.0, 1.0),
                (3.0, 5.0), (4.0, 5.0)]
        df = spark.createDataFrame(rows, "x double, y double")
        r = relational.spearman_corr(df, "x", "y").collect()[0]

        def avg_ranks(vs):
            order = np.argsort(vs, kind="stable")
            ranks = np.empty(len(vs))
            i = 0
            svs = np.array(vs)[order]
            while i < len(vs):
                j = i
                while j < len(vs) and svs[j] == svs[i]:
                    j += 1
                ranks[order[i:j]] = (i + j + 1) / 2.0
                i = j
            return ranks

        rx = avg_ranks([a for a, _ in rows])
        ry = avg_ranks([b for _, b in rows])
        rho = np.corrcoef(rx, ry)[0, 1]
        assert r.spearman == pytest.approx(round(rho, 6), abs=1e-6)

    def test_constant_column_is_null(self, spark):
        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
        )
        r = relational.spearman_corr(df, "x", "y").collect()[0]
        assert r.spearman is None and r.n == 3

    def test_null_rows_drop_complete_case(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1.0), (None, 9.0), (2.0, None), (3.0, 3.0)],
            "x double, y double",
        )
        r = relational.spearman_corr(df, "x", "y").collect()[0]
        assert r.n == 2 and r.spearman == 1.0


class TestMannWhitneyU:
    def test_hand_computed_no_ties(self, spark):
        # a = [1, 3], b = [2, 4, 5]: ranks 1..5, Ra = 1+3=4, U = 4-3 = 1
        rows = [("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 4.0), ("b", 5.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = relational.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        assert (r.n_a, r.n_b, r.u2_a, r.tie_sum) == (2, 3, 2, 0)
        assert r.u_a == 1.0
        mu, sig = 3.0, math.sqrt(2 * 3 * 6 / 12.0)
        assert r.z == round((1.0 - mu) / sig, 6)

    def test_tie_correction_term(self, spark):
        # pooled [1, 2, 2, 2, 3]: tie block of 3 -> tie_sum = 27 - 3 = 24
        rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 2.0), ("b", 3.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = relational.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        assert r.tie_sum == 24
        # ranks: 1, 3, 3, 3, 5 -> Ra = 1 + 3 = 4, U = 4 - 3 = 1
        assert r.u_a == 1.0

    def test_scipy_parity_when_available(self, spark):
        scipy_stats = pytest.importorskip("scipy.stats")
        import random

        rng = random.Random(3)
        rows = [("a", float(rng.randint(0, 15))) for _ in range(40)] + [
            ("b", float(rng.randint(3, 18))) for _ in range(35)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = relational.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        a = [v for g, v in rows if g == "a"]
        b = [v for g, v in rows if g == "b"]
        res = scipy_stats.mannwhitneyu(a, b, alternative="two-sided",
                                       method="asymptotic")
        assert r.u_a == res.statistic
        # scipy applies a 0.5 continuity correction by default; compare
        # against the explicit formula instead
        n_a, n_b = len(a), len(b)
        nn = n_a + n_b
        sigma2 = (n_a * n_b / 12.0
                  * ((nn + 1) - r.tie_sum / (nn * (nn - 1))))
        z = (r.u_a - n_a * n_b / 2.0) / math.sqrt(sigma2)
        assert r.z == pytest.approx(round(z, 6), abs=1e-6)

    def test_empty_group_z_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0)], "g string, v double"
        )
        r = relational.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        assert r.n_b == 0 and r.z is None


class TestLagAutocorr:
    def test_matches_numpy_per_lag_pearson(self, spark):
        import numpy as np

        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "i long, x long"
        )
        out = {r.lag: r for r in
               temporal.lag_autocorr(df, "i", "x", max_lag=3).collect()}
        for k in (1, 2, 3):
            a = np.array(xs[:-k], dtype=float)
            b = np.array(xs[k:], dtype=float)
            assert out[k].n_pairs == len(xs) - k
            assert out[k].sxy == int((a * b).sum())
            assert out[k].acf == pytest.approx(
                round(float(np.corrcoef(a, b)[0, 1]), 6), abs=1e-6
            )

    def test_periodic_series_peaks_at_period(self, spark):
        xs = [10, 2, 3, 10, 2, 3, 10, 2, 3, 10, 2, 3]
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "i long, x long"
        )
        out = {r.lag: r.acf for r in
               temporal.lag_autocorr(df, "i", "x", max_lag=4).collect()}
        assert out[3] == 1.0  # exact period
        assert out[1] < 0.5 and out[2] < 0.5

    def test_index_gaps_form_no_pair(self, spark):
        # indices 0,1,2,10: lag 1 pairs only (0,1),(1,2)
        df = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (10, 4)], "i long, x long"
        )
        out = {r.lag: r for r in
               temporal.lag_autocorr(df, "i", "x", max_lag=2).collect()}
        assert out[1].n_pairs == 2 and out[2].n_pairs == 1

    def test_constant_series_null(self, spark):
        df = spark.createDataFrame(
            [(i, 5) for i in range(6)], "i long, x long"
        )
        out = temporal.lag_autocorr(df, "i", "x", max_lag=2).collect()
        assert all(r.acf is None for r in out)


class TestDecisionStump:
    def test_perfectly_separable(self, spark):
        rows = [(1.0, 0), (2.0, 0), (3.0, 0), (10.0, 1), (11.0, 1)]
        df = spark.createDataFrame(rows, "v double, y int")
        r = fml.decision_stump(df, "v", F.col("y") == 1).collect()[0]
        assert r.threshold == 3.0
        assert (r.n_left, r.pos_left, r.n_right, r.pos_right) == (3, 0, 2, 2)
        # parent gini mass = n - (pos^2 + neg^2)/n = 5 - (4+9)/5 = 2.4;
        # perfect split -> W = 0, gain = 2.4/5
        assert r.gini_gain == round(2.4 / 5, 6)

    def test_tie_break_smallest_threshold(self, spark):
        # y constant: every split has W == parent == 0 -> ties on W,
        # the smallest candidate threshold must win deterministically
        rows = [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 1)]
        df = spark.createDataFrame(rows, "v double, y int")
        r = fml.decision_stump(df, "v", F.col("y") == 1).collect()[0]
        assert r.threshold == 1.0 and r.gini_gain == 0.0

    def test_max_value_not_a_candidate(self, spark):
        # the max threshold would leave an empty right side
        rows = [(1.0, 0), (2.0, 1)]
        df = spark.createDataFrame(rows, "v double, y int")
        r = fml.decision_stump(df, "v", F.col("y") == 1).collect()[0]
        assert r.threshold == 1.0 and r.n_right == 1

    def test_exhaustive_brute_force_parity(self, spark):
        import random

        rng = random.Random(41)
        rows = [
            (float(rng.randint(0, 12)), rng.randint(0, 1))
            for _ in range(120)
        ]
        df = spark.createDataFrame(rows, "v double, y int")
        r = fml.decision_stump(df, "v", F.col("y") == 1).collect()[0]
        vs = sorted({v for v, _ in rows})
        n = len(rows)
        pos = sum(y for _, y in rows)

        def w_of(t):
            nl = sum(1 for v, _ in rows if v <= t)
            pl = sum(y for v, y in rows if v <= t)
            nr, pr = n - nl, pos - pl
            return (nl - (pl * pl + (nl - pl) ** 2) / nl) + (
                nr - (pr * pr + (nr - pr) ** 2) / nr
            )

        best = min((w_of(t), t) for t in vs[:-1])
        assert r.threshold == best[1]
        parent = n - (pos * pos + (n - pos) ** 2) / n
        assert r.gini_gain == round((parent - best[0]) / n, 6)

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "v double, y int")
        assert fml.decision_stump(df, "v", F.col("y") == 1).count() == 0

    def test_null_feature_and_label_drop(self, spark):
        rows = [(None, 0), (1.0, None), (1.0, 0), (5.0, 1), (6.0, 1)]
        df = spark.createDataFrame(rows, "v double, y int")
        r = fml.decision_stump(df, "v", F.col("y") == 1).collect()[0]
        assert (r.n_left + r.n_right) == 3


class TestChi2Independence:
    def test_hand_computed_2x2(self, spark):
        # contingency [[10, 20], [30, 40]]
        rows = (
            [("a", "u")] * 10 + [("a", "v")] * 20
            + [("b", "u")] * 30 + [("b", "v")] * 40
        )
        df = spark.createDataFrame(rows, "x string, y string")
        r = fml.chi2_independence(df, "x", "y").collect()[0]
        assert (r.n, r.r, r.c, r.dof) == (100, 2, 2, 1)
        n = 100
        chi2 = 0.0
        marg_x, marg_y = {"a": 30, "b": 70}, {"u": 40, "v": 60}
        for (xv, yv), o in {("a", "u"): 10, ("a", "v"): 20,
                            ("b", "u"): 30, ("b", "v"): 40}.items():
            e = marg_x[xv] * marg_y[yv] / n
            chi2 += (o - e) ** 2 / e
        assert r.chi2 == round(chi2, 4)
        assert r.cramers_v == round(math.sqrt(chi2 / (n * 1)), 6)

    def test_perfect_association_v_is_one(self, spark):
        rows = [("a", "u")] * 5 + [("b", "v")] * 5
        df = spark.createDataFrame(rows, "x string, y string")
        r = fml.chi2_independence(df, "x", "y").collect()[0]
        assert r.cramers_v == 1.0

    def test_single_level_column(self, spark):
        rows = [("a", "u"), ("a", "v"), ("a", "u")]
        df = spark.createDataFrame(rows, "x string, y string")
        r = fml.chi2_independence(df, "x", "y").collect()[0]
        assert r.dof == 0 and r.chi2 == 0.0 and r.cramers_v is None


class TestCusumChangepoint:
    def test_planted_step_found(self, spark):
        # level 10 for t=1..10, level 20 for t=11..20 -> argmax at t=10
        xs = [10] * 10 + [20] * 10
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "i long, x long"
        )
        r = relational.cusum_changepoint(df, "i", "x").collect()[0]
        assert (r.n, r.sum_x, r.t_star, r.idx_star) == (20, 300, 10, 9)
        # S_10 = 100 - 10*15 = -50 -> |n*S| = 20*50 = 1000
        assert r.cusum_num == 1000 and r.cusum == 50.0

    def test_closed_form_brute_force(self, spark):
        import random

        rng = random.Random(9)
        xs = [rng.randint(0, 30) for _ in range(57)]
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "i long, x long"
        )
        r = relational.cusum_changepoint(
            df, "i", "x", n_range_partitions=5
        ).collect()[0]
        n, sx = len(xs), sum(xs)
        ts = []
        cum = 0
        for t, x in enumerate(xs, start=1):
            cum += x
            ts.append((abs(n * cum - t * sx), t))
        best = max(ts, key=lambda p: (p[0], -p[1]))
        assert (r.cusum_num, r.t_star) == best

    def test_constant_series_zero_stat_null_z(self, spark):
        df = spark.createDataFrame(
            [(i, 7) for i in range(12)], "i long, x long"
        )
        r = relational.cusum_changepoint(df, "i", "x").collect()[0]
        assert r.cusum_num == 0 and r.z is None
        assert r.t_star == 1  # smallest-t tie-break over all-zero T

    def test_empty(self, spark):
        df = spark.createDataFrame([], "i long, x long")
        assert relational.cusum_changepoint(df, "i", "x").count() == 0


class TestBenfordDigits:
    def test_hand_counts_and_grid_completeness(self, spark):
        vals = [123, 19, 1, 250, 2, 37, 999, 10**6]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        out = {r.digit: r for r in
               relational.benford_digits(df, "v").collect()}
        assert sorted(out) == list(range(1, 10))  # all 9 rows
        assert out[1].observed == 4  # 123, 19, 1, 1e6
        assert out[2].observed == 2  # 250, 2
        assert out[3].observed == 1 and out[9].observed == 1
        assert out[4].observed == 0 and out[4].observed_p == 0.0
        assert out[1].n == 8
        assert out[1].expected_p == round(math.log10(2), 6)

    def test_nonpositive_and_null_drop(self, spark):
        df = spark.createDataFrame(
            [(-5,), (0,), (None,), (42,)], "v long"
        )
        out = {r.digit: r for r in
               relational.benford_digits(df, "v").collect()}
        assert out[4].observed == 1 and out[4].n == 1

    def test_decade_boundaries_exact(self, spark):
        # the string path must never misround 10^k to digit 9
        df = spark.createDataFrame(
            [(10,), (100,), (1000,), (10**12,)], "v long"
        )
        out = {r.digit: r.observed for r in
               relational.benford_digits(df, "v").collect()}
        assert out[1] == 4 and sum(out.values()) == 4

    def test_chi2_term_formula(self, spark):
        vals = [1, 1, 2, 3]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        out = {r.digit: r for r in
               relational.benford_digits(df, "v").collect()}
        n, p1 = 4, math.log10(2)
        assert out[1].chi2_term == round((2 - n * p1) ** 2 / (n * p1), 4)


class TestFleschFeatures:
    def test_hand_computed(self, spark):
        from sna_pyspark_graphframes_spark.functions import text as ftext

        df = spark.createDataFrame(
            [(1, "The cat sat. The dog ran!")], "id long, text string"
        )
        r = ftext.flesch_features(df).collect()[0]
        # words: The,cat,sat,The,dog,ran = 6; sentences: '.', '!' = 2
        # vowel groups: e,a,a,e,o,a = 6
        assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
        assert r.flesch == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 4)

    def test_fragment_floors_sentences(self, spark):
        from sna_pyspark_graphframes_spark.functions import text as ftext

        df = spark.createDataFrame(
            [(1, "no terminal punctuation here")], "id long, text string"
        )
        r = ftext.flesch_features(df).collect()[0]
        assert r.n_sentences == 1 and r.flesch is not None

    def test_no_words_null(self, spark):
        from sna_pyspark_graphframes_spark.functions import text as ftext

        df = spark.createDataFrame(
            [(1, "123 456 !!!")], "id long, text string"
        )
        r = ftext.flesch_features(df).collect()[0]
        assert r.n_words == 0 and r.flesch is None


class TestLagCrosscorr:
    def test_planted_lead_peaks_at_its_lag(self, spark):
        import random

        rng = random.Random(2)
        a = [rng.randint(0, 50) for _ in range(40)]
        # b lags a by exactly 2: b[t] = a[t-2]
        rows_a = [(i, x) for i, x in enumerate(a)]
        rows_b = [(i + 2, x) for i, x in enumerate(a)]
        da = spark.createDataFrame(rows_a, "i long, x long")
        db = spark.createDataFrame(rows_b, "i long, x long")
        out = {r.lag: r.ccf for r in
               temporal.lag_crosscorr(da, db, "i", "x", max_lag=3).collect()}
        assert out[2] == 1.0
        assert all(abs(out[k] or 0) < 0.9 for k in out if k != 2)

    def test_matches_numpy(self, spark):
        import numpy as np

        a = [3, 1, 4, 1, 5, 9, 2, 6]
        b = [2, 7, 1, 8, 2, 8, 1, 8]
        da = spark.createDataFrame(list(enumerate(a)), "i long, x long")
        db = spark.createDataFrame(list(enumerate(b)), "i long, x long")
        out = {r.lag: r for r in
               temporal.lag_crosscorr(da, db, "i", "x", max_lag=2).collect()}
        for k in (-2, -1, 0, 1, 2):
            if k >= 0:
                xa, xb = np.array(a[: len(a) - k]), np.array(b[k:])
            else:
                xa, xb = np.array(a[-k:]), np.array(b[: len(b) + k])
            assert out[k].n_pairs == len(xa)
            assert out[k].sxy == int((xa * xb).sum())
            assert out[k].ccf == pytest.approx(
                round(float(np.corrcoef(xa, xb)[0, 1]), 6), abs=1e-6
            )

    def test_lag_zero_is_plain_pearson(self, spark):
        da = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3)], "i long, x long"
        )
        out = {r.lag: r.ccf for r in
               temporal.lag_crosscorr(da, da, "i", "x", max_lag=1).collect()}
        assert out[0] == 1.0


class TestLogrankTest:
    @staticmethod
    def _events(spark, rows):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        data = [
            (uid, tp, base + dt.timedelta(days=day))
            for uid, tp, day in rows
        ]
        return spark.createDataFrame(
            data, "user_id long, event_type string, ts timestamp"
        )

    def test_hand_computed(self, spark):
        ev = self._events(spark, [
            (2, "view", 0), (2, "purchase", 1),
            (4, "view", 0), (4, "view", 3),
            (1, "view", 0), (1, "purchase", 2),
            (3, "view", 0), (3, "purchase", 2),
        ])
        r = temporal.logrank_test(ev, F.col("uid") % 2 == 0).collect()[0]
        assert (r.n_1, r.n_2, r.events_1, r.events_2) == (2, 2, 1, 2)
        e1 = 1 * 2 / 4 + 2 * 1 / 3
        v = (1 * (2 / 4) * (2 / 4) * (4 - 1) / (4 - 1)
             + 2 * (1 / 3) * (2 / 3) * (3 - 2) / (3 - 1))
        assert r.expected_1 == round(e1, 4)
        assert r.var_sum == round(v, 4)
        assert r.chi2 == round((1 - e1) ** 2 / v, 6)

    def test_mirrored_cohorts_chi2_zero(self, spark):
        # identical duration/event profiles in both cohorts -> O = E
        rows = []
        for base_uid in (0, 1):  # even cohort, odd cohort
            rows += [
                (10 + base_uid, "view", 0), (10 + base_uid, "purchase", 1),
                (20 + base_uid, "view", 0), (20 + base_uid, "purchase", 3),
                (30 + base_uid, "view", 0), (30 + base_uid, "view", 5),
            ]
        ev = self._events(spark, rows)
        r = temporal.logrank_test(ev, F.col("uid") % 2 == 0).collect()[0]
        assert r.n_1 == r.n_2 == 3
        assert r.chi2 == 0.0

    def test_strong_separation_large_chi2(self, spark):
        # cohort 1 converts day 1, cohort 2 never converts
        rows = []
        for u in range(0, 20, 2):
            rows += [(u, "view", 0), (u, "purchase", 1)]
        for u in range(1, 21, 2):
            rows += [(u, "view", 0), (u, "view", 9)]
        ev = self._events(spark, rows)
        r = temporal.logrank_test(ev, F.col("uid") % 2 == 0).collect()[0]
        assert r.events_1 == 10 and r.events_2 == 0
        assert r.chi2 is not None and r.chi2 > 5.0

    def test_empty_cohort_guard(self, spark):
        ev = self._events(spark, [(2, "view", 0), (2, "purchase", 1)])
        r = temporal.logrank_test(ev, F.col("uid") % 2 == 0).collect()[0]
        # single cohort: every at-risk set is cohort-1-only -> v = 0
        assert r.n_2 == 0 and r.chi2 is None


class TestFkIntegrityAudit:
    def test_hand_computed(self, spark):
        child = spark.createDataFrame(
            [(1,), (1,), (1,), (2,), (3,), (3,), (None,)], "k long"
        )
        parent = spark.createDataFrame([(1,), (2,), (9,)], "p long")
        r = relational.fk_integrity_audit(child, "k", parent, "p").collect()[0]
        assert (r.n_child, r.n_child_keys, r.n_parent_keys) == (7, 4, 3)
        # orphans: key 3 (2 rows) + NULL key (1 row)
        assert (r.n_orphan_rows, r.n_orphan_keys) == (3, 2)
        assert r.orphan_ratio == round(3 / 7, 6)
        assert r.max_fanout == 3 and r.avg_fanout == 2.0  # keys 1,2 -> 4/2

    def test_clean_fk_zero_orphans(self, spark):
        child = spark.createDataFrame([(1,), (2,), (2,)], "k long")
        parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
        r = relational.fk_integrity_audit(child, "k", parent, "p").collect()[0]
        assert r.n_orphan_rows == 0 and r.orphan_ratio == 0.0

    def test_empty_parent_all_orphans(self, spark):
        child = spark.createDataFrame([(1,), (2,)], "k long")
        parent = spark.createDataFrame([], "p long")
        r = relational.fk_integrity_audit(child, "k", parent, "p").collect()[0]
        assert r.n_parent_keys == 0 and r.orphan_ratio == 1.0
        assert r.max_fanout is None and r.avg_fanout is None


class TestTwoProportionZtest:
    def test_hand_computed(self, spark):
        # cohort 1: 3/10 success; cohort 2: 6/20
        rows = ([(1, 1)] * 3 + [(0, 1)] * 7 + [(1, 0)] * 6 + [(0, 0)] * 14)
        df = spark.createDataFrame(rows, "s int, g int")
        r = relational.two_proportion_ztest(
            df, F.col("s") == 1, F.col("g") == 1
        ).collect()[0]
        assert (r.n_1, r.n_2, r.s_1, r.s_2) == (10, 20, 3, 6)
        p1, p2, pp = 0.3, 0.3, 9 / 30
        se2 = pp * (1 - pp) * (1 / 10 + 1 / 20)
        assert r.z == round((p1 - p2) / math.sqrt(se2), 6)
        assert r.z == 0.0  # equal rates

    def test_degenerate_pooled_rate_null_z(self, spark):
        rows = [(1, 1)] * 4 + [(1, 0)] * 4  # everyone succeeds
        df = spark.createDataFrame(rows, "s int, g int")
        r = relational.two_proportion_ztest(
            df, F.col("s") == 1, F.col("g") == 1
        ).collect()[0]
        assert r.p_1 == 1.0 and r.p_2 == 1.0 and r.z is None

    def test_empty_cohort_null_z(self, spark):
        rows = [(1, 1), (0, 1)]
        df = spark.createDataFrame(rows, "s int, g int")
        r = relational.two_proportion_ztest(
            df, F.col("s") == 1, F.col("g") == 1
        ).collect()[0]
        assert r.n_2 == 0 and r.z is None and r.p_2 is None

    def test_antisymmetry_under_group_swap(self, spark):
        rows = [(1, 1)] * 5 + [(0, 1)] * 5 + [(1, 0)] * 2 + [(0, 0)] * 8
        df = spark.createDataFrame(rows, "s int, g int")
        a = relational.two_proportion_ztest(
            df, F.col("s") == 1, F.col("g") == 1
        ).collect()[0]
        b = relational.two_proportion_ztest(
            df, F.col("s") == 1, F.col("g") == 0
        ).collect()[0]
        assert a.z is not None and abs(a.z + b.z) <= 1e-5


class TestWeightedQuantiles:
    def test_hand_computed_nearest_rank(self, spark):
        # values 10 (w=1), 20 (w=2), 30 (w=7): W=10
        # q=0.5 -> rank 5 -> first cum >= 5 is 30; q=0.25 -> 2.5 -> 20
        df = spark.createDataFrame(
            [(10.0, 1), (20.0, 2), (30.0, 7)], "v double, w int"
        )
        out = {r.q: r for r in relational.weighted_quantiles(
            df, "v", "w", qs=[0.25, 0.5, 0.9]).collect()}
        assert out[0.25].value == 20.0
        assert out[0.5].value == 30.0
        assert out[0.9].value == 30.0
        assert out[0.5].total_weight == 10

    def test_unit_weights_are_order_statistics(self, spark):
        vals = [5.0, 1.0, 9.0, 3.0, 7.0]
        df = spark.createDataFrame([(v, 1) for v in vals], "v double, w int")
        out = {r.q: r.value for r in relational.weighted_quantiles(
            df, "v", "w", qs=[0.2, 0.4, 0.6, 0.8, 1.0]).collect()}
        assert [out[q] for q in (0.2, 0.4, 0.6, 0.8, 1.0)] == [
            1.0, 3.0, 5.0, 7.0, 9.0]

    def test_weight_mass_moves_the_median(self, spark):
        df = spark.createDataFrame(
            [(10.0, 100), (99.0, 1)], "v double, w int"
        )
        r = {r.q: r.value for r in relational.weighted_quantiles(
            df, "v", "w", qs=[0.5]).collect()}
        assert r[0.5] == 10.0

    def test_empty(self, spark):
        df = spark.createDataFrame([], "v double, w int")
        assert relational.weighted_quantiles(df, "v", "w").count() == 0


class TestQuantileNormalize:
    def test_groups_share_pooled_marginal(self, spark):
        # group a: 1..4, group b: 101..104 -> after normalization both
        # map onto the pooled distribution; order preserved per group
        rows = [("a", float(v)) for v in (1, 2, 3, 4)] + [
            ("b", float(v)) for v in (101, 102, 103, 104)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = relational.quantile_normalize(df, "v", "g", n_bins=4).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r.g, []).append((r.v, r.qbin, r.v_norm))
        for g in ("a", "b"):
            srt = sorted(by_g[g])
            # order preserved, bins 1..4 in order
            assert [b for _, b, _ in srt] == [1, 2, 3, 4]
        # same bin -> same pooled value across groups
        a_map = {b: n for _, b, n in by_g["a"]}
        b_map = {b: n for _, b, n in by_g["b"]}
        assert a_map == b_map
        # pooled nearest-rank values: bin k covers rank ceil(k*8/4)
        # = 2,4,6,8 -> pooled sorted values at those ranks
        pooled = sorted(v for _, v in rows)
        assert [a_map[k] for k in (1, 2, 3, 4)] == [
            pooled[1], pooled[3], pooled[5], pooled[7]]

    def test_identical_groups_are_fixed_point(self, spark):
        rows = [(g, float(v)) for g in ("a", "b") for v in (2, 4, 6)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = relational.quantile_normalize(df, "v", "g", n_bins=3).collect()
        # both groups equal the pooled distribution -> v_norm == v
        assert all(r.v_norm == r.v for r in out)

    def test_null_values_pass_through(self, spark):
        rows = [("a", 1.0), ("a", None), ("a", 3.0), ("b", 2.0), ("b", 4.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = relational.quantile_normalize(df, "v", "g", n_bins=2).collect()
        nulls = [r for r in out if r.v is None]
        assert len(nulls) == 1 and nulls[0].v_norm is None
        assert all(r.v_norm is not None for r in out if r.v is not None)


class TestMrlTruncationRecall:
    def test_full_dim_is_identity(self, spark):
        from sna_pyspark_graphframes_spark.functions import similarity as fsim

        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(12)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r.dim: r for r in fsim.mrl_truncation_recall(
            df, dims=(8,), k=3, n_queries=5).collect()}
        assert out[8].mean_recall == 1.0
        assert out[8].n_perfect == out[8].n_queries == 5

    def test_signal_in_prefix_makes_truncation_lossless(self, spark):
        from sna_pyspark_graphframes_spark.functions import similarity as fsim

        import random

        rng = random.Random(3)
        # all signal in the first 2 coordinates; the rest are zero
        rows = [
            (i, [rng.uniform(-1, 1), rng.uniform(-1, 1)] + [0.0] * 6)
            for i in range(15)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r.dim: r for r in fsim.mrl_truncation_recall(
            df, dims=(2, 4, 8), k=3, n_queries=6).collect()}
        for d in (2, 4, 8):
            assert out[d].mean_recall == 1.0, d

    def test_overlap_bounds(self, spark):
        from sna_pyspark_graphframes_spark.functions import similarity as fsim

        import random

        rng = random.Random(11)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(20)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = fsim.mrl_truncation_recall(
            df, dims=(4, 16), k=5, n_queries=8).collect()
        for r in out:
            assert 0 <= r.sum_overlap <= r.n_queries * 5
            assert 0 <= r.n_perfect <= r.n_queries
