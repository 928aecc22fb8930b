"""Tests for the distributed training loops (functions/ml.py):
pure-Python differential check (the BPE test recipe — same fixed rounds,
same per-round rounding, so equality is EXACT), plus behavioral goldens.
"""

from __future__ import annotations

import math

import pytest

from sna_pyspark_graphframes_spark.functions import ml


def _logreg_gd_py(rows, lr=1.0, n_iter=5, round_dp=6):
    """Reference implementation: rows = [(x1..xd, y), ...]."""
    d = len(rows[0]) - 1
    w = [0.0] * (d + 1)
    n = len(rows)
    for _ in range(n_iter):
        g = [0.0] * (d + 1)
        for r in rows:
            x = [1.0] + list(r[:d])
            y = r[d]
            z = sum(wi * xi for wi, xi in zip(w, x))
            s = 1.0 / (1.0 + math.exp(-z))
            for j in range(d + 1):
                g[j] += (s - y) * x[j]
        w = [round(wi - lr * gj / n, round_dp) for wi, gj in zip(w, g)]
    return w


ROWS = [
    (0.1, 0.9, 1.0),
    (0.2, 0.8, 1.0),
    (0.9, 0.1, 0.0),
    (0.8, 0.3, 0.0),
    (0.4, 0.6, 1.0),
    (0.7, 0.2, 0.0),
    (0.3, 0.7, 1.0),
    (0.6, 0.4, 0.0),
]


class TestLogregGD:
    def test_differential_vs_pure_python(self, spark):
        # identical fixed rounds + per-round 6-dp rounding → weights are
        # EXACTLY equal to the sequential reference (fp sum differences
        # sit ~7 orders below the rounding quantum on 8 rows)
        df = spark.createDataFrame(ROWS, "x1 double, x2 double, y double")
        got = ml.logreg_gd(df, ["x1", "x2"], "y", lr=1.0, n_iter=5)
        want = _logreg_gd_py(ROWS)
        assert got == want

    def test_learns_separable_signs(self, spark):
        # y = 1 ⇔ x2 > x1 in ROWS → w_x2 > 0 > w_x1 after a few rounds
        df = spark.createDataFrame(ROWS, "x1 double, x2 double, y double")
        w = ml.logreg_gd(df, ["x1", "x2"], "y", lr=2.0, n_iter=10)
        assert w[1] < 0 < w[2]

    def test_summary_shape_and_accuracy(self, spark):
        df = spark.createDataFrame(ROWS, "x1 double, x2 double, y double")
        out = ml.logreg_gd_summary(df, ["x1", "x2"], "y", lr=2.0, n_iter=10)
        rows = {r.feature: r for r in out.collect()}
        assert set(rows) == {"_intercept", "x1", "x2"}
        # separable data, enough rounds: the final model classifies the
        # training rows perfectly
        assert rows["x1"].train_accuracy == pytest.approx(1.0)
        assert all(r.n == len(ROWS) for r in rows.values())

    def test_null_rows_dropped_before_training(self, spark):
        # ADVICE r11: NULL feature/label rows are dropped BEFORE the
        # count, so the denominator matches the gradient's rows — the
        # padded frame trains to exactly the clean frame's weights
        padded = ROWS + [(None, 0.5, 1.0), (0.5, None, 0.0), (0.5, 0.5, None)]
        df = spark.createDataFrame(padded, "x1 double, x2 double, y double")
        got = ml.logreg_gd(df, ["x1", "x2"], "y", lr=1.0, n_iter=5)
        assert got == _logreg_gd_py(ROWS)

    def test_all_null_feature_column_returns_zero_weights(self, spark):
        # every row dropped → the n==0 early exit, not a TypeError
        rows = [(None, 0.5, 1.0), (None, 0.3, 0.0)]
        df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
        assert ml.logreg_gd(df, ["x1", "x2"], "y") == [0.0, 0.0, 0.0]

    def test_empty_frame_returns_zero_weights(self, spark):
        df = spark.createDataFrame([], "x1 double, y double")
        assert ml.logreg_gd(df, ["x1"], "y") == [0.0, 0.0]

    def test_round_dp_none_runs_raw(self, spark):
        df = spark.createDataFrame(ROWS, "x1 double, x2 double, y double")
        w = ml.logreg_gd(df, ["x1", "x2"], "y", n_iter=2, round_dp=None)
        assert len(w) == 3 and all(isinstance(x, float) for x in w)


class TestCalibration:
    def test_hand_computed_buckets(self, spark):
        # fixed weights [0, 1]: p = sigmoid(x); x=-10 -> bucket 0,
        # x=0 -> bucket 5, x=10 -> p≈1 folds into bucket 9
        df = spark.createDataFrame(
            [(-10.0, 0.0), (0.0, 0.0), (0.0, 1.0), (10.0, 1.0)],
            "x double, y double",
        )
        got = {
            r.bucket: (r.n, r.mean_pred, r.frac_pos)
            for r in ml.calibration_buckets(df, ["x"], "y", [0.0, 1.0]).collect()
        }
        assert got == {
            0: (1, 0.0, 0.0),
            5: (2, 0.5, 0.5),
            9: (1, 1.0, 1.0),
        }

    def test_trained_model_is_directionally_calibrated(self, spark):
        df = spark.createDataFrame(ROWS, "x1 double, x2 double, y double")
        w = ml.logreg_gd(df, ["x1", "x2"], "y", lr=2.0, n_iter=10)
        rows = sorted(
            ml.calibration_buckets(df, ["x1", "x2"], "y", w).collect(),
            key=lambda r: r.bucket,
        )
        fracs = [r.frac_pos for r in rows]
        assert fracs == sorted(fracs)  # positive rate rises with p


class TestLinregNormal:
    def test_recovers_exact_linear_relation(self, spark):
        # y = 2 + 3*x1 - x2 exactly -> OLS returns the coefficients
        rows = [
            (x1 / 4.0, x2 / 3.0, 2.0 + 3.0 * x1 / 4.0 - x2 / 3.0)
            for x1 in range(8)
            for x2 in range(3)
        ]
        df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
        w = ml.linreg_normal(df, ["x1", "x2"], "y")
        assert [round(v, 4) for v in w] == [2.0, 3.0, -1.0]

    def test_differential_vs_pure_python_solve(self, spark):
        # same rounded MEANS + the same canonical 3x3 Cramer expression
        # (the cross-engine contract) -> exact equality
        rows = [
            (0.5, 1.5, 3.1), (1.0, 0.5, 2.2), (2.0, 2.5, 6.0),
            (3.0, 1.0, 4.4), (0.0, 2.0, 3.5), (1.5, 3.0, 6.6),
        ]
        df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
        got = ml.linreg_normal(df, ["x1", "x2"], "y", round_dp=6)

        def det3(m):
            (a, b, c), (dd, e, f), (g, h, i) = m
            return a*(e*i - f*h) - b*(dd*i - f*g) + c*(dd*h - e*g)

        def py_solve(rows):
            cols = [[1.0, r[0], r[1]] for r in rows]
            ys = [r[2] for r in rows]
            n = len(rows)
            a = [[round(sum(c[i] * c[j] for c in cols) / n, 6)
                  for j in range(3)] for i in range(3)]
            b = [round(sum(c[i] * y for c, y in zip(cols, ys)) / n, 6)
                 for i in range(3)]
            det = det3(a)
            ws = []
            for i in range(3):
                m = [row[:] for row in a]
                for r in range(3):
                    m[r][i] = b[r]
                ws.append(det3(m) / det)
            return ws

        assert got == py_solve(rows)

    def test_null_rows_dropped(self, spark):
        rows = [(1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (None, 9.0), (4.0, None)]
        df = spark.createDataFrame(rows, "x double, y double")
        w = ml.linreg_normal(df, ["x"], "y")
        assert [round(v, 4) for v in w] == [1.0, 2.0]  # y = 1 + 2x

    def test_singular_and_empty_return_zeros(self, spark):
        df = spark.createDataFrame([], "x double, y double")
        assert ml.linreg_normal(df, ["x"], "y") == [0.0, 0.0]
        # constant feature duplicates the intercept column -> singular
        dup = spark.createDataFrame(
            [(1.0, 2.0), (1.0, 3.0)], "x double, y double"
        )
        assert ml.linreg_normal(dup, ["x"], "y") == [0.0, 0.0]

    def test_summary_r2_perfect_fit(self, spark):
        # x in 0..7: every mean (x, x², xy, y) is an exact decimal, so
        # the 6-dp mean rounding is the identity and the fit is exact
        rows = [(float(i), 1.0 + 2.0 * i) for i in range(8)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = {r.feature: r for r in ml.linreg_summary(df, ["x"], "y").collect()}
        assert out["_intercept"].weight == 1.0
        assert out["x"].weight == 2.0
        assert out["x"].r2 == 1.0 and out["x"].n == 8


class TestNaiveBayes:
    DOCS = [
        (0, "spark spark join", "a"),
        (1, "spark window agg", "a"),
        (2, "cat dog cat", "b"),
        (3, "dog fish", "b"),
    ]

    def test_train_matches_hand_counts(self, spark):
        import math

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string, label string")
        model = {
            (r.label, r.token): r.log_prob
            for r in ml.nb_train(df, "text", "label").collect()
        }
        # class a: 6 tokens, class b: 5; vocab = 7 distinct tokens
        assert model[("a", "spark")] == round(math.log((3 + 1) / (6 + 7)), 6)
        assert model[("b", "cat")] == round(math.log((2 + 1) / (5 + 7)), 6)
        # only seen (class, token) pairs are materialized
        assert ("a", "cat") not in model

    def test_classify_separable_corpus(self, spark):
        import math

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string, label string")
        model = ml.nb_train(df, "text", "label")
        priors = spark.createDataFrame(
            [("a", math.log(0.5)), ("b", math.log(0.5))],
            "label string, log_prior double",
        )
        got = {
            r.doc_id: r.label
            for r in ml.nb_classify(df, model, priors).collect()
        }
        assert got == {0: "a", 1: "a", 2: "b", 3: "b"}

    def test_exact_floors_flip_argmax_vs_sparse(self, spark):
        """ADVICE r12: the unseen-token smoothing floor ln(α/(n_c+α|V|))
        depends on the class token total n_c, so it is NOT a constant
        shift — hand-built case where the sparse inner-join argmax (a)
        differs from exact multinomial NB (b), plus the all-OOV doc that
        the sparse path silently drops."""
        import math

        train = spark.createDataFrame(
            [(0, "x x x x x x x x y", "a"), (1, "x y", "b")],
            "doc_id long, text string, label string",
        )
        # n_a=9, n_b=2, V=2; floors: a -> 1/11, b -> 1/4
        model = ml.nb_train(train, "text", "label")
        floors = {
            r.label: r.log_floor
            for r in ml.nb_class_floors(train, "text", "label").collect()
        }
        assert floors["a"] == round(math.log(1 / 11), 6)
        assert floors["b"] == round(math.log(1 / 4), 6)
        priors = spark.createDataFrame(
            [("a", math.log(0.5)), ("b", math.log(0.5))],
            "label string, log_prior double",
        )
        test = spark.createDataFrame(
            [(10, "x z"), (11, "z w")], "doc_id long, text string"
        )
        sparse = {
            r.doc_id: r.label
            for r in ml.nb_classify(test, model, priors).collect()
        }
        exact = {
            r.doc_id: (r.label, r.score)
            for r in ml.nb_classify(
                test,
                model,
                priors,
                floors=ml.nb_class_floors(train, "text", "label"),
            ).collect()
        }
        # sparse: only the seen token scores -> P(x|a)=9/11 beats 1/2
        assert sparse[10] == "a" and 11 not in sparse  # all-OOV doc vanishes
        # exact: b's higher floor on the OOV token flips the argmax
        assert exact[10][0] == "b"
        assert exact[10][1] == round(
            math.log(0.5)
            + round(math.log(2 / 4), 6)
            + 1 * round(math.log(1 / 4), 6),
            4,
        )
        # all-OOV doc is scored: 2 floor terms, argmax = b again
        assert exact[11][0] == "b"
        assert exact[11][1] == round(
            math.log(0.5) + 2 * round(math.log(1 / 4), 6), 4
        )


class TestLearningDemonstration:
    """VERDICT r12 Next #4: prove the GD loop LEARNS, not just
    converges — on the planted noisy-monotone label (Bayes AUC ≈ 0.94)
    the trained model must rank near-optimally and its calibration
    buckets must move."""

    def test_sep_auc_at_least_090(self, spark, sf_dir):
        from sna_pyspark_graphframes_spark import registry as R

        r = R.REGISTRY["logreg_sep_auc"].fn(spark, sf_dir).collect()[0]
        assert r.auc >= 0.9  # broken loop -> 0.5, sign error -> <= 0.1
        assert r.n_pos > 0 and r.n_neg > 0

    def test_sep_calibration_buckets_move(self, spark, sf_dir):
        from sna_pyspark_graphframes_spark import registry as R

        rows = sorted(
            R.REGISTRY["logreg_sep_calibration"].fn(spark, sf_dir).collect(),
            key=lambda r: r.bucket,
        )
        assert len(rows) >= 5  # predictions spread over many deciles
        # observed positive rate tracks the ramp: low buckets near the
        # 0.05 floor, high buckets near the 0.95 ceiling
        assert rows[0].frac_pos <= 0.15
        assert rows[-1].frac_pos >= 0.85
        assert rows[-1].frac_pos - rows[0].frac_pos >= 0.7


class TestAuc:
    def test_perfect_separation_is_one(self, spark):
        # score = x, positives all above negatives -> AUC = 1
        rows = [(float(i), 1.0 if i >= 5 else 0.0) for i in range(10)]
        df = spark.createDataFrame(rows, "x double, y double")
        r = ml.auc_score(df, ["x"], "y", [0.0, 1.0]).collect()[0]
        assert (r.n_pos, r.n_neg, r.auc) == (5, 5, 1.0)

    def test_reversed_separation_is_zero(self, spark):
        rows = [(float(i), 0.0 if i >= 5 else 1.0) for i in range(10)]
        df = spark.createDataFrame(rows, "x double, y double")
        assert ml.auc_score(df, ["x"], "y", [0.0, 1.0]).collect()[0].auc == 0.0

    def test_all_tied_scores_give_half(self, spark):
        # constant score: midranks make AUC exactly 0.5, not 0 or 1
        rows = [(1.0, float(i % 2)) for i in range(8)]
        df = spark.createDataFrame(rows, "x double, y double")
        assert ml.auc_score(df, ["x"], "y", [0.0, 0.0]).collect()[0].auc == 0.5

    def test_matches_sklearn_style_hand_computation(self, spark):
        # scores [1,2,2,3], labels [0,0,1,1]: midranks 1, 2.5, 2.5, 4
        # -> sum pos ranks = 6.5; AUC = (6.5 - 3) / (2*2) = 0.875
        rows = [(1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (3.0, 1.0)]
        df = spark.createDataFrame(rows, "x double, y double")
        assert ml.auc_score(df, ["x"], "y", [0.0, 1.0]).collect()[0].auc == 0.875


class TestNearestCentroid:
    def test_clean_clusters_perfect_diagonal(self, spark):
        vecs = [
            (0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [1.0, 0.1], 0),
            (3, [0.0, 1.0], 1), (4, [0.1, 0.9], 1), (5, [0.1, 1.0], 1),
        ]
        df = spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>, label int"
        )
        cm = {
            (r.label, r.pred_label): r.n
            for r in ml.nearest_centroid_confusion(df).collect()
        }
        assert cm == {(0, 0): 3, (1, 1): 3}

    def test_noisy_label_lands_off_diagonal(self, spark):
        # vector 5 labeled 1 but sits in cluster 0 -> off-diagonal cell
        vecs = [
            (0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [1.0, 0.1], 0),
            (3, [0.0, 1.0], 1), (4, [0.1, 0.9], 1), (5, [0.95, 0.05], 1),
        ]
        df = spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>, label int"
        )
        cm = {
            (r.label, r.pred_label): r.n
            for r in ml.nearest_centroid_confusion(df).collect()
        }
        assert cm[(1, 0)] == 1 and cm[(0, 0)] == 3 and cm[(1, 1)] == 2

    def test_empty_input(self, spark):
        df = spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )
        assert ml.nearest_centroid_confusion(df).count() == 0


class TestMutualInformation:
    def test_hand_computed_2x2(self, spark):
        """cells: (a,p):2 (a,q):1 (b,q):1 → n=4; MI/H from the exact
        closed forms."""
        import math

        from sna_pyspark_graphframes_spark.functions import ml

        df = spark.createDataFrame(
            [("a", "p"), ("a", "p"), ("a", "q"), ("b", "q")],
            "x string, y string",
        )
        r = ml.mutual_information(df, "x", "y").collect()[0]
        assert (r.n, r.n_cells) == (4, 3)
        # marginals: a=3, b=1 / p=2, q=2
        mi = (
            (2 / 4) * math.log(4 * 2 / (3 * 2))
            + (1 / 4) * math.log(4 * 1 / (3 * 2))
            + (1 / 4) * math.log(4 * 1 / (1 * 2))
        )
        hx = -(3 / 4) * math.log(3 / 4) - (1 / 4) * math.log(1 / 4)
        hy = -math.log(1 / 2)
        assert r.mi == round(mi, 6)
        assert r.h_x == round(hx, 6) and r.h_y == round(hy, 6)
        assert r.nmi == round(round(mi, 6) / math.sqrt(round(hx, 6) * round(hy, 6)), 6)

    def test_independent_columns_zero(self, spark):
        from sna_pyspark_graphframes_spark.functions import ml

        rows = [(x, y) for x in "ab" for y in "pq" for _ in range(5)]
        df = spark.createDataFrame(rows, "x string, y string")
        r = ml.mutual_information(df, "x", "y").collect()[0]
        assert r.mi == 0.0 and r.nmi == 0.0

    def test_identical_columns_nmi_one(self, spark):
        from sna_pyspark_graphframes_spark.functions import ml

        df = spark.createDataFrame(
            [("a", "a"), ("b", "b"), ("c", "c"), ("a", "a")],
            "x string, y string",
        )
        r = ml.mutual_information(df, "x", "y").collect()[0]
        assert r.nmi == 1.0 and r.mi == r.h_x == r.h_y

    def test_constant_column_and_null_rows(self, spark):
        from sna_pyspark_graphframes_spark.functions import ml

        df = spark.createDataFrame(
            [("k", "p"), ("k", "q"), ("k", None)], "x string, y string"
        )
        r = ml.mutual_information(df, "x", "y").collect()[0]
        assert r.n == 2  # NULL row dropped
        assert r.h_x == 0.0 and r.mi == 0.0 and r.nmi == 0.0

    def test_empty_input(self, spark):
        from sna_pyspark_graphframes_spark.functions import ml

        df = spark.createDataFrame([], "x string, y string")
        r = ml.mutual_information(df, "x", "y").collect()[0]
        assert (r.n, r.n_cells) == (0, 0)
        assert r.mi is None and r.nmi is None


class TestCohensKappa:
    def test_hand_computed(self, spark):
        from sna_pyspark_graphframes_spark.functions import ml

        # a: x,x,y,y  b: x,y,y,y → agree 3/4; ma: x=2,y=2; mb: x=1,y=3
        df = spark.createDataFrame(
            [("x", "x"), ("x", "y"), ("y", "y"), ("y", "y")],
            "a string, b string",
        )
        r = ml.cohens_kappa(df, "a", "b").collect()[0]
        assert (r.n, r.n_agree) == (4, 3)
        po, pe = 3 / 4, (2 * 1 + 2 * 3) / 16
        assert r.po == round(po, 6) and r.pe == round(pe, 6)
        assert r.kappa == round((po - pe) / (1 - pe), 6)

    def test_perfect_agreement(self, spark):
        from sna_pyspark_graphframes_spark.functions import ml

        df = spark.createDataFrame(
            [("x", "x"), ("y", "y"), ("z", "z")], "a string, b string"
        )
        r = ml.cohens_kappa(df, "a", "b").collect()[0]
        assert r.po == 1.0 and r.kappa == 1.0

    def test_degenerate_constant_annotators(self, spark):
        """Both annotators constant and equal → pe = 1 → κ undefined
        (NULL), never 0."""
        from sna_pyspark_graphframes_spark.functions import ml

        df = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
        r = ml.cohens_kappa(df, "a", "b").collect()[0]
        assert r.po == 1.0 and r.pe == 1.0 and r.kappa is None

    def test_disjoint_label_spaces(self, spark):
        from sna_pyspark_graphframes_spark.functions import ml

        df = spark.createDataFrame(
            [("x", "p"), ("y", "q")], "a string, b string"
        )
        r = ml.cohens_kappa(df, "a", "b").collect()[0]
        assert r.n_agree == 0 and r.pe == 0.0 and r.kappa == 0.0
