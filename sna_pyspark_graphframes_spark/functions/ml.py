"""Distributed model-training loops over DataFrames: batch gradient
descent for logistic regression (the quality-classifier / data-filter
trainer a pretraining pipeline runs over corpus features at 100 TB).

Execution shape — the textbook data-parallel GD layout:

- the model (a handful of float weights) lives on the DRIVER and enters
  every round's job as literals — there is no |rows|-sized state frame,
  nothing to checkpoint, and no lineage growth (each round's plan is a
  fresh scan + one aggregate, not a self-referencing loop);
- the gradient is ONE scalar aggregate per round (SUM of per-row
  gradient terms, one column per weight) — map-side partial aggregation
  means each executor ships d+1 doubles per round regardless of data
  size, the minimum possible communication for exact batch GD;
- all per-row math (sigmoid, products) is built-in JVM expressions
  inside whole-stage codegen — no Python UDFs.

Cross-engine reproducibility (the pagerank ``round_dp`` recipe): with a
fixed round count and the weights rounded to ``round_dp`` decimals after
every update, each round's inputs are identical decimals in Spark and
DuckDB, so an unrolled-CTE oracle matches the weights value-for-value —
fp summation-order differences (~1e-13 relative on these sums) sit far
below the rounding quantum and never compound across rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gradient_frame(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    w: list[float],
    with_count: bool = False,
) -> DataFrame:
    """One GD round's 1-row gradient aggregate ``(g0..gd[, n])`` for the
    logistic loss at weights ``w`` (``[intercept, *features]``). The
    weights are literals, the sigmoid is a JVM expression, and the SUMs
    partial-aggregate map-side — the frame each training round executes
    (exposed so the plan guards test the real loop subtree)."""
    cols = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    z = sum((F.lit(wi) * xi for wi, xi in zip(w[1:], cols[1:])), F.lit(w[0]))
    resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - y
    aggs = [F.sum(resid * xi).alias(f"g{j}") for j, xi in enumerate(cols)]
    if with_count:
        aggs.append(F.count(F.lit(1)).alias("n"))
    return df.agg(*aggs)


def logreg_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    n_iter: int = 5,
    round_dp: int | None = 6,
) -> list[float]:
    """Train logistic regression by full-batch gradient descent; returns
    the learned weights ``[w_intercept, w_feature0, ...]``.

    Update: ``w <- w - lr * (1/n) * X^T (sigmoid(Xw) - y)``, starting
    from the zero vector (deterministic — no random init to reproduce).
    ``round_dp`` rounds each updated weight (see module docstring); pass
    ``None`` for raw fp64 weights in production.

    One job per round; the input should be a column-pruned projection so
    the per-round scan reads exactly d+1 columns off parquet.

    NULL contract (ADVICE r11): rows with a NULL feature or label are
    DROPPED before training — the gradient SUMs would silently skip
    them while ``n`` counted them, shrinking the effective learning
    rate (and an all-NULL column would make the update raise). The
    filter is a codegen predicate on the same scan, and ``n`` is
    counted AFTER it, so gradient and denominator see the same rows.
    """
    df = df.na.drop(subset=[*feature_cols, label_col])
    d = len(feature_cols) + 1
    w = [0.0] * d
    n = None
    for _ in range(n_iter):
        row = gradient_frame(
            df, feature_cols, label_col, w, with_count=n is None
        ).first()
        if n is None:
            n = row["n"]
            if not n:
                return w
        w = [wi - lr * row[f"g{j}"] / n for j, wi in enumerate(w)]
        if round_dp is not None:
            w = [round(wi, round_dp) for wi in w]
    return w


def logreg_gd_summary(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    n_iter: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """``(feature, weight, train_accuracy, n)`` — one row per weight
    (``_intercept`` first, then ``feature_cols`` order), each carrying
    the learned 6-dp weight plus two whole-run scalars: the decision
    accuracy of the final model on its training rows (rounded 4 dp) and
    the row count. One extra scan scores the model; weights enter it as
    literals like every training round."""
    w = logreg_gd(df, feature_cols, label_col, lr=lr, n_iter=n_iter, round_dp=round_dp)
    df = df.na.drop(subset=[*feature_cols, label_col])  # logreg_gd's rows
    cols = [F.col(c).cast("double") for c in feature_cols]
    z = sum((F.lit(wi) * xi for wi, xi in zip(w[1:], cols)), F.lit(w[0]))
    pred = (z > 0).cast("double")
    y = F.col(label_col).cast("double")
    acc_row = df.agg(
        F.round(F.avg((pred == y).cast("double")), 4).alias("acc"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    names = ["_intercept"] + list(feature_cols)
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (name, float(wi), float(acc_row["acc"]), int(acc_row["n"]))
            for name, wi in zip(names, w)
        ],
        "feature string, weight double, train_accuracy double, n long",
    )


def calibration_buckets(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    w: list[float],
    n_buckets: int = 10,
) -> DataFrame:
    """``(bucket, n, mean_pred, frac_pos)`` — the reliability diagram of
    a trained logistic model: rows bucketed by predicted probability
    (``floor(p·B)``, top edge folded into the last bucket), per bucket
    the mean prediction vs the observed positive rate. The standard
    post-training quality check for a data-filter classifier — a
    well-calibrated model's columns track each other.

    One scan: weights are literals, sigmoid is a JVM expression, ONE
    hash aggregate on the (≤B)-valued bucket key."""
    cols = [F.col(c).cast("double") for c in feature_cols]
    z = sum((F.lit(wi) * xi for wi, xi in zip(w[1:], cols)), F.lit(w[0]))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    bucket = F.least(
        F.floor(p * n_buckets).cast("int"), F.lit(n_buckets - 1)
    )
    y = F.col(label_col).cast("double")
    return (
        df.select(bucket.alias("bucket"), p.alias("p"), y.alias("y"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("p"), 4).alias("mean_pred"),
            F.round(F.avg("y"), 4).alias("frac_pos"),
        )
    )
