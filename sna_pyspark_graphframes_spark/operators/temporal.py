"""Temporal join operators Spark lacks as built-ins — as-of join and
time-range join — expressed as compositions of existing DataFrame ops
(the build brief's "custom operators" path (a): no UDF, no mapPartitions).

These are the workhorses of event/feature pipelines (point-in-time-correct
feature lookup, attribution windows). The reference has no temporal data at
all; these extend the engine the same way §2.4's dedup/similarity ops do.

Scale notes:
  * ``asof_join`` is the sort-based formulation: tag both inputs, union,
    ONE shuffle on the key, and a running ``last(..., ignorenulls=True)``
    window carries the most recent right-side row forward. No per-row range
    probe, no range join, no UDF — cost is a single sort per key group,
    which is the lower bound for as-of semantics. Skewed keys are split by
    AQE the same as any keyed shuffle.
  * ``time_range_join`` turns the inequality join into an equi-join on
    (key, time-bucket): each left row lands in one bucket, each right row
    is replicated to the few buckets its window can overlap, then the exact
    range predicate filters. Catalyst would otherwise plan key-equi + range
    filter fine, but bucketing bounds the per-match fan-out explicitly and
    keeps the join a hash join even when one side's windows are huge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(c: Column) -> Column:
    """Microsecond epoch of a timestamp column, TIMESTAMP_NTZ-safe:
    ``unix_micros`` requires TIMESTAMP, so NTZ inputs are cast first (a
    no-op cast for LTZ inputs). Both join sides go through the same
    expression, so bucket assignment stays consistent regardless of
    session timezone; the exact range predicate below is difference-based,
    where any timezone offset cancels."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "right_",
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the LATEST right row with the same ``on``
    key and ``right.ts <= left.ts`` (``< `` when ``strict``) — i.e. DuckDB /
    pandas ``merge_asof`` backward semantics, left-outer (unmatched left
    rows keep NULLs).

    Output = all left columns + the chosen ``right_cols`` renamed with
    ``prefix``. Ties on the right timestamp resolve to the row latest in
    ``(ts, right-side order of right_cols values)`` — callers wanting full
    determinism under duplicate timestamps should include a unique id in
    ``right_cols`` (it participates in the carried struct's ordering).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    # tag: right rows sort BEFORE left rows at the same timestamp so an
    # equal-ts right row is visible to the left row (<=); strict flips that.
    right_tag, left_tag = (0, 1) if not strict else (2, 1)
    carried = F.struct(
        F.col(right_ts).alias("__ats"), *[F.col(c) for c in right_cols]
    )
    lrow = F.struct(*[F.col(c) for c in left.columns])
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        carried.alias("__carry"),
        F.lit(None).cast(left.select(lrow.alias("x")).schema["x"].dataType).alias(
            "__lrow"
        ),
    )
    l = left.select(
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        F.lit(None).cast(r.schema["__carry"].dataType).alias("__carry"),
        lrow.alias("__lrow"),
        F.col(on).alias("__k"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag", "__carry")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # left rows ride the same single shuffle as right rows (their full row
    # packed in __lrow) — no id-keyed join back, one sort total.
    out = (
        r.unionByName(l)
        .withColumn("__best", F.last("__carry", ignorenulls=True).over(w))
        .filter(F.col("__tag") == left_tag)
        .select("__lrow.*", "__best")
    )
    for c in right_cols:
        out = out.withColumn(prefix + c, F.col(f"__best.{c}"))
    return out.withColumn(prefix + right_ts, F.col("__best.__ats")).drop("__best")


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower_s: int,
    upper_s: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner join of right rows whose ``right_ts`` falls in
    ``(left_ts + lower_s, left_ts + upper_s]`` seconds for the same ``on``
    key.

    Implemented as an equi-join on (key, time bucket): each RIGHT row maps
    to its single ``bucket_s``-wide epoch bucket; each LEFT row's window is
    expanded to the bucket indices it can overlap with ``sequence()`` +
    ``explode`` (window span / bucket width + 1 candidates — choose
    ``bucket_s`` ≈ window width so that's ~2). The exact microsecond-epoch
    predicate filters after the hash join.
    """
    b_us = int(bucket_s) * 1_000_000
    lo_us = int(lower_s) * 1_000_000
    hi_us = int(upper_s) * 1_000_000
    lm = _epoch_us(F.col(left_ts))
    rm = _epoch_us(F.col(right_ts))
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((lm + F.lit(lo_us)) / F.lit(b_us)),
                F.floor((lm + F.lit(hi_us)) / F.lit(b_us)),
            )
        ),
    )
    rb = right.withColumn("__bucket", F.floor(rm / F.lit(b_us)))
    # dataset aliases: left and right are often derived from the SAME
    # source frame (self-range-join) — qualified refs keep Spark's
    # ambiguous-self-join check satisfied.
    L, R = lb.alias("__L"), rb.alias("__R")
    lts = _epoch_us(F.col(f"__L.{left_ts}"))
    rts = _epoch_us(F.col(f"__R.{right_ts}"))
    joined = L.join(
        R,
        (F.col("__L.__bucket") == F.col("__R.__bucket"))
        & (F.col(f"__L.{on}") == F.col(f"__R.{on}"))
        & (rts > lts + F.lit(lo_us))
        & (rts <= lts + F.lit(hi_us)),
    )
    keep = [F.col(f"__L.{c}") for c in left.columns] + [
        F.col(f"__R.{c}") for c in right.columns if c != on
    ]
    return joined.select(*keep)


def attribution_counts(
    purchases: DataFrame,
    events: DataFrame,
    horizon_s: int = 3600,
) -> DataFrame:
    """Per purchase event: how many same-user events of each type follow
    within ``horizon_s`` seconds — the classic attribution-window rollup,
    built on ``time_range_join``. Returns ``(event_id, user_id, ts,
    followup_type, followups)``."""
    f = time_range_join(
        purchases.select("event_id", "user_id", "ts"),
        events.select("user_id", F.col("ts").alias("fts"), "event_type"),
        on="user_id",
        lower_s=0,
        upper_s=horizon_s,
        left_ts="ts",
        right_ts="fts",
    )
    return f.groupBy(
        "event_id", "user_id", "ts", F.col("event_type").alias("followup_type")
    ).agg(F.count("*").alias("followups"))


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    attr_col: str,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event log:
    ``(keys..., attr, valid_from, valid_to, is_current)`` — one row per
    VALUE CHANGE of ``attr_col`` per key, valid from its first timestamp
    until the next change (open-ended ⇒ current). The
    dimension-versioning shape every warehouse MERGE pipeline maintains,
    derived here in two stacked windows: a lag() change filter
    (gaps-and-islands — consecutive repeats collapse into one version),
    then lead() over the surviving change rows for the validity
    horizon. Both windows partition by the key — per-key sorts only,
    no global ordering; nulls never arise from the filter because the
    first row per key always survives (lag is NULL there).

    ``carry_cols``: extra columns from each version's OPENING row to keep
    on its output row (e.g. a unique event id, so downstream
    point-in-time lookups stay deterministic under equal timestamps)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    changes = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev")))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    valid_to = F.lead(order_cols[0]).over(w2)
    return changes.select(
        *key_cols,
        attr_col,
        F.col(order_cols[0]).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        *(carry_cols or []),
    )


def time_decay_score(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    half_life_days: float = 7.0,
) -> DataFrame:
    """``(key, n_events, decayed_value)`` — exponential time-decay
    aggregation: ``Σ value·2^(−Δt/half_life)`` with Δt measured back
    from the table's max timestamp (deterministic — no wall-clock in
    the result). The standard recency-weighted activity/feature score:
    a purchase yesterday counts ~full, one three half-lives ago ~12%.

    One 1-row max-timestamp broadcast + one grouped aggregate — the
    decay is a per-row JVM expression, so the whole thing is a scan +
    map-side-combining SUM at any scale. Cross-engine exactness: the
    regressor recipe from ``value_trend_by_type`` — integer microsecond
    difference, ONE float division, identical expression order in both
    engines; the 4-dp output rounding sits ~5 orders above the fp
    summation-order noise."""
    import math

    lam = math.log(2.0) / float(half_life_days)
    mx = events.agg(F.max(_epoch_us(F.col(ts_col))).alias("_mx"))
    decay = F.exp(
        F.lit(-lam)
        * ((F.col("_mx") - _epoch_us(F.col(ts_col))) / F.lit(86400000000.0))
    )
    return (
        events.crossJoin(F.broadcast(mx))
        .groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col(value_col) * decay), 4).alias("decayed_value"),
        )
    )


def kaplan_meier(
    events: DataFrame,
    event_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    round_dp: int = 6,
) -> DataFrame:
    """``(duration_days, n_risk, n_events, n_censored, survival)`` —
    the Kaplan–Meier product-limit estimator (Kaplan & Meier 1958) of
    time-to-``event_type``: each user enrolls at their FIRST event of
    any type; users who reach ``event_type`` contribute an EVENT at
    ``days(first event_type − enrollment)``, users who never do are
    right-CENSORED at their last activity — the standard
    time-to-conversion / retention-survival curve, censoring handled
    correctly (naive conversion rates over a finite window are biased
    against late converters).

    ``S(t) = Π_{u ≤ t} (1 − d_u / n_u)`` with ``d_u`` events at
    duration u and ``n_u`` subjects still at risk (duration ≥ u).

    Exactness: per-duration ``d``/``c`` and the at-risk counts are
    exact integers (``n_risk = N − cum(d+c) + (d+c)`` off the shared
    :func:`relational.range_prefix_sums` engine — no global
    single-task window); the survival product is computed as
    ``exp(Σ ln(1 − d/n))`` with the SAME expression in the SQL twin
    and the cumulative Σ over the sorted duration axis, rounded — the
    safe fp class. Plan: one per-user aggregate, one per-duration
    aggregate, two parallel prefix passes over the (tiny) duration
    table."""
    from sna_pyspark_graphframes_spark.operators.relational import (
        range_prefix_sums,
    )

    per_user = events.groupBy(F.col(user_col).alias("uid")).agg(
        F.min(ts_col).alias("enroll"),
        F.min(
            F.when(F.col(type_col) == event_type, F.col(ts_col))
        ).alias("ev_ts"),
        F.max(ts_col).alias("last_ts"),
    )
    dur = per_user.select(
        F.datediff(
            F.coalesce("ev_ts", "last_ts"), F.col("enroll")
        ).alias("duration_days"),
        F.col("ev_ts").isNotNull().cast("long").alias("e"),
    )
    g = dur.groupBy("duration_days").agg(
        F.sum("e").cast("long").alias("d"),
        F.sum(1 - F.col("e")).cast("long").alias("c"),
    )
    g = g.withColumn("dc", (F.col("d") + F.col("c")).cast("long"))
    cum1, totals = range_prefix_sums(g, "duration_days", ["dc"])
    n_total = totals.get("dc", 0)
    if n_total == 0:
        return events.sparkSession.createDataFrame(
            [],
            "duration_days int, n_risk long, n_events long,"
            " n_censored long, survival double",
        )
    factor = F.lit(1.0) - F.col("d") / F.col("n_risk")
    risk = (
        cum1.select(
            "duration_days",
            "d",
            "c",
            (F.lit(n_total) - F.col("cum_dc") + F.col("dc")).alias("n_risk"),
        )
        # ln(1 - d/n): 0 for censor-only rows (d = 0) so they ride the
        # cumulative sum without moving the curve; a ZERO factor (every
        # at-risk subject has the event — the curve's terminal drop to
        # S = 0) cannot go through ln, so it rides a separate cumulative
        # flag instead (ln(0) errors in DuckDB and NULLs in Spark, both
        # wrong)
        .withColumn(
            "lnterm", F.when(factor > 0, F.log(factor)).otherwise(F.lit(0.0))
        )
        .withColumn("zflag", (factor <= 0).cast("long"))
    )
    cum2, _ = range_prefix_sums(risk, "duration_days", ["lnterm", "zflag"])
    return cum2.select(
        F.col("duration_days").cast("int").alias("duration_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("cum_zflag") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cum_lnterm")), round_dp))
        .alias("survival"),
    )


def lag_autocorr(
    df: DataFrame,
    idx_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """``(lag, n_pairs, sxy, acf)`` for lag = 1..max_lag — the sample
    autocorrelation function of an integer-indexed series (Box &
    Jenkins 1970 §2.1): for each lag k, the Pearson correlation between
    the series and itself shifted by k, over the pairs that exist at
    both indices. THE seasonality probe on an ops/ingest series — a
    weekly cadence shows up as a peak at lag 7 before any human looks
    at a chart. Gaps in the index are handled identically in both
    engines (a missing index simply forms no pair).

    Per-lag Pearson (not the fixed-global-mean variant): each lag uses
    the means of the overlapping windows — the formulation that is an
    exact integer computation when the series values are counts.
    Exactness: n/Σx/Σy/Σxy/Σx²/Σy² per lag are exact BIGINTs
    (``sxy`` is the hash anchor); ``acf`` is one identical few-op
    double expression over them, rounded 6 dp. int64 bound: Σxy ≤
    n·max(v)² — a daily-count series overflows only past ~3e9 total
    rows per day-pair, far beyond any fixture.

    Plan: the lag grid (≤ max_lag rows) broadcasts; the shifted pairing
    is ONE shuffle equi-join of the series with itself on
    ``idx = idx + lag`` (the grid fan-out multiplies the probe side by
    max_lag BEFORE the join, so the join stays a plain hash/sort-merge
    equi-join); one |lags|-row reduce. No window, no cross product."""
    spark = df.sparkSession
    d = df.select(
        F.col(idx_col).cast("long").alias("i"),
        F.col(value_col).cast("long").alias("x"),
    ).filter(F.col("i").isNotNull() & F.col("x").isNotNull())
    lags = spark.range(1, max_lag + 1).select(F.col("id").alias("lag"))
    probe = d.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("i") + F.col("lag")).alias("i"), F.col("x").alias("xl")
    )
    j = probe.join(d, "i").select(
        "lag", F.col("xl").alias("x"), F.col("x").alias("y")
    )
    agg = j.groupBy("lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("_sx"),
        F.sum("y").cast("long").alias("_sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("_sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("_syy"),
    )
    nd = F.col("n_pairs").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("_sx").cast(
        "double"
    ) * F.col("_sy").cast("double")
    dx = nd * F.col("_sxx").cast("double") - F.col("_sx").cast(
        "double"
    ) * F.col("_sx").cast("double")
    dy = nd * F.col("_syy").cast("double") - F.col("_sy").cast(
        "double"
    ) * F.col("_sy").cast("double")
    return agg.select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        "sxy",
        F.when((dx > 0) & (dy > 0), F.round(num / F.sqrt(dx * dy), 6)).alias(
            "acf"
        ),
    )


def lag_crosscorr(
    df_a: DataFrame,
    df_b: DataFrame,
    idx_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """``(lag, n_pairs, sxy, ccf)`` for lag = −max_lag..+max_lag — the
    sample cross-correlation function between two integer-indexed
    series: at lag k, the Pearson correlation of ``a_t`` with
    ``b_{t+k}`` over the indices present in both (the lead/lag probe —
    a peak at k > 0 means a LEADS b by k steps; lag 0 is plain
    same-day correlation). The directional companion to
    :func:`lag_autocorr`; same exactness contract (per-lag
    n/Σx/Σy/Σxy/Σx²/Σy² exact BIGINTs, ``sxy`` the hash anchor, the
    Pearson one identical few-op double expression, 6 dp) and the same
    plan shape: the (2·max_lag+1)-row lag grid broadcasts onto the
    probe side BEFORE one keyed equi-join with the other series — no
    window, no cross product."""
    spark = df_a.sparkSession

    def side(df):
        return df.select(
            F.col(idx_col).cast("long").alias("i"),
            F.col(value_col).cast("long").alias("x"),
        ).filter(F.col("i").isNotNull() & F.col("x").isNotNull())

    a, b = side(df_a), side(df_b)
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").alias("lag")
    )
    probe = a.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("i") + F.col("lag")).alias("i"), F.col("x").alias("xl")
    )
    j = probe.join(b, "i").select(
        "lag", F.col("xl").alias("x"), F.col("x").alias("y")
    )
    agg = j.groupBy("lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("_sx"),
        F.sum("y").cast("long").alias("_sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("_sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("_syy"),
    )
    nd = F.col("n_pairs").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("_sx").cast(
        "double"
    ) * F.col("_sy").cast("double")
    dx = nd * F.col("_sxx").cast("double") - F.col("_sx").cast(
        "double"
    ) * F.col("_sx").cast("double")
    dy = nd * F.col("_syy").cast("double") - F.col("_sy").cast(
        "double"
    ) * F.col("_sy").cast("double")
    return agg.select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        "sxy",
        F.when((dx > 0) & (dy > 0), F.round(num / F.sqrt(dx * dy), 6)).alias(
            "ccf"
        ),
    )


def logrank_test(
    events: DataFrame,
    group_flag,
    event_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    round_dp: int = 6,
) -> DataFrame:
    """1-row ``(n_1, n_2, events_1, events_2, expected_1, var_sum,
    chi2)`` — the two-sample log-rank test (Mantel 1966; Peto & Peto
    1972): does cohort 1 experience the event at a different RATE than
    cohort 2, with right-censoring handled exactly as
    :func:`kaplan_meier` does (two KM curves say WHAT the difference
    looks like; the log-rank says whether it is signal). ``group_flag``
    is a boolean Column over the per-user frame's ``uid`` column
    (cohort 1 = true). Same enrollment contract as ``kaplan_meier``:
    first event of any type enrolls, first ``event_type`` is the
    event, last activity censors.

    At each duration t with ``d_t`` pooled events: expected cohort-1
    events ``e1_t = d_t·n1_t/n_t`` and the hypergeometric variance
    ``v_t = d_t·(n1_t/n_t)·(n2_t/n_t)·(n_t−d_t)/(n_t−1)`` (skipped
    when ``n_t = 1``); ``chi2 = (O1 − E1)² / Σv_t``, ~χ²(1) under the
    null. Exactness: all at-risk/event counts per duration are exact
    BIGINTs off ONE shared prefix pass (the KM engine —
    :func:`relational.range_prefix_sums`, no global window); O1 is an
    exact BIGINT; E1/var/chi2 are sums of identical few-op double
    terms over those integers (summation-order jitter ~1e-16 vs the
    rounding quantum), rounded. NULL chi2 when Σv = 0 (no pooled
    event ever at risk in both cohorts)."""
    from sna_pyspark_graphframes_spark.operators.relational import (
        range_prefix_sums,
    )

    per_user = events.groupBy(F.col(user_col).alias("uid")).agg(
        F.min(ts_col).alias("enroll"),
        F.min(
            F.when(F.col(type_col) == event_type, F.col(ts_col))
        ).alias("ev_ts"),
        F.max(ts_col).alias("last_ts"),
    )
    dur = per_user.select(
        F.datediff(
            F.coalesce("ev_ts", "last_ts"), F.col("enroll")
        ).alias("t"),
        F.col("ev_ts").isNotNull().cast("long").alias("e"),
        group_flag.cast("long").alias("g1"),
    ).filter(F.col("g1").isNotNull())
    g = dur.groupBy("t").agg(
        F.sum(F.col("e") * F.col("g1")).cast("long").alias("d1"),
        F.sum(F.col("e") * (1 - F.col("g1"))).cast("long").alias("d2"),
        F.sum(F.col("g1")).cast("long").alias("dc1"),
        F.sum(1 - F.col("g1")).cast("long").alias("dc2"),
    )
    cum, totals = range_prefix_sums(g, "t", ["dc1", "dc2"])
    n1_tot, n2_tot = totals.get("dc1", 0), totals.get("dc2", 0)
    spark = events.sparkSession
    if n1_tot + n2_tot == 0:
        return spark.createDataFrame(
            [],
            "n_1 long, n_2 long, events_1 long, events_2 long,"
            " expected_1 double, var_sum double, chi2 double",
        )
    n1r = (F.lit(n1_tot) - F.col("cum_dc1") + F.col("dc1")).cast("double")
    n2r = (F.lit(n2_tot) - F.col("cum_dc2") + F.col("dc2")).cast("double")
    nr = n1r + n2r
    d = (F.col("d1") + F.col("d2")).cast("double")
    e1 = d * n1r / nr
    v = (
        d
        * (n1r / nr)
        * (n2r / nr)
        * (nr - d)
        / (nr - 1)
    )
    agg = cum.agg(
        F.sum("d1").cast("long").alias("events_1"),
        F.sum("d2").cast("long").alias("events_2"),
        F.sum(F.when(d > 0, e1).otherwise(F.lit(0.0))).alias("_e1"),
        F.sum(
            F.when((d > 0) & (nr > 1), v).otherwise(F.lit(0.0))
        ).alias("_v"),
    )
    o_minus_e = F.col("events_1").cast("double") - F.col("_e1")
    return agg.select(
        F.lit(n1_tot).cast("long").alias("n_1"),
        F.lit(n2_tot).cast("long").alias("n_2"),
        "events_1",
        "events_2",
        F.round(F.col("_e1"), 4).alias("expected_1"),
        F.round(F.col("_v"), 4).alias("var_sum"),
        F.when(
            F.col("_v") > 0,
            F.round(o_minus_e * o_minus_e / F.col("_v"), round_dp),
        ).alias("chi2"),
    )
