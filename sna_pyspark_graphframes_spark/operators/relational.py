"""Relational operator library over the star schema — the tabular substrate
the reference's graph pipeline sits on (scan/project/filter/union/distinct/
join/aggregate, SURVEY.md §2.1 #1-8) plus the standard OLAP shapes the
engine exposes beyond it (windows, top-k — SURVEY.md §2.3 additions).

Scale notes: dimension joins broadcast explicitly; aggregations rely on
map-side partial aggregation; top-k per group uses a window over the group
key (shuffle on the key, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scan_project_filter(lineitem: DataFrame) -> DataFrame:
    """Projection + predicate — both must reach the parquet scan
    (PushedFilters / ReadSchema in the explain output)."""
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_quantity")
        .filter((F.col("l_quantity") > 30) & (F.col("l_partkey") % 2 == 0))
    )


def revenue_per_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """Fact ⋈ two dims → agg. The fixed-size dim (nation, 25 rows) is
    broadcast unconditionally; customer SCALES WITH SF (1.5M rows x SF in
    TPC-H), so it carries no forced hint — AQE broadcasts it while it fits
    ``autoBroadcastJoinThreshold`` and shuffles it beyond (the same
    vocabulary-sized-side rule as ``corpus.word_pmi``). The final groupBy
    shuffles only 25 nation rows per partition."""
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def customer_order_left_join(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT outer equi-join + agg — the reference's endpoint-normalization
    join shape (``/root/reference/main.py:33-37``) on relational data;
    customers without orders surface with zero counts."""
    joined = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    )
    return joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
    )


def top_order_per_customer(orders: DataFrame) -> DataFrame:
    """Top-1-per-group via row_number window — partitioned by customer, so
    the sort is per-group (no single-partition global window)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def order_priority_counts(orders: DataFrame) -> DataFrame:
    """Filter + groupBy + post-agg predicate (HAVING)."""
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 10)
    )


def part_type_rollup(part: DataFrame) -> DataFrame:
    """ROLLUP aggregate — multi-level totals in one pass (grouping-set
    expansion happens inside the aggregate; one shuffle)."""
    return (
        part.rollup("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


def part_brand_size_cube(part: DataFrame) -> DataFrame:
    """CUBE aggregate — all grouping-set combinations in one pass."""
    return part.cube("p_brand", "p_size").agg(F.count("*").alias("n_parts"))


def orders_status_pivot(orders: DataFrame) -> DataFrame:
    """PIVOT: order counts per priority × status. Status domain is declared
    (pivot with explicit values avoids the extra distinct-scan pass)."""
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def customers_with_and_without_orders(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """INTERSECT/EXCEPT set ops: customers that do vs. don't have orders,
    tagged — exercises semi/anti-join set semantics as SQL set operators."""
    custs = customer.select(F.col("c_custkey").alias("k"))
    with_orders = custs.intersect(orders.select(F.col("o_custkey").alias("k")))
    without = custs.exceptAll(orders.select(F.col("o_custkey").alias("k")).distinct())
    return with_orders.withColumn("has_orders", F.lit(1)).unionByName(
        without.withColumn("has_orders", F.lit(0))
    )


def orders_per_month(orders: DataFrame) -> DataFrame:
    """Date/time functions: truncate to month, extract year, count."""
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )


def part_name_tokens(part: DataFrame) -> DataFrame:
    """String functions: lower/split/explode token pipeline over part names
    (the same shape as the documents token pipeline, on a dimension)."""
    return (
        part.select(
            F.explode(F.split(F.lower("p_name"), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def price_math(part: DataFrame) -> DataFrame:
    """Math scalar functions — log/sqrt/pow/abs/ceil/floor in one projection."""
    p = F.col("p_retailprice")
    return part.select(
        "p_partkey",
        F.round(F.log(p), 4).alias("log_price"),
        F.round(F.sqrt(p), 4).alias("sqrt_price"),
        F.round(F.pow(p, 2.0), 2).alias("price_sq"),
        F.ceil(p).cast("long").alias("price_ceil"),
        F.floor(p).cast("long").alias("price_floor"),
    )


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """Data-quality profile: one row per column —
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``.

    The audit a training-data pipeline runs before ingesting a new 100 TB
    drop: null rates, cardinalities, value ranges. ONE pass over the data —
    every per-column aggregate lives in a single ``agg`` (count/min/max are
    plain map-side partials; the multi-column distinct uses Spark's expand,
    |cols| rows per input row, still one shuffle), then the 1-row result is
    unpivoted driver-side-free with ``stack``. min/max are cast to string
    AFTER aggregating on the native type, so ordering semantics stay the
    column's own.
    """
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __min_{c}, __max_{c}"
        for c in columns
    )
    return row.selectExpr(
        f"stack({len(columns)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_value, max_value)",
        "__n AS n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def latest_by_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Changelog compaction: the LATEST row per key — the materialized
    current-state view of an append-only change stream (CDC snapshot,
    last-writer-wins upsert). ``order_cols`` breaks ties deterministically
    (e.g. ``["ts", "event_id"]``).

    One shuffle on the key, per-group top-1 via row_number — no global
    sort; at 100 TB this is the standard compaction plan (same shape a
    MERGE-on-read table format runs). The helper column never leaves the
    operator."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changelog(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Full CDC apply: latest row per key, with keys whose latest
    operation is a tombstone (``op_col == delete_op``) REMOVED from the
    snapshot — upsert + delete semantics over an append-only log."""
    latest = latest_by_key(df, key_cols, order_cols)
    return latest.filter(F.col(op_col) != F.lit(delete_op))


def reconcile(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    value_col: str,
    tol: float = 0.0,
) -> DataFrame:
    """Dataset reconciliation: FULL OUTER join two keyed aggregates and
    classify every key — ``matched`` / ``mismatch`` / ``left_only`` /
    ``right_only`` — the audit that runs after every migration, backfill
    or dual-write. ``(keys..., left_value, right_value, status)``.

    One co-partitioned full-outer join on the keys; ``tol`` absorbs
    float-rounding drift between engines. Both inputs are expected to be
    already aggregated (one row per key), so the join is key-sized, not
    fact-sized."""
    lv, rv = f"l_{value_col}", f"r_{value_col}"
    l = left.select(*keys, F.col(value_col).alias(lv))
    r = right.select(*keys, F.col(value_col).alias(rv))
    joined = l.join(r, keys, "full_outer")
    status = (
        F.when(F.col(lv).isNull(), F.lit("right_only"))
        .when(F.col(rv).isNull(), F.lit("left_only"))
        .when(F.abs(F.col(lv) - F.col(rv)) <= tol, F.lit("matched"))
        .otherwise(F.lit("mismatch"))
    )
    return joined.select(
        *keys,
        F.col(lv).alias("left_value"),
        F.col(rv).alias("right_value"),
        status.alias("status"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """``(group, n, median, mad, n_outliers)`` — robust per-group outlier
    detection by modified z-score (Iglewicz & Hoaglin): a row is an
    outlier when ``0.6745·|x − median| / MAD > threshold``, i.e.
    ``|x − median| > threshold·MAD/0.6745``. Median/MAD instead of
    mean/stddev so the fences themselves don't move under the very
    contamination being detected — the standard quality-filter fence for
    pretraining-corpus features (doc length, perplexity, price fields).

    Three grouped aggregates + two joins of |groups|-sized frames back
    onto the fact table (AQE broadcasts them — group cardinality is tiny
    by construction): (1) per-group exact interpolated median, (2) MAD =
    median of absolute deviations + row count, (3) the fence count.
    Exact ``percentile`` matches DuckDB ``quantile_cont`` bit-for-bit
    (the ``price_quantiles`` parity), so the fence comparison — computed
    with the identical expression shape in both engines — flips only if
    a deviation lands inside the sub-ulp window between the engines'
    thresholds (probability ~n·ulp/range ≈ 1e-15 here). At 100 TB swap
    both percentiles to ``approx_percentile`` and the count to a
    tolerance twin (the ``approx_price_quantiles`` recipe) — same call
    shape, one pass, mergeable sketches.

    Degenerate groups (ADVICE r11): when a majority of a group's values
    equal the median, MAD = 0 and the fence collapses to 0 — the
    standard modified-z-score degeneracy: ANY deviation then counts as
    an outlier here (strict ``>`` on a zero fence flags every row NOT
    at the median). Callers wanting the opposite convention (flag
    nothing when MAD = 0) should filter ``mad > 0``; a mean-abs-
    deviation fallback would break the exact cross-engine twin."""
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    dev = df.join(med, group_col).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.min("_med").alias("_med"),
        F.percentile("_adev", F.lit(0.5)).alias("_mad"),
    )
    fence = F.lit(float(threshold)) * F.col("_mad") / F.lit(0.6745)
    return (
        dev.select(group_col, "_adev")
        .join(mad, group_col)
        .groupBy(group_col)
        .agg(
            F.min("n").alias("n"),
            F.round(F.min("_med"), 4).alias("median"),
            F.round(F.min("_mad"), 4).alias("mad"),
            F.sum((F.col("_adev") > fence).cast("long")).alias("n_outliers"),
        )
    )


def population_stability(
    ref: DataFrame,
    new: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """1-row ``(n_ref, n_new, psi)`` — the Population Stability Index
    between a reference slice and a new slice of the same numeric
    column: bucket the REF distribution into ``n_buckets`` equal-mass
    bins by its own exact interpolated percentiles, place both slices
    into those bins, and sum ``(p - q)·ln(p/q)`` (p = ref share, q =
    new share, both floored at ``eps`` so empty bins stay finite — the
    standard convention). The drift monitor a training pipeline runs
    per ingest batch: PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 act.

    Determinism: exact ``percentile`` edges are bit-equal to DuckDB
    ``quantile_cont`` (the ``price_quantiles`` parity), bucket counts
    are integers, shares are exact integer ratios — the one fp sum runs
    over ``n_buckets`` identical doubles, rounded at 6 dp. Plan: one
    percentile aggregate on ref (collected as ONE 1-row action — the
    edges are n_buckets−1 literals entering both bucketing scans), then
    one codegen bucketing aggregate per slice; at 100 TB swap the edge
    pass to ``approx_percentile`` (same call shape) and the twin to a
    tolerance form.

    NULL contract (ADVICE r12): NULL values are DROPPED from both
    slices before bucketing — same contract as ``logreg_gd``. Without
    the filter Spark's ``(v >= e).cast('int')`` sends NULLs to a NULL
    bucket while a SQL CASE twin sends them to bucket 0, a latent
    cross-engine mismatch on nullable columns."""
    ref = ref.filter(F.col(value_col).isNotNull())
    new = new.filter(F.col(value_col).isNotNull())
    edges_row = ref.agg(
        F.percentile(
            value_col,
            F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)]),
        ).alias("e")
    ).first()
    edges = list(edges_row["e"] or [])
    if not edges:
        return ref.sparkSession.createDataFrame(
            [(0, 0, 0.0)], "n_ref long, n_new long, psi double"
        )
    v = F.col(value_col).cast("double")
    bucket = F.lit(0)
    for e in edges:  # strictly-less upper bound, same expression per engine
        bucket = bucket + (v >= F.lit(float(e))).cast("int")

    def shares(df):
        return (
            df.select(bucket.alias("b"))
            .groupBy("b")
            .agg(F.count("*").cast("long").alias("c"))
        )

    p = shares(ref).withColumnRenamed("c", "cr")
    q = shares(new).withColumnRenamed("c", "cq")
    joined = p.join(q, "b", "full").fillna({"cr": 0, "cq": 0})
    tot = joined.agg(
        F.sum("cr").alias("nr"), F.sum("cq").alias("nq")
    )
    pe = F.greatest(F.col("cr") / F.col("nr"), F.lit(eps))
    qe = F.greatest(F.col("cq") / F.col("nq"), F.lit(eps))
    return (
        joined.crossJoin(F.broadcast(tot))
        .agg(
            F.min("nr").cast("long").alias("n_ref"),
            F.min("nq").cast("long").alias("n_new"),
            F.round(F.sum((pe - qe) * F.log(pe / qe)), 6).alias("psi"),
        )
    )


def range_prefix_sums(
    g: DataFrame,
    order_col: str,
    cols: list[str],
    n_range_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Distributed PREFIX SUMS over an ordered table, without a global
    single-task window: range-repartition on ``order_col``, pin the
    physical partition ids with a checkpoint, per-partition window
    sums, then ONE |partitions|-row driver read whose running offsets
    re-enter as a broadcast join. Two parallel passes; every stage
    scales. Returns ``(frame with cum_<c> columns, {c: total})`` —
    the shared engine under :func:`ks_statistic` and :func:`ecdf`.

    Adjacent-coalescing safe: AQE merges only ADJACENT range
    partitions, so partition-id order still follows value order and
    the running offsets stay correct."""
    from sna_pyspark_graphframes_spark.plans.iterate import checkpointed

    spark = g.sparkSession
    # Materialize the grid BEFORE the range exchange (r14, guide §2.4):
    # RangePartitioning needs range bounds, which Spark gets from a
    # separate sampling pass over the CHILD PLAN — unmaterialized, the
    # caller's whole upstream aggregation executed twice per engine call
    # (measured: spearman's 583k-distinct price grid re-ran its 600k-row
    # groupBy for the sampler). Checkpointing first makes the sampling
    # pass a cheap read of materialized blocks, and gives us the grid
    # size for free, which sizes the range shuffle adaptively:
    # ~256k grid rows per partition, so a 50-row quantity grid runs as
    # ONE range partition (numPartitions=1 skips bound-sampling
    # entirely) while a 100 TB grid still fans out to the cluster
    # (capped by defaultParallelism, itself scale-derived). The prefix
    # sums are partition-count-invariant: offsets accumulate in pid
    # order whatever p is.
    grid = checkpointed(g)
    n_grid = grid.count()
    p = n_range_partitions or max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            -(-n_grid // 262_144),
        ),
    )
    # pid is physical — pin it with a checkpoint before the two reads.
    # lazy: the per-pid totals collect below is the materializing action
    # (the r9 setup-fold recipe) — one job for checkpoint-write +
    # totals-read instead of two passes over the grid (r14, guide §1.2:
    # fewer driver actions per engine call; the engine runs under 8+
    # registry queries).
    gp = checkpointed(
        grid.repartitionByRange(p, order_col).withColumn(
            "pid", F.spark_partition_id()
        ),
        lazy=True,
    )
    w = (
        Window.partitionBy("pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = gp.select(
        "*", *[F.sum(c).over(w).alias(f"_l_{c}") for c in cols]
    )
    parts = sorted(
        gp.groupBy("pid")
        .agg(*[F.sum(c).alias(c) for c in cols])
        .collect(),
        key=lambda r: r.pid,
    )
    from pyspark.sql.types import DoubleType, FloatType

    def _is_fp(c):
        return isinstance(g.schema[c].dataType, (DoubleType, FloatType))

    offsets_rows, run = [], {c: (0.0 if _is_fp(c) else 0) for c in cols}
    for r in parts:
        offsets_rows.append((r.pid, *[run[c] for c in cols]))
        for c in cols:
            run[c] += r[c] or (0.0 if _is_fp(c) else 0)
    totals = dict(run)
    # reserved key (r15): the measured grid row count, already paid for
    # by the partition-count derivation above — callers that join the
    # grid back onto row-level frames use it to SIZE-GATE a broadcast
    # hint on the grid side (plans.hints.state_hinted), skipping the
    # row-side exchange of a sort-merge join. "__"-prefixed so the
    # per-column totals lookups (totals.get(col)) never collide.
    totals["__grid_rows"] = n_grid
    if not offsets_rows:
        out = g.select(
            "*",
            *[
                F.lit(0)
                .cast("double" if _is_fp(c) else "long")
                .alias(f"cum_{c}")
                for c in cols
            ],
        )
        return out, totals
    schema = "pid int, " + ", ".join(
        f"_o_{c} {'double' if _is_fp(c) else 'long'}" for c in cols
    )
    offsets = g.sparkSession.createDataFrame(offsets_rows, schema)
    out = (
        local.join(F.broadcast(offsets), "pid")
        .select(
            *[c for c in g.columns],
            *[
                (F.col(f"_l_{c}") + F.col(f"_o_{c}"))
                .cast("double" if _is_fp(c) else "long")
                .alias(f"cum_{c}")
                for c in cols
            ],
        )
    )
    return out, totals


def ecdf(
    df: DataFrame,
    value_col: str,
    round_dp: int = 6,
    n_range_partitions: int | None = None,
) -> DataFrame:
    """``(v, n_le, ecdf)`` — the exact empirical CDF of a numeric
    column, one row per distinct value: ``n_le`` = count of rows ≤ v
    (exact BIGINT — the hash-safe column), ``ecdf = n_le/n`` (single
    division off exact integers, rounded). The building block under
    percentile-rank normalization and the KS drift test, computed with
    the distributed prefix-sum pattern (:func:`range_prefix_sums`) —
    no global single-task window. NULLs drop."""
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    cum, totals = range_prefix_sums(g, "v", ["c"], n_range_partitions)
    n = totals.get("c", 0)
    if n == 0:
        return df.sparkSession.createDataFrame(
            [], "v double, n_le long, ecdf double"
        )
    return cum.select(
        "v",
        F.col("cum_c").alias("n_le"),
        F.round(F.col("cum_c") / F.lit(float(n)), round_dp).alias("ecdf"),
    )


def ks_statistic(
    ref: DataFrame,
    new: DataFrame,
    value_col: str,
    n_range_partitions: int | None = None,
) -> DataFrame:
    """1-row ``(n_ref, n_new, ks_num, ks)`` — the exact two-sample
    Kolmogorov–Smirnov statistic ``D = max_v |F_ref(v) − F_new(v)|``
    between two slices of a numeric column: the NONPARAMETRIC member of
    the drift family (``population_stability`` buckets, ``ks`` needs no
    bucketing choice and is sensitive to any distribution change).
    NULLs drop (the PSI/logreg contract).

    Exactness: with ``c_a/c_b`` the cumulative counts at pooled value v,
    ``D = max |c_a·n_new − c_b·n_ref| / (n_ref·n_new)`` — the hashed
    ``ks_num = max |c_a·n_new − c_b·n_ref|`` is an exact BIGINT (the knn
    protocol: integers in the hash, the fp convenience ratio alongside,
    rounded 6 dp off exact integers — a single division, bit-identical
    cross-engine).

    Scale — the distributed-ECDF pattern: the cumulative counts are a
    PREFIX SUM over the distinct-value table, computed WITHOUT a global
    single-task window: range-repartition by value, per-partition
    window sums, then one |partitions|-row driver read whose running
    offsets re-enter as a broadcast join — two passes over the
    (already aggregated) distinct-value table, every stage parallel.
    ``n_range_partitions`` defaults to the session parallelism."""
    spark = ref.sparkSession
    v = F.col(value_col)

    def side(df, col):
        return df.filter(v.isNotNull()).select(
            v.alias("v"), F.lit(1 if col == "a" else 0).alias("a"),
            F.lit(0 if col == "a" else 1).alias("b"),
        )

    pooled = side(ref, "a").unionByName(side(new, "b"))
    g = pooled.groupBy("v").agg(
        F.sum("a").cast("long").alias("ca"), F.sum("b").cast("long").alias("cb")
    )
    cum, totals = range_prefix_sums(g, "v", ["ca", "cb"], n_range_partitions)
    na, nb = totals.get("ca", 0), totals.get("cb", 0)
    if na == 0 or nb == 0:
        return spark.createDataFrame(
            [(na, nb, 0, 0.0)],
            "n_ref long, n_new long, ks_num long, ks double",
        )
    d = F.col("cum_ca") * F.lit(nb) - F.col("cum_cb") * F.lit(na)
    return cum.agg(
        F.lit(na).alias("n_ref"),
        F.lit(nb).alias("n_new"),
        F.max(F.abs(d)).cast("long").alias("ks_num"),
        F.round(
            F.max(F.abs(d)) / F.lit(float(na) * float(nb)), 6
        ).alias("ks"),
    )


def trimmed_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """``(group, n, n_kept, q_lo, q_hi, trimmed_mean)`` — per-group
    robust location via quantile trimming: keep values inside the
    exact interpolated ``[q_lo, q_hi]`` percentiles and average them —
    the tail-insensitive mean next to :func:`mad_outliers`' fence
    count (MAD says how many outliers; the trimmed mean says what the
    bulk looks like without them). NULLs drop.

    Cross-engine: exact ``percentile`` is bit-equal to DuckDB
    ``quantile_cont`` (the ``price_quantiles`` parity), the keep
    predicate compares against identical doubles, counts are integers,
    and the trimmed mean is a safe-class continuous AVG rounded 4 dp.
    Plan: one per-group percentile aggregate (|groups| rows) joined
    back broadcast onto the fact scan, then one filtered aggregate —
    two passes, the :func:`mad_outliers` shape; at 100 TB swap the
    percentile pass to ``approx_percentile`` (same call shape)."""
    df = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col)
    q = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(float(lo))).alias("_qlo"),
        F.percentile(value_col, F.lit(float(hi))).alias("_qhi"),
        F.count("*").cast("long").alias("n"),
    )
    return (
        df.join(F.broadcast(q), group_col)
        .groupBy(group_col)
        .agg(
            F.min("n").alias("n"),
            F.sum(
                ((v >= F.col("_qlo")) & (v <= F.col("_qhi"))).cast("long")
            ).alias("n_kept"),
            F.round(F.min("_qlo"), 4).alias("q_lo"),
            F.round(F.min("_qhi"), 4).alias("q_hi"),
            F.round(
                F.avg(
                    F.when((v >= F.col("_qlo")) & (v <= F.col("_qhi")), v)
                ),
                4,
            ).alias("trimmed_mean"),
        )
    )


def zscore_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_dp: int = 4,
) -> DataFrame:
    """Input rows + ``z`` — per-group standardization
    ``z = (v − μ_g)/σ_g``: the data-derived feature scaling in front of
    a GD trainer (``logreg_returnflag_gd`` hand-scales; this computes
    the scaling from the data). Zero-variance groups emit z = NULL;
    NULL values pass through with z = NULL.

    Determinism: μ and σ come from explicit SUM / SUM-of-squares /
    COUNT aggregates (never the engine's Welford ``stddev``, whose
    accumulation order is engine-specific — the ``rate_anomaly``
    contract); the per-row z is then one fp expression over those
    shared scalars, rounded. Plan: one |groups|-row aggregate joined
    back broadcast onto the scan — the ``mad_outliers`` two-pass
    shape."""
    v = F.col(value_col).cast("double")
    stats = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count("*").cast("double").alias("_k"),
            F.sum(v).alias("_s1"),
            F.sum(v * v).alias("_s2"),
        )
    )
    mean = F.col("_s1") / F.col("_k")
    # try_divide: a single-value group has k-1 = 0, and under ANSI mode
    # a plain division raises even inside an unevaluated WHEN branch;
    # NULL-on-zero matches DuckDB's division semantics exactly
    var = F.try_divide(
        F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_k"),
        F.col("_k") - 1,
    )
    z = F.when(
        F.col(value_col).isNotNull() & (var > 0),
        F.round((v - mean) / F.sqrt(var), round_dp),
    )
    return (
        df.join(F.broadcast(stats), group_col, "left")
        .withColumn("z", z)
        .drop("_k", "_s1", "_s2")
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    round_dp: int = 6,
    n_range_partitions: int | None = None,
) -> DataFrame:
    """1-row ``(n, total, gini)`` — the Gini concentration coefficient
    of a non-negative numeric column (Gini 1912, via the rank formula
    ``G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)``): the skew diagnostic a
    pipeline runs on per-key mass before choosing a partitioning —
    revenue per customer, tokens per document, dedup-cluster sizes —
    G→0 uniform, G→1 one key holds everything (the "will this key
    skew the shuffle" number, cf. the salting operators).

    Tie-correct grouped formulation: for value v repeated c times
    starting after cumulative count k, ``Σ i over the block =
    c·k + c(c+1)/2``, so one distinct-value aggregate + the shared
    distributed prefix-sum engine (:func:`range_prefix_sums` — range
    repartition, per-partition windows, |partitions|-row offset
    broadcast; NO global single-task window) computes the exact rank
    sum at any scale. NULLs drop; negative values are the caller's
    contract violation (G is defined on non-negative mass).

    Exactness: n, c, k are exact BIGINTs; the three sums are the
    safe fp class (per-term products of exact quantities, add-order
    jitter ~1e-10 relative vs the 6-dp half-quantum); ``gini`` is NULL
    when the total mass is 0 (undefined — 0 would misread as
    "perfectly uniform")."""
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("double").alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    cum, totals = range_prefix_sums(g, "v", ["c"], n_range_partitions)
    agg = cum.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum(F.col("v") * F.col("c")), F.lit(0.0)).alias("sx"),
        F.coalesce(
            F.sum(
                F.col("v")
                * (
                    F.col("c") * (F.col("cum_c") - F.col("c"))
                    + F.col("c") * (F.col("c") + 1) / 2.0
                )
            ),
            F.lit(0.0),
        ).alias("six"),
    )
    return agg.select(
        "n",
        F.round("sx", 4).alias("total"),
        F.when(
            (F.col("n") > 0) & (F.col("sx") > 0),
            F.round(
                (2.0 * F.col("six") - (F.col("n") + 1) * F.col("sx"))
                / (F.col("n") * F.col("sx")),
                round_dp,
            ),
        ).alias("gini"),
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    round_dp: int = 4,
) -> DataFrame:
    """1-row ``(n_a, n_b, mean_a, mean_b, t_stat, df_welch)`` — Welch's
    unequal-variance two-sample t-test (Welch 1947) between two slices
    of a numeric column: the parametric member of the drift family
    (``ks_statistic`` is the nonparametric sibling; this one answers
    "did the MEAN move" with a significance scale attached).
    ``df_welch`` is the Welch–Satterthwaite effective degrees of
    freedom. NULL values drop (the PSI/KS contract); groups with
    n < 2 or zero pooled standard error emit NULL t/df.

    Determinism: counts are exact BIGINTs (the hash anchors); means and
    variances come from explicit SUM / SUM-of-squares aggregates (never
    the engine's Welford ``stddev`` — the ``zscore_normalize``
    contract), and t/df are few-op fp expressions over those scalars,
    rounded. Plan: ONE scan, conditional aggregation into a single
    1-row reduce — no join, no shuffle beyond the map-side partials."""
    v = F.col(value_col).cast("double")
    g = F.col(group_col)
    d = df.filter(F.col(value_col).isNotNull() & g.isin([group_a, group_b]))
    a = F.when(g == group_a, v)
    b = F.when(g == group_b, v)
    agg = d.agg(
        F.count(a).cast("long").alias("n_a"),
        F.count(b).cast("long").alias("n_b"),
        F.sum(a).alias("_sa1"),
        F.sum(a * a).alias("_sa2"),
        F.sum(b).alias("_sb1"),
        F.sum(b * b).alias("_sb2"),
    )
    ka, kb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("_sa1") / ka
    mb = F.col("_sb1") / kb
    va = F.try_divide(F.col("_sa2") - F.col("_sa1") * F.col("_sa1") / ka, ka - 1)
    vb = F.try_divide(F.col("_sb2") - F.col("_sb1") * F.col("_sb1") / kb, kb - 1)
    se2 = va / ka + vb / kb
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    return agg.select(
        "n_a",
        "n_b",
        F.round(ma, round_dp).alias("mean_a"),
        F.round(mb, round_dp).alias("mean_b"),
        F.when(ok, F.round((ma - mb) / F.sqrt(se2), round_dp)).alias("t_stat"),
        F.when(
            ok,
            F.round(
                se2 * se2
                / ((va / ka) * (va / ka) / (ka - 1)
                   + (vb / kb) * (vb / kb) / (kb - 1)),
                2,
            ),
        ).alias("df_welch"),
    )


def avg_rank2(
    df: DataFrame,
    value_col: str,
    n_range_partitions: int | None = None,
) -> DataFrame:
    """``(v, c, r2)`` — per distinct value of a numeric column, its
    tie-averaged rank DOUBLED so it is an EXACT BIGINT (average rank of
    a block of c ties after k smaller rows is ``k + (c+1)/2``, a
    half-integer; ``r2 = 2·cum − c + 1`` where cum = count ≤ v). The
    shared integer-rank engine under :func:`spearman_corr` and
    :func:`mann_whitney_u` — rank statistics without ever leaving
    exact-integer arithmetic, so cross-engine hashes can anchor on the
    rank sums themselves. Built on the distributed prefix-sum pattern
    (:func:`range_prefix_sums` — no global single-task window). NULLs
    drop."""
    return _avg_rank2_sized(df, value_col, n_range_partitions)[0]


def _avg_rank2_sized(
    df: DataFrame,
    value_col: str,
    n_range_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """:func:`avg_rank2` plus the measured distinct-value count (free —
    the prefix-sum engine counts the grid anyway), so callers that join
    the rank table back onto row-level frames can size-gate a broadcast
    hint on it (r15, guide §3.1)."""
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    cum, totals = range_prefix_sums(g, "v", ["c"], n_range_partitions)
    out = cum.select(
        "v",
        "c",
        (2 * F.col("cum_c") - F.col("c") + 1).cast("long").alias("r2"),
    )
    return out, int(totals.get("__grid_rows", 0))


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_dp: int = 6,
    n_range_partitions: int | None = None,
) -> DataFrame:
    """1-row ``(n, srxy2, spearman)`` — Spearman rank correlation
    (Spearman 1904) between two numeric columns: Pearson correlation
    over tie-averaged ranks, the monotone-association probe that is
    insensitive to the marginal distributions (the feature-screening
    companion to ``corr`` — price vs quantity need not be LINEARLY
    related for ρ_s to see the association). Rows where either side is
    NULL drop (complete-case, the standard contract).

    Exactness: doubled ranks ``r2 = 2·rank`` are exact BIGINTs
    (:func:`avg_rank2`); all six sufficient statistics
    (n, Σr2x, Σr2y, Σr2x·r2y, Σr2x², Σr2y²) are exact BIGINT sums —
    ``srxy2 = Σ r2x·r2y`` is the hash anchor — and ρ_s is one
    identical few-op double expression over them, rounded. The doubling
    cancels in the correlation. int64 bound: Σr2x·r2y ≤ 4n³, exact to
    n ≈ 1.3e6; beyond that scale the product sums should be computed
    as doubles (ρ_s rounds at 6 dp; the fp jitter is ~1e-12 relative)
    — this implementation keeps the exact path, matching the test
    fixtures' scale.

    Plan: two distinct-value grids (prefix-summed without a global
    window), two equi-joins back onto the rows, one 1-row reduce. The
    rank tables are SIZE-GATED broadcast sides (r15, guide §3.1): they
    come off a checkpoint (no catalog stats, so neither Catalyst nor
    AQE's planning pass picks the broadcast, and AQE's runtime
    conversion still pays the row side's shuffle writes first — the
    hints.py measurement); the grid row count the prefix-sum engine
    already measured gates broadcast vs shuffle-hash, so the row-level
    frame is never exchanged while the rank table fits. A/B at
    sf0.1/32c, 3 reps: spearman 2.9–3.2 s → see OPTIMIZATION_r15.md."""
    from sna_pyspark_graphframes_spark.plans.hints import state_hinted

    d = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
    rx, ngx = _avg_rank2_sized(d, "_x", n_range_partitions)
    rx = rx.select(F.col("v").alias("_x"), F.col("r2").alias("rx"))
    ry, ngy = _avg_rank2_sized(d, "_y", n_range_partitions)
    ry = ry.select(F.col("v").alias("_y"), F.col("r2").alias("ry"))
    j = d.join(state_hinted(rx, ngx), "_x").join(state_hinted(ry, ngy), "_y")
    agg = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx").cast("long").alias("_sx"),
        F.sum("ry").cast("long").alias("_sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("srxy2"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("_sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("_syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("srxy2").cast("double") - F.col("_sx").cast(
        "double"
    ) * F.col("_sy").cast("double")
    dx = nd * F.col("_sxx").cast("double") - F.col("_sx").cast(
        "double"
    ) * F.col("_sx").cast("double")
    dy = nd * F.col("_syy").cast("double") - F.col("_sy").cast(
        "double"
    ) * F.col("_sy").cast("double")
    return agg.select(
        "n",
        "srxy2",
        F.when(
            (dx > 0) & (dy > 0),
            F.round(num / F.sqrt(dx * dy), round_dp),
        ).alias("spearman"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    round_dp: int = 6,
    n_range_partitions: int | None = None,
) -> DataFrame:
    """1-row ``(n_a, n_b, u2_a, tie_sum, u_a, z)`` — the Mann–Whitney
    U test (Mann & Whitney 1947) between two slices of a numeric
    column: the nonparametric location-shift member of the drift family
    (``welch_ttest`` assumes normal-ish tails; U only uses ranks, so a
    heavy-tailed price column can't fake it out). ``u2_a = 2·U_a`` and
    the tie-correction term ``tie_sum = Σ(t³−t)`` are EXACT BIGINTs
    (the hash anchors); ``u_a = u2_a/2`` is exactly representable
    (half-integer); ``z`` is the tie-corrected normal approximation
    ``(U − n_a·n_b/2)/σ_U`` as one identical few-op double expression
    over the exact integers, rounded. NULL values drop.

    Ranks ride :func:`avg_rank2` over the POOLED sample (doubled →
    exact integers; rank-sum ``R_a`` appears as Σr2/2, so
    ``u2_a = Σ_{a} r2 − n_a(n_a+1)``). int64 bound: tie_sum ≤ N³,
    exact to N ≈ 2e6; the docstringed double fallback applies beyond.
    Plan: one grid + prefix sums (no global window), one equi-join
    back, one 1-row conditional reduce."""
    g = F.col(group_col)
    d = df.filter(
        F.col(value_col).isNotNull() & g.isin([group_a, group_b])
    ).select(
        F.col(value_col).alias("_v"), (g == group_a).alias("_a")
    )
    r, n_grid = _avg_rank2_sized(d, "_v", n_range_partitions)
    r = r.select(
        F.col("v").alias("_v"),
        "r2",
        (F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("_t3"),
    )
    # tie term lives on the grid (one row per distinct value); the
    # per-row join only needs r2. The rank table is a size-gated
    # broadcast side (r15, guide §3.1 — the spearman_corr rationale):
    # the row-level frame is never exchanged while the grid fits.
    from sna_pyspark_graphframes_spark.plans.hints import state_hinted

    ties = r.agg(F.coalesce(F.sum("_t3"), F.lit(0)).cast("long").alias("tie_sum"))
    j = d.join(state_hinted(r.select("_v", "r2"), n_grid), "_v")
    agg = j.agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("_a"), 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("_a"), F.col("r2"))).cast("long").alias("_r2a"),
    ).crossJoin(F.broadcast(ties))
    u2 = F.col("_r2a") - F.col("n_a") * (F.col("n_a") + 1)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    nn = na + nb
    sigma2 = (
        na * nb / 12.0
        * ((nn + 1) - F.col("tie_sum").cast("double") / (nn * (nn - 1)))
    )
    return agg.select(
        "n_a",
        "n_b",
        u2.cast("long").alias("u2_a"),
        "tie_sum",
        (u2.cast("double") / 2.0).alias("u_a"),
        F.when(
            (F.col("n_a") >= 1) & (F.col("n_b") >= 1) & (sigma2 > 0),
            F.round(
                (u2.cast("double") / 2.0 - na * nb / 2.0) / F.sqrt(sigma2),
                round_dp,
            ),
        ).alias("z"),
    )


def cusum_changepoint(
    df: DataFrame,
    order_col: str,
    value_col: str,
    round_dp: int = 6,
    n_range_partitions: int | None = None,
) -> DataFrame:
    """1-row ``(n, sum_x, t_star, idx_star, cusum_num, cusum, z)`` —
    the offline CUSUM change-point scan (Page 1954; the Buishand-range
    normalization) over an integer-valued ordered series: with
    ``S_t = Σ_{i≤t}(x_i − x̄)`` the cumulative deviation from the
    global mean, the statistic is ``max_t |S_t|`` and the estimated
    change point is its argmax — the "WHEN did the level shift" probe
    that complements the two-sample drift tests (those need the split
    point given; this finds it). Smallest-t tie-break (deterministic
    cross-engine).

    The caller supplies the series (one row per index, e.g. the daily
    count aggregate); duplicate indices are a caller contract
    violation. Exactness: ``n·S_t = n·cum_x − t·Σx`` is an EXACT
    BIGINT, so ``cusum_num = max_t |n·cum_x − t·Σx|`` hashes exactly;
    ``cusum = cusum_num/n`` (= max|S_t|) and the scale-free
    ``z = cusum_num / (n·σ̂·√n)`` (σ̂ from explicit exact Σx/Σx²
    moments — never engine ``stddev``) are identical few-op double
    expressions, rounded. int64 bound: n·Σx — exact to
    n·Σx < 9.2e18, far past any count series here; beyond, compute
    the product in double (the spearman fallback note).

    Plan: the shared distributed prefix-sum engine
    (:func:`range_prefix_sums` — range repartition, per-partition
    windows, |partitions|-row offset broadcast, NO global single-task
    window), then a TakeOrdered top-1 on (−|T|, t). NULLs drop."""
    g = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(order_col).alias("idx"),
        F.col(value_col).cast("long").alias("x"),
        F.lit(1).cast("long").alias("one"),
    )
    cum, totals = range_prefix_sums(g, "idx", ["x", "one"], n_range_partitions)
    n = totals.get("one", 0)
    sx = totals.get("x", 0)
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [],
            "n long, sum_x long, t_star long, idx_star long, "
            "cusum_num long, cusum double, z double",
        )
    sxx = g.agg(F.sum(F.col("x") * F.col("x")).cast("long").alias("s")).first()["s"]
    t_col = F.col("cum_one")
    big_t = F.lit(n) * F.col("cum_x") - t_col * F.lit(sx)
    best = (
        cum.select(
            t_col.alias("t_star"),
            F.col("idx").cast("long").alias("idx_star"),
            F.abs(big_t).cast("long").alias("cusum_num"),
        )
        .orderBy(F.col("cusum_num").desc(), F.col("t_star").asc())
        .limit(1)
    )
    nd = float(n)
    var = (
        (float(sxx) - float(sx) * float(sx) / nd) / (nd - 1)
        if n >= 2
        else None
    )
    sig = var ** 0.5 if var is not None and var > 0 else None
    return best.select(
        F.lit(n).cast("long").alias("n"),
        F.lit(sx).cast("long").alias("sum_x"),
        "t_star",
        "idx_star",
        "cusum_num",
        F.round(F.col("cusum_num").cast("double") / F.lit(nd), round_dp).alias(
            "cusum"
        ),
        (
            F.round(
                F.col("cusum_num").cast("double")
                / (F.lit(nd) * F.lit(sig) * F.sqrt(F.lit(nd))),
                round_dp,
            )
            if sig is not None
            else F.lit(None).cast("double")
        ).alias("z"),
    )


def benford_digits(
    df: DataFrame,
    int_col,
    round_dp: int = 6,
) -> DataFrame:
    """9 rows ``(digit, observed, n, expected_p, observed_p,
    chi2_term)`` — the first-significant-digit distribution of a
    positive integer column against Benford's law (Newcomb 1881,
    Benford 1938): ``P(d) = log10(1 + 1/d)``. THE forensic screen on
    a numeric column — naturally-grown magnitudes (file sizes,
    populations, real ledgers) follow it; uniform or fabricated data
    deviates loudly, so the per-digit χ² terms localize WHICH digits
    are off. All 9 digit rows always appear (zero-observed digits
    included). Non-positive and NULL values drop.

    ``int_col`` may be a name or an integer Column expression (e.g.
    exact cents ``round(price·100)`` — the caller owns the
    exact-integer conversion). The leading digit comes from the
    INTEGER's decimal string (``substring(cast(v as string), 1, 1)``)
    — integer-to-string is exact and engine-identical, where a
    log10/power extraction on doubles can misround at decade
    boundaries. Exactness: ``observed``/``n`` are exact BIGINTs (the
    hash anchors); ``expected_p``/``observed_p``/``chi2_term`` are
    identical few-op double expressions over them, rounded.

    Plan: one scan → 9-key hash aggregate (map-side combine) →
    right-join onto the broadcast 9-row digit grid. Scale-free."""
    c = F.col(int_col) if isinstance(int_col, str) else int_col
    v = c.cast("long")
    spark = df.sparkSession
    counts = (
        df.select(v.alias("v"))
        .filter(F.col("v").isNotNull() & (F.col("v") > 0))
        .select(
            F.substring(F.col("v").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("observed"))
    )
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    tot = counts.agg(
        F.coalesce(F.sum("observed"), F.lit(0)).cast("long").alias("n")
    )
    j = (
        grid.join(counts, "digit", "left")
        .withColumn("observed", F.coalesce("observed", F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(tot))
    )
    exp_p = F.log10(1 + 1 / F.col("digit").cast("double"))
    exp_n = F.col("n").cast("double") * exp_p
    dev = F.col("observed").cast("double") - exp_n
    return j.select(
        "digit",
        "observed",
        "n",
        F.round(exp_p, round_dp).alias("expected_p"),
        F.when(
            F.col("n") > 0,
            F.round(
                F.col("observed").cast("double") / F.col("n").cast("double"),
                round_dp,
            ),
        ).alias("observed_p"),
        F.when(F.col("n") > 0, F.round(dev * dev / exp_n, 4)).alias(
            "chi2_term"
        ),
    )


def fk_integrity_audit(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    round_dp: int = 6,
) -> DataFrame:
    """1-row ``(n_child, n_child_keys, n_parent_keys, n_orphan_rows,
    n_orphan_keys, orphan_ratio, max_fanout, avg_fanout)`` — the
    referential-integrity audit a pipeline runs before trusting a join:
    how many child rows point at a key absent from the parent
    (orphans — each one silently drops in an inner join), and how the
    matched keys fan out (``max_fanout`` is the join-explosion /
    skew-hot-key bound, ``avg_fanout`` the expected blowup). NULL child
    keys count as orphan rows (they match nothing in an inner join —
    the failure mode being audited).

    Exactness: every count is an exact BIGINT (the hash anchors);
    ``orphan_ratio = n_orphan_rows/n_child`` and ``avg_fanout`` are
    single divisions off exact integers, rounded. Plan: one child
    groupBy(key) count (map-side combine), one keyed left join against
    the DISTINCT parent keys (|keys|-sized, not |parent|-sized), two
    1-row reduces — never a row-level child×parent join."""
    ck = F.col(child_key)
    kids = child.groupBy(ck.alias("k")).agg(
        F.count("*").cast("long").alias("c")
    )
    pk = parent.select(F.col(parent_key).alias("k")).filter(
        F.col("k").isNotNull()
    ).distinct()
    n_parent = pk.count()
    j = kids.join(pk.withColumn("hit", F.lit(1)), "k", "left")
    agg = j.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_child"),
        F.count("*").cast("long").alias("n_child_keys"),
        F.coalesce(
            F.sum(F.when(F.col("hit").isNull() | F.col("k").isNull(), F.col("c"))),
            F.lit(0),
        ).cast("long").alias("n_orphan_rows"),
        F.coalesce(
            F.sum(
                F.when(F.col("hit").isNull() | F.col("k").isNull(), 1)
            ),
            F.lit(0),
        ).cast("long").alias("n_orphan_keys"),
        F.max(F.when(F.col("hit").isNotNull(), F.col("c"))).cast("long").alias(
            "max_fanout"
        ),
        F.coalesce(
            F.sum(F.when(F.col("hit").isNotNull(), F.col("c"))), F.lit(0)
        ).cast("long").alias("_matched_rows"),
        F.coalesce(
            F.sum(F.when(F.col("hit").isNotNull(), 1)), F.lit(0)
        ).cast("long").alias("_matched_keys"),
    )
    return agg.select(
        "n_child",
        "n_child_keys",
        F.lit(n_parent).cast("long").alias("n_parent_keys"),
        "n_orphan_rows",
        "n_orphan_keys",
        F.when(
            F.col("n_child") > 0,
            F.round(
                F.col("n_orphan_rows").cast("double")
                / F.col("n_child").cast("double"),
                round_dp,
            ),
        ).alias("orphan_ratio"),
        "max_fanout",
        F.when(
            F.col("_matched_keys") > 0,
            F.round(
                F.col("_matched_rows").cast("double")
                / F.col("_matched_keys").cast("double"),
                4,
            ),
        ).alias("avg_fanout"),
    )


def two_proportion_ztest(
    df: DataFrame,
    success_flag,
    group_flag,
    round_dp: int = 6,
) -> DataFrame:
    """1-row ``(n_1, n_2, s_1, s_2, p_1, p_2, z)`` — the two-proportion
    z-test (pooled standard error): did cohort 1 convert at a different
    RATE than cohort 2 — the binary-outcome member of the two-sample
    family (``welch_ttest`` for means, ``mann_whitney_u`` for ranks,
    this for rates; the A/B-test workhorse).
    ``z = (p₁ − p₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂))`` with p̂ the pooled
    rate. ``success_flag``/``group_flag`` are boolean Columns; rows
    where either is NULL drop. NULL z when a cohort is empty or the
    pooled rate is degenerate (p̂ ∈ {0, 1}).

    Exactness: n/s counts are exact BIGINTs (the hash anchors);
    p₁/p₂/z are identical few-op double expressions over them,
    rounded. ONE conditional-aggregation scan — no join."""
    s = success_flag.cast("long")
    g = group_flag.cast("long")
    d = df.filter(success_flag.isNotNull() & group_flag.isNotNull())
    agg = d.agg(
        F.sum(g).cast("long").alias("n_1"),
        F.sum(1 - g).cast("long").alias("n_2"),
        F.sum(s * g).cast("long").alias("s_1"),
        F.sum(s * (1 - g)).cast("long").alias("s_2"),
    )
    n1, n2 = F.col("n_1").cast("double"), F.col("n_2").cast("double")
    s1, s2 = F.col("s_1").cast("double"), F.col("s_2").cast("double")
    p1, p2 = s1 / n1, s2 / n2
    pp = (s1 + s2) / (n1 + n2)
    se2 = pp * (1 - pp) * (1 / n1 + 1 / n2)
    ok = (F.col("n_1") > 0) & (F.col("n_2") > 0) & (se2 > 0)
    return agg.select(
        "n_1",
        "n_2",
        "s_1",
        "s_2",
        F.when(F.col("n_1") > 0, F.round(p1, round_dp)).alias("p_1"),
        F.when(F.col("n_2") > 0, F.round(p2, round_dp)).alias("p_2"),
        F.when(ok, F.round((p1 - p2) / F.sqrt(se2), round_dp)).alias("z"),
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: list[float] = (0.25, 0.5, 0.75),
    n_range_partitions: int | None = None,
) -> DataFrame:
    """``(q, total_weight, value)`` — exact weighted quantiles by the
    nearest-rank (type-1) definition: the smallest value v whose
    cumulative weight reaches ``q·W`` — e.g. the quantity-weighted
    median price ("half the UNITS shipped cost less than this"), which
    an unweighted median gets wrong whenever line sizes vary. Weights
    must be non-negative; NULL values/weights drop; with unit weights
    this is the exact k-th order statistic.

    Exactness: weights aggregate per distinct value (exact BIGINTs for
    integer weights — the fixture class), the cumulative ride the
    shared prefix-sum engine (:func:`range_prefix_sums`, no global
    single-task window), and the threshold test ``cum_w ≥ q·W`` uses
    one multiplication per q — the selected ``value`` is a raw data
    value, hash-exact. ALL |qs| quantiles resolve in ONE conditional-min
    aggregate over the grid (``min(v) filter (cum_w ≥ q·W)`` per q,
    inlined back to |qs| rows) — r14 optimization: the previous
    union-of-filtered-aggregates shape re-scanned the cumulative grid
    (window + broadcast join lineage) once per quantile; identical
    values, one scan, output |qs| rows regardless of scale."""
    g = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
        )
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
    )
    cum, totals = range_prefix_sums(g, "v", ["w"], n_range_partitions)
    w_total = totals.get("w", 0)
    spark = df.sparkSession
    if w_total == 0:
        return spark.createDataFrame(
            [], "q double, total_weight long, value double"
        )
    agg = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum_w").cast("double")
                    >= F.lit(float(q) * w_total),
                    F.col("v"),
                )
            ).alias(f"_v{i}")
            for i, q in enumerate(qs)
        ]
    )
    return agg.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"),
                        F.lit(w_total).cast("long").alias("total_weight"),
                        F.col(f"_v{i}").cast("double").alias("value"),
                    )
                    for i, q in enumerate(qs)
                ]
            )
        )
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 256,
    n_range_partitions: int | None = None,
) -> DataFrame:
    """Input rows + ``(qbin, v_norm)`` — bucketed quantile
    normalization (the batch-effect corrector of Bolstad et al. 2003,
    in its scale-honest bucketed form): each value maps to its
    within-group quantile bin ``qbin = ⌈F_g(v)·B⌉`` (exact integer
    arithmetic — ``ceil(n_le·B / n_g)`` off exact BIGINT ranks), then
    to the POOLED distribution's nearest-rank quantile of that bin —
    after which every group shares the pooled marginal distribution up
    to bin resolution, while each group's internal ORDER is preserved.
    The feature-alignment step in front of cross-source model training
    ("source A's prices live on source B's scale"). NULL values pass
    through with NULL v_norm.

    Exactness: per-group ranks and the pooled bin table are all exact
    integers (two prefix-sum passes on the shared engine — no global
    window); ``v_norm`` is a raw pooled data value (nearest-rank, no
    interpolation) — hash-exact. Plan: group grids keyed by (group,
    value) with per-group windows (keyed, parallel — the interevent
    contract), ONE broadcast of the B-row pooled bin table, one
    equi-join back onto the rows. B bounds the broadcast at any data
    scale."""
    v = F.col(value_col)
    gcol = F.col(group_col)
    d = df
    # per-(group, value) counts, per-group cumulative + totals via a
    # per-group window (keyed by group — parallel across groups)
    gg = (
        df.filter(v.isNotNull())
        .groupBy(gcol.alias("_g"), v.alias("_v"))
        .agg(F.count("*").cast("long").alias("_c"))
    )
    wspec = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = gg.select(
        "_g",
        "_v",
        F.sum("_c").over(wspec).alias("_n_le"),
        F.sum("_c").over(Window.partitionBy("_g")).alias("_n_g"),
    )
    # ceil(n_le*B / n_g) in pure integer arithmetic: (a + b - 1) div b
    qbin = F.expr(
        f"cast((_n_le * {n_bins} + _n_g - 1) div _n_g as int)"
    )
    ranked = ranked.select("_g", "_v", qbin.alias("qbin"))
    # pooled nearest-rank quantile per bin: bin k's value is the pooled
    # grid row where the cumulative count first reaches ceil(k*N/B).
    # Instead of a B x |grid| theta-join, each grid row computes the
    # bin range it serves in EXACT integer arithmetic —
    # k in (floor((cum-c)*B/N), floor(cum*B/N)] — and explodes to it;
    # total exploded rows = exactly B across the whole grid.
    pooled = (
        df.filter(v.isNotNull())
        .groupBy(v.alias("_pv"))
        .agg(F.count("*").cast("long").alias("_pc"))
    )
    cum, totals = range_prefix_sums(pooled, "_pv", ["_pc"], n_range_partitions)
    n_total = totals.get("_pc", 0)
    spark = df.sparkSession
    if n_total == 0:
        return df.select(
            "*",
            F.lit(None).cast("int").alias("qbin"),
            F.lit(None).cast("double").alias("v_norm"),
        )
    k_min = F.expr(
        f"((cum__pc - _pc) * {n_bins}) div {n_total} + 1"
    ).cast("int")
    k_max = F.expr(f"(cum__pc * {n_bins}) div {n_total}").cast("int")
    bin_vals = (
        cum.select(
            F.col("_pv"),
            F.when(k_min <= k_max, F.sequence(k_min, k_max))
            .otherwise(F.array().cast("array<int>"))
            .alias("_ks"),
        )
        .select(F.explode("_ks").alias("qbin"), F.col("_pv"))
        .select("qbin", F.col("_pv").cast("double").alias("v_norm"))
    )
    out = (
        d.join(
            ranked,
            (gcol == F.col("_g")) & (v == F.col("_v")),
            "left",
        )
        .drop("_g", "_v")
        .join(F.broadcast(bin_vals), "qbin", "left")
    )
    return out
