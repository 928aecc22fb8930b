"""Salting and bucketing change the physical plan only — every operator
in operators/scale.py must be value-identical to its plain counterpart."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.operators import scale


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: 'a' holds 90% of rows
    rows = [("a" if i % 10 else "b", i, float(i % 7)) for i in range(1000)]
    return spark.createDataFrame(rows, "k string, uid long, v double")


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


class TestSaltedAgg:
    def test_matches_plain_groupby(self, skewed):
        plain = skewed.groupBy("k").agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        salted = scale.salted_agg(
            skewed,
            keys=["k"],
            aggs={
                "n": ("count", "*"),
                "s": ("sum", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            salt_src=["uid"],
            buckets=8,
        )
        assert _sorted(plain) == _sorted(salted)

    def test_count_column_skips_nulls(self, spark):
        df = spark.createDataFrame(
            [("x", 1, 1.0), ("x", 2, None), ("x", 3, 3.0)], "k string, uid long, v double"
        )
        out = scale.salted_agg(
            df, ["k"], {"nv": ("count", "v")}, salt_src=["uid"], buckets=4
        ).collect()
        assert out[0].nv == 2

    def test_rejects_non_algebraic(self, skewed):
        with pytest.raises(ValueError, match="non-algebraic"):
            scale.salted_agg(
                skewed, ["k"], {"m": ("avg", "v")}, salt_src=["uid"]
            )


class TestSaltedJoin:
    def test_matches_plain_inner_join(self, spark, skewed):
        dim = spark.createDataFrame([("a", "alpha"), ("b", "beta")], "k string, name string")
        plain = skewed.join(dim, "k")
        salted = scale.salted_join(skewed, dim, on="k", salt_src=["uid"], buckets=5)
        assert _sorted(plain.select("k", "uid", "name")) == _sorted(
            salted.select("k", "uid", "name")
        )

    def test_left_join_keeps_unmatched(self, spark, skewed):
        dim = spark.createDataFrame([("b", "beta")], "k string, name string")
        out = scale.salted_join(skewed, dim, on="k", salt_src=["uid"], buckets=3, how="left")
        assert out.count() == 1000
        assert out.filter(F.col("name").isNull()).count() == 900

    def test_no_salt_column_leaks(self, spark, skewed):
        dim = spark.createDataFrame([("a", "alpha")], "k string, name string")
        out = scale.salted_join(skewed, dim, on="k", salt_src=["uid"])
        assert "__salt" not in out.columns


class TestBucketed:
    def test_roundtrip_and_colocated_join(self, spark, tmp_path):
        left = spark.range(200).select(F.col("id"), (F.col("id") % 7).alias("v"))
        right = spark.range(0, 400).select(
            (F.col("id") % 200).alias("id"), F.lit(1).alias("w")
        )
        scale.write_bucketed(left, "t_scale_l", str(tmp_path / "l"), "id", buckets=4)
        scale.write_bucketed(right, "t_scale_r", str(tmp_path / "r"), "id", buckets=4)
        j = scale.colocated_join(spark, "t_scale_l", "t_scale_r", "id")
        assert j.count() == 400  # each left id matched twice
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestGiniCoefficient:
    def test_hand_computed(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        # x = [0, 0, 0, 1]: G = (2*4 - 5*1) / (4*1) = 0.75
        df = spark.createDataFrame(
            [(0.0,), (0.0,), (0.0,), (1.0,)], "v double"
        )
        r = relational.gini_coefficient(df, "v").collect()[0]
        assert (r.n, r.total, r.gini) == (4, 1.0, 0.75)

    def test_uniform_is_zero_and_ties_exact(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        df = spark.createDataFrame([(5.0,)] * 8, "v double")
        r = relational.gini_coefficient(df, "v").collect()[0]
        assert r.gini == 0.0 and r.n == 8

    def test_forced_multi_partition_matches_single(self, spark):
        """The prefix-sum engine must give the identical rank sum under
        a forced 7-way range partitioning."""
        import random

        from sna_pyspark_graphframes_spark.operators import relational

        rng = random.Random(7)
        rows = [(float(rng.randint(0, 20)),) for _ in range(200)]
        df = spark.createDataFrame(rows, "v double")
        a = relational.gini_coefficient(df, "v").collect()[0]
        b = relational.gini_coefficient(
            df, "v", n_range_partitions=7
        ).collect()[0]
        assert (a.n, a.total, a.gini) == (b.n, b.total, b.gini)
        # cross-check vs the textbook sorted-rank formula
        xs = sorted(v for (v,) in rows)
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        assert a.gini == round((2 * six - (n + 1) * sx) / (n * sx), 6)

    def test_empty_and_zero_mass_null(self, spark):
        from sna_pyspark_graphframes_spark.operators import relational

        empty = spark.createDataFrame([], "v double")
        r = relational.gini_coefficient(empty, "v").collect()[0]
        assert r.n == 0 and r.gini is None
        zeros = spark.createDataFrame([(0.0,)] * 3, "v double")
        r2 = relational.gini_coefficient(zeros, "v").collect()[0]
        assert r2.n == 3 and r2.gini is None
