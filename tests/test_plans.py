"""Physical-plan regression tests — the 100 TB posture, asserted.

These lock in the plan properties SCALE.md documents: filters/projections
reach the parquet scan, dimension joins broadcast, global top-k is a
TakeOrderedAndProject (not a full sort), aggregates have map-side partials,
linear operators never degrade to cartesian products, and the relational
hot path contains no Python UDF stages."""

from __future__ import annotations

import sna_pyspark_graphframes_spark.registry as R


def _plan(spark, sf_dir, name: str) -> str:
    df = R.REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "scan_project_filter")
    assert "PushedFilters: [IsNotNull" in plan
    assert "GreaterThan(l_quantity,30.0)" in plan
    # column pruning: only the three projected columns in the read schema
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double>" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "revenue_per_nation")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_top_k_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "top10_degree")
    assert "TakeOrderedAndProject" in plan


def test_aggregate_has_partials(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert "partial_sum" in plan


def test_induced_subgraph_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "induced_subgraph_small_parts")
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_embedding_near_dup_no_cartesian(spark, sf_dir):
    """The registered near-dup query must take the LSH-bucketed path —
    candidates come from an equi-join on the bucket key, never a cross
    join (VERDICT.md round 1, What's wrong #3)."""
    plan = _plan(spark, sf_dir, "embedding_near_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_relational_path_has_no_python_udf(spark, sf_dir):
    for name in ["pricing_summary", "degree", "token_count", "lang_id",
                 "event_tumbling_window", "dedup_exact"]:
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
