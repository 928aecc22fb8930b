"""Invariant + determinism contract for the randomized sampler
(FIXTURES.md §5): these, not exact trajectories, define correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph import build, sampling
from sna_pyspark_graphframes_spark.sources import load_table


def _edges(spark, sf_dir):
    return build.copurchase_edges(load_table(spark, sf_dir, "lineitem"))


def test_fixed_seed_reproducible(spark, sf_dir):
    e = _edges(spark, sf_dir)
    s1 = sampling.sample_graph(e, alpha=2.0, max_iter=3, seed=7)
    s2 = sampling.sample_graph(e, alpha=2.0, max_iter=3, seed=7)
    v1 = sorted(r.id for r in s1.sampled_vertices.collect())
    v2 = sorted(r.id for r in s2.sampled_vertices.collect())
    assert v1 == v2 and len(v1) > 0


def test_reproducible_across_partitioning(spark, sf_dir):
    e = _edges(spark, sf_dir)
    s1 = sampling.sample_graph(e, alpha=2.0, max_iter=3, seed=11)
    s2 = sampling.sample_graph(e.repartition(7), alpha=2.0, max_iter=3, seed=11)
    assert sorted(r.id for r in s1.sampled_vertices.collect()) == sorted(
        r.id for r in s2.sampled_vertices.collect()
    )


def test_sampled_vertices_within_communities(spark, sf_dir):
    e = _edges(spark, sf_dir)
    res = sampling.sample_graph(e, alpha=2.0, max_iter=3, seed=42)
    all_ids = {r.id for r in res.labels.select("id").collect()}
    sampled = {r.id for r in res.sampled_vertices.collect()}
    assert sampled <= all_ids


def test_induced_edges_exact(spark, sf_dir):
    e = _edges(spark, sf_dir)
    res = sampling.sample_graph(e, alpha=2.0, max_iter=3, seed=42)
    sym = build.symmetrize(e, dedup=True)
    s = {r.id for r in res.sampled_vertices.collect()}
    expected = {
        (r.src, r.dst) for r in sym.collect() if r.src in s and r.dst in s
    }
    got = {(r.src, r.dst) for r in res.sampled_edges.collect()}
    assert got == expected


def test_walk_respects_community_size(spark, sf_dir):
    e = _edges(spark, sf_dir)
    res = sampling.sample_graph(e, alpha=0.5, max_iter=3, seed=5)
    sizes = res.labels.groupBy("label").agg(F.count("*").alias("n"))
    walks = (
        res.labels.join(
            res.sampled_vertices.withColumn("s", F.lit(1)), "id", "left"
        )
        .groupBy("label")
        .agg(F.sum("s").alias("visited"))
    )
    bad = (
        sizes.join(walks, "label")
        .filter(F.col("visited") > F.col("n"))
        .count()
    )
    assert bad == 0


def test_walk_length_formula():
    assert sampling.walk_length(100, 0.0, 2.0) == 101
    assert sampling.walk_length(100, 0.5, 2.0) == 51
    assert sampling.walk_length(10, 1.0, 5.0) == 2
