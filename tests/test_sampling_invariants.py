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


def test_split_oversized_triggers_and_certificate_legs_hold(spark, sf_dir):
    """VERDICT r11 Next #6 — the giant-community skew guard EXERCISED,
    not just documented: on this graph LPA emits one giant community,
    so max_community_size=50 forces >= 2 salted sub-labels (the
    registered ``random_walk_sample_capped`` runs the same path with
    cap 500 at sf0.01 -> 4 splits). The certificate legs are asserted
    against the ORIGINAL labels: every parent community keeps >= 1
    sampled vertex (each sub-walk visits its start) and the sample
    stays within the vertex set."""
    e = _edges(spark, sf_dir)
    res_plain = sampling.sample_graph(e, alpha=2.0, max_iter=3, seed=42)
    orig_labels = res_plain.labels
    # the guard itself: sub-label count must exceed the original count
    split = sampling.split_oversized_communities(
        orig_labels.select("id", "label"), max_size=50
    )
    n_orig = orig_labels.select("label").distinct().count()
    n_sub = split.select("label").distinct().count()
    assert n_sub >= n_orig + 1  # >= 2 splits of at least one community
    # end-to-end: capped sampler, coverage vs the ORIGINAL communities
    res = sampling.sample_graph(
        e, alpha=2.0, max_iter=3, seed=42, max_community_size=50
    )
    sampled = {r.id for r in res.sampled_vertices.collect()}
    all_ids = {r.id for r in orig_labels.select("id").collect()}
    assert sampled <= all_ids and len(sampled) > 0
    uncovered = (
        orig_labels.join(
            res.sampled_vertices.withColumn("s", F.lit(1)), "id", "left"
        )
        .groupBy("label")
        .agg(F.max("s").alias("hit"))
        .filter(F.col("hit").isNull())
        .count()
    )
    assert uncovered == 0  # every parent community keeps >= 1 vertex


class TestNode2VecWalks:
    def test_walks_are_edge_valid_and_deterministic(self, spark):
        from sna_pyspark_graphframes_spark.graph.node2vec import node2vec_walks

        pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (2, 4)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        edge_set = {frozenset(p) for p in pairs}
        out1 = {r.walk_id: list(r.path) for r in
                node2vec_walks(e, walk_length=6, p=2.0, q=0.5).collect()}
        out2 = {r.walk_id: list(r.path) for r in
                node2vec_walks(e, walk_length=6, p=2.0, q=0.5).collect()}
        assert out1 == out2  # placement-independent determinism
        for wid, path in out1.items():
            assert path[0] == wid
            for a, b in zip(path, path[1:]):
                assert frozenset((a, b)) in edge_set, (wid, path)

    def test_high_p_avoids_backtracking_except_dead_ends(self, spark):
        from sna_pyspark_graphframes_spark.graph.node2vec import node2vec_walks

        path_g = spark.createDataFrame(
            [(i, i + 1) for i in range(5)], "src long, dst long"
        )
        out = {r.walk_id: list(r.path) for r in
               node2vec_walks(path_g, walk_length=5, p=1e9, q=1.0).collect()}
        for wid, path in out.items():
            for i in range(2, len(path)):
                if path[i] == path[i - 2]:
                    # a return move is only allowed when the walker was at
                    # a degree-1 endpoint (forced)
                    assert path[i - 1] in (0, 5), (wid, path)

    def test_stalled_and_missing_starts_freeze(self, spark):
        from sna_pyspark_graphframes_spark.graph.node2vec import node2vec_walks

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        starts = spark.createDataFrame([(0,), (9,)], "id long")
        out = {r.walk_id: list(r.path) for r in
               node2vec_walks(e, walk_length=4, starts=starts).collect()}
        assert out[9] == [9]
        assert len(out[0]) == 4
