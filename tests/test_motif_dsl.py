"""Golden tests for the GraphFrames motif find() DSL and predicate BFS
(the two round-2 API additions closing the GraphFrames surface —
VERDICT.md round 1, Next #7/#8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph import algorithms, build, motifs


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


TRI_PLUS_TAIL = [(1, 2), (2, 3), (1, 3), (3, 4)]
PATH4 = [(1, 2), (2, 3), (3, 4)]


class TestFindDSL:
    def test_single_edge_pattern(self, spark):
        e = edges_df(spark, PATH4)
        rows = {(r.a, r.b) for r in motifs.find(e, "(a)-[]->(b)").collect()}
        assert rows == set(PATH4)

    def test_two_hop_unification(self, spark):
        e = edges_df(spark, PATH4)
        rows = {
            (r.a, r.b, r.c)
            for r in motifs.find(e, "(a)-[]->(b); (b)-[]->(c)").collect()
        }
        assert rows == {(1, 2, 3), (2, 3, 4)}

    def test_triangle_closure(self, spark):
        e = edges_df(spark, TRI_PLUS_TAIL)
        rows = {
            (r.a, r.b, r.c)
            for r in motifs.find(
                e, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)"
            ).collect()
        }
        assert rows == {(1, 2, 3)}

    def test_negation_open_wedge(self, spark):
        e = edges_df(spark, TRI_PLUS_TAIL)
        # wedges through the directed 2-hop with NO closing edge: only
        # 2->3->4 survives (1->2->3 closes via (1,3))
        rows = {
            (r.a, r.b, r.c)
            for r in motifs.find(
                e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)"
            ).collect()
        }
        assert rows == {(2, 3, 4), (1, 3, 4)}

    def test_named_edge_struct(self, spark):
        e = edges_df(spark, PATH4)
        out = motifs.find(e, "(a)-[e]->(b)")
        assert out.columns == ["a", "e", "b"]
        row = out.filter(F.col("a") == 1).collect()[0]
        assert (row.e.src, row.e.dst) == (1, 2)

    def test_anonymous_vertex_not_output(self, spark):
        e = edges_df(spark, PATH4)
        out = motifs.find(e, "(a)-[]->(); (a)-[]->(b)")
        assert out.columns == ["a", "b"]

    def test_anonymous_vertices_do_not_unify(self, spark):
        e = edges_df(spark, PATH4)
        # each () is fresh: counts all (edge, edge) pairs sharing src a —
        # for PATH4 every a has out-degree 1, so 1 pair each
        n = motifs.find(e, "(a)-[]->(); (a)-[]->()").count()
        assert n == 3

    def test_parse_errors(self, spark):
        e = edges_df(spark, PATH4)
        with pytest.raises(ValueError):
            motifs.find(e, "(a)-[]-(b)")  # undirected arrow unsupported
        with pytest.raises(ValueError):
            motifs.find(e, "!(a)-[x]->(b)")  # negated edge must be unnamed
        with pytest.raises(ValueError):
            motifs.find(e, "!(a)-[]->(b)")  # negation-only pattern
        with pytest.raises(ValueError):
            motifs.find(e, "(a)-[]->(a)")  # self-loop term

    def test_fixed_motifs_match_dsl_routing(self, spark):
        """triangles()/wedges()/four_cycles() are routed through find() —
        canonical counts on the two-clique fixture stay the hand-computed
        values (4-clique: 4 triangles, K4 has 3 four-cycles)."""
        k4 = edges_df(spark, [(a, b) for a in range(1, 5) for b in range(a + 1, 5)])
        assert motifs.triangles(k4).count() == 4
        assert motifs.four_cycles(k4).count() == 3
        assert motifs.wedges(k4, open_only=True).count() == 0
        assert motifs.wedges(k4, open_only=False).count() == 12


class TestPredicateBFS:
    def _verts(self, spark, attrs):
        return spark.createDataFrame(list(attrs), "id long, size int")

    def test_path_distance(self, spark):
        e = edges_df(spark, PATH4)
        v = self._verts(spark, [(1, 0), (2, 5), (3, 5), (4, 9)])
        out = {
            r.id: r.dist
            for r in algorithms.bfs(e, v, "size = 0", "size >= 5").collect()
        }
        assert out == {2: 1, 3: 2, 4: 3}

    def test_set_source_takes_min_distance(self, spark):
        e = edges_df(spark, PATH4)
        v = self._verts(spark, [(1, 0), (2, 5), (3, 5), (4, 0)])
        # sources at both ends: distances collapse to the nearer end
        out = {
            r.id: r.dist
            for r in algorithms.bfs(e, v, "size = 0", "size = 5").collect()
        }
        assert out == {2: 1, 3: 1}

    def test_edge_filter_blocks_path(self, spark):
        e = edges_df(spark, PATH4)
        v = self._verts(spark, [(1, 0), (2, 5), (3, 5), (4, 9)])
        out = {
            r.id: r.dist
            for r in algorithms.bfs(
                e, v, "size = 0", "size >= 5",
                edge_filter=F.col("dst") != 3,
            ).collect()
        }
        assert out == {2: 1}  # edge (2,3) removed → 3,4 unreachable

    def test_max_path_length_truncates(self, spark):
        e = edges_df(spark, PATH4)
        v = self._verts(spark, [(1, 0), (2, 5), (3, 5), (4, 9)])
        out = {
            r.id: r.dist
            for r in algorithms.bfs(
                e, v, "size = 0", "size >= 5", max_path_length=1
            ).collect()
        }
        assert out == {2: 1}

    def test_source_matching_target_is_distance_zero(self, spark):
        e = edges_df(spark, PATH4)
        v = self._verts(spark, [(1, 7), (2, 5), (3, 5), (4, 9)])
        out = {
            r.id: r.dist
            for r in algorithms.bfs(e, v, "size = 7", "size >= 7").collect()
        }
        assert out == {1: 0, 4: 3}  # source matches toExpr at dist 0; 4 too


class TestFourCliques:
    def test_counts_on_cliques(self, spark):
        from sna_pyspark_graphframes_spark.graph import motifs

        k5 = edges_df(spark, [(a, b) for a in range(1, 6) for b in range(a + 1, 6)])
        assert motifs.four_cliques(k5).count() == 5  # C(5,4)
        k4 = edges_df(spark, [(a, b) for a in range(1, 5) for b in range(a + 1, 5)])
        rows = motifs.four_cliques(k4).collect()
        assert [(r.a, r.b, r.c, r.d) for r in rows] == [(1, 2, 3, 4)]

    def test_k4_minus_edge_has_none(self, spark):
        from sna_pyspark_graphframes_spark.graph import motifs

        e = edges_df(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)])  # no 3-4
        assert motifs.four_cliques(e).count() == 0
