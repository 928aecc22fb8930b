"""The GraphFrame facade must run the reference's exact call shapes
(``/root/reference/main.py``) and agree with the native implementations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph import metrics
from sna_pyspark_graphframes_spark.graph.graphframe import GraphFrame


@pytest.fixture(scope="module")
def g(spark):
    # two triangles bridged by one edge + an isolated vertex
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)],
        "src long, dst long",
    )
    vertices = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 8)], "id long, name string"
    )
    return GraphFrame(vertices, edges)


class TestAccessors:
    def test_reference_construction_shape(self, g):
        assert {"src", "dst"} <= set(g.edges.columns)
        assert "id" in g.vertices.columns

    def test_degrees(self, g):
        d = {r.id: r.degree for r in g.degrees.collect()}
        assert d[3] == 3 and d[4] == 3 and d[1] == 2
        assert 7 not in d  # isolated vertex has no incidences
        din = {r.id: r.inDegree for r in g.inDegrees.collect()}
        dout = {r.id: r.outDegree for r in g.outDegrees.collect()}
        assert din[3] == 2 and dout[1] == 2
        assert all(d[k] == din.get(k, 0) + dout.get(k, 0) for k in d)

    def test_triplets_flat_columns(self, g):
        t = g.triplets
        assert {"src", "dst", "src_name", "dst_name"} <= set(t.columns)
        row = t.filter((F.col("src") == 1) & (F.col("dst") == 2)).first()
        assert row.src_name == "v1" and row.dst_name == "v2"


class TestStructuralOps:
    def test_filter_vertices_induces_subgraph(self, g):
        sub = g.filterVertices("id <= 3")
        assert sub.vertices.count() == 3
        got = {(r.src, r.dst) for r in sub.edges.collect()}
        assert got == {(1, 2), (2, 3), (1, 3)}

    def test_filter_edges_keeps_vertices(self, g):
        sub = g.filterEdges("src = 1")
        assert sub.edges.count() == 2
        assert sub.vertices.count() == 7

    def test_drop_isolated_vertices(self, g):
        kept = {r.id for r in g.dropIsolatedVertices().vertices.collect()}
        assert kept == {1, 2, 3, 4, 5, 6}


class TestTraversal:
    def test_find_motif(self, g):
        tri = g.find("(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
        got = {(r.a, r.b, r.c) for r in tri.collect()}
        assert (1, 2, 3) in got and (4, 5, 6) in got

    def test_bfs_predicates(self, g):
        out = g.bfs("name = 'v1'", "id >= 5", maxPathLength=10)
        d = {r.id: r.dist for r in out.collect()}
        assert d[5] == 3 and d[6] == 3

    def test_shortest_paths_map(self, g):
        out = g.shortestPaths(landmarks=[1, 4])
        d = {r.id: dict(r.distances) for r in out.collect()}
        assert d[6][4] == 1 and d[6][1] == 3
        assert d[1][1] == 0


class TestAlgorithms:
    def test_label_propagation_reference_call(self, g):
        labels = g.labelPropagation(maxIter=5)
        assert set(labels.columns) == {"id", "label"}
        assert labels.count() == 6  # vertices with edges

    def test_connected_components_joins_attrs(self, g):
        cc = g.connectedComponents()
        rows = {r.id: r.component for r in cc.collect() if r.component is not None}
        assert len(set(rows.values())) == 1  # bridged → one component

    def test_pagerank_graphx_normalization(self, g):
        pr = g.pageRank(resetProbability=0.15, maxIter=10)
        total = pr.agg(F.sum("pagerank")).first()[0]
        assert total == pytest.approx(6.0, rel=1e-3)  # sums to |V with edges|

    def test_triangle_count_matches_metrics(self, g):
        native = {
            r.id: r.triangles
            for r in metrics.triangles_per_vertex(g.edges).collect()
        }
        compat = {r.id: r["count"] for r in g.triangleCount().collect()}
        assert compat[7] == 0  # isolated vertex present with zero
        for vid, n in native.items():
            assert compat[vid] == n

    def test_aggregate_messages_neighbor_max(self, g):
        out = g.aggregateMessages(
            aggCol={"max_nbr": F.max("msg")},
            sendToDst=F.col("src"),
            sendToSrc=F.col("dst"),
        )
        m = {r.id: r.max_nbr for r in out.collect()}
        assert m[1] == 3 and m[4] == 6

    def test_pregel_min_component(self, g):
        """User-written min-label CC as a Pregel program must agree with
        the native connectedComponents on every edge-touched vertex."""
        from sna_pyspark_graphframes_spark.graph.pregel import Pregel

        out = (
            g.pregel.setMaxIter(10)
            .withVertexColumn(
                "component",
                F.col("id"),
                F.least(
                    F.col("component"),
                    F.coalesce(Pregel.msg(), F.col("component")),
                ),
            )
            .sendMsgToDst(Pregel.src("component"))
            .sendMsgToSrc(Pregel.dst("component"))
            .aggMsgs(F.min(Pregel.msg()))
            .run()
        )
        native = {
            r.id: r.component
            for r in g.connectedComponents().collect()
            if r.component is not None
        }
        got = {r.id: r.component for r in out.collect()}
        for vid, comp in native.items():
            assert got[vid] == comp

    def test_pregel_pagerank_ring_uniform(self, spark):
        """Textbook PageRank as a user Pregel program: on a 2-regular ring
        the uniform vector is the exact fixed point at every superstep."""
        from sna_pyspark_graphframes_spark.graph.graphframe import GraphFrame
        from sna_pyspark_graphframes_spark.graph.pregel import Pregel

        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1), (2, 1), (3, 2), (4, 3), (1, 4)],
            "src long, dst long",
        )
        v = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id long")
        deg = e.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("out_deg")
        )
        pr = (
            GraphFrame(v.join(deg, "id"), e)
            .pregel.setMaxIter(5)
            .withVertexColumn(
                "rank",
                F.lit(0.25),
                F.lit(0.15 / 4)
                + F.lit(0.85) * F.coalesce(Pregel.msg(), F.lit(0.0)),
            )
            .sendMsgToDst(Pregel.src("rank") / Pregel.src("out_deg"))
            .aggMsgs(F.sum(Pregel.msg()))
            .run()
        )
        for r in pr.collect():
            assert r.rank == pytest.approx(0.25, abs=1e-9)

    def test_pregel_null_messages_not_delivered(self, spark):
        """Upstream contract: a null message is a non-send — vertices whose
        only inbound messages are null keep their state untouched."""
        from sna_pyspark_graphframes_spark.graph.graphframe import GraphFrame
        from sna_pyspark_graphframes_spark.graph.pregel import Pregel

        e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        v = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        out = (
            GraphFrame(v, e)
            .pregel.setMaxIter(1)
            .withVertexColumn(
                "seen",
                F.lit(0),
                F.coalesce(Pregel.msg(), F.col("seen")),
            )
            # only vertex 1 sends a real value; everyone else sends null
            .sendMsgToDst(
                F.when(Pregel.src("id") == 1, F.lit(99)).otherwise(F.lit(None))
            )
            .aggMsgs(F.max(Pregel.msg()))
            .run()
        )
        got = {r.id: r.seen for r in out.collect()}
        assert got == {1: 0, 2: 99, 3: 0}


class TestSharedLayout:
    def test_facade_reuses_one_sym_layout(self, spark):
        """connectedComponents then labelPropagation on one GraphFrame
        build the persisted symmetrized layout ONCE and share it (the r8
        family-layout rule surfaced at the facade); unpersist releases
        it."""
        from pyspark.sql import functions as F

        from sna_pyspark_graphframes_spark.graph.graphframe import GraphFrame

        e = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "src long, dst long"
        )
        v = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
        g = GraphFrame(v, e)
        cc = {r.id: r.component for r in g.connectedComponents().collect()}
        layout_after_cc = g._sym_layout
        assert layout_after_cc is not None
        lpa = g.labelPropagation(maxIter=3)
        assert lpa.count() == 5
        assert g._sym_layout is layout_after_cc  # shared, not rebuilt
        assert layout_after_cc.storageLevel.useMemory  # consumers never evict
        assert cc == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
        g.unpersist()
        assert g._sym_layout is None
