"""GraphFrames-compatible facade: the migration surface for reference users.

The reference drives everything through the GraphFrames API
(``/root/reference/main.py:8`` ``from graphframes import GraphFrame``;
``main.py:40`` ``GraphFrame(new_vertices, new_edges)``; ``main.py:161``
``graph.labelPropagation(maxIter)``). This module exposes that exact
camelCase API on top of the native DataFrame implementations in
``graph/*``, so reference code ports by changing one import line:

    from sna_pyspark_graphframes_spark.graph.graphframe import GraphFrame

Differences from upstream GraphFrames, all deliberate:
  * No Scala/JVM package dependency — every method is the pure-DataFrame
    algorithm from this repo, so plans stay visible to Catalyst and AQE.
  * ``pageRank``/``labelPropagation``/``connectedComponents`` return a
    plain DataFrame of vertex results (upstream wraps them back into a
    GraphFrame; callers in practice immediately take ``.vertices``).
  * ``bfs`` returns ``(id, dist)`` shortest hop distances to the matched
    targets, not materialized path rows (path materialization is
    ``motifs.find`` composition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph import (
    algorithms,
    messages,
    metrics,
    motifs,
)
from sna_pyspark_graphframes_spark.graph.core import Graph


class GraphFrame:
    """Drop-in for ``graphframes.GraphFrame(v, e)``.

    ``v``: DataFrame with column ``id`` (+ attributes).
    ``e``: DataFrame with columns ``src``, ``dst`` (+ attributes).
    """

    def __init__(self, v: DataFrame, e: DataFrame) -> None:
        self._g = Graph(vertices=v, edges=e)
        self._sym_layout: DataFrame | None = None

    def _shared_sym_layout(self) -> DataFrame:
        """One persisted src-partitioned symmetrized edge layout per
        GraphFrame, built lazily on first undirected-algorithm call and
        shared by every later one (the r8 family-layout rule: a
        deployment holds one graph layout, not one per query). Only the
        UNDIRECTED algorithms (connectedComponents, labelPropagation)
        consume it — pageRank/PPR keep GraphFrames' directed semantics
        and stay off it. ``unpersist()`` releases it with the rest of
        the graph's caches."""
        from sna_pyspark_graphframes_spark.graph.build import symmetrize

        if self._sym_layout is None:
            self._sym_layout = algorithms._edges_partitioned(
                symmetrize(
                    self._g.edges.select("src", "dst"), dedup=False
                ),
                "src",
            )
        return self._sym_layout

    # -- data accessors ----------------------------------------------------

    @property
    def vertices(self) -> DataFrame:
        return self._g.vertices

    @property
    def edges(self) -> DataFrame:
        return self._g.edges

    @property
    def triplets(self) -> DataFrame:
        """Edge rows joined with endpoint attributes (``src_*`` / ``dst_*``
        prefixed — upstream nests structs; flat columns keep every
        downstream expression codegen-able)."""
        return messages.triplets(self._g.edges, self._g.vertices)

    # -- degree views (directed multiplicities, GraphFrames semantics) -----

    @property
    def inDegrees(self) -> DataFrame:  # noqa: N802 (GraphFrames casing)
        return self._g.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").cast("int").alias("inDegree")
        )

    @property
    def outDegrees(self) -> DataFrame:  # noqa: N802
        return self._g.edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").cast("int").alias("outDegree")
        )

    @property
    def degrees(self) -> DataFrame:
        """in + out edge incidences per vertex (one union + one aggregate —
        upstream's semantics, including double-counting self-loops)."""
        ends = self._g.edges.select(F.col("src").alias("id")).unionAll(
            self._g.edges.select(F.col("dst").alias("id"))
        )
        return ends.groupBy("id").agg(F.count("*").cast("int").alias("degree"))

    # -- structural ops ----------------------------------------------------

    def filterVertices(self, condition) -> "GraphFrame":  # noqa: N802
        """Keep vertices passing ``condition``; drop edges losing an
        endpoint (two semi-joins — the induced-subgraph plan)."""
        v = self._g.vertices.filter(condition)
        ids = v.select("id")
        e = (
            self._g.edges.join(
                ids.withColumnRenamed("id", "src"), "src", "left_semi"
            ).join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        return GraphFrame(v, e)

    def filterEdges(self, condition) -> "GraphFrame":  # noqa: N802
        """Keep edges passing ``condition``; the vertex set is unchanged
        (upstream semantics — isolated vertices remain until
        ``dropIsolatedVertices``)."""
        return GraphFrame(self._g.vertices, self._g.edges.filter(condition))

    def dropIsolatedVertices(self) -> "GraphFrame":  # noqa: N802
        """Remove vertices with no remaining edge (semi-join against the
        endpoint-id union)."""
        ends = (
            self._g.edges.select(F.col("src").alias("id"))
            .unionAll(self._g.edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        return GraphFrame(
            self._g.vertices.join(ends, "id", "left_semi"), self._g.edges
        )

    # -- pattern / traversal -----------------------------------------------

    def find(self, pattern: str) -> DataFrame:
        """Motif search, GraphFrames pattern language
        (``"(a)-[e]->(b); !(b)-[]->(a)"``) — see ``motifs.find``."""
        return motifs.find(self._g.edges, pattern)

    def bfs(
        self,
        fromExpr,  # noqa: N803
        toExpr,  # noqa: N803
        edgeFilter=None,  # noqa: N803
        maxPathLength: int = 10,  # noqa: N803
    ) -> DataFrame:
        return algorithms.bfs(
            self._g.edges,
            self._g.vertices,
            fromExpr,
            toExpr,
            edge_filter=edgeFilter,
            max_path_length=maxPathLength,
            directed=True,
        )

    def shortestPaths(self, landmarks: list) -> DataFrame:  # noqa: N802
        """``(id, distances)`` with ``distances`` a landmark→hops map —
        upstream's result shape, built by pivoting the multi-source BFS
        long table through ``map_from_entries`` (one aggregate)."""
        spark = self._g.vertices.sparkSession
        lm = spark.createDataFrame([(int(x),) for x in landmarks], "id long")
        long = algorithms.multi_source_bfs(self._g.edges, lm)
        return long.groupBy("id").agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("landmark", "dist")))
            ).alias("distances")
        )

    # -- algorithms --------------------------------------------------------

    def connectedComponents(self, **kw) -> DataFrame:  # noqa: N802
        """Vertex attributes + ``component`` (min vertex id in component —
        upstream also labels by a member id)."""
        kw.setdefault("sym_layout", self._shared_sym_layout())
        cc = algorithms.connected_components(self._g.edges, **kw)
        return self._g.vertices.join(cc, "id", "left")

    def stronglyConnectedComponents(self, maxIter: int = 20) -> DataFrame:  # noqa: N802,N803
        return algorithms.strongly_connected_components(
            self._g.edges, max_iter=maxIter
        )

    def labelPropagation(self, maxIter: int = 5) -> DataFrame:  # noqa: N802,N803
        """The reference's community-detection call
        (``/root/reference/main.py:161``): ``(id, label)``."""
        return algorithms.label_propagation(
            self._g.edges,
            max_iter=maxIter,
            sym_layout=self._shared_sym_layout(),
        )

    def pageRank(  # noqa: N802
        self,
        resetProbability: float = 0.15,  # noqa: N803
        maxIter: int = 15,  # noqa: N803
    ) -> DataFrame:
        """``(id, pagerank)`` scaled to sum to |V| (GraphX/GraphFrames
        normalization; the native ``algorithms.pagerank`` returns the
        probability form summing to 1)."""
        pr = algorithms.pagerank(
            self._g.edges,
            damping=1.0 - resetProbability,
            max_iter=maxIter,
            directed=True,
        )
        # scale by the ranked-vertex count (vertices with edges — the graph
        # pagerank actually ran on), not the raw vertex table size
        n = pr.select(F.count("*").alias("n"))
        return pr.crossJoin(F.broadcast(n)).select(
            "id", (F.col("pagerank") * F.col("n")).alias("pagerank")
        )

    def parallelPersonalizedPageRank(  # noqa: N802
        self,
        resetProbability: float = 0.15,  # noqa: N803
        sourceIds: list | None = None,  # noqa: N803
        maxIter: int = 20,  # noqa: N803
    ) -> DataFrame:
        return algorithms.personalized_pagerank(
            self._g.edges,
            sources=[int(x) for x in (sourceIds or [])],
            damping=1.0 - resetProbability,
            max_iter=maxIter,
            directed=True,
        )

    def triangleCount(self) -> DataFrame:  # noqa: N802
        """``(id, count)`` triangles through each vertex, zeros included
        (upstream returns every vertex)."""
        tri = metrics.triangles_per_vertex(self._g.edges)
        return (
            self._g.vertices.select("id")
            .join(tri, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("count"),
            )
        )

    def aggregateMessages(  # noqa: N802
        self,
        aggCol: dict[str, Column],  # noqa: N803
        sendToSrc: Column | None = None,  # noqa: N803
        sendToDst: Column | None = None,  # noqa: N803
    ) -> DataFrame:
        """Message expressions see the flat triplet columns (``src_<attr>``,
        ``dst_<attr>``, edge attrs) instead of upstream's
        ``AggregateMessages.src["attr"]`` accessors."""
        return messages.aggregate_messages(
            self._g.edges,
            self._g.vertices,
            agg=aggCol,
            to_src=sendToSrc,
            to_dst=sendToDst,
        )

    @property
    def pregel(self):
        """Pregel builder (= upstream ``g.pregel``): fluent
        ``withVertexColumn / sendMsgToDst / sendMsgToSrc / aggMsgs /
        setMaxIter / run`` message-passing programs — see
        ``graph/pregel.py``."""
        from sna_pyspark_graphframes_spark.graph.pregel import Pregel

        return Pregel(self._g.vertices, self._g.edges)

    # -- lifecycle ---------------------------------------------------------

    def cache(self) -> "GraphFrame":
        self._g.cache()
        return self

    def persist(self, *_, **__) -> "GraphFrame":
        return self.cache()

    def unpersist(self) -> "GraphFrame":
        self._g.unpersist()
        if self._sym_layout is not None:
            self._sym_layout.unpersist()
            self._sym_layout = None
        return self
