"""Pregel message-passing builder — the last GraphFrames API surface
(``org.graphframes.lib.Pregel``, ``g.pregel`` in Python) the facade
lacked. The reference never calls it directly, but ``labelPropagation``
and ``pageRank`` are Pregel programs under GraphFrames, so migrating
users who wrote custom Pregel logic need this entry point.

Semantics match upstream:

  * ``withVertexColumn(name, initialExpr, updateAfterAggMsgsExpr)`` adds
    one state column per call (repeatable); the update expression may
    reference existing vertex columns and ``Pregel.msg()``.
  * ``sendMsgToDst(expr)`` / ``sendMsgToSrc(expr)`` (repeatable) build
    messages from ``Pregel.src(col)`` / ``Pregel.dst(col)`` /
    ``Pregel.edge(col)``; a null message is NOT delivered (upstream
    contract — use it to make sends conditional).
  * ``aggMsgs(aggExpr)`` aggregates all messages delivered to a vertex;
    vertices receiving none see ``Pregel.msg()`` as NULL in the update
    (guard with ``coalesce``).
  * ``run()`` executes ``maxIter`` supersteps and returns the vertex
    DataFrame.

Spark plan per superstep: one triplet join (edges joined with both
endpoint state structs), one union over the registered send expressions,
one keyed aggregate, one state merge join — the exact loop shape of the
native LPA/PageRank/CC implementations in ``algorithms.py``, so the same
scale posture applies (keyed shuffles only, lineage truncated on the
checkpoint cadence, AQE picks broadcast for the |V|-row state side while
it fits). The native algorithms stay the preferred path — they fold
convergence checks and frontiers into the superstep, which a generic
fixed-iteration Pregel cannot; this builder is the user-programmable
escape hatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.plans.iterate import checkpointed

MSG_COL = "_pregel_msg_"


class Pregel:
    """Builder; obtain via ``GraphFrame.pregel``."""

    def __init__(self, vertices: DataFrame, edges: DataFrame) -> None:
        self._v = vertices
        self._e = edges
        self._max_iter = 10
        self._ckpt_interval = 2
        self._cols: list[tuple[str, Column, Column]] = []
        self._to_dst: list[Column] = []
        self._to_src: list[Column] = []
        self._agg: Column | None = None

    # -- message-side column references (static, like upstream) -----------

    @staticmethod
    def msg() -> Column:
        """The aggregated inbound message, for update expressions."""
        return F.col(MSG_COL)

    @staticmethod
    def src(col_name: str) -> Column:
        """Source-vertex attribute, for send expressions."""
        return F.col(f"src.{col_name}")

    @staticmethod
    def dst(col_name: str) -> Column:
        """Destination-vertex attribute, for send expressions."""
        return F.col(f"dst.{col_name}")

    @staticmethod
    def edge(col_name: str) -> Column:
        """Edge attribute, for send expressions."""
        return F.col(f"edge.{col_name}")

    # -- builder methods (fluent, like upstream) ---------------------------

    def setMaxIter(self, n: int) -> "Pregel":  # noqa: N802 (GraphFrames casing)
        self._max_iter = int(n)
        return self

    def setCheckpointInterval(self, n: int) -> "Pregel":  # noqa: N802
        """0 disables intra-loop checkpointing (plans then grow per
        superstep — only sane for tiny maxIter, same caveat as upstream)."""
        self._ckpt_interval = int(n)
        return self

    def withVertexColumn(  # noqa: N802
        self, name: str, initial: Column, update: Column
    ) -> "Pregel":
        self._cols.append((name, initial, update))
        return self

    def sendMsgToDst(self, msg: Column) -> "Pregel":  # noqa: N802
        self._to_dst.append(msg)
        return self

    def sendMsgToSrc(self, msg: Column) -> "Pregel":  # noqa: N802
        self._to_src.append(msg)
        return self

    def aggMsgs(self, agg: Column) -> "Pregel":  # noqa: N802
        self._agg = agg
        return self

    # -- execution ---------------------------------------------------------

    def run(self) -> DataFrame:
        if not self._cols:
            raise ValueError("pregel: withVertexColumn(...) is required")
        if not (self._to_dst or self._to_src):
            raise ValueError("pregel: at least one sendMsgTo{Src,Dst} required")
        if self._agg is None:
            raise ValueError("pregel: aggMsgs(...) is required")
        v = self._v
        for name, initial, _ in self._cols:
            v = v.withColumn(name, initial)
        v = checkpointed(v)
        e = checkpointed(self._e)
        v_cols = v.columns
        e_cols = e.columns
        for it in range(self._max_iter):
            vs = v.select(
                F.col("id").alias("_sid"),
                F.struct(*[F.col(c) for c in v_cols]).alias("src"),
            )
            vd = v.select(
                F.col("id").alias("_did"),
                F.struct(*[F.col(c) for c in v_cols]).alias("dst"),
            )
            triplets = (
                e.select(
                    F.col("src").alias("_esrc"),
                    F.col("dst").alias("_edst"),
                    F.struct(*[F.col(c) for c in e_cols]).alias("edge"),
                )
                .join(vs, F.col("_esrc") == F.col("_sid"))
                .join(vd, F.col("_edst") == F.col("_did"))
            )
            parts = [
                triplets.select(
                    F.col("_edst").alias("id"), m.alias(MSG_COL)
                )
                for m in self._to_dst
            ] + [
                triplets.select(
                    F.col("_esrc").alias("id"), m.alias(MSG_COL)
                )
                for m in self._to_src
            ]
            msgs = parts[0]
            for p in parts[1:]:
                msgs = msgs.unionByName(p)
            # upstream contract: null messages are not delivered
            inbox = (
                msgs.filter(F.col(MSG_COL).isNotNull())
                .groupBy("id")
                .agg(self._agg.alias(MSG_COL))
            )
            updated = v.join(inbox, "id", "left")
            for name, _, update in self._cols:
                updated = updated.withColumn(name, update)
            v = updated.drop(MSG_COL)
            if self._ckpt_interval > 0 and (
                (it + 1) % self._ckpt_interval == 0 or it == self._max_iter - 1
            ):
                v = checkpointed(v)
        return v
