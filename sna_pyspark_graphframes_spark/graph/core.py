"""Property-graph abstraction: a pair of DataFrames.

The reference wraps its two DataFrames in ``GraphFrame(new_vertices,
new_edges)`` (``/root/reference/main.py:40``). We keep exactly that data
model — a property graph IS (vertices_df, edges_df) — but as a plain
dataclass with no Scala dependency, so every algorithm stays in the public
DataFrame API and under Catalyst end-to-end (SURVEY.md §1.1, §7.0).

Conventions:
  * ``vertices``: column ``id`` (long) + arbitrary attribute columns.
  * ``edges``: columns ``src``, ``dst`` (long) + arbitrary attribute columns.
  * Graphs are directed at the storage level; undirected semantics are an
    operation (``build.symmetrize``), not a storage flag — mirrors how the
    reference materializes both directions (``main.py:176-177``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Graph:
    vertices: DataFrame
    edges: DataFrame

    def __post_init__(self) -> None:
        if "id" not in self.vertices.columns:
            raise ValueError("vertices must have an 'id' column")
        missing = {"src", "dst"} - set(self.edges.columns)
        if missing:
            raise ValueError(f"edges missing columns {sorted(missing)}")

    @staticmethod
    def from_edges(edges: DataFrame) -> "Graph":
        """Derive the vertex set from edge endpoints.

        The reference does select/union/distinct twice
        (``/root/reference/main.py:28-31``); a single explode+distinct
        suffices (SURVEY.md §2.5 #4) — explode of [src, dst] evaluates the
        edge subtree once (a union would evaluate it per branch), then one
        hash-aggregate distinct — one shuffle on ``id``.
        """
        vertices = (
            edges.select(F.explode(F.array("src", "dst")).alias("id")).distinct()
        )
        return Graph(vertices=vertices, edges=edges)

    def cache(self) -> "Graph":
        return Graph(self.vertices.cache(), self.edges.cache())

    def unpersist(self) -> "Graph":
        self.vertices.unpersist()
        self.edges.unpersist()
        return self

    def degree_of_validity_check(self) -> int:
        """Count edges whose endpoints are not in the vertex table (should be 0).

        Anti-join keeps it distributed; invariant from SURVEY.md §2.1 #8.
        """
        v = self.vertices.select("id")
        bad_src = self.edges.join(v, self.edges.src == v.id, "left_anti")
        bad_dst = self.edges.join(v, self.edges.dst == v.id, "left_anti")
        return bad_src.count() + bad_dst.count()
