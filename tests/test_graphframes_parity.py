"""Dev-only parity smoke vs. GraphFrames (SURVEY.md §5.2 #4).

GraphFrames is NOT a runtime dependency of this engine (SURVEY.md §7.0) and
is not installed in this container — the test skips cleanly. On a dev
machine with the jar+package available it compares our DataFrame LPA and
connected components against the GraphFrames implementations on a small
fixture (community structure, not exact labels: GraphX tie-breaking is
placement-dependent).
"""

from __future__ import annotations

import pytest

graphframes = pytest.importorskip("graphframes")

from pyspark.sql import functions as F  # noqa: E402

from sna_pyspark_graphframes_spark.graph import algorithms  # noqa: E402


def test_cc_matches_graphframes(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "src long, dst long"
    )
    vertices = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    g = graphframes.GraphFrame(vertices, edges)
    spark.sparkContext.setCheckpointDir("/tmp/gf_ckpt")
    theirs = {
        r.id: r.component for r in g.connectedComponents().collect()
    }
    ours = {
        r.id: r.component
        for r in algorithms.connected_components(edges).collect()
    }
    # same partition structure (component ids may differ)
    def groups(m):
        inv = {}
        for k, v in m.items():
            inv.setdefault(v, set()).add(k)
        return sorted(map(frozenset, inv.values()), key=min)

    assert groups(theirs) == groups(ours)
