"""Motif finding — GraphFrames ``g.find(...)`` pattern language compiled to
Catalyst join plans (the reference's library exposes motif search; users
switching engines keep the pattern-string API).

``find(edges, pattern)`` parses the GraphFrames motif mini-language:

    "(a)-[e]->(b); (b)-[]->(c); !(a)-[]->(c)"

  * ``(name)`` — a named vertex; the same name unifies across terms
    (equi-join). ``()`` is anonymous: matches fresh per term, not output.
  * ``[name]`` — a named edge; emitted as a struct column ``name(src, dst)``.
    ``[]`` is anonymous.
  * ``!`` — negated term: no such edge may exist (anti-join). Negated terms
    must not name the edge and both endpoints must be bound by positive
    terms (GraphFrames' own restrictions).

Output columns are the named vertices (vertex ids) and named edges in
first-appearance order. Divergence from GraphFrames (documented): vertex
columns are bare ids, not attribute structs — join vertex attributes after
the match (attributes live in separate tables here, not on the graph).

Each positive term is one equi-join on the shared vertex names; negations
are anti-joins applied after all positives — exactly the plan GraphFrames
generates, so Catalyst reorders/broadcasts freely. The fixed canonical
motifs below (triangles / wedges / 4-cycles) are expressed THROUGH the DSL
with canonicalizing filters, so results stay deterministic and oracle-able.

Scale: a chain of equi-joins on vertex keys — the same shuffle shape as
triangle counting; degree-ordered orientation (see
``metrics.triangles_per_vertex``) applies when hubs dominate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.graph.build import symmetrize

_TERM = re.compile(
    r"^\s*(?P<neg>!?)\s*\(\s*(?P<src>[A-Za-z_]\w*)?\s*\)\s*"
    r"-\s*\[\s*(?P<edge>[A-Za-z_]\w*)?\s*\]\s*->\s*"
    r"\(\s*(?P<dst>[A-Za-z_]\w*)?\s*\)\s*$"
)


def _parse(pattern: str):
    terms = []
    for raw in pattern.split(";"):
        if not raw.strip():
            continue
        m = _TERM.match(raw)
        if m is None:
            raise ValueError(f"unparseable motif term: {raw!r}")
        neg = bool(m.group("neg"))
        if neg and m.group("edge"):
            raise ValueError(f"negated term must not name its edge: {raw!r}")
        terms.append((neg, m.group("src"), m.group("edge"), m.group("dst")))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find(edges: DataFrame, pattern: str) -> DataFrame:
    """Match ``pattern`` against the directed edge set ``(src, dst)``.

    For undirected semantics pass ``build.symmetrize(edges)`` (every edge in
    both directions), as GraphFrames users do by unioning reversed edges.
    """
    e = edges.select("src", "dst")
    terms = _parse(pattern)

    out_cols: list[str] = []  # named vertices + edges, first-appearance order
    bound: set[str] = set()
    result: DataFrame | None = None
    anon = 0

    for neg, vsrc, ename, vdst in terms:
        if neg:
            continue  # applied after all positive terms
        if vsrc is None:
            vsrc, anon = f"__anon{anon}", anon + 1
        if vdst is None:
            vdst, anon = f"__anon{anon}", anon + 1
        if vsrc == vdst:
            raise ValueError("self-loop terms (a)-[]->(a) are not supported")
        term_df = e.select(F.col("src").alias(vsrc), F.col("dst").alias(vdst))
        if ename is not None:
            term_df = term_df.withColumn(
                ename, F.struct(F.col(vsrc).alias("src"), F.col(vdst).alias("dst"))
            )
        # GraphFrames column order: src vertex, edge, dst vertex
        for name in (vsrc, *((ename,) if ename else ()), vdst):
            if not name.startswith("__anon") and name not in out_cols:
                out_cols.append(name)
        if result is None:
            result = term_df
        else:
            keys = [v for v in (vsrc, vdst) if v in bound]
            # no shared vertex → genuine pattern cross product (rare, allowed)
            result = result.join(term_df, keys) if keys else result.crossJoin(term_df)
        bound |= {vsrc, vdst}

    if result is None:
        raise ValueError("pattern has no positive terms")

    for neg, vsrc, _, vdst in terms:
        if not neg:
            continue
        if vsrc is None or vdst is None or not {vsrc, vdst} <= bound:
            raise ValueError("negated terms need both endpoints bound by positive terms")
        anti = e.select(F.col("src").alias(vsrc), F.col("dst").alias(vdst))
        result = result.join(anti, [vsrc, vdst], "left_anti")

    return result.select(*out_cols)


# ---------------------------------------------------------------------------
# Canonical fixed motifs (each instance exactly once) — DSL + canonicalizer
# ---------------------------------------------------------------------------

def triangles(edges: DataFrame) -> DataFrame:
    """All triangles ``(a, b, c)`` with a < b < c, each exactly once.

    Canonical edges (src < dst) are already oriented, so the plain directed
    pattern enumerates each triangle once with a < b < c by construction.
    """
    return find(edges, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")


def wedges(edges: DataFrame, open_only: bool = True) -> DataFrame:
    """Wedges (paths a–b–c through center b) with a < c, each exactly once:
    ``(a, b, c)``. ``open_only`` drops closed wedges (triangle corners) via
    the GraphFrames negated-edge term."""
    sym = symmetrize(edges, dedup=True)
    pattern = "(b)-[]->(a); (b)-[]->(c)"
    if open_only:
        pattern += "; !(a)-[]->(c)"  # sym holds both directions; a<c picks one
    return (
        find(sym, pattern)
        .filter(F.col("a") < F.col("c"))
        .select("a", "b", "c")
    )


def four_cycles(edges: DataFrame) -> DataFrame:
    """Chordless-or-not 4-cycles ``(a, b, c, d)``, canonical: a is the
    smallest corner, and its two neighbors in the cycle are ordered
    (b < d) — each cycle exactly once. Plan: two wedge-joins meeting at the
    opposite corner c."""
    sym = symmetrize(edges, dedup=True)
    cyc = find(sym, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(d); (d)-[]->(c)")
    return (
        cyc.filter(
            (F.col("b") < F.col("d"))  # orient the two paths
            & (F.col("a") < F.col("b"))
            & (F.col("a") < F.col("c"))
            & (F.col("a") < F.col("d"))  # a = smallest corner
            & (F.col("c") != F.col("a"))
            & (F.col("b") != F.col("c"))
        )
        .select("a", "b", "c", "d")
    )


def four_cliques(edges: DataFrame) -> DataFrame:
    """All 4-cliques ``(a, b, c, d)`` with a < b < c < d, each exactly
    once: the 6-edge pattern on CANONICAL edges (src < dst) — orientation
    makes every clique match in exactly one vertex order, so no
    post-filter dedup. Plan: five equi-joins over the edge list, each
    bounded by the (degree-ordered) edge table — the standard k-clique
    listing join tree for k=4."""
    return find(
        edges,
        "(a)-[]->(b); (a)-[]->(c); (a)-[]->(d); "
        "(b)-[]->(c); (b)-[]->(d); (c)-[]->(d)",
    )
