"""Query registry: every implemented operator exposed as a named query
``(spark, sf_dir) -> DataFrame`` with, where SQL-expressible, a DuckDB
oracle SQL twin (SURVEY.md §5.2 #1). ``__spark_entry__`` re-exports this.

Aliasing rule: every computed column is aliased identically in the Spark
plan and the SQL so the driver's sorted-column value hash matches.
Doubles produced by aggregation are rounded on both sides (floating-point
summation order differs between engines).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sna_pyspark_graphframes_spark.sources import load_table, read_edge_list, write_edge_list
from sna_pyspark_graphframes_spark.graph import algorithms, build, metrics, sampling
from sna_pyspark_graphframes_spark.operators import relational


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check (non-SQL-expressible)


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = Query(fn, sql)
        return fn

    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _copurchase(spark, sf_dir):
    return build.copurchase_edges(_t(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# SQL building blocks (DuckDB dialect, shared across oracles)
# ---------------------------------------------------------------------------

COPURCHASE_EDGES_SQL = """
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""

SYM_SQL = f"""
    WITH edges AS ({COPURCHASE_EDGES_SQL})
    SELECT src, dst FROM edges
    UNION
    SELECT dst AS src, src AS dst FROM edges
"""

DEGREE_SQL = f"""
    WITH sym AS ({SYM_SQL})
    SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src
"""

# each triangle exactly once as a<b<c (canonical edges have src<dst)
TRIANGLES_SQL = f"""
    WITH edges AS ({COPURCHASE_EDGES_SQL})
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM edges e1
    JOIN edges e2 ON e1.dst = e2.src
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
"""

TRI_PER_VERTEX_SQL = f"""
    WITH tri AS ({TRIANGLES_SQL}),
    corners AS (
        SELECT a AS id FROM tri
        UNION ALL SELECT b AS id FROM tri
        UNION ALL SELECT c AS id FROM tri
    )
    SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id
"""


# ---------------------------------------------------------------------------
# Relational layer
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "scan_project_filter",
    """
    SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
    WHERE l_quantity > 30 AND l_partkey % 2 = 0
    """,
)
def q_scan_project_filter(spark, sf_dir):
    return relational.scan_project_filter(_t(spark, sf_dir, "lineitem"))


@register(
    "revenue_per_nation",
    """
    SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_revenue_per_nation(spark, sf_dir):
    return relational.revenue_per_nation(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "nation"),
    )


@register(
    "customer_order_left_join",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_customer_order_left_join(spark, sf_dir):
    return relational.customer_order_left_join(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@register(
    "top_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def q_top_order_per_customer(spark, sf_dir):
    return relational.top_order_per_customer(_t(spark, sf_dir, "orders"))


@register(
    "order_priority_counts",
    """
    SELECT o_orderpriority, COUNT(*) AS n FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority HAVING COUNT(*) > 10
    """,
)
def q_order_priority_counts(spark, sf_dir):
    return relational.order_priority_counts(_t(spark, sf_dir, "orders"))


@register(
    "part_type_rollup",
    """
    SELECT p_brand, COUNT(*) AS n_parts, ROUND(AVG(p_retailprice), 4) AS avg_price
    FROM part GROUP BY ROLLUP (p_brand)
    """,
)
def q_part_type_rollup(spark, sf_dir):
    return relational.part_type_rollup(_t(spark, sf_dir, "part"))


# ---------------------------------------------------------------------------
# Graph construction (SURVEY.md §2.1 #1-8, #15-17, #25-26)
# ---------------------------------------------------------------------------

@register("copurchase_edges", COPURCHASE_EDGES_SQL)
def q_copurchase_edges(spark, sf_dir):
    return _copurchase(spark, sf_dir)


@register(
    "vertices_from_edges",
    f"""
    WITH edges AS ({COPURCHASE_EDGES_SQL})
    SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges
    """,
)
def q_vertices_from_edges(spark, sf_dir):
    from sna_pyspark_graphframes_spark.graph.core import Graph

    return Graph.from_edges(_copurchase(spark, sf_dir)).vertices


@register(
    "n_vertices",
    f"""
    WITH edges AS ({COPURCHASE_EDGES_SQL}),
    v AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)
    SELECT COUNT(DISTINCT id) AS n_vertices FROM v
    """,
)
def q_n_vertices(spark, sf_dir):
    from sna_pyspark_graphframes_spark.graph.core import Graph

    g = Graph.from_edges(_copurchase(spark, sf_dir))
    return g.vertices.agg(F.countDistinct("id").alias("n_vertices"))


@register(
    "customer_nation_edges",
    """
    SELECT c_custkey AS src, CAST(n_nationkey AS BIGINT) + 1000000 AS dst
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def q_customer_nation_edges(spark, sf_dir):
    return build.customer_nation_edges(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    )


@register(
    "user_session_edges",
    """
    SELECT a.event_id AS src, b.event_id AS dst
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND ABS(EPOCH(a.ts) - EPOCH(b.ts)) < 3600
    """,
)
def q_user_session_edges(spark, sf_dir):
    return build.user_session_edges(_t(spark, sf_dir, "events"))


@register(
    "adjacency",
    f"""
    WITH sym AS ({SYM_SQL})
    SELECT src AS id, LIST_SORT(LIST(DISTINCT dst)) AS nbrs
    FROM sym GROUP BY src
    """,
)
def q_adjacency(spark, sf_dir):
    return build.adjacency(_copurchase(spark, sf_dir))


@register(
    "induced_subgraph_small_parts",
    f"""
    WITH edges AS ({COPURCHASE_EDGES_SQL}),
    s AS (SELECT p_partkey AS id FROM part WHERE p_size < 10)
    SELECT src, dst FROM edges
    WHERE src IN (SELECT id FROM s) AND dst IN (SELECT id FROM s)
    """,
)
def q_induced_subgraph(spark, sf_dir):
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") < 10)
        .select(F.col("p_partkey").alias("id"))
    )
    return build.induced_subgraph(_copurchase(spark, sf_dir), parts)


@register("edge_file_roundtrip", COPURCHASE_EDGES_SQL)
def q_edge_file_roundtrip(spark, sf_dir):
    """Write the co-purchase edges in the reference's space-delimited format
    (``/root/reference/facebook/facebook_combined.txt`` shape) and re-read
    with the declared-schema CSV source — the oracle is the original edge
    set, proving a lossless sink→source roundtrip."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/spark_graft_edgefile_{tag}"
    write_edge_list(_copurchase(spark, sf_dir), path)
    return read_edge_list(spark, path)


@register(
    "dense_rekey_nation",
    """
    SELECT c_custkey AS id,
           CAST(DENSE_RANK() OVER (ORDER BY c_nationkey) - 1 AS BIGINT) AS label
    FROM customer
    """,
)
def q_dense_rekey_nation(spark, sf_dir):
    labels = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_nationkey").alias("label")
    )
    out = algorithms.dense_rekey(labels)
    return out.select("id", F.col("label").cast("long").alias("label"))


# ---------------------------------------------------------------------------
# Graph metrics (SURVEY.md §2.2)
# ---------------------------------------------------------------------------

@register("degree", DEGREE_SQL)
def q_degree(spark, sf_dir):
    return metrics.degrees(_copurchase(spark, sf_dir))


@register(
    "degree_histogram",
    f"""
    WITH deg AS ({DEGREE_SQL})
    SELECT degree, COUNT(*) AS cnt FROM deg GROUP BY degree
    """,
)
def q_degree_histogram(spark, sf_dir):
    return metrics.degree_histogram(_copurchase(spark, sf_dir))


@register(
    "top10_degree",
    f"""
    WITH deg AS ({DEGREE_SQL})
    SELECT id, degree FROM deg ORDER BY degree DESC, id ASC LIMIT 10
    """,
)
def q_top10_degree(spark, sf_dir):
    return metrics.top_k_by_degree(_copurchase(spark, sf_dir), k=10)


@register(
    "avg_degree",
    f"""
    WITH deg AS ({DEGREE_SQL})
    SELECT ROUND(AVG(degree), 4) AS avg_degree FROM deg
    """,
)
def q_avg_degree(spark, sf_dir):
    return metrics.average_degree(_copurchase(spark, sf_dir))


@register(
    "triangle_count",
    f"""
    WITH tri AS ({TRIANGLES_SQL})
    SELECT COUNT(*) AS n_triangles FROM tri
    """,
)
def q_triangle_count(spark, sf_dir):
    tri = metrics.triangles_per_vertex(_copurchase(spark, sf_dir))
    return tri.agg(
        (F.coalesce(F.sum("triangles"), F.lit(0)) / 3).cast("long").alias("n_triangles")
    )


@register("triangles_per_vertex", TRI_PER_VERTEX_SQL)
def q_triangles_per_vertex(spark, sf_dir):
    return metrics.triangles_per_vertex(_copurchase(spark, sf_dir))


@register(
    "avg_clustering",
    f"""
    WITH deg AS ({DEGREE_SQL}), tri AS ({TRI_PER_VERTEX_SQL})
    SELECT ROUND(AVG(
        CASE WHEN deg.degree < 2 THEN 0.0
             ELSE 2.0 * COALESCE(tri.triangles, 0) / (deg.degree * (deg.degree - 1))
        END), 4) AS avg_cc
    FROM deg LEFT JOIN tri ON deg.id = tri.id
    """,
)
def q_avg_clustering(spark, sf_dir):
    return metrics.average_clustering(_copurchase(spark, sf_dir))


@register(
    "transitivity",
    f"""
    WITH deg AS ({DEGREE_SQL}), tri AS ({TRIANGLES_SQL})
    SELECT ROUND(
        CASE WHEN SUM(deg.degree * (deg.degree - 1) / 2.0) > 0
             THEN 3.0 * (SELECT COUNT(*) FROM tri) / SUM(deg.degree * (deg.degree - 1) / 2.0)
             ELSE 0.0 END, 4) AS transitivity
    FROM deg
    """,
)
def q_transitivity(spark, sf_dir):
    return metrics.transitivity(_copurchase(spark, sf_dir))


# ---------------------------------------------------------------------------
# Iterative algorithms + sampling — not SQL-expressible (driver records
# rows-only checks; value-level correctness in tests/test_golden_*.py)
# ---------------------------------------------------------------------------

def _small_copurchase(spark, sf_dir):
    """Deterministic small subgraph (parts with key < 100) so all-pairs
    algorithms stay cheap at the driver's t2 scale."""
    e = _copurchase(spark, sf_dir)
    return e.filter((F.col("src") < 100) & (F.col("dst") < 100))


@register("connected_components", None)
def q_connected_components(spark, sf_dir):
    return algorithms.connected_components(_copurchase(spark, sf_dir))


@register("connected_components_count", None)
def q_cc_count(spark, sf_dir):
    cc = algorithms.connected_components(_copurchase(spark, sf_dir))
    return cc.agg(F.countDistinct("component").alias("n_components"))


@register("lpa_community_count", None)
def q_lpa_count(spark, sf_dir):
    labels = algorithms.label_propagation(_copurchase(spark, sf_dir), max_iter=5)
    return algorithms.community_count(labels)


@register("diameter_small", None)
def q_diameter_small(spark, sf_dir):
    return algorithms.diameter(_small_copurchase(spark, sf_dir))


@register("avg_closeness_small", None)
def q_avg_closeness_small(spark, sf_dir):
    return algorithms.average_closeness(_small_copurchase(spark, sf_dir))


@register("avg_betweenness_small", None)
def q_avg_betweenness_small(spark, sf_dir):
    return algorithms.average_betweenness(_small_copurchase(spark, sf_dir))


@register("random_walk_sample", None)
def q_random_walk_sample(spark, sf_dir):
    res = sampling.sample_graph(_copurchase(spark, sf_dir), alpha=2.0, max_iter=5, seed=42)
    return res.sampled_edges


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}
