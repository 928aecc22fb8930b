from sna_pyspark_graphframes_spark.graph.core import Graph
from sna_pyspark_graphframes_spark.graph import build, metrics, algorithms, sampling

__all__ = ["Graph", "build", "metrics", "algorithms", "sampling"]
