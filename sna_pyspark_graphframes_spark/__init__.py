"""PySpark-native analytics engine with the capabilities of the reference
community-based graph-sampling project (amoavinis/SNA-PySpark-GraphFrames,
surveyed in SURVEY.md), rebuilt Spark-first.

Design stance (SURVEY.md §7.0):
  * DataFrame/SQL only — no RDD API anywhere in the engine path.
  * Explicit schemas at every source; no runtime inference.
  * ``Graph`` is a plain pair of DataFrames (vertices, edges).
  * Every algorithm is a function ``DataFrame -> DataFrame``; iteration is
    done with ``plans.iterate`` (localCheckpoint cadence) so Catalyst plans
    never blow up.
  * The single Python kernel (the random walk) is an Arrow-batched
    ``applyInPandas`` grouped-map — everything else stays JVM-side in
    whole-stage codegen.
"""

from sna_pyspark_graphframes_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
