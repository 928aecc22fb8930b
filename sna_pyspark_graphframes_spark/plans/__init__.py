from sna_pyspark_graphframes_spark.plans.iterate import checkpointed

__all__ = ["checkpointed"]
