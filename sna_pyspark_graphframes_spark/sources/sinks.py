"""Result sinks — parquet (columnar, partitioned) and CSV.

The reference's only sinks are matplotlib EPS files written on the driver
(``/root/reference/main.py:127, 136, 206, 230``; SURVEY.md §2.1 #28). The
engine's results are DataFrames; sinks write them distributively.

Scale notes: ``partition_by`` drives partition pruning for downstream
readers; ``coalesce_small`` caps tiny-file explosion for small dimension
outputs (many 1-row files is the classic small-files failure); big fact
outputs keep their natural parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    coalesce_small: int | None = None,
) -> None:
    out = df.coalesce(coalesce_small) if coalesce_small else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True, sep: str = ","
) -> None:
    df.write.mode(mode).csv(path, header=header, sep=sep)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
