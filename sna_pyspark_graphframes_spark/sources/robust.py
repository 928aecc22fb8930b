"""Robust CSV ingest: PERMISSIVE scan with corrupt-record quarantine.

At 100 TB a raw drop always contains malformed lines; FAILFAST aborts the
whole job on one bad row and DROPMALFORMED silently loses data. The
production shape is PERMISSIVE + a corrupt-record column: good rows flow
on, bad rows are quarantined with their raw text for reprocessing — both
from the SAME single scan.

Spark caveat encoded here: a query that references ONLY the internal
corrupt-record column is rejected by the analyzer (the CSV reader would
otherwise prune every data column and nothing could have failed to parse),
so ``split_corrupt`` materializes the scan once (cache) before filtering —
also what you want at scale, since good+bad derive from one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv_robust(
    spark: SparkSession, path: str, schema: str, **options: str
) -> DataFrame:
    """PERMISSIVE CSV scan: declared ``schema`` (DDL string, no inference
    pass over the data) plus a ``_corrupt_record`` column holding the raw
    line for every row that failed to parse (NULL for good rows)."""
    full_schema = f"{schema}, {CORRUPT_COL} STRING"
    reader = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """``(good, bad)`` from one robust scan: good rows with data columns
    only; bad rows as ``(_corrupt_record)`` for the quarantine sink."""
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
