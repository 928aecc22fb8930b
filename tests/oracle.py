"""Local mirror of the driver's DuckDB oracle comparison (t2), so every
queries()/oracle_sql() pair is verified in CI before the driver sees it.

Comparison contract (per the driver): row count, schema (column names,
sorted), and an order-insensitive value hash with columns sorted by name.
"""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def _driver_precheck(s_rows, s_cols, duck_pdf) -> str | None:
    """Mirror of the DRIVER's pandas canonicalization (CORRECTNESS_r04:
    `_canon` does `sort_values` over all columns, whose lexsort factorizes
    object columns — ndarray/list-valued cells throw `unhashable type`
    there, AFTER the local row-wise mirror had already passed). Run the
    same pandas operations here so driver-only failure modes are caught at
    sf0.001, pre-handoff:

    - `sort_values(by=<all columns>)` on both sides — fails on any
      array-typed output column (the `multimodal_featurize` r04 red);
    - dtype-kind comparison with the DuckDB side ingested via `.df()`,
      exactly as the driver does — catches the HUGEINT gotcha (DuckDB
      window/plain SUM → HUGEINT → pandas float64 hashing differently
      from Spark's int64 even when every value matches).
    """
    import pandas as pd

    cols = sorted(s_cols)
    spark_pdf = pd.DataFrame(s_rows, columns=list(s_cols))[cols]
    duck_pdf = duck_pdf[cols]
    for side, pdf in (("spark", spark_pdf), ("duckdb", duck_pdf)):
        if len(pdf):
            try:
                pdf.sort_values(by=cols, kind="mergesort")
            except TypeError as exc:
                return (
                    f"{side} result not driver-canonicalizable "
                    f"(array-typed output column? project it to a string "
                    f"or posexplode): {exc}"
                )
    if len(spark_pdf) and len(duck_pdf):
        numeric_class = {"i": "num-int", "u": "num-int", "f": "num-float"}
        for c in cols:
            sk = spark_pdf[c].dtype.kind
            dk = duck_pdf[c].dtype.kind
            if "O" in (sk, dk):
                continue  # object dtype: value compare decides
            if numeric_class.get(sk, sk) != numeric_class.get(dk, dk):
                return (
                    f"driver dtype mismatch on `{c}`: spark kind={sk!r} vs "
                    f"duckdb kind={dk!r} (HUGEINT/DECIMAL oracle output? "
                    f"CAST it to BIGINT/DOUBLE in the oracle SQL)"
                )
    return None


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d_pdf = con.execute(sql).df()
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    pre = _driver_precheck(s_rows, s_cols, d_pdf)
    if pre is not None:
        return False, pre
    a, b = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
