"""Every queries()/oracle_sql() pair must pass the mirrored driver check."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["id", "degree"]


def test_queries_have_oracles_or_are_declared():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle_sql keys must be a subset of queries keys"


@pytest.mark.parametrize("name", list(entrymod.oracle_sql()))
def test_oracle_pair(spark, sf_dir, con, name):
    df = entrymod.queries()[name](spark, sf_dir)
    ok, msg = compare(df, con, entrymod.oracle_sql()[name])
    assert ok, f"{name}: {msg}"


def test_no_rows_only_queries_remain():
    """r10 milestone: EVERY registered query is oracle-paired — the fp
    top-k and seeded-walk queries converted via tolerance twins /
    validity certificates. A query registered without an oracle is a
    regression against this contract (add a twin, don't skip)."""
    rows_only = [n for n in entrymod.queries() if n not in entrymod.oracle_sql()]
    assert rows_only == [], rows_only
