"""Every registered query must match its DuckDB oracle at sf0.001 — a local
replica of the driver's t2 gate (the driver reruns this at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare, duckdb_conn

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = queries[name](spark, sf_dir)
    if name not in oracles:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    compare(df, con, oracles[name], name=name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
