"""Local replica of the driver's t2 correctness gate: run a Spark query and
its DuckDB oracle side by side and compare row count, schema (column names),
and order-insensitively compared values."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
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
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(value):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 6)
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    return value


def _rows(df_pandas, cols):
    out = []
    for row in df_pandas[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon(v) for v in row))
    out.sort(key=lambda r: tuple((v is None, str(v)) for v in r))
    return out


def compare(spark_df, con, sql: str, name: str = "") -> None:
    spark_pd = spark_df.toPandas()
    oracle_pd = con.execute(sql).df()
    s_cols = sorted(spark_pd.columns)
    o_cols = sorted(oracle_pd.columns)
    assert s_cols == o_cols, f"{name}: columns differ: {s_cols} vs {o_cols}"
    assert len(spark_pd) == len(oracle_pd), (
        f"{name}: row counts differ: spark={len(spark_pd)} oracle={len(oracle_pd)}"
    )
    s_rows = _rows(spark_pd, s_cols)
    o_rows = _rows(oracle_pd, o_cols)
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        assert a == b, (
            f"{name}: first differing row {i}:\n  spark : {a}\n  oracle: {b}"
        )
