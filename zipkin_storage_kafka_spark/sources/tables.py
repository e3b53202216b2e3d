"""Parquet table loaders for the driver testdata (TESTDATA.md).

Column pruning + predicate pushdown happen automatically for parquet
(verify with ``df.explain('formatted')`` — look for PushedFilters /
ReadSchema).  At 100 TB the same reader works: parquet directories
partitioned by date, with partition pruning driven by query filters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def to_epoch_micros(df, col_name: str):
    """Epoch-micros Column for a parquet timestamp column, whichever way the
    file encodes it: TIMESTAMP(NANOS) surfaces as LongType nanos under
    ``spark.sql.legacy.parquet.nanosAsLong`` (truncating div, matching
    DuckDB's ns->us truncation); micro/milli timestamps surface as
    TimestampType and go through ``unix_micros``.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col_name)
    if dtype == "bigint":
        return F.expr(f"{col_name} div 1000")
    if dtype == "timestamp_ntz":
        # session TZ is pinned to UTC, so NTZ -> TZ cast is the identity
        return F.unix_micros(F.col(col_name).cast("timestamp"))
    return F.unix_micros(F.col(col_name))
