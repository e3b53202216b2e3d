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


def _ensure_reader_confs(spark: SparkSession) -> None:
    """Make any SparkSession able to read the driver testdata.

    Callers (the external correctness harness in particular) may hand us a
    bare SparkSession built without ``session.get_spark``.  Two confs are
    load-bearing and runtime-settable, so set them defensively here rather
    than relying on the session factory:

    - ``spark.sql.legacy.parquet.nanosAsLong``: events.parquet stores
      TIMESTAMP(NANOS); without this, ``spark.read.parquet`` throws
      PARQUET_TYPE_ILLEGAL.  With it, the column surfaces as LongType nanos,
      which ``to_epoch_micros`` expects.
    - ``spark.sql.session.timeZone=UTC``: the ``timestamp_ntz`` branch of
      ``to_epoch_micros`` casts NTZ->TZ, which is only the identity under a
      UTC session zone (matching DuckDB's UTC-naive reading).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Right-size shuffle width for a session left at Spark's untouched
    # default (200): at test scale that is 6x more tasks than cores, all
    # scheduling overhead.  A deliberately configured session is respected.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    # Session-wide planner default (ADVICE r06: set once here, not as an
    # order-dependent side effect of one query): allow co-partitioned
    # joins when the join keys are a SUPERSET of a bucketed table's
    # cluster keys — the zero-exchange store-read path
    # (plans/materialize.py) joins bucketed-by-trace_id spans on
    # (trace_id, span keys).  Correctness-neutral (Spark only elides an
    # exchange when the distribution is still satisfied); deterministic
    # for every plan-pinning test regardless of execution order.
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")


# Tables big enough that a single-file, single-row-group layout (the driver
# testdata ships exactly that) serializes every scan's map-side work on one
# core.  For these, load_table transparently reads a once-materialized
# repartitioned copy — the batch analog of an ingest job writing
# properly-sized files.  Dim tables stay raw (broadcast anyway).
_WIDE_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")

_WIDE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(
    spark: SparkSession, sf_dir: str, name: str, wide: bool = True
) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_reader_confs(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if not wide or name not in _WIDE_TABLES:
        return raw
    # A parquet file parallelizes at ROW GROUP granularity; the testdata
    # ships one row group per table, so byte-range splitting cannot help —
    # only a rewritten copy can.  Materialized once per (data, code)
    # fingerprint via matcache, shared across processes; no-op when the
    # raw scan is already wide (the 100 TB case).
    target = spark.sparkContext.defaultParallelism
    if raw.rdd.getNumPartitions() >= min(4, target):
        return raw
    import sys

    from zipkin_storage_kafka_spark.sources import matcache

    key = (id(spark), sf_dir, name)
    if key not in _WIDE_CACHE:
        _WIDE_CACHE[key] = matcache.materialized(
            spark,
            sf_dir,
            f"wide_{name}",
            matcache.code_fingerprint([sys.modules[__name__]]),
            lambda: raw.repartition(target),
        )
    return _WIDE_CACHE[key]


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
