"""Engine-portable cardinality sketching (linear counting).

Approximate-distinct is a core OLAP primitive, but Spark's
``approx_count_distinct`` (HyperLogLog++) and DuckDB's ``approx_count_distinct``
(different HLL build) can never hash-match each other.  Linear counting
[Whang et al., TODS 1990] over an md5-derived bucket id is deterministic and
identical in both engines, so the sketch itself sits under the driver's
value-hash gate — the same reason the dedup chain hashes with md5
(``operators/dedup.py`` module docstring).

Sketch: bucket = first 4 hex chars of md5(value) (m = 65536 buckets); with
``v`` distinct buckets occupied, the distinct-count estimate is
``-m * ln(1 - v/m)``.  Standard error ~ sqrt(m*(exp(n/m)-n/m-1))/n; the map
saturates as n -> m, so m must be sized above the expected cardinality —
the scale path is per-partition 8 KiB bitmaps OR-merged by a tiny agg, and
a wider prefix (6-8 hex chars) for billion-scale domains.

Plan shape: ``count_distinct(bucket)`` per group is a partial-agg shuffle
whose width is capped at m rows per group regardless of input size — the
point of sketching: a 100 TB scan reduces map-side to <= 65536-row partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.functions.portable import round4

M_BUCKETS = 65536


def _bucket(col: Column) -> Column:
    return F.substring(F.md5(col), 1, 4)


def linear_count_estimate(v: Column, m: int = M_BUCKETS) -> Column:
    """Distinct-count estimate from ``v`` occupied buckets of ``m``."""
    return round4(-F.lit(float(m)) * F.log(F.lit(1.0) - v / F.lit(float(m))))


def distinct_traces_sketch(spans: DataFrame) -> DataFrame:
    """Per-service distinct-trace cardinality: linear-counting estimate
    beside the exact count and the signed error — the accuracy audit a
    sketch rollout ships with.

    Output: local_service, n_buckets, est_traces (round 4),
    exact_traces, err (round 4).
    """
    agg = spans.groupBy("local_service").agg(
        F.count_distinct(_bucket(F.col("trace_id"))).alias("n_buckets"),
        F.count_distinct("trace_id").alias("exact_traces"),
    )
    est = linear_count_estimate(F.col("n_buckets"))
    return agg.select(
        "local_service",
        "n_buckets",
        est.alias("est_traces"),
        "exact_traces",
        round4(est - F.col("exact_traces")).alias("err"),
    )
