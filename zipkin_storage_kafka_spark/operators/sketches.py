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


HLL_LG_K = 14
HLL_TOLERANCE = 0.05


def hll_distinct_traces(
    spans: DataFrame, lg_k: int = HLL_LG_K, tolerance: float = HLL_TOLERANCE
) -> DataFrame:
    """Per-service distinct-trace cardinality via Spark's native
    DataSketches HLL (``hll_sketch_agg``, Spark 3.5+) — the production
    scale path next to the engine-portable linear-counting flavor
    (:func:`distinct_traces_sketch`).  The HLL binary is MERGEABLE
    (``hll_union_agg``): per-partition / per-day sketches pre-aggregate
    into a counters store and union at query time, so a 100 TB domain
    never re-shuffles raw ids — the property pinned by
    tests/test_pipeline_sampling.py::test_hll_sketches_merge.

    DuckDB's approx_count_distinct is a DIFFERENT HLL build, so the
    estimate itself can never hash-match an oracle; the driver-visible
    contract is the accuracy gate: exact count + a within-``tolerance``
    boolean (same pattern as ann_ivf_recall).  lg_k=14 gives ~0.8%
    relative standard error — 5% tolerance is >6 sigma.

    Output: local_service, exact_traces, hll_ok (bool).
    """
    agg = spans.groupBy("local_service").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("trace_id", F.lit(lg_k))
        ).alias("est"),
        F.count_distinct("trace_id").alias("exact_traces"),
    )
    err = F.abs(F.col("est") - F.col("exact_traces"))
    return agg.select(
        "local_service",
        "exact_traces",
        (err <= F.lit(tolerance) * F.col("exact_traces")).alias("hll_ok"),
    )
