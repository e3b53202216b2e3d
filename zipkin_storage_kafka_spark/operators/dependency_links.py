"""Dependency linking: traces -> service dependency edges (the one join).

Reference: ``spansToDependencyLinks`` invokes zipkin2's DependencyLinker per
closed trace (SpanAggregationTopology.java:115-121); 1-minute windowed
counters accumulate per link key (DependencyStorageTopology.java:70-105);
query time merges buckets per (parent, child)
(KafkaStorageHttpService.java:80-87).

Spark-first design (SURVEY section 2.3 J1): an equi self-join on
``(trace_id, child.parent_id = parent.id)``.  Both sides are large, so
broadcast does not apply; Catalyst plans a sort-merge join and the two scans
share the shuffle key (trace_id is in the join key), so at 100 TB this is
one co-partitioned shuffle.  AQE's skew-join handles pathological giant
traces.  No Python in the loop — whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.functions.zipkin import link_key


def dependency_links(spans: DataFrame) -> DataFrame:
    """Per-trace link rows BEFORE counter aggregation.

    DependencyLinker semantics re-expressed on the span tree:
    - an edge exists per (parent span -> child span) pair within a trace;
    - parent service = parent span's local service, child service = child
      span's local service (CLIENT->SERVER RPC pair collapses to one edge
      because the shared server span carries the same services);
    - a call with a child-side error tag counts toward error_count
      (DependencyLinker "error" tag rule — public zipkin2 semantics).

    Output: trace_id, parent, child, is_error, timestamp (child span micros).
    """
    child = spans.alias("c")
    parent = spans.alias("p")
    joined = child.join(
        parent,
        (F.col("c.trace_id") == F.col("p.trace_id"))
        & (F.col("c.parent_id") == F.col("p.id")),
        "inner",
    )
    return joined.select(
        F.col("c.trace_id").alias("trace_id"),
        F.col("p.local_service").alias("parent"),
        F.col("c.local_service").alias("child"),
        F.col("c.is_error").alias("is_error"),
        F.col("c.timestamp").alias("timestamp"),
    )


def merge_links(links: DataFrame) -> DataFrame:
    """Query-time merge: one row per (parent, child) with summed counters
    (reference DependencyLinker.merge at KafkaStorageHttpService.java:86)."""
    return (
        links.groupBy("parent", "child")
        .agg(
            F.count(F.lit(1)).alias("call_count"),
            F.sum(F.col("is_error").cast("long")).alias("error_count"),
        )
        .withColumn("link_key", link_key())
    )


def windowed_link_counters(links: DataFrame, window: str = "1 minute") -> DataFrame:
    """1-minute tumbling-window counters — the ``zipkin-dependencies`` store
    (reference DependencyStorageTopology.java:56-66, bucket = 1 min).

    Output: window_start_ms (epoch millis), parent, child, call_count,
    error_count.  Batch form of the streaming tumbling-window agg; the
    window becomes a partition column for the sink table, so range queries
    prune on it.
    """
    ts = F.timestamp_micros(F.col("timestamp"))
    return (
        links.groupBy(F.window(ts, window).alias("w"), "parent", "child")
        .agg(
            F.count(F.lit(1)).alias("call_count"),
            F.sum(F.col("is_error").cast("long")).alias("error_count"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "parent",
            "child",
            "call_count",
            "error_count",
        )
    )
