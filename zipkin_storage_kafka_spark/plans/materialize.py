"""Materialized sink tables — the engine's analog of the reference's
queryable state stores (SURVEY.md section 1.4), laid out for 100 TB.

Each store becomes a parquet table partitioned by event DATE:
- ``traces``       (zipkin-traces store: 1 d retention / 1 h segments —
                    TraceStorageTopology.java:87-91)
- ``span_names`` / ``remote_service_names`` / ``autocomplete_tags``
                    (7 d retention in-memory stores — :131-149; tiny, one
                    unpartitioned file each)
- ``dependency_links`` (zipkin-dependencies: 7 d TTL / 1-min buckets —
                    DependencyStorageTopology.java:56-66; partitioned by day,
                    bucket column inside)

Retention (W4) = partition drop: deleting date directories replaces the
reference's windowed-store segment eviction, and partition pruning on the
date column replaces ``fetchAll(from, to)`` segment selection.  Queries
over the materialized tables are the S7/S8/S9 scan shapes with pruning.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.operators import (
    aggregate_traces,
    autocomplete_tags,
    dependency_links,
    remote_service_names,
    span_names,
    windowed_link_counters,
)

DATE_COL = "event_date"


def _with_event_date(df: DataFrame, micros_col: str) -> DataFrame:
    return df.withColumn(
        DATE_COL, F.to_date(F.timestamp_micros(F.col(micros_col)))
    )


def materialize_stores(
    spark: SparkSession,
    spans: DataFrame,
    out_dir: str,
    autocomplete_keys: tuple[str, ...] | None = None,
) -> None:
    """Build every queryable store from a spans DataFrame.

    ``autocomplete_keys`` mirrors the reference's builder config
    (KafkaStorageBuilder.java autocompleteKeys): the whitelist of tag
    keys the autocomplete store indexes."""
    from zipkin_storage_kafka_spark.plans.query_api import (
        DEFAULT_AUTOCOMPLETE_KEYS,
    )

    if autocomplete_keys is None:
        autocomplete_keys = DEFAULT_AUTOCOMPLETE_KEYS
    traces = _with_event_date(aggregate_traces(spans), "trace_timestamp")
    traces.write.mode("overwrite").partitionBy(DATE_COL).parquet(
        os.path.join(out_dir, "traces")
    )

    links = dependency_links(spans)
    counters = windowed_link_counters(links).withColumn(
        DATE_COL, F.to_date(F.timestamp_millis(F.col("window_start_ms")))
    )
    counters.write.mode("overwrite").partitionBy(DATE_COL).parquet(
        os.path.join(out_dir, "dependency_links")
    )

    for name, df in (
        ("span_names", span_names(spans)),
        ("remote_service_names", remote_service_names(spans)),
        ("autocomplete_tags", autocomplete_tags(spans, keys=autocomplete_keys)),
    ):
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, name))


def read_store(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, name))


def drop_expired_partitions(out_dir: str, store: str, min_date: str) -> list[str]:
    """Retention by partition drop (W4): remove date partitions older than
    ``min_date`` (ISO yyyy-mm-dd).  Returns dropped partition names.

    The batch analog of windowed-store segment eviction; on object storage
    this is a prefix delete, never a rewrite."""
    store_dir = os.path.join(out_dir, store)
    dropped = []
    for entry in sorted(os.listdir(store_dir)):
        if not entry.startswith(f"{DATE_COL}="):
            continue
        date_val = entry.split("=", 1)[1]
        if date_val < min_date:
            shutil.rmtree(os.path.join(store_dir, entry))
            dropped.append(entry)
    return dropped


def materialize_bucketed_traces(
    spark: SparkSession,
    spans: DataFrame,
    path: str,
    table: str = "zipkin_traces_bucketed",
    n_buckets: int = 16,
) -> str:
    """Traces table bucketed + sorted by trace_id — the scale path for
    S9/O5 point lookups (GET /traces/{id}, traceMany): a key-equality
    filter reads 1 of ``n_buckets`` file groups instead of scanning the
    date partition, the file-level analog of the reference routing a key
    to exactly one host's store (KafkaStoreSingleKeyListCall.java:36-45).

    Bucketing requires a catalog table (file layout alone can't carry the
    hash function); ``path`` makes it external so the data lives with the
    other stores."""
    traces = _with_event_date(aggregate_traces(spans), "trace_timestamp")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        traces.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, "trace_id")
        .sortBy("trace_id")
        .saveAsTable(table)
    )
    return table


def materialize_bucketed_spans(
    spark: SparkSession,
    spans: DataFrame,
    path: str,
    table: str = "zipkin_spans_bucketed",
    n_buckets: int = 16,
) -> str:
    """Spans bucketed by trace_id — the co-location layout that makes the
    J1 dependency self-join SHUFFLE-FREE: both join sides read the same
    bucketed table, so HashPartitioning(trace_id) already satisfies the
    join's clustered distribution on (trace_id, parent_id=id) (the bucket
    column is a subset of the join keys) and the sort-merge join plans with
    zero Exchange — at 100 TB the whole link-extraction shuffle (the
    largest in the zipkin pipeline) disappears into the write layout.
    Subset-key co-partitioning needs
    ``spark.sql.requireAllClusterKeysForCoPartition=false`` (public Spark
    conf; the default insists the bucket keys equal the full join key set).
    Pinned by ``test_materialize.py::test_bucketed_spans_join_no_shuffle``.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        spans.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, "trace_id")
        .sortBy("trace_id")
        .saveAsTable(table)
    )
    return table


def lookup_trace_bucketed(
    spark: SparkSession, table: str, trace_id: str
) -> DataFrame:
    """S9 point lookup against the bucketed table: bucket pruning reads
    one bucket's files (explain shows ``SelectedBucketsCount: 1 out of n``)."""
    return spark.table(table).filter(F.col("trace_id") == trace_id)


def traces_in_range(
    spark: SparkSession, out_dir: str, end_ts_ms: int, lookback_ms: int
) -> DataFrame:
    """S8 range scan over the materialized traces table: the date-partition
    filter prunes directories, the timestamp filter pushes to parquet."""
    lo_us = (end_ts_ms - lookback_ms) * 1000
    hi_us = end_ts_ms * 1000
    lo_date = F.to_date(F.timestamp_micros(F.lit(lo_us)))
    hi_date = F.to_date(F.timestamp_micros(F.lit(hi_us)))
    return (
        read_store(spark, out_dir, "traces")
        .filter(F.col(DATE_COL).between(lo_date, hi_date))
        .filter(F.col("trace_timestamp").between(lo_us, hi_us))
    )


def materialize_training_shards(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> None:
    """Write the cleaned corpus as training shards — the doc pipeline's
    terminal materialization: the `pipe_clean_corpus` survivor set (exact
    dedup -> LSH near-dup -> quality gate), with the deterministic
    train/val/test split as a PARTITION column.

    Partitioning by (split, lang) means a training job reads its split by
    directory listing alone — no data-file scan touches val/test, and split
    leakage is structurally impossible.  At 100 TB, add a date or shard-id
    sub-partition to bound file sizes; the write pattern is identical.
    """
    from pyspark.sql import functions as F

    from zipkin_storage_kafka_spark.operators.dedup import (
        exact_dedup_groups,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_buckets_rowwise,
        shingles,
    )
    from zipkin_storage_kafka_spark.operators.text_analysis import (
        quality_score,
        split_assignment,
    )
    from zipkin_storage_kafka_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(docs)
    canonical = exact_dedup_groups(docs).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    near_drop = (
        jaccard_pairs(
            sh, lsh_candidate_pairs(minhash_buckets_rowwise(docs)), 0.5
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    quality = quality_score(docs).select("doc_id", "quality")
    split = split_assignment()
    kept = (
        docs.join(canonical, "doc_id", "left_semi")
        .join(near_drop, "doc_id", "left_anti")
        .join(quality, "doc_id")
        .filter(F.col("quality") >= 0.5)
        .withColumn("split", split)
    )
    (
        kept.write.mode("overwrite")
        .partitionBy("split", "lang")
        .parquet(os.path.join(out_dir, "training_shards"))
    )


def read_training_split(
    spark: SparkSession, out_dir: str, split: str
) -> DataFrame:
    """Read one split: the filter is a partition-directory prune (explain
    shows PartitionFilters, zero data files from other splits)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(os.path.join(out_dir, "training_shards"))
        .filter(F.col("split") == split)
    )


def compact_partitions(
    spark: SparkSession,
    out_dir: str,
    store: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> list[str]:
    """Small-file compaction for a date-partitioned store: rewrite every
    partition holding more than one under-sized parquet file into
    ceil(bytes / target_bytes) files.  Returns the compacted partitions.

    Streaming sinks append a file per trigger per partition; a day of
    1-minute triggers leaves ~1440 files whose per-file open/footer cost
    dominates scans long before data size does (the same debt the
    reference's changelog topics accumulate and RocksDB compaction pays
    down).  Compaction = read partition -> coalesce -> atomic swap
    (write aside, rename over) so readers never observe a partial store;
    the rewrite touches ONLY oversplit partitions — a 100 TB table with a
    hot today-partition compacts today, not the archive.
    """
    import math
    import uuid as _uuid

    store_dir = os.path.join(out_dir, store)
    compacted = []
    for entry in sorted(os.listdir(store_dir)):
        if not entry.startswith(f"{DATE_COL}="):
            continue
        part_dir = os.path.join(store_dir, entry)
        files = [
            os.path.join(part_dir, f)
            for f in os.listdir(part_dir)
            if f.endswith(".parquet")
        ]
        total = sum(os.path.getsize(f) for f in files)
        n_target = max(1, math.ceil(total / target_bytes))
        if len(files) < max(min_files, n_target + 1):
            continue
        tmp = f"{part_dir}.compact-{_uuid.uuid4().hex[:6]}"
        spark.read.parquet(part_dir).coalesce(n_target).write.mode(
            "overwrite"
        ).parquet(tmp)
        old = f"{part_dir}.old-{_uuid.uuid4().hex[:6]}"
        os.rename(part_dir, old)
        os.rename(tmp, part_dir)
        shutil.rmtree(old)
        compacted.append(entry)
    return compacted
