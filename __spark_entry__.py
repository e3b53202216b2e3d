"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (trace aggregation + find-traces —
the reference's richest read path, SURVEY.md section 3.3) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md section 2 with a DuckDB oracle for the driver's t2 gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from zipkin_storage_kafka_spark.plans import (
    registry,
    registry_analytics,
    registry_pipeline,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: newest trace summaries on /root/testdata/sf0.001."""
    return registry.q_latest_traces(spark, "/root/testdata/sf0.001")


# Deliberately ordered: the correctness harness walks this dict in insertion
# order and has a finite budget (rounds 1-3 each recorded exactly the first
# 50 entries).  _FIRST50 pins the budgeted prefix explicitly: the pinned
# zipkin-core block (the SURVEY section-2 parity gate — identical every
# round) followed by a PER-ROUND ROTATION of queries that have never had a
# driver row (ROTATION.md tracks cumulative driver-green coverage; rounds
# 2+3 re-checked the same 50, leaving 73 of 123 never driver-checked —
# VERDICT r03 next-round #1).  Queries outside the prefix land AFTER it,
# interleaved pipeline/analytics, so new work can never displace the
# budgeted coverage.
_PINNED_ZIPKIN_CORE = (
    "a2_trace_summaries",
    "j1_a8_dependency_links",
    "j1_links_tree",
    "a7_dependency_windows",
    "a4_span_names",
    "a5_remote_service_names",
    "a6_autocomplete_tags",
    "s7_service_names",
    "p4_find_traces",
    "s9_get_trace",
    "o1_latest_traces",
    "s8_get_dependencies",
    "s9_span_names_lookup",
    "s9_autocomplete_values",
    "p4_find_traces_annotation",
    "p4_find_traces_tags",
    "p4_find_traces_duration",
    "f2_normalize_ids",
    "o5_trace_many",
    "w25_latest_span_per_service",
    "s9_remote_service_lookup",
    "a9_union_service_names",
    "z_duration_histogram",
    "z_service_error_rate",
    "f6_json_roundtrip",
    "f7_link_json_roundtrip",
    "z_latency_percentiles",
    "z_salted_service_counts",
    "z_sketch_service_traces",
    "z_trace_depth",
    "f5_proto_roundtrip",
)

# Round-8 rotation: 19 first-time keys.  The fourteen operators
# registered early in round 7 (after the r07 rotation was pinned) jump
# the queue (ROTATION.md rule: new code fronts the rotation), then the
# recomputed queue head.  NOTE: CORRECTNESS_r07.json was never delivered
# to the repo; if the r07 run was in fact lost, the 19 r07 rotation keys
# remain "never-checked" under the recompute rule and automatically
# return to the r09 queue head — rotating forward is the dominant move
# either way (see ROTATION.md).
_ROTATION = (
    "ann_ivf_nprobe_recall",
    "mm_video_frames",
    "mm_video_scene_cuts",
    "mm_video_frame_sample",
    "w10_stream_incremental_dedup",
    "pipe_canonical_docs",
    "z_orphan_spans",
    "z_link_latency_gaps",
    "text_hybrid_rrf",
    "z_quantile_sketch_audit",
    "dedup_lsh_bucket_audit",
    "dedup_jaccard_curve",
    "dedup_banding_audit",
    "text_ccnet_buckets",
    "h18_large_volume_customers",
    "hr_pricing_rollup",
    "h15_top_supplier",
    "h16_part_supplier_variety",
    "h22_sales_opportunity",
)

_FIRST50 = _PINNED_ZIPKIN_CORE + _ROTATION


def _ordered(parts: dict[str, dict]) -> dict:
    merged = {
        **parts["zipkin"],
        **parts["pipeline"],
        **parts["analytics"],
    }
    missing = [name for name in _FIRST50 if name not in merged]
    assert not missing, (
        f"_FIRST50 entries missing from registries (rename?): {missing} — "
        "the budgeted correctness prefix must never silently shift"
    )
    out = {name: merged.pop(name) for name in _FIRST50}
    rest_zk = [k for k in parts["zipkin"] if k in merged]
    rest_pipe = [k for k in parts["pipeline"] if k in merged]
    rest_ana = [k for k in parts["analytics"] if k in merged]
    for i in range(max(len(rest_zk), len(rest_pipe), len(rest_ana))):
        for fam in (rest_zk, rest_pipe, rest_ana):
            if i < len(fam):
                out[fam[i]] = merged[fam[i]]
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(
        {
            "zipkin": registry.zipkin_queries(),
            "pipeline": registry_pipeline.pipeline_queries(),
            "analytics": registry_analytics.analytics_queries(),
        }
    )


def oracle_sql() -> dict[str, str]:
    oracles = _ordered(
        {
            "zipkin": registry.zipkin_oracles(),
            "pipeline": registry_pipeline.pipeline_oracles(),
            "analytics": registry_analytics.analytics_oracles(),
        }
    )
    # Emit in queries() order so a truncated harness checks the same prefix
    # of both dicts.
    return {k: oracles[k] for k in queries() if k in oracles}
