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
# Round-9 pinned core: SHRUNK 31 -> 15 (VERDICT r08 next-round #2).  The
# 31-row prefix re-proved the same zipkin-core rows every round, but the
# local suite (tests/test_oracle_parity.py) already oracle-checks all 275
# queries per round, so the driver pin's regression value is redundant at
# 31 rows while 135/275 queries have never had a driver row.  Keep the
# most load-bearing row per SURVEY section-2 family (trace agg, link
# join, windows, name indexes, store scans/lookups, predicate, ordering,
# functions, codecs) and spend the freed 16 slots on rotation so the
# never-checked queue drains in ~4 rounds instead of 7.
_PINNED_ZIPKIN_CORE = (
    "a2_trace_summaries",        # A1/A2 trace aggregation
    "j1_a8_dependency_links",    # J1/A8 link self-join + merge
    "j1_links_tree",             # J1 full DependencyLinker tree semantics
    "a7_dependency_windows",     # A7 1-min windowed counters
    "a4_span_names",             # A4-A6 name/tag index family
    "s7_service_names",          # S7 full store scan
    "s8_get_dependencies",       # S8 range scan + J2 counter join
    "s9_get_trace",              # S9 point lookup
    "p4_find_traces",            # P4 QueryRequest predicate
    "p4_find_traces_duration",   # P4 duration-bound variant
    "o1_latest_traces",          # O1/O3 ordering + limit
    "o5_trace_many",             # O5 traceMany cap
    "f2_normalize_ids",          # F1-F4 function family
    "f5_proto_roundtrip",        # F5 PROTO3 codec (the graded-weak row)
    "f6_json_roundtrip",         # F6 JSON V2 codec
)

# The round this rotation was pinned FOR: the prefix-contract test
# excludes driver artifacts from rounds >= this (the round's own
# delivery necessarily contains exactly these keys — VERDICT r09
# next-round #2).
_ROTATION_ROUND = 14

# Round-14 rotation, spent by the encoded drained-era rule (ROTATION.md
# "r13+ re-proof policy", recomputed and asserted by
# test_first50_prefix_contract's drained-era branch):
#   1. rows whose physical plans THIS round's diff changed — the four
#      ADC rows gained the prebuilt-index consistency projection and
#      the rp_simhash row's Arrow kernel gained the malformed-embedding
#      assertion (ADVICE r13 fixes); then
#   2. the registry in OLDEST-PROOF-FIRST order recomputed from the
#      CORRECTNESS_r*.json files (< r14): the r03 cohort tail, the r04
#      cohort, and the r05 head.
_ROTATION_PLAN_CHANGED = (
    "ann_pq_adc",               # r14: per-vector subspace-count guard
    "ann_ivfpq_topk",           # r14: same guard via ann_topk_ivfpq
    "ann_ivfpq_recall",         # r14: same guard via ann_topk_ivfpq
    "ann_pq_recall",            # r14: same guard via pq_recall
    "emb_rp_simhash",           # r14: kernel null/ragged assertion
)
_ROTATION_STALENESS_FILL = (
    "mm_extract_features",
    "mm_resize_meta",
    "pipe_clean_corpus",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_token_stats",
    "ann_batch_topk",
    "dedup_cluster_resolve",
    "emb_kmeans_step",
    "emb_pq_encode",
    "ev_cohort_retention",
    "ev_event_funnel",
    "h20_excess_stock",
    "h2_min_cost_supplier",
    "hr_pricing_cube",
    "text_bpe_train",
    "text_length_buckets",
    "text_pii_scrub",
    "w1_stream_traces",
    "w_customer_deciles",
    "z_anomalous_spans",
    "z_critical_path",
    "z_self_time",
    "z_service_pagerank",
    "dedup_cluster_star",
    "dedup_semantic",
    "dedup_substring",
    "mm_bmp_resize",
    "mm_bmp_roundtrip",
)
_ROTATION = _ROTATION_PLAN_CHANGED + _ROTATION_STALENESS_FILL

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
