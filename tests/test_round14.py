"""Round-14 guards: the four ADVICE r13 contract fixes — the bitmask
basket_lift cap, the rp_simhash malformed-embedding assertion, the
pq_adc prebuilt-index structural check, and the plan-audit parser's
fail-closed behavior on unterminated string literals."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)


def test_basket_lift_bitmask_cap_enforced(spark):
    """flavor='bitmask' documents a <= 60 distinct-item cap; before the
    r14 guard an oversized domain silently WRAPPED bits >= 64 into the
    mask and dropped indexes 60..63 from the bit scan, corrupting every
    count.  Now the mask build raise_errors executor-side."""
    from zipkin_storage_kafka_spark.operators.trace_aggregation import (
        basket_lift,
    )

    member = spark.range(61).select(
        (F.col("id") % 2).alias("bk"),
        F.format_string("item_%03d", F.col("id")).alias("it"),
    )
    with pytest.raises(Exception, match="60 distinct items"):
        basket_lift(member, "bk", "it", flavor="bitmask").collect()
    # the cap itself stays allowed: exactly 60 items must still build
    ok = spark.range(60).select(
        (F.col("id") % 2).alias("bk"),
        F.format_string("item_%03d", F.col("id")).alias("it"),
    )
    assert basket_lift(ok, "bk", "it", flavor="bitmask").count() > 0


@pytest.mark.parametrize("malformed", ["null", "short"])
def test_rp_simhash_rejects_malformed_embeddings(spark, malformed):
    """A null or wrong-dimension embedding used to crash the Arrow
    kernel with an opaque numpy stack error (ADVICE r13); the kernel now
    raises a ValueError naming the offending vec_ids."""
    from zipkin_storage_kafka_spark.operators.similarity import (
        RP_DIMS,
        rp_simhash_stats,
    )

    good = F.expr(
        f"transform(sequence(1, {RP_DIMS}), x -> CAST(x AS DOUBLE))"
    )
    bad = (
        F.lit(None).cast("array<double>")
        if malformed == "null"
        else F.expr("array(CAST(1.0 AS DOUBLE))")
    )
    emb = spark.range(4).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 2).alias("label"),
        F.when(F.col("id") == 2, bad).otherwise(good).alias("embedding"),
    )
    with pytest.raises(Exception, match="rp_simhash"):
        rp_simhash_stats(emb).collect()


def test_pq_adc_rejects_mismatched_prebuilt_codes(spark):
    """Prebuilt codes built with a different m than the query's LUT must
    fail loudly (per-vector subspace count != m), not return silently
    wrong distances (ADVICE r13)."""
    from zipkin_storage_kafka_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
    )

    emb = spark.range(8).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 4),"
            " x -> CAST(x * (id + 1) AS DOUBLE))"
        ).alias("embedding"),
    )
    stale = pq_encode(emb, m=2, k=2)
    with pytest.raises(Exception, match="subspace codes"):
        pq_adc_topk(
            emb, 0, k_results=4, m=4, k=2, codes=stale
        ).collect()
    # consistent prebuilt codes still serve
    good = pq_encode(emb, m=2, k=2)
    assert (
        pq_adc_topk(emb, 0, k_results=4, m=2, k=2, codes=good).count() > 0
    )


def test_spec_args_unterminated_literal_raises():
    """An unpaired quote used to leave the scan in-string to the end of
    the plan, silently truncating the arg list — a fail-open on the
    unpartitioned-window gate (ADVICE r13).  It must now raise."""
    from plan_audit import _spec_args

    plan = "windowspecdefinition(x#1 ASC, 'unpaired literal to EOF"
    with pytest.raises(ValueError, match="unterminated"):
        _spec_args(plan, len("windowspecdefinition("))


def test_audit_plan_counts_parse_failure_as_hard():
    """audit_plan must surface an unparseable window spec as a
    window_parse_failure count (graded hard), never classify it."""
    from plan_audit import audit_plan

    plan = (
        "(1) Window\n"
        "Arguments: windowspecdefinition(x#1 ASC, 'unpaired to EOF"
    )
    counts = audit_plan(plan)
    assert counts["window_parse_failure"] == 1
    assert counts["unpartitioned_window"] == 0
    clean = (
        "(1) Window\n"
        "Arguments: windowspecdefinition(p#1, x#2 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, a, b))"
    )
    ok = audit_plan(clean)
    assert ok["window_parse_failure"] == 0
