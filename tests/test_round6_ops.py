"""Round-6 operators: incremental-corpus dedup, bucketed store reads,
the w7 upsert store row."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_incremental_dedup_fixture_statuses(spark):
    """Hand fixture covering all three classifications — crucially a doc
    that matches an OLD doc by NEAR-dup only (no exact hash match), the
    case the operator exists for (VERDICT r05 next-round #5)."""
    from zipkin_storage_kafka_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
    )

    base_text = (
        "the quick brown fox jumps over the lazy dog near the old barn "
        "while rain falls softly on the quiet village roofs tonight"
    )
    old = spark.createDataFrame(
        [
            Row(doc_id=1, text=base_text),
            Row(doc_id=2, text="completely different ancient scroll text "
                               "about maritime navigation and star charts"),
        ],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [
            # exact re-ingest of doc 1 under a new id
            Row(doc_id=101, text=base_text),
            # light edit: appended token keeps every original shingle, so
            # >= 1 band minimum survives -> near-dup (and NOT exact)
            Row(doc_id=102, text=base_text + " appended"),
            # unrelated
            Row(doc_id=103, text="totally fresh content sharing no "
                                 "trigrams with any earlier document"),
            # NULL text -> no probe keys -> new
            Row(doc_id=104, text=None),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["status"], r["matched_old_id"])
        for r in incremental_dedup(build_dedup_index(old), new).collect()
    }
    assert out[101] == ("exact_dup", 1)
    assert out[102] == ("near_dup", 1)
    assert out[103] == ("new", None)
    assert out[104] == ("new", None)


def test_incremental_dedup_old_side_is_index_only(spark, sf_dir):
    """The probe join must consume ONLY the old corpus's index columns
    (doc_id, kind, key): no shuffle in the plan may carry the old
    document text — the point of an incremental design is that 100 TB of
    old bodies never re-enter the pipeline."""
    import io
    from contextlib import redirect_stdout

    import __spark_entry__ as entrymod

    df = entrymod.queries()["pipe_incremental_dedup"](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    exchange_lines = [
        l for l in plan.splitlines() if "hashpartitioning" in l
    ]
    assert exchange_lines, plan
    assert all("text" not in l for l in exchange_lines), exchange_lines
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_incremental_dedup_matches_full_lsh_candidates(spark):
    """Cross-check against the standing LSH machinery: every new doc the
    incremental path flags near_dup against the old corpus must appear
    in lsh_candidate_pairs over the UNION of both snapshots (same band
    family), paired with an old doc — the incremental index loses no
    candidate recall vs the full recompute."""
    from zipkin_storage_kafka_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
        lsh_candidate_pairs,
        minhash_buckets_rowwise,
    )
    from zipkin_storage_kafka_spark.sources.tables import load_table

    docs = load_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    inc = incremental_dedup(build_dedup_index(old), new)
    near = {
        r["doc_id"]
        for r in inc.filter(F.col("status") == "near_dup").collect()
    }
    cand = lsh_candidate_pairs(
        minhash_buckets_rowwise(docs)
    ).collect()
    cross = set()
    for r in cand:
        a, b = r["doc_a"], r["doc_b"]
        if a % 2 == 0 and b % 2 == 1:
            cross.add(b)
        elif b % 2 == 0 and a % 2 == 1:
            cross.add(a)
    # exact dups also collide in every band, so the candidate cross set
    # covers exact_dup rows too; near flags must be a subset
    exact = {
        r["doc_id"]
        for r in inc.filter(F.col("status") == "exact_dup").collect()
    }
    assert near <= cross
    assert near.isdisjoint(exact)
