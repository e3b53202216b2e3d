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


def test_bloom_prefilter_no_false_negatives_and_fp_audit(spark):
    """Bloom semantics pinned: an exact re-ingest can NEVER be screened
    out (no false negatives — every one of its k bits was set by the
    original), a fresh doc with disjoint bits passes as new, and the
    false_positive column is exactly maybe_dup AND NOT is_dup."""
    from pyspark.sql import Row

    from zipkin_storage_kafka_spark.operators.dedup import bloom_prefilter

    old = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon"),
            Row(doc_id=2, text="zeta eta theta iota kappa"),
        ],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=11, text="alpha beta gamma delta epsilon"),  # dup
            Row(doc_id=12, text="completely unrelated fresh words here"),
            Row(doc_id=13, text=None),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["maybe_dup"], r["is_dup"], r["false_positive"])
        for r in bloom_prefilter(old, new).collect()
    }
    assert out[11] == (True, True, False)   # no false negatives, period
    assert out[13] == (False, False, False)  # NULL text -> new
    # doc 12: is_dup must be False; maybe_dup is whatever the hash says
    # (deterministic), and false_positive must equal maybe_dup then
    md, isd, fp = out[12]
    assert isd is False and fp == md


def test_containment_asymmetric_fixture(spark):
    """A small doc fully contained in a big doc: containment_ab = 1.0
    while Jaccard is far below the near-dup threshold — the case this
    measure exists for."""
    from pyspark.sql import Row

    from zipkin_storage_kafka_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        shingles_native,
    )

    small = "the quick brown fox jumps"
    big = (
        small + " over the lazy dog while seventeen other animals watch "
        "from the fence and discuss the weather at considerable length"
    )
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=small), Row(doc_id=2, text=big)],
        "doc_id bigint, text string",
    )
    sh = shingles_native(docs)
    cand = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2, n_bands=1)],
        "doc_a bigint, doc_b bigint, n_bands bigint",
    )
    c = containment_pairs(sh, cand).collect()[0]
    assert c["containment_ab"] == 1.0
    assert c["containment_ba"] < 0.2
    j = jaccard_pairs(sh, cand).collect()[0]
    assert j["jaccard"] == c["containment_ba"]  # |A n B| = |A| here


def test_stream_lsh_registry_echoes_claim_nothing(spark):
    """The streaming registry's final state must equal the batch distinct
    band-bucket set: echo duplicates (batch two) may not add rows."""
    from zipkin_storage_kafka_spark.operators.dedup import (
        minhash_buckets_rowwise,
    )
    from zipkin_storage_kafka_spark.sources.tables import load_table
    from zipkin_storage_kafka_spark.streaming.jobs import (
        lsh_registry_via_stream,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["b"], r["bucket"])
        for r in lsh_registry_via_stream(spark, sf).collect()
    }
    docs = load_table(spark, sf, "documents")
    want = {
        (r["b"], r["bucket"])
        for r in minhash_buckets_rowwise(docs)
        .select("b", "bucket")
        .distinct()
        .collect()
    }
    assert got == want


def test_trace_path_signature_order_and_counts(spark):
    """Signature = FIRST-SEEN service order, not alphabetical: two traces
    visiting the same services in different orders must produce two
    different signatures; a repeat visit to a service does not repeat it
    in the path."""
    from zipkin_storage_kafka_spark.operators.trace_aggregation import (
        trace_path_signatures,
    )

    rows = [
        # t1: b (t=10) then a (t=20) then b again (t=30)
        ("t1", "s1", "b", 10), ("t1", "s2", "a", 20), ("t1", "s3", "b", 30),
        # t2: same set, opposite order
        ("t2", "s4", "a", 10), ("t2", "s5", "b", 20),
        # t3: identical path to t2
        ("t3", "s6", "a", 5), ("t3", "s7", "b", 9),
    ]
    spans = spark.createDataFrame(
        rows, "trace_id string, id string, local_service string, timestamp long"
    )
    got = {
        r["path_signature"]: (r["n_services"], r["n_traces"])
        for r in trace_path_signatures(spans).collect()
    }
    assert got == {"b>a": (2, 1), "a>b": (2, 2)}


def test_cosine_range_search_membership(spark):
    """Range semantics: everything at or above the radius, nothing below,
    query excluded."""
    from pyspark.sql import Row

    from zipkin_storage_kafka_spark.operators.similarity import (
        cosine_range_search,
    )

    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[1.0, 0.0]),     # cos 1.0
            Row(vec_id=2, embedding=[1.0, 1.0]),     # cos ~0.7071
            Row(vec_id=3, embedding=[0.0, 1.0]),     # cos 0.0
            Row(vec_id=4, embedding=[-1.0, 0.0]),    # cos -1.0
        ],
        "vec_id bigint, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["cos"]
        for r in cosine_range_search(emb, 0, 0.5).collect()
    }
    assert got == {1: 1.0, 2: 0.7071}


def test_source_hellinger_extremes(spark):
    """Identical sources -> BC 1 / H 0; disjoint vocabularies -> BC 0 /
    H 1; all pairs a < b exactly once."""
    from pyspark.sql import Row

    from zipkin_storage_kafka_spark.operators.text_analysis import (
        source_divergence,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="web", text="apple banana cherry"),
            Row(doc_id=2, source="mirror", text="apple banana cherry"),
            Row(doc_id=3, source="code", text="def return lambda"),
        ],
        "doc_id bigint, source string, text string",
    )
    got = {
        (r["source_a"], r["source_b"]): (r["bhattacharyya"], r["hellinger"])
        for r in source_divergence(docs).collect()
    }
    assert got[("mirror", "web")] == (1.0, 0.0)
    assert ("code", "mirror") not in got or got[("code", "mirror")][0] == 0.0
    # disjoint vocab pairs either share no bucket (absent row) or BC 0
    assert set(got) <= {("mirror", "web"), ("code", "mirror"), ("code", "web")}


def test_shard_plan_packing_fixture(spark):
    """Deterministic packing pinned by hand: shard = START offset div
    target, so a doc straddling a boundary belongs to the shard it
    starts in; NULL text counts zero bytes but still lands in a shard;
    totals conserve bytes."""
    from pyspark.sql import Row

    from zipkin_storage_kafka_spark.operators.text_analysis import (
        shard_plan,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x" * n) for i, n in
         [(1, 40), (2, 40), (3, 40), (4, 40), (5, 0)]]
        + [Row(doc_id=6, text=None)],
        "doc_id bigint, text string",
    )
    rows = shard_plan(docs, target_bytes=100).collect()
    total_docs = sum(r["n_docs"] for r in rows)
    total_bytes = sum(r["shard_bytes"] for r in rows)
    assert total_docs == 6 and total_bytes == 160
    # packing: cumulative starts are 0,40,80,120,... in md5(doc_id)
    # order; with target 100 the doc starting at 80 still goes to shard
    # 0 and the one at 120 to shard 1 — exactly two shards here
    by_shard = {r["shard_id"]: r for r in rows}
    assert set(by_shard) == {0, 1}
    assert by_shard[0]["n_docs"] + by_shard[1]["n_docs"] == 6


def test_shard_plan_no_global_window(spark, sf_dir):
    """The prefix sum must be the two-level distributed form: every
    window in the plan carries a partition spec (same pin as
    curriculum/ntile)."""
    import io
    from contextlib import redirect_stdout

    import __spark_entry__ as entrymod

    df = entrymod.queries()["pipe_shard_plan"](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    window_lines = [
        l
        for l in plan.splitlines()
        if "windowspecdefinition" in l and l.strip().startswith("Arguments:")
    ]
    assert window_lines, "plan should contain Window detail lines"
    bad = [l for l in window_lines if l.count("], [") < 2]
    assert not bad, bad


def test_ivf_balance_fixture(spark):
    """Two cells, 3-vs-1 occupancy: share and balance pinned by hand
    (balance 1.5 / 0.5, shares 0.75 / 0.25)."""
    from pyspark.sql import Row

    from zipkin_storage_kafka_spark.operators.similarity import ivf_balance

    # labels double as cells; vectors sit exactly on their centroids so
    # assignment is the identity
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, label=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, label=0, embedding=[1.0, 0.0]),
            Row(vec_id=2, label=0, embedding=[1.0, 0.0]),
            Row(vec_id=3, label=1, embedding=[0.0, 1.0]),
        ],
        "vec_id bigint, label int, embedding array<float>",
    )
    got = {
        r["cell"]: (r["n_vecs"], r["share"], r["balance"])
        for r in ivf_balance(emb).collect()
    }
    assert got == {0: (3, 0.75, 1.5), 1: (1, 0.25, 0.5)}


def test_minhash_estimate_identical_and_disjoint(spark):
    """Estimator semantics pinned: identical docs agree on all 8 minima
    (est 1.0, exact 1.0, err 0); near-identical docs estimate in
    granularity-1/8 steps and the error column is |est - exact|."""
    from pyspark.sql import Row

    from zipkin_storage_kafka_spark.operators.dedup import (
        minhash_estimate_audit,
        shingles_native,
    )

    t = ("the quick brown fox jumps over the lazy dog near the "
         "old barn tonight")
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=t),
            Row(doc_id=2, text=t),
            Row(doc_id=3, text=t + " extra"),
        ],
        "doc_id bigint, text string",
    )
    cand = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2, n_bands=4), Row(doc_a=1, doc_b=3, n_bands=1)],
        "doc_a bigint, doc_b bigint, n_bands bigint",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in minhash_estimate_audit(
            docs, shingles_native(docs), cand
        ).collect()
    }
    r12 = got[(1, 2)]
    assert (r12["est_jaccard"], r12["jaccard"], r12["abs_err"]) == (
        1.0, 1.0, 0.0,
    )
    r13 = got[(1, 3)]
    assert r13["est_jaccard"] in {i / 8 for i in range(9)}
    assert r13["abs_err"] == round(
        abs(r13["est_jaccard"] - r13["jaccard"]), 4
    )


def test_reembed_queue_reasons(spark):
    """Queue composition pinned: added/changed docs always queue;
    an unchanged doc queues only when its vector is missing; removed
    docs never queue."""
    from pyspark.sql import Row

    from zipkin_storage_kafka_spark.operators.corpus import reembed_queue

    diff = spark.createDataFrame(
        [
            Row(doc_id=1, status="unchanged"),   # has vector -> absent
            Row(doc_id=2, status="unchanged"),   # no vector -> queued
            Row(doc_id=3, status="changed"),
            Row(doc_id=4, status="added"),
            Row(doc_id=5, status="removed"),
        ],
        "doc_id bigint, status string",
    )
    emb = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.0]), Row(vec_id=5, embedding=[0.0])],
        "vec_id bigint, embedding array<float>",
    )
    got = {
        r["doc_id"]: r["reason"]
        for r in reembed_queue(diff, emb).collect()
    }
    assert got == {2: "missing_vector", 3: "changed", 4: "added"}


def test_stream_error_alerts_match_batch_having(spark):
    """The in-stream HAVING must equal the batch filter over the w5
    counter rows: alerts = exactly the windows crossing the integer
    threshold, with truncated basis points."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    qs = entrymod.queries()
    alerts = {
        (r["window_start_ms"], r["parent"], r["child"]): (
            r["call_count"], r["error_count"], r["error_pct_x100"]
        )
        for r in qs["w9_stream_error_alerts"](spark, sf).collect()
    }
    base = qs["w5_stream_dependency_windows"](spark, sf).collect()
    want = {}
    for r in base:
        if r["call_count"] >= 1 and r["error_count"] * 100 >= r["call_count"] * 50:
            want[(r["window_start_ms"], r["parent"], r["child"])] = (
                r["call_count"],
                r["error_count"],
                int(r["error_count"] * 10000 / r["call_count"]),
            )
    assert alerts == want


def test_centroid_outliers_fixture(spark):
    """A vector orthogonal to its own (dominant) cell centroid flags as
    an outlier; on-centroid members do not."""
    from pyspark.sql import Row

    from zipkin_storage_kafka_spark.operators.similarity import (
        centroid_outliers,
    )

    emb = spark.createDataFrame(
        [
            Row(vec_id=0, label=0, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=1, label=0, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=2, label=0, embedding=[1.0, 0.1, 0.0]),
            Row(vec_id=3, label=1, embedding=[0.0, 1.0, 0.0]),
            Row(vec_id=4, label=1, embedding=[0.0, 1.0, 0.1]),
            # garbage row: anti-aligned with its label's centroid, so the
            # argmax re-assigns it to the OTHER cell, where its cosine is
            # exactly 0 -> outlier (note a label-0 vector contributes to
            # label-0's centroid, so a merely-orthogonal vector drags its
            # own centroid toward itself and stops being an outlier)
            Row(vec_id=5, label=0, embedding=[-1.0, 0.0, 0.0]),
        ],
        "vec_id bigint, label int, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["is_outlier"], r["centroid_cos"])
        for r in centroid_outliers(emb).collect()
    }
    assert len(got) == 6
    assert got[0][0] is False and got[0][1] > 0.9
    assert got[5] == (True, 0.0)


def test_link_window_diff_statuses(spark):
    """All four edge statuses pinned by hand across the split."""
    from zipkin_storage_kafka_spark.operators.dependency_links import (
        link_window_diff,
    )

    rows = [
        # (trace, parent, child, is_error, ts)   split at 100
        ("t", "a", "b", False, 50), ("t", "a", "b", False, 150),  # steady
        ("t", "a", "c", False, 50), ("t", "a", "c", True, 150),
        ("t", "a", "c", False, 160),                              # changed
        ("t", "d", "e", False, 50),                               # removed
        ("t", "f", "g", True, 150),                               # added
    ]
    links = spark.createDataFrame(
        rows,
        "trace_id string, parent string, child string, "
        "is_error boolean, timestamp long",
    )
    got = {
        (r["parent"], r["child"]): (
            r["status"], r["calls_before"], r["calls_after"],
            r["errors_before"], r["errors_after"],
        )
        for r in link_window_diff(links, 100).collect()
    }
    assert got[("a", "b")] == ("steady", 1, 1, 0, 0)
    assert got[("a", "c")] == ("changed", 1, 2, 0, 1)
    assert got[("d", "e")] == ("removed", 1, 0, 0, 0)
    assert got[("f", "g")] == ("added", 0, 1, 0, 1)


def test_latency_shift_null_for_one_sided_service(spark):
    """A service active only after the split reports NULL before-side
    percentiles and NULL shift — never a fabricated zero."""
    from zipkin_storage_kafka_spark.operators.indexes import latency_shift

    rows = [
        ("t1", "s1", "svc_old", 10, 50),
        ("t1", "s2", "svc_old", 20, 150),
        ("t1", "s3", "svc_new", 30, 150),
        ("t1", "s4", "svc_new", 40, 160),
    ]
    spans = spark.createDataFrame(
        rows,
        "trace_id string, id string, local_service string, "
        "duration long, timestamp long",
    )
    got = {
        r["local_service"]: r for r in latency_shift(spans, 100).collect()
    }
    new = got["svc_new"]
    assert new["n_before"] == 0 and new["n_after"] == 2
    assert new["p50_before"] is None and new["p50_shift"] is None
    assert new["p50_after"] == 35.0
    old = got["svc_old"]
    assert old["n_before"] == 1 and old["n_after"] == 1
    assert old["p50_shift"] == 10.0


def test_error_paths_fixture(spark):
    """Path accumulation pinned on a 4-deep chain with a branch: the
    error leaf reports the FULL root->leaf service chain in order; an
    error at the root reports just the root service; non-error spans
    contribute nothing."""
    from zipkin_storage_kafka_spark.operators.trace_aggregation import (
        error_paths,
    )

    rows = [
        # chain a -> b -> c -> d (error at d), branch a -> e (error at e)
        ("t1", "s1", None, "svc_a", False),
        ("t1", "s2", "s1", "svc_b", False),
        ("t1", "s3", "s2", "svc_c", False),
        ("t1", "s4", "s3", "svc_d", True),
        ("t1", "s5", "s1", "svc_e", True),
        # root error in a second trace
        ("t2", "s6", None, "svc_r", True),
        # same failing route as t1's leaf, different trace
        ("t3", "s7", None, "svc_a", False),
        ("t3", "s8", "s7", "svc_b", False),
        ("t3", "s9", "s8", "svc_c", False),
        ("t3", "s10", "s9", "svc_d", True),
    ]
    spans = spark.createDataFrame(
        rows,
        "trace_id string, id string, parent_id string, "
        "local_service string, is_error boolean",
    )
    got = {
        r["error_path"]: r["n_errors"]
        for r in error_paths(spans).collect()
    }
    assert got == {
        "svc_a>svc_b>svc_c>svc_d": 2,
        "svc_a>svc_e": 1,
        "svc_r": 1,
    }


def test_build_dedup_index_short_and_null_docs(spark):
    """The r12 single-projection index build guards the band array
    behind a CASE on word count (ANSI element_at throws on docs shorter
    than the shingle size).  Pin the guard's semantics: a short doc
    contributes EXACTLY its h row; a NULL-text doc contributes nothing;
    a normal doc contributes h + one row per band; and the shape equals
    the old h-UNION-bands form row for row."""
    import hashlib

    from zipkin_storage_kafka_spark.operators.dedup import (
        BANDS,
        build_dedup_index,
        minhash_buckets_rowwise,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="ab"),          # 1 word < NGRAM
            Row(doc_id=2, text="a b"),         # 2 words < NGRAM
            Row(doc_id=3, text=None),          # NULL text
            Row(
                doc_id=4,
                text="one two three four five six seven",
            ),
        ],
        "doc_id bigint, text string",
    )
    rows = build_dedup_index(docs).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["kind"], r["key"]))
    assert sorted(by_doc[1]) == [("h", hashlib.md5(b"ab").hexdigest())]
    assert sorted(by_doc[2]) == [("h", hashlib.md5(b"a b").hexdigest())]
    assert 3 not in by_doc
    kinds4 = sorted(k for k, _ in by_doc[4])
    assert kinds4 == sorted(["h"] + [f"b{b}" for b in range(BANDS)])

    # band keys must equal the reference rowwise-minima output exactly
    want = {
        (f"b{r['b']}", r["bucket"])
        for r in minhash_buckets_rowwise(
            docs.filter(F.col("doc_id") == 4)
        ).collect()
    }
    got = {(k, v) for k, v in by_doc[4] if k != "h"}
    assert got == want
