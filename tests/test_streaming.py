"""Streaming-layer tests mirroring the reference topology tests
(SpanAggregationTopologyTest / DependencyStorageTopologyTest choreography:
pipe records, advance stream time with an unrelated record, assert emission).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.streaming.jobs import (
    SPANS_STREAM_SCHEMA,
    dependency_counter_stream,
    index_stream,
    run_aggregation_pipeline,
    spans_stream_from_dir,
)

MICROS = 1_000_000


def _span(trace_id, sid, ts_s, parent=None, svc="svc_a", name="op_a",
          kind="CLIENT", error=False):
    return Row(
        trace_id=trace_id, id=sid, parent_id=parent, kind=kind, name=name,
        timestamp=ts_s * MICROS, duration=1000, local_service=svc,
        remote_service=None, tag_k="1", env="dev", is_error=error,
    )


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": str(tmp_path / "in"),
        "traces": str(tmp_path / "traces"),
        "links": str(tmp_path / "links"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["in"])
    return d


def _write_batch(spark, path, rows, name):
    """Write ONE flat parquet file (the file stream source reads files, not
    subdirectories — Spark's own writer would create a directory)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = [f.name for f in SPANS_STREAM_SCHEMA.fields]
    data = {c: [getattr(r, c) for r in rows] for c in cols}
    schema = pa.schema(
        [
            (c, pa.int64() if c in ("timestamp", "duration")
             else pa.bool_() if c == "is_error" else pa.string())
            for c in cols
        ]
    )
    fpath = os.path.join(path, f"{name}.parquet")
    pq.write_table(pa.Table.from_pydict(data, schema=schema), fpath)
    # the file source orders by modification time — make it explicit so
    # arrival order in tests is deterministic (files written sub-second)
    seq = int(name.strip("batch").strip("b"))
    t = 1_000_000_000 + seq * 100
    os.utime(fpath, (t, t))


def test_session_close_emits_trace_and_links(spark, dirs):
    """Fixture 1 (FIXTURES.md section 5): two spans, same trace, within the
    gap -> ONE trace [a,b] and one link svc_a->svc_b, emitted only after
    stream time passes the gap (flushed by an unrelated later record,
    mirroring SpanAggregationTopologyTest.java:84-93)."""
    base = 1_700_000_000
    _write_batch(spark, dirs["in"], [
        _span("a", "1", base, svc="svc_a", name="op_a", kind="CLIENT"),
        _span("a", "2", base + 1, parent="1", svc="svc_b", name="op_b",
              kind="SERVER"),
    ], "batch1")
    # unrelated record 10 min later advances the watermark past the session
    _write_batch(spark, dirs["in"], [
        _span("zz", "9", base + 600, svc="svc_z"),
    ], "batch2")

    run_aggregation_pipeline(
        spark, dirs["in"], dirs["traces"], dirs["links"], dirs["ckpt"]
    )

    traces = spark.read.parquet(dirs["traces"])
    got = {r["trace_id"]: r for r in traces.collect()}
    assert "a" in got, "closed session for trace a must be emitted"
    assert got["a"]["span_count"] == 2
    assert [s["id"] for s in got["a"]["spans"]] == ["1", "2"]
    # the flush trace's session never closes -> exactly-once, no partial emit
    assert "zz" not in got

    links = spark.read.parquet(dirs["links"])
    link_rows = links.collect()
    assert len(link_rows) == 1
    assert (link_rows[0]["parent"], link_rows[0]["child"]) == ("svc_a", "svc_b")


def test_late_fragment_dropped_by_aggregation(spark, dirs):
    """W5: a fragment arriving after its session closed is dropped by the
    aggregation stream (grace 0 == zero watermark delay)."""
    base = 1_700_000_000
    _write_batch(spark, dirs["in"], [_span("a", "1", base)], "b1")
    _write_batch(spark, dirs["in"], [_span("zz", "9", base + 600, svc="svc_z")], "b2")
    # second advance: the watermark from b2 evicts + emits trace a HERE
    _write_batch(spark, dirs["in"], [_span("xx", "7", base + 700, svc="svc_x")], "b3")
    # late fragment for trace a arrives after its session was evicted
    _write_batch(spark, dirs["in"], [_span("a", "2", base + 1, parent="1")], "b4")
    # another flush record even later
    _write_batch(spark, dirs["in"], [_span("yy", "8", base + 1200, svc="svc_y")], "b5")

    run_aggregation_pipeline(
        spark, dirs["in"], dirs["traces"], dirs["links"], dirs["ckpt"]
    )
    traces = spark.read.parquet(dirs["traces"])
    a_rows = traces.filter(F.col("trace_id") == "a").collect()
    assert len(a_rows) == 1
    assert a_rows[0]["span_count"] == 1, "late fragment must not reopen session"


def test_dependency_counter_stream(spark, tmp_path):
    """Fixture 2: same link twice within one 1-min bucket -> call_count 2
    (DependencyStorageTopologyTest.java:79-90)."""
    links_in = str(tmp_path / "links_in")
    base_ms = 1_700_000_000_000
    rows = [
        Row(parent="svc_a", child="svc_b", is_error=False, ts_ms=base_ms),
        Row(parent="svc_a", child="svc_b", is_error=True, ts_ms=base_ms + 1000),
        Row(parent="svc_a", child="svc_b", is_error=False,
            ts_ms=base_ms + 600_000),  # different bucket (and flushes first)
    ]
    spark.createDataFrame(rows).coalesce(1).write.parquet(links_in)

    stream = (
        spark.readStream.schema("parent string, child string, is_error boolean, ts_ms long")
        .parquet(links_in)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
    )
    counters = dependency_counter_stream(stream)
    q = (
        counters.writeStream.outputMode("append")
        .format("memory")
        .queryName("dep_counters")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {
        r["window_start_ms"]: r
        for r in spark.sql("select * from dep_counters").collect()
    }
    first_bucket = (base_ms // 60_000) * 60_000
    assert out[first_bucket]["call_count"] == 2
    assert out[first_bucket]["error_count"] == 1


def test_index_stream_complete_mode(spark, tmp_path):
    """Fixture 3: name indexes accumulate distinct sets; storage path has
    no watermark so even 'late' spans are indexed (W5 split)."""
    spans_in = str(tmp_path / "spans_in")
    base = 1_700_000_000
    rows = [
        _span("a", "1", base, svc="svc_a", name="op_a"),
        _span("a", "2", base + 1, svc="svc_b", name="op_b"),
        _span("b", "3", base - 10_000, svc="svc_a", name="op_a"),  # very late
    ]
    spark.createDataFrame(rows, SPANS_STREAM_SCHEMA).coalesce(1).write.parquet(
        spans_in
    )
    stream = spark.readStream.schema(SPANS_STREAM_SCHEMA).parquet(spans_in)
    q = (
        index_stream(stream, "span_names")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("span_names_idx")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["service_name"]: sorted(r["names"])
        for r in spark.sql("select * from span_names_idx").collect()
    }
    assert got == {"svc_a": ["op_a"], "svc_b": ["op_b"]}


def test_streaming_exact_dedup(spark, tmp_path):
    """Streaming dedup twin: identical content within the watermark horizon
    is dropped; distinct content passes.  State is keyed by content hash
    and watermark-evicted (bounded, W4 discipline)."""
    from zipkin_storage_kafka_spark.streaming.jobs import streaming_exact_dedup

    docs_in = str(tmp_path / "docs_in")
    base_ms = 1_700_000_000_000
    rows = [
        Row(doc_id=1, text="hello world", ts_ms=base_ms),
        Row(doc_id=2, text="hello world", ts_ms=base_ms + 1_000),   # dup
        Row(doc_id=3, text="something else", ts_ms=base_ms + 2_000),
        Row(doc_id=4, text="hello world", ts_ms=base_ms + 3_000),   # dup
    ]
    spark.createDataFrame(rows).coalesce(1).write.parquet(docs_in)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts_ms long")
        .parquet(docs_in)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
    )
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from dedup_out").collect()
    assert len(out) == 2
    assert {r["text"] for r in out} == {"hello world", "something else"}


def test_streaming_minhash_dedup(spark, tmp_path):
    """Near-dup dedup keyed by the full MinHash signature: docs with equal
    shingle-set signatures collapse to the first arrival; distinct docs
    pass.  The signature stage is stateless (rowwise, no shuffle); the one
    stateful op is signature-keyed dropDuplicatesWithinWatermark."""
    from zipkin_storage_kafka_spark.streaming.jobs import (
        streaming_minhash_dedup,
    )

    docs_in = str(tmp_path / "mh_in")
    base_ms = 1_700_000_000_000
    text_a = "the quick brown fox jumps over the lazy dog"
    text_b = "an entirely different document about spark structured streaming"
    rows = [
        Row(doc_id=1, text=text_a, ts_ms=base_ms),
        Row(doc_id=2, text=text_a, ts_ms=base_ms + 1_000),  # same signature
        Row(doc_id=3, text=text_b, ts_ms=base_ms + 2_000),
        Row(doc_id=4, text=text_a, ts_ms=base_ms + 3_000),  # same signature
        Row(doc_id=5, text="too short", ts_ms=base_ms + 4_000),  # < NGRAM words
    ]
    spark.createDataFrame(rows).coalesce(1).write.parquet(docs_in)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts_ms long")
        .parquet(docs_in)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
    )
    q = (
        streaming_minhash_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("mh_dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck_mh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from mh_dedup_out").collect()
    assert {r["text"] for r in out} == {text_a, text_b}
    assert len(out) == 2


def test_streaming_lsh_bucket_registry_idempotent(spark, tmp_path):
    """The bucket registry emits each (band, bucket) once: feeding the same
    corpus in a second microbatch adds zero rows, and the emitted bucket set
    equals the batch operator's distinct bucket set."""
    from zipkin_storage_kafka_spark.operators.dedup import (
        minhash_buckets_rowwise,
    )
    from zipkin_storage_kafka_spark.streaming.jobs import (
        streaming_lsh_bucket_registry,
    )

    docs_in = tmp_path / "reg_in"
    docs_in.mkdir()
    base_ms = 1_700_000_000_000
    corpus = [
        Row(doc_id=1, text="alpha beta gamma delta epsilon", ts_ms=base_ms),
        Row(doc_id=2, text="one two three four five six", ts_ms=base_ms + 1000),
        Row(doc_id=3, text="alpha beta gamma delta epsilon", ts_ms=base_ms + 2000),
    ]
    batch_df = spark.createDataFrame(corpus)
    batch_df.coalesce(1).write.parquet(str(docs_in / "f1"))

    reg_out = str(tmp_path / "reg_out")

    def run_once():
        # file sink (memory sink cannot resume from a checkpoint)
        stream = (
            spark.readStream.schema("doc_id long, text string, ts_ms long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(docs_in) + "/*")
            .withColumn("ts", F.timestamp_millis("ts_ms"))
        )
        q = (
            streaming_lsh_bucket_registry(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", reg_out)
            .option("checkpointLocation", str(tmp_path / "ck_reg"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(reg_out).collect()

    first = run_once()

    # second run: replay the same corpus (new file, later arrival) against
    # the same checkpoint — the registry state survives the restart
    batch_df.coalesce(1).write.parquet(str(docs_in / "f2"))
    second = run_once()
    assert len(second) == len(first)  # replayed corpus owns no new buckets

    batch_buckets = {
        (r["b"], r["bucket"])
        for r in minhash_buckets_rowwise(
            batch_df.withColumnRenamed("ts_ms", "_")
        ).collect()
    }
    assert {(r["b"], r["bucket"]) for r in first} == batch_buckets


def test_sketch_stream_matches_batch_sketch(spark, tmp_path):
    """The windowed streaming sketch must produce the exact same bucket
    counts and estimates as the batch formula over the same rows — the
    sketch is deterministic, so stream/batch parity is equality."""
    from zipkin_storage_kafka_spark.operators.sketches import (
        linear_count_estimate,
    )
    from zipkin_storage_kafka_spark.streaming.jobs import sketch_stream

    src = str(tmp_path / "sketch_in")
    base_ms = 1_700_000_000_000
    rows = [
        Row(trace_id=f"t{i % 7}", local_service=f"svc_{i % 2}",
            ts_ms=base_ms + (i % 3) * 1000)
        for i in range(50)
    ] + [
        # late-window flusher: advances the watermark past the first window
        Row(trace_id="t_flush", local_service="svc_9",
            ts_ms=base_ms + 600_000),
    ]
    spark.createDataFrame(rows).coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema("trace_id string, local_service string, ts_ms long")
        .parquet(src)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
    )
    q = (
        sketch_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sketch_out")
        .option("checkpointLocation", str(tmp_path / "ck_sketch"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start_ms, r.local_service): (r.n_buckets, r.est_traces)
        for r in spark.sql("select * from sketch_out").collect()
        if r.local_service != "svc_9"
    }

    batch = (
        spark.read.parquet(src)
        .filter(F.col("local_service") != "svc_9")
        .withColumn(
            "window_start_ms", (F.col("ts_ms") / 60000).cast("long") * 60000
        )
        .groupBy("window_start_ms", "local_service")
        .agg(
            F.count_distinct(
                F.substring(F.md5(F.col("trace_id")), 1, 4)
            ).cast("int").alias("n_buckets")
        )
        .select(
            "window_start_ms",
            "local_service",
            "n_buckets",
            linear_count_estimate(F.col("n_buckets")).alias("est_traces"),
        )
    )
    want = {
        (r.window_start_ms, r.local_service): (r.n_buckets, r.est_traces)
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 2  # 2 services in the closed first window


def test_error_rate_alert_stream_matches_batch(spark, tmp_path):
    """The alert stream must emit exactly the rows the identical BATCH
    filter produces over the same input (stream==batch semantics), and
    only for windows crossing the integer threshold."""
    from zipkin_storage_kafka_spark.streaming.jobs import (
        error_rate_alert_stream,
    )

    links_in = str(tmp_path / "alert_links_in")
    base_ms = 1_700_000_000_000
    rows = [
        # bucket 1: 2 calls, 1 error -> 50% >= 50% -> alert
        Row(parent="svc_a", child="svc_b", is_error=True, ts_ms=base_ms),
        Row(parent="svc_a", child="svc_b", is_error=False, ts_ms=base_ms + 1),
        # bucket 1, other edge: 2 calls, 0 errors -> no alert
        Row(parent="svc_a", child="svc_c", is_error=False, ts_ms=base_ms),
        Row(parent="svc_a", child="svc_c", is_error=False, ts_ms=base_ms + 2),
        # bucket 2: single call with error -> below min_calls -> no alert
        Row(parent="svc_a", child="svc_b", is_error=True,
            ts_ms=base_ms + 120_000),
    ]
    spark.createDataFrame(rows).coalesce(1).write.parquet(links_in)
    schema = "parent string, child string, is_error boolean, ts_ms long"

    stream = (
        spark.readStream.schema(schema)
        .parquet(links_in)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
    )
    q = (
        error_rate_alert_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("alerts")
        .option("checkpointLocation", str(tmp_path / "alert_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from alerts").collect()
    assert len(got) == 1
    alert = got[0]
    assert (alert["parent"], alert["child"]) == ("svc_a", "svc_b")
    assert alert["call_count"] == 2 and alert["error_count"] == 1
    assert alert["error_pct_x100"] == 5000
    # batch twin over the same files
    batch = (
        spark.read.schema(schema)
        .parquet(links_in)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
    )
    batch_rows = error_rate_alert_stream(batch).collect()
    assert sorted(map(tuple, batch_rows)) == sorted(map(tuple, got))


def test_stream_dedup_driver_row_drops_echoes(spark, sf_dir):
    """w2_stream_dedup: the runner injects one echo per 5th doc; the
    completed stream must emit exactly the corpus-wide distinct texts —
    i.e. every echo (and nothing else) dropped."""
    from pyspark.sql import functions as F

    from zipkin_storage_kafka_spark.streaming.jobs import (
        deduped_docs_via_stream,
    )

    out = deduped_docs_via_stream(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_echoes = docs.filter(F.col("doc_id") % 5 == 0).count()
    assert n_echoes > 0  # the duplicate injection is live, not a no-op
    assert out.count() == docs.select("text").distinct().count()
    assert set(out.columns) == {"text_hash", "n_chars"}


def test_checkpoint_recovery_dedup_state_survives_restart(spark, tmp_path):
    """W7 exactly-once, demonstrated across a RESTART: run the dedup
    stream to completion, stop it, append new input containing a
    cross-run duplicate, and resume from the SAME checkpoint.  The second
    run must (a) reprocess nothing from run 1 (no duplicate emissions)
    and (b) still drop the cross-run duplicate — i.e. the
    dropDuplicatesWithinWatermark state store was recovered from the
    checkpoint, not rebuilt empty."""
    from zipkin_storage_kafka_spark.streaming.jobs import streaming_exact_dedup

    docs_in = tmp_path / "docs_in"
    docs_in.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")
    base_ms = 1_700_000_000_000

    def run_once(rows, fname):
        # write each batch as its own file so run 2 sees only new files
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pylist([r.asDict() for r in rows]),
            str(docs_in / fname),
        )
        stream = (
            spark.readStream.schema("doc_id long, text string, ts_ms long")
            .parquet(str(docs_in))
            .withColumn("ts", F.timestamp_millis("ts_ms"))
        )
        q = (
            streaming_exact_dedup(stream)
            .select("doc_id", "text")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(
        [
            Row(doc_id=1, text="alpha", ts_ms=base_ms),
            Row(doc_id=2, text="beta", ts_ms=base_ms + 1_000),
            Row(doc_id=3, text="alpha", ts_ms=base_ms + 2_000),  # in-run dup
        ],
        "a.parquet",
    )
    first = spark.read.parquet(sink).collect()
    assert {r["text"] for r in first} == {"alpha", "beta"}
    assert len(first) == 2

    run_once(
        [
            Row(doc_id=4, text="alpha", ts_ms=base_ms + 3_000),  # CROSS-run dup
            Row(doc_id=5, text="gamma", ts_ms=base_ms + 4_000),  # new
        ],
        "b.parquet",
    )
    final = spark.read.parquet(sink).collect()
    texts = sorted(r["text"] for r in final)
    # run 2 emitted ONLY gamma: alpha was dropped by recovered state and
    # run-1 rows were not reprocessed
    assert texts == ["alpha", "beta", "gamma"]
    assert {r["doc_id"] for r in final} == {1, 2, 5}


def test_stream_links_conservation_vs_batch(spark, sf_dir):
    """The streaming topology derives links from each EMITTED trace
    session, so a parent/child pair straddling a session split produces
    no link — exactly the reference's behavior when spans arrive more
    than traceTimeout apart.  Conservation: batch whole-trace link count
    == streamed link count + straddling-pair count (independently
    derived via batch gaps-and-islands), and on this gap-heavy corpus
    the straddle count is non-zero (the semantics are exercised, not
    vacuously equal)."""
    from pyspark.sql import Window

    from zipkin_storage_kafka_spark.sources.spans import spans_from_events
    from zipkin_storage_kafka_spark.streaming.jobs import links_via_stream

    spans = spans_from_events(spark, sf_dir)
    c = spans.alias("c")
    p = spans.alias("p")
    batch_total = c.join(
        p,
        (F.col("c.trace_id") == F.col("p.trace_id"))
        & (F.col("c.parent_id") == F.col("p.id")),
    ).count()

    w = Window.partitionBy("trace_id").orderBy("timestamp")
    sessed = spans.withColumn(
        "new_sess",
        (
            (F.col("timestamp") - F.lag("timestamp").over(w)) >= 60_000_000
        ).cast("int"),
    ).withColumn(
        "sess_id",
        F.sum(F.coalesce(F.col("new_sess"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sc = sessed.alias("sc")
    sp = sessed.alias("sp")
    straddling = sc.join(
        sp,
        (F.col("sc.trace_id") == F.col("sp.trace_id"))
        & (F.col("sc.parent_id") == F.col("sp.id"))
        & (F.col("sc.sess_id") != F.col("sp.sess_id")),
    ).count()

    streamed_total = (
        links_via_stream(spark, sf_dir)
        .agg(F.sum("call_count"))
        .collect()[0][0]
    )
    assert straddling > 0
    assert streamed_total + straddling == batch_total


def test_links_sink_idempotent_under_epoch_retry(spark, dirs):
    """W7 exactly-once under the REAL failure mode: foreachBatch re-runs
    an epoch whose sink write landed but whose checkpoint commit did not.
    Simulated faithfully — delete the newest commit marker from the
    checkpoint and restart the same pipeline, forcing Structured
    Streaming to re-execute that epoch.  The epoch-keyed overwrite sink
    must absorb the replay; a blind append sink would duplicate every
    row of the replayed epoch."""
    base = 1_700_000_000
    _write_batch(spark, dirs["in"], [
        _span("a", "1", base, svc="svc_a", name="op_a", kind="CLIENT"),
        _span("a", "2", base + 1, parent="1", svc="svc_b", name="op_b",
              kind="SERVER"),
    ], "batch1")
    _write_batch(spark, dirs["in"], [
        _span("zz", "9", base + 600, svc="svc_z"),
    ], "batch2")

    run_aggregation_pipeline(
        spark, dirs["in"], dirs["traces"], dirs["links"], dirs["ckpt"]
    )

    def _snapshot():
        links = spark.read.parquet(dirs["links"])
        traces = spark.read.parquet(dirs["traces"])
        return (
            sorted(
                (r["trace_id"], r["parent"], r["child"])
                for r in links.collect()
            ),
            sorted(
                (r["trace_id"], r["span_count"]) for r in traces.collect()
            ),
        )

    before = _snapshot()
    assert len(before[0]) == 1  # the svc_a->svc_b link, exactly once

    # drop the newest commit marker: the epoch's writes survived, its
    # commit didn't — the restart below must re-execute exactly that epoch
    commits_dir = os.path.join(dirs["ckpt"], "commits")
    newest = max(
        (f for f in os.listdir(commits_dir) if f.isdigit()), key=int
    )
    os.remove(os.path.join(commits_dir, newest))
    crc = os.path.join(commits_dir, f".{newest}.crc")
    if os.path.exists(crc):  # local-FS checksum sibling blocks the rewrite
        os.remove(crc)

    def _sink_mtime():
        return max(
            os.path.getmtime(os.path.join(root, f))
            for root, _, files in os.walk(dirs["links"])
            for f in files
        )

    mtime_before = _sink_mtime()
    import time as _t

    _t.sleep(0.05)
    run_aggregation_pipeline(
        spark, dirs["in"], dirs["traces"], dirs["links"], dirs["ckpt"]
    )
    # the epoch really replayed (sink rewritten) ...
    assert _sink_mtime() > mtime_before, "replay did not re-execute"
    # ... and the rewrite absorbed it instead of duplicating
    assert _snapshot() == before, "replayed epoch must not duplicate rows"


def test_gap_micros_derivation():
    """Sentinel placement derives from the ONE gap string, so a
    non-default session gap can never desynchronize from the watermark
    advance (the silent-lost-sessions footgun)."""
    from zipkin_storage_kafka_spark.streaming.jobs import _gap_micros

    assert _gap_micros("1 minute") == 60_000_000
    assert _gap_micros("5 minutes") == 300_000_000
    assert _gap_micros("30 seconds") == 30_000_000
    assert _gap_micros("2 hours") == 7_200_000_000


def test_w10_restart_classifies_only_new_files(spark, tmp_path):
    """W10 exactly-once across a RESTART: classify run 1's snapshot
    files, stop, add a new file, resume from the SAME checkpoint — run 2
    must append classifications ONLY for the new file (no reprocessing
    of run-1 docs), and classification against the static index is
    unchanged by the restart."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zipkin_storage_kafka_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
    )

    old = spark.createDataFrame(
        [Row(doc_id=1, text="the old corpus document body text here")],
        "doc_id long, text string",
    )
    index = build_dedup_index(old)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")

    def run_once(rows, fname):
        pq.write_table(
            pa.Table.from_pylist([r.asDict() for r in rows]),
            str(in_dir / fname),
        )
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(in_dir)
        )

        def classify(batch_df, batch_id):
            incremental_dedup(index, batch_df).write.mode("append").parquet(
                sink
            )

        q = (
            stream.writeStream.foreachBatch(classify)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(
        [
            Row(doc_id=100, text="totally fresh unrelated writing one"),
            Row(doc_id=101, text="another new unmatched document body"),
        ],
        "a.parquet",
    )
    first = spark.read.parquet(sink).collect()
    assert len(first) == 2
    assert {r["status"] for r in first} == {"new"}

    run_once(
        [
            # exact re-ingest of the OLD corpus doc
            Row(doc_id=102, text="the old corpus document body text here"),
        ],
        "b.parquet",
    )
    final = spark.read.parquet(sink).collect()
    assert len(final) == 3  # run-1 docs NOT reprocessed
    by_id = {r["doc_id"]: (r["status"], r["matched_old_id"]) for r in final}
    assert by_id[102] == ("exact_dup", 1)
    assert by_id[100][0] == "new" and by_id[101][0] == "new"


def test_cm_grid_stream_equals_batch_grid(spark, sf_dir):
    """The streamed count-min grid must equal the batch grid EXACTLY —
    integer counter sums are commutative, so micro-batch boundaries
    cannot change the final state (the invariance the W11 row's oracle
    relies on), and every row's counters conserve the span total."""
    from pyspark.sql import functions as F

    from zipkin_storage_kafka_spark.operators.sketches import (
        CM_DEPTH,
        CM_WIDTH,
        _cm_bucket,
    )
    from zipkin_storage_kafka_spark.sources.spans import spans_from_events
    from zipkin_storage_kafka_spark.streaming.jobs import cm_grid_via_stream

    streamed = cm_grid_via_stream(spark, sf_dir)
    spans = spans_from_events(spark, sf_dir)
    batch = (
        spans.select(
            F.posexplode(
                F.array(
                    *[
                        _cm_bucket(
                            F.col("trace_id").cast("string"), r, CM_WIDTH
                        )
                        for r in range(CM_DEPTH)
                    ]
                )
            ).alias("r", "b")
        )
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = {(r["r"], r["b"]): r["c"] for r in streamed.collect()}
    want = {(r["r"], r["b"]): r["c"] for r in batch.collect()}
    assert got == want
    n_spans = spans.count()
    per_row = {}
    for (r, _b), c in got.items():
        per_row[r] = per_row.get(r, 0) + c
    assert per_row == {r: n_spans for r in range(CM_DEPTH)}


def test_stream_stream_join_across_batches(spark, dirs):
    """W12 stream-stream join: a match whose two sides arrive in
    DIFFERENT micro-batches (error span first, its root a batch later)
    must still emit — the buffered-state mechanism of the join — while
    an error outside the event-time range must not."""
    from zipkin_storage_kafka_spark.streaming.jobs import (
        spans_stream_from_dir,
    )

    # batch 1: error span at t=10s (root not yet seen) + an error far in
    # the future of t1's root (outside the 10-minute range)
    _write_batch(
        spark,
        dirs["in"],
        [
            _span("t1", "e1", 10, parent="r1", error=True),
            _span("t1", "e2", 10 + 11 * 60, parent="r1", error=True),
        ],
        "batch1",
    )
    # batch 2: the root at t=9s
    _write_batch(
        spark, dirs["in"], [_span("t1", "r1", 9, name="entry")], "batch2"
    )

    stream = spans_stream_from_dir(spark, dirs["in"], max_files_per_trigger=1)
    roots = (
        stream.filter(F.col("parent_id").isNull())
        .select(
            F.col("trace_id").alias("r_tid"),
            F.col("id").alias("root_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", "2 minutes")
    )
    errs = (
        stream.filter(F.col("is_error"))
        .select(
            F.col("trace_id").alias("e_tid"),
            F.col("id").alias("err_id"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "2 minutes")
    )
    joined = roots.join(
        errs,
        (F.col("e_tid") == F.col("r_tid"))
        & (F.col("e_ts") >= F.col("r_ts"))
        & (F.col("e_ts") <= F.col("r_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("root_id", "err_id")
    out = os.path.join(dirs["traces"], "joined")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r["root_id"], r["err_id"]) for r in spark.read.parquet(out).collect()}
    assert rows == {("r1", "e1")}


def test_stream_static_enrich_tiers_and_sentinels(spark, sf_dir):
    """W14 stream-static join: every emitted tier is a real bucket (the
    sentinel tier is dropped at read-back), all three tiers appear, and
    totals equal the batch corpus size (no span lost or duplicated by
    the join)."""
    from zipkin_storage_kafka_spark.sources.spans import spans_from_events
    from zipkin_storage_kafka_spark.streaming.jobs import (
        static_enriched_windows_via_stream,
    )

    out = static_enriched_windows_via_stream(spark, sf_dir)
    rows = out.collect()
    tiers = {r["tier"] for r in rows}
    assert tiers == {"tier_0", "tier_1", "tier_2"}
    n_stream = sum(r["n_spans"] for r in rows)
    n_batch = (
        spans_from_events(spark, sf_dir)
        .where(F.col("local_service").isNotNull())
        .count()
    )
    assert n_stream == n_batch
