"""A3 trace-upsert stream: late fragments still reach the stored trace
(TraceStorageTopology.java:96-126 semantics — the W5 split's storage side).
"""

from __future__ import annotations

import os

from zipkin_storage_kafka_spark.streaming.stateful import trace_upsert_stream
from zipkin_storage_kafka_spark.streaming.jobs import SPANS_STREAM_SCHEMA

from tests.test_streaming import _span, _write_batch


def test_upsert_accumulates_across_batches(spark, tmp_path):
    ind = str(tmp_path / "in")
    os.makedirs(ind)
    base = 1_700_000_000
    # batch 1: first fragment of trace a; batch 2: a LATE second fragment
    # (session-window aggregation would drop it; the upsert must not)
    _write_batch(spark, ind, [_span("a", "1", base)], "b1")
    _write_batch(spark, ind, [
        _span("a", "2", base + 1, parent="1"),
        _span("b", "9", base + 900, svc="svc_z"),
    ], "b2")

    stream = (
        spark.readStream.schema(SPANS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ind)
    )
    q = (
        trace_upsert_stream(stream, ttl=False)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("trace_store")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("select * from trace_store").collect()
    # update mode: one emission per touched trace per batch; the LAST
    # emission for trace a carries the accumulated state
    a_rows = sorted(
        (r for r in rows if r["trace_id"] == "a"),
        key=lambda r: r["last_updated_batch_count"],
    )
    assert a_rows[0]["span_count"] == 1
    assert a_rows[-1]["span_count"] == 2, "late fragment must be upserted"
    assert a_rows[-1]["span_ids"] == ["1", "2"]
    assert a_rows[-1]["trace_timestamp"] == base * 1_000_000
    # re-delivered span ids dedup (Trace.merge parity in the store)
    b_rows = [r for r in rows if r["trace_id"] == "b"]
    assert b_rows and b_rows[-1]["span_count"] == 1
