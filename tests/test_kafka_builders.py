"""Kafka wiring parity: reader/writer configuration and the JSON batch
decode path (no broker in the container — the .load()/.start() boundary is
exercised in deployment; everything up to it is tested here)."""

from __future__ import annotations

import json

from pyspark.sql import Row

from zipkin_storage_kafka_spark.streaming.kafka import (
    DEPENDENCY_TOPIC,
    PRODUCER_OPTIONS,
    SPANS_TOPIC,
    decode_spans_batch,
    spans_reader,
    spans_reader_options,
)


def test_reader_options(spark):
    opts = spans_reader_options("broker:9092")
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == SPANS_TOPIC
    assert opts["startingOffsets"] == "earliest"
    # the reader builder accepts the full option set without error
    assert spans_reader(spark, "broker:9092") is not None


def test_producer_parity_constants():
    # KafkaStorageBuilder.java:167-171: idempotent, 500 KB batches, 5 ms linger
    assert PRODUCER_OPTIONS["kafka.enable.idempotence"] == "true"
    assert PRODUCER_OPTIONS["kafka.batch.size"] == "500000"
    assert PRODUCER_OPTIONS["kafka.linger.ms"] == "5"
    assert DEPENDENCY_TOPIC == "zipkin-dependency"


def test_decode_spans_batch(spark):
    """A Kafka record value carrying a JSON V2 span array decodes into
    canonical span rows (SpanBytesDecoder.decodeList equivalent)."""
    value = json.dumps(
        [
            {
                "traceId": "000000000000000a",
                "id": "1",
                "name": "GET",
                "timestamp": 1,
                "localEndpoint": {"serviceName": "svc_a"},
            },
            {
                "traceId": "000000000000000a",
                "id": "2",
                "parentId": "1",
                "timestamp": 2,
                "localEndpoint": {"serviceName": "svc_b"},
            },
        ]
    )
    raw = spark.createDataFrame(
        [Row(key=bytearray(b"a"), value=bytearray(value.encode()))]
    )
    decoded = decode_spans_batch(raw).collect()
    assert len(decoded) == 2
    assert {r["id"] for r in decoded} == {"1", "2"}
    assert decoded[0]["trace_id"] == "000000000000000a"
    assert decoded[0]["local_endpoint"]["service_name"] in ("svc_a", "svc_b")
