"""Kafka source/sink builders — the production ingest/egress path
(S2/S3/S4/S5/S6 in SURVEY section 2.1).

The reference consumes/produces these topics (KafkaStorageBuilder.java:164,
226-228,439): ``zipkin-spans`` (key traceId, value span list),
``zipkin-trace`` (closed traces), ``zipkin-dependency`` (key parent:child,
value link JSON).  Its producer runs idempotent with 500 KB batches and
5 ms linger (KafkaStorageBuilder.java:167-171).

These builders translate that wiring onto Structured Streaming's Kafka
connector.  The container has no Kafka broker or connector jar, so the
builders construct (and tests assert) the reader/writer CONFIGURATION; the
``.load()``/``.start()`` call happens only in a deployment with
``spark-sql-kafka`` on the classpath — gate at that boundary, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.sources.json_spans import (
    JSON_V2_SCHEMA,
    json_v2_to_canonical,
)

SPANS_TOPIC = "zipkin-spans"  # KafkaStorageBuilder.java:226
TRACE_TOPIC = "zipkin-trace"  # :227
DEPENDENCY_TOPIC = "zipkin-dependency"  # :228

# Producer parity (KafkaStorageBuilder.java:167-171)
PRODUCER_OPTIONS = {
    "kafka.enable.idempotence": "true",
    "kafka.acks": "all",
    "kafka.batch.size": "500000",
    "kafka.linger.ms": "5",
}


def spans_reader_options(
    bootstrap_servers: str,
    topic: str = SPANS_TOPIC,
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def spans_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = SPANS_TOPIC,
    starting_offsets: str = "earliest",
):
    """S3: reader for the spans topic.  Returns the configured
    DataStreamReader — call ``.load()`` where the Kafka jar exists, then
    pipe through :func:`decode_spans_batch`."""
    reader = spark.readStream.format("kafka")
    for k, v in spans_reader_options(
        bootstrap_servers, topic, starting_offsets
    ).items():
        reader = reader.option(k, v)
    return reader


def decode_spans_batch(raw: DataFrame) -> DataFrame:
    """Kafka records -> canonical span rows.

    The reference's wire value is a PROTO3-encoded span LIST per record
    (SpansSerde.java:28); the engine ingests the JSON V2 equivalent (a JSON
    array per record — same content, public format).  ``from_json`` with an
    array schema + explode replaces SpanBytesDecoder.decodeList."""
    from pyspark.sql import types as T

    spans = raw.select(
        F.col("key").cast("string").alias("record_trace_id"),
        F.explode(
            F.from_json(
                F.col("value").cast("string"), T.ArrayType(JSON_V2_SCHEMA)
            )
        ).alias("s"),
    )
    return json_v2_to_canonical(spans.select("s.*"))


def traces_writer(closed_traces: DataFrame, bootstrap_servers: str):
    """S5: writer for closed traces, keyed by traceId (the topology's
    ``.to(traceTopic)`` — SpanAggregationTopology.java:92).  Returns the
    configured DataStreamWriter; ``.start()`` in deployment."""
    payload = closed_traces.select(
        F.col("trace_id").alias("key"),
        F.to_json(F.struct(*closed_traces.columns)).alias("value"),
    )
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", TRACE_TOPIC)
    )
    for k, v in PRODUCER_OPTIONS.items():
        writer = writer.option(k, v)
    return writer


def links_writer(links: DataFrame, bootstrap_servers: str):
    """S6: writer for per-trace links keyed ``parent:child``
    (SpanAggregationTopology.java:94-96, DependencyLinkSerde.java:15-19)."""
    payload = links.select(
        F.concat_ws(":", "parent", "child").alias("key"),
        F.to_json(F.struct(*links.columns)).alias("value"),
    )
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", DEPENDENCY_TOPIC)
    )
    for k, v in PRODUCER_OPTIONS.items():
        writer = writer.option(k, v)
    return writer
