"""Canonical schemas: the Zipkin V2 Span and DependencyLink models.

The reference never defines these in-repo — it delegates to the public
zipkin2 library codecs (reference: storage/src/main/java/zipkin2/storage/
kafka/streams/serdes/SpansSerde.java:26-36 uses SpanBytesEncoder.PROTO3).
This module pins the engine's columnar equivalents (SURVEY.md section 1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

ENDPOINT_SCHEMA = T.StructType(
    [
        T.StructField("service_name", T.StringType()),
        T.StructField("ipv4", T.StringType()),
        T.StructField("ipv6", T.StringType()),
        T.StructField("port", T.IntegerType()),
    ]
)

ANNOTATION_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),  # epoch micros
        T.StructField("value", T.StringType()),
    ]
)

# One row per span.  timestamp/duration are epoch/elapsed MICROS (the
# reference converts micros->millis at store boundaries:
# TraceStorageTopology.java:116,167 — we keep micros canonical and derive).
SPAN_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), False),  # 16 or 32 lowercase hex
        T.StructField("parent_id", T.StringType()),  # nullable, 16 hex
        T.StructField("id", T.StringType(), False),  # 16 hex
        T.StructField("kind", T.StringType()),  # CLIENT|SERVER|PRODUCER|CONSUMER
        T.StructField("name", T.StringType()),  # lowercase op name
        T.StructField("timestamp", T.LongType()),  # epoch micros
        T.StructField("duration", T.LongType()),  # micros
        T.StructField("local_endpoint", ENDPOINT_SCHEMA),
        T.StructField("remote_endpoint", ENDPOINT_SCHEMA),
        T.StructField("annotations", T.ArrayType(ANNOTATION_SCHEMA)),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("debug", T.BooleanType()),
        T.StructField("shared", T.BooleanType()),
    ]
)

# zipkin2.DependencyLink {parent, child, callCount, errorCount}
# (reference: DependencyStorageTopology.java:92-95).
DEPENDENCY_LINK_SCHEMA = T.StructType(
    [
        T.StructField("parent", T.StringType(), False),
        T.StructField("child", T.StringType(), False),
        T.StructField("call_count", T.LongType(), False),
        T.StructField("error_count", T.LongType(), False),
    ]
)

# Zipkin JSON V2 wire field names (camelCase) -> engine columns (snake_case).
# Used by the JSON codec (reference responses: KafkaStorageHttpService.java:261).
JSON_V2_FIELD_MAP = {
    "traceId": "trace_id",
    "parentId": "parent_id",
    "id": "id",
    "kind": "kind",
    "name": "name",
    "timestamp": "timestamp",
    "duration": "duration",
    "localEndpoint": "local_endpoint",
    "remoteEndpoint": "remote_endpoint",
    "annotations": "annotations",
    "tags": "tags",
    "debug": "debug",
    "shared": "shared",
}
