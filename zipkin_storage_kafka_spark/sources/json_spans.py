"""Zipkin JSON V2 span ingestion (the wire format of POST /api/v2/spans).

The reference decodes this via zipkin2's SpanBytesDecoder (JSON_V2/PROTO3 —
serdes/SpansSerde.java:26-36); responses re-encode with camelCase field
names (KafkaStorageHttpService.java:261).  This reader maps the public JSON
V2 shape onto the engine's canonical snake_case SPAN_SCHEMA:

- camelCase -> snake_case field renames (JSON_V2_FIELD_MAP in schema.py)
- endpoint objects {serviceName, ipv4, ipv6, port}
- tags as a string map, annotations as {timestamp, value} structs
- trace-id normalization (lowercase hex, left-pad — zipkin2
  Span.normalizeTraceId semantics)

Explicit schema — no inference — so malformed documents null out instead of
corrupting column types, and the scan prunes unused fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zipkin_storage_kafka_spark.functions.zipkin import normalize_trace_id

_JSON_ENDPOINT = T.StructType(
    [
        T.StructField("serviceName", T.StringType()),
        T.StructField("ipv4", T.StringType()),
        T.StructField("ipv6", T.StringType()),
        T.StructField("port", T.IntegerType()),
    ]
)

JSON_V2_SCHEMA = T.StructType(
    [
        T.StructField("traceId", T.StringType()),
        T.StructField("parentId", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("duration", T.LongType()),
        T.StructField("localEndpoint", _JSON_ENDPOINT),
        T.StructField("remoteEndpoint", _JSON_ENDPOINT),
        T.StructField(
            "annotations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("timestamp", T.LongType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("debug", T.BooleanType()),
        T.StructField("shared", T.BooleanType()),
    ]
)


def _endpoint_to_canonical(col: F.Column) -> F.Column:
    return F.when(
        col.isNotNull(),
        F.struct(
            col.getField("serviceName").alias("service_name"),
            col.getField("ipv4").alias("ipv4"),
            col.getField("ipv6").alias("ipv6"),
            col.getField("port").alias("port"),
        ),
    )


def read_json_v2(spark: SparkSession, path: str) -> DataFrame:
    """Read Zipkin JSON V2 span files (one JSON array per file, or
    NDJSON of span objects) into the canonical SPAN_SCHEMA layout."""
    raw = spark.read.schema(JSON_V2_SCHEMA).option("multiLine", "true").json(path)
    return json_v2_to_canonical(raw)


def json_v2_to_canonical(raw: DataFrame) -> DataFrame:
    return raw.select(
        normalize_trace_id(F.col("traceId")).alias("trace_id"),
        F.lower(F.col("parentId")).alias("parent_id"),
        F.lower(F.col("id")).alias("id"),
        F.upper(F.col("kind")).alias("kind"),
        F.lower(F.col("name")).alias("name"),
        F.col("timestamp"),
        F.col("duration"),
        _endpoint_to_canonical(F.col("localEndpoint")).alias("local_endpoint"),
        _endpoint_to_canonical(F.col("remoteEndpoint")).alias("remote_endpoint"),
        F.col("annotations"),
        F.col("tags"),
        F.col("debug"),
        F.col("shared"),
    )


def canonical_to_scalar(spans: DataFrame) -> DataFrame:
    """Canonical nested layout -> the scalar layout the operators consume
    (FIXTURES.md section 1 columns)."""
    return spans.select(
        "trace_id",
        "id",
        "parent_id",
        "kind",
        "name",
        "timestamp",
        "duration",
        F.col("local_endpoint.service_name").alias("local_service"),
        F.col("remote_endpoint.service_name").alias("remote_service"),
        F.element_at("tags", "k").alias("tag_k"),
        F.element_at("tags", "environment").alias("env"),
        F.map_contains_key("tags", "error").alias("is_error"),
    )
