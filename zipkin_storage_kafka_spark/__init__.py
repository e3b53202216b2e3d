"""zipkin_storage_kafka_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of openzipkin-contrib/zipkin-storage-kafka.

The reference (read-only at /root/reference) is a Kafka-Streams storage
backend for Zipkin tracing: continuous aggregations spans -> traces ->
dependency links, materialized queryable stores, and a fixed query API
(SURVEY.md section 2).  This package re-expresses every one of those
capabilities Spark-first:

- ``schema``      — the canonical Span / DependencyLink StructTypes (the
                    reference's zipkin2 PROTO3 model, SURVEY section 1.2).
- ``functions``   — scalar helpers (trace-id normalization, micros/millis,
                    link keys, JSON codecs) as native Column expressions.
- ``sources``     — readers: parquet tables, Zipkin JSON V2 span files, and
                    the deterministic events->spans derivation used by tests.
- ``operators``   — trace aggregation, dependency linking, name/tag indexes,
                    plus the large-scale data-pipeline operators (dedup,
                    similarity search, text analysis, multimodal plumbing).
- ``plans``       — the query API surface (find_traces, get_trace,
                    get_dependencies, ... — SURVEY section 2.11).
- ``streaming``   — Structured Streaming topologies mirroring the
                    reference's three Kafka-Streams apps (SURVEY section 3.2).
"""

__version__ = "0.1.0"
