"""JSON V2 codec round-trip on a hand-authored golden trace (the public
Zipkin wire format — shaped like the openzipkin example traces used by the
reference's smoke tests, authored fresh here)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.functions.zipkin import span_to_json_v2
from zipkin_storage_kafka_spark.operators import aggregate_traces, dependency_links
from zipkin_storage_kafka_spark.sources.json_spans import (
    canonical_to_scalar,
    read_json_v2,
)

GOLDEN = [
    {
        "traceId": "5AF7183FB1D4CF5F",  # uppercase, 16 hex -> normalized
        "id": "6B221D5BC9E6496C",
        "kind": "CLIENT",
        "name": "GET",
        "timestamp": 1472470996199000,
        "duration": 207000,
        "localEndpoint": {"serviceName": "frontend", "ipv4": "127.0.0.1"},
        "remoteEndpoint": {"serviceName": "backend", "port": 9000},
        "tags": {"http.path": "/api", "environment": "dev"},
    },
    {
        "traceId": "5af7183fb1d4cf5f",
        "parentId": "6b221d5bc9e6496c",
        "id": "352bff9a74ca9ad2",
        "kind": "SERVER",
        "name": "get /api",
        "timestamp": 1472470996238000,
        "duration": 167000,
        "localEndpoint": {"serviceName": "backend", "ipv4": "192.168.99.101"},
        "shared": True,
        "tags": {"error": "500"},
    },
]


def test_json_v2_roundtrip(spark, tmp_path):
    path = str(tmp_path / "trace.json")
    with open(path, "w") as f:
        json.dump(GOLDEN, f)

    spans = read_json_v2(spark, path)
    rows = {r["id"]: r for r in spans.collect()}
    assert set(rows) == {"6b221d5bc9e6496c", "352bff9a74ca9ad2"}
    client = rows["6b221d5bc9e6496c"]
    assert client["trace_id"] == "5af7183fb1d4cf5f"  # normalized lowercase
    assert client["local_endpoint"]["service_name"] == "frontend"
    assert client["remote_endpoint"]["port"] == 9000
    assert client["tags"]["environment"] == "dev"
    server = rows["352bff9a74ca9ad2"]
    assert server["shared"] is True
    assert server["parent_id"] == "6b221d5bc9e6496c"

    # scalar layout feeds the operator pipeline directly
    scalar = canonical_to_scalar(spans)
    traces = aggregate_traces(scalar).collect()
    assert len(traces) == 1 and traces[0]["span_count"] == 2
    links = dependency_links(scalar).collect()
    assert len(links) == 1
    assert (links[0]["parent"], links[0]["child"]) == ("frontend", "backend")
    assert links[0]["is_error"] is True  # error tag on the server span

    # encode back to the camelCase wire shape
    encoded = spans.select(
        span_to_json_v2(F.struct(*spans.columns)).alias("j")
    ).collect()
    decoded = [json.loads(r["j"]) for r in encoded]
    by_id = {d["id"]: d for d in decoded}
    assert by_id["6b221d5bc9e6496c"]["traceId"] == "5af7183fb1d4cf5f"
    assert by_id["6b221d5bc9e6496c"]["localEndpoint"]["serviceName"] == "frontend"
    assert "parentId" not in by_id["6b221d5bc9e6496c"]  # nulls dropped
