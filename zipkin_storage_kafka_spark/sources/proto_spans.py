"""Spark integration for the PROTO3 span codec (F5): DataFrame <-> the
reference's wire format.

The reference's topic records are (traceId -> PROTO3 ListOfSpans)
(KafkaSpanConsumer.java:37-49 encodes one record per trace group;
SpansSerde.java:26-36 is the serde).  Here:

- :func:`traces_to_proto` — the S1/S2 produce path: group spans by trace,
  encode each group to one binary record.
- :func:`proto_to_spans` — the S3 consume path: explode binary records
  back to span rows.

Both confine Python to Arrow-batched UDFs (``applyInPandas`` /
``mapInPandas``); partitioning is by trace_id so at 100 TB the encode
shuffle is the same single exchange every trace-keyed operator shares.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from zipkin_storage_kafka_spark.functions.proto import (
    decode_span_list,
    encode_span_list,
)

_SPAN_FIELDS = (
    "trace_id",
    "parent_id",
    "id",
    "kind",
    "name",
    "timestamp",
    "duration",
    "local_endpoint",
    "remote_endpoint",
    "annotations",
    "tags",
    "debug",
    "shared",
)

DECODED_SCHEMA = (
    "trace_id string, parent_id string, id string, kind string, "
    "name string, timestamp long, duration long, "
    "local_service string, remote_service string, "
    "tags map<string,string>, debug boolean, shared boolean"
)


def _clean(v):
    """Arrow->pandas artifacts back to plain Python: NaN -> None,
    numpy ints -> int, MapType's list-of-tuples -> dict."""
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else int(v) if v.is_integer() else v
    if isinstance(v, dict):
        return {k: _clean(x) for k, x in v.items()}
    if hasattr(v, "ndim"):  # numpy ndarray (ArrayType) or 0-d scalar
        v = v.tolist() if v.ndim else v.item()
        return _clean(v)
    if isinstance(v, (list, tuple)):
        if v and isinstance(v[0], tuple) and len(v[0]) == 2:
            return {k: _clean(x) for k, x in v}
        return [_clean(x) for x in v]
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


def traces_to_proto(spans_nested: DataFrame) -> DataFrame:
    """(trace_id, value: binary) — one PROTO3 ListOfSpans per trace, spans
    in deterministic (timestamp, id) order.

    The grouping and ordering stay JVM-side (``collect_list`` into a
    sorted array — the same single trace_id exchange every trace operator
    shares); Python sees whole Arrow batches of pre-assembled traces, one
    UDF call per batch instead of one per trace (~40k tiny per-group calls
    at sf0.1 was the dominant cost of the applyInPandas formulation)."""
    from pyspark.sql import functions as F

    # Custom comparator: the struct carries a map (tags), which is not an
    # orderable type, so array_sort gets an explicit (timestamp, id) rule.
    span_struct = F.struct(*(F.col(f) for f in _SPAN_FIELDS))

    def _cmp(left, right):
        return (
            F.when(left["timestamp"] < right["timestamp"], F.lit(-1))
            .when(left["timestamp"] > right["timestamp"], F.lit(1))
            .when(left["id"] < right["id"], F.lit(-1))
            .when(left["id"] > right["id"], F.lit(1))
            .otherwise(F.lit(0))
        )

    # Explicit repartition: the grouped output is byte-small, so AQE would
    # coalesce it to one partition and serialize the whole Python encode on
    # a single worker.  Codec parallelism must track cores, not data size
    # (same rule as the multimodal decode stages).
    n = spans_nested.sparkSession.sparkContext.defaultParallelism
    collected = (
        spans_nested.groupBy("trace_id")
        .agg(F.array_sort(F.collect_list(span_struct), _cmp).alias("spans"))
        .repartition(n, "trace_id")
    )

    def encode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            values = [
                encode_span_list([
                    {f: _clean(s[f]) for f in _SPAN_FIELDS} for s in spans
                ])
                for spans in pdf["spans"]
            ]
            yield pd.DataFrame(
                {"trace_id": pdf["trace_id"], "value": values}
            )

    return collected.mapInPandas(
        encode_batches, "trace_id string, value binary"
    )


def proto_to_spans(proto_df: DataFrame) -> DataFrame:
    """Explode binary ListOfSpans records (column ``value``) back into
    span rows (scalar endpoint projection + tags map)."""

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # Column-wise assembly: building one list per column is several
        # times faster than 100k row-dicts -> DataFrame at bench scale.
        scalar_fields = (
            "trace_id", "parent_id", "id", "kind", "name",
            "timestamp", "duration", "tags", "debug", "shared",
        )
        for pdf in batches:
            cols: dict[str, list] = {f: [] for f in scalar_fields}
            cols["local_service"] = []
            cols["remote_service"] = []
            for buf in pdf["value"]:
                for s in decode_span_list(bytes(buf)):
                    for f in scalar_fields:
                        cols[f].append(s[f])
                    local = s["local_endpoint"]
                    remote = s["remote_endpoint"]
                    cols["local_service"].append(
                        local["service_name"] if local else None
                    )
                    cols["remote_service"].append(
                        remote["service_name"] if remote else None
                    )
            yield pd.DataFrame(cols)

    return proto_df.mapInPandas(decode_batches, DECODED_SCHEMA)
