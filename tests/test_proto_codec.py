"""PROTO3 span codec (F5): golden wire bytes, dict round-trips, and the
Spark encode->decode round-trip against the original spans derivation."""

from __future__ import annotations

from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.functions.proto import (
    decode_span,
    decode_span_list,
    encode_span,
    encode_span_list,
)
from zipkin_storage_kafka_spark.sources.proto_spans import (
    proto_to_spans,
    traces_to_proto,
)
from zipkin_storage_kafka_spark.sources.spans import (
    spans_from_events,
    spans_with_nested,
)

GOLDEN_SPAN = {
    "trace_id": "000000000000007b",
    "id": "00000000000001c8",
    "kind": "CLIENT",
    "name": "get",
    "timestamp": 1000,
    "duration": 100,
    "local_endpoint": {"service_name": "svc"},
}

# Hand-assembled from the protobuf wire rules + public zipkin.proto field
# numbers: 1=trace_id(bytes) 3=id(bytes) 4=kind(varint) 5=name(len)
# 6=timestamp(fixed64) 7=duration(varint) 8=local_endpoint(len{1=name}).
GOLDEN_BYTES = bytes.fromhex(
    "0a08000000000000007b"      # trace_id
    "1a0800000000000001c8"      # id
    "2001"                      # kind CLIENT=1
    "2a03676574"                # name "get"
    "31e803000000000000"        # timestamp fixed64 1000
    "3864"                      # duration varint 100
    "42050a03737663"            # local_endpoint{service_name:"svc"}
)


def test_golden_wire_bytes():
    assert encode_span(GOLDEN_SPAN) == GOLDEN_BYTES


def test_golden_decode():
    span = decode_span(GOLDEN_BYTES)
    assert span["trace_id"] == GOLDEN_SPAN["trace_id"]
    assert span["id"] == GOLDEN_SPAN["id"]
    assert span["kind"] == "CLIENT"
    assert span["name"] == "get"
    assert span["timestamp"] == 1000
    assert span["duration"] == 100
    assert span["local_endpoint"]["service_name"] == "svc"


def test_roundtrip_full_span():
    span = {
        "trace_id": "4bf92f3577b34da6a3ce929d0e0e4736",  # 128-bit
        "parent_id": "00f067aa0ba902b7",
        "id": "00f067aa0ba902b8",
        "kind": "SERVER",
        "name": "post /api",
        "timestamp": 1_705_363_200_000_000,
        "duration": 123_456,
        "local_endpoint": {"service_name": "frontend", "ipv4": "10.1.2.3", "port": 8080},
        "remote_endpoint": {"service_name": "backend"},
        "annotations": [{"timestamp": 1_705_363_200_000_001, "value": "ws"}],
        "tags": {"http.method": "POST", "error": "true"},
        "debug": True,
        "shared": True,
    }
    out = decode_span(encode_span(span))
    assert out["trace_id"] == span["trace_id"]
    assert out["parent_id"] == span["parent_id"]
    assert out["kind"] == "SERVER"
    assert out["timestamp"] == span["timestamp"]
    assert out["duration"] == span["duration"]
    assert out["local_endpoint"]["ipv4"] == "10.1.2.3"
    assert out["local_endpoint"]["port"] == 8080
    assert out["annotations"] == span["annotations"]
    assert out["tags"] == span["tags"]
    assert out["debug"] is True and out["shared"] is True


def test_span_list_roundtrip():
    spans = [GOLDEN_SPAN, dict(GOLDEN_SPAN, id="00000000000001c9", name="put")]
    out = decode_span_list(encode_span_list(spans))
    assert [s["name"] for s in out] == ["get", "put"]


def test_spark_roundtrip_matches_source(spark, sf_dir):
    """encode -> decode over the whole sf dir == the original derivation."""
    nested = spans_with_nested(spark, sf_dir)
    decoded = proto_to_spans(traces_to_proto(nested))
    cols = [
        "trace_id", "parent_id", "id", "kind", "name",
        "timestamp", "duration", "local_service", "remote_service",
    ]
    original = spans_from_events(spark, sf_dir).select(cols)
    diff = decoded.select(cols).exceptAll(original)
    assert diff.count() == 0
    assert decoded.count() == original.count()


def test_spark_roundtrip_preserves_tags(spark, sf_dir):
    nested = spans_with_nested(spark, sf_dir)
    decoded = proto_to_spans(traces_to_proto(nested))
    row = (
        decoded.filter(F.col("tags").getItem("environment").isNotNull())
        .orderBy("id")
        .first()
    )
    assert row.tags.get("environment") in ("dev", "staging", "prod")


# -- property-based: decode(encode(x)) == x for arbitrary well-formed spans --

from hypothesis import given, settings
from hypothesis import strategies as st

_hex16 = st.integers(min_value=0, max_value=2**64 - 1).map(lambda n: f"{n:016x}")
_hex32 = st.integers(min_value=0, max_value=2**128 - 1).map(lambda n: f"{n:032x}")
_name = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    min_size=1,
    max_size=20,
)
_endpoint = st.one_of(
    st.none(),
    st.fixed_dictionaries(
        {
            "service_name": _name,
            "ipv4": st.one_of(
                st.none(),
                st.tuples(*([st.integers(0, 255)] * 4)).map(
                    lambda t: ".".join(map(str, t))
                ),
            ),
            # wire form is 16 raw bytes; the dict form mirrors decode's raw
            # hex representation
            "ipv6": st.one_of(
                st.none(), st.binary(min_size=16, max_size=16).map(bytes.hex)
            ),
            "port": st.one_of(st.none(), st.integers(1, 65535)),
        }
    ),
)
_span = st.fixed_dictionaries(
    {
        "trace_id": st.one_of(_hex16, _hex32),
        "parent_id": st.one_of(st.none(), _hex16),
        "id": _hex16,
        "kind": st.sampled_from([None, "CLIENT", "SERVER", "PRODUCER", "CONSUMER"]),
        "name": st.one_of(st.none(), _name),
        "timestamp": st.one_of(st.none(), st.integers(1, 2**63 - 1)),
        "duration": st.one_of(st.none(), st.integers(1, 2**63 - 1)),
        "local_endpoint": _endpoint,
        "remote_endpoint": _endpoint,
        "annotations": st.lists(
            st.fixed_dictionaries(
                {"timestamp": st.integers(1, 2**63 - 1), "value": _name}
            ),
            max_size=3,
        ),
        "tags": st.dictionaries(_name, _name, max_size=4),
        "debug": st.sampled_from([None, True]),
        "shared": st.sampled_from([None, True]),
    }
)


def _nullfree(span: dict) -> dict:
    """proto3 cannot distinguish absent from empty/zero — canonicalize the
    input the way the wire does before comparing."""
    out = dict(span)
    for ep_key in ("local_endpoint", "remote_endpoint"):
        ep = out[ep_key]
        if ep is not None:
            ep = {
                "service_name": ep.get("service_name"),
                "ipv4": ep.get("ipv4"),
                "ipv6": ep.get("ipv6"),
                "port": ep.get("port"),
            }
            if all(v is None for v in ep.values()):
                ep = None
        out[ep_key] = ep
    return out


@settings(max_examples=200, deadline=None)
@given(spans=st.lists(_span, min_size=1, max_size=5))
def test_property_roundtrip(spans):
    decoded = decode_span_list(encode_span_list(spans))
    assert len(decoded) == len(spans)
    for orig, got in zip(spans, decoded):
        want = _nullfree({**{"ipv6": None}, **orig})
        for field in ("trace_id", "parent_id", "id", "kind", "name",
                      "timestamp", "duration", "debug", "shared"):
            assert got[field] == want[field], field
        assert got["annotations"] == want["annotations"]
        assert got["tags"] == want["tags"]
        for ep_key in ("local_endpoint", "remote_endpoint"):
            w = want[ep_key]
            g = got[ep_key]
            if w is None:
                assert g is None, ep_key
            else:
                assert g["service_name"] == w["service_name"]
                assert g["ipv4"] == w["ipv4"]
                assert g["ipv6"] == w["ipv6"]
                assert g["port"] == w["port"]


def test_ipv6_roundtrip():
    span = dict(
        GOLDEN_SPAN,
        local_endpoint={
            "service_name": "svc",
            "ipv6": "20010db8000000000000000000000001",
        },
    )
    out = decode_span(encode_span(span))
    assert out["local_endpoint"]["ipv6"] == "20010db8000000000000000000000001"


# -- malformed input must raise, not decode into a wrong span --

import pytest


@pytest.mark.parametrize(
    "buf",
    [
        GOLDEN_BYTES[:-2],          # truncated length-delimited payload
        bytes.fromhex("0aff"),      # LEN length varint truncated
        bytes.fromhex("0a20" + "00" * 4),  # declared length past buffer end
        bytes.fromhex("31e8030000"),       # truncated fixed64
        b"\xff" * 11,               # varint longer than 10 bytes
    ],
)
def test_malformed_raises(buf):
    with pytest.raises(ValueError):
        decode_span(buf)


def test_jvm_protobuf_detection_and_fallback(spark):
    """spark-protobuf is absent in this sandbox: detection must say so
    (cached), and proto_to_spans must silently use the Python codec —
    the flip to from_protobuf is automatic the day the jar appears."""
    from zipkin_storage_kafka_spark.sources.proto_spans import (
        jvm_protobuf_available,
        proto_to_spans,
    )

    assert jvm_protobuf_available(spark) is False
    assert jvm_protobuf_available(spark) is False  # cached second call

    spans = [{
        "trace_id": "000000000000000a", "parent_id": None, "id": "0000000000000001",
        "kind": "SERVER", "name": "get", "timestamp": 1_700_000_000_000_000,
        "duration": 100, "local_endpoint": {"service_name": "svc",
        "ipv4": None, "ipv6": None, "port": None}, "remote_endpoint": None,
        "annotations": [], "tags": {"k": "v"}, "debug": None, "shared": None,
    }]
    from zipkin_storage_kafka_spark.functions.proto import encode_span_list

    df = spark.createDataFrame(
        [(bytearray(encode_span_list(spans)),)], "value binary"
    )
    out = proto_to_spans(df).collect()  # use_jvm=None -> auto-detect -> False
    assert len(out) == 1 and out[0]["trace_id"] == "000000000000000a"
    assert out[0]["local_service"] == "svc" and out[0]["tags"] == {"k": "v"}


def test_zipkin_descriptor_set_wire_structure(spark):
    """The self-encoded FileDescriptorSet must parse as valid proto wire
    format (our own reader) with the four zipkin messages, correct field
    numbers, and the map_entry marker on TagsEntry — the descriptor is
    what from_protobuf will consume when the jar ships, so its structure
    is pinned even while the JVM path can't run offline."""
    from zipkin_storage_kafka_spark.functions.proto import _fields
    from zipkin_storage_kafka_spark.functions.proto_descriptor import (
        zipkin_descriptor_set,
    )

    blob = zipkin_descriptor_set()
    files = [v for f, w, v in _fields(blob) if f == 1]
    assert len(files) == 1
    file_fields = list(_fields(files[0]))
    name = [v for f, w, v in file_fields if f == 1][0].decode()
    package = [v for f, w, v in file_fields if f == 2][0].decode()
    syntax = [v for f, w, v in file_fields if f == 12][0].decode()
    assert (name, package, syntax) == ("zipkin.proto", "zipkin.proto3", "proto3")

    messages = {}
    for f, w, v in file_fields:
        if f != 4:
            continue
        mf = list(_fields(v))
        mname = [x for ff, ww, x in mf if ff == 1][0].decode()
        messages[mname] = mf
    assert set(messages) == {"Span", "Endpoint", "Annotation", "ListOfSpans"}

    # Span: field numbers 1..13 in schema order
    span_fields = [x for ff, ww, x in messages["Span"] if ff == 2]
    nums = []
    for sf in span_fields:
        sub = list(_fields(sf))
        nums.append([x for ff, ww, x in sub if ff == 3][0])
    assert nums == list(range(1, 14))

    # TagsEntry nested in Span with map_entry option set
    nested = [x for ff, ww, x in messages["Span"] if ff == 3]
    assert len(nested) == 1
    tf = list(_fields(nested[0]))
    assert [x for ff, ww, x in tf if ff == 1][0].decode() == "TagsEntry"
    options = [x for ff, ww, x in tf if ff == 7]
    assert options and list(_fields(options[0]))[0][0] == 7  # map_entry


def test_zero_duration_collapses_to_absent():
    """proto3 never writes zero scalars: duration=0 must produce no
    field-7 bytes and decode as absent (null) — the reference's PROTO3
    encoder/decoder shares this collapse, and the f5 oracle models it
    with nullif(duration, 0).  Surfaced by sf0.1's zero-duration spans."""
    from zipkin_storage_kafka_spark.functions.proto import (
        decode_span,
        encode_span,
    )

    span = {
        "trace_id": "00000000000000aa",
        "id": "00000000000000bb",
        "name": "op",
        "timestamp": 1_700_000_000_000_000,
        "duration": 0,
    }
    wire = encode_span(span)
    # field 7 varint key is (7<<3)|0 = 0x38; must not appear as a key
    assert decode_span(wire)["duration"] is None
    nonzero = dict(span, duration=5)
    assert decode_span(encode_span(nonzero))["duration"] == 5
    assert len(encode_span(nonzero)) == len(wire) + 2  # key + varint(5)
