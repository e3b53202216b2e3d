"""Zipkin PROTO3 span wire codec (SURVEY section 2.8 F5), pure Python.

The reference serializes span lists with ``SpanBytesEncoder.PROTO3`` /
``SpanBytesDecoder.PROTO3`` (storage/src/main/java/zipkin2/storage/kafka/
streams/serdes/SpansSerde.java:26-36, KafkaSpanConsumer.java:43).  The wire
schema is the public zipkin-api ``zipkin.proto``:

    message Span {
      bytes trace_id = 1;        // 8 or 16 raw bytes (16/32 hex chars)
      bytes parent_id = 2;
      bytes id = 3;
      Kind kind = 4;             // CLIENT=1 SERVER=2 PRODUCER=3 CONSUMER=4
      string name = 5;
      fixed64 timestamp = 6;     // epoch micros
      uint64 duration = 7;       // micros, varint
      Endpoint local_endpoint = 8;
      Endpoint remote_endpoint = 9;
      repeated Annotation annotations = 10;
      map<string, string> tags = 11;
      bool debug = 12;
      bool shared = 13;
    }
    message Endpoint  { string service_name = 1; bytes ipv4 = 2;
                        bytes ipv6 = 3; int32 port = 4; }
    message Annotation { fixed64 timestamp = 1; string value = 2; }
    message ListOfSpans { repeated Span spans = 1; }

This is a from-scratch implementation of that public format (no protobuf
runtime in the container): protobuf wire rules only — varint, fixed64,
length-delimited.  proto3 zero/empty values are omitted on encode, exactly
as the canonical encoder does, so bytes round-trip stably.

The per-row Python cost is confined to Arrow-batched pandas UDFs
(:mod:`zipkin_storage_kafka_spark.sources.proto_spans`); everything before
and after the codec boundary stays JVM-side.
"""

from __future__ import annotations

KIND_TO_NUM = {"CLIENT": 1, "SERVER": 2, "PRODUCER": 3, "CONSUMER": 4}
NUM_TO_KIND = {v: k for k, v in KIND_TO_NUM.items()}

_VARINT = 0
_FIXED64 = 1
_LEN = 2


# Encoding ---------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, _LEN) + _varint(len(payload)) + payload


def _fixed64(field: int, n: int) -> bytes:
    return _key(field, _FIXED64) + int(n).to_bytes(8, "little", signed=False)


def _encode_endpoint(ep: dict | None) -> bytes:
    if not ep:
        return b""
    out = bytearray()
    if ep.get("service_name"):
        out += _len_field(1, ep["service_name"].encode("utf-8"))
    if ep.get("ipv4"):
        out += _len_field(2, bytes(int(o) for o in ep["ipv4"].split(".")))
    if ep.get("ipv6"):
        # decode surfaces ipv6 as raw hex (16 bytes -> 32 hex chars); encode
        # mirrors that so reference-produced bytes round-trip losslessly
        out += _len_field(3, bytes.fromhex(ep["ipv6"]))
    if ep.get("port"):
        out += _key(4, _VARINT) + _varint(int(ep["port"]))
    return bytes(out)


def encode_span(span: dict) -> bytes:
    """Encode one span dict (SPAN_SCHEMA field names) to proto3 bytes."""
    out = bytearray()
    if span.get("trace_id"):
        out += _len_field(1, bytes.fromhex(span["trace_id"]))
    if span.get("parent_id"):
        out += _len_field(2, bytes.fromhex(span["parent_id"]))
    if span.get("id"):
        out += _len_field(3, bytes.fromhex(span["id"]))
    kind = KIND_TO_NUM.get(span.get("kind") or "")
    if kind:
        out += _key(4, _VARINT) + _varint(kind)
    if span.get("name"):
        out += _len_field(5, span["name"].encode("utf-8"))
    if span.get("timestamp"):
        out += _fixed64(6, span["timestamp"])
    if span.get("duration"):
        out += _key(7, _VARINT) + _varint(int(span["duration"]))
    local = _encode_endpoint(span.get("local_endpoint"))
    if local:
        out += _len_field(8, local)
    remote = _encode_endpoint(span.get("remote_endpoint"))
    if remote:
        out += _len_field(9, remote)
    for ann in span.get("annotations") or ():
        body = _fixed64(1, ann["timestamp"]) + _len_field(
            2, ann["value"].encode("utf-8")
        )
        out += _len_field(10, body)
    tags = span.get("tags") or {}
    for k in sorted(tags):  # deterministic map order
        if tags[k] is None:
            continue
        entry = _len_field(1, k.encode("utf-8")) + _len_field(
            2, tags[k].encode("utf-8")
        )
        out += _len_field(11, entry)
    if span.get("debug"):
        out += _key(12, _VARINT) + _varint(1)
    if span.get("shared"):
        out += _key(13, _VARINT) + _varint(1)
    return bytes(out)


def encode_span_list(spans: list[dict]) -> bytes:
    """ListOfSpans: each span as repeated field 1 — the topic record value
    (SpansSerde.java:28 encodeList)."""
    out = bytearray()
    for span in spans:
        out += _len_field(1, encode_span(span))
    return bytes(out)


# Decoding ---------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated varint")
        if shift >= 70:  # valid proto varints are at most 10 bytes
            raise ValueError("varint exceeds 10 bytes")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == _VARINT:
            value, pos = _read_varint(buf, pos)
        elif wire == _FIXED64:
            if pos + 8 > n:
                raise ValueError("truncated fixed64")
            value = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wire == _LEN:
            length, pos = _read_varint(buf, pos)
            if pos + length > n:
                raise ValueError("length-delimited field past end of buffer")
            value = buf[pos : pos + length]
            pos += length
        elif wire == 5:  # fixed32 (not used by zipkin.proto, skip safely)
            if pos + 4 > n:
                raise ValueError("truncated fixed32")
            value = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} at {pos}")
        yield field, wire, value


def _decode_endpoint(buf: bytes) -> dict:
    ep = {"service_name": None, "ipv4": None, "ipv6": None, "port": None}
    for field, _, value in _fields(buf):
        if field == 1:
            ep["service_name"] = value.decode("utf-8")
        elif field == 2:
            ep["ipv4"] = ".".join(str(b) for b in value)
        elif field == 3:
            ep["ipv6"] = value.hex()
        elif field == 4:
            ep["port"] = value
    return ep


def decode_span(buf: bytes) -> dict:
    span: dict = {
        "trace_id": None,
        "parent_id": None,
        "id": None,
        "kind": None,
        "name": None,
        "timestamp": None,
        "duration": None,
        "local_endpoint": None,
        "remote_endpoint": None,
        "annotations": [],
        "tags": {},
        "debug": None,
        "shared": None,
    }
    for field, _, value in _fields(buf):
        if field == 1:
            span["trace_id"] = value.hex()
        elif field == 2:
            span["parent_id"] = value.hex()
        elif field == 3:
            span["id"] = value.hex()
        elif field == 4:
            span["kind"] = NUM_TO_KIND.get(value)
        elif field == 5:
            span["name"] = value.decode("utf-8")
        elif field == 6:
            span["timestamp"] = value
        elif field == 7:
            span["duration"] = value
        elif field == 8:
            span["local_endpoint"] = _decode_endpoint(value)
        elif field == 9:
            span["remote_endpoint"] = _decode_endpoint(value)
        elif field == 10:
            ann = {"timestamp": None, "value": None}
            for f2, _, v2 in _fields(value):
                if f2 == 1:
                    ann["timestamp"] = v2
                elif f2 == 2:
                    ann["value"] = v2.decode("utf-8")
            span["annotations"].append(ann)
        elif field == 11:
            k = v = None
            for f2, _, v2 in _fields(value):
                if f2 == 1:
                    k = v2.decode("utf-8")
                elif f2 == 2:
                    v = v2.decode("utf-8")
            if k is not None:
                span["tags"][k] = v
        elif field == 12:
            span["debug"] = bool(value)
        elif field == 13:
            span["shared"] = bool(value)
    return span


def decode_span_list(buf: bytes) -> list[dict]:
    return [
        decode_span(value) for field, _, value in _fields(buf) if field == 1
    ]
