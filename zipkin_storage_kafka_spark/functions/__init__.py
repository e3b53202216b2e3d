from zipkin_storage_kafka_spark.functions.zipkin import (  # noqa: F401
    link_key,
    micros_to_millis,
    millis_to_micros,
    normalize_trace_id,
    span_to_json_v2,
)
