from zipkin_storage_kafka_spark.plans.query_api import (  # noqa: F401
    QueryRequest,
    SpanStore,
)
