from zipkin_storage_kafka_spark.sources.spans import (  # noqa: F401
    SPANS_ORACLE_CTE,
    spans_from_events,
)
from zipkin_storage_kafka_spark.sources.tables import load_table  # noqa: F401
