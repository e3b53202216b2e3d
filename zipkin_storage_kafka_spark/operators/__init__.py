from zipkin_storage_kafka_spark.operators.trace_aggregation import (  # noqa: F401
    aggregate_traces,
    trace_summaries,
)
from zipkin_storage_kafka_spark.operators.dependency_links import (  # noqa: F401
    dependency_links,
    dependency_links_tree,
    merge_links,
    windowed_link_counters,
)
from zipkin_storage_kafka_spark.operators.indexes import (  # noqa: F401
    autocomplete_tags,
    latest_span_per_service,
    remote_service_names,
    service_names,
    span_names,
)
