from zipkin_storage_kafka_spark.streaming.jobs import (  # noqa: F401
    dependency_counter_stream,
    index_stream,
    run_aggregation_pipeline,
    spans_stream_from_dir,
    trace_aggregation_stream,
)
