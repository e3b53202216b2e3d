"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (trace aggregation + find-traces —
the reference's richest read path, SURVEY.md section 3.3) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md section 2 with a DuckDB oracle for the driver's t2 gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from zipkin_storage_kafka_spark.plans import (
    registry,
    registry_analytics,
    registry_pipeline,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: newest trace summaries on /root/testdata/sf0.001."""
    return registry.q_latest_traces(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        **registry.zipkin_queries(),
        **registry_pipeline.pipeline_queries(),
        **registry_analytics.analytics_queries(),
    }


def oracle_sql() -> dict[str, str]:
    return {
        **registry.zipkin_oracles(),
        **registry_pipeline.pipeline_oracles(),
        **registry_analytics.analytics_oracles(),
    }
