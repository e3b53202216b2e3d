"""Registry batch 3: relational analytics (joins, grouped aggregation,
window functions, top-k) with DuckDB oracles.

The decimal discipline (see operators.analytics) makes monetary sums exact
and order-independent, so both engines produce bit-identical doubles at the
output boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from zipkin_storage_kafka_spark.operators import analytics as an
from zipkin_storage_kafka_spark.plans.registry import QueryFn
from zipkin_storage_kafka_spark.sources.tables import load_table

# 1998-09-01T00:00:00Z / 1998-06-01T00:00:00Z in epoch micros
Q1_CUTOFF_US = 904_608_000 * 1_000_000
Q3_CUTOFF_US = 896_659_200 * 1_000_000
# [1996-01-01, 1997-01-01) in epoch micros (Q6 ship-date year)
Q6_LO_US = 820_454_400 * 1_000_000
Q6_HI_US = 852_076_800 * 1_000_000
Q4_MIN_QTY = 45

_DISC = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) "
    "AS DECIMAL(30,6))"
)
_CHARGE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * "
    "(CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) "
    "AS DECIMAL(30,6))"
)


def _r4(expr: str) -> str:
    return f"(round(({expr}) * 10000) / 10000 + 0.0)"


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.pricing_summary(load_table(spark, sf_dir, "lineitem"), Q1_CUTOFF_US)


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.shipping_priority(spark, sf_dir, cutoff_micros=Q3_CUTOFF_US)


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.nation_revenue(spark, sf_dir)


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.topk_orders_per_priority(spark, sf_dir)


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.revenue_forecast(
        load_table(spark, sf_dir, "lineitem"), Q6_LO_US, Q6_HI_US
    )


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.order_priority_check(spark, sf_dir, min_qty=Q4_MIN_QTY)


def analytics_queries() -> dict[str, QueryFn]:
    return {
        "h1_pricing_summary": q_pricing_summary,
        "h3_shipping_priority": q_shipping_priority,
        "h5_nation_revenue": q_nation_revenue,
        "w_topk_orders_per_priority": q_topk_orders,
        "h6_revenue_forecast": q_revenue_forecast,
        "h4_order_priority_check": q_order_priority_check,
    }


def analytics_oracles() -> dict[str, str]:
    return {
        "h1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   {_r4("CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)")} AS sum_qty,
                   {_r4("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)")} AS sum_base_price,
                   {_r4(f"CAST(sum({_DISC}) AS DOUBLE)")} AS sum_disc_price,
                   {_r4(f"CAST(sum({_CHARGE}) AS DOUBLE)")} AS sum_charge,
                   {_r4("CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)")} AS avg_qty,
                   {_r4("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)")} AS avg_price,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE epoch_us(l_shipdate) <= {Q1_CUTOFF_US}
            GROUP BY l_returnflag, l_linestatus
        """,
        "h3_shipping_priority": f"""
            SELECT l_orderkey,
                   {_r4(f"CAST(sum({_DISC}) AS DOUBLE)")} AS revenue,
                   epoch_ms(o_orderdate) AS o_orderdate_ms,
                   o_orderpriority
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND epoch_us(o_orderdate) < {Q3_CUTOFF_US}
              AND epoch_us(l_shipdate) > {Q3_CUTOFF_US}
            GROUP BY l_orderkey, o_orderdate_ms, o_orderpriority
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "h5_nation_revenue": f"""
            SELECT n_name,
                   {_r4(f"CAST(sum({_DISC}) AS DOUBLE)")} AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "w_topk_orders_per_priority": f"""
            SELECT o_orderpriority, rank, o_orderkey,
                   {_r4("o_totalprice")} AS total_price
            FROM (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     CAST(row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey
                     ) AS INT) AS rank
              FROM orders
            )
            WHERE rank <= 3
        """,
        "h6_revenue_forecast": f"""
            SELECT {_r4(
                "CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * "
                "CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(30,6))) AS DOUBLE)"
            )} AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE epoch_us(l_shipdate) >= {Q6_LO_US}
              AND epoch_us(l_shipdate) < {Q6_HI_US}
              AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "h4_order_priority_check": f"""
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem WHERE l_quantity >= {Q4_MIN_QTY}
            )
            GROUP BY o_orderpriority
        """,
    }
