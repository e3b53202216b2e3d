"""General relational analytics over the star schema — the engine's
"beyond-the-reference" OLAP surface (joins, grouped aggregation, window
functions, top-k), shaped after the classic TPC-H query patterns.

Numeric determinism for oracle parity: monetary aggregates are summed as
DECIMAL (exact, order-independent) and only converted to rounded doubles at
the output boundary — double summation order differs between engines and
the error at 1e9 magnitudes exceeds the 4-decimal hash tolerance.

Scale design: dims (region/nation/customer) broadcast; fact-fact joins
(orders x lineitem) shuffle on the join key with AQE handling skew; grouped
aggregations combine map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.functions.portable import round4
from zipkin_storage_kafka_spark.sources.tables import load_table, to_epoch_micros

DEC = "decimal(30,6)"


def _dec(col) -> F.Column:
    """Money column -> DECIMAL(12,2): tight precision keeps multiply chains
    under both engines' 38-digit limit while staying exact."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def _rate(col) -> F.Column:
    """Discount/tax rate -> DECIMAL(4,2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(4,2)")


def pricing_summary(lineitem: DataFrame, ship_cutoff_micros: int) -> DataFrame:
    """TPC-H Q1 shape: grouped 8-agg rollup of lineitem up to a ship date."""
    ship_us = to_epoch_micros(lineitem, "l_shipdate")
    disc_price = (_dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))).cast(DEC)
    charge = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
        * (F.lit(1).cast("decimal(4,2)") + _rate("l_tax"))
    ).cast(DEC)
    grouped = (
        lineitem.filter(ship_us <= ship_cutoff_micros)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("_sum_base"),
            F.sum(disc_price).alias("_sum_disc"),
            F.sum(charge).alias("_sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return grouped.select(
        "l_returnflag",
        "l_linestatus",
        round4(F.col("_sum_qty").cast("double")).alias("sum_qty"),
        round4(F.col("_sum_base").cast("double")).alias("sum_base_price"),
        round4(F.col("_sum_disc").cast("double")).alias("sum_disc_price"),
        round4(F.col("_sum_charge").cast("double")).alias("sum_charge"),
        round4(F.col("_sum_qty").cast("double") / F.col("count_order")).alias(
            "avg_qty"
        ),
        round4(F.col("_sum_base").cast("double") / F.col("count_order")).alias(
            "avg_price"
        ),
        "count_order",
    )


def shipping_priority(
    spark: SparkSession,
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff_micros: int = 0,
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k open orders by discounted revenue for one
    market segment.  customer is broadcast (small dim); orders x lineitem
    shuffles on orderkey."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    o_us = to_epoch_micros(orders, "o_orderdate")
    l_us = to_epoch_micros(lineitem, "l_shipdate")
    disc_price = (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
    ).cast(DEC)
    joined = (
        lineitem.filter(l_us > cutoff_micros)
        .join(
            orders.filter(o_us < cutoff_micros).withColumn(
                "o_orderdate_ms", (to_epoch_micros(orders, "o_orderdate") / 1000).cast("long")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate_ms", "o_orderpriority")
        .agg(F.sum(disc_price).alias("_rev"))
        .select(
            "l_orderkey",
            round4(F.col("_rev").cast("double")).alias("revenue"),
            "o_orderdate_ms",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(k)
    )


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join rollup: revenue by customer nation (Q5 shape, no date
    filter).  nation+region broadcast, customer broadcast at these scales;
    at 100 TB customer joins via shuffle while nation/region stay broadcast."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
    ).cast(DEC)
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.sum(disc_price).alias("_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "n_name",
            round4(F.col("_rev").cast("double")).alias("revenue"),
            "n_items",
        )
    )


def revenue_forecast(
    lineitem: DataFrame,
    lo_micros: int,
    hi_micros: int,
    disc_lo: str = "0.05",
    disc_hi: str = "0.07",
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no join — the query every
    column store must turn into a single codegen'd pass with all predicates
    pushed to the parquet scan.  Discount bounds compare as DECIMAL(4,2) so
    both engines evaluate the same exact values."""
    ship_us = to_epoch_micros(lineitem, "l_shipdate")
    revenue = (_dec("l_extendedprice") * _rate("l_discount")).cast(DEC)
    filtered = lineitem.filter(
        (ship_us >= lo_micros)
        & (ship_us < hi_micros)
        & _rate("l_discount").between(disc_lo, disc_hi)
        & (F.col("l_quantity") < max_qty)
    )
    return filtered.agg(
        round4(F.sum(revenue).cast("double")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def order_priority_check(
    spark: SparkSession, sf_dir: str, min_qty: int = 45
) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders having at least one
    qualifying lineitem, counted per priority.  The semi-join never
    materializes match multiplicity, so the shuffle carries distinct
    orderkeys only."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    qualifying = lineitem.filter(F.col("l_quantity") >= min_qty).select(
        "l_orderkey"
    )
    return (
        orders.join(
            qualifying, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def topk_orders_per_priority(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Window-function top-k per group (SURVEY section 2.5 notes the
    reference has no analytic windows — this is the engine extension):
    highest-value orders per priority class."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "o_orderpriority",
            "rank",
            "o_orderkey",
            round4(F.col("o_totalprice")).alias("total_price"),
        )
    )
