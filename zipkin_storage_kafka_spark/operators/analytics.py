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


def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution per customer via a LEFT
    OUTER join — customers with zero orders survive with c_count=0.  Two
    cascaded aggregations: the first shuffles on c_custkey (same key as the
    join, so the exchange is reused), the second on the tiny c_count domain."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def promo_revenue(
    spark: SparkSession, sf_dir: str, lo_micros: int = 0, hi_micros: int = 0
) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact->dim join.
    part is broadcast (dim); the promo share is a ratio of two exact
    DECIMAL sums, divided as doubles only at the output boundary."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l_us = to_epoch_micros(lineitem, "l_shipdate")
    disc_price = (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
    ).cast(DEC)
    joined = lineitem.filter((l_us >= lo_micros) & (l_us < hi_micros)).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    agg = joined.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
                F.lit(0).cast(DEC)
            )
        ).alias("_promo"),
        F.sum(disc_price).alias("_total"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return agg.select(
        round4(
            F.lit(100.0)
            * F.col("_promo").cast("double")
            / F.col("_total").cast("double")
        ).alias("promo_pct"),
        round4(F.col("_total").cast("double")).alias("total_revenue"),
        "n_items",
    )


def nation_volume(
    spark: SparkSession,
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year.  The nation dim joins twice under different roles (supplier's
    nation vs customer's nation) — both sides pre-filtered to the two
    nations and broadcast, so the only shuffle is orders x lineitem."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(nation_a, nation_b)
    )
    supplier = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    customer = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem")
    l_us = to_epoch_micros(lineitem, "l_shipdate")
    disc_price = (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
    ).cast(DEC)
    joined = (
        lineitem.withColumn("l_year", F.year(F.timestamp_micros(l_us)))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(disc_price).alias("_rev"), F.count(F.lit(1)).alias("n_items"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            round4(F.col("_rev").cast("double")).alias("revenue"),
            "n_items",
        )
    )


def large_volume_customers(
    spark: SparkSession, sf_dir: str, min_qty: str = "200", k: int = 20
) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped fact, then join back to
    orders/customer for the qualifying keys.  The qualifying-orderkey set
    is small after the HAVING filter, so AQE converts the join back to
    broadcast at runtime; customer is broadcast outright."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > F.lit(min_qty).cast("decimal(12,2)"))
    )
    joined = orders.join(
        qty, F.col("o_orderkey") == F.col("l_orderkey")
    ).join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
    return (
        joined.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            round4(F.col("o_totalprice")).alias("total_price"),
            round4(F.col("_qty").cast("double")).alias("sum_qty"),
        )
        .orderBy(F.col("total_price").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def pricing_rollup(lineitem: DataFrame, ship_cutoff_micros: int) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): per-group rows plus per-flag
    subtotals plus a grand total in ONE pass (Spark expands grouping sets
    map-side; no re-scan per level).  NULL grouping cells are labelled
    'ALL' — the data's real values are never null, so the label is
    unambiguous."""
    ship_us = to_epoch_micros(lineitem, "l_shipdate")
    grouped = (
        lineitem.filter(ship_us <= ship_cutoff_micros)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("_sum_base"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return grouped.select(
        F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("l_returnflag"),
        F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("l_linestatus"),
        round4(F.col("_sum_qty").cast("double")).alias("sum_qty"),
        round4(F.col("_sum_base").cast("double")).alias("sum_base_price"),
        "count_order",
    )


def user_sessions(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Gap-based sessionization of the events stream as a BATCH analytic —
    the batch twin of the streaming session_window (SURVEY W1): a new
    session starts when the gap to the previous event of the same user
    exceeds the timeout.  Both analytic windows share one
    (partition, order) spec, so the plan is a single shuffle + single sort."""
    ev = load_table(spark, sf_dir, "events")
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = (
        ev.select(
            "user_id", "event_id", to_epoch_micros(ev, "ts").alias("ts_us")
        )
        .withColumn("_prev", F.lag("ts_us").over(w))
        .withColumn(
            "_is_new",
            F.when(
                F.col("_prev").isNull()
                | (F.col("ts_us") - F.col("_prev") > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_idx",
            F.sum("_is_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return flagged.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


def top_supplier(
    spark: SparkSession, sf_dir: str, lo_micros: int = 0, hi_micros: int = 0
) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum revenue in a period —
    a grouped aggregate compared against its own global max (scalar
    subquery).  The 1-row max side is broadcast; revenue is exact DECIMAL
    so the equality comparison is deterministic at any partitioning."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    l_us = to_epoch_micros(lineitem, "l_shipdate")
    disc_price = (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
    ).cast(DEC)
    revenue = (
        lineitem.filter((l_us >= lo_micros) & (l_us < hi_micros))
        .groupBy("l_suppkey")
        .agg(F.sum(disc_price).alias("_total"))
    )
    max_rev = revenue.agg(F.max("_total").alias("_max_total"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("_total") == F.col("_max_total"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            round4(F.col("_total").cast("double")).alias("total_revenue"),
        )
    )


def part_supplier_variety(
    spark: SparkSession, sf_dir: str, exclude_brand: str = "Brand#1"
) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute group.
    Distinct aggregation plans as a two-phase expand/partial dedup — the
    shuffle carries (group, suppkey) pairs once each, never raw lineitem
    multiplicity."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != exclude_brand
    )
    joined = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    return joined.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and NO orders
    — scalar-subquery threshold + LEFT ANTI join, grouped by nation.

    Determinism: the threshold is an exact DECIMAL sum cast to double, then
    divided by the count — identical in both engines regardless of
    partitioning (a raw double avg would depend on reduction order)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    thr = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("_thr")
    )
    eligible = customer.crossJoin(F.broadcast(thr)).filter(
        F.col("c_acctbal") > F.col("_thr")
    )
    no_orders = eligible.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        round4(F.sum(_dec("c_acctbal")).cast("double")).alias("total_bal"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention over the events stream: users grouped by their
    first active day, counted at each later day offset — the standard
    engagement matrix.  Two aggregations share the user_id shuffle; the
    day domain is tiny so the final (cohort, offset) agg is cheap."""
    ev = load_table(spark, sf_dir, "events")
    # exact integer floor-division (`div`), matching the DuckDB oracle's `//`
    # bit-for-bit; double division + cast can diverge at boundary values
    micros = ev.select("user_id", to_epoch_micros(ev, "ts").alias("ts_us"))
    activity = micros.select(
        "user_id", F.expr("ts_us div 86400000000").alias("day_idx")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day_idx").alias("first_day"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "first_day",
            (F.col("day_idx") - F.col("first_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel over the events stream: users whose first view
    precedes a click that precedes a purchase.

    r14 shape: the r13 chain (three per-type user-keyed aggs, each
    joined to the previous stage's timestamp — 26 Exchange nodes, every
    stage re-shuffling on the SAME user key) folds into ONE user-keyed
    conditional agg: t1 = min view time, the click/purchase times
    collected as per-user sorted arrays, and t2/t3 resolved rowwise
    with array filter + array_min (first click strictly after t1, first
    purchase strictly after t2) — identical strict-inequality
    semantics, one corpus exchange plus one 1-row rollup (guide 2.4:
    operations keyed the same way share one exchange).  Per-user event
    lists are bounded by individual user activity (the same per-key
    mass any funnel engine holds); the type filter prunes the scan to
    the three funnel types.

    Output: one row (stage_view, stage_click, stage_purchase)."""
    ev = load_table(spark, sf_dir, "events")
    ts = to_epoch_micros(ev, "ts")
    base = ev.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", ts.alias("ts_us"))
    per_user = base.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts_us"))
        ).alias("t1"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("event_type") == "click", F.col("ts_us"))
            )
        ).alias("_clicks"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("event_type") == "purchase", F.col("ts_us"))
            )
        ).alias("_purchases"),
    )
    staged = per_user.select(
        "t1",
        "_purchases",
        F.array_min(
            F.filter("_clicks", lambda c: c > F.col("t1"))
        ).alias("t2"),
    ).select(
        "t1",
        "t2",
        F.array_min(
            F.filter("_purchases", lambda p: p > F.col("t2"))
        ).alias("t3"),
    )
    return staged.agg(
        F.count("t1").alias("stage_view"),
        F.count("t2").alias("stage_click"),
        F.count("t3").alias("stage_purchase"),
    )


def discounted_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) predicate across a
    fact->dim join.  Catalyst splits the common conjunct (the join key)
    from the disjunction and pushes the per-side restrictions to both
    scans; part stays broadcast."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    disc_price = (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
    ).cast(DEC)
    joined = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).filter(
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(16, 30)
            & F.col("l_quantity").between(10, 30)
        )
    )
    return joined.agg(
        round4(F.sum(disc_price).cast("double")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def returned_item_report(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returns.  The
    fact-fact (lineitem x orders) join shuffles on orderkey; customer and
    nation broadcast; the top-k compiles to TakeOrderedAndProject."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    disc_price = (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
    ).cast(DEC)
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(disc_price).alias("_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            round4(F.col("_rev").cast("double")).alias("revenue"),
            "n_items",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
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


def national_market_share(
    spark: SparkSession,
    sf_dir: str,
    supp_nation: str = "NATION_3",
    region: str = "ASIA",
    p_type: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8 shape: a 6-table join computing one nation's share of a
    region's market for one part type, by order year.

    Scale plan: the three dims that survive their filters (part rows of one
    type, supplier, nation/region) broadcast; lineitem joins orders on the
    shuffled fact key.  customer broadcasts here but shifts to a shuffle
    join at 100 TB — the plan is otherwise unchanged.  The share division
    happens after aggregation on exact decimals, so both engines see
    identical doubles.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == p_type)
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region_df = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == region
    )
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    cust_nation = nation.alias("cn").join(
        F.broadcast(region_df), F.col("cn.n_regionkey") == F.col("r_regionkey")
    )
    supp_nation_df = nation.alias("sn")

    volume = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
    ).cast(DEC)
    joined = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(cust_nation),
            F.col("c_nationkey") == F.col("cn.n_nationkey"),
        )
        .join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(supp_nation_df),
            F.col("s_nationkey") == F.col("sn.n_nationkey"),
        )
        .select(
            F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year"),
            volume.alias("volume"),
            F.col("sn.n_name").alias("supp_nation_name"),
        )
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(
            F.when(
                F.col("supp_nation_name") == supp_nation, F.col("volume")
            ).otherwise(F.lit(0).cast(DEC))
        ).alias("_nation_vol"),
        F.sum("volume").alias("_total_vol"),
    )
    return agg.select(
        "o_year",
        round4(
            F.col("_nation_vol").cast("double") / F.col("_total_vol").cast("double")
        ).alias("mkt_share"),
    )


def small_quantity_revenue(
    spark: SparkSession, sf_dir: str, brand: str = "Brand#23"
) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity orders
    (below 20% of the per-part average quantity) moved to bulk.

    Adaptation note: testdata ``part`` has no ``p_container`` column, so the
    classic (p_brand, p_container) filter keeps only the brand predicate.

    The correlated subquery ``l_quantity < 0.2 * avg(l_quantity per part)``
    becomes a window average over ``l_partkey`` *after* the broadcast
    semi-reduction to one brand's parts — the windowed set is ~1/25 of
    lineitem, and no second scan happens.  The 0.2x-average comparison is
    rearranged to exact integer-decimal math (``5 * qty * cnt < sum``), so
    neither engine's double ``avg()`` rounding can flip a boundary row.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    lineitem = load_table(spark, sf_dir, "lineitem")
    matched = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    qty = _dec("l_quantity")
    qualified = (
        matched.withColumn("_sum_qty", F.sum(qty).over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(w))
        .filter(
            (qty * F.lit(5) * F.col("_cnt")).cast(DEC)
            < F.col("_sum_qty").cast(DEC)
        )
    )
    # Sum exactly as decimal, then ONE double division: decimal division
    # scale rules differ between engines, but IEEE double division of
    # identical inputs is bit-identical.
    return qualified.agg(
        round4(
            F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)
        ).alias("avg_yearly")
    )


def waiting_suppliers(
    spark: SparkSession,
    sf_dir: str,
    late_days: int = 30,
    k: int = 10,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on
    finished multi-supplier orders.

    Adaptation note: testdata ``lineitem`` has no commit/receipt dates, so
    "late" is re-based as ``l_shipdate > o_orderdate + late_days`` — the
    exists/not-exists structure of the classic query is preserved.

    Spark-first rewrite: instead of the textbook EXISTS/NOT EXISTS pair of
    correlated self-joins (two extra shuffles of lineitem), the fact rows
    collapse to (order, supplier, any-late) grain first — one map-side
    combinable shuffle, no distinct aggs — and a second tiny agg per
    order counts suppliers, late suppliers, and the single culprit
    (r10: the earlier two-countDistinct formulation forced an Expand
    that tripled every joined row through the shuffle); orders with
    >= 2 suppliers and exactly one late supplier charge that supplier.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")

    ship_us = to_epoch_micros(lineitem, "l_shipdate")
    li = lineitem.select(
        "l_orderkey", "l_suppkey", ship_us.alias("_ship_us")
    )
    od_us = to_epoch_micros(orders, "o_orderdate")
    joined = li.join(
        orders.select("o_orderkey", od_us.alias("_od_us")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "_late",
        F.col("_ship_us") > F.col("_od_us") + F.lit(late_days * 86_400_000_000),
    )
    per_supp = joined.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("_late").cast("int")).alias("_any_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_supp"),
        F.sum("_any_late").alias("_n_late"),
        F.min(
            F.when(F.col("_any_late") == 1, F.col("l_suppkey"))
        ).alias("_culprit"),
    )
    culprit = (
        per_order.filter((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1))
        .select(F.col("_culprit").alias("suppkey"))
        .groupBy("suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        culprit.join(
            F.broadcast(supplier), F.col("suppkey") == F.col("s_suppkey")
        )
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )


def asof_attribution(
    spark: SparkSession,
    sf_dir: str,
    event: str = "purchase",
    cause: str = "click",
) -> DataFrame:
    """AS-OF join — the operator Spark lacks natively (the brief's canonical
    custom-operator example): for every ``event`` row, the most recent
    ``cause`` row of the same user at or before it (marketing attribution /
    point-in-time feature lookup).

    Spark-first formulation: no join at all.  Union both sides tagged,
    sort once per user by (ts, event_id), and carry the last-seen cause
    forward with ``last(ignorenulls=True)`` over the running window — one
    shuffle on user_id, linear scan per partition.  The textbook
    equi-join + filter + argmax form shuffles twice and materializes the
    full (event x candidate-cause) pair space; this is O(n log n) total.
    Skewed power-users are bounded by per-user event counts (and at 100 TB
    the events table is date-partitioned, so the window runs per
    (date-bucket, user) slice).

    Output: event_id (the purchase), user_id, ts_us, cause_event_id (NULL
    when no prior cause), gap_us (NULL likewise).
    """
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin(event, cause)).select(
        "event_id",
        "user_id",
        to_epoch_micros(ev, "ts").alias("ts_us"),
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cause_id = F.when(F.col("event_type") == cause, F.col("event_id"))
    cause_ts = F.when(F.col("event_type") == cause, F.col("ts_us"))
    carried = base.select(
        "*",
        F.last(cause_id, ignorenulls=True).over(w).alias("cause_event_id"),
        F.last(cause_ts, ignorenulls=True).over(w).alias("cause_ts"),
    )
    return carried.filter(F.col("event_type") == event).select(
        "event_id",
        "user_id",
        "ts_us",
        "cause_event_id",
        (F.col("ts_us") - F.col("cause_ts")).alias("gap_us"),
    )


def _with_event_minute(ev: DataFrame) -> DataFrame:
    """events + ``m`` minute-bucket column via integer division on exact
    epoch-micros (`div`, matching the oracles' `//`) — shared by every
    minute resampler so the bucketing can never drift between them.
    Both Spark's `div` and DuckDB's `//` truncate toward zero, so the
    two engines agree even for pre-epoch timestamps; the point of this
    helper is eliminating the earlier DOUBLE-precision quotient, whose
    rounding at extreme magnitudes could land in the wrong minute —
    the engine determinism rule ("integer div, not float /, on
    epoch-micros") exists for that, not for floor-vs-truncate."""
    from zipkin_storage_kafka_spark.sources.tables import to_epoch_micros

    return (
        ev.withColumn("_us", to_epoch_micros(ev, "ts"))
        .withColumn("m", F.expr("_us div 60000000"))
        .drop("_us")
    )


def _minute_spine(
    bounds: DataFrame, keyed: DataFrame | None = None
) -> DataFrame:
    """Minute grid between the 1-row global (lo, hi) bounds: sequence +
    explode from ONE aggregated row — no driver loop, no cross join
    against a fact table.  With ``keyed`` (a tiny key dim), the grid is
    replicated per key row."""
    if keyed is None:
        return bounds.select(F.explode(F.sequence("lo", "hi")).alias("m"))
    return keyed.crossJoin(F.broadcast(bounds)).select(
        *keyed.columns, F.explode(F.sequence("lo", "hi")).alias("m")
    )


def minute_resample(
    spark: SparkSession, sf_dir: str, event: str = "purchase"
) -> DataFrame:
    """Zero-filled time resample: events-per-minute over the full observed
    range, with empty minutes present as 0 rows (the gap-fill shape every
    time-series dashboard needs; Spark has no native gap-fill).

    The minute spine generates from ONE aggregated (min, max) row via
    ``sequence`` + explode — no driver loop, no cross join against the fact
    table; counts broadcast-join onto the spine (the spine is
    range-bounded, the counts table is at most as large).  At 100 TB the
    same plan holds per day-partition.

    Output: minute_ms (epoch millis), n_events.
    """
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    marked = (
        _with_event_minute(ev)
        .filter(F.col("event_type") == event)
        .select("m")
    )
    counts = marked.groupBy("m").agg(F.count(F.lit(1)).alias("n_events"))
    bounds = marked.agg(
        F.min("m").alias("lo"), F.max("m").alias("hi")
    )
    spine = _minute_spine(bounds)
    return (
        spine.join(counts, "m", "left")
        .select(
            (F.col("m") * 60_000).alias("minute_ms"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


def locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill time resample (LOCF — last observation carried
    forward): per (event_type, minute) mean value on the full observed
    minute grid, with unobserved minutes carrying the PREVIOUS
    observation forward — the sensor/price gap-fill semantics
    (TimescaleDB's ``locf``, QuestDB's ``FILL(PREV)``) that the
    zero-fill ``minute_resample`` deliberately does not provide, and
    Spark has no native operator for.

    Shape: the minute spine generates from ONE global (min, max) row
    via ``sequence`` + explode, cross-joined to the tiny distinct-type
    dim; observed minute means broadcast-join onto the spine; the carry
    is ``last(value, ignorenulls)`` over a window PARTITIONED by
    event_type (never a global sort).  Minutes before a type's first
    observation stay NULL (nothing to carry).

    Output: event_type, minute_ms, value (round4, nullable),
    is_observed.

    Scale (100 TB): the spine is (types x observed minutes) — data-RANGE
    bound, not data-volume bound (a year is 525k minutes/type); at scale
    the same plan runs per day-partition and the per-type window is a
    few-thousand-row sort per partition.
    """
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    base = _with_event_minute(ev).select("event_type", "m", "value")
    # ONE fact-table pass: bounds and the type dim both derive from the
    # already-aggregated tiny obs relation (the groupBy preserves every
    # observed (type, minute)), and the lazy checkpoint stops the three
    # consumers from each re-planning the scan+aggregate subtree —
    # justified here because obs is CELL-sized (types x minutes), not
    # corpus-sized (SCALE.md r11 localCheckpoint contract).
    obs = (
        base.groupBy("event_type", "m")
        .agg(round4(F.avg("value")).alias("v"))
        .localCheckpoint(eager=False)
    )
    bounds = obs.agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
    types = obs.select("event_type").distinct()
    spine = _minute_spine(bounds, keyed=types)
    # no broadcast hint on obs: it grows with (types x observed minutes)
    # — range-bounded but NOT small-bounded (525k rows/type-year), so
    # the join strategy belongs to the planner (AQE broadcasts it while
    # it is small, and degrades gracefully to a shuffle join when a long
    # retention window outgrows the broadcast limit)
    j = spine.join(obs, ["event_type", "m"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "event_type",
        (F.col("m") * 60000).alias("minute_ms"),
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNotNull().alias("is_observed"),
    )


def rolling_revenue(spark: SparkSession, sf_dir: str, days: int = 7) -> DataFrame:
    """Trailing N-day revenue via a RANGE window frame (time-based frames
    are the window feature the rank/rows examples don't cover): revenue per
    order day + the trailing 7-day sum including that day.

    Daily pre-aggregation happens FIRST, so the range window slides over
    one row per day (thousands of rows), not the raw fact table.  Exact
    decimal daily sums; the trailing sum adds exact decimals, converting to
    double only at output.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
    ).cast(DEC)
    daily = (
        lineitem.select(
            to_epoch_micros(lineitem, "l_shipdate").alias("_us"),
            disc_price.alias("rev"),
        )
        # exact integer division (`div`), matching the oracle's `//` — a
        # double divide + cast can flip at day boundaries
        .withColumn("day_idx", F.expr("_us div 86400000000"))
        .groupBy("day_idx")
        .agg(F.sum("rev").alias("_day_rev"))
    )
    # per-day rows are bounded by the corpus date span (a few thousand at
    # ANY data scale): the trailing sum is a broadcast range self-join
    # over that tiny table rather than an unpartitioned range window —
    # same rows (existing days only), no single-partition WindowExec.
    d2 = daily.select(
        F.col("day_idx").alias("_d"), F.col("_day_rev").alias("_r")
    )
    in_window = (F.col("_d") <= F.col("day_idx")) & (
        F.col("_d") >= F.col("day_idx") - (days - 1)
    )
    return (
        daily.join(F.broadcast(d2), in_window)
        .groupBy("day_idx", "_day_rev")
        .agg(F.sum("_r").alias("_trail"))
        .select(
            "day_idx",
            round4(F.col("_day_rev").cast("double")).alias("day_revenue"),
            round4(F.col("_trail").cast("double")).alias("trailing_revenue"),
        )
    )


def customer_deciles(
    spark: SparkSession, sf_dir: str, mode: str = "exact"
) -> DataFrame:
    """Customer spend deciles: ntile(10) over total order value, reported
    as per-decile aggregates (the whale-curve / LTV-banding query).

    ``mode='exact'`` (default, oracle flavor) is bit-exact SQL ntile over
    the total order (_spend desc, o_custkey) via
    ``operators.ntile.distributed_ntile`` — range partition + two-level
    rank, NO single-partition window, so billions of customers stay
    parallel.  ``mode='approx'`` bands by percentile_approx boundaries
    instead (no total order at all).
    """
    from zipkin_storage_kafka_spark.operators.ntile import (
        approx_buckets,
        distributed_ntile,
    )

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("_spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    if mode == "approx":
        tiled = approx_buckets(
            per_cust, 10, F.col("_spend") * -1, bucket_col="decile"
        )
    else:
        tiled = per_cust.withColumn(
            "_neg_spend", F.col("_spend") * -1
        )
        tiled = distributed_ntile(
            tiled, 10, ["_neg_spend", "o_custkey"], bucket_col="decile"
        ).drop("_neg_spend")
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
            round4(F.sum("_spend").cast("double")).alias("total_spend"),
        )
    )


def late_shipment_priority(
    spark: SparkSession, sf_dir: str, late_days: int = 30, very_late_days: int = 60
) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority audit), adapted to this
    schema: the testdata lineitem has no l_shipmode/l_commitdate, so the
    grouping key is a shipping-delay bucket (l_shipdate - o_orderdate)
    instead of the ship mode, with Q12's signature conditional counts of
    high- vs low-priority lines per bucket.

    Scale: one orderkey shuffle for the fact-fact join (orders projected to
    two columns first), conditional aggregation combines map-side; output
    is 3 rows.  Reference for the count-by-category pattern:
    zipkin-storage-kafka aggregates link counters the same
    conditional-count way (DependencyStorageTopology.java:90-105).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    joined = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    # integer day delta: both timestamps are whole-second micros, and the
    # `div` idiom matches the oracle's // exactly (no double rounding)
    joined = (
        joined.withColumn("_ship_us", to_epoch_micros(joined, "l_shipdate"))
        .withColumn("_order_us", to_epoch_micros(joined, "o_orderdate"))
        .withColumn("_delay_days", F.expr("(_ship_us - _order_us) div 86400000000"))
    )
    bucket = (
        F.when(F.col("_delay_days") <= late_days, F.lit("ON_TIME"))
        .when(F.col("_delay_days") <= very_late_days, F.lit("LATE"))
        .otherwise(F.lit("VERY_LATE"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.withColumn("delay_bucket", bucket)
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def morton32(x: F.Column, y: F.Column) -> F.Column:
    """32-bit Morton interleave of two 16-bit non-negative columns using
    only div/mod/mul/add (x takes even bit positions, y odd) — the
    engine-portable core of :func:`zorder_layout_stats`, pinned against a
    Python bit-interleave in ``test_reference_fixtures.py``."""
    z = F.lit(0).cast("long")
    for i in range(16):
        xbit = (x / F.lit(1 << i)).cast("long") % 2
        ybit = (y / F.lit(1 << i)).cast("long") % 2
        z = z + xbit * F.lit(1 << (2 * i)) + ybit * F.lit(1 << (2 * i + 1))
    return z


def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (minute-bucket, user_id) for the
    events table, with per-zbucket occupancy stats — the write-layout
    computation for multi-dimensional data skipping: sorting 100 TB of
    events by this key before writing parquet co-locates rows that are
    close in BOTH time and user, so range filters on either dimension prune
    row groups (the same reason Delta/Iceberg expose ZORDER BY).

    The 32-bit key interleaves the low 16 bits of each dimension using only
    div/mod/mul/add — no engine bit operators, so the DuckDB oracle computes
    bit-identical keys.  The expression unrolls to 16 terms per dimension,
    all inside one whole-stage-codegen projection; the only shuffle is the
    256-bucket stats aggregation.

    Columns: zbucket, n_events, n_users, min_z, max_z.
    """
    raw = load_table(spark, sf_dir, "events")
    ev = raw.select("user_id", to_epoch_micros(raw, "ts").alias("ts_us"))
    # `div` is exact long division (the float `/`-then-cast could round a
    # ~1.7e15 / 6e7 quotient the other way than DuckDB's integer `//`);
    # the later power-of-two divisions are exact in binary floating point.
    x = F.expr("ts_us div 60000000") % 65536
    y = F.col("user_id") % 65536
    keyed = ev.select(F.col("user_id"), morton32(x, y).alias("zkey"))
    # Two-level agg (r10): collapsing to (zbucket, user) grain first
    # keeps every count a plain map-side-combinable agg — a
    # countDistinct mixed with the other aggs would Expand (duplicate)
    # every event row through the shuffle.
    per_user = keyed.groupBy(
        (F.col("zkey") / F.lit(1 << 24)).cast("long").alias("zbucket"),
        "user_id",
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("zkey").alias("_min_z"),
        F.max("zkey").alias("_max_z"),
    )
    return per_user.groupBy("zbucket").agg(
        F.sum("_n").alias("n_events"),
        F.count(F.lit(1)).alias("n_users"),
        F.min("_min_z").alias("min_z"),
        F.max("_max_z").alias("max_z"),
    )


def order_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct (l_orderkey, brand) basket-membership relation —
    lineitem joined to the broadcast part dim, collapsed to distinct.
    This is the only corpus-sized work in BOTH basket rows
    (w_basket_brand_pairs and w_next_basket_rules), so the registry
    materializes it once per corpus snapshot (the shingles/links
    pattern) and each consumer pays a two-column parquet scan.

    Columns: l_orderkey, brand.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_brand").alias("brand"),
    )
    return (
        li.join(F.broadcast(part), "l_partkey")
        .select("l_orderkey", "brand")
        .distinct()
    )


def next_basket_rules(
    spark: SparkSession, sf_dir: str, brands: DataFrame | None = None
) -> DataFrame:
    """SEQUENTIAL association rules at brand grain: for every pair of
    CONSECUTIVE orders by the same customer, which brand in the earlier
    basket predicts which brand in the next one — the next-basket
    recommendation panel (the static basket kernel asks "bought
    together"; this asks "bought NEXT", which is what a replenishment
    or cross-sell model actually consumes).

    Exact integers end to end: supports are distinct-order-pair counts,
    and lift_micro = n_ab * T * 1e6 div (n_a * n_b) widens to
    DECIMAL(38,0) before the multiply so corpus-scale supports cannot
    wrap int64.  Rules with support < 2 are kept (the oracle replays
    the same cut-free table) — thresholding is the consumer's call.

    Columns: brand_a, brand_b, n_seq_pairs, n_a, n_b, lift_micro.

    Scale (100 TB): the consecutive-order chain is a customer-keyed
    lag window over the ORDERS dimension (never lineitem); brand sets
    collapse lineitem to distinct (order, brand) first; the rule join
    fans out bounded by brands-per-order squared (~16), grouped
    straight down to the 625-row brand x brand table.

    r10 scale pass (VERDICT r09 next-round #5, 3.9x at 10x data):
    every order appears AT MOST ONCE as k_prev and at most once as
    k_next (lag/lead over a per-customer total order), so the old
    per-margin ``chain JOIN brands DISTINCT`` pipelines were
    distinct-ing an already-unique relation — two full shuffles of a
    |chain| x brands-per-order relation for nothing.  The margins are
    just brand counts over orders flagged has-successor /
    has-predecessor, computed by SUBTRACTION: a map-side total per
    brand minus a correction join against only the ~2x|customers|
    chain-END orders (the sole orders lacking a neighbor), replacing
    both full-relation margin pipelines.  Measured min-of-4: sf1
    5.63 -> 3.38 s, sf0.1 ~1.5 s, 10x ratio 4.3x -> ~2.2x.
    """
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    orders = load_table(spark, sf_dir, "orders")
    seq = orders.select(
        "o_orderkey",
        "o_custkey",
        to_epoch_micros(orders, "o_orderdate").alias("od_us"),
    )
    w = Window.partitionBy("o_custkey").orderBy("od_us", "o_orderkey")
    flagged = seq.select(
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    ).localCheckpoint(eager=False)
    chain = flagged.filter(F.col("prev_orderkey").isNotNull()).select(
        F.col("prev_orderkey").alias("k_prev"),
        F.col("o_orderkey").alias("k_next"),
    )
    # Checkpoint the membership UNCONDITIONALLY: four consumers below
    # read it, and a same-session A/B (r11) measured the checkpoint
    # faster even when the caller feeds the persisted matcache relation
    # (2.70 vs 2.92/3.35 s idle; in-bench the checkpointed shape held
    # 1.56 s where the no-checkpoint cut drifted to 2.28) — re-reading
    # a persisted InMemoryRelation four times costs more per consumer
    # than one narrow checkpoint write.  SCALE.md r11 records the
    # block-accumulation trade-off once for all sites.
    if brands is None:
        brands = order_brands(spark, sf_dir)
    brands = brands.localCheckpoint(eager=False)
    ba = brands.select(
        F.col("l_orderkey").alias("k_prev"), F.col("brand").alias("brand_a")
    )
    bb = brands.select(
        F.col("l_orderkey").alias("k_next"), F.col("brand").alias("brand_b")
    )
    pair_rel = chain.join(ba, "k_prev").join(bb, "k_next")
    n_ab = pair_rel.groupBy("brand_a", "brand_b").agg(
        F.count(F.lit(1)).alias("n_seq_pairs")
    )
    # Margin counts by SUBTRACTION: n_a = per-brand count over orders
    # with a successor = total per-brand order count minus the count
    # over each customer's LAST order (the only orders lacking one);
    # n_b symmetrically subtracts FIRST orders.  totals is a map-side
    # partial agg over the brands scan (no join), and the correction
    # join touches only the ~2x|customers| chain-end orders instead of
    # the full |orders| flag relation.
    totals = brands.groupBy("brand").agg(F.count(F.lit(1)).alias("n_tot"))
    ends = flagged.filter(
        F.col("prev_orderkey").isNull() | F.col("next_orderkey").isNull()
    ).select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("next_orderkey").isNull().cast("long").alias("is_last"),
        F.col("prev_orderkey").isNull().cast("long").alias("is_first"),
    )
    end_counts = (
        brands.join(ends, "l_orderkey")
        .groupBy("brand")
        .agg(
            F.sum("is_last").alias("n_last"),
            F.sum("is_first").alias("n_first"),
        )
    )
    margins = (
        totals.join(end_counts, "brand", "left")
        .select(
            "brand",
            (F.col("n_tot") - F.coalesce("n_last", F.lit(0))).alias("n_a"),
            (F.col("n_tot") - F.coalesce("n_first", F.lit(0))).alias("n_b"),
        )
        .localCheckpoint(eager=False)
    )
    t_df = chain.agg(F.count(F.lit(1)).alias("t"))
    return (
        n_ab.join(
            F.broadcast(
                margins.select(F.col("brand").alias("brand_a"), "n_a")
            ),
            "brand_a",
        )
        .join(
            F.broadcast(
                margins.select(F.col("brand").alias("brand_b"), "n_b")
            ),
            "brand_b",
        )
        .crossJoin(F.broadcast(t_df))
        .select(
            "brand_a",
            "brand_b",
            "n_seq_pairs",
            "n_a",
            "n_b",
            F.expr(
                "cast(n_seq_pairs as decimal(38,0)) * t * 1000000"
                " div (n_a * n_b)"
            ).alias("lift_micro"),
        )
    )


DID_SPLIT_US = 891_388_800_000_000  # 1998-04-01 UTC


def promo_lift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences promo lift — the causal-panel class:
    revenue per line for PROMO parts vs non-promo parts, BEFORE vs
    AFTER a fixed date split, and the DiD estimate
    (promo_after - promo_before) - (other_after - other_before) that
    nets out the seasonality both groups share.  The four cells come
    from ONE conditional aggregation over the fact scan (the
    link_window_diff discipline — never four filtered scans).

    Exact integers: revenue quantizes to cents at the row
    (round(extendedprice * (1 - discount) * 100) — the engines' shared
    quantization), cell means are micro-cents by integer division, and
    the DiD is a difference of those integers — the row cannot
    hash-flip.

    Columns: one row — n_promo_before, n_promo_after, n_other_before,
    n_other_after, promo_before_micro, promo_after_micro,
    other_before_micro, other_after_micro, did_micro.

    Scale (100 TB): lineitem joins the part dim on partkey (keyed),
    then a single partial agg to ONE row.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        "l_partkey",
        (to_epoch_micros(li, "l_shipdate") >= DID_SPLIT_US).alias("after"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        )
        .cast("long")
        .alias("rev_cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").startswith("PROMO").alias("promo"),
    )
    cell = rows.join(part, "l_partkey")

    def n(p, a):
        return F.sum(
            ((F.col("promo") == p) & (F.col("after") == a)).cast("long")
        )

    def s(p, a):
        return F.sum(
            F.when(
                (F.col("promo") == p) & (F.col("after") == a),
                F.col("rev_cents"),
            ).otherwise(F.lit(0))
        )

    agg = cell.agg(
        n(True, False).alias("n_pb"),
        n(True, True).alias("n_pa"),
        n(False, False).alias("n_ob"),
        n(False, True).alias("n_oa"),
        s(True, False).alias("s_pb"),
        s(True, True).alias("s_pa"),
        s(False, False).alias("s_ob"),
        s(False, True).alias("s_oa"),
    )
    # micro-cent means widen the sum to DECIMAL(38,0) before the *1e6
    # (cents-sum * 1e6 passes int64 around sf1 already); div returns long
    def mean_micro(sc, nc):
        return f"cast({sc} as decimal(38,0)) * 1000000 div {nc}"

    return agg.select(
        F.col("n_pb").alias("n_promo_before"),
        F.col("n_pa").alias("n_promo_after"),
        F.col("n_ob").alias("n_other_before"),
        F.col("n_oa").alias("n_other_after"),
        F.expr(mean_micro("s_pb", "n_pb")).alias("promo_before_micro"),
        F.expr(mean_micro("s_pa", "n_pa")).alias("promo_after_micro"),
        F.expr(mean_micro("s_ob", "n_ob")).alias("other_before_micro"),
        F.expr(mean_micro("s_oa", "n_oa")).alias("other_after_micro"),
        F.expr(
            f"({mean_micro('s_pa', 'n_pa')} - {mean_micro('s_pb', 'n_pb')})"
            f" - ({mean_micro('s_oa', 'n_oa')}"
            f" - {mean_micro('s_ob', 'n_ob')})"
        ).alias("did_micro"),
    )


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantity-weighted median extended price per supplier
    nation — the weighted-quantile operator class (the unweighted
    percentile rows interpolate; a weighted median answers "the price
    at which half the UNITS ship", which no approx-percentile over raw
    rows gives exactly).

    Scale-safe shape: collapse lineitem to (nation, price_cents) weight
    cells FIRST (one partial agg — the corpus never enters a window),
    then the per-nation cumulative weight runs over the collapsed
    relation, bounded by DISTINCT prices per nation, not rows.  The
    median is the smallest price whose doubled cumulative weight
    reaches the nation total (lower weighted median — exact integer
    comparisons, engine-identical).

    Columns: nation, total_qty, median_price_cents.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("price_cents"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("nation"),
    )
    cells = (
        li.join(sup, "l_suppkey")
        .join(F.broadcast(nat), "s_nationkey")
        .groupBy("nation", "price_cents")
        .agg(F.sum("qty").alias("w"))
    )
    wcum = Window.partitionBy("nation").orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy("nation")
    ranked = cells.select(
        "nation",
        "price_cents",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wtot).alias("total"),
    ).filter(2 * F.col("cum") >= F.col("total"))
    wmin = Window.partitionBy("nation").orderBy("price_cents")
    return (
        ranked.withColumn("rk", F.row_number().over(wmin))
        .filter(F.col("rk") == 1)
        .select(
            "nation",
            F.col("total").alias("total_qty"),
            F.col("price_cents").alias("median_price_cents"),
        )
    )


def discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS fit of quantity on discount — the price-elasticity
    panel ("does a deeper discount move more units, and for which
    brands?") that turns the raw Q6-style revenue scan into a
    parameter a pricing team can act on.  The per-GROUP least-squares
    fit is an operator class of its own: the five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²[, Σy²]) are ONE partial agg, so the fit
    distributes like any counter and never materializes residuals.

    Exact sufficient statistics: discount quantizes to integer CENTS
    (round(d*100) — exact for the 0.00..0.10 domain) and quantity to
    integer units, so all five sums are engine-exact int64 and the two
    engines disagree only inside the final double division (round4,
    like every float boundary).  Degenerate brands (zero discount or
    quantity variance) drop via the denominator guard rather than
    emitting a NULL fit.

    Columns: brand, n_lines, slope_round4 (quantity units per FULL
    discount unit, i.e. cents-slope x 100), corr_round4.

    Scale (100 TB): lineitem joins the part dimension on partkey — a
    KEYED join, not broadcast (the part dim is corpus-sized; the
    basket_lift margins broadcast because brands are 25 rows, which is
    the OUTPUT grain here, not the join grain); then one 25-row
    partial agg.  int64 moments hold to ~1e9 rows/group (n*syy ~
    2.5e3 * n²); past that the five sums move to DECIMAL(38,0) — same
    plan, wider type.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("y"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    s = (
        li.join(part, "l_partkey")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        s.filter((denx > 0) & (deny > 0))
        .select(
            "brand",
            F.col("n").alias("n_lines"),
            round4(
                num.cast("double") / denx.cast("double") * F.lit(100.0)
            ).alias("slope_round4"),
            round4(
                num.cast("double")
                / (
                    F.sqrt(denx.cast("double"))
                    * F.sqrt(deny.cast("double"))
                )
            ).alias("corr_round4"),
        )
    )


ATTRIB_LOOKBACK_US = 7 * 86_400_000_000  # 7-day attribution window


def multitouch_attribution(
    spark: SparkSession,
    sf_dir: str,
    event: str = "purchase",
    cause: str = "click",
) -> DataFrame:
    """Multi-touch attribution panel — the full-credit complement of
    :func:`asof_attribution`'s last-touch as-of join: every ``cause``
    touch in the 7-day window before a conversion shares the credit,
    under two schemes side by side ('linear': equal split; 'last':
    everything to the most recent touch), rolled up by LAG DAYS between
    touch and conversion — the "how long before purchase do converting
    clicks happen" curve a marketing pipeline fits decay models to.

    Exact integer credit: each conversion distributes 1,000,000 micro
    units; linear gives each of its k touches 1e6 div k with the
    remainder assigned to the MOST RECENT touch (deterministic), so
    credit is conserved exactly — sum(credit) = 1e6 * attributed
    conversions, an invariant the tests pin.

    Scale (100 TB): the (conversion x touch) pair relation is a
    user-keyed equi-join with the lookback range predicate — pair mass
    is bounded by touches-per-user-per-window, never users²; the
    per-conversion k and recency rank are one window over the pair
    relation partitioned by conversion id; output collapses to ≤ 8 lag
    buckets per scheme.

    Output: scheme, lag_days, n_touches, credit_micro.
    """
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin(event, cause)).select(
        "event_id",
        "user_id",
        to_epoch_micros(ev, "ts").alias("ts_us"),
        "event_type",
    )
    conv = base.filter(F.col("event_type") == event).select(
        F.col("user_id").alias("_u"),
        F.col("event_id").alias("p_id"),
        F.col("ts_us").alias("p_ts"),
    )
    touch = base.filter(F.col("event_type") == cause).select(
        "user_id",
        F.col("event_id").alias("c_id"),
        F.col("ts_us").alias("c_ts"),
    )
    pairs = conv.join(
        touch,
        (F.col("_u") == F.col("user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.lit(ATTRIB_LOOKBACK_US)),
    )
    wk = Window.partitionBy("p_id")
    wr = Window.partitionBy("p_id").orderBy(
        F.col("c_ts").desc(), F.col("c_id").desc()
    )
    scored = pairs.select(
        F.expr(f"(p_ts - c_ts) div {86_400_000_000}").alias("lag_days"),
        F.count(F.lit(1)).over(wk).alias("k"),
        F.row_number().over(wr).alias("rn"),
    )
    linear = scored.select(
        F.lit("linear").alias("scheme"),
        "lag_days",
        (
            F.expr("1000000 div k")
            + F.when(F.col("rn") == 1, F.expr("1000000 % k")).otherwise(
                F.lit(0)
            )
        ).alias("credit"),
    )
    last = scored.filter(F.col("rn") == 1).select(
        F.lit("last").alias("scheme"),
        "lag_days",
        F.lit(1_000_000).alias("credit"),
    )
    return (
        linear.unionByName(last)
        .groupBy("scheme", "lag_days")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit").alias("credit_micro"),
        )
    )


CHECKSUM_TABLES = (
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("lineitem", "concat(l_orderkey, ':', l_linenumber)"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)
CHECKSUM_MOD = 1_000_003  # prime; sum fits int64 to ~9e12 rows


def table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine integrity fingerprint of every corpus table: row
    count + an ORDER-INDEPENDENT key checksum (sum over rows of
    md5-derived 32-bit values mod a prime) — the replicate-and-compare
    primitive a 100 TB migration runs on both sides before cutover
    (what the driver's value-hash gate does for query results, as a
    first-class operator for the base tables themselves).

    Engine-exact: the per-row value is integer md5 arithmetic
    (CAST/conv of the first 8 hex chars) mod 1000003, commutative
    addition — so any engine, any partitioning, any row order produces
    the identical pair (n_rows, key_checksum).  The mod keeps the sum
    inside int64 to ~9e12 rows per table; wider corpora shard the
    checksum by key range and compare per shard.

    Scale (100 TB): one column-pruned scan per table (only the key
    columns are read — parquet never materializes payloads), each a
    partial agg to ONE row; the 10-row result is a metadata relation.

    Output: tbl, n_rows, key_checksum (one row per table).
    """
    out = None
    for tbl, key in CHECKSUM_TABLES:
        t = load_table(spark, sf_dir, tbl)
        row_val = F.expr(
            f"cast(conv(substring(md5(cast(({key}) as string)), 1, 8),"
            f" 16, 10) as bigint) % {CHECKSUM_MOD}"
        )
        one = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(row_val).alias("key_checksum"),
        ).select(F.lit(tbl).alias("tbl"), "n_rows", "key_checksum")
        out = one if out is None else out.unionByName(one)
    return out


ZONE_MAP_SHARD_US = 2_592_000_000_000  # 30-day range shards
ZONE_MAP_LO_US = 883_612_800_000_000  # 1998-01-01 UTC
ZONE_MAP_HI_US = 899_251_200_000_000  # 1998-07-01 UTC


def zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data-skipping audit (the min/max file-footer statistics
    Delta/Iceberg/parquet row groups prune on): lay the lineitem fact
    out two ways — 32 hash shards on l_orderkey (the ingest-order
    layout every pipeline starts with) vs 30-day l_shipdate range
    shards (the time-partitioned layout) — build each layout's
    per-shard (min, max) shipdate zone map, and report how much of the
    corpus a fixed 6-month predicate window could SKIP under each: the
    measurement that justifies a re-layout job before anyone pays for
    it (ev_zorder_layout plans the multi-dimension variant; this row
    quantifies the benefit in rows and shards for the 1-D case).

    A shard is pruned iff its zone proves emptiness: zmax < lo OR
    zmin >= hi.  All math is exact int64 (epoch micros, integer div),
    so both engines prune the identical shard set.

    Columns: layout, n_shards, shards_scanned, rows_total,
    rows_scanned, rows_matched, scan_efficiency_micro
    (= rows_matched * 1e6 div rows_scanned).

    Scale (100 TB): ONE fact scan — the two layouts stack into
    (layout, shard) rows inside the scan projection, then a single
    partial agg to layout x shard cardinality (~32 + ~80 rows) and a
    2-row rollup; the fact is never shuffled at row grain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey"),
        to_epoch_micros(li, "l_shipdate").alias("sd_us"),
    )
    lo, hi = ZONE_MAP_LO_US, ZONE_MAP_HI_US
    stacked = base.select(
        F.expr(
            "stack(2, 'hash', l_orderkey % 32,"
            f" 'date', sd_us div {ZONE_MAP_SHARD_US}) AS (layout, shard)"
        ),
        "sd_us",
    )
    zm = stacked.groupBy("layout", "shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            ((F.col("sd_us") >= lo) & (F.col("sd_us") < hi)).cast("long")
        ).alias("matched"),
        F.min("sd_us").alias("zmin"),
        F.max("sd_us").alias("zmax"),
    )
    pruned = (F.col("zmax") < lo) | (F.col("zmin") >= hi)
    return (
        zm.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum((~pruned).cast("long")).alias("shards_scanned"),
            F.sum("rows").alias("rows_total"),
            F.sum(F.when(pruned, F.lit(0)).otherwise(F.col("rows"))).alias(
                "rows_scanned"
            ),
            F.sum("matched").alias("rows_matched"),
        )
        .withColumn(
            "scan_efficiency_micro",
            F.expr("rows_matched * 1000000 div rows_scanned"),
        )
    )


def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event ``value`` stream — the
    observability-metrics integral (a gauge sampled at irregular points,
    weighted by how long each sample was current; step interpolation).

    Each value is held from its event until the user's next event; the
    last event carries no weight (no known horizon).  Weights are exact:
    value is scaled to integer millis and multiplied by the exact micro
    gap, so the weighted sum is a bigint under any aggregation order; only
    the final single division is floating point (identical in both
    engines, rounded to 4 decimals).

    Single-shuffle shape: the lead window and the groupBy share the
    user_id partitioning, so the exchange is reused (same plan family as
    gap sessionization).  Columns: user_id, n_intervals, total_dt_us,
    weighted_sum, twa_value.
    """
    raw = load_table(spark, sf_dir, "events")
    ev = raw.select(
        "user_id",
        "event_id",
        to_epoch_micros(raw, "ts").alias("ts_us"),
        F.round(F.col("value") * 1000, 0).cast("long").alias("value_milli"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    stepped = ev.withColumn(
        "dt_us", F.lead("ts_us").over(w) - F.col("ts_us")
    ).filter(F.col("dt_us").isNotNull())
    return stepped.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_us").alias("total_dt_us"),
        F.sum(F.col("value_milli") * F.col("dt_us")).alias("weighted_sum"),
        round4(
            F.sum(F.col("value_milli") * F.col("dt_us"))
            / (F.lit(1000.0) * F.sum("dt_us"))
        ).alias("twa_value"),
    )


# Derived partsupp + the partsupp-dependent TPC-H shapes ----------------------
#
# The driver testdata has no partsupp table (SURVEY section 7 adaptation
# note), so the Q2/Q9/Q11 shapes run against a DETERMINISTIC derived
# relation: every part gets 4 suppliers at formula-defined keys, with
# integer availability and cost-in-cents — pure arithmetic both engines
# compute identically, keeping the oracle exact while preserving each
# query's join/aggregation shape.

PS_PER_PART = 4


def _ps_cost_cents(pk, sk):
    return (pk * 37 + sk * 23) % 99900 + 100


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_availqty, ps_cost_cents): 4 suppliers
    per part at `(p*4 + i*7) % |supplier|`; cost/availability are mod
    formulas of the key pair.  The supplier count rides as a broadcast
    1-row aggregate — no driver collect."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    n_s = (
        load_table(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    i = F.explode(F.array(*[F.lit(k) for k in range(PS_PER_PART)])).alias(
        "i"
    )
    ps0 = part.crossJoin(F.broadcast(n_s)).select("p_partkey", "n_supp", i)
    sk = (F.col("p_partkey") * 4 + F.col("i") * 7) % F.col("n_supp")
    return ps0.select(
        F.col("p_partkey").alias("ps_partkey"),
        sk.cast("long").alias("ps_suppkey"),
    ).select(
        "ps_partkey",
        "ps_suppkey",
        (
            (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 9999 + 1
        ).alias("ps_availqty"),
        _ps_cost_cents(F.col("ps_partkey"), F.col("ps_suppkey")).alias(
            "ps_cost_cents"
        ),
    )


def important_stock(
    spark: SparkSession, sf_dir: str, nationkey: int = 0, frac_inv: int = 1000
) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value held by one nation's
    suppliers, keeping parts worth more than 1/``frac_inv`` of the
    nation's total.  The HAVING threshold compares exact integers
    (value * frac_inv > total) — no float fraction.  Supplier side and the
    1-row total both broadcast; the only shuffle is the per-part agg.
    Columns: ps_partkey, value_cents."""
    ps = derived_partsupp(spark, sf_dir)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == nationkey)
        .select("s_suppkey")
    )
    held = ps.join(
        F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey")
    ).select(
        "ps_partkey",
        (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v"),
    )
    per_part = held.groupBy("ps_partkey").agg(
        F.sum("v").alias("value_cents")
    )
    total = held.agg(F.sum("v").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents") * F.lit(frac_inv) > F.col("total_cents")
        )
        .select("ps_partkey", "value_cents")
    )


def min_cost_supplier(
    spark: SparkSession, sf_dir: str, size: int = 5, regionkey: int = 0
) -> DataFrame:
    """TPC-H Q2 shape (argmin join-back): for every part of one size, the
    region's cheapest supplier(s) — min-per-group then an equi-join back
    on (part, min cost) to recover supplier attributes.  Region-filtered
    suppliers broadcast (always small); the min agg and join-back reuse
    the ps_partkey partitioning.  Columns: p_partkey, ps_suppkey,
    cost_cents, s_name, n_name."""
    ps = derived_partsupp(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.filter(F.col("n_regionkey") == regionkey)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == size)
        .select("p_partkey")
    )
    cand = (
        ps.join(
            F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey")
        )
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey", "ps_suppkey", "ps_cost_cents", "s_name", "n_name"
        )
    )
    mins = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("ps_cost_cents").alias("_minc")
    )
    return cand.join(
        mins,
        (F.col("p_partkey") == F.col("_pk"))
        & (F.col("ps_cost_cents") == F.col("_minc")),
    ).select(
        "p_partkey",
        "ps_suppkey",
        F.col("ps_cost_cents").alias("cost_cents"),
        "s_name",
        "n_name",
    )


def product_profit(
    spark: SparkSession, sf_dir: str, ptype: str = "PROMO"
) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for one
    product type.  supplycost comes from the derived-partsupp FORMULA
    applied to (l_partkey, l_suppkey) — no extra join for it.  Revenue
    accumulates as DECIMAL and cost as bigint cents (both exact); the one
    double subtraction happens at the output boundary.  part/supplier/
    nation broadcast; lineitem x orders shuffles on the orderkey.
    Columns: n_name, o_year, profit, n_items."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == ptype)
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    disc_price = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(4,2)") - _rate("l_discount"))
    ).cast(DEC)
    cost_cents = _ps_cost_cents(
        F.col("l_partkey"), F.col("l_suppkey")
    ) * F.col("l_quantity").cast("long")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    # year via the epoch-micros bridge so both testdata encodings of
    # o_orderdate (timestamp[us] and nanos-as-bigint) work; session TZ is
    # pinned UTC so the cast matches DuckDB's naive year()
    o_year = F.year(
        F.timestamp_micros(to_epoch_micros(orders, "o_orderdate"))
    )
    grouped = joined.groupBy(
        "n_name", o_year.cast("int").alias("o_year")
    ).agg(
        F.sum(disc_price).alias("_rev"),
        F.sum(cost_cents).alias("_cost_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return grouped.select(
        "n_name",
        "o_year",
        round4(
            F.col("_rev").cast("double")
            - F.col("_cost_cents") / F.lit(100.0)
        ).alias("profit"),
        "n_items",
    )


def pricing_cube(lineitem: DataFrame, ship_cutoff_micros: int) -> DataFrame:
    """CUBE over (returnflag, linestatus): every grouping-set combination —
    (a,b), (a), (b), () — in one pass (the rollup's superset; Spark
    expands the sets map-side, so input is still scanned once).  NULL
    cells labelled 'ALL' as in :func:`pricing_rollup`."""
    ship_us = to_epoch_micros(lineitem, "l_shipdate")
    grouped = (
        lineitem.filter(ship_us <= ship_cutoff_micros)
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("_sum_base"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return grouped.select(
        F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("l_returnflag"),
        F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("l_linestatus"),
        round4(F.col("_sum_qty").cast("double")).alias("sum_qty"),
        round4(F.col("_sum_base").cast("double")).alias("sum_base_price"),
        "count_order",
    )


def excess_stock_suppliers(
    spark: SparkSession,
    sf_dir: str,
    ptype: str = "PROMO",
    lo_micros: int = 0,
    hi_micros: int = 0,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose available stock of one product
    type exceeds half of what they actually shipped in a time window —
    the two-level semi-join with a correlated per-(part, supplier)
    aggregate.  The shipped aggregate shuffles on the composite key;
    partsupp joins it by the same key (exchange reuse); the final
    supplier projection is a broadcast join.  The threshold compares
    exact integers: 2 * availqty > shipped_qty.
    Columns: s_suppkey, s_name, n_parts_over."""
    ps = derived_partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == ptype)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    ship_us = to_epoch_micros(li, "l_shipdate")
    shipped = (
        li.filter((ship_us >= lo_micros) & (ship_us < hi_micros))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("shipped_qty")
        )
    )
    over = (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("shipped_qty"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        over.groupBy("ps_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts_over"))
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_parts_over")
    )


def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model of the event stream: per-user
    event-type transition counts and row-normalized probabilities —
    the Markov matrix funnels, churn models, and anomaly detectors
    start from (a purchase following an error at 3x the base rate is a
    product bug, not a conversion).

    Ordering ties break on event_id (the sessionization convention), so
    the lag chain — and therefore every count — is engine-portable.

    Columns: src, dst, n, p (round4, rows sum to 1 per src).

    Scale (100 TB): one user-keyed window (the same (partition, order)
    spec user_sessions shuffles on — co-partitioned in a shared
    pipeline), partial-agged to |types|^2 rows; the normalizing window
    partitions those k rows per src, never globally.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    trans = (
        ev.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("dst"),
            to_epoch_micros(ev, "ts").alias("ts_us"),
        )
        .withColumn("src", F.lag("dst").over(w))
        .filter(F.col("src").isNotNull())
    )
    counts = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        round4(F.col("n") / F.sum("n").over(tot)).alias("p"),
    )


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) reconstruction from the event
    log: per user, consecutive runs of the same event_type compress to one
    VALIDITY INTERVAL [valid_from_us, valid_to_us) — the "rebuild the
    dimension's history from its change stream" kernel of every warehouse
    (Kimball's SCD2), and the inverse of LOCF gap-fill (``ev_locf_fill``
    reads such intervals; this WRITES them).

    The run compression is gaps-and-islands: a run starts where the state
    differs from the lag state; a running sum of starts numbers the runs;
    one grouped agg collapses each run.  ``valid_to_us`` is the next run's
    start (NULL = current row, the open interval).  All three analytic
    steps share ONE (user_id)-partitioned spec, so the plan is a single
    shuffle + sort per user — no per-state or global window.

    Ties in ts break on event_id (the sessionization convention), making
    the run numbering — and every interval — engine-portable.

    Output: user_id, state, run_idx, valid_from_us, valid_to_us (nullable),
    n_events.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    runs = (
        ev.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("state"),
            to_epoch_micros(ev, "ts").alias("ts_us"),
        )
        .withColumn("_prev", F.lag("state").over(w))
        .withColumn(
            "_is_new",
            F.when(
                F.col("_prev").isNull()
                | (F.col("state") != F.col("_prev")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "run_idx",
            F.sum("_is_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "run_idx")
        .agg(
            F.min("state").alias("state"),  # constant within a run
            F.min("ts_us").alias("valid_from_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    nxt = Window.partitionBy("user_id").orderBy("run_idx")
    return runs.select(
        "user_id",
        "state",
        "run_idx",
        "valid_from_us",
        F.lead("valid_from_us").over(nxt).alias("valid_to_us"),
        "n_events",
    )


def outage_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-activity outage windows per event type: maximal runs of
    minutes with NO event of that type inside the type's own observed
    [first, last] range — the monitor panel behind "did ingestion stop"
    alerts, and the complement of :func:`minute_resample`'s zero-fill
    (this MERGES the zeros into islands instead of listing them).

    Shape: per-type (min, max) bounds partial-agg to k rows; the minute
    spine explodes off those k rows (data-RANGE bound, never
    volume-bound); observed minutes anti-join away; the island merge is
    the gaps-and-islands trick — consecutive missing minutes share
    ``m - row_number()`` — under ONE type-partitioned window.  At 100 TB
    the spine is |types| x observed minutes and the anti-join probes the
    (type, minute) distinct, both tiny beside the corpus scan that feeds
    them.

    Output: event_type, outage_start_ms, outage_minutes.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    marked = _with_event_minute(ev).select("event_type", "m").distinct()
    bounds = marked.groupBy("event_type").agg(
        F.min("m").alias("lo"), F.max("m").alias("hi")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("m")
    )
    missing = spine.join(marked, ["event_type", "m"], "left_anti")
    w = Window.partitionBy("event_type").orderBy("m")
    return (
        missing.withColumn("_grp", F.col("m") - F.row_number().over(w))
        .groupBy("event_type", "_grp")
        .agg(
            (F.min("m") * 60_000).alias("outage_start_ms"),
            F.count(F.lit(1)).alias("outage_minutes"),
        )
        .select("event_type", "outage_start_ms", "outage_minutes")
    )


def rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of the event stream (Hughes 1994, the classic
    direct-marketing kernel): per user, quintile scores for Recency
    (last activity time), Frequency (event count), and Monetary
    (purchase value), plus the combined RFM code — the "who are my
    champions / at-risk / hibernating users" panel.

    Exactness discipline: monetary sums per-event ``round(value*1000)``
    BIGINT millis (order-independent integer sum); each quintile is
    EXACT SQL ntile(5) computed scale-safe by
    ``operators.ntile.distributed_ntile`` (range partition + two-level
    offsets — no single-partition window), tie-broken on user_id so the
    global order, and therefore every score, is engine-portable.  Score
    5 = most recent / most frequent / highest spend (ntile ascending,
    so bucket 5 holds the top of each order).

    Plan: ONE user-keyed partial agg collapses the corpus to |users|
    rows; the three ntile passes run on that k-row relation.

    Output: user_id, last_us, frequency, monetary_milli, r_score,
    f_score, m_score, rfm_code.
    """
    from zipkin_storage_kafka_spark.operators.ntile import distributed_ntile
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.select(
            "user_id",
            to_epoch_micros(ev, "ts").alias("ts_us"),
            F.when(
                F.col("event_type") == "purchase",
                F.expr("cast(round(value * 1000) as bigint)"),
            )
            .otherwise(F.lit(0))
            .alias("val_milli"),
        )
        .groupBy("user_id")
        .agg(
            F.max("ts_us").alias("last_us"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("val_milli").alias("monetary_milli"),
        )
    )
    scored = distributed_ntile(
        users, 5, ["last_us", "user_id"], bucket_col="r_score"
    )
    scored = distributed_ntile(
        scored, 5, ["frequency", "user_id"], bucket_col="f_score"
    )
    scored = distributed_ntile(
        scored, 5, ["monetary_milli", "user_id"], bucket_col="m_score"
    )
    return scored.select(
        "user_id",
        "last_us",
        "frequency",
        "monetary_milli",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("int").alias("rfm_code"),
    )


EWMA_DEPTH = 16


def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA trend smoothing of the per-type minute series (Roberts 1959,
    the control-chart smoother): alpha = 1/2, truncated at
    ``EWMA_DEPTH`` = 16 lags — the dashboard "smoothed rate" line next
    to the raw counts.

    Exactness discipline: with alpha = 1/2 every weight is a power of
    two, so the smoothed numerator is the EXACT integer
    ``sum_{k=0..15} x_{t-k} * 2^(15-k)`` built from 16 ``lag()`` terms
    under ONE type-partitioned window over the ZERO-FILLED minute spine
    (missing minutes contribute 0, exactly as the recursion demands);
    the reported value divides by the weight mass 2^16 - 1 in integer
    micro-units.  No float accumulation anywhere, so any engine agrees
    bit-for-bit.

    Scale: the spine is range-bound (|types| x observed minutes); the
    16-lag window sorts each type's few-thousand-row series once.

    Output: event_type, minute_ms, n_events, ewma_micro.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    marked = _with_event_minute(ev).select("event_type", "m")
    counts = marked.groupBy("event_type", "m").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bounds = marked.groupBy("event_type").agg(
        F.min("m").alias("lo"), F.max("m").alias("hi")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("m")
    )
    filled = spine.join(counts, ["event_type", "m"], "left").select(
        "event_type",
        "m",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy("m")
    num = sum(
        (
            F.coalesce(F.lag("n_events", k).over(w), F.lit(0))
            * F.lit(2 ** (EWMA_DEPTH - 1 - k))
        )
        for k in range(EWMA_DEPTH)
    )
    return filled.select(
        "event_type",
        (F.col("m") * 60_000).alias("minute_ms"),
        "n_events",
        num.alias("_num"),
    ).select(
        "event_type",
        "minute_ms",
        "n_events",
        F.expr(f"(_num * 1000000) div {2 ** EWMA_DEPTH - 1}").alias(
            "ewma_micro"
        ),
    )


DAY_US = 86_400_000_000


def hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete time-to-event hazard curve (the Kaplan-Meier estimator's
    ingredients, Kaplan & Meier 1958): days from each user's first
    'signup' to their first subsequent 'purchase', with users who never
    convert right-censored at the corpus horizon — the
    conversion/survival panel every growth dashboard wants.

    Per day d: n_risk (users still unconverted and uncensored entering
    d), n_events (conversions at d), n_censored (horizons at d), and the
    exact integer hazard n_events*1e6 div n_risk.  The survival curve is
    the running product of (1 - hazard) — left to the reader/BI layer
    because a float cumprod is the one step that is not exactly
    engine-portable; every ingredient here is exact integer math.

    Plan (r14): ONE user-keyed conditional agg (first signup as
    min(CASE WHEN), the purchase times as a per-user sorted array with
    the first at-or-after-signup purchase resolved rowwise by array
    filter + array_min) + a 1-row broadcast horizon collapse the corpus
    to |signup users| rows — the r13 shape's two per-type aggs + two
    user-keyed joins shared one key and fold into one exchange (guide
    2.4); the at-risk cumulation is the triangular join over the day
    histogram (observed-range-bounded, no window).  The horizon stays
    a separate ALL-type scan (max over every event, not just the two
    funnel types).

    Output: day, n_risk, n_events, n_censored, hazard_micro.
    """
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "user_id",
        "event_type",
        to_epoch_micros(ev, "ts").alias("ts_us"),
    )
    cohort = (
        t.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts_us"))
            ).alias("t0"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("event_type") == "purchase", F.col("ts_us")
                    )
                )
            ).alias("_purchases"),
        )
        .filter(F.col("t0").isNotNull())
        .select(
            "t0",
            F.array_min(
                F.filter("_purchases", lambda p: p >= F.col("t0"))
            ).alias("te"),
        )
    )
    horizon = t.agg(F.max("ts_us").alias("hz"))
    per_user = (
        cohort.crossJoin(F.broadcast(horizon))
        .select(
            F.expr(
                f"(coalesce(te, hz) - t0) div {DAY_US}"
            ).alias("day"),
            F.col("te").isNotNull().cast("long").alias("is_event"),
        )
    )
    # |days|-row relation consumed THREE times (both triangular-join
    # sides + the total) — without truncation each consumer re-evaluated
    # the whole corpus subtree (12 pre-AQE parquet scans; the r11 plan
    # audit's many_scans flag).  KB-scale checkpoint.
    hist = (
        per_user.groupBy("day")
        .agg(
            F.sum("is_event").alias("n_events"),
            F.sum(F.lit(1) - F.col("is_event")).alias("n_censored"),
        )
        .localCheckpoint(eager=False)
    )
    a, b = hist.alias("a"), hist.alias("b")
    risk = (
        a.join(b, F.col("b.day") < F.col("a.day"), "left")
        .groupBy(
            F.col("a.day").alias("day"),
            F.col("a.n_events").alias("n_events"),
            F.col("a.n_censored").alias("n_censored"),
        )
        .agg(
            F.coalesce(
                F.sum(F.col("b.n_events") + F.col("b.n_censored")), F.lit(0)
            ).alias("_exited")
        )
    )
    total = hist.agg(
        F.sum(F.col("n_events") + F.col("n_censored")).alias("_n")
    )
    return risk.crossJoin(F.broadcast(total)).select(
        "day",
        (F.col("_n") - F.col("_exited")).alias("n_risk"),
        "n_events",
        "n_censored",
        F.expr("(n_events * 1000000) div (_n - _exited)").alias(
            "hazard_micro"
        ),
    )


def fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment latency distribution by priority: days from
    order placement to the LAST line shipment (the order is complete
    only when its slowest line ships) — the operations panel behind
    shipping-SLA review, and the orders/lineitem twin of the tracing
    side's per-service latency percentiles.

    Shape: one order-keyed partial agg collapses lineitem to per-order
    completion days (exact integer: epoch-micros div DAY on both
    bounds), then per-priority p50/p95 (linear-interpolation percentile,
    the z_latency_percentiles convention: exact here, approx_percentile
    is the same-schema 100 TB flavor) and an exact max/count.

    Output: o_orderpriority, n_orders, p50_days, p95_days, max_days.
    """
    from zipkin_storage_kafka_spark.functions.portable import round4
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    last_ship = lineitem.select(
        "l_orderkey",
        to_epoch_micros(lineitem, "l_shipdate").alias("ship_us"),
    ).groupBy("l_orderkey").agg(F.max("ship_us").alias("last_us"))
    per_order = orders.select(
        "o_orderkey",
        "o_orderpriority",
        to_epoch_micros(orders, "o_orderdate").alias("ord_us"),
    ).join(last_ship, orders["o_orderkey"] == last_ship["l_orderkey"]).select(
        "o_orderpriority",
        F.expr(f"(last_us div {DAY_US}) - (ord_us div {DAY_US})").alias(
            "days"
        ),
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        round4(F.expr("percentile(days, 0.5)")).alias("p50_days"),
        round4(F.expr("percentile(days, 0.95)")).alias("p95_days"),
        F.max("days").alias("max_days"),
    )


def ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-analysis panel: the signup cohort deterministically
    assigned to two variants (md5(user_id) parity — the hash-bucket
    assignment every experimentation platform uses), compared on
    signup -> purchase-within-3-days conversion — counts, exact
    integer-micro conversion rates, and the variant-vs-control lift.

    Conversion is windowed (first purchase at/after the first signup,
    within 72h) so the metric discriminates: lifetime "ever purchased"
    saturates at ~100% on any corpus with long-lived users.

    Everything is exact integer math over ONE event-type-pruned
    user-keyed conditional partial agg (corpus collapses to |users with
    a signup or purchase| rows in a single exchange — the r13 shape's
    two per-type aggs + left join shared the same key, so they fold
    into one agg with min(CASE WHEN) per type, guide 2.4; then to 2
    rows); no normal approximation is baked in — the z-score belongs
    to the BI layer, the engine's job is the exact counts.

    Output: variant, n_users, n_converted, conv_micro, lift_micro
    (conversion relative to variant 0's, 1e6 = parity; NULL for the
    control row).
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table, to_epoch_micros

    ev = load_table(spark, sf_dir, "events")
    ts_us = to_epoch_micros(ev, "ts")
    per_user = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", ts_us)
            ).alias("signup_us"),
            F.min(
                F.when(F.col("event_type") == "purchase", ts_us)
            ).alias("purchase_us"),
        )
        .filter(F.col("signup_us").isNotNull())
    )
    window_us = 3 * 86400 * 1000000  # 72h, exact integer micros
    users = per_user.select(
        F.expr(
            "conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10)"
            " % 2"
        )
        .cast("int")
        .alias("variant"),
        F.when(
            F.col("purchase_us").isNotNull()
            & (F.col("purchase_us") >= F.col("signup_us"))
            & (F.col("purchase_us") - F.col("signup_us") <= F.lit(window_us)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("converted"),
    )
    per = users.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    ).withColumn(
        "conv_micro",
        F.expr("(n_converted * 1000000) div n_users"),
    )
    control = per.filter(F.col("variant") == 0).select(
        F.col("conv_micro").alias("c0")
    )
    return per.crossJoin(F.broadcast(control)).select(
        "variant",
        "n_users",
        "n_converted",
        "conv_micro",
        F.when(
            F.col("variant") != 0,
            F.expr("(conv_micro * 1000000) div c0"),
        ).alias("lift_micro"),
    )


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM change-point detection (Page 1954) on each event
    type's per-minute rate: the split point t that maximizes the
    cumulative deviation from the series mean — the "when did the rate
    shift" panel behind every deploy/incident timeline.

    Exactness discipline: for counts x_1..x_n with total T, the CUSUM
    statistic S_t = sum_{i<=t} x_i - t*T/n is kept EXACT by scaling by
    n: s_scaled_t = n*prefix_t - t*T (all BIGINT, no float mean).  The
    change point is the earliest minute attaining max |s_scaled| over
    1 <= t < n, picked by a struct max (|s|, -minute) — integer fields,
    so any engine agrees bit-for-bit.  Before/after rates are integer
    micro events-per-minute.

    Scale: the zero-filled spine is range-bound (|types| x observed
    minutes — calendar-bounded, NOT corpus-bounded: a year is 525k
    minutes regardless of data volume); the per-type prefix window
    sorts each type's series once, partitioned by event_type.  The
    corpus-sized work is one (type, minute) partial agg.

    Output: event_type, n_minutes, total_events, change_minute_ms,
    s_abs_max (n-scaled), before_rate_micro, after_rate_micro.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    marked = _with_event_minute(ev).select("event_type", "m")
    counts = marked.groupBy("event_type", "m").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bounds = marked.groupBy("event_type").agg(
        F.min("m").alias("lo"),
        F.max("m").alias("hi"),
        F.count(F.lit(1)).alias("total_events"),
    )
    spine = bounds.select(
        "event_type", "lo", "total_events",
        (F.col("hi") - F.col("lo") + 1).alias("n_minutes"),
        F.explode(F.sequence("lo", "hi")).alias("m"),
    )
    filled = spine.join(counts, ["event_type", "m"], "left").select(
        "event_type", "lo", "total_events", "n_minutes", "m",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy("m")
    scored = (
        filled.select(
            "event_type", "total_events", "n_minutes", "m",
            F.sum("n_events").over(w).alias("prefix"),
            (F.col("m") - F.col("lo") + 1).alias("t"),
        )
        .filter(F.col("t") < F.col("n_minutes"))
        .select(
            "event_type", "total_events", "n_minutes", "m", "prefix", "t",
            F.abs(
                F.col("n_minutes") * F.col("prefix")
                - F.col("t") * F.col("total_events")
            ).alias("s_abs"),
        )
    )
    best = scored.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.col("s_abs").alias("s"),
                (-F.col("m")).alias("negm"),
                F.col("prefix").alias("prefix"),
                F.col("t").alias("t"),
                F.col("n_minutes").alias("n"),
                F.col("total_events").alias("tot"),
            )
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.n").alias("n_minutes"),
        F.col("b.tot").alias("total_events"),
        (-F.col("b.negm") * 60_000).alias("change_minute_ms"),
        F.col("b.s").alias("s_abs_max"),
        F.expr("(b.prefix * 1000000) div b.t").alias("before_rate_micro"),
        F.expr(
            "((b.tot - b.prefix) * 1000000) div (b.n - b.t)"
        ).alias("after_rate_micro"),
    )


def order_part_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct (l_orderkey, l_partkey) basket membership with each
    part's basket count already attached — the one corpus-sized
    derivation in :func:`item_neighbors` (the part-grain twin of
    :func:`order_brands`).  The registry materializes it once per
    corpus snapshot so the neighbor row's per-call plan starts from a
    pre-deduped three-column parquet scan: no lineitem scan, no
    distinct shuffle, no margin join at serve time.

    Columns: l_orderkey, l_partkey, n_baskets.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    member = li.select("l_orderkey", "l_partkey").distinct()
    marg = member.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    return member.join(marg, "l_partkey").select(
        "l_orderkey", "l_partkey", "n_baskets"
    )


def item_neighbors(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    member: DataFrame | None = None,
) -> DataFrame:
    """Item-item collaborative-filtering neighbors (Sarwar et al. 2001)
    over order baskets: for every part, the top-``k`` parts most often
    bought in the same order, scored by exact Jaccard over basket sets
    — the similarity twin of the basket-lift panel (lift measures
    surprise, Jaccard measures overlap; recommenders rank by the
    latter).

    Scale discipline: the pair join is basket-keyed with fanout
    bounded by parts-per-order (never item x item), and the per-item
    basket counts attach via plain keyed joins — NOT a broadcast —
    because the item dimension here is corpus-sized (millions of
    parts; the basket_lift kernel broadcasts its margins, which is
    right for brands/services and wrong here).  The top-k window
    partitions by item with rows-per-item bounded by the item's
    co-purchase breadth.

    r10 note — this is DELIBERATELY the tuple self-join shape, not
    the collect_set basket-array kernel basket_lift's few-basket
    flavors use: at 1.5M+ baskets the array flavor's object agg
    (sort-based fallback past ~128 keys/partition) plus its
    per-basket array materialization measured 9.3 s vs 6.3 s at sf1
    inside the 275-query bench — the opposite of the idle-session
    comparison (5.4 vs 6.1 s).  Kernel choice is basket-cardinality-
    dependent; see basket_lift's flavor note.

    Determinism: integer jaccard_micro, ties broken by (pair_baskets
    desc, neighbor asc) — all integers, so rank is engine-stable.

    ``member`` is an optional precomputed margin-attached membership
    relation (l_orderkey, l_partkey, n_baskets — see
    :func:`order_part_margins`); the registry feeds the matcache
    materialization so the per-call plan is parquet scan -> basket
    self-join -> pair agg -> top-k, with the distinct shuffle and the
    margin join paid once per corpus snapshot (r11 cost pass — the
    shape that cut the brand-pair rows in r09).  When omitted the
    relation derives live.

    Output: part_key, neighbor_key, pair_baskets, item_baskets,
    neighbor_baskets, jaccard_micro, rank.
    """
    # Attach the margin to the (basket, item) relation BEFORE pairing:
    # one item-keyed join on |member| rows instead of two joins on the
    # larger pair relation (per-item counts are constant within a
    # pair group, so min() recovers them through the groupBy for free).
    member2 = (
        member.select("l_orderkey", "l_partkey", "n_baskets")
        if member is not None
        else order_part_margins(spark, sf_dir)
    )
    # SYMMETRIC pairing (l != r): each unordered pair emits both
    # directions straight from the join, so there is ONE pair agg and
    # no union of two final-agg passes over a flipped copy.  The pair
    # shuffle carries 2x the triangular rows, but the map-side partial
    # agg condenses them first and the agg output lands already keyed
    # by part_key for the top-k window.  Same-session A/B vs the old
    # live-derive + triangular + union-flip shape, output-identical:
    # sf0.1 2.86 -> 1.53 s, sf1 6.30 -> 3.91 s (matcache + symmetric
    # together; 2.6x at 10x data).
    sym = (
        member2.alias("l")
        .join(
            member2.alias("r"),
            (F.col("l.l_orderkey") == F.col("r.l_orderkey"))
            & (F.col("l.l_partkey") != F.col("r.l_partkey")),
        )
        .groupBy(
            F.col("l.l_partkey").alias("part_key"),
            F.col("r.l_partkey").alias("neighbor_key"),
        )
        .agg(
            F.count(F.lit(1)).alias("pair_baskets"),
            F.min("l.n_baskets").alias("item_baskets"),
            F.min("r.n_baskets").alias("neighbor_baskets"),
        )
    )
    scored = sym.withColumn(
        "jaccard_micro",
        F.expr(
            "(pair_baskets * 1000000)"
            " div (item_baskets + neighbor_baskets - pair_baskets)"
        ),
    )
    w = Window.partitionBy("part_key").orderBy(
        F.col("jaccard_micro").desc(),
        F.col("pair_baskets").desc(),
        F.col("neighbor_key").asc(),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "part_key", "neighbor_key", "pair_baskets", "item_baskets",
            "neighbor_baskets", "jaccard_micro", "rank",
        )
    )


def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence by market segment: the day gaps between
    each customer's consecutive orders, rolled up to per-segment
    percentiles — the repeat-purchase-frequency panel behind churn and
    replenishment models (the orders-side twin of ev_hazard_curve's
    first-conversion view).

    Determinism: order sequence per customer sorts on (order day,
    o_orderkey) so same-day orders have a stable order; gaps are exact
    integer days; the mean is integer micro-days; percentiles use the
    same interpolating percentile/quantile_cont pair already pinned by
    h_fulfillment_latency.

    Scale: the lag window partitions by o_custkey (millions of small
    partitions); the segment attach is a keyed join on the customer
    dimension (corpus-sized — NOT broadcast) followed by a 5-row
    partial agg.

    Output: c_mktsegment, n_gaps, p50_gap_days, p90_gap_days,
    max_gap_days, mean_gap_micro.
    """
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        to_epoch_micros(orders, "o_orderdate").alias("ord_us"),
    ).select(
        "o_custkey",
        "o_orderkey",
        F.expr(f"ord_us div {DAY_US}").alias("day"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        o.select(
            "o_custkey",
            (F.col("day") - F.lag("day").over(w)).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    seg = customer.select("c_custkey", "c_mktsegment")
    return (
        gaps.join(seg, gaps["o_custkey"] == seg["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            round4(F.expr("percentile(gap_days, 0.5)")).alias(
                "p50_gap_days"
            ),
            round4(F.expr("percentile(gap_days, 0.9)")).alias(
                "p90_gap_days"
            ),
            F.max("gap_days").alias("max_gap_days"),
            F.expr("(sum(gap_days) * 1000000) div count(1)").alias(
                "mean_gap_micro"
            ),
        )
    )


def seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x day-of-week traffic profile per event type, with
    the exact ratio to a uniform profile — the seasonality panel behind
    capacity planning and anomaly baselines ("is Tuesday 14:00 really
    hotter, or is the detector drifting").

    Calendar math stays in integer epoch arithmetic (dow =
    (epoch_days + 4) % 7 with 0 = Sunday — 1970-01-01 was a Thursday =
    4; hour = epoch_hours % 24), so no engine date/timezone function
    can disagree; ratios are integer micro (1e6 = exactly uniform over
    the 168 cells).

    Scale: one (type, dow, hour) partial agg — at most |types| x 168
    output rows regardless of corpus size; the per-type total attaches
    by broadcast.

    Output: event_type, dow, hour, n_events, uniform_ratio_micro.
    """
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type", to_epoch_micros(ev, "ts").alias("us")
    ).select(
        "event_type",
        F.expr(f"((us div {DAY_US}) + 4) % 7").cast("int").alias("dow"),
        F.expr("(us div 3600000000) % 24").cast("int").alias("hour"),
    )
    cells = base.groupBy("event_type", "dow", "hour").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    totals = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total")
    )
    return cells.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "dow",
        "hour",
        "n_events",
        F.expr("(n_events * 168 * 1000000) div total").alias(
            "uniform_ratio_micro"
        ),
    )


def ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-cohort LTV triangle: customers grouped by the calendar
    month of their FIRST order (the cohort), revenue rolled up by
    (cohort month x order month) — the lifetime-value matrix every
    subscription/commerce dashboard draws as the lower triangle
    ("how much does the 2024-03 cohort spend in month 0, 1, 2, ...").
    The revenue twin of ev_cohort_retention's activity matrix.

    Money follows the rfm idiom: per-order integer millis
    (round(price*1000)) summed as BIGINT — order-independent exact
    sums.  Months are calendar (year*100+month under the pinned UTC
    session) and months_since is exact integer month arithmetic.

    Scale: one customer-keyed min-agg for cohorts, one keyed join back
    (both sides order-table-sized, co-keyed on o_custkey), partial agg
    to at most months^2 output rows.

    Output: cohort_ym, order_ym, months_since, n_customers, n_orders,
    revenue_milli.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        (
            F.year(F.col("o_orderdate").cast("timestamp")) * 100
            + F.month(F.col("o_orderdate").cast("timestamp"))
        )
        .cast("int")
        .alias("ym"),
        F.round(F.col("o_totalprice") * 1000, 0)
        .cast("long")
        .alias("milli"),
    )
    first = o.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    joined = o.join(first, "o_custkey")
    # Two-level agg (r10): the per-customer-month grain makes the
    # distinct-customer count a plain count — count_distinct beside
    # the other aggs would Expand every order row through the shuffle.
    per_cust = joined.groupBy("cohort_ym", "ym", "o_custkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("milli").alias("_milli"),
    )
    return (
        per_cust.groupBy("cohort_ym", "ym")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("_n").alias("n_orders"),
            F.sum("_milli").alias("revenue_milli"),
        )
        .select(
            "cohort_ym",
            F.col("ym").alias("order_ym"),
            (
                (F.expr("ym div 100") - F.expr("cohort_ym div 100")) * 12
                + (F.expr("ym % 100") - F.expr("cohort_ym % 100"))
            )
            .cast("int")
            .alias("months_since"),
            "n_customers",
            "n_orders",
            "revenue_milli",
        )
    )


def seasonal_anomalies(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Seasonality-adjusted spike detection: each observed minute's
    event count measured against ITS OWN (dow, hour) cell's average
    rate (cell events / cell minutes over the zero-filled observed
    range) — the anomaly panel :func:`seasonality_profile` exists to
    baseline ("Tuesday 14:00 is always hot; flag the minute that is
    hot FOR a Tuesday 14:00").  Top-``k`` spikes, exact integer
    ordering.

    Everything derives from the minute index by integer arithmetic
    (day = m div 1440, hour = (m mod 1440) div 60 — no date
    functions); ratio_micro = n * cell_minutes * 1e6 div cell_events
    is exact, and the top-k orders on (ratio, type, minute) — all
    integers, engine-stable.

    Scale: the (type, minute) partial agg is the only corpus-sized
    work; the spine is calendar-bounded; cells collapse to <= types x
    168 rows and broadcast back; the final top-k is a TakeOrdered
    heap.

    Output: event_type, minute_ms, n_events, cell_events,
    cell_minutes, ratio_micro.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    marked = _with_event_minute(ev).select("event_type", "m")
    counts = marked.groupBy("event_type", "m").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bounds = marked.groupBy("event_type").agg(
        F.min("m").alias("lo"), F.max("m").alias("hi")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("m")
    ).select(
        "event_type",
        "m",
        F.expr("((m div 1440) + 4) % 7").alias("dow"),
        F.expr("(m % 1440) div 60").alias("hour"),
    )
    filled = spine.join(counts, ["event_type", "m"], "left").select(
        "event_type", "m", "dow", "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
    cells = filled.groupBy("event_type", "dow", "hour").agg(
        F.sum("n_events").alias("cell_events"),
        F.count(F.lit(1)).alias("cell_minutes"),
    )
    scored = (
        filled.filter(F.col("n_events") > 0)
        .join(F.broadcast(cells), ["event_type", "dow", "hour"])
        .select(
            "event_type",
            (F.col("m") * 60_000).alias("minute_ms"),
            "n_events",
            "cell_events",
            "cell_minutes",
            F.expr(
                "(n_events * cell_minutes * 1000000) div cell_events"
            ).alias("ratio_micro"),
        )
    )
    return scored.orderBy(
        F.col("ratio_micro").desc(), F.col("event_type"), F.col("minute_ms")
    ).limit(k)


def user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct (user_id, day) activity relation over events — the
    corpus collapse BOTH engagement panels start from (active_users'
    DAU/WAU/MAU triple and new_vs_returning's growth split), so the
    registry materializes it once per corpus snapshot and each consumer
    pays a two-column scan.  ``day`` is integer epoch days.
    """
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", to_epoch_micros(ev, "ts").alias("us"))
        .select("user_id", F.expr(f"us div {DAY_US}").alias("day"))
        .distinct()
    )


def active_users(
    spark: SparkSession,
    sf_dir: str,
    ud: DataFrame | None = None,
    kernel: str = "explode",
) -> DataFrame:
    """Exact DAU / WAU / MAU panel: distinct active users per day, per
    trailing 7 days, per trailing 30 days — the engagement triple every
    product dashboard leads with, computed EXACTLY (the HLL rollup
    family is the approximate flavor for when this is too expensive;
    this is the truth it is measured against).

    ``kernel`` picks the WAU/MAU evaluation shape (identical output,
    test-pinned):

    - ``"explode"`` (default): each activity day fans out to the <= 7
      (resp. 30) trailing days it contributes to, one count_distinct
      per panel — linear fanout of the SMALL relation, never a range
      join, never a window over users.
    - ``"interval"`` (r14, MEASURED NEGATIVE at bench scales, kept as
      the flavor for day-dense user histories): per user, the sorted
      activity-day array collapses to MERGED trailing-window coverage
      intervals (array math inside one user-keyed agg), each interval
      emits one +1/-1 boundary pair, and per-day counts are a prefix
      sum over the calendar spine (two-level bucketed window).  No
      count_distinct anywhere and ~18x fewer shuffled rows — yet it
      LOST the same-session interleaved A/B at both scales
      (sf0.1 min 1.41 vs 0.89 s; sf1 2.09 vs 1.91 s, over the
      persisted user_days relation): the explode kernel is one fused
      fanout+distinct-agg job, while the interval kernel pays ~4 extra
      stage/job constants (ObjectHashAggregate collect_list, spine
      join, bucket offsets, window) that dwarf the shuffle-byte saving
      while the exploded relation is this small.  The crossover needs
      day-dense histories (fanout mass >> stage constants), e.g.
      near-daily activity over years — re-measure there before
      flipping the registry default.

    Days are integer epoch days; partial windows at the range start
    count what they see (trailing semantics).

    Output: day_ms, dau, wau, mau.
    """
    if kernel not in ("explode", "interval"):
        raise ValueError(
            f"active_users: unknown kernel {kernel!r} "
            "(expected 'explode' or 'interval')"
        )
    if ud is None:
        ud = user_days(spark, sf_dir)
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))

    if kernel == "explode":

        def trailing(n: int, alias: str) -> DataFrame:
            contrib = ud.select(
                "user_id",
                F.explode(
                    F.sequence(F.col("day"), F.col("day") + F.lit(n - 1))
                ).alias("d"),
            )
            return (
                contrib.crossJoin(F.broadcast(bounds))
                .filter(
                    (F.col("d") >= F.col("lo")) & (F.col("d") <= F.col("hi"))
                )
                .groupBy("d")
                .agg(F.count_distinct("user_id").alias(alias))
            )

        dau = ud.groupBy(F.col("day").alias("d")).agg(
            F.count_distinct("user_id").alias("dau")
        )
        wau = trailing(7, "wau")
        mau = trailing(30, "mau")
        return (
            spine.join(dau, "d", "left")
            .join(wau, "d", "left")
            .join(mau, "d", "left")
            .select(
                (F.col("d") * 86_400_000).alias("day_ms"),
                F.coalesce("dau", F.lit(0)).alias("dau"),
                F.coalesce("wau", F.lit(0)).alias("wau"),
                F.coalesce("mau", F.lit(0)).alias("mau"),
            )
        )

    # interval kernel: ONE user-keyed agg -> per-user sorted day array.
    peru = ud.groupBy("user_id").agg(
        F.sort_array(F.collect_list("day")).alias("ds")
    )
    ds = F.col("ds")

    def boundary_entries(n: int, tag: str):
        """array<struct<d,w,tag>> of +1/-1 rows for the merged coverage
        intervals of trailing window n (a day a covers [a, a+n-1]; a
        run breaks when the next day is > n after the previous)."""
        idx = F.sequence(F.lit(0), F.size(ds) - F.lit(1))
        # 0-based positions where a new coverage run starts (CASE keeps
        # the 1-based element_at probes in-bounds under ANSI mode).
        bpos = F.filter(
            idx,
            lambda i: F.when(i == F.lit(0), F.lit(True)).otherwise(
                F.element_at(ds, i + F.lit(1))
                > F.element_at(ds, i) + F.lit(n)
            ),
        )
        starts = F.transform(bpos, lambda i: F.element_at(ds, i + F.lit(1)))
        ends = F.transform(
            F.sequence(F.lit(0), F.size(bpos) - F.lit(1)),
            lambda k: F.when(
                k < F.size(bpos) - F.lit(1),
                F.element_at(ds, F.element_at(bpos, k + F.lit(2))),
            ).otherwise(F.element_at(ds, F.size(ds)))
            + F.lit(n - 1),
        )
        return F.concat(
            F.transform(
                starts,
                lambda s: F.struct(
                    s.alias("d"),
                    F.lit(1).alias("w"),
                    F.lit(tag).alias("tag"),
                ),
            ),
            F.transform(
                ends,
                lambda e: F.struct(
                    (e + F.lit(1)).alias("d"),
                    F.lit(-1).alias("w"),
                    F.lit(tag).alias("tag"),
                ),
            ),
        )

    dau_entries = F.transform(
        ds,
        lambda a: F.struct(
            a.alias("d"), F.lit(1).alias("w"), F.lit("d").alias("tag")
        ),
    )
    daily = (
        peru.select(
            F.explode(
                F.concat(
                    dau_entries,
                    boundary_entries(7, "w"),
                    boundary_entries(30, "m"),
                )
            ).alias("x")
        )
        .select("x.d", "x.w", "x.tag")
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("tag") == "d", F.col("w"))).alias("dc"),
            F.sum(F.when(F.col("tag") == "w", F.col("w"))).alias("wd"),
            F.sum(F.when(F.col("tag") == "m", F.col("w"))).alias("md"),
        )
    )
    # Prefix-sum the boundary deltas over the calendar spine: two-level
    # bucketed window (open_orders_timeline's kernel) — deltas past the
    # spine's hi day only ever subtract after hi, so the left join
    # dropping them is exact.
    bucketed = (
        spine.join(daily, "d", "left")
        .select(
            "d",
            F.coalesce("dc", F.lit(0)).alias("dc"),
            F.coalesce("wd", F.lit(0)).alias("wd"),
            F.coalesce("md", F.lit(0)).alias("md"),
        )
        .withColumn("bkt", F.expr("d div 256"))
    )
    per_bucket = bucketed.groupBy("bkt").agg(
        F.sum("wd").alias("wsum"), F.sum("md").alias("msum")
    )
    b2 = per_bucket.select(
        F.col("bkt").alias("_b2"),
        F.col("wsum").alias("_w2"),
        F.col("msum").alias("_m2"),
    )
    offsets = (
        per_bucket.join(b2, F.col("_b2") < F.col("bkt"), "left")
        .groupBy(F.col("bkt").alias("_bkt"))
        .agg(
            F.coalesce(F.sum("_w2"), F.lit(0)).alias("woff"),
            F.coalesce(F.sum("_m2"), F.lit(0)).alias("moff"),
        )
    )
    w = (
        Window.partitionBy("bkt")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(F.broadcast(offsets), F.col("bkt") == F.col("_bkt"))
        .select(
            (F.col("d") * 86_400_000).alias("day_ms"),
            F.col("dc").cast("long").alias("dau"),
            (F.col("woff") + F.sum("wd").over(w)).cast("long").alias("wau"),
            (F.col("moff") + F.sum("md").over(w)).cast("long").alias("mau"),
        )
    )


def open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-backlog timeline: how many orders are OPEN (placed, not
    yet fully shipped) on each day — the fulfillment-pressure panel,
    computed with the same +1/-1 boundary-sweep kernel as the span
    concurrency operators (an order is an interval [orderdate,
    last line shipdate]; the active count is a prefix sum of interval
    boundaries, never an interval join).

    Exact integer days; the running sum over the calendar-bounded
    boundary-delta relation is the DISTRIBUTED TWO-LEVEL PREFIX SUM
    (token_budget_sample's pattern): bucket days by ``d div 256``,
    offsets from a triangular join over the handful of bucket totals,
    windowed sum WITHIN buckets only — no single-partition WindowExec
    at any scale.

    Output: day_ms, opened, closed, open_orders.
    """
    from zipkin_storage_kafka_spark.sources.tables import (
        load_table,
        to_epoch_micros,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    o = orders.select(
        "o_orderkey",
        to_epoch_micros(orders, "o_orderdate").alias("ord_us"),
    ).select("o_orderkey", F.expr(f"ord_us div {DAY_US}").alias("start_day"))
    last_ship = (
        lineitem.select(
            "l_orderkey",
            to_epoch_micros(lineitem, "l_shipdate").alias("ship_us"),
        )
        .groupBy("l_orderkey")
        .agg(F.max(F.expr(f"ship_us div {DAY_US}")).alias("end_day"))
    )
    iv = o.join(
        last_ship, o["o_orderkey"] == last_ship["l_orderkey"], "inner"
    ).select("start_day", "end_day")
    # boundary deltas: +1 at start_day, -1 the day AFTER the last ship
    # (the order is still open on its final ship day).  Each interval
    # EXPLODES into its two boundary rows so one (day) agg yields both
    # counts — the old two-groupBy + full-outer-join shape evaluated
    # the orders-x-lineitem interval subtree twice (r10 cost pass).
    deltas = (
        iv.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("start_day").alias("d"),
                        F.lit(1).alias("is_open"),
                    ),
                    F.struct(
                        (F.col("end_day") + 1).alias("d"),
                        F.lit(0).alias("is_open"),
                    ),
                )
            ).alias("b")
        )
        .select("b.d", "b.is_open")
        .groupBy("d")
        .agg(
            F.sum("is_open").alias("opened"),
            F.sum(F.lit(1) - F.col("is_open")).alias("closed"),
        )
        # |days|-row relation read by the bucket totals, the offsets
        # AND the final sweep — checkpoint so the corpus-sized interval
        # derivation above runs once, not once per consumer.
        .localCheckpoint(eager=False)
    )
    deltas = deltas.withColumn("net", F.col("opened") - F.col("closed"))
    bucketed = deltas.withColumn("bkt", F.expr("d div 256"))
    per_bucket = bucketed.groupBy("bkt").agg(F.sum("net").alias("bsum"))
    b2 = per_bucket.select(
        F.col("bkt").alias("_b2"), F.col("bsum").alias("_s2")
    )
    offsets = (
        per_bucket.join(b2, F.col("_b2") < F.col("bkt"), "left")
        .groupBy(F.col("bkt").alias("_bkt"))
        .agg(F.coalesce(F.sum("_s2"), F.lit(0)).alias("offset"))
    )
    w = (
        Window.partitionBy("bkt")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(
            F.broadcast(offsets), F.col("bkt") == F.col("_bkt")
        )
        .select(
            (F.col("d") * 86_400_000).alias("day_ms"),
            "opened",
            "closed",
            (F.col("offset") + F.sum("net").over(w)).alias("open_orders"),
        )
    )


def revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) panel: customers in exact
    revenue quintiles, each bucket's share of total revenue in integer
    micro — the "do 20% of customers carry 80% of revenue" read every
    commerce review opens with.

    Quintiles use the exact distributed ntile (operators/ntile.py — a
    range-partitioned two-level rank, no single-partition window) over
    the UNIQUE (revenue_milli, custkey) order; revenue is the rfm
    idiom's integer millis, so shares are exact integer division.

    Output: bucket (1 = lowest spend, 5 = top), n_customers,
    revenue_milli, share_micro.
    """
    from zipkin_storage_kafka_spark.operators.ntile import distributed_ntile
    from zipkin_storage_kafka_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 1000, 0).cast("long")
        ).alias("milli")
    )
    bucketed = distributed_ntile(
        per_cust, 5, ["milli", "o_custkey"], bucket_col="bucket"
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("milli").alias("revenue_milli"),
    )
    total = per_bucket.agg(F.sum("revenue_milli").alias("total_milli"))
    # share scaling split 1000 x 1000 so the numerator stays inside
    # int64 at any corpus size (total revenue in millis already reaches
    # ~2.8e14 at sf1; * 1e6 would overflow) — the identical expression
    # runs on both engines, so parity is exact by construction.
    return per_bucket.crossJoin(F.broadcast(total)).select(
        "bucket",
        "n_customers",
        "revenue_milli",
        F.expr(
            "(revenue_milli * 1000) div (total_milli div 1000)"
        ).alias("share_micro"),
    )


def new_vs_returning(
    spark: SparkSession, sf_dir: str, ud: DataFrame | None = None
) -> DataFrame:
    """New-vs-returning split per day: users seen for the FIRST time
    that day vs users who had activity on an earlier day — the growth
    decomposition behind every DAU chart ("is the line new blood or
    retention").  Companion of :func:`active_users`.

    Shape: the corpus collapses to the distinct (user, day) relation;
    each user's first day is a user-keyed min-agg; the split is one
    co-keyed join + a per-day conditional count.  All exact integers.

    Output: day_ms, new_users, returning_users, dau.
    """
    if ud is None:
        ud = user_days(spark, sf_dir)
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        ud.join(first, "user_id")
        .groupBy(F.col("day").alias("d"))
        .agg(
            F.sum(
                (F.col("day") == F.col("first_day")).cast("long")
            ).alias("new_users"),
            F.sum(
                (F.col("day") > F.col("first_day")).cast("long")
            ).alias("returning_users"),
            F.count(F.lit(1)).alias("dau"),
        )
        .select(
            (F.col("d") * 86_400_000).alias("day_ms"),
            "new_users",
            "returning_users",
            "dau",
        )
    )


def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration Herfindahl index per part brand: HHI =
    sum over suppliers of (revenue share)^2 — the antitrust-standard
    concentration measure (10000-point scale convention -> integer
    micro here: 1e6 = monopoly, 1e6/n = perfectly even among n).
    The sourcing-risk panel beside w_revenue_pareto's customer-side
    concentration.

    Log-free and int64-safe like the Gini family, via PRE-QUANTIZED
    shares: share_micro = rev * 1e6 div brand_total first (numerator
    <= total * 1e6 ~ 7e16 at sf1, safe), then hhi_micro =
    sum(share_micro^2) div 1e6 (squares <= 1e12, their sum bounded by
    (sum shares)^2 = 1e12) — raw rev^2 sums would overflow int64 at
    sf1.  The identical quantize-then-square expression runs on both
    engines, so parity is exact by construction.

    Scale: one (brand, supplier) partial agg (broadcast part dim for
    the brand attach), a broadcast |brands|-row total join, collapsed
    to |brands| rows.

    Output: p_brand, n_suppliers, revenue_cents, hhi_micro.
    """
    from zipkin_storage_kafka_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == part["p_partkey"],
        )
        .select(
            "p_brand",
            "l_suppkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0,
            )
            .cast("long")
            .alias("cents"),
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum("cents").alias("rev"))
    )
    totals = rev.groupBy("p_brand").agg(F.sum("rev").alias("total"))
    shared = rev.join(F.broadcast(totals), "p_brand").withColumn(
        "share_micro", F.expr("(rev * 1000000) div total")
    )
    return shared.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev").alias("revenue_cents"),
        F.expr(
            "sum(share_micro * share_micro) div 1000000"
        ).alias("hhi_micro"),
    )
