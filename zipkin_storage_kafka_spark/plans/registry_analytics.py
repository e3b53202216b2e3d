"""Registry batch 3: relational analytics (joins, grouped aggregation,
window functions, top-k) with DuckDB oracles.

The decimal discipline (see operators.analytics) makes monetary sums exact
and order-independent, so both engines produce bit-identical doubles at the
output boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.customer_distribution(spark, sf_dir)


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.promo_revenue(spark, sf_dir, lo_micros=Q6_LO_US, hi_micros=Q6_HI_US)


def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.nation_volume(spark, sf_dir)


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.large_volume_customers(spark, sf_dir)


def q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.pricing_rollup(load_table(spark, sf_dir, "lineitem"), Q1_CUTOFF_US)


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.user_sessions(spark, sf_dir)


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity-interval reconstruction from the event log
    (operators/analytics.py:scd2_intervals): gaps-and-islands run
    compression under ONE user-keyed window spec, then a lead() over the
    per-run rows for the closing bound."""
    return an.scd2_intervals(spark, sf_dir)


def q_ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion panel (operators/analytics.py:ab_conversion):
    md5-parity variant assignment, signup->purchase-within-72h
    conversion, exact integer-micro rates and lift over ONE
    event-type-pruned user-keyed conditional partial agg."""
    return an.ab_conversion(spark, sf_dir)


def q_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment latency percentiles by priority
    (operators/analytics.py:fulfillment_latency): order-keyed partial
    agg to per-order completion days, per-priority p50/p95."""
    return an.fulfillment_latency(spark, sf_dir)


# The distinct (order, brand) basket-membership relation is the only
# corpus-sized work in BOTH basket rows (static pairs + sequential
# next-basket rules) — one matcache-materialized derivation serves
# both, like every other >=2-consumer relation.
_ORDER_BRANDS_CACHE: dict[tuple[int, str], DataFrame] = {}


def _order_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zipkin_storage_kafka_spark.sources import matcache, tables

    key = (id(spark), sf_dir)
    if key not in _ORDER_BRANDS_CACHE:
        _ORDER_BRANDS_CACHE[key] = matcache.materialized(
            spark,
            sf_dir,
            "order_brands",
            matcache.code_fingerprint((an, tables)),
            lambda: an.order_brands(spark, sf_dir),
        ).persist()
    return _ORDER_BRANDS_CACHE[key]


# The margin-attached distinct (order, part) membership is the only
# corpus-sized work in the item-neighbor row (suite-slowest at both
# scales in r10) — materialized once per corpus snapshot so the
# serve-time plan starts from a pre-deduped 3-column parquet scan
# (VERDICT r10 next-round #2: the shape that cut the brand rows).
_ORDER_PARTS_CACHE: dict[tuple[int, str], DataFrame] = {}


def _order_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zipkin_storage_kafka_spark.sources import matcache, tables

    key = (id(spark), sf_dir)
    if key not in _ORDER_PARTS_CACHE:
        _ORDER_PARTS_CACHE[key] = matcache.materialized(
            spark,
            sf_dir,
            "order_part_margins",
            matcache.code_fingerprint((an, tables)),
            lambda: an.order_part_margins(spark, sf_dir),
        ).persist()
    return _ORDER_PARTS_CACHE[key]


# The distinct (user, day) activity relation is the shared corpus
# collapse of both engagement panels (ev_active_users +
# ev_new_vs_returning) — materialized once, like order_brands.
_USER_DAYS_CACHE: dict[tuple[int, str], DataFrame] = {}


def _user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zipkin_storage_kafka_spark.sources import matcache, tables

    key = (id(spark), sf_dir)
    if key not in _USER_DAYS_CACHE:
        _USER_DAYS_CACHE[key] = matcache.materialized(
            spark,
            sf_dir,
            "user_days",
            matcache.code_fingerprint((an, tables)),
            lambda: an.user_days(spark, sf_dir),
        ).persist()
    return _USER_DAYS_CACHE[key]


def q_basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift over orders x part brands — the generic
    basket kernel (operators/trace_aggregation.py:basket_lift, shared
    with z_service_cooccurrence) on the engine's LARGEST fact table:
    the (order, brand) membership distinct comes off the SHARED
    materialized order_brands relation and self-joins on the order key
    (the selfjoin kernel flavor: at millions of baskets the
    collect_set object agg loses to the tuple join — see
    basket_lift's flavor note).  r13 note: the bitmask flavor
    (value-equivalence test-pinned, strictly less shuffle volume) was
    tried here — it TIES the selfjoin idle (2.48 vs 2.44 s sf1,
    same-session) but measured worse in BOTH full-bench runs (2.53 and
    2.94 vs r12's 2.35 s sf1), so per the measure-in-the-serving-
    context rule the selfjoin stays; the flavor remains available for
    domains where the pair join, not the membership shuffle, dominates
    (see z_service_cooccurrence-scale analyses)."""
    from zipkin_storage_kafka_spark.operators.trace_aggregation import (
        basket_lift,
    )

    member = _order_brands(spark, sf_dir).withColumnRenamed(
        "brand", "p_brand"
    )
    return basket_lift(member, "l_orderkey", "p_brand", flavor="selfjoin")


def q_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-cohort LTV triangle
    (operators/analytics.py:ltv_triangle): customer-keyed first-month
    cohort, co-keyed join back, exact integer-milli revenue by
    (cohort month x order month)."""
    return an.ltv_triangle(spark, sf_dir)


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning DAU decomposition
    (operators/analytics.py:new_vs_returning): distinct (user,day)
    relation, user-keyed first-day min, co-keyed join + conditional
    counts."""
    return an.new_vs_returning(spark, sf_dir, ud=_user_days(spark, sf_dir))


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration Herfindahl per brand
    (operators/analytics.py:supplier_hhi): quantize-then-square
    integer-micro shares (int64-safe at any scale), broadcast brand
    totals."""
    return an.supplier_hhi(spark, sf_dir)


def q_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration quintiles
    (operators/analytics.py:revenue_pareto): exact distributed ntile
    over (revenue_milli, custkey), integer-micro shares."""
    return an.revenue_pareto(spark, sf_dir)


def q_open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-backlog timeline
    (operators/analytics.py:open_orders_timeline): +1/-1 boundary
    sweep on [orderdate, last shipdate] intervals; two-level prefix
    sum, no single-partition window."""
    return an.open_orders_timeline(spark, sf_dir)


def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU/WAU/MAU panel (operators/analytics.py:active_users):
    distinct (user, day) relation exploded to its trailing-window
    contribution days — linear fanout of the small relation, never a
    range join."""
    return an.active_users(spark, sf_dir, ud=_user_days(spark, sf_dir))


def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted top-20 spikes
    (operators/analytics.py:seasonal_anomalies): minutes vs their own
    (dow,hour) cell average, integer-micro ratios, TakeOrdered."""
    return an.seasonal_anomalies(spark, sf_dir)


def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour x weekday traffic profile per event type
    (operators/analytics.py:seasonality_profile): integer epoch
    calendar math, one (type,dow,hour) partial agg, broadcast totals,
    exact micro ratio to uniform."""
    return an.seasonality_profile(spark, sf_dir)


def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence percentiles by market segment
    (operators/analytics.py:customer_order_gaps): customer-keyed lag
    window, keyed segment join, 5-row partial agg."""
    return an.customer_order_gaps(spark, sf_dir)


def q_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item Jaccard top-3 neighbors over order baskets
    (operators/analytics.py:item_neighbors): basket-keyed pair join off
    the SHARED materialized order_part_margins relation (distinct
    membership + per-part basket counts, paid once per corpus
    snapshot), integer-deterministic ranking."""
    return an.item_neighbors(
        spark, sf_dir, member=_order_parts(spark, sf_dir)
    )


def q_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete signup->purchase hazard curve
    (operators/analytics.py:hazard_curve): one user-keyed conditional
    agg (sorted purchase array, rowwise first-at-or-after-signup),
    1-row horizon broadcast, triangular at-risk cumulation — exact
    integer hazard micro-units."""
    return an.hazard_curve(spark, sf_dir)


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA(alpha=1/2) minute-rate smoothing
    (operators/analytics.py:ewma_smooth): power-of-two weights make the
    16-lag numerator exact integer math; one type-keyed window over the
    zero-filled range-bound spine."""
    return an.ewma_smooth(spark, sf_dir)


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per event type
    (operators/analytics.py:cusum_changepoint): n-scaled integer CUSUM
    over the zero-filled per-type minute spine, earliest-argmax struct
    pick — the "when did the rate shift" panel."""
    return an.cusum_changepoint(spark, sf_dir)


def q_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation (operators/analytics.py:rfm_scores):
    one user-keyed partial agg, three exact distributed_ntile passes on
    the |users|-row relation, integer-milli monetary sums."""
    return an.rfm_scores(spark, sf_dir)


def q_outage_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-activity outage windows per event type
    (operators/analytics.py:outage_islands): k-row per-type bounds ->
    range-bound minute spine -> anti-join observed -> gaps-and-islands
    merge under one type-partitioned window."""
    return an.outage_islands(spark, sf_dir)


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix
    (operators/analytics.py:markov_transitions): per-user lag chain,
    partial-agged to |types|^2 rows with row-normalized probabilities."""
    return an.markov_transitions(spark, sf_dir)


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.top_supplier(spark, sf_dir, lo_micros=Q6_LO_US, hi_micros=Q6_HI_US)


def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.part_supplier_variety(spark, sf_dir)


def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.sales_opportunity(spark, sf_dir)


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.cohort_retention(spark, sf_dir)


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.event_funnel(spark, sf_dir)


def q_discounted_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.discounted_parts_revenue(spark, sf_dir)


def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.returned_item_report(spark, sf_dir)


def q_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.national_market_share(spark, sf_dir)


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.small_quantity_revenue(spark, sf_dir)


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.waiting_suppliers(spark, sf_dir)


def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.asof_attribution(spark, sf_dir)


def q_minute_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.minute_resample(spark, sf_dir)


def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF) minute resample per event type — the
    sensor/price gap-fill semantics Spark lacks natively
    (operators/analytics.py:locf_fill)."""
    return an.locf_fill(spark, sf_dir)


def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.rolling_revenue(spark, sf_dir)


def q_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.customer_deciles(spark, sf_dir)


def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.late_shipment_priority(spark, sf_dir)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.zorder_layout_stats(spark, sf_dir)


def q_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.time_weighted_value(spark, sf_dir)


def q_next_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential next-basket brand rules
    (operators/analytics.py:next_basket_rules): customer-keyed
    consecutive-order chain, distinct (order, brand) collapse, rule
    join bounded by brands-per-order², DECIMAL(38)-widened exact
    lift — the sequential-pattern class beside the static basket
    kernel."""
    return an.next_basket_rules(
        spark, sf_dir, brands=_order_brands(spark, sf_dir)
    )


def q_promo_lift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences promo revenue lift
    (operators/analytics.py:promo_lift_did): four cells from ONE
    conditional agg over the keyed part join, exact micro-cent integer
    means, the seasonality-netting causal panel."""
    return an.promo_lift_did(spark, sf_dir)


def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per supplier nation
    (operators/analytics.py:weighted_median_price): collapse to
    (nation, price) weight cells first, cumulative weights over the
    collapsed relation only — the weighted-quantile class."""
    return an.weighted_median_price(spark, sf_dir)


def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS quantity-on-discount fit
    (operators/analytics.py:discount_elasticity): five exact-int64
    sufficient statistics in ONE 25-row partial agg after the keyed
    part join — the distributed per-group regression class."""
    return an.discount_elasticity(spark, sf_dir)


def q_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution lag panel, linear vs last-touch schemes
    (operators/analytics.py:multitouch_attribution): user-keyed
    conversion x touch pairs inside a 7-day lookback, exact-integer
    credit conservation, ≤8 lag buckets per scheme."""
    return an.multitouch_attribution(spark, sf_dir)


def q_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-table integrity fingerprints
    (operators/analytics.py:table_checksums): row count + md5-key
    checksum mod a prime per corpus table — the both-sides migration
    audit; one column-pruned scan per table."""
    return an.table_checksums(spark, sf_dir)


def q_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data-skipping audit over two lineitem layouts
    (operators/analytics.py:zone_map_prune): hash vs 30-day range
    shards, per-shard (min,max) shipdate maps, prunability of a fixed
    6-month window — one fact scan, layout x shard partial agg."""
    return an.zone_map_prune(spark, sf_dir)


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.important_stock(spark, sf_dir)


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.min_cost_supplier(spark, sf_dir)


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.product_profit(spark, sf_dir)


def q_pricing_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.pricing_cube(
        load_table(spark, sf_dir, "lineitem"), Q1_CUTOFF_US
    )


def q_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    return an.excess_stock_suppliers(
        spark, sf_dir, lo_micros=Q6_LO_US, hi_micros=Q6_HI_US
    )


def analytics_queries() -> dict[str, QueryFn]:
    return {
        "h1_pricing_summary": q_pricing_summary,
        "h3_shipping_priority": q_shipping_priority,
        "h5_nation_revenue": q_nation_revenue,
        "w_topk_orders_per_priority": q_topk_orders,
        "h6_revenue_forecast": q_revenue_forecast,
        "h4_order_priority_check": q_order_priority_check,
        "h13_customer_distribution": q_customer_distribution,
        "h14_promo_revenue": q_promo_revenue,
        "h7_nation_volume": q_nation_volume,
        "h18_large_volume_customers": q_large_volume_customers,
        "hr_pricing_rollup": q_pricing_rollup,
        "ev_user_sessions": q_user_sessions,
        "ev_markov_transitions": q_markov_transitions,
        "ev_scd2_intervals": q_scd2_intervals,
        "ev_outage_islands": q_outage_islands,
        "ev_rfm_scores": q_rfm_scores,
        "ev_ewma_smooth": q_ewma_smooth,
        "ev_hazard_curve": q_hazard_curve,
        "w_basket_brand_pairs": q_basket_brand_pairs,
        "w_item_neighbors": q_item_neighbors,
        "h_customer_order_gaps": q_customer_order_gaps,
        "ev_seasonality": q_seasonality,
        "h_ltv_triangle": q_ltv_triangle,
        "ev_seasonal_anomalies": q_seasonal_anomalies,
        "ev_active_users": q_active_users,
        "h_open_orders_timeline": q_open_orders_timeline,
        "w_revenue_pareto": q_revenue_pareto,
        "ev_new_vs_returning": q_new_vs_returning,
        "h_supplier_hhi": q_supplier_hhi,
        "h_fulfillment_latency": q_fulfillment_latency,
        "ev_ab_conversion": q_ab_conversion,
        "ev_changepoint": q_changepoint,
        "h15_top_supplier": q_top_supplier,
        "h16_part_supplier_variety": q_part_supplier_variety,
        "h22_sales_opportunity": q_sales_opportunity,
        "ev_cohort_retention": q_cohort_retention,
        "ev_event_funnel": q_event_funnel,
        "h19_discounted_parts_revenue": q_discounted_parts_revenue,
        "h10_returned_item_report": q_returned_item_report,
        "h8_national_market_share": q_national_market_share,
        "h17_small_quantity_revenue": q_small_quantity_revenue,
        "h21_waiting_suppliers": q_waiting_suppliers,
        "ev_asof_attribution": q_asof_attribution,
        "ev_minute_resample": q_minute_resample,
        "ev_locf_fill": q_locf_fill,
        "w_rolling_revenue": q_rolling_revenue,
        "w_customer_deciles": q_customer_deciles,
        "h12_late_shipment_priority": q_late_shipment_priority,
        "ev_zorder_layout": q_zorder_layout,
        "w_zone_map_prune": q_zone_map_prune,
        "pipe_table_checksums": q_table_checksums,
        "ev_multitouch_attribution": q_multitouch_attribution,
        "h_discount_elasticity": q_discount_elasticity,
        "h_weighted_median_price": q_weighted_median_price,
        "w_promo_lift_did": q_promo_lift_did,
        "w_next_basket_rules": q_next_basket_rules,
        "ev_time_weighted_value": q_time_weighted_value,
        "h11_important_stock": q_important_stock,
        "h2_min_cost_supplier": q_min_cost_supplier,
        "h9_product_profit": q_product_profit,
        "hr_pricing_cube": q_pricing_cube,
        "h20_excess_stock": q_excess_stock,
    }


# Derived partsupp (operators.analytics.derived_partsupp twin): 4 suppliers
# per part at formula keys, integer availability / cost-in-cents.
_PARTSUPP_CTE = """
            ns AS (SELECT count(*) AS n FROM supplier),
            ps0 AS (
              SELECT p_partkey,
                     (p_partkey * 4 + t.i * 7) % ns.n AS ps_suppkey
              FROM part CROSS JOIN ns
              CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) t
            ),
            ps AS (
              SELECT p_partkey AS ps_partkey, ps_suppkey,
                     (p_partkey * 31 + ps_suppkey * 17) % 9999 + 1
                       AS ps_availqty,
                     (p_partkey * 37 + ps_suppkey * 23) % 99900 + 100
                       AS ps_cost_cents
              FROM ps0
            )
"""

# Morton interleave of 16-bit (x, y) as pure div/mod/mul/add — identical
# arithmetic to operators.analytics.zorder_layout_stats.
_ZORDER_SQL = " + ".join(
    f"((x // {1 << i}) % 2) * {1 << (2 * i)}"
    f" + ((y // {1 << i}) % 2) * {1 << (2 * i + 1)}"
    for i in range(16)
)


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
        "h13_customer_distribution": """
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM (
              SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey
            )
            GROUP BY c_count
        """,
        "h14_promo_revenue": f"""
            SELECT {_r4(
                f"100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC} "
                f"ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE) / "
                f"CAST(sum({_DISC}) AS DOUBLE)"
            )} AS promo_pct,
                   {_r4(f"CAST(sum({_DISC}) AS DOUBLE)")} AS total_revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE epoch_us(l_shipdate) >= {Q6_LO_US}
              AND epoch_us(l_shipdate) < {Q6_HI_US}
        """,
        "h7_nation_volume": f"""
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   {_r4(f"CAST(sum({_DISC}) AS DOUBLE)")} AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "h18_large_volume_customers": """
            SELECT c_name, c_custkey, o_orderkey,
                   (round(o_totalprice * 10000) / 10000 + 0.0) AS total_price,
                   (round(CAST(q._qty AS DOUBLE) * 10000) / 10000 + 0.0) AS sum_qty
            FROM (
              SELECT l_orderkey,
                     sum(CAST(l_quantity AS DECIMAL(12,2))) AS _qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 200
            ) q
            JOIN orders ON o_orderkey = q.l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY total_price DESC, o_orderkey
            LIMIT 20
        """,
        "hr_pricing_rollup": f"""
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   {_r4("CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)")} AS sum_qty,
                   {_r4("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)")} AS sum_base_price,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE epoch_us(l_shipdate) <= {Q1_CUTOFF_US}
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "h15_top_supplier": f"""
            WITH rev AS (
              SELECT l_suppkey, sum({_DISC}) AS total
              FROM lineitem
              WHERE epoch_us(l_shipdate) >= {Q6_LO_US}
                AND epoch_us(l_shipdate) < {Q6_HI_US}
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name,
                   {_r4("CAST(total AS DOUBLE)")} AS total_revenue
            FROM rev JOIN supplier ON s_suppkey = l_suppkey
            WHERE total = (SELECT max(total) FROM rev)
        """,
        "h16_part_supplier_variety": """
            SELECT p_brand, p_type, p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1'
            GROUP BY p_brand, p_type, p_size
        """,
        "h22_sales_opportunity": """
            SELECT c_nationkey,
                   CAST(count(*) AS BIGINT) AS n_custs,
                   (round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2)))
                           AS DOUBLE) * 10000) / 10000 + 0.0) AS total_bal
            FROM customer c
            WHERE c_acctbal > (
              SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                     / count(*)
              FROM customer WHERE c_acctbal > 0
            )
              AND NOT EXISTS (
                SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              )
            GROUP BY c_nationkey
        """,
        "ev_cohort_retention": """
            WITH activity AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day_idx
              FROM events
            ), cohort AS (
              SELECT user_id, min(day_idx) AS first_day
              FROM activity GROUP BY user_id
            )
            SELECT first_day,
                   day_idx - first_day AS day_offset,
                   CAST(count(*) AS BIGINT) AS active_users
            FROM activity JOIN cohort USING (user_id)
            GROUP BY first_day, day_offset
        """,
        "ev_event_funnel": """
            WITH v AS (
              SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ), c AS (
              SELECT e.user_id, min(epoch_us(e.ts)) AS t2
              FROM events e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
              GROUP BY e.user_id
            ), p AS (
              SELECT e.user_id, min(epoch_us(e.ts)) AS t3
              FROM events e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
              GROUP BY e.user_id
            )
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS stage_view,
                   (SELECT CAST(count(*) AS BIGINT) FROM c) AS stage_click,
                   (SELECT CAST(count(*) AS BIGINT) FROM p) AS stage_purchase
        """,
        "h19_discounted_parts_revenue": f"""
            SELECT {_r4(f"CAST(sum({_DISC}) AS DOUBLE)")} AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#13' AND p_size BETWEEN 16 AND 30
                   AND l_quantity BETWEEN 10 AND 30)
        """,
        "h10_returned_item_report": f"""
            SELECT c_custkey, c_name, n_name,
                   {_r4(f"CAST(sum({_DISC}) AS DOUBLE)")} AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        "ev_user_sessions": """
            WITH flagged AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                               > 30 * 60 * 1000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            ), sessions AS (
              SELECT user_id, ts_us,
                     CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING
                     ) AS BIGINT) AS session_idx
              FROM flagged
            )
            SELECT user_id, session_idx,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(ts_us) AS start_us, max(ts_us) AS end_us
            FROM sessions
            GROUP BY user_id, session_idx
        """,
        "ev_ab_conversion": """
            WITH su AS (
              SELECT user_id, min(epoch_us(ts)) AS signup_us
              FROM events WHERE event_type = 'signup' GROUP BY user_id
            ), pu AS (
              SELECT user_id, min(epoch_us(ts)) AS purchase_us
              FROM events WHERE event_type = 'purchase' GROUP BY user_id
            ), users AS (
              SELECT s.user_id,
                     CASE WHEN p.purchase_us IS NOT NULL
                          AND p.purchase_us >= s.signup_us
                          AND p.purchase_us - s.signup_us
                              <= CAST(259200 AS BIGINT) * 1000000
                          THEN 1 ELSE 0 END AS converted
              FROM su s LEFT JOIN pu p USING (user_id)
            ), assigned AS (
              SELECT CAST(CAST(('0x' ||
                       substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 2 AS INTEGER) AS variant,
                     converted
              FROM users
            ), per AS (
              SELECT variant,
                     CAST(count(*) AS BIGINT) AS n_users,
                     CAST(sum(converted) AS BIGINT) AS n_converted
              FROM assigned GROUP BY variant
            ), per2 AS (
              SELECT variant, n_users, n_converted,
                     CAST((n_converted * 1000000) // n_users AS BIGINT)
                       AS conv_micro
              FROM per
            ), control AS (
              SELECT conv_micro AS c0 FROM per2 WHERE variant = 0
            )
            SELECT p.variant, p.n_users, p.n_converted, p.conv_micro,
                   CASE WHEN p.variant != 0
                        THEN CAST((p.conv_micro * 1000000) // c.c0
                               AS BIGINT)
                   END AS lift_micro
            FROM per2 p CROSS JOIN control c
        """,
        "h_fulfillment_latency": """
            WITH last_ship AS (
              SELECT l_orderkey, max(epoch_us(l_shipdate)) AS last_us
              FROM lineitem GROUP BY l_orderkey
            ), per_order AS (
              SELECT o.o_orderpriority,
                     (s.last_us // 86400000000)
                       - (epoch_us(o.o_orderdate) // 86400000000) AS days
              FROM orders o JOIN last_ship s
                ON s.l_orderkey = o.o_orderkey
            )
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   (round(quantile_cont(days, 0.5) * 10000) / 10000 + 0.0)
                     AS p50_days,
                   (round(quantile_cont(days, 0.95) * 10000) / 10000 + 0.0)
                     AS p95_days,
                   CAST(max(days) AS BIGINT) AS max_days
            FROM per_order GROUP BY o_orderpriority
        """,
        "w_basket_brand_pairs": """
            WITH member AS (
              SELECT DISTINCT l_orderkey AS bk, p_brand AS it
              FROM lineitem JOIN part ON l_partkey = p_partkey
            ), pairs AS (
              SELECT l.it AS item_a, r.it AS item_b,
                     CAST(count(*) AS BIGINT) AS pair_baskets
              FROM member l JOIN member r
                ON l.bk = r.bk AND l.it < r.it
              GROUP BY 1, 2
            ), marg AS (
              SELECT it, CAST(count(*) AS BIGINT) AS n FROM member
              GROUP BY it
            ), total AS (
              SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_total
              FROM member
            )
            SELECT p.item_a, p.item_b, p.pair_baskets,
                   ma.n AS a_baskets, mb.n AS b_baskets,
                   CAST((p.pair_baskets * t.n_total * 1000000)
                        // (ma.n * mb.n) AS BIGINT) AS lift_micro
            FROM pairs p
            JOIN marg ma ON ma.it = p.item_a
            JOIN marg mb ON mb.it = p.item_b
            CROSS JOIN total t
        """,
        "ev_hazard_curve": """
            WITH t AS (
              SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
            ), signup AS (
              SELECT user_id, min(ts_us) AS t0 FROM t
              WHERE event_type = 'signup' GROUP BY user_id
            ), conv AS (
              SELECT t.user_id, min(t.ts_us) AS te
              FROM t JOIN signup s ON s.user_id = t.user_id
              WHERE t.event_type = 'purchase' AND t.ts_us >= s.t0
              GROUP BY t.user_id
            ), horizon AS (SELECT max(ts_us) AS hz FROM t),
            per_user AS (
              SELECT (coalesce(c.te, h.hz) - s.t0) // 86400000000 AS day,
                     CASE WHEN c.te IS NOT NULL THEN 1 ELSE 0 END AS is_event
              FROM signup s LEFT JOIN conv c ON c.user_id = s.user_id
              CROSS JOIN horizon h
            ), hist AS (
              SELECT day, CAST(sum(is_event) AS BIGINT) AS n_events,
                     CAST(sum(1 - is_event) AS BIGINT) AS n_censored
              FROM per_user GROUP BY day
            ), risk AS (
              SELECT a.day, a.n_events, a.n_censored,
                     CAST(coalesce(sum(b.n_events + b.n_censored), 0)
                       AS BIGINT) AS exited
              FROM hist a LEFT JOIN hist b ON b.day < a.day
              GROUP BY a.day, a.n_events, a.n_censored
            ), tot AS (
              SELECT CAST(sum(n_events + n_censored) AS BIGINT) AS n
              FROM hist
            )
            SELECT r.day,
                   CAST(t.n - r.exited AS BIGINT) AS n_risk,
                   r.n_events, r.n_censored,
                   CAST((r.n_events * 1000000) // (t.n - r.exited)
                     AS BIGINT) AS hazard_micro
            FROM risk r CROSS JOIN tot t
        """,
        "h_ltv_triangle": """
            WITH o AS (
              SELECT o_custkey,
                     CAST(date_part('year', o_orderdate) * 100
                          + date_part('month', o_orderdate) AS INTEGER)
                       AS ym,
                     CAST(round(o_totalprice * 1000) AS BIGINT) AS milli
              FROM orders
            ), first AS (
              SELECT o_custkey, min(ym) AS cohort_ym FROM o GROUP BY 1
            )
            SELECT f.cohort_ym, o.ym AS order_ym,
                   CAST((o.ym // 100 - f.cohort_ym // 100) * 12
                        + (o.ym % 100 - f.cohort_ym % 100) AS INTEGER)
                     AS months_since,
                   CAST(count(DISTINCT o.o_custkey) AS BIGINT)
                     AS n_customers,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(o.milli) AS BIGINT) AS revenue_milli
            FROM o JOIN first f USING (o_custkey)
            GROUP BY 1, 2, 3
        """,
        "ev_new_vs_returning": """
            WITH ud AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ), first AS (
              SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1
            )
            SELECT CAST(ud.day * 86400000 AS BIGINT) AS day_ms,
                   CAST(sum(CASE WHEN ud.day = f.first_day
                            THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
                   CAST(sum(CASE WHEN ud.day > f.first_day
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS returning_users,
                   CAST(count(*) AS BIGINT) AS dau
            FROM ud JOIN first f USING (user_id)
            GROUP BY ud.day
        """,
        "h_supplier_hhi": """
            WITH rev AS (
              SELECT p.p_brand, l.l_suppkey,
                     CAST(sum(CAST(round(l_extendedprice
                                   * (1 - l_discount) * 100) AS BIGINT))
                       AS BIGINT) AS rev
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              GROUP BY 1, 2
            ), totals AS (
              SELECT p_brand, CAST(sum(rev) AS BIGINT) AS total
              FROM rev GROUP BY p_brand
            ), shared AS (
              SELECT r.p_brand, r.rev,
                     CAST((r.rev * 1000000) // t.total AS BIGINT)
                       AS share_micro
              FROM rev r JOIN totals t USING (p_brand)
            )
            SELECT p_brand,
                   CAST(count(*) AS BIGINT) AS n_suppliers,
                   CAST(sum(rev) AS BIGINT) AS revenue_cents,
                   CAST(sum(share_micro * share_micro) // 1000000
                     AS BIGINT) AS hhi_micro
            FROM shared GROUP BY p_brand
        """,
        "w_revenue_pareto": """
            WITH per_cust AS (
              SELECT o_custkey,
                     CAST(sum(CAST(round(o_totalprice * 1000) AS BIGINT))
                       AS BIGINT) AS milli
              FROM orders GROUP BY o_custkey
            ), bucketed AS (
              SELECT milli,
                     CAST(ntile(5) OVER (ORDER BY milli, o_custkey)
                       AS INTEGER) AS bucket
              FROM per_cust
            ), per_bucket AS (
              SELECT bucket, CAST(count(*) AS BIGINT) AS n_customers,
                     CAST(sum(milli) AS BIGINT) AS revenue_milli
              FROM bucketed GROUP BY bucket
            ), tot AS (
              SELECT CAST(sum(revenue_milli) AS BIGINT) AS total_milli
              FROM per_bucket
            )
            SELECT bucket, n_customers, revenue_milli,
                   CAST((revenue_milli * 1000) // (total_milli // 1000)
                     AS BIGINT) AS share_micro
            FROM per_bucket, tot
        """,
        "h_open_orders_timeline": """
            WITH o AS (
              SELECT o_orderkey,
                     epoch_us(o_orderdate) // 86400000000 AS start_day
              FROM orders
            ), ls AS (
              SELECT l_orderkey,
                     max(epoch_us(l_shipdate) // 86400000000) AS end_day
              FROM lineitem GROUP BY l_orderkey
            ), iv AS (
              SELECT start_day, end_day
              FROM o JOIN ls ON o.o_orderkey = ls.l_orderkey
            ), op AS (
              SELECT start_day AS d, CAST(count(*) AS BIGINT) AS opened
              FROM iv GROUP BY 1
            ), cl AS (
              SELECT end_day + 1 AS d, CAST(count(*) AS BIGINT) AS closed
              FROM iv GROUP BY 1
            ), deltas AS (
              SELECT coalesce(op.d, cl.d) AS d,
                     coalesce(opened, 0) AS opened,
                     coalesce(closed, 0) AS closed
              FROM op FULL JOIN cl ON op.d = cl.d
            )
            SELECT CAST(d * 86400000 AS BIGINT) AS day_ms,
                   opened, closed,
                   CAST(sum(opened - closed) OVER (
                     ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS open_orders
            FROM deltas
        """,
        "ev_active_users": """
            WITH ud AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ), b AS (
              SELECT min(day) AS lo, max(day) AS hi FROM ud
            ), spine AS (
              SELECT unnest(generate_series(lo, hi)) AS d FROM b
            ), dau AS (
              SELECT day AS d, CAST(count(DISTINCT user_id) AS BIGINT)
                       AS dau
              FROM ud GROUP BY day
            ), wc AS (
              SELECT user_id,
                     unnest(generate_series(day, day + 6)) AS d
              FROM ud
            ), wau AS (
              SELECT wc.d, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
              FROM wc, b WHERE wc.d >= lo AND wc.d <= hi GROUP BY wc.d
            ), mc AS (
              SELECT user_id,
                     unnest(generate_series(day, day + 29)) AS d
              FROM ud
            ), mau AS (
              SELECT mc.d, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
              FROM mc, b WHERE mc.d >= lo AND mc.d <= hi GROUP BY mc.d
            )
            SELECT CAST(s.d * 86400000 AS BIGINT) AS day_ms,
                   coalesce(dau.dau, 0) AS dau,
                   coalesce(wau.wau, 0) AS wau,
                   coalesce(mau.mau, 0) AS mau
            FROM spine s
            LEFT JOIN dau ON s.d = dau.d
            LEFT JOIN wau ON s.d = wau.d
            LEFT JOIN mau ON s.d = mau.d
        """,
        "ev_seasonal_anomalies": """
            WITH marked AS (
              SELECT event_type, epoch_us(ts) // 60000000 AS m FROM events
            ), counts AS (
              SELECT event_type, m, CAST(count(*) AS BIGINT) AS n_events
              FROM marked GROUP BY 1, 2
            ), bounds AS (
              SELECT event_type, min(m) AS lo, max(m) AS hi
              FROM marked GROUP BY event_type
            ), spine AS (
              SELECT event_type,
                     unnest(generate_series(lo, hi)) AS m
              FROM bounds
            ), filled AS (
              SELECT s.event_type, s.m,
                     ((s.m // 1440) + 4) % 7 AS dow,
                     (s.m % 1440) // 60 AS hour,
                     coalesce(c.n_events, 0) AS n_events
              FROM spine s LEFT JOIN counts c
                ON s.event_type = c.event_type AND s.m = c.m
            ), cells AS (
              SELECT event_type, dow, hour,
                     CAST(sum(n_events) AS BIGINT) AS cell_events,
                     CAST(count(*) AS BIGINT) AS cell_minutes
              FROM filled GROUP BY 1, 2, 3
            )
            SELECT f.event_type,
                   CAST(f.m * 60000 AS BIGINT) AS minute_ms,
                   CAST(f.n_events AS BIGINT) AS n_events,
                   c.cell_events, c.cell_minutes,
                   CAST((f.n_events * c.cell_minutes * 1000000)
                        // c.cell_events AS BIGINT) AS ratio_micro
            FROM filled f
            JOIN cells c ON f.event_type = c.event_type
                        AND f.dow = c.dow AND f.hour = c.hour
            WHERE f.n_events > 0
            ORDER BY ratio_micro DESC, f.event_type, minute_ms
            LIMIT 20
        """,
        "ev_seasonality": """
            WITH base AS (
              SELECT event_type,
                     ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
                     (epoch_us(ts) // 3600000000) % 24 AS hour
              FROM events
            ), cells AS (
              SELECT event_type, CAST(dow AS INTEGER) AS dow,
                     CAST(hour AS INTEGER) AS hour,
                     CAST(count(*) AS BIGINT) AS n_events
              FROM base GROUP BY 1, 2, 3
            ), totals AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS total
              FROM base GROUP BY event_type
            )
            SELECT c.event_type, c.dow, c.hour, c.n_events,
                   CAST((c.n_events * 168 * 1000000) // t.total AS BIGINT)
                     AS uniform_ratio_micro
            FROM cells c JOIN totals t USING (event_type)
        """,
        "h_customer_order_gaps": """
            WITH o AS (
              SELECT o_custkey, o_orderkey,
                     epoch_us(o_orderdate) // 86400000000 AS day
              FROM orders
            ), gaps AS (
              SELECT o_custkey,
                     day - lag(day) OVER (
                       PARTITION BY o_custkey ORDER BY day, o_orderkey
                     ) AS gap_days
              FROM o
            ), g AS (
              SELECT o_custkey, gap_days FROM gaps
              WHERE gap_days IS NOT NULL
            )
            SELECT c.c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_gaps,
                   (round(quantile_cont(gap_days, 0.5) * 10000) / 10000
                     + 0.0) AS p50_gap_days,
                   (round(quantile_cont(gap_days, 0.9) * 10000) / 10000
                     + 0.0) AS p90_gap_days,
                   CAST(max(gap_days) AS BIGINT) AS max_gap_days,
                   CAST((sum(gap_days) * 1000000) // count(*) AS BIGINT)
                     AS mean_gap_micro
            FROM g JOIN customer c ON g.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "w_item_neighbors": """
            WITH member AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), marg AS (
              SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_baskets
              FROM member GROUP BY l_partkey
            ), pairs AS (
              SELECT l.l_partkey AS item_a, r.l_partkey AS item_b,
                     CAST(count(*) AS BIGINT) AS pair_baskets
              FROM member l JOIN member r
                ON l.l_orderkey = r.l_orderkey
               AND l.l_partkey < r.l_partkey
              GROUP BY 1, 2
            ), sym AS (
              SELECT item_a AS part_key, item_b AS neighbor_key,
                     pair_baskets
              FROM pairs
              UNION ALL
              SELECT item_b, item_a, pair_baskets FROM pairs
            ), scored AS (
              SELECT s.part_key, s.neighbor_key, s.pair_baskets,
                     a.n_baskets AS item_baskets,
                     b.n_baskets AS neighbor_baskets,
                     CAST((s.pair_baskets * 1000000)
                          // (a.n_baskets + b.n_baskets - s.pair_baskets)
                       AS BIGINT) AS jaccard_micro
              FROM sym s
              JOIN marg a ON s.part_key = a.l_partkey
              JOIN marg b ON s.neighbor_key = b.l_partkey
            )
            SELECT part_key, neighbor_key, pair_baskets, item_baskets,
                   neighbor_baskets, jaccard_micro,
                   CAST(row_number() OVER (
                     PARTITION BY part_key
                     ORDER BY jaccard_micro DESC, pair_baskets DESC,
                              neighbor_key ASC
                   ) AS INTEGER) AS rank
            FROM scored
            QUALIFY rank <= 3
        """,
        "ev_changepoint": """
            WITH marked AS (
              SELECT event_type, epoch_us(ts) // 60000000 AS m FROM events
            ), counts AS (
              SELECT event_type, m, CAST(count(*) AS BIGINT) AS n_events
              FROM marked GROUP BY 1, 2
            ), b AS (
              SELECT event_type, min(m) AS lo, max(m) AS hi,
                     CAST(count(*) AS BIGINT) AS total_events
              FROM marked GROUP BY event_type
            ), spine AS (
              SELECT event_type, lo, total_events,
                     hi - lo + 1 AS n_minutes,
                     unnest(generate_series(lo, hi)) AS m
              FROM b
            ), filled AS (
              SELECT s.event_type, s.lo, s.total_events, s.n_minutes, s.m,
                     coalesce(c.n_events, 0) AS n_events
              FROM spine s LEFT JOIN counts c
                ON s.event_type = c.event_type AND s.m = c.m
            ), scored AS (
              SELECT event_type, total_events, n_minutes, m,
                     sum(n_events) OVER (
                       PARTITION BY event_type ORDER BY m
                     ) AS prefix,
                     m - lo + 1 AS t
              FROM filled
            ), sc2 AS (
              SELECT *,
                     abs(n_minutes * prefix - t * total_events) AS s_abs
              FROM scored WHERE t < n_minutes
            )
            SELECT event_type,
                   CAST(n_minutes AS BIGINT) AS n_minutes,
                   total_events,
                   CAST(m * 60000 AS BIGINT) AS change_minute_ms,
                   CAST(s_abs AS BIGINT) AS s_abs_max,
                   CAST((prefix * 1000000) // t AS BIGINT)
                     AS before_rate_micro,
                   CAST(((total_events - prefix) * 1000000)
                        // (n_minutes - t) AS BIGINT) AS after_rate_micro
            FROM sc2
            QUALIFY row_number() OVER (
              PARTITION BY event_type ORDER BY s_abs DESC, m ASC
            ) = 1
        """,
        "ev_ewma_smooth": """
            WITH marked AS (
              SELECT event_type, epoch_us(ts) // 60000000 AS m FROM events
            ), counts AS (
              SELECT event_type, m, CAST(count(*) AS BIGINT) AS n_events
              FROM marked GROUP BY 1, 2
            ), bounds AS (
              SELECT event_type, min(m) AS lo, max(m) AS hi
              FROM marked GROUP BY event_type
            ), spine AS (
              SELECT event_type, unnest(generate_series(lo, hi)) AS m
              FROM bounds
            ), filled AS (
              SELECT s.event_type, s.m,
                     coalesce(c.n_events, 0) AS n_events
              FROM spine s
              LEFT JOIN counts c
                ON c.event_type = s.event_type AND c.m = s.m
            ), lagged AS (
              SELECT event_type, m, n_events,
                     """
        + "\n                     + ".join(
            f"coalesce(lag(n_events, {k}) OVER w, 0) * {2 ** (15 - k)}"
            for k in range(16)
        )
        + """
                       AS num
              FROM filled
              WINDOW w AS (PARTITION BY event_type ORDER BY m)
            )
            SELECT event_type,
                   CAST(m * 60000 AS BIGINT) AS minute_ms,
                   n_events,
                   CAST((num * 1000000) // 65535 AS BIGINT) AS ewma_micro
            FROM lagged
        """,
        "ev_rfm_scores": """
            WITH users AS (
              SELECT user_id,
                     max(epoch_us(ts)) AS last_us,
                     CAST(count(*) AS BIGINT) AS frequency,
                     CAST(sum(CASE WHEN event_type = 'purchase'
                              THEN CAST(round(value * 1000) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS monetary_milli
              FROM events GROUP BY user_id
            ), scored AS (
              SELECT user_id, last_us, frequency, monetary_milli,
                     CAST(ntile(5) OVER (ORDER BY last_us, user_id)
                       AS INTEGER) AS r_score,
                     CAST(ntile(5) OVER (ORDER BY frequency, user_id)
                       AS INTEGER) AS f_score,
                     CAST(ntile(5) OVER (ORDER BY monetary_milli, user_id)
                       AS INTEGER) AS m_score
              FROM users
            )
            SELECT user_id, last_us, frequency, monetary_milli,
                   r_score, f_score, m_score,
                   CAST(r_score * 100 + f_score * 10 + m_score
                     AS INTEGER) AS rfm_code
            FROM scored
        """,
        "ev_outage_islands": """
            WITH marked AS (
              SELECT DISTINCT event_type, epoch_us(ts) // 60000000 AS m
              FROM events
            ), bounds AS (
              SELECT event_type, min(m) AS lo, max(m) AS hi
              FROM marked GROUP BY event_type
            ), spine AS (
              SELECT event_type, unnest(generate_series(lo, hi)) AS m
              FROM bounds
            ), missing AS (
              SELECT s.event_type, s.m
              FROM spine s
              LEFT JOIN marked ob
                ON ob.event_type = s.event_type AND ob.m = s.m
              WHERE ob.m IS NULL
            ), grp AS (
              SELECT event_type, m,
                     m - row_number() OVER (
                       PARTITION BY event_type ORDER BY m
                     ) AS g
              FROM missing
            )
            SELECT event_type,
                   CAST(min(m) * 60000 AS BIGINT) AS outage_start_ms,
                   CAST(count(*) AS BIGINT) AS outage_minutes
            FROM grp GROUP BY event_type, g
        """,
        "ev_scd2_intervals": """
            WITH flagged AS (
              SELECT user_id, event_id, event_type AS state,
                     epoch_us(ts) AS ts_us,
                     CASE WHEN lag(event_type) OVER w IS NULL
                            OR event_type <> lag(event_type) OVER w
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            ), numbered AS (
              SELECT user_id, state, ts_us,
                     CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING
                     ) AS BIGINT) AS run_idx
              FROM flagged
            ), runs AS (
              SELECT user_id, run_idx, min(state) AS state,
                     min(ts_us) AS valid_from_us,
                     CAST(count(*) AS BIGINT) AS n_events
              FROM numbered GROUP BY user_id, run_idx
            )
            SELECT user_id, state, run_idx, valid_from_us,
                   lead(valid_from_us) OVER (
                     PARTITION BY user_id ORDER BY run_idx
                   ) AS valid_to_us,
                   n_events
            FROM runs
        """,
        "ev_markov_transitions": """
            WITH t AS (
              SELECT event_type AS dst,
                     lag(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id
                     ) AS src
              FROM events
            ),
            c AS (
              SELECT src, dst, CAST(count(*) AS BIGINT) AS n
              FROM t WHERE src IS NOT NULL GROUP BY 1, 2
            )
            SELECT src, dst, n,
                   (round((n * 1.0 / sum(n) OVER (PARTITION BY src))
                          * 10000) / 10000 + 0.0) AS p
            FROM c
        """,
        "h8_national_market_share": f"""
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
                   {_r4(f"CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_DISC} ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE) / CAST(sum({_DISC}) AS DOUBLE)")} AS mkt_share
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            GROUP BY 1
        """,
        "h17_small_quantity_revenue": f"""
            WITH matched AS (
              SELECT CAST(l_quantity AS DECIMAL(12,2)) AS qty,
                     CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
                     CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER w
                          AS DECIMAL(30,6)) AS sum_qty,
                     CAST(count(*) OVER w AS BIGINT) AS cnt
              FROM lineitem
              JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
              WINDOW w AS (PARTITION BY l_partkey)
            )
            SELECT {_r4("CAST(sum(price) AS DOUBLE) / 7.0")} AS avg_yearly
            FROM matched
            WHERE CAST(qty * 5 * cnt AS DECIMAL(30,6)) < sum_qty
        """,
        "h21_waiting_suppliers": """
            WITH per_order AS (
              SELECT l_orderkey,
                     count(DISTINCT l_suppkey) AS n_supp,
                     count(DISTINCT CASE WHEN epoch_us(l_shipdate) >
                       epoch_us(o_orderdate) + 30 * 86400000000
                       THEN l_suppkey END) AS n_late,
                     min(CASE WHEN epoch_us(l_shipdate) >
                       epoch_us(o_orderdate) + 30 * 86400000000
                       THEN l_suppkey END) AS culprit
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
              GROUP BY l_orderkey
            ), waits AS (
              SELECT culprit AS suppkey, CAST(count(*) AS BIGINT) AS numwait
              FROM per_order
              WHERE n_supp >= 2 AND n_late = 1
              GROUP BY culprit
            )
            SELECT s_name, numwait
            FROM waits JOIN supplier ON suppkey = s_suppkey
            ORDER BY numwait DESC, s_name
            LIMIT 10
        """,
        "ev_asof_attribution": """
            WITH base AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
              FROM events WHERE event_type IN ('purchase', 'click')
            ),
            carried AS (
              SELECT *,
                last_value(CASE WHEN event_type = 'click'
                                THEN event_id END IGNORE NULLS)
                  OVER w AS cause_event_id,
                last_value(CASE WHEN event_type = 'click'
                                THEN ts_us END IGNORE NULLS)
                  OVER w AS cause_ts
              FROM base
              WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING)
            )
            SELECT event_id, user_id, ts_us, cause_event_id,
                   ts_us - cause_ts AS gap_us
            FROM carried WHERE event_type = 'purchase'
        """,
        "ev_locf_fill": """
            WITH base AS (
              SELECT event_type, epoch_us(ts) // 60000000 AS m, value
              FROM events
            ),
            obs AS (
              SELECT event_type, m,
                     (round(avg(value) * 10000) / 10000 + 0.0) AS v
              FROM base GROUP BY 1, 2
            ),
            bounds AS (SELECT min(m) AS lo, max(m) AS hi FROM base),
            types AS (SELECT DISTINCT event_type FROM base),
            spine AS (
              SELECT event_type, unnest(generate_series(lo, hi)) AS m
              FROM types, bounds
            ),
            j AS (
              SELECT s.event_type, s.m, obs.v
              FROM spine s LEFT JOIN obs USING (event_type, m)
            )
            SELECT event_type,
                   CAST(m * 60000 AS BIGINT) AS minute_ms,
                   last_value(v IGNORE NULLS) OVER (
                     PARTITION BY event_type ORDER BY m
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS value,
                   (v IS NOT NULL) AS is_observed
            FROM j
        """,
        "ev_minute_resample": """
            WITH mm AS (
              SELECT epoch_us(ts) // 60000000 AS m
              FROM events WHERE event_type = 'purchase'
            ),
            counts AS (SELECT m, CAST(count(*) AS BIGINT) AS n
                       FROM mm GROUP BY m),
            bounds AS (SELECT min(m) AS lo, max(m) AS hi FROM mm),
            spine AS (SELECT unnest(generate_series(lo, hi)) AS m
                      FROM bounds)
            SELECT m * 60000 AS minute_ms,
                   CAST(coalesce(n, 0) AS BIGINT) AS n_events
            FROM spine LEFT JOIN counts USING (m)
        """,
        "w_rolling_revenue": f"""
            WITH daily AS (
              SELECT epoch_us(l_shipdate) // 86400000000 AS day_idx,
                     sum({_DISC}) AS day_rev
              FROM lineitem GROUP BY 1
            )
            SELECT day_idx,
                   {_r4("CAST(day_rev AS DOUBLE)")} AS day_revenue,
                   {_r4("CAST(sum(day_rev) OVER (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)")}
                     AS trailing_revenue
            FROM daily
        """,
        "h12_late_shipment_priority": """
            SELECT CASE
                     WHEN (epoch_us(l_shipdate) - epoch_us(o_orderdate))
                          // 86400000000 <= 30 THEN 'ON_TIME'
                     WHEN (epoch_us(l_shipdate) - epoch_us(o_orderdate))
                          // 86400000000 <= 60 THEN 'LATE'
                     ELSE 'VERY_LATE'
                   END AS delay_bucket,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY delay_bucket
        """,
        "w_customer_deciles": f"""
            WITH per_cust AS (
              SELECT o_custkey,
                     sum(CAST(o_totalprice AS DECIMAL(12,2))) AS spend,
                     CAST(count(*) AS BIGINT) AS n_orders
              FROM orders GROUP BY o_custkey
            ),
            tiled AS (
              SELECT *, ntile(10) OVER (ORDER BY spend DESC, o_custkey)
                          AS decile
              FROM per_cust
            )
            SELECT CAST(decile AS INTEGER) AS decile,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(n_orders) AS BIGINT) AS n_orders,
                   {_r4("CAST(sum(spend) AS DOUBLE)")} AS total_spend
            FROM tiled GROUP BY decile
        """,
        "w_next_basket_rules": """
            WITH seqo AS (
              SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS od
              FROM orders
            ),
            chain AS (
              SELECT lag(o_orderkey) OVER (
                       PARTITION BY o_custkey ORDER BY od, o_orderkey)
                       AS k_prev,
                     o_orderkey AS k_next
              FROM seqo
              QUALIFY k_prev IS NOT NULL
            ),
            brands AS (
              SELECT DISTINCT l_orderkey, p_brand AS brand
              FROM lineitem JOIN part ON p_partkey = l_partkey
            ),
            pr AS (
              SELECT ba.brand AS brand_a, bb.brand AS brand_b,
                     CAST(count(*) AS BIGINT) AS n_seq_pairs
              FROM chain
              JOIN brands ba ON ba.l_orderkey = chain.k_prev
              JOIN brands bb ON bb.l_orderkey = chain.k_next
              GROUP BY 1, 2
            ),
            na AS (
              SELECT ba.brand AS brand_a, CAST(count(*) AS BIGINT) AS n_a
              FROM chain JOIN brands ba ON ba.l_orderkey = chain.k_prev
              GROUP BY 1
            ),
            nb AS (
              SELECT bb.brand AS brand_b, CAST(count(*) AS BIGINT) AS n_b
              FROM chain JOIN brands bb ON bb.l_orderkey = chain.k_next
              GROUP BY 1
            ),
            tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM chain)
            SELECT brand_a, brand_b, n_seq_pairs, n_a, n_b,
                   -- widen the multiplicands to HUGEINT so the oracle
                   -- widens like the engine's DECIMAL(38,0) does (the
                   -- BIGINT product overflows around sf10+)
                   CAST(CAST(n_seq_pairs AS HUGEINT) * tt.t * 1000000
                        // (CAST(n_a AS HUGEINT) * n_b)
                        AS BIGINT) AS lift_micro
            FROM pr
            JOIN na USING (brand_a)
            JOIN nb USING (brand_b), tt
        """,
        "w_promo_lift_did": f"""
            WITH cell AS (
              SELECT (p.p_type LIKE 'PROMO%') AS promo,
                     (epoch_us(l_shipdate) >= {an.DID_SPLIT_US}) AS after,
                     CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT) AS rev_cents
              FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey
            ),
            agg AS (
              SELECT
                sum(CASE WHEN promo AND NOT after THEN 1 ELSE 0 END) AS n_pb,
                sum(CASE WHEN promo AND after THEN 1 ELSE 0 END) AS n_pa,
                sum(CASE WHEN NOT promo AND NOT after THEN 1 ELSE 0 END)
                  AS n_ob,
                sum(CASE WHEN NOT promo AND after THEN 1 ELSE 0 END) AS n_oa,
                sum(CASE WHEN promo AND NOT after THEN rev_cents
                    ELSE 0 END) AS s_pb,
                sum(CASE WHEN promo AND after THEN rev_cents
                    ELSE 0 END) AS s_pa,
                sum(CASE WHEN NOT promo AND NOT after THEN rev_cents
                    ELSE 0 END) AS s_ob,
                sum(CASE WHEN NOT promo AND after THEN rev_cents
                    ELSE 0 END) AS s_oa
              FROM cell
            )
            SELECT CAST(n_pb AS BIGINT) AS n_promo_before,
                   CAST(n_pa AS BIGINT) AS n_promo_after,
                   CAST(n_ob AS BIGINT) AS n_other_before,
                   CAST(n_oa AS BIGINT) AS n_other_after,
                   CAST(s_pb * 1000000 // n_pb AS BIGINT)
                     AS promo_before_micro,
                   CAST(s_pa * 1000000 // n_pa AS BIGINT)
                     AS promo_after_micro,
                   CAST(s_ob * 1000000 // n_ob AS BIGINT)
                     AS other_before_micro,
                   CAST(s_oa * 1000000 // n_oa AS BIGINT)
                     AS other_after_micro,
                   CAST((s_pa * 1000000 // n_pa - s_pb * 1000000 // n_pb)
                        - (s_oa * 1000000 // n_oa
                           - s_ob * 1000000 // n_ob) AS BIGINT) AS did_micro
            FROM agg
        """,
        "h_weighted_median_price": """
            WITH cells AS (
              SELECT n.n_name AS nation,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                       AS price_cents,
                     CAST(sum(CAST(round(l_quantity) AS BIGINT))
                          AS BIGINT) AS w
              FROM lineitem li
              JOIN supplier s ON s.s_suppkey = li.l_suppkey
              JOIN nation n ON n.n_nationkey = s.s_nationkey
              GROUP BY 1, 2
            ),
            ranked AS (
              SELECT nation, price_cents,
                     sum(w) OVER (PARTITION BY nation ORDER BY price_cents
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
                     sum(w) OVER (PARTITION BY nation) AS total
              FROM cells
            )
            SELECT nation,
                   CAST(total AS BIGINT) AS total_qty,
                   CAST(min(price_cents) AS BIGINT) AS median_price_cents
            FROM ranked
            WHERE 2 * cum >= total
            GROUP BY nation, total
        """,
        "h_discount_elasticity": """
            WITH li AS (
              SELECT l_partkey,
                     CAST(round(l_discount * 100) AS BIGINT) AS x,
                     CAST(round(l_quantity) AS BIGINT) AS y
              FROM lineitem
            ),
            s AS (
              SELECT p.p_brand AS brand,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy
              FROM li JOIN part p ON p.p_partkey = li.l_partkey
              GROUP BY 1
            )
            SELECT brand, n AS n_lines,
                   ((round((CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE) * 100.0)
                           * 10000) / 10000) + 0.0) AS slope_round4,
                   ((round((CAST(n * sxy - sx * sy AS DOUBLE)
                            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                               * sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
                           * 10000) / 10000) + 0.0) AS corr_round4
            FROM s
            WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        """,
        "ev_multitouch_attribution": f"""
            WITH base AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
              FROM events
              WHERE event_type IN ('purchase', 'click')
            ),
            conv AS (
              SELECT user_id, event_id AS p_id, ts_us AS p_ts
              FROM base WHERE event_type = 'purchase'
            ),
            touch AS (
              SELECT user_id, event_id AS c_id, ts_us AS c_ts
              FROM base WHERE event_type = 'click'
            ),
            pairs AS (
              SELECT p.p_id,
                     (p.p_ts - t.c_ts) // 86400000000 AS lag_days,
                     count(*) OVER (PARTITION BY p.p_id) AS k,
                     row_number() OVER (
                       PARTITION BY p.p_id
                       ORDER BY t.c_ts DESC, t.c_id DESC) AS rn
              FROM conv p
              JOIN touch t
                ON t.user_id = p.user_id
               AND t.c_ts <= p.p_ts
               AND t.c_ts > p.p_ts - {an.ATTRIB_LOOKBACK_US}
            ),
            credits AS (
              SELECT 'linear' AS scheme, lag_days,
                     1000000 // k
                       + CASE WHEN rn = 1 THEN 1000000 % k ELSE 0 END
                       AS credit
              FROM pairs
              UNION ALL
              SELECT 'last', lag_days, 1000000 FROM pairs WHERE rn = 1
            )
            SELECT scheme, CAST(lag_days AS BIGINT) AS lag_days,
                   CAST(count(*) AS BIGINT) AS n_touches,
                   CAST(sum(credit) AS BIGINT) AS credit_micro
            FROM credits GROUP BY 1, 2
        """,
        "pipe_table_checksums": " UNION ALL ".join(
            f"""
            SELECT '{tbl}' AS tbl,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST('0x' ||
                       substring(md5(CAST(({key}) AS VARCHAR)), 1, 8)
                       AS BIGINT) % {an.CHECKSUM_MOD}) AS BIGINT)
                     AS key_checksum
            FROM {tbl}
            """
            for tbl, key in an.CHECKSUM_TABLES
        ),
        "w_zone_map_prune": f"""
            WITH base AS (
              SELECT l_orderkey, epoch_us(l_shipdate) AS sd_us
              FROM lineitem
            ),
            stacked AS (
              SELECT 'hash' AS layout, l_orderkey % 32 AS shard, sd_us
              FROM base
              UNION ALL
              SELECT 'date', sd_us // {an.ZONE_MAP_SHARD_US}, sd_us
              FROM base
            ),
            zm AS (
              SELECT layout, shard,
                     count(*) AS rows,
                     sum(CASE WHEN sd_us >= {an.ZONE_MAP_LO_US}
                               AND sd_us < {an.ZONE_MAP_HI_US}
                         THEN 1 ELSE 0 END) AS matched,
                     min(sd_us) AS zmin, max(sd_us) AS zmax
              FROM stacked GROUP BY 1, 2
            )
            SELECT layout,
                   CAST(count(*) AS BIGINT) AS n_shards,
                   CAST(sum(CASE WHEN zmax < {an.ZONE_MAP_LO_US}
                                   OR zmin >= {an.ZONE_MAP_HI_US}
                            THEN 0 ELSE 1 END) AS BIGINT) AS shards_scanned,
                   CAST(sum(rows) AS BIGINT) AS rows_total,
                   CAST(sum(CASE WHEN zmax < {an.ZONE_MAP_LO_US}
                                   OR zmin >= {an.ZONE_MAP_HI_US}
                            THEN 0 ELSE rows END) AS BIGINT) AS rows_scanned,
                   CAST(sum(matched) AS BIGINT) AS rows_matched,
                   (CAST(sum(matched) AS BIGINT) * 1000000)
                     // CAST(sum(CASE WHEN zmax < {an.ZONE_MAP_LO_US}
                                        OR zmin >= {an.ZONE_MAP_HI_US}
                                 THEN 0 ELSE rows END) AS BIGINT)
                     AS scan_efficiency_micro
            FROM zm GROUP BY layout
        """,
        "ev_zorder_layout": f"""
            WITH ev AS (
              SELECT user_id,
                     (epoch_us(ts) // 60000000) % 65536 AS x,
                     user_id % 65536 AS y
              FROM events
            ),
            k AS (SELECT user_id, {_ZORDER_SQL} AS zkey FROM ev)
            SELECT zkey // 16777216 AS zbucket,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(min(zkey) AS BIGINT) AS min_z,
                   CAST(max(zkey) AS BIGINT) AS max_z
            FROM k GROUP BY zbucket
        """,
        "ev_time_weighted_value": f"""
            WITH ev AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                     CAST(round(value * 1000, 0) AS BIGINT) AS value_milli
              FROM events
            ),
            stepped AS (
              SELECT user_id, value_milli,
                     lead(ts_us) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id) - ts_us
                       AS dt_us
              FROM ev
            )
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
                   CAST(sum(dt_us) AS BIGINT) AS total_dt_us,
                   CAST(sum(value_milli * dt_us) AS BIGINT) AS weighted_sum,
                   {_r4("CAST(sum(value_milli * dt_us) AS DOUBLE)"
                        " / (1000.0 * sum(dt_us))")} AS twa_value
            FROM stepped WHERE dt_us IS NOT NULL GROUP BY user_id
        """,
        "h11_important_stock": f"""
            WITH {_PARTSUPP_CTE.strip()},
            held AS (
              SELECT ps_partkey,
                     CAST(ps_cost_cents * ps_availqty AS BIGINT) AS v
              FROM ps JOIN supplier ON s_suppkey = ps_suppkey
              WHERE s_nationkey = 0
            ),
            tot AS (SELECT sum(v) AS total_cents FROM held)
            SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents
            FROM held CROSS JOIN tot
            GROUP BY ps_partkey, total_cents
            HAVING sum(v) * 1000 > total_cents
        """,
        "h2_min_cost_supplier": f"""
            WITH {_PARTSUPP_CTE.strip()},
            cand AS (
              SELECT p.p_partkey, ps.ps_suppkey, ps.ps_cost_cents,
                     s.s_name, n.n_name
              FROM ps
              JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_size = 5
              JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
              JOIN nation n ON n.n_nationkey = s.s_nationkey
                           AND n.n_regionkey = 0
            ),
            mins AS (
              SELECT p_partkey AS _pk, min(ps_cost_cents) AS _minc
              FROM cand GROUP BY p_partkey
            )
            SELECT c.p_partkey, c.ps_suppkey,
                   CAST(c.ps_cost_cents AS BIGINT) AS cost_cents,
                   c.s_name, c.n_name
            FROM cand c JOIN mins m
              ON c.p_partkey = m._pk AND c.ps_cost_cents = m._minc
        """,
        "h9_product_profit": f"""
            SELECT n.n_name,
                   CAST(year(o.o_orderdate) AS INT) AS o_year,
                   {_r4(f"CAST(sum({_DISC}) AS DOUBLE)"
                        " - sum(((l.l_partkey * 37 + l.l_suppkey * 23)"
                        " % 99900 + 100) * CAST(l.l_quantity AS BIGINT))"
                        " / 100.0")} AS profit,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY n.n_name, o_year
        """,
        "hr_pricing_cube": f"""
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   {_r4("CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)")} AS sum_qty,
                   {_r4("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)")} AS sum_base_price,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE epoch_us(l_shipdate) <= {Q1_CUTOFF_US}
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "h20_excess_stock": f"""
            WITH {_PARTSUPP_CTE.strip()},
            shipped AS (
              SELECT l_partkey, l_suppkey,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS shipped_qty
              FROM lineitem
              WHERE epoch_us(l_shipdate) >= {Q6_LO_US}
                AND epoch_us(l_shipdate) < {Q6_HI_US}
              GROUP BY l_partkey, l_suppkey
            ),
            over_parts AS (
              SELECT ps.ps_suppkey
              FROM ps
              JOIN part p ON p.p_partkey = ps.ps_partkey
                         AND p.p_type = 'PROMO'
              JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                             AND sh.l_suppkey = ps.ps_suppkey
              WHERE ps.ps_availqty * 2 > sh.shipped_qty
            )
            SELECT s.s_suppkey, s.s_name,
                   CAST(count(*) AS BIGINT) AS n_parts_over
            FROM over_parts o JOIN supplier s ON s.s_suppkey = o.ps_suppkey
            GROUP BY s.s_suppkey, s.s_name
        """,
    }
