"""Name/tag index materialization — the reference's queryable stores.

Reference: TraceStorageTopology.java builds four stores from the spans
stream: span names per service (:151-185), remote service names per service
(:187-205), autocomplete tag values per configured key (:207-228), and the
traces-by-id store (:96-126).  Each is a set-accumulation keyed by a string.

Spark-first: each store is a ``collect_set`` aggregation — map-side partial
aggregation makes these cheap (the distinct-set cardinality is tiny compared
to the span count, so the shuffle carries only partial sets).  At 100 TB
these produce KB-scale outputs; the shuffle is bounded by
(#services x #distinct names), not by row count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default autocomplete keys, mirroring the reference test config
# (TraceStorageTopologyTest.java:49 configures the "environment" key).
DEFAULT_AUTOCOMPLETE_KEYS = ("environment",)


def service_names(spans: DataFrame) -> DataFrame:
    """All services with at least one indexed span (store key scan,
    reference KafkaStorageHttpService.java:98-115).  Only spans with a
    local service are indexed (TraceStorageTopology.java:168)."""
    return (
        spans.filter(F.col("local_service").isNotNull())
        .select(F.col("local_service").alias("service_name"))
        .distinct()
    )


def span_names(spans: DataFrame) -> DataFrame:
    """service -> sorted distinct span names (zipkin-span-names store,
    TraceStorageTopology.java:151-185).  Output one row per service with a
    comma-joined sorted name list (array order pinned for hashing)."""
    return (
        spans.filter(F.col("local_service").isNotNull() & F.col("name").isNotNull())
        .groupBy(F.col("local_service").alias("service_name"))
        .agg(F.array_join(F.array_sort(F.collect_set("name")), ",").alias("names"))
    )


def remote_service_names(spans: DataFrame) -> DataFrame:
    """service -> sorted distinct remote service names
    (zipkin-remote-service-names store, TraceStorageTopology.java:187-205)."""
    return (
        spans.filter(
            F.col("local_service").isNotNull() & F.col("remote_service").isNotNull()
        )
        .groupBy(F.col("local_service").alias("service_name"))
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("remote_service")), ","
            ).alias("remote_services")
        )
    )


def autocomplete_tags(
    spans: DataFrame, keys: Sequence[str] = DEFAULT_AUTOCOMPLETE_KEYS
) -> DataFrame:
    """tag key -> sorted distinct values for configured autocomplete keys
    (zipkin-autocomplete-tags store, TraceStorageTopology.java:207-228).

    The scalar span layout carries the fixture's tag columns directly; the
    nested-layout variant explodes the tags map and filters ``key.isin``.
    """
    supported = {"environment": F.col("env"), "k": F.col("tag_k")}
    chosen = [k for k in keys if k in supported]
    if not chosen:
        raise ValueError(f"no supported autocomplete keys in {keys!r}")
    # Single pass: build (key, value) pairs per span and explode — one scan
    # of the spans input instead of one per key (matters at 100 TB).
    pair_array = F.array(
        *[
            F.struct(F.lit(k).alias("tag_key"), supported[k].alias("value"))
            for k in chosen
        ]
    )
    return (
        spans.select(F.explode(pair_array).alias("kv"))
        .select("kv.tag_key", "kv.value")
        .filter(F.col("value").isNotNull())
        .groupBy("tag_key")
        .agg(F.array_join(F.array_sort(F.collect_set("value")), ",").alias("tag_values"))
    )


def latest_span_per_service(spans: DataFrame) -> DataFrame:
    """Max-timestamp-per-key — SURVEY section 2.5: the reference's closest
    analytic behavior is "latest window wins" (``backwardFetch`` + first,
    TraceStorageTopology.java:108-114, KafkaStorageHttpService.java:253-257).
    Expressed as a row_number window; ties broken by span id desc so the
    pick is total-ordered.  At scale this is one shuffle on the service key
    with per-partition top-1 (WindowGroupLimit pushes rank<=1 down)."""
    from pyspark.sql import Window

    w = Window.partitionBy("local_service").orderBy(
        F.col("timestamp").desc(), F.col("id").desc()
    )
    return (
        spans.filter(F.col("local_service").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("local_service").alias("service_name"),
            F.col("name").alias("latest_name"),
            F.col("timestamp").alias("latest_timestamp"),
            F.col("id").alias("latest_span_id"),
        )
    )


def autocomplete_tags_nested(
    spans_nested: DataFrame, keys: Sequence[str] = DEFAULT_AUTOCOMPLETE_KEYS
) -> DataFrame:
    """Same store from the canonical nested layout: explode the tags map,
    keep configured keys (TraceStorageTopology.java:209 ``tags().get``)."""
    return (
        spans_nested.select(F.explode("tags").alias("tag_key", "value"))
        .filter(F.col("tag_key").isin(list(keys)))
        .groupBy("tag_key")
        .agg(F.array_join(F.array_sort(F.collect_set("value")), ",").alias("tag_values"))
    )


def slowest_spans_per_service(spans: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` slowest spans per service — the "slow ops" panel query.
    Same WindowGroupLimit family as :func:`latest_span_per_service` but
    with k > 1: the rank <= k predicate pushes below the exchange, so each
    map partition keeps a size-k heap per key and the shuffle carries at
    most k rows/key/partition.  Ties are total-ordered by (duration desc,
    id asc).  Columns: service_name, rnk, span_id, name, duration.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("local_service").orderBy(
        F.col("duration").desc(), F.col("id")
    )
    return (
        spans.filter(
            F.col("local_service").isNotNull()
            & F.col("duration").isNotNull()
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("local_service").alias("service_name"),
            "rnk",
            F.col("id").alias("span_id"),
            "name",
            "duration",
        )
    )


def anomalous_span_counts(spans: DataFrame, z2_threshold: int = 9) -> DataFrame:
    """Per-service count of duration outliers (z-score beyond
    sqrt(``z2_threshold``), default 3-sigma) — the latency-anomaly panel
    over the span store.

    Determinism: the per-service moments (n, sum, sum-of-squares) are
    EXACT decimal(38,0) aggregates — Spark's non-ANSI bigint sum silently
    wraps on overflow, and sum(dur²) at 100 TB row counts exceeds int64
    (10^11 rows × (10^9 µs)² ≈ 10^29), so the accumulation is widened to
    decimal BEFORE the multiply; the z² test is evaluated per row from
    those exact integers with one float expression — identical operands
    in both engines (the DuckDB oracle accumulates in HUGEINT), so no
    accumulation-order drift anywhere.  The test multiplies out the
    variance so there is no per-group division:
    (n·x − s)² · (n−1) > t · n · (n·sumsq − s²).

    Shape: one stats agg + a broadcast join back + one count agg — the
    stats side is |services| rows.  Columns: local_service, n_spans,
    n_anomalies.
    """
    base = spans.filter(
        F.col("local_service").isNotNull() & F.col("duration").isNotNull()
    ).select(
        "local_service", F.col("duration").cast("long").alias("dur")
    )
    dur_dec = F.col("dur").cast("decimal(18,0)")
    stats = base.groupBy(F.col("local_service").alias("_svc")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dur").cast("decimal(28,0)")).alias("s"),
        F.sum(dur_dec * dur_dec).alias("sq"),
    )
    joined = base.join(
        F.broadcast(stats), F.col("local_service") == F.col("_svc")
    )
    n_x_minus_s = (
        F.col("n").cast("decimal(19,0)") * F.col("dur").cast("decimal(18,0)")
        - F.col("s")
    ).cast("double")
    lhs = (
        n_x_minus_s * n_x_minus_s * (F.col("n") - 1).cast("double")
    )
    rhs = (
        F.lit(float(z2_threshold))
        * F.col("n").cast("double")
        * (
            F.col("n").cast("double") * F.col("sq").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
    )
    flagged = joined.filter((F.col("n") >= 2) & (lhs > rhs))
    anomalies = flagged.groupBy("local_service").agg(
        F.count(F.lit(1)).alias("n_anomalies")
    )
    return (
        stats.join(
            anomalies, F.col("_svc") == F.col("local_service"), "left"
        )
        .select(
            F.col("_svc").alias("local_service"),
            F.col("n").alias("n_spans"),
            F.coalesce("n_anomalies", F.lit(0)).alias("n_anomalies"),
        )
    )


def window_active_spans(
    spans: DataFrame, window_micros: int = 60_000_000
) -> DataFrame:
    """Overlap-aware windowed load: count each span in EVERY 1-minute
    window its [timestamp, timestamp+max(duration,1)) interval overlaps —
    the "active spans per window" load profile, vs the A7 counters that
    bucket by start time only (a 5-minute span spans five windows here
    and one there).

    Expressed as a bounded explode: sequence(start_idx, last_idx) where
    last_idx = (end-1) // W, so fanout per span is ceil(duration/W)+1 —
    bounded by span duration, never by data volume.  After the explode
    it is a plain partial-aggregated count keyed (service, window); the
    window index becomes the sink partition column so range queries
    prune (same layout contract as windowed_link_counters).

    Output: local_service, window_start_ms, active_spans.
    """
    # integer div, not float division: epoch micros are ~1.7e15 and a
    # double-rounded quotient can floor to the wrong window at exact
    # boundaries
    idx = F.explode(
        F.sequence(
            F.expr(f"timestamp div {window_micros}"),
            F.expr(
                f"(timestamp + greatest(coalesce(duration, 0), 1) - 1)"
                f" div {window_micros}"
            ),
        )
    ).alias("widx")
    return (
        spans.filter(F.col("local_service").isNotNull())
        .select("local_service", idx)
        .groupBy("local_service", "widx")
        .agg(F.count(F.lit(1)).alias("active_spans"))
        .select(
            "local_service",
            (F.col("widx") * F.lit(window_micros // 1000)).alias(
                "window_start_ms"
            ),
            "active_spans",
        )
    )


# Multi-window burn-rate alerting constants (Google SRE Workbook ch. 5,
# "Alerting on SLOs", public): page when BOTH a short and a long window
# burn the error budget faster than BURN_ALERT_FACTOR x the sustainable
# rate — the short window gives fast detection, the long window keeps a
# transient blip from paging.
SLO_ERROR_BUDGET = 0.001  # 99.9% availability target
BURN_ALERT_FACTOR = 14.4
BURN_LONG_WINDOWS = 5


def slo_burn_rate(
    spans: DataFrame,
    window_micros: int = 60_000_000,
    long_windows: int = BURN_LONG_WINDOWS,
    error_budget: float = SLO_ERROR_BUDGET,
    alert_factor: float = BURN_ALERT_FACTOR,
) -> DataFrame:
    """Multi-window SLO burn-rate per service: for each (service, 1-min
    window), the short-window burn rate (error rate / error budget), the
    long-window burn rate (same, over this + the previous
    ``long_windows - 1`` windows), and the page-worthy flag when BOTH
    exceed ``alert_factor`` — the SRE-workbook multiwindow alert, served
    from the trace store's span table.

    The long window is a RANGE frame over the integer window index, so
    gaps (windows with no traffic) are handled by value, not by row
    position.  Counts stay exact integers through both frames; rates
    divide exact sums and round4 only at the output boundary — the same
    discipline as q_service_error_rate.

    Output: local_service, window_start_ms, n_spans, n_errors,
    short_burn, long_burn, alert.

    Scale (100 TB): one partial-aggregated count shuffle keyed
    (service, window) — cardinality #services x #windows, not span
    count — then a per-service window function over that ALREADY-TINY
    frame (a year of minutes is 525k rows per service).  The alert scan
    never touches raw spans twice.
    """
    from pyspark.sql import Window

    base = (
        spans.filter(F.col("local_service").isNotNull())
        .groupBy(
            "local_service",
            F.expr(f"timestamp div {window_micros}").alias("widx"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("is_error").cast("long")).alias("n_errors"),
        )
    )
    w_long = (
        Window.partitionBy("local_service")
        .orderBy("widx")
        .rangeBetween(-(long_windows - 1), 0)
    )
    from zipkin_storage_kafka_spark.functions.portable import round4

    short_burn = round4(
        F.col("n_errors") / F.col("n_spans") / F.lit(error_budget)
    )
    long_burn = round4(
        F.sum("n_errors").over(w_long)
        / F.sum("n_spans").over(w_long)
        / F.lit(error_budget)
    )
    return (
        base.select(
            "local_service",
            (F.col("widx") * F.lit(window_micros // 1000)).alias(
                "window_start_ms"
            ),
            "n_spans",
            "n_errors",
            short_burn.alias("short_burn"),
            long_burn.alias("long_burn"),
        )
        .withColumn(
            "alert",
            (F.col("short_burn") >= alert_factor)
            & (F.col("long_burn") >= alert_factor),
        )
    )


def latency_shift(spans: DataFrame, split_us: int) -> DataFrame:
    """Per-service latency-percentile shift across a time split — the
    canary panel read after a deploy: exact p50/p95 before vs after
    ``split_us`` plus the deltas.  A service present in only one window
    reports NULL for the missing side (and NULL shift) rather than a
    fabricated zero.

    Columns: local_service, n_before, n_after, p50_before, p50_after,
    p50_shift, p95_before, p95_after, p95_shift (percentiles round4).

    Scale (100 TB): one grouped aggregation; the FILTER clause splits
    the windows inside the same partial agg (no two-scan self-join).
    Exact `percentile` sorts per (service, window) slice — fine at
    service cardinality; swap `approx_percentile` at extreme per-group
    cardinality exactly like z_latency_percentiles' approx mode.
    """
    from zipkin_storage_kafka_spark.functions.portable import round4

    s = int(split_us)
    agg = spans.groupBy("local_service").agg(
        F.expr(f"count(*) FILTER (WHERE timestamp < {s})").alias(
            "n_before"
        ),
        F.expr(f"count(*) FILTER (WHERE timestamp >= {s})").alias(
            "n_after"
        ),
        round4(
            F.expr(
                f"percentile(duration, 0.5) FILTER (WHERE timestamp < {s})"
            )
        ).alias("p50_before"),
        round4(
            F.expr(
                f"percentile(duration, 0.5) FILTER (WHERE timestamp >= {s})"
            )
        ).alias("p50_after"),
        round4(
            F.expr(
                f"percentile(duration, 0.95) FILTER (WHERE timestamp < {s})"
            )
        ).alias("p95_before"),
        round4(
            F.expr(
                f"percentile(duration, 0.95) FILTER (WHERE timestamp >= {s})"
            )
        ).alias("p95_after"),
    )
    return agg.select(
        "local_service",
        "n_before",
        "n_after",
        "p50_before",
        "p50_after",
        round4(F.col("p50_after") - F.col("p50_before")).alias("p50_shift"),
        "p95_before",
        "p95_after",
        round4(F.col("p95_after") - F.col("p95_before")).alias("p95_shift"),
    )


def exemplar_spans(spans: DataFrame) -> DataFrame:
    """Deterministic exemplar per (service, latency magnitude bucket) —
    the "give me one representative trace for this histogram bar"
    feature tracing UIs attach to latency histograms (OpenMetrics
    exemplars, public spec).  A real deployment wants a *stable* pick so
    dashboards don't flicker between refreshes: the exemplar is the span
    with the MINIMUM md5 of (trace_id:span_id) in its bucket — uniform
    over the bucket, reproducible in any engine, no RNG.

    Buckets are decimal-magnitude (digit count of the micros duration):
    pure integer/string arithmetic, engine-identical, and the panel
    shape users read ("~100 us", "~1 ms", "~10 ms"...).

    Scale: ONE partial-aggregated pass — min_by folds map-side like any
    min, so the shuffle carries |services| x ~7 rows.  No window, no
    sort, no per-group collect.

    Output: local_service, dur_digits, n_spans, exemplar_trace,
    exemplar_span.
    """
    pick = F.md5(F.concat_ws(":", F.col("trace_id"), F.col("id")))
    return (
        spans.filter(
            F.col("local_service").isNotNull()
            & F.col("duration").isNotNull()
        )
        .select(
            "local_service",
            F.length(F.col("duration").cast("string"))
            .cast("long")
            .alias("dur_digits"),
            "trace_id",
            "id",
            pick.alias("pick"),
        )
        .groupBy("local_service", "dur_digits")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.min_by("trace_id", "pick").alias("exemplar_trace"),
            F.min_by("id", "pick").alias("exemplar_span"),
        )
    )


MAD_K_MICRO = 5_189_100  # 3.5 * 1.4826 (the Hampel identifier) in micro


def mad_anomalies(spans: DataFrame) -> DataFrame:
    """Robust duration outliers per service via the HAMPEL identifier
    (|x - median| > 3.5 * 1.4826 * MAD) — the robust-statistics twin of
    :func:`anomalous_span_counts`' z-score panel: mean/stddev are
    dragged by the very outliers being hunted, median/MAD are not
    (50% breakdown point), so this is the panel that still works when
    a service's tail is the story.

    Both medians are EXACT and integer-only: durations collapse to
    (service, value) count cells FIRST (the weighted-median discipline
    — the corpus never enters a window), the lower weighted median
    reads off the per-service cumulative cell weights, absolute
    deviations collapse the same way for the MAD, and the outlier test
    multiplies out to integers (|x - med| * 1e6 > K_micro * MAD), so
    both engines flag the identical spans.

    Columns: local_service, n_spans, median_duration, mad,
    n_anomalies.

    Scale (100 TB, r10 single-scan shape): the corpus is scanned ONCE
    into (service, duration, weight) cells; the deviation relation
    derives from those CELLS (|v - med| carries the cell weight), so
    the median, the MAD, and the flagged count all run over relations
    bounded by distinct durations per service — raw spans never enter
    a join or window, and the old shape's three corpus scans collapse
    to one.  The |services|-row median/MAD relations broadcast.  At
    full-corpus cardinality the cells relation itself is large — the
    two-phase histogram refinement (bucket div B, then the one median
    bucket) drops in without changing semantics, and the sketch-grade
    flavor is the z_quantile_sketch row.
    """
    from pyspark.sql import Window

    base = spans.filter(
        F.col("local_service").isNotNull() & F.col("duration").isNotNull()
    ).select("local_service", F.col("duration").cast("long").alias("d"))

    def lower_weighted_median(cells: DataFrame, val: str) -> DataFrame:
        """Lower weighted median over a (local_service, val, w) cell
        relation: first value whose cumulative weight reaches half the
        total."""
        wcum = (
            Window.partitionBy("local_service")
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wtot = Window.partitionBy("local_service")
        ranked = cells.select(
            "local_service",
            F.col(val).alias("v"),
            F.sum("w").over(wcum).alias("cum"),
            F.sum("w").over(wtot).alias("total"),
        ).filter(2 * F.col("cum") >= F.col("total"))
        wmin = Window.partitionBy("local_service").orderBy("v")
        return (
            ranked.withColumn("rk", F.row_number().over(wmin))
            .filter(F.col("rk") == 1)
            .select(
                "local_service",
                F.col("v").alias(f"med_{val}"),
                F.col("total").alias("n_spans"),
            )
        )

    dcells = (
        base.groupBy("local_service", "d")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )
    med = lower_weighted_median(dcells, "d").withColumnRenamed(
        "med_d", "median_duration"
    )
    # Deviation CELLS from the duration cells — |v - med| keeps the
    # cell weight, so the MAD and the flagged count never touch raw
    # spans (one corpus scan total).
    acells = (
        dcells.join(
            F.broadcast(med.select("local_service", "median_duration")),
            "local_service",
        )
        .select(
            "local_service",
            F.abs(F.col("d") - F.col("median_duration")).alias("adev"),
            "w",
        )
        .groupBy("local_service", "adev")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    mad = lower_weighted_median(acells, "adev").select(
        "local_service", F.col("med_adev").alias("mad")
    )
    flagged = (
        acells.join(F.broadcast(mad), "local_service")
        .groupBy("local_service")
        .agg(
            F.sum(
                F.when(
                    F.col("adev") * F.lit(1_000_000)
                    > F.lit(MAD_K_MICRO) * F.col("mad"),
                    F.col("w"),
                ).otherwise(F.lit(0))
            ).alias("n_anomalies")
        )
    )
    return (
        med.join(mad, "local_service")
        .join(flagged, "local_service")
        .select(
            "local_service",
            "n_spans",
            "median_duration",
            "mad",
            "n_anomalies",
        )
    )
