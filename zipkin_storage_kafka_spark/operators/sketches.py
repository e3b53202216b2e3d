"""Engine-portable cardinality sketching (linear counting).

Approximate-distinct is a core OLAP primitive, but Spark's
``approx_count_distinct`` (HyperLogLog++) and DuckDB's ``approx_count_distinct``
(different HLL build) can never hash-match each other.  Linear counting
[Whang et al., TODS 1990] over an md5-derived bucket id is deterministic and
identical in both engines, so the sketch itself sits under the driver's
value-hash gate — the same reason the dedup chain hashes with md5
(``operators/dedup.py`` module docstring).

Sketch: bucket = first 4 hex chars of md5(value) (m = 65536 buckets); with
``v`` distinct buckets occupied, the distinct-count estimate is
``-m * ln(1 - v/m)``.  Standard error ~ sqrt(m*(exp(n/m)-n/m-1))/n; the map
saturates as n -> m, so m must be sized above the expected cardinality —
the scale path is per-partition 8 KiB bitmaps OR-merged by a tiny agg, and
a wider prefix (6-8 hex chars) for billion-scale domains.

Plan shape: ``count_distinct(bucket)`` per group is a partial-agg shuffle
whose width is capped at m rows per group regardless of input size — the
point of sketching: a 100 TB scan reduces map-side to <= 65536-row partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.functions.portable import round4

M_BUCKETS = 65536


def _bucket(col: Column) -> Column:
    return F.substring(F.md5(col), 1, 4)


def linear_count_estimate(v: Column, m: int = M_BUCKETS) -> Column:
    """Distinct-count estimate from ``v`` occupied buckets of ``m``."""
    return round4(-F.lit(float(m)) * F.log(F.lit(1.0) - v / F.lit(float(m))))


def distinct_traces_sketch(spans: DataFrame) -> DataFrame:
    """Per-service distinct-trace cardinality: linear-counting estimate
    beside the exact count and the signed error — the accuracy audit a
    sketch rollout ships with.

    Output: local_service, n_buckets, est_traces (round 4),
    exact_traces, err (round 4).

    Plan (r10): the corpus collapses to the DISTINCT (service, trace)
    relation first — one partial-agg shuffle — so the exact count is a
    plain count and the remaining distinct-bucket agg Expands only the
    deduped two-column relation, not raw spans twice (two distinct
    aggs over the corpus triple every row through the Expand).  NULL
    trace_ids are filtered first so the distinct+count(1) shape keeps
    count_distinct's NULL semantics (a NULL id must not count as a
    trace — proto decode via _hex_or_null can yield NULLs even though
    the generated spans table never does).
    """
    d = (
        spans.filter(F.col("trace_id").isNotNull())
        .select("local_service", "trace_id")
        .distinct()
    )
    agg = d.groupBy("local_service").agg(
        F.count_distinct(_bucket(F.col("trace_id"))).alias("n_buckets"),
        F.count(F.lit(1)).alias("exact_traces"),
    )
    est = linear_count_estimate(F.col("n_buckets"))
    return agg.select(
        "local_service",
        "n_buckets",
        est.alias("est_traces"),
        "exact_traces",
        round4(est - F.col("exact_traces")).alias("err"),
    )


HLL_LG_K = 14
HLL_TOLERANCE = 0.05


def hll_distinct_traces(
    spans: DataFrame, lg_k: int = HLL_LG_K, tolerance: float = HLL_TOLERANCE
) -> DataFrame:
    """Per-service distinct-trace cardinality via Spark's native
    DataSketches HLL (``hll_sketch_agg``, Spark 3.5+) — the production
    scale path next to the engine-portable linear-counting flavor
    (:func:`distinct_traces_sketch`).  The HLL binary is MERGEABLE
    (``hll_union_agg``): per-partition / per-day sketches pre-aggregate
    into a counters store and union at query time, so a 100 TB domain
    never re-shuffles raw ids — the property pinned by
    tests/test_pipeline_sampling.py::test_hll_sketches_merge.

    DuckDB's approx_count_distinct is a DIFFERENT HLL build, so the
    estimate itself can never hash-match an oracle; the driver-visible
    contract is the accuracy gate: exact count + a within-``tolerance``
    boolean (same pattern as ann_ivf_recall).  lg_k=14 gives ~0.8%
    relative standard error — 5% tolerance is >6 sigma.

    Output: local_service, exact_traces, hll_ok (bool).

    Plan (r10): the corpus collapses to the DISTINCT (service, trace)
    relation first; the HLL builds over the deduped ids (duplicate
    insertion is a no-op for HLL, so the estimate is identical —
    verified value-equal at sf1) and the exact count becomes a plain
    count, avoiding the Expand that mixing count_distinct with
    another agg forces on every raw span (sf1 min-of-3:
    1.18 -> 0.84 s).  NULL trace_ids are filtered first — same
    input-robustness note as :func:`distinct_traces_sketch`.
    """
    d = (
        spans.filter(F.col("trace_id").isNotNull())
        .select("local_service", "trace_id")
        .distinct()
    )
    agg = d.groupBy("local_service").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("trace_id", F.lit(lg_k))
        ).alias("est"),
        F.count(F.lit(1)).alias("exact_traces"),
    )
    err = F.abs(F.col("est") - F.col("exact_traces"))
    return agg.select(
        "local_service",
        "exact_traces",
        (err <= F.lit(tolerance) * F.col("exact_traces")).alias("hll_ok"),
    )


def histogram_quantile_audit(
    spans: DataFrame,
    bucket_us: int = 1000,
    max_bucket: int = 1023,
    percents: tuple[int, ...] = (50, 95, 99),
) -> DataFrame:
    """Fixed-bucket histogram quantiles vs exact percentiles — the audit
    behind the 100 TB quantile path.  Exact per-group percentile sorts
    every group; the scale flavor keeps a bounded (service x 1024)
    counter table that partial-aggregates map-side and answers any
    quantile from cumulative counts.  This row measures what that costs
    in accuracy: per (service, percentile), the histogram's bucket-
    upper-bound estimate next to the exact interpolated value.

    Quantile targets are pure integer arithmetic
    (target_rank = ceil(n*p/100) = (n*p + 99) div 100), so the chosen
    bucket can never flip on a float ulp; the estimate is the bucket's
    inclusive upper bound ((qb+1)*bucket_us), also an exact integer.

    Columns: local_service, p, n_spans, est_hi_us, exact_us (round4),
    err_us (round4).

    Scale (100 TB): the counter table is a service-keyed partial agg to
    <= 1024 rows per service; the cumulative window partitions per
    service over those rows (never a global window); exact percentile
    appears ONLY as this audit's ground truth.
    """
    from pyspark.sql import Window

    d = spans.select("local_service", "duration")
    counts = (
        d.select(
            "local_service",
            F.least(
                F.expr(f"duration div {bucket_us}"), F.lit(max_bucket)
            ).alias("bucket"),
        )
        .groupBy("local_service", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("local_service")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("c").over(w))
    tot = d.groupBy("local_service").agg(
        F.count(F.lit(1)).alias("n_spans")
    )
    ps = spans.sparkSession.createDataFrame(
        [(int(p),) for p in percents], "p int"
    )
    tgt = tot.crossJoin(F.broadcast(ps)).select(
        "local_service",
        "n_spans",
        "p",
        F.expr("(n_spans * p + 99) div 100").alias("target"),
    )
    est = (
        tgt.join(
            cum.select(
                F.col("local_service").alias("_s"), "bucket", "cum"
            ),
            (F.col("local_service") == F.col("_s"))
            & (F.col("cum") >= F.col("target")),
        )
        .groupBy("local_service", "p", "n_spans")
        .agg(F.min("bucket").alias("qb"))
    )
    agg_cols = []
    for p in percents:
        agg_cols.append(
            F.expr(f"percentile(duration, {p / 100.0})").alias(f"e{p}")
        )
    exw = d.groupBy("local_service").agg(*agg_cols)
    stack_args = ", ".join(f"{int(p)}, e{p}" for p in percents)
    ex = exw.selectExpr(
        "local_service",
        f"stack({len(percents)}, {stack_args}) AS (p, exact_raw)",
    )
    est_hi = (F.col("qb") + 1) * F.lit(int(bucket_us))
    return est.join(ex, ["local_service", "p"]).select(
        "local_service",
        "p",
        "n_spans",
        est_hi.cast("long").alias("est_hi_us"),
        round4(F.col("exact_raw")).alias("exact_us"),
        round4(est_hi - F.col("exact_raw")).alias("err_us"),
    )


CM_DEPTH = 4
CM_WIDTH = 512
CM_TOP = 20


def _cm_bucket(col: Column, row: int, width: int) -> Column:
    """Row-``row`` count-min bucket of a string key: md5-derived 32-bit
    prefix mod ``width`` — deterministic and identical in DuckDB as
    ('0x' || substr(md5(r || ':' || key), 1, 8))::BIGINT % width."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), col)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cm_heavy_hitter_traces(
    spans: DataFrame,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    top: int = CM_TOP,
) -> DataFrame:
    """Count-min sketch audit (Cormode & Muthukrishnan 2005) for
    heavy-hitter traces: the top-``top`` traces by span count with the
    exact count beside the sketch's estimate — the trust report behind
    serving "which traces are abnormally large" (the reason the
    reference caps trace_many fetches) from a fixed d x w counter grid
    instead of a full per-trace rollup.

    The estimate is min over ``depth`` rows of the row's bucket counter;
    counters are plain integer sums, so the sketch is merge-order
    independent and engine-portable (never a float in the grid).
    CM never undercounts, so ``overcount = cm_est - exact_n >= 0`` by
    construction — a negative value in this column is a sketch bug.

    Columns: trace_id, exact_n, cm_est, overcount.

    Scale (100 TB): the grid partial-aggregates map-side to d*w
    integer cells regardless of corpus size and broadcasts back; the
    exact rollup exists only as this audit's ground truth (the serving
    path reads the grid).  Top-k is a TakeOrdered, never a global sort.
    """
    keyed = spans.select(F.col("trace_id").cast("string").alias("k"))
    # ONE scan: each span emits its depth (row, bucket) cells rowwise.
    hashed = keyed.select(
        F.posexplode(
            F.array(
                *[_cm_bucket(F.col("k"), r, width) for r in range(depth)]
            )
        ).alias("r", "b")
    )
    grid = hashed.groupBy("r", "b").agg(F.count(F.lit(1)).alias("c"))
    exact = keyed.groupBy(F.col("k").alias("trace_id")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    probes = exact.select(
        "trace_id",
        F.posexplode(
            F.array(
                *[
                    _cm_bucket(F.col("trace_id"), r, width)
                    for r in range(depth)
                ]
            )
        ).alias("r", "b"),
    )
    est = (
        probes.join(F.broadcast(grid), ["r", "b"])
        .groupBy("trace_id")
        .agg(F.min("c").alias("cm_est"))
    )
    return (
        exact.join(est, "trace_id")
        .select(
            "trace_id",
            "exact_n",
            "cm_est",
            (F.col("cm_est") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), "trace_id")
        .limit(top)
    )


MICROS_PER_DAY = 86_400_000_000


def hll_merged_rollup(
    spans: DataFrame, lg_k: int = HLL_LG_K, tolerance: float = HLL_TOLERANCE
) -> DataFrame:
    """Day-partial HLL sketches unioned to a per-service estimate — the
    MERGE path of the counters store, under the accuracy gate.

    :func:`hll_distinct_traces` proves the one-pass sketch; this row
    proves the deployment shape the reference's aggregated stores imply
    (spans-to-dependencies style rollups re-served from pre-aggregated
    windows, TraceStorageTopology.java:87-91): ingest writes one sketch
    per (service, day) partition, query time unions the day partials with
    ``hll_union_agg`` and never touches raw trace ids.  At 100 TB the
    union input is |services| x |days| rows of 2^lg_k-byte binaries —
    constant in corpus size — while the exact rescan the audit column
    performs here is exactly what production avoids.

    Day buckets are integer epoch-day arithmetic (``timestamp`` micros //
    day), not calendar dates, so the grouping is timezone-free and
    engine-identical.  The driver-visible contract is the ann_ivf_recall
    gate pattern: exact count + within-``tolerance`` boolean (DuckDB's
    HLL build can never hash-match DataSketches estimates).

    Output: local_service, days, exact_traces, merged_ok (bool).
    """
    day = F.floor(F.col("timestamp") / F.lit(MICROS_PER_DAY))
    daily = spans.groupBy(
        "local_service", day.alias("day_bucket")
    ).agg(F.hll_sketch_agg("trace_id", F.lit(lg_k)).alias("sk"))
    merged = daily.groupBy("local_service").agg(
        F.count("*").alias("days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = spans.groupBy("local_service").agg(
        F.count_distinct("trace_id").alias("exact_traces")
    )
    err = F.abs(F.col("est") - F.col("exact_traces"))
    return merged.join(exact, "local_service").select(
        "local_service",
        "days",
        "exact_traces",
        (err <= F.lit(tolerance) * F.col("exact_traces")).alias("merged_ok"),
    )
