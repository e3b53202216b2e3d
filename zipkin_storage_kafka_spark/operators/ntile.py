"""Distributed ntile: exact SQL ``ntile(k)`` semantics without the
single-partition window.

``Window.orderBy(...)`` with no partition spec moves EVERY row to one task
(Spark's ``WindowExec: No Partition Defined`` warning) — one row per
document or customer is still billions of rows in one task at 100 TB.  The
reference never ranks globally (Kafka Streams has no total-order
operator); this module is part of the engine's beyond-the-reference
analytics surface, built scale-first.

Two flavors:

``distributed_ntile``
    BIT-EXACT ``ntile(k)`` over a total order, as a two-level rank:

    1. ``repartitionByRange`` on the total-order key — the range exchange
       samples boundaries, so partition p holds a contiguous key slice.
       The frame is locally checkpointed ONCE so the two consumers below
       read the same materialized partitioning (a recomputed range
       exchange may re-sample different boundaries).
    2. per-partition ``row_number`` (window PARTITIONED by the range id —
       parallel) + per-partition row counts attached as offsets.  The
       default ``offsets="collect"`` flavor collects the <= n_partitions
       count rows (cluster-bounded, never data-bounded — the one collect
       class SCALE.md allows) and inlines the prefix sums as a literal
       map: ONE job materializes the checkpointed range partitioning and
       the offsets together, where the lazy ``offsets="join"`` flavor
       spends three (counts agg, triangular self-join, total agg) plus
       two broadcast builds.  Both flavors emit zero single-partition
       window stages; equivalence is test-pinned.
    3. piecewise front-loaded-remainder formula: with 1-based global rank
       ``r = _off + _rn`` and n total rows, the first ``n mod k`` buckets
       hold ``ceil(n/k)`` rows and the rest ``floor(n/k)`` — computed by
       the three-case integer expression in :func:`distributed_ntile`
       (uniform case, inside-the-front-loaded-span case, after-it case).
       The simpler closed form ``(r*k) div n + 1`` spreads the remainder
       evenly instead and does NOT match SQL ntile; see the inline
       comment for the n=10, k=4 counterexample.

    Cost: one range shuffle + one broadcast join — same order as the sort
    any exact quantile needs, but parallel end to end.

``approx_buckets``
    The no-total-order flavor: one ``percentile_approx`` aggregation
    yields k-1 boundary values (a one-row broadcast), bucket = 1 + #
    boundaries below the value.  No shuffle of the data at all beyond the
    aggregation's partial+final pass; edges are approximate (sketch
    accuracy), which a curriculum/LTV banding tolerates at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _collected_offsets(ranged: DataFrame) -> tuple[Column, int] | None:
    """Materialize the checkpointed range partitioning and read back the
    per-partition row counts in ONE job (<= n_partitions rows — bounded
    by cluster parallelism, never by data volume).  Returns the literal
    offset-lookup column keyed by ``_pid`` plus the total row count, or
    ``None`` for an empty frame."""
    rows = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
    if not rows:
        return None
    counts = {r["_pid"]: r["_c"] for r in rows}
    acc = 0
    items: list[Column] = []
    for pid in sorted(counts):
        items.append(F.lit(pid))
        items.append(F.lit(acc))
        acc += counts[pid]
    return F.create_map(*items), acc


def distributed_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list[str],
    bucket_col: str = "bucket",
    n_partitions: int | None = None,
    offsets: str = "collect",
) -> DataFrame:
    """Append ``bucket_col`` = exact ntile(``n_buckets``) over the total
    order ``order_cols`` (must be a UNIQUE key combination — ties would
    make the global rank, and thus bucket edges, nondeterministic).

    ``offsets="collect"`` (default) inlines the per-partition offsets
    from one bounded collect; ``offsets="join"`` keeps the plan fully
    lazy (broadcast triangular-join offsets) for callers that must not
    trigger a job at plan-build time.  Identical output (test-pinned).
    """
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    # repartitionByRange SAMPLES its child with a separate collect job
    # before the shuffle runs the child again (RangePartitioner.sketch)
    # — for a derived input (an aggregation over the corpus) that is a
    # full extra pass (guide 2.4: remove shuffles/passes outright).
    # Truncating the input first means: sample job materializes the
    # KB..MB-scale pre-ntile relation once, the range shuffle reads the
    # same blocks.  r14 A/B (same-session interleaved, sf0.1):
    # w_revenue_pareto and ev_rfm_scores below.
    df = df.localCheckpoint(eager=False)
    ranged = (
        df.repartitionByRange(n_partitions, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    if offsets == "collect":
        collected = _collected_offsets(ranged)
        if collected is None:
            return ranged.withColumn(
                bucket_col, F.lit(None).cast("int")
            ).drop("_pid")
        offmap, n_total = collected
        k = int(n_buckets)
        ranked = (
            ranged.withColumn("_rn", F.row_number().over(w_local))
            .withColumn("_off", offmap[F.col("_pid")])
            .withColumn("_n", F.lit(n_total))
        )
        return (
            ranked.withColumn(bucket_col, _ntile_bucket(k).cast("int"))
            .drop("_pid", "_rn", "_off", "_n")
        )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    # offsets: triangular join over <= n_partitions rows (no window)
    a, b = counts.alias("a"), counts.alias("b")
    offsets_df = (
        a.join(b, F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"), F.col("a._c").alias("_c"))
        .agg(F.coalesce(F.sum("b._c"), F.lit(0)).alias("_off"))
        .select("_pid", "_off")
    )
    total = counts.agg(F.sum("_c").alias("_n"))
    k = int(n_buckets)
    return (
        ranged.withColumn("_rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets_df), "_pid")
        .crossJoin(F.broadcast(total))
        .withColumn(bucket_col, _ntile_bucket(k).cast("int"))
        .drop("_pid", "_rn", "_off", "_n")
    )


def _ntile_bucket(k: int) -> Column:
    # SQL ntile(k) front-loads the remainder: the first (n mod k) buckets
    # get ceil(n/k) rows, the rest floor(n/k).  The tempting closed form
    # floor((r-1)*k/n)+1 spreads the remainder EVENLY instead (e.g. n=10,
    # k=4: sizes 3,2,3,2 vs SQL's 3,3,2,2) and only coincides when the
    # remainder happens to front-load — so the piecewise form below is
    # required for bit-exact parity with engine ntile()/DuckDB ntile().
    # Evaluated against columns `_off`, `_rn`, `_n` (literal or joined).
    return F.expr(
        f"CASE WHEN _n % {k} = 0 THEN"
        f"  ((_off + _rn - 1) div (_n div {k})) + 1 "
        f"WHEN (_off + _rn) <= ((_n div {k}) + 1) * (_n % {k}) THEN"
        f"  ((_off + _rn - 1) div ((_n div {k}) + 1)) + 1 "
        f"ELSE"
        f"  (_n % {k}) + ((_off + _rn"
        f"    - ((_n div {k}) + 1) * (_n % {k}) - 1) div (_n div {k})) + 1 "
        f"END"
    )


def distributed_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "_grank",
    n_partitions: int | None = None,
    offsets: str = "collect",
) -> DataFrame:
    """Append ``rank_col`` = exact 1-based global ``row_number()`` over
    the total order ``order_cols`` (must be a UNIQUE key combination),
    via the same two-level shape as :func:`distributed_ntile`: range
    exchange -> per-partition row_number (window partitioned by the
    range id, parallel) -> partition-count offsets (collected literal
    map by default, broadcast triangular join under
    ``offsets="join"``).  Zero single-partition window stages.

    The range-partitioned frame is lazily checkpointed so the rank path
    and the count/offset path read ONE materialized partitioning — a
    recomputed range exchange may re-sample different boundaries
    (KB-scale blocks: #partitions counts; the data partitions
    themselves are the same mass any global sort holds).
    """
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    # same input truncation as distributed_ntile: one materialization
    # instead of sample-pass + shuffle-pass over the derived input
    df = df.localCheckpoint(eager=False)
    ranged = (
        df.repartitionByRange(n_partitions, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    if offsets == "collect":
        collected = _collected_offsets(ranged)
        if collected is None:
            return ranged.withColumn(
                rank_col, F.lit(None).cast("long")
            ).drop("_pid")
        offmap, _ = collected
        return (
            ranged.withColumn("_rn", F.row_number().over(w_local))
            .withColumn("_off", offmap[F.col("_pid")])
            .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("long"))
            .drop("_pid", "_rn", "_off")
        )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets_df = (
        a.join(b, F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"), F.col("a._c").alias("_c"))
        .agg(F.coalesce(F.sum("b._c"), F.lit(0)).alias("_off"))
        .select("_pid", "_off")
    )
    return (
        ranged.withColumn("_rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets_df), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def approx_buckets(
    df: DataFrame,
    n_buckets: int,
    value_col: str | Column,
    bucket_col: str = "bucket",
    accuracy: int = 10_000,
) -> DataFrame:
    """Append ``bucket_col`` from approx-quantile boundaries: bucket =
    1 + count of boundaries strictly below the value.  Boundary rows can
    land either side of their edge (sketch error + ties share a bucket),
    so bucket POPULATIONS are approximate; values are never moved across
    more than the sketch error.
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.percentile_approx(
            val.cast("double"), F.array(*[F.lit(p) for p in probs]),
            F.lit(accuracy),
        ).alias("_bounds")
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            bucket_col,
            (
                F.lit(1)
                + F.aggregate(
                    "_bounds",
                    F.lit(0),
                    lambda acc, bnd: acc
                    + F.when(val.cast("double") > bnd, 1).otherwise(0),
                )
            ).cast("int"),
        )
        .drop("_bounds")
    )
