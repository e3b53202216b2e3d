"""Distributed ntile: exactness vs SQL ntile, approx-mode sanity, and the
plan guarantee (no single-partition window) that motivates the module."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import Window
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.operators.ntile import (
    approx_buckets,
    distributed_ntile,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _unpartitioned_window_lines(plan: str) -> list[str]:
    # A Window node's detail line is "Arguments: [funcs], [partitionSpec],
    # [orderSpec]" — three bracket groups (2 "], [" separators) when
    # partitioned, but only "[funcs], [orderSpec]" (1 separator) when the
    # partition spec is empty (= WindowExec's single-partition warning).
    return [
        l
        for l in plan.splitlines()
        if "windowspecdefinition" in l
        and l.strip().startswith("Arguments:")
        and l.count("], [") < 2
    ]


def test_distributed_ntile_matches_sql_ntile(spark):
    """Bit-exact vs F.ntile over a total order, including the
    remainder-to-early-buckets split (23 rows / 4 buckets -> 6,6,6,5)."""
    rows = [(i, (i * 37) % 100) for i in range(23)]
    df = spark.createDataFrame(rows, "id long, v long")
    w = Window.orderBy("v", "id")
    want = {
        (r["id"]): r["b"]
        for r in df.withColumn("b", F.ntile(4).over(w)).collect()
    }
    got = {
        (r["id"]): r["bucket"]
        for r in distributed_ntile(df, 4, ["v", "id"], n_partitions=5).collect()
    }
    assert got == want
    sizes = sorted(
        (list(got.values()).count(b) for b in set(got.values())), reverse=True
    )
    assert sizes == [6, 6, 6, 5]


def test_distributed_ntile_fewer_rows_than_partitions(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    got = {
        r["id"]: r["bucket"]
        for r in distributed_ntile(df, 2, ["v", "id"], n_partitions=8).collect()
    }
    assert got == {1: 1, 2: 2}


def test_approx_buckets_monotone_and_total(spark):
    """Every row gets a bucket in [1, k]; bucket is monotone in the value."""
    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = approx_buckets(df, 4, "v").collect()
    assert len(out) == 100
    by_v = sorted(((r["v"], r["bucket"]) for r in out))
    assert all(1 <= b <= 4 for _, b in by_v)
    assert all(b1 <= b2 for (_, b1), (_, b2) in zip(by_v, by_v[1:]))
    # with exact quantiles on 100 uniform values the split is near-even
    from collections import Counter

    c = Counter(b for _, b in by_v)
    assert all(15 <= c[b] <= 35 for b in (1, 2, 3, 4))


def test_ntile_queries_have_no_single_partition_window(spark, sf_dir):
    """The two former WindowExec-warning queries must plan with zero
    unpartitioned windows in BOTH modes (the per-range row_number window
    is partitioned by the range id)."""
    from zipkin_storage_kafka_spark.operators.analytics import (
        customer_deciles,
    )
    from zipkin_storage_kafka_spark.operators.text_analysis import (
        length_buckets,
    )
    from zipkin_storage_kafka_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # detector sanity: a genuinely unpartitioned window must be caught
    probe = spark.createDataFrame([(1, 2)], "id long, v long")
    bad = probe.withColumn(
        "b", F.ntile(4).over(Window.orderBy("v", "id"))
    )
    assert _unpartitioned_window_lines(_plan(bad)), "detector is blind"

    for df in (
        length_buckets(docs),
        length_buckets(docs, mode="approx"),
        customer_deciles(spark, sf_dir),
        customer_deciles(spark, sf_dir, mode="approx"),
    ):
        offenders = _unpartitioned_window_lines(_plan(df))
        assert not offenders, offenders


def test_distributed_ntile_remainder_front_loads(spark):
    """n=10, k=4 — the case where the even-spread closed form
    floor((r-1)k/n)+1 diverges from SQL ntile (3,2,3,2 vs 3,3,2,2).
    Pinned against F.ntile directly."""
    from zipkin_storage_kafka_spark.operators.ntile import distributed_ntile

    rows = [(i, (i * 37) % 100) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, v long")
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["b"]
        for r in df.withColumn("b", F.ntile(4).over(w)).collect()
    }
    got = {
        r["id"]: r["bucket"]
        for r in distributed_ntile(df, 4, ["v", "id"]).collect()
    }
    assert got == want


def test_distributed_ntile_matches_sql_ntile_sweep(spark):
    """Exhaustive n x k sweep (n 1..25, k in {2,3,4,7,10}): bucket
    assignment equals F.ntile for EVERY size/bucket combination — no
    arithmetic-coincidence passes."""
    from zipkin_storage_kafka_spark.operators.ntile import distributed_ntile

    for n in range(1, 26):
        rows = [(i, (i * 37) % 100) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v long")
        w = Window.orderBy("v", "id")
        want = {
            r["id"]: r["b"]
            for r in df.withColumn("b", F.ntile(7).over(w)).collect()
        }
        got = {
            r["id"]: r["bucket"]
            for r in distributed_ntile(df, 7, ["v", "id"]).collect()
        }
        assert got == want, f"n={n}"


def test_offsets_flavors_agree(spark):
    """The collect-offsets default and the lazy join-offsets flavor
    produce identical buckets and ranks (the r14 job-count cut must be
    value-invisible), including the empty-frame edge."""
    from zipkin_storage_kafka_spark.operators.ntile import (
        distributed_ntile,
        distributed_rank,
    )

    rows = [(i, (i * 37) % 100) for i in range(23)]
    df = spark.createDataFrame(rows, "id long, v long")
    a = {
        r["id"]: r["bucket"]
        for r in distributed_ntile(
            df, 4, ["v", "id"], n_partitions=5, offsets="collect"
        ).collect()
    }
    b = {
        r["id"]: r["bucket"]
        for r in distributed_ntile(
            df, 4, ["v", "id"], n_partitions=5, offsets="join"
        ).collect()
    }
    assert a == b
    ra = {
        r["id"]: r["_grank"]
        for r in distributed_rank(
            df, ["v", "id"], n_partitions=5, offsets="collect"
        ).collect()
    }
    rb = {
        r["id"]: r["_grank"]
        for r in distributed_rank(
            df, ["v", "id"], n_partitions=5, offsets="join"
        ).collect()
    }
    assert ra == rb
    empty = spark.createDataFrame([], "id long, v long")
    assert distributed_ntile(empty, 4, ["v", "id"]).collect() == []
    assert distributed_rank(empty, ["v", "id"]).collect() == []
