"""k-means training loop (IVF coarse quantizer) — convergence + invariants.

The single-round math is oracle-checked through the ``emb_kmeans_step``
registry entry; these tests pin the fixpoint loop the oracle can't express.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from zipkin_storage_kafka_spark.operators.similarity import (
    kmeans_fit,
    kmeans_step,
)
from zipkin_storage_kafka_spark.sources.tables import load_table

K = 4


def test_kmeans_fit_converges_and_partitions(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    total = emb.count()
    cent = kmeans_fit(emb, k=K, max_iters=30)
    rows = cent.collect()
    assert len(rows) == K
    assert sum(r.n_members for r in rows) == total
    assert all(len(r.c) == 64 for r in rows)
    # every centroid is finite and inside the data's coordinate range
    lo, hi = emb.select(
        F.min(F.array_min("embedding")), F.max(F.array_max("embedding"))
    ).first()
    assert all(lo <= x <= hi for r in rows for x in r.c)


def test_kmeans_fit_is_a_fixpoint_of_step(spark, sf_dir):
    """After convergence, re-running one assignment round against the
    fitted centroids reproduces the same cluster sizes."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent = kmeans_fit(emb, k=K, max_iters=30)
    fitted_sizes = {
        r.seed_id: r.n_members for r in cent.collect()
    }

    # one more Lloyd round by hand against the fitted centroids
    from zipkin_storage_kafka_spark.operators.similarity import (
        _as_double,
        _dot,
    )
    from zipkin_storage_kafka_spark.functions.portable import round4
    from pyspark.sql import Window

    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    d2 = round4(
        _dot(F.col("v"), F.col("v"))
        - F.lit(2.0) * _dot(F.col("v"), F.col("c"))
        + _dot(F.col("c"), F.col("c"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("d2").asc(), F.col("seed_id").asc()
    )
    sizes = {
        r.seed_id: r.n
        for r in (
            e.crossJoin(F.broadcast(cent.select("seed_id", "c")))
            .select("vec_id", "seed_id", d2.alias("d2"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .groupBy("seed_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert sizes == fitted_sizes


def test_kmeans_step_matches_first_fit_round(spark, sf_dir):
    """kmeans_step (the oracle-checked single round) agrees with the first
    round of the fit loop on cluster sizes."""
    emb = load_table(spark, sf_dir, "embeddings")
    step_sizes = {
        r.seed_id: r.n_members
        for r in kmeans_step(emb, k=K)
        .select("seed_id", "n_members")
        .distinct()
        .collect()
    }
    one_round = kmeans_fit(emb, k=K, max_iters=1)
    fit_sizes = {r.seed_id: r.n_members for r in one_round.collect()}
    assert step_sizes == fit_sizes
