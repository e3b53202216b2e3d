"""Round-9 consolidation guards: the driver-budget prefix contract and
the shared PCA component memoization (VERDICT r08 next-round #2/#5)."""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_first50_prefix_contract():
    """The driver records the FIRST 50 queries() entries.  Pin the
    budget invariants so a refactor can never silently shift them:
    50 unique keys, pinned core disjoint from rotation, every prefix
    key has an oracle (no rows-only slot wastes driver budget), and
    every ROTATION key is first-time (never in a recorded driver
    CORRECTNESS file — re-checking a green row wastes a slot)."""
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    first50 = qs[:50]
    assert len(first50) == 50
    assert len(set(first50)) == 50
    pinned = list(entrymod._PINNED_ZIPKIN_CORE)
    rotation = list(entrymod._ROTATION)
    assert first50 == pinned + rotation
    assert not set(pinned) & set(rotation)
    assert all(k in oracles for k in first50)

    checked: set[str] = set()
    # Driver-delivered files only (CORRECTNESS_r*.json); the local
    # replay artifact is deliberately named so this glob skips it.
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        checked |= set(json.load(open(f)))
    stale = [k for k in rotation if k in checked]
    assert not stale, (
        f"rotation keys already driver-checked (wasted budget): {stale}"
    )


def test_pca_explained_uses_precomputed_component(spark):
    """pca_explained must read lambda_hat off the supplied component
    relation instead of re-running the power sweeps — feed a sentinel
    lambda and require it in the output."""
    from zipkin_storage_kafka_spark.operators.similarity import pca_explained

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 2.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    sentinel = spark.createDataFrame(
        [(1, 0.5, 123.4567)], "i int, pc double, lambda_hat double"
    )
    row = pca_explained(emb, component=sentinel).collect()[0]
    assert row["lambda_hat"] == 123.4567


def test_registry_pca_rows_share_one_component(spark, sf_dir):
    """The registry's emb_pca_power row and the lambda_hat inside
    emb_pca_explained must come from the SAME materialized relation."""
    from zipkin_storage_kafka_spark.plans import registry_pipeline as rp

    comp = rp._pca_component(spark, sf_dir)
    lam = comp.select("lambda_hat").head()["lambda_hat"]
    power_rows = rp.q_emb_pca_power(spark, sf_dir).collect()
    assert all(r["lambda_hat"] == lam for r in power_rows)
    explained = rp.q_emb_pca_explained(spark, sf_dir).collect()[0]
    assert explained["lambda_hat"] == lam
