"""Round-9 consolidation guards: the driver-budget prefix contract and
the shared PCA component memoization (VERDICT r08 next-round #2/#5)."""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_first50_prefix_contract():
    """The driver records the FIRST 50 queries() entries.  Pin the
    budget invariants so a refactor can never silently shift them:
    50 unique keys, pinned core disjoint from rotation, every prefix
    key has an oracle (no rows-only slot wastes driver budget), and
    every ROTATION key either has never had a driver row or its LATEST
    driver row is red (re-checking a green row wastes a slot; a red row
    MUST be re-checked to prove the fix).  Artifacts from rounds >=
    ``_ROTATION_ROUND`` are excluded: the rotation's own delivery
    necessarily contains exactly these keys, and asserting against it
    made the suite fail one delivery later by construction (VERDICT r09
    what's-wrong #2)."""
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

    # Driver-delivered files only (CORRECTNESS_r*.json); the local
    # replay artifact is deliberately named so this glob skips it.
    latest: dict[str, bool] = {}
    files = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    for f in files:
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if rnd >= entrymod._ROTATION_ROUND:
            continue
        for k, r in json.load(open(f)).items():
            latest[k] = bool(r.get("hash_match")) or (
                r.get("err") is None
                and r.get("oracle_rows") is None
                and bool(r.get("rows_match"))
            )
    # Era split (VERDICT r12 next-round #1).  Pre-drain: every rotation
    # slot must be a first proof (or a red re-proof).  Post-drain
    # (every registry key has a driver row — true since r12): the whole
    # rotation is re-proof budget and must follow the committed rule —
    # plan-changed rows first (declared, this round's diff), then the
    # registry in oldest-proof-first order, recomputed HERE from the
    # CORRECTNESS files so a hand-edited slate that drifts from the
    # rule fails the suite.
    drained = all(q in latest for q in qs)
    if not drained:
        backfill = set(getattr(entrymod, "_ROTATION_BACKFILL", ()))
        assert backfill <= set(rotation)
        stale = [
            k for k in rotation if latest.get(k, False) and k not in backfill
        ]
        assert not stale, (
            f"rotation keys already driver-GREEN (wasted budget): {stale}"
        )
        if backfill:
            unchecked_outside = [
                q for q in qs if q not in first50 and q not in latest
            ]
            assert not unchecked_outside, (
                "backfill slots used while never-checked keys remain "
                f"outside the prefix: {unchecked_outside[:5]}..."
            )
    else:
        changed = list(entrymod._ROTATION_PLAN_CHANGED)
        assert rotation[: len(changed)] == changed
        assert not set(changed) & set(pinned)
        # newest driver round that recorded each key (files < epoch only)
        newest: dict[str, int] = {}
        for f in files:
            rnd = int(
                re.search(r"r(\d+)", os.path.basename(f)).group(1)
            )
            if rnd >= entrymod._ROTATION_ROUND:
                continue
            for k in json.load(open(f)):
                newest[k] = max(newest.get(k, 0), rnd)
        taken = set(pinned) | set(changed)
        expect_fill = [
            k
            for k, _ in sorted(newest.items(), key=lambda kv: (kv[1], kv[0]))
            if k not in taken
        ][: len(rotation) - len(changed)]
        assert rotation[len(changed):] == expect_fill, (
            "staleness fill diverges from the oldest-proof-first rule:\n"
            f"pinned   {rotation[len(changed):]}\n"
            f"expected {tuple(expect_fill)}"
        )

    # Symmetric guard (VERDICT r10 next-round #6): the exclusion above
    # only works if the epoch was actually bumped when the rotation was
    # re-pinned.  Two states are legal (VERDICT r11 what's-wrong #1 —
    # the strict `== max + 1` went red the moment the round's own
    # artifact landed): at pin time the epoch is one past the newest
    # delivered artifact; after this round's delivery they are equal.
    # Anything else means the bump was forgotten (epoch lagging) or
    # double-applied (epoch more than one ahead).
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in files
    ]
    assert entrymod._ROTATION_ROUND in (max(rounds), max(rounds) + 1), (
        f"_ROTATION_ROUND={entrymod._ROTATION_ROUND} but newest delivered "
        f"driver artifact is r{max(rounds)} — bump the epoch when "
        "re-pinning the rotation"
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
