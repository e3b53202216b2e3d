"""Hand-computed fixtures for the corpus-assembly operators added after
round 4's rotation: semantic dedup (SemDeDup), native-HLL cardinality,
per-source quota sampling, and the deterministic global shuffle.  Each test
pins a semantic decision the DuckDB oracle alone could rubber-stamp (the
round-2 lesson: both engines can agree while both no-op)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.operators import text_analysis as ta
from zipkin_storage_kafka_spark.operators.similarity import semantic_dedup


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v], label=lbl)
         for i, v, lbl in rows],
        "vec_id bigint, embedding array<float>, label int",
    )


def _assign_df(spark, pairs):
    return spark.createDataFrame(
        [Row(vec_id=i, label=c) for i, c in pairs],
        "vec_id bigint, label int",
    )


def test_semantic_dedup_cell_bounded(spark):
    """Identical vectors in the SAME cell dedup (higher id dropped);
    the identical vector in ANOTHER cell survives — the cell equi-join
    bounds the candidate space by construction, so cross-cell twins are
    out of scope (SemDeDup's deliberate approximation)."""
    emb = _emb_df(
        spark,
        [(1, [1, 0], 0), (2, [1, 0], 0), (3, [0, 1], 0), (4, [1, 0], 1)],
    )
    assign = _assign_df(spark, [(1, 0), (2, 0), (3, 0), (4, 1)])
    # centroids unused when assign is given, but required non-None
    centroids = spark.createDataFrame(
        [Row(label=0, centroid=[1.0, 0.0]), Row(label=1, centroid=[1.0, 0.0])]
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            emb, centroids=centroids, assign=assign, threshold=0.9
        ).collect()
    }
    assert out == {1: True, 2: False, 3: True, 4: True}


def test_semantic_dedup_greedy_uses_dropped_neighbors(spark):
    """The id-ordered greedy drops a vector when ANY lower-id same-cell
    neighbor is above threshold — including neighbors that were
    themselves dropped.  Chain a~b, b~c with a!~c: b drops against a,
    then c drops against b (even though b is gone), leaving only a."""
    emb = _emb_df(
        spark,
        [(1, [1.0, 0.0], 0), (2, [0.8, 0.6], 0), (3, [0.28, 0.96], 0)],
    )
    assign = _assign_df(spark, [(1, 0), (2, 0), (3, 0)])
    centroids = spark.createDataFrame([Row(label=0, centroid=[1.0, 0.0])])
    # cos(1,2)=0.8, cos(2,3)=0.8, cos(1,3)=0.28
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            emb, centroids=centroids, assign=assign, threshold=0.8
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False}


def test_hll_sketches_merge(spark):
    """DataSketches HLL binaries are mergeable: per-split sketches union
    into a whole-input estimate no matter how the splits are grouped —
    the property that lets a counters store pre-aggregate per-partition
    sketches and union at query time instead of re-shuffling raw ids.
    The guarantee is BOUNDED ERROR, not bit identity: each union step may
    promote sparse coupon sketches to the dense HLL array (and a
    re-serialized union re-unioned shifts again), so one-pass / one-stage
    / two-stage estimates differ by ulps of the estimator but all stay
    within the lgK=14 ~0.8% RSE of the exact count — which is what the
    hll_ok accuracy gate in hll_distinct_traces asserts in production."""
    df = spark.range(0, 2000).select(
        F.col("id").cast("string").alias("v"),
        (F.col("id") % 4).alias("split"),
    )
    whole = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(14))).alias("est")
    ).collect()[0]["est"]
    parts = df.groupBy("split").agg(
        F.hll_sketch_agg("v", F.lit(14)).alias("sk")
    )
    merged = parts.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    # associativity: union the same sketches in two stages -> same estimate
    staged = (
        parts.groupBy((F.col("split") % 2).alias("half"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    for est in (whole, merged, staged):
        assert abs(est - 2000) <= 0.03 * 2000
    assert abs(merged - whole) <= 0.01 * 2000
    assert abs(staged - merged) <= 0.01 * 2000


def test_quota_sample_keeps_per_source_best(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ta.quota_sample(docs, per_source=10)
    pdf = out.toPandas()
    # exactly min(10, n_source) survivors per source, ranks 1..k
    sizes = pdf.groupby("source")["rk"].agg(["size", "max", "min"])
    assert (sizes["size"] <= 10).all()
    assert (sizes["min"] == 1).all()
    assert (sizes["max"] == sizes["size"]).all()
    # survivors are the top-k by (quality desc, doc_id) per source
    q = (
        ta.quality_score(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .toPandas()
        .sort_values(["source", "quality", "doc_id"],
                     ascending=[True, False, True])
    )
    expect = set(
        q.groupby("source").head(10)["doc_id"].tolist()
    )
    assert set(pdf["doc_id"].tolist()) == expect


def test_global_shuffle_deterministic_and_seed_sensitive(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = ta.global_shuffle(docs, seed=42).toPandas()
    b = ta.global_shuffle(docs, seed=42).toPandas()
    c = ta.global_shuffle(docs, seed=43).toPandas()
    key = ["shard", "position", "doc_id", "sort_key"]
    assert a.sort_values(key).values.tolist() == b.sort_values(key).values.tolist()
    # a different seed permutes: at least one doc changes (shard, position)
    ja = a.set_index("doc_id")[["shard", "position"]]
    jc = c.set_index("doc_id")[["shard", "position"]]
    assert (ja != jc.loc[ja.index]).any().any()
    # every row appears exactly once; positions are 1..n contiguous per shard
    assert a["doc_id"].is_unique and len(a) == docs.count()
    for _, grp in a.groupby("shard"):
        assert sorted(grp["position"].tolist()) == list(
            range(1, len(grp) + 1)
        )
    # shard is the first nibble of the sort key
    assert (
        a["shard"] == a["sort_key"].str[0].apply(lambda h: int(h, 16))
    ).all()


def test_semantic_dedup_diverse_keeps_centroid_outlier(spark):
    """The diverse policy keeps the member LESS similar to its centroid —
    the opposite survivor from min_id on the same pair — and the greedy
    priority is the centroid distance, not the id."""
    emb = _emb_df(spark, [(1, [1.0, 0.0], 0), (2, [0.8, 0.6], 0)])
    assign = _assign_df(spark, [(1, 0), (2, 0)])
    centroids = spark.createDataFrame([Row(label=0, centroid=[1.0, 0.0])])
    # cos(v1,v2)=0.8; centroid cosines: v1 -> 1.0 (close), v2 -> 0.8 (far)
    kw = dict(centroids=centroids, assign=assign, threshold=0.8)
    min_id = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(emb, policy="min_id", **kw).collect()
    }
    diverse = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(emb, policy="diverse", **kw).collect()
    }
    assert min_id == {1: True, 2: False}
    assert diverse == {1: False, 2: True}


def test_semantic_dedup_policies_differ_on_corpus(spark, sf_dir):
    """Both policies cover the same vector universe, but on the real
    corpus at least one vector gets a different keep decision — the
    diverse flavor is not vacuously identical to min_id."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    a = {
        r["vec_id"]: r["keep"]
        for r in qs["dedup_semantic"](spark, sf_dir).collect()
    }
    b = {
        r["vec_id"]: r["keep"]
        for r in qs["dedup_semantic_diverse"](spark, sf_dir).collect()
    }
    assert set(a) == set(b)
    assert any(a[v] != b[v] for v in a)


def test_global_shuffle_wide_prefix_sharding(spark, sf_dir):
    """256-shard mode widens the hex prefix without changing the sort
    key: shard = int(first 2 hex chars, 16), still deterministic, and a
    non-power-of-16 request fails loudly."""
    import pytest as _pytest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = ta.global_shuffle(docs, n_shards=256).toPandas()
    assert (
        a["shard"] == a["sort_key"].str[:2].apply(lambda h: int(h, 16))
    ).all()
    # the key is shard-count independent: same seed -> same sort_key
    b = ta.global_shuffle(docs).toPandas()
    assert dict(zip(a["doc_id"], a["sort_key"])) == dict(
        zip(b["doc_id"], b["sort_key"])
    )
    with _pytest.raises(ValueError):
        ta.global_shuffle(docs, n_shards=10)


def test_alignment_audit_hand_fixture(spark):
    """All three statuses pinned by hand (the raw testdata is fully
    aligned at the driver's sf0.01 gate, where this audit degenerates to
    one 'aligned' row — at sf0.1 doc_only appears; orphan vec rows only
    here)."""
    from zipkin_storage_kafka_spark.operators.corpus import alignment_audit

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    emb = spark.createDataFrame(
        [(2, [0.0]), (3, [0.0]), (9, [0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["status"]: (r["n"], r["min_id"], r["max_id"])
        for r in alignment_audit(docs, emb).collect()
    }
    assert out == {
        "aligned": (2, 2, 3),
        "doc_only": (1, 1, 1),
        "vec_only": (1, 9, 9),
    }


def test_corpus_diff_hand_fixture(spark):
    """added/removed/changed/unchanged pinned by hand, including a
    same-id text rewrite (changed) and an id collision-free re-add."""
    from zipkin_storage_kafka_spark.operators.corpus import corpus_diff

    old = spark.createDataFrame(
        [(1, "keep"), (2, "edit me"), (3, "drop me")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "keep"), (2, "edited"), (4, "brand new")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_curriculum_order_phases_by_quality(spark, sf_dir):
    """Phase 1 holds the top-quality quartile: every phase-1 doc has
    quality >= every phase-4 doc, phases are balanced (exact ntile), and
    within-phase order is the seeded shuffle key, not quality."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pdf = ta.curriculum_order(docs).toPandas()
    n = len(pdf)
    sizes = pdf.groupby("phase").size()
    assert sorted(sizes.index) == [1, 2, 3, 4]
    assert sizes.max() - sizes.min() <= 1  # exact ntile balance
    assert sizes.sum() == n
    assert pdf[pdf.phase == 1]["quality"].min() >= pdf[
        pdf.phase == 4
    ]["quality"].max()
    # within a phase the order is the md5 key: positions are NOT sorted
    # by quality (the shuffle is real)
    p1 = pdf[pdf.phase == 1].sort_values("position")
    assert not p1["quality"].is_monotonic_decreasing


def test_corpus_diff_null_text_is_presence_not_absence(spark):
    """A doc PRESENT with NULL text must diff as changed/unchanged, never
    as added/removed — presence is tracked by markers, not md5 nullness."""
    from zipkin_storage_kafka_spark.operators.corpus import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "now set"), (2, None), (3, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert out == {1: "changed", 2: "unchanged", 3: "changed"}


def test_covariance_matrix_matches_numpy(spark):
    """The distributed covariance equals numpy's population covariance on
    a hand fixture — an INDEPENDENT implementation, not the SQL mirror
    (diagonal = variance, off-diagonal symmetric pairs, round4)."""
    import numpy as np

    from zipkin_storage_kafka_spark.operators.similarity import (
        covariance_matrix,
    )

    rng = np.random.default_rng(7)
    data = rng.normal(size=(50, 5)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["di"], r["dj"]): r["cov"]
        for r in covariance_matrix(emb).collect()
    }
    want = np.cov(data.astype(np.float64).T, bias=True)
    assert len(got) == 5 * 6 // 2
    for (di, dj), c in got.items():
        assert abs(c - want[di - 1, dj - 1]) <= 1e-4, (di, dj)


def test_covariance_matrix_flavors_agree(spark, sf_dir):
    """The r14 arrow flavor (per-task Gram partials via one X.T @ X per
    batch) must reproduce the expr flavor's rows exactly at round4 — on
    the real corpus AND on a ragged fixture with null embedding rows
    (per-length accumulation must match the rowwise stream's per-key
    counts; null ROWS are skipped by both)."""
    import pytest as _pytest

    from zipkin_storage_kafka_spark.operators.similarity import (
        covariance_matrix,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for source in (
        emb,
        spark.createDataFrame(
            [
                (1, [1.0, 2.0, 3.0]),
                (2, [4.0, 0.5]),
                (3, None),
                (4, [0.25, -1.0, 7.0]),
                (5, [2.0]),
            ],
            "vec_id long, embedding array<float>",
        ),
    ):
        got = {
            fl: {
                tuple(r)
                for r in covariance_matrix(source, flavor=fl).collect()
            }
            for fl in ("expr", "arrow")
        }
        assert got["expr"] == got["arrow"]
        assert got["arrow"]  # non-vacuous
    # A null ELEMENT inside a vector is a data-quality error: the arrow
    # kernel fails loudly (ADVICE r13 contract) instead of reproducing
    # the expr flavor's silent null-skip arithmetic.
    bad = spark.createDataFrame(
        [(1, [1.0, None, 3.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(Exception, match="null element"):
        covariance_matrix(bad, flavor="arrow").collect()


def test_semantic_dedup_arrow_equals_sql(spark, sf_dir):
    """The vectorized (gram-matrix) flavor makes EXACTLY the same keep
    decisions as the expression flavor — on the real corpus and on the
    hand fixtures (same cells, same round4 threshold, same greedy)."""
    import __spark_entry__ as entrymod
    from zipkin_storage_kafka_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_arrow,
    )
    from zipkin_storage_kafka_spark.plans.registry_pipeline import _ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, assign = _ivf_index(spark, sf_dir)
    sql_keep = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            emb, centroids=cents, assign=assign
        ).collect()
    }
    arrow_keep = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_arrow(
            emb, centroids=cents, assign=assign
        ).collect()
    }
    assert sql_keep == arrow_keep

    # hand fixture: chain greedy (b drops vs a, c drops vs dropped b)
    fixture = _emb_df(
        spark,
        [(1, [1.0, 0.0], 0), (2, [0.8, 0.6], 0), (3, [0.28, 0.96], 0)],
    )
    fx_assign = _assign_df(spark, [(1, 0), (2, 0), (3, 0)])
    fx_cents = spark.createDataFrame([Row(label=0, centroid=[1.0, 0.0])])
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_arrow(
            fixture, centroids=fx_cents, assign=fx_assign, threshold=0.8
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False}


def test_encode_ids_rank_and_oov_fixture(spark):
    """Hand fixture for the vocab rank (count desc, token asc, 1-based)
    and OOV->0 encoding: 'b' (3 uses) outranks 'a' (2) outranks 'c'/'d'
    (1 each, alpha tie-break), and with vocab_size=3 'd' is OOV."""
    from zipkin_storage_kafka_spark.operators.text_analysis import (
        encode_token_ids,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="b a b"), Row(doc_id=2, text="a b c d")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["ids_hash"])
        for r in encode_token_ids(docs, vocab_size=3).collect()
    }
    import hashlib

    # vocab: b->1, a->2, c->3; d OOV
    assert out[1] == (
        3, 0, hashlib.md5(b"1,2,1").hexdigest()
    )
    assert out[2] == (
        4, 1, hashlib.md5(b"2,1,3,0").hexdigest()
    )


def test_semantic_dedup_arrow_diverse_equals_sql(spark, sf_dir):
    """The gram-matrix kernel under policy="diverse" (sort the cell by
    the Spark-side round6 centroid cosine, then the same triangle) makes
    EXACTLY the expression flavor's keep decisions on the real corpus,
    and reproduces the opposite-survivor and dropped-dropper fixtures."""
    from zipkin_storage_kafka_spark.operators.similarity import (
        semantic_dedup_arrow,
    )
    from zipkin_storage_kafka_spark.plans.registry_pipeline import _ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, assign = _ivf_index(spark, sf_dir)
    kw = dict(centroids=cents, assign=assign, policy="diverse")
    sql_keep = {
        r["vec_id"]: r["keep"] for r in semantic_dedup(emb, **kw).collect()
    }
    arrow_keep = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_arrow(emb, **kw).collect()
    }
    assert sql_keep == arrow_keep

    # opposite-survivor fixture (same as the expression-flavor pin): the
    # centroid outlier v2 wins under diverse even though v1 has the
    # lower id.
    pair = _emb_df(spark, [(1, [1.0, 0.0], 0), (2, [0.8, 0.6], 0)])
    fx = dict(
        centroids=spark.createDataFrame(
            [Row(label=0, centroid=[1.0, 0.0])]
        ),
        assign=_assign_df(spark, [(1, 0), (2, 0)]),
        threshold=0.8,
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_arrow(pair, policy="diverse", **fx).collect()
    }
    assert out == {1: False, 2: True}

    # chain fixture under diverse priority: centroid cosines order the
    # chain v3 (0.28) -> v2 (0.8) -> v1 (1.0); v3 survives as the
    # outlier, drops v2 (cos .8), and the DROPPED v2 still drops v1
    # (cos .8) — the documented non-sequential rule, arrow flavor.
    chain = _emb_df(
        spark,
        [(1, [1.0, 0.0], 0), (2, [0.8, 0.6], 0), (3, [0.28, 0.96], 0)],
    )
    fx["assign"] = _assign_df(spark, [(1, 0), (2, 0), (3, 0)])
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_arrow(
            chain, policy="diverse", **fx
        ).collect()
    }
    assert out == {1: False, 2: False, 3: True}


def test_diverse_priority_scored_assign_equals_rederived(spark, sf_dir):
    """The r12 priority reuse: a scored assignment (ivf_assignments
    with_score=True — what the registry materializes) must yield
    IDENTICAL diverse keep decisions to the fallback path that
    re-derives the centroid cosine per row, in BOTH flavors, and the
    scored relation's s must equal the re-derived round6 value."""
    from zipkin_storage_kafka_spark.operators.similarity import (
        ivf_assignments,
        ivf_centroids,
        semantic_dedup_arrow,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(emb)
    plain = ivf_assignments(emb, cents)
    scored = ivf_assignments(emb, cents, with_score=True)
    assert scored.columns == ["vec_id", "label", "__ivf_s"]
    assert plain.columns == ["vec_id", "label"]

    for fn in (semantic_dedup, semantic_dedup_arrow):
        ref = {
            r["vec_id"]: r["keep"]
            for r in fn(
                emb, centroids=cents, assign=plain, policy="diverse"
            ).collect()
        }
        got = {
            r["vec_id"]: r["keep"]
            for r in fn(
                emb, centroids=cents, assign=scored, policy="diverse"
            ).collect()
        }
        assert got == ref, fn.__name__

    # min_id with a scored assign must also be unaffected (s dropped).
    ref = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_arrow(
            emb, centroids=cents, assign=plain, policy="min_id"
        ).collect()
    }
    got = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_arrow(
            emb, centroids=cents, assign=scored, policy="min_id"
        ).collect()
    }
    assert got == ref


def test_centroid_outliers_scored_assign_equals_rederived(spark, sf_dir):
    """centroid_outliers with a scored assignment must yield exactly the
    re-derivation path's rows — same cosines, same flags (the scored s
    IS the same relation row the own-cell join would pick)."""
    from zipkin_storage_kafka_spark.operators.similarity import (
        centroid_outliers,
        ivf_assignments,
        ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(emb)
    ref = {
        r["vec_id"]: (r["cell"], r["centroid_cos"], r["is_outlier"])
        for r in centroid_outliers(
            emb, centroids=cents, assign=ivf_assignments(emb, cents)
        ).collect()
    }
    got = {
        r["vec_id"]: (r["cell"], r["centroid_cos"], r["is_outlier"])
        for r in centroid_outliers(
            emb,
            centroids=cents,
            assign=ivf_assignments(emb, cents, with_score=True),
        ).collect()
    }
    assert got == ref
