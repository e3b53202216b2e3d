"""Hand-computed fixtures for the round-5 operators: SLO burn-rate
alerting, Gopher quality rules, n-gram novelty attribution, the SemDeDup
retention curve, and PQ asymmetric-distance search.  Each pins a semantic
decision the DuckDB oracle alone could rubber-stamp (both engines agreeing
while both no-op is the round-2 failure mode these exist to rule out)."""

from __future__ import annotations

from pyspark.sql import Row

from zipkin_storage_kafka_spark.operators.indexes import slo_burn_rate
from zipkin_storage_kafka_spark.operators.text_analysis import (
    gopher_rules,
    ngram_novelty,
)


def _spans_df(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                local_service=svc,
                timestamp=widx * 60_000_000 + off,
                is_error=err,
            )
            for svc, widx, off, err in rows
        ],
        "local_service string, timestamp long, is_error boolean",
    )


def test_slo_burn_dual_window_alerting(spark):
    """The page flag needs BOTH windows burning: a short spike against a
    long clean history must NOT alert; sustained errors must; and the
    RANGE frame must skip value-gaps (an isolated window 8 windows after
    the last traffic sees only itself in its long frame)."""
    rows = []
    # widx 0: 10 clean spans; widx 1: 10 spans all errors (sustained
    # enough that the 2-window long frame also burns)
    rows += [("a", 0, i, False) for i in range(10)]
    rows += [("a", 1, i, True) for i in range(10)]
    # widx 10: isolated errored window after a gap — long frame covers
    # widx 6..10 = only itself, so it pages
    rows += [("a", 10, 0, True)]
    # service b: 4 big clean windows then a small spike — short burns
    # (100 >= 14.4) but the long frame dilutes it (~0.25), so NO page
    rows += [("b", w, i, False) for w in range(4) for i in range(1000)]
    rows += [("b", 4, i, i == 0) for i in range(10)]
    out = {
        (r["local_service"], r["window_start_ms"] // 60000): (
            r["short_burn"],
            r["long_burn"],
            r["alert"],
        )
        for r in slo_burn_rate(_spans_df(spark, rows)).collect()
    }
    assert out[("a", 0)] == (0.0, 0.0, False)
    assert out[("a", 1)] == (1000.0, 500.0, True)
    assert out[("a", 10)] == (1000.0, 1000.0, True)  # gap: frame = itself
    assert out[("b", 4)][0] == 100.0
    assert out[("b", 4)][1] < 14.4 and out[("b", 4)][2] is False


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows],
        "doc_id bigint, text string",
    )


def test_gopher_rules_each_rule_rejects_independently(spark):
    """One fixture doc per rule, failing ONLY that rule (other signals
    kept in-bounds), plus one doc passing all four."""
    good = " ".join(["the", "a"] + [f"word{i:02d}" for i in range(23)])
    short = "the a tiny little doc"
    longwords = " ".join(
        ["the", "a"] + [f"wordofmanychars{i:02d}" for i in range(18)]
    )
    repeated = " ".join(["the", "the"] + ["data"] * 28)
    nostop = " ".join(f"token{i:02d}" for i in range(25))
    out = {
        r["doc_id"]: r
        for r in gopher_rules(
            _docs_df(
                spark,
                [(1, good), (2, short), (3, longwords), (4, repeated),
                 (5, nostop)],
            )
        ).collect()
    }
    assert out[1]["pass"] is True
    assert out[2]["word_count_ok"] is False and out[2]["pass"] is False
    assert out[3]["word_len_ok"] is False
    assert (
        out[3]["word_count_ok"] is True and out[3]["stopword_ok"] is True
    )
    assert out[4]["repetition_ok"] is False and out[4]["stopword_ok"] is True
    assert out[4]["word_count_ok"] is True and out[4]["word_len_ok"] is True
    assert out[5]["stopword_ok"] is False
    assert out[5]["word_count_ok"] is True and out[5]["repetition_ok"] is True


def test_ngram_novelty_first_owner_attribution(spark):
    """min-doc_id owns each gram: doc 1's grams are all novel, doc 2
    shares one of two with doc 1 (novelty 0.5), and a doc too short for
    any gram still gets its zero row (the left-join spine)."""
    from zipkin_storage_kafka_spark.operators.dedup import shingles_native

    docs = _docs_df(spark, [(1, "a b c d"), (2, "a b c x"), (3, "a b")])
    out = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(shingles_native(docs), docs).collect()
    }
    assert out[1] == (2, 2, 1.0)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (0, 0, 0.0)


def test_semantic_retention_curve_fixture_and_corpus_consistency(
    spark, sf_dir
):
    """Hand curve: 4 one-cell vectors with pair cosines {1.0, 0.6, 0.8}
    — kept counts 1 at t=0.5 and 3 at t=0.9; and on the real corpus the
    curve point at the SemDeDup default threshold must equal
    dedup_semantic's actual keep count (the curve IS that operator
    evaluated at every threshold)."""
    from zipkin_storage_kafka_spark.operators.similarity import (
        SEMDEDUP_THRESHOLD,
        semantic_dedup_arrow,
        semantic_retention_curve,
    )
    from zipkin_storage_kafka_spark.plans.registry_pipeline import _ivf_index

    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[1.0, 0.0]),
            Row(vec_id=3, embedding=[0.6, 0.8]),
            Row(vec_id=4, embedding=[0.0, 1.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    assign = spark.createDataFrame(
        [Row(vec_id=i, label=0) for i in (1, 2, 3, 4)],
        "vec_id bigint, label int",
    )
    cents = spark.createDataFrame([Row(label=0, centroid=[1.0, 0.0])])
    curve = {
        r["threshold"]: r["n_kept"]
        for r in semantic_retention_curve(
            emb, centroids=cents, assign=assign, thresholds=(0.5, 0.9)
        ).collect()
    }
    assert curve == {0.5: 1, 0.9: 3}

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids, corpus_assign = _ivf_index(spark, sf_dir)
    full = {
        r["threshold"]: r["n_kept"]
        for r in semantic_retention_curve(
            corpus, centroids=centroids, assign=corpus_assign
        ).collect()
    }
    kept = (
        semantic_dedup_arrow(
            corpus, centroids=centroids, assign=corpus_assign
        )
        .filter("keep")
        .count()
    )
    assert full[SEMDEDUP_THRESHOLD] == kept
    # retention is monotone non-decreasing in the threshold
    ts = sorted(full)
    assert all(full[a] <= full[b] for a, b in zip(ts, ts[1:]))


def test_pq_adc_exact_on_codebook_aligned_corpus(spark):
    """When every corpus vector IS a codebook reconstruction, ADC equals
    the exact squared L2 distance to the query: v2/v3 mix subspaces from
    both codebook entries, proving the per-subspace LUT composition
    (ties broken by vec_id)."""
    from zipkin_storage_kafka_spark.operators.similarity import pq_adc_topk

    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[0.0, 0.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[1.0, 1.0, 1.0, 1.0]),
            Row(vec_id=2, embedding=[0.0, 0.0, 1.0, 1.0]),
            Row(vec_id=3, embedding=[1.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    rows = pq_adc_topk(emb, 0, k_results=4, m=2, k=2).collect()
    # the query vector itself is excluded (matching cosine_topk)
    assert [(r["vec_id"], r["adc_d2"]) for r in rows] == [
        (2, 2.0),
        (3, 2.0),
        (1, 4.0),
    ]


def test_phash_ahash_invariance_and_class_pairs(spark):
    """aHash semantics pinned end-to-end through REAL encode/decode:
    a constant brightness shift yields the IDENTICAL hash (same class,
    no pair), a single flipped grid cell is a Hamming-1 class pair, and
    an inverted image differs in every band (not even a candidate)."""
    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import (
        bmp_ahash,
        encode_bmp,
        phash_class_neardup,
    )

    def img(fill):  # 8x8, per-cell scalar -> all three channels
        a = np.zeros((8, 8, 3), dtype=np.uint8)
        a[:, :, :] = np.asarray(fill, dtype=np.uint8)[:, :, None]
        return encode_bmp(a)

    half = np.where(np.arange(8)[None, :] >= 4, 200, 0) * np.ones(
        (8, 1), dtype=int
    )
    flipped = half.copy()
    flipped[0, 7] = 0  # one bright cell goes dark -> Hamming 1
    rows = [
        (1, img(half)),
        (2, img(half + 30)),       # brightness shift -> same hash as 1
        (3, img(flipped)),
        (4, img(200 - half)),      # inversion -> all 64 bits differ
    ]
    media = spark.createDataFrame(
        [Row(media_id=i, payload=bytearray(p)) for i, p in rows],
        "media_id bigint, payload binary",
    )
    hashes = bmp_ahash(media)
    hx = {r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
          for r in hashes.collect()}
    assert hx[1] == hx[2]          # shift-invariant
    assert hx[1] != hx[3] and hx[1] != hx[4]
    pairs = [
        (r["id_a"], r["id_b"], r["hamming"], r["n_images_a"],
         r["n_images_b"])
        for r in phash_class_neardup(hashes).collect()
    ]
    assert pairs == [(1, 3, 1, 2, 1)]


def test_wav_features_rms_zcr_fixture(spark):
    """Known PCM through the REAL encoder/decoder: alternating-sign ch0
    has zcr 1.0 and integer rms, constant-sign ch1 has zero crossings,
    and zeros count as non-negative (no engine-dependent sign ties)."""
    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import (
        encode_wav,
        wav_features,
    )

    # 4 samples x 2 channels, interleaved by the codec
    pcm = np.array(
        [[100, -7], [-100, -7], [100, -7], [-100, -7]], dtype=np.int16
    )
    media = spark.createDataFrame(
        [Row(media_id=1, payload=bytearray(encode_wav(pcm, 8000)))],
        "media_id bigint, payload binary",
    )
    out = {
        r["channel"]: (
            r["n_samples"], r["rms"], r["zero_crossings"], r["zcr"]
        )
        for r in wav_features(media).collect()
    }
    assert out[0] == (4, 100.0, 3, 1.0)
    assert out[1] == (4, 7.0, 0, 0.0)

    # zeros are non-negative: [0, 0, -5] has ONE crossing (0 -> -5)
    pcm2 = np.array([[0], [0], [-5]], dtype=np.int16)
    media2 = spark.createDataFrame(
        [Row(media_id=2, payload=bytearray(encode_wav(pcm2, 8000)))],
        "media_id bigint, payload binary",
    )
    r = wav_features(media2).collect()[0]
    assert (r["zero_crossings"], r["zcr"]) == (1, 0.5)


def test_dsir_importance_orders_target_like_docs(spark):
    """A doc made of target-domain bigrams must outscore a doc of
    raw-only bigrams (the resampling signal), identical docs score
    identically, and a gram-less doc keeps its zero spine row."""
    from zipkin_storage_kafka_spark.operators.text_analysis import (
        dsir_importance,
    )

    rows = [
        # target domain: 'x y' everywhere
        Row(doc_id=1, source="src0", text="x y x y x y"),
        Row(doc_id=2, source="src0", text="x y x y"),
        # raw-only domain
        Row(doc_id=3, source="srcZ", text="a b a b a b"),
        Row(doc_id=4, source="srcZ", text="a b a b a b"),
        # target-LIKE doc in the raw domain — should still score high
        Row(doc_id=5, source="srcZ", text="x y x y x y"),
        Row(doc_id=6, source="srcZ", text="solo"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["weight_micro"], r["avg_weight"])
        for r in dsir_importance(docs).collect()
    }
    assert out[6] == (0, 0, 0.0)
    # target-typical beats raw-typical, regardless of the doc's source
    assert out[5][2] > out[3][2]
    assert out[1][2] > out[3][2]
    # identical text, identical score
    assert out[3] == out[4]


def test_truncated_recall_detects_prefix_divergence(spark):
    """Hand corpus where the first-2-dims ranking genuinely disagrees
    with the full ranking: tail-heavy vectors look perfect in the
    prefix, so exactly one of the top-2 survives -> recall 0.5."""
    from zipkin_storage_kafka_spark.operators.similarity import (
        truncated_recall,
    )

    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),   # query
            Row(vec_id=1, embedding=[1.0, 0.0, 9.0, 9.0]),   # prefix-perfect
            Row(vec_id=2, embedding=[1.0, 0.0, -9.0, -9.0]), # prefix-perfect
            Row(vec_id=3, embedding=[0.9, 0.1, 0.0, 0.0]),   # truly close
            Row(vec_id=4, embedding=[0.0, 1.0, 0.0, 0.0]),   # orthogonal
        ],
        "vec_id bigint, embedding array<float>",
    )
    r = truncated_recall(emb, 0, k=2, dims=2).collect()[0]
    # full top-2 = {3, 1}; truncated top-2 = {1, 2}; overlap = {1}
    assert (r["k"], r["dims"], r["n_overlap"], r["recall"]) == (
        2, 2, 1, 0.5
    )


def test_zipf_fit_matches_numpy_reference(spark):
    """slope/intercept/r2 agree with numpy's least squares on a small
    hand corpus, and the slope is negative (frequency falls with
    rank)."""
    import numpy as np

    from zipkin_storage_kafka_spark.operators.text_analysis import zipf_fit

    # counts: the 8/4/2 across three types
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2))],
        "doc_id bigint, text string",
    )
    r = zipf_fit(docs).collect()[0]
    x = np.log(np.array([1.0, 2.0, 3.0]))
    y = np.log(np.array([8.0, 4.0, 2.0]))
    slope, intercept = np.polyfit(x, y, 1)
    pred = slope * x + intercept
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert r["n_types"] == 3
    assert abs(r["slope"] - slope) < 1e-3 and r["slope"] < 0
    assert abs(r["intercept"] - intercept) < 1e-3
    assert abs(r["r2"] - r2) < 1e-3


def test_pcm_features_degenerate_blocks():
    """Conforming-but-degenerate PCM: a single-frame block has zcr 0.0
    (no division by zero) and an empty block yields no feature rows."""
    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import (
        pcm_channel_features,
    )

    one = pcm_channel_features(np.array([[5, -5]], dtype=np.int16))
    assert one == [(0, 5.0, 0, 0.0), (1, 5.0, 0, 0.0)]
    assert pcm_channel_features(np.zeros((0, 2), dtype=np.int16)) == []


def test_phash_rejects_hamming_beyond_pigeonhole(spark):
    """max_hamming > 3 would silently lose pairs whose differing bits
    touch all four bands — the operator must refuse, not under-recall."""
    import pytest as _pytest

    from zipkin_storage_kafka_spark.operators.multimodal import (
        phash_neardup,
    )

    hashes = spark.createDataFrame(
        [Row(media_id=1, b0=0, b1=0, b2=0, b3=0)],
        "media_id bigint, b0 int, b1 int, b2 int, b3 int",
    )
    with _pytest.raises(ValueError, match="pigeonhole"):
        phash_neardup(hashes, max_hamming=4)


def test_locf_fill_carries_and_leading_nulls(spark, tmp_path):
    """LOCF semantics on a hand grid: gaps carry the previous observed
    mean forward, minutes before a type's FIRST observation stay null,
    and observed minutes report their own (round4 averaged) value."""
    import datetime as dt

    from zipkin_storage_kafka_spark.operators.analytics import locf_fill

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(minute, sec=0):
        return t0 + dt.timedelta(minutes=minute, seconds=sec)

    rows = [
        # type A: observed at minutes 0 (two events -> mean) and 3
        Row(event_id=1, ts=at(0), user_id=1, event_type="A",
            value=10.0, props="{}"),
        Row(event_id=2, ts=at(0, 30), user_id=1, event_type="A",
            value=20.0, props="{}"),
        Row(event_id=3, ts=at(3), user_id=1, event_type="A",
            value=99.0, props="{}"),
        # type B: first observation only at minute 2
        Row(event_id=4, ts=at(2), user_id=2, event_type="B",
            value=7.0, props="{}"),
    ]
    df = spark.createDataFrame(rows)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    out = {
        (r["event_type"], r["minute_ms"] // 60000): (
            r["value"], r["is_observed"]
        )
        for r in locf_fill(spark, str(tmp_path)).collect()
    }
    m0 = min(m for (_t, m) in out)
    assert out[("A", m0)] == (15.0, True)       # mean of 10, 20
    assert out[("A", m0 + 1)] == (15.0, False)  # carried
    assert out[("A", m0 + 2)] == (15.0, False)  # carried
    assert out[("A", m0 + 3)] == (99.0, True)
    assert out[("B", m0)] == (None, False)      # before first obs
    assert out[("B", m0 + 1)] == (None, False)
    assert out[("B", m0 + 2)] == (7.0, True)
    assert out[("B", m0 + 3)] == (7.0, False)   # carried to grid end


def test_dedup_agreement_confusion_cells(spark):
    """Every confusion cell populated by hand: an exact pair that is
    also near (identical long texts), a near-only neighbor (one word
    changed), a neither doc, and the sub-shingle carve-out — an exact
    pair too short to shingle can NEVER be near-flagged, the one
    legitimate source of only-exact counts."""
    from zipkin_storage_kafka_spark.operators import dedup as dd

    base = " ".join(f"tok{i:02d}" for i in range(20))
    near = " ".join([f"tok{i:02d}" for i in range(19)] + ["zzz"])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),
            Row(doc_id=3, text=near),
            Row(doc_id=4, text=" ".join(f"other{i:02d}" for i in range(20))),
            Row(doc_id=5, text="a b"),
            Row(doc_id=6, text="a b"),
        ],
        "doc_id bigint, text string",
    )
    sh = dd.shingles_native(docs)
    cand = dd.lsh_candidate_pairs(dd.minhash_buckets(sh))
    r = dd.dedup_method_agreement(docs, sh, cand, 0.5).collect()[0]
    assert (
        r["n_docs"], r["n_exact"], r["n_near"], r["n_both"],
        r["n_only_exact"], r["n_only_near"], r["n_neither"],
        r["agreement"],
    ) == (6, 4, 3, 2, 2, 1, 1, 0.5)


def test_dedup_agreement_null_text_docs_kept(spark):
    """NULL-text docs (the ingest path nulls malformed documents) must
    stay in the universe and form ONE exact group — md5(NULL) is NULL
    and a plain equi-join would silently drop them."""
    from zipkin_storage_kafka_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=None),
            Row(doc_id=2, text=None),
            Row(doc_id=3, text=" ".join(f"w{i}" for i in range(10))),
        ],
        "doc_id bigint, text string",
    )
    sh = dd.shingles_native(docs)
    cand = dd.lsh_candidate_pairs(dd.minhash_buckets(sh))
    r = dd.dedup_method_agreement(docs, sh, cand, 0.5).collect()[0]
    assert r["n_docs"] == 3          # nothing dropped
    assert r["n_exact"] == 2         # the two NULL docs are one group
    assert r["n_near"] == 0
    assert r["n_neither"] == 1
