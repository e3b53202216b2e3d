"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline extensions (BASELINE.json north star).  All hashing
is md5-based so the DuckDB oracle reproduces values bit-for-bit; Spark's
native xxhash64/murmur have no DuckDB twin.

Scale design (100 TB):
- exact dedup: one hash-groupBy — map-side partial agg, shuffle carries one
  row per distinct hash.
- MinHash: shingles explode ~L rows/doc, the (doc, band, row) min-agg
  combines map-side, the LSH bucket join shuffles only (band, bucket) keys;
  candidate volume is controlled by (bands, rows) band math, NOT by pair
  enumeration — no O(n^2) stage exists.
- SimHash: explode words x 16 bit-positions, two-level agg, again partial.
- Jaccard verify runs ONLY on LSH candidates (a semi-join-bounded set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.functions.portable import round4

NGRAM = 3
BANDS = 4
ROWS_PER_BAND = 2
SIMHASH_BITS = 16


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """One row per distinct text hash: the canonical doc (min doc_id) plus
    the duplicate count.  ``n_docs > 1`` rows are exact-duplicate groups."""
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def shingles(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, sh).

    Built with posexplode + window leads so the same plan shape works in
    the DuckDB oracle (generate_series indexing there).
    """
    d = docs.select("doc_id", F.split("text", " ").alias("w"))
    idx = d.select(
        "doc_id", F.posexplode("w").alias("pos", "word")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("word")] + [F.lead("word", k).over(win) for k in range(1, n)]
    tri = idx.select(
        "doc_id",
        F.concat_ws(" ", *parts).alias("sh"),
        F.lead("word", n - 1).over(win).alias("_last"),
    ).filter(F.col("_last").isNotNull())
    return tri.select("doc_id", "sh").distinct()


def shingles_native(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """Same output, zero-shuffle formulation: per-row array transform
    (no window) — the shape to prefer at scale.  Kept alongside
    :func:`shingles` so tests pin both produce identical sets."""
    d = docs.select("doc_id", F.split("text", " ").alias("w"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("w") - F.lit(n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("w", i + F.lit(j)) for j in range(n)]
        ),
    )
    return (
        d.filter(F.size("w") >= n)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("sh"))
        .distinct()
    )


def minhash_buckets(
    sh: DataFrame, bands: int = BANDS, rows: int = ROWS_PER_BAND
) -> DataFrame:
    """(doc_id, band, bucket): LSH bucket per band.

    Hash family: md5(f"{band}_{row}:{shingle}") — the minhash per (band,
    row) is the lexicographic min of those hex strings; the bucket is the
    md5 of the per-band concatenation.  Deterministic and engine-portable.

    Plan shape: the (bands x rows) hash family is computed as COLUMNS on
    the shingle rows and min-aggregated in one pass — one groupBy over the
    shingle set with map-side combine, instead of exploding to
    |shingles| x bands x rows rows before the shuffle (8x shuffle-volume
    reduction at these parameters; the explode formulation was the
    bottleneck of the whole dedup chain at sf0.1).
    """
    min_aggs = [
        F.min(F.md5(F.concat(F.lit(f"{b}_{r}:"), F.col("sh")))).alias(
            f"m_{b}_{r}"
        )
        for b in range(bands)
        for r in range(rows)
    ]
    mins = sh.groupBy("doc_id").agg(*min_aggs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"m_{b}_{r}") for r in range(rows)]
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return mins.select(
        "doc_id", F.explode(band_structs).alias("bb")
    ).select("doc_id", F.col("bb.b").alias("b"), F.col("bb.bucket").alias("bucket"))


def lsh_bucket_stats(buckets: DataFrame) -> DataFrame:
    """Bucket-occupancy exposure audit: how many (band, bucket) cells
    hold ``size`` members, and the candidate-pair mass (size choose 2
    per cell) each size class contributes.  This is the report that
    decides a :func:`lsh_candidate_pairs` ``bucket_cap`` — at 100 TB a
    single boilerplate-degenerate bucket with 1e6 members would emit
    5e11 pairs; the size histogram shows that exposure BEFORE the pair
    join runs (the "no silent caps" discipline: cap decisions are made
    from measured mass, and dropped mass is visible here).

    Columns: size, n_buckets, pair_mass.

    Scale: one (band, bucket) partial agg over the index rows, then a
    count by size — output cardinality is the distinct-size count.
    """
    sizes = buckets.groupBy("b", "bucket").agg(
        F.count(F.lit(1)).alias("size")
    )
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .select(
            "size",
            "n_buckets",
            F.expr("n_buckets * ((size * (size - 1)) div 2)")
            .cast("long")
            .alias("pair_mass"),
        )
    )


def lsh_candidate_pairs(
    buckets: DataFrame, bucket_cap: int | None = None
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing >= 1 LSH bucket, with the
    number of agreeing bands.  The join key is (band, bucket) — shuffle is
    bounded by bucket occupancy, never all-pairs.

    ``bucket_cap``: when set, buckets with MORE than ``bucket_cap``
    members contribute no pairs — the standard guard against
    boilerplate-degenerate buckets whose size² pair mass would dominate
    the join at corpus scale (members this common are near-duplicates
    of a template, better handled by the exact-hash pass).  Size the
    cap from :func:`lsh_bucket_stats`; dropped mass is visible there,
    never silent."""
    if bucket_cap is not None:
        sizes = buckets.groupBy("b", "bucket").agg(
            F.count(F.lit(1)).alias("_size")
        )
        buckets = (
            buckets.join(sizes, ["b", "bucket"])
            .filter(F.col("_size") <= int(bucket_cap))
            .drop("_size")
        )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.b").alias("band"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def verified_candidate_pairs(
    sh: DataFrame, candidates: DataFrame
) -> DataFrame:
    """The ONE expensive verify derivation every candidate audit shares
    (VERDICT r06 next-round #3): per LSH candidate pair, the shingle
    intersection size plus both shingle-set sizes.  Jaccard,
    containment, the estimator audit, and the agreement report are all
    cheap projections of this relation — materialize it once (the
    matcache pattern, plans/registry_pipeline._verified_pairs) and the
    family stops re-paying the candidate-bounded equi-join per row.

    Columns: doc_a, doc_b, i, n_a, n_b.

    Scale (100 TB): the intersection join runs ONLY on the LSH-bounded
    candidate set (never corpus²); per-doc sizes are one partial-agged
    count keyed like the shingle shuffle.
    """
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("sa")
    b = sh.alias("sb")
    inter = (
        candidates.select("doc_a", "doc_b")
        .join(a, F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            b,
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    return (
        inter.join(ca, F.col("ca.doc_id") == F.col("doc_a"))
        .join(cb, F.col("cb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "i",
            F.col("ca.n").alias("n_a"),
            F.col("cb.n").alias("n_b"),
        )
    )


def jaccard_pairs(
    sh: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.0,
    verified: DataFrame | None = None,
) -> DataFrame:
    """True n-gram Jaccard for candidate pairs: |A∩B| via a shingle
    equi-join restricted to candidates, |A|,|B| from per-doc counts.
    Columns: doc_a, doc_b, jaccard (round 4).  Pass a persisted
    ``verified`` relation (:func:`verified_candidate_pairs`) to skip
    the join — the serving shape."""
    if verified is None:
        verified = verified_candidate_pairs(sh, candidates)
    out = verified.select(
        "doc_a",
        "doc_b",
        round4(
            F.col("i") / (F.col("n_a") + F.col("n_b") - F.col("i"))
        ).alias("jaccard"),
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-document SimHash over word unigrams (occurrence-weighted).

    Bit j of the signature is the majority sign of hex digit j of each
    word's md5 (digit >= '8' means the high bit is set) — engine-portable
    without hex->int conversion.  Columns: doc_id, simhash (bigint).

    Dictionary formulation: md5 is computed once per DISTINCT word (the
    vocabulary), then broadcast-joined back to the raw word OCCURRENCES
    — sum(sign) over occurrences equals sum(count * sign) over distinct
    words, at vocabulary hashing cost instead of corpus hashing cost.
    At 100 TB the vocabulary side stays MB-scale -> broadcast.

    Shuffle shape (r13 cost pass, two steps): (1) the per-bit sums are
    ``bits`` AGGREGATE COLUMNS, not a x-bits row explosion through a
    (doc_id, j) groupBy; (2) the old (doc_id, word) pre-count shuffle
    is GONE — every occurrence of a doc lives in the doc's own row, so
    the single doc_id groupBy collapses a doc's occurrences to one
    partial row map-side and the only corpus-keyed exchange left
    carries |docs| rows of (id, 16 ints).  The vocabulary distinct is
    the one other exchange, also collapsed map-side to vocabulary
    size.  Same-session interleaved A/B at sf1: old 4.24 s vs this
    2.29 s (the bit-column change alone moved nothing — the pre-count
    shuffle was the cost); value-identical, oracle unchanged.
    """
    occ = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    vocab = occ.select("word").distinct().withColumn("h", F.md5("word"))
    # Hex digit j of md5(word) >= '8' <=> bit j votes +1 — one +/-1
    # column per signature bit, evaluated once per vocabulary word.
    vocab_bits = vocab.select(
        "word",
        *[
            F.when(F.substring("h", j, 1) >= "8", F.lit(1))
            .otherwise(F.lit(-1))
            .alias(f"v{j}")
            for j in range(1, bits + 1)
        ],
    )
    scores = (
        occ.join(F.broadcast(vocab_bits), "word")
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.col(f"v{j}")).alias(f"s{j}")
                for j in range(1, bits + 1)
            ]
        )
    )
    sig = None
    for j in range(1, bits + 1):
        term = F.when(
            F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return scores.select("doc_id", sig.alias("simhash"))


def simhash_dup_groups(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash values held by more than one document — near-dup clusters.
    Columns: simhash, n_docs, canonical_doc_id."""
    return (
        simhash(docs, bits)
        .groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _rowwise_band_minima(n: int = NGRAM, bands: int = BANDS,
                         rows: int = ROWS_PER_BAND) -> list[F.Column]:
    """Per-band minhash bucket columns computed entirely within a row.

    Same hash family and bucket formula as :func:`minhash_buckets`
    (md5(f"{band}_{row}:{shingle}") minima, bucket = md5 of the per-band
    '|'-join), but evaluated as array expressions over the row's own
    shingle array — ZERO shuffle, so it works in a stateless streaming map
    stage and as the preferred batch shape when docs are already the unit
    of work.  min over the multiset equals min over the distinct set, so no
    array_distinct is needed.  Expects a ``w`` array<string> column (split
    text); rows with fewer than ``n`` words produce NULL buckets (no
    shingles — callers filter).
    """
    grams = F.sequence(F.lit(1), F.size("w") - F.lit(n - 1))
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at("w", i + F.lit(j)) for j in range(n)]
    )
    def _min_col(b: int, r: int) -> F.Column:
        # one-arg lambda (PySpark infers HOF arity from the signature)
        return F.array_min(
            F.transform(
                grams,
                lambda i: F.md5(F.concat(F.lit(f"{b}_{r}:"), shingle(i))),
            )
        )

    cols = []
    for b in range(bands):
        mins = [_min_col(b, r) for r in range(rows)]
        cols.append(F.md5(F.concat_ws("|", *mins)).alias(f"bucket_{b}"))
    return cols


def minhash_buckets_rowwise(
    docs: DataFrame, n: int = NGRAM, bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
) -> DataFrame:
    """(doc_id, b, bucket) — identical output to :func:`minhash_buckets`
    (pinned by test), without the shingle explode or the groupBy shuffle.

    At 100 TB this is the shape to prefer: the whole signature computes in
    one codegen'd projection per document, and only the (doc, band, bucket)
    triples — 4 small rows per doc — ever move."""
    d = docs.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= n
    )
    sig = d.select("doc_id", *_rowwise_band_minima(n, bands, rows))
    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("b"), F.col(f"bucket_{b}").alias("bucket"))
            for b in range(bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.b").alias("b"), F.col("bb.bucket").alias("bucket")
    )


def minhash_signature(
    docs: DataFrame, n: int = NGRAM, bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
) -> DataFrame:
    """Input columns + a ``signature`` md5 over all band buckets — equal
    signatures mean equal minhash in every band (shingle-set-identical or
    overwhelmingly-near documents).  Rowwise and shuffle-free; the
    streaming near-dup job keys its state by this column."""
    with_w = docs.withColumn("w", F.split("text", " ")).filter(
        F.size("w") >= n
    )
    mins = with_w.select("*", *_rowwise_band_minima(n, bands, rows))
    return mins.withColumn(
        "signature",
        F.md5(F.concat_ws("|", *[f"bucket_{b}" for b in range(bands)])),
    ).drop("w", *[f"bucket_{b}" for b in range(bands)])


def connected_components(pairs: DataFrame, max_iters: int = 25) -> DataFrame:
    """Resolve undirected near-dup pairs (doc_a, doc_b) into connected
    components: one row per participating doc with ``component_id`` = the
    smallest doc_id reachable from it.

    Iterative min-label propagation — the one genuinely iterative operator
    in the dedup chain (cluster resolution after pair generation; the
    reference's trace grouping is analogous single-pass groupBy at
    TraceStorageTopology.java:131-168, but cluster closure needs a
    fixpoint).  Each sweep is fully distributed: edges join labels on src,
    min per dst, least() with the current label.  The driver only reads ONE
    scalar per sweep (sum of labels, strictly decreasing until the
    fixpoint) to decide termination — no per-row driver data.

    Scale: sweeps = component diameter (near-dup clusters are near-cliques,
    so 2-3 in practice); each sweep shuffles |edges| keyed rows.  For
    graphs with giant components use :func:`connected_components_star`
    (alternating large-star/small-star, O(log^2 n) rounds independent of
    diameter) — equivalence between the two is test-pinned.
    """
    # localCheckpoint (not persist): a persisted iterate caches DATA but
    # keeps the full logical lineage, so every sweep makes Catalyst
    # re-optimize the whole upstream pair-generation plan (minhash, LSH,
    # verify) — measured ~3 s/sweep of pure planning at sf0.1 vs ~0.5 s
    # with lineage truncated.  On a production cluster the equivalent is a
    # reliable checkpoint dir (executor loss under localCheckpoint forces a
    # restart of the fixpoint, which is acceptable for a 2-3-sweep job).
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=False)
    )
    prev_sum = None
    for _ in range(max_iters):
        prop = (
            edges.join(labels, F.col("src") == F.col("doc_id"))
            .groupBy(F.col("dst").alias("_dst"))
            .agg(F.min("label").alias("_nbr"))
        )
        new_labels = (
            labels.join(prop, F.col("doc_id") == F.col("_dst"), "left")
            .select(
                "doc_id",
                F.least("label", F.coalesce("_nbr", "label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("doc_id", F.col("label").alias("component_id"))


def connected_components_star(
    pairs: DataFrame, max_iters: int = 20, min_impl: str = "window"
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC 2014) — the
    giant-component scale path named by :func:`connected_components`'s
    docstring, now implemented: converges in O(log^2 n) rounds regardless
    of component DIAMETER, where plain min-label propagation needs
    diameter rounds (a 10^6-hop chain -> ~40 rounds here vs 10^6 there).

    Same output contract as :func:`connected_components`: one row per
    participating doc, ``component_id`` = smallest reachable doc_id.

    Each phase is one groupBy (min neighbor) + one join back — the same
    per-round shuffle volume as a propagation sweep, so this is strictly
    the better asymptotic at equal round cost; dedup graphs are
    near-cliques (diameter 2-3) where both finish in ~3 rounds, which is
    why propagation remains the default flavor.  Equivalence on clique,
    chain, bridge, and LSH-candidate graphs is test-pinned.

    Termination reads TWO scalars per round (edge count + label-sum
    fingerprint), never rows; lineage is truncated per round with
    localCheckpoint exactly as in :func:`connected_components`.

    ``min_impl`` picks how m(u) = min(N(u) + {u}) is computed per phase
    (both are test-pinned equivalent; VERDICT r05 next-round #3):

    - ``"window"`` (default): ``min(dst) OVER (PARTITION BY src)`` — ONE
      exchange per phase instead of the groupBy + join-back's two
      (measured 2x end-to-end at sf0.1, where round constants dominate).
      The skew surface is unchanged vs the join formulation's probe side
      (a hub's adjacency rows land in one src partition either way), but
      a window partition cannot be split by AQE.
    - ``"join"``: partial-agg min + join back — the formulation AQE can
      rescue on PATHOLOGICAL hub graphs (the mins side is one row per
      src, so a skewed probe partition is splittable).  Large-star
      itself shrinks max degree every round, so this matters only for
      extreme first-round hubs (say degree >~ rows-per-partition).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # node universe from the CHECKPOINTED symmetric edges (every pair node
    # appears as a src), never from `pairs`: a second reference to the raw
    # pair relation re-evaluates the whole upstream candidate+verify DAG —
    # measured 9.4 s of the query's 18.6 s at sf1, the real cost VERDICT
    # r05 item #3 attributed to the per-round distinct
    nodes = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _sym(e: DataFrame) -> DataFrame:
        # the edge list is an UNDIRECTED graph stored as directed rows;
        # every phase reads full adjacency, so re-symmetrize first (a
        # phase's output keeps only the root-ward direction — without
        # this the root's own perspective vanishes after one contraction
        # and the edge set collapses to empty)
        return e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    def _with_min(s: DataFrame) -> DataFrame:
        # every row of s + its src's m(u) = min(N(u) + {u})
        if min_impl == "window":
            w = Window.partitionBy("src")
            return s.withColumn(
                "_m", F.least(F.col("src"), F.min("dst").over(w))
            )
        mins = (
            s.groupBy("src")
            .agg(F.min("dst").alias("_m"))
            .select("src", F.least("src", F.col("_m")).alias("_m"))
        )
        return s.join(mins, "src")

    def _large_star(e: DataFrame) -> DataFrame:
        # connect every strictly-larger neighbor to m(u).  No distinct
        # here: output volume is bounded by |sym(e)| (one row per examined
        # edge) and the small-star distinct dedups once per round — one
        # exchange saved per round, measured ~15% off the fixpoint at sf1
        # with identical output (equivalence suite unchanged).
        return (
            _with_min(_sym(e))
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # connect u and every smaller-or-equal neighbor to m(u)
        j = _with_min(_sym(e))
        smaller = j.filter(F.col("dst") <= F.col("src")).select(
            F.col("dst").alias("src"), F.col("_m").alias("dst")
        )
        self_edge = j.select("src", F.col("_m").alias("dst"))
        return (
            smaller.union(self_edge)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    prev = None
    for _ in range(max_iters):
        # one round = large-star then small-star; after small-star every
        # edge points from a node to a (current) component-local minimum
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        fp = edges.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("src") + F.col("dst")).alias("s")
        ).collect()[0]
        cur = (fp["n"], fp["s"])
        if cur == prev:
            break
        prev = cur

    # fixpoint edges form stars (v -> component min); isolated-after-dedup
    # nodes (none in practice: every pair node has an edge) label as
    # themselves via the left join
    labels = nodes.join(
        edges.groupBy("src").agg(F.min("dst").alias("_root")),
        nodes["doc_id"] == F.col("src"),
        "left",
    ).select(
        "doc_id",
        F.least("doc_id", F.coalesce("_root", "doc_id")).alias("component_id"),
    )
    return labels


def dedup_clusters(pairs: DataFrame, flavor: str = "propagation") -> DataFrame:
    """Near-dup cluster report from verified pairs: one row per component
    with its size and the CSV-joined sorted member list (scalar columns so
    the driver's value hash applies).  Columns: component_id, n_docs,
    member_ids.

    ``flavor``: ``"propagation"`` (min-label sweeps, default — optimal for
    small-diameter dedup graphs) or ``"star"``
    (:func:`connected_components_star`, the giant-component path)."""
    cc = {
        "propagation": connected_components,
        "star": connected_components_star,
    }[flavor](pairs)
    return cluster_report(cc)


def cluster_report(labels: DataFrame) -> DataFrame:
    """The cluster report grain over a (doc_id, component_id) label
    relation — extracted (r15) so rows serving from a MATERIALIZED
    label map (the CC fixpoint is dedup-time work, like the r10
    survivorship map) share the exact output contract with the live
    :func:`dedup_clusters` flavors."""
    return labels.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
        ).alias("member_ids"),
    )


def banding_audit(
    candidates: DataFrame,
    verified: DataFrame,
    bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
) -> DataFrame:
    """LSH banding-design audit: per Jaccard decile, the MEASURED mean
    number of agreeing bands among candidate pairs next to the
    theoretical expectation bands * J^rows (the S-curve every (b, r)
    design is chosen from, Broder 1997 / Leskovec et al. MMDS ch.3) —
    the companion of :func:`minhash_estimate_audit` that validates the
    BAND layer rather than the estimator.

    Columns: j_bin (floor(J*10)), n_pairs, avg_bands_actual (round4),
    avg_bands_expected (round4).

    Determinism: the per-pair expectation is rounded to integer
    MICRO-units before summation (the BM25 micro-point pattern), so the
    bin averages are ratios of exact integers — no order-dependent
    float accumulation.

    Scale: one join of two already-materialized candidate-bounded
    relations, partial-agged to <= 11 rows.
    """
    j = verified.select(
        "doc_a",
        "doc_b",
        round4(
            F.col("i") / (F.col("n_a") + F.col("n_b") - F.col("i"))
        ).alias("jaccard"),
    )
    joined = candidates.select("doc_a", "doc_b", "n_bands").join(
        j, ["doc_a", "doc_b"]
    )
    jpow = F.col("jaccard")
    for _ in range(rows - 1):
        jpow = jpow * F.col("jaccard")
    expected_micro = F.round(
        jpow * F.lit(float(bands)) * F.lit(1_000_000.0), 0
    ).cast("long")
    return (
        joined.select(
            F.floor(F.col("jaccard") * 10).cast("int").alias("j_bin"),
            "n_bands",
            expected_micro.alias("_em"),
        )
        .groupBy("j_bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("n_bands").alias("_sb"),
            F.sum("_em").alias("_se"),
        )
        .select(
            "j_bin",
            "n_pairs",
            round4(F.col("_sb") / F.col("n_pairs")).alias(
                "avg_bands_actual"
            ),
            round4(
                F.col("_se") / F.col("n_pairs") / F.lit(1_000_000.0)
            ).alias("avg_bands_expected"),
        )
    )


def jaccard_retention_curve(
    verified: DataFrame,
    thresholds: tuple[float, ...] = (0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """Near-dup threshold tuning curve: for each candidate Jaccard
    threshold, how many verified pairs qualify and how many documents
    the min-id drop policy would remove — answered from ONE pass over
    the shared :func:`verified_candidate_pairs` relation (the MinHash
    analog of the SemDeDup retention curve; with the nprobe sweep these
    form the engine's tuning-curve trilogy).

    Columns: threshold, n_pairs, n_docs_dropped — one row per
    threshold, even when nothing qualifies.

    Scale (100 TB): the verified relation is already candidate-bounded
    and materialized; the sweep replicates each pair to the thresholds
    it clears (<= |thresholds| x pairs rows) and partial-aggregates —
    no re-derivation per threshold.
    """
    j = verified.select(
        "doc_a",
        "doc_b",
        round4(
            F.col("i") / (F.col("n_a") + F.col("n_b") - F.col("i"))
        ).alias("jaccard"),
    )
    spark = verified.sparkSession
    th = spark.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    hits = (
        j.crossJoin(F.broadcast(th))
        .filter(F.col("jaccard") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("_p"),
            F.countDistinct("doc_b").alias("_d"),
        )
    )
    return (
        th.join(hits, "threshold", "left")
        .select(
            "threshold",
            F.coalesce(F.col("_p"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("_d"), F.lit(0))
            .cast("long")
            .alias("n_docs_dropped"),
        )
        .orderBy("threshold")
    )


def canonical_docs(
    pairs: DataFrame, quality: DataFrame
) -> DataFrame:
    """Quality-aware survivorship: resolve near-dup pairs into clusters
    and keep each cluster's HIGHEST-quality member (doc_id tiebreak) —
    the dedup policy a pretraining pipeline actually wants (min-id
    keeps whatever crawled first; this keeps the best copy).  The
    min-id flavor stays available as :func:`dedup_clusters`.

    ``quality`` is any (doc_id, quality) relation — the registry feeds
    text_analysis.quality_score.

    Columns: component_id, kept_doc_id, kept_quality, n_members,
    n_dropped.

    Scale (100 TB): the cluster fixpoint is the audited CC operator;
    the keeper choice is ONE component-keyed window whose partitions
    are cluster-sized (never a global sort), and the rollup rides the
    window's hash partitioning — one exchange beyond CC.
    """
    from pyspark.sql import Window

    cc = connected_components(pairs)
    members = cc.join(quality, "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    ranked = members.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("component_id")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).alias(
                "kept_doc_id"
            ),
            F.min(F.when(F.col("rk") == 1, F.col("quality"))).alias(
                "kept_quality"
            ),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "component_id",
            "kept_doc_id",
            "kept_quality",
            "n_members",
            (F.col("n_members") - 1).alias("n_dropped"),
        )
    )


def fuzzy_decontaminate(docs: DataFrame, candidates: DataFrame) -> DataFrame:
    """Near-dup train/eval contamination: exact-shingle decontamination
    (text_analysis.decontaminate) misses lightly-edited benchmark leaks, so
    this flags every val/test document that MinHash-LSH links to ANY train
    document.  Reuses the corpus-wide candidate pairs (bucketed, never
    all-pairs); the split label is a rowwise projection joined in by
    doc_id.  At 100 TB the candidate set is the already-bounded LSH output
    and both split joins shuffle on doc_id — no new quadratic stage.

    Columns: doc_id (eval doc), split, n_train_neighbors, max_bands.
    """
    from zipkin_storage_kafka_spark.operators.text_analysis import (
        split_assignment,
    )

    assign = docs.select("doc_id", split_assignment().alias("split"))
    a = assign.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = assign.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    paired = candidates.join(a, "doc_a").join(b, "doc_b")
    hits = paired.filter(
        (F.col("split_a") == "train") & (F.col("split_b") != "train")
    ).select(
        F.col("doc_b").alias("doc_id"),
        F.col("split_b").alias("split"),
        "n_bands",
    ).unionAll(
        paired.filter(
            (F.col("split_b") == "train") & (F.col("split_a") != "train")
        ).select(
            F.col("doc_a").alias("doc_id"),
            F.col("split_a").alias("split"),
            "n_bands",
        )
    )
    return hits.groupBy("doc_id", "split").agg(
        F.count(F.lit(1)).alias("n_train_neighbors"),
        F.max("n_bands").alias("max_bands"),
    )


SUBSTR_WINDOW = 20


def substring_duplication(
    docs: DataFrame, window: int = SUBSTR_WINDOW, hash_fn: str = "md5"
) -> DataFrame:
    """Exact substring-level duplication rate per document.

    The measure from Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (ACL 2022): a char window is *duplicated* when
    the identical ``window``-char string occurs >= 2 times corpus-wide;
    a document's dup_rate is the duplicated fraction of its windows.
    Catches boilerplate and templated spans that document-level
    (exact/MinHash) dedup misses entirely.

    Plan (r11 cost pass — the UNIQUE-OWNER inversion): every position
    explodes to one (doc_id, hash(window)) row via a native
    ``sequence -> transform -> explode`` (zero-shuffle, JVM-side; only
    the hash survives column pruning).  A window is NON-dup iff its
    hash occurs exactly once corpus-wide — and a count-1 hash has
    exactly one owner doc, so ``groupBy(h).agg(count, min(doc_id))``
    recovers per-doc unique counts from the hash grain with NO window
    function: the corpus-mass exchange feeds a HashAggregate instead
    of the Sort the old ``count(*) OVER (PARTITION BY h)`` forced on
    every exploded row.  ``n_windows`` is analytic
    (``length - window + 1``), so ``n_dup = n_windows - n_uniq`` and
    the only other shuffles are doc-keyed KB-scale aggs/joins.
    Same-session A/B, output-identical: sf0.1 1.75 -> 1.61 s, sf1
    3.58 -> 3.03 s in the md5 flavor (the sort dominates more as
    groups grow).  Total rows ~= corpus chars: linear, never pairwise;
    hashed keys are uniform so the h-shuffle is skew-free.

    ``hash_fn``: ``"md5"`` (default) keeps the 128-bit
    collision-is-impossible flavor; ``"xxhash64"`` is the scale path —
    an 8-byte bigint key instead of a 32-char string cuts the shuffle
    payload ~4x and hashes ~2x faster than the crypto md5 (measured
    sf1 3.53 -> 1.98 s same-session in this shape).  A 64-bit
    collision misflags ONE window pair as duplicated (~2^-65 per pair
    — first expected collision only past ~2^32 corpus windows, and
    even then a ~1e-6 relative dup_rate error), which is noise next to
    the >=2 duplication threshold.  The flag changes key width only,
    never semantics — pinned by a test that both flavors produce
    identical per-doc rates.

    Columns: doc_id, n_windows, n_dup, dup_rate.
    """
    hasher = {
        "md5": lambda c: F.md5(c),
        "xxhash64": lambda c: F.xxhash64(c),
    }[hash_fn]
    eligible = docs.filter(F.length("text") >= window)
    wins = eligible.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - F.lit(window - 1)),
                lambda i: hasher(F.substring("text", i, F.lit(window))),
            )
        ).alias("h"),
    )
    hgrp = wins.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_h"), F.min("doc_id").alias("d")
    )
    uniq = (
        hgrp.filter(F.col("n_h") == 1)
        .groupBy(F.col("d").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_uniq"))
    )
    base = eligible.select(
        "doc_id",
        (F.length("text") - F.lit(window - 1)).cast("long").alias(
            "n_windows"
        ),
    )
    n_dup = F.col("n_windows") - F.coalesce("n_uniq", F.lit(0))
    return base.join(uniq, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        n_dup.alias("n_dup"),
        (n_dup.cast("double") / F.col("n_windows")).alias("dup_rate"),
    )




def dedup_method_agreement(
    docs: DataFrame,
    sh: DataFrame,
    candidates: DataFrame,
    threshold: float,
    verified: DataFrame | None = None,
) -> DataFrame:
    """Cross-method dedup audit: for every document, does EXACT dedup
    flag it (its md5 group has >1 member) and does NEAR-dup flag it (it
    appears in any LSH-verified Jaccard >= threshold pair)?  Reported as
    the one-row confusion summary a pipeline owner reads before picking
    a dedup policy — and a standing LSH sanity check: exact duplicates
    share every minhash band, so (for docs long enough to shingle)
    near-dup must CONTAIN exact-dup; a nonzero only-exact count that
    isn't explained by sub-shingle docs means candidate recall broke.

    Output (one row): n_docs, n_exact, n_near, n_both, n_only_exact,
    n_only_near, n_neither, agreement (round4 simple-matching
    coefficient, (n_both + n_neither) / n_docs).

    Scale (100 TB): one md5 groupBy (the exact-dedup shuffle), the
    already-bounded candidate verify join, and a doc-keyed left join —
    no new quadratic surface; the output is one row.
    """
    # NULL-text docs (the ingest path nulls out malformed documents)
    # must form ONE exact group like the oracle's window-partition
    # semantics — md5(NULL) is NULL and an equi-join would silently DROP
    # those rows, undercounting n_docs.  The sentinel cannot collide
    # with a real md5 (hex alphabet only).
    hashes = docs.select(
        "doc_id",
        F.coalesce(F.md5("text"), F.lit("__null_text__")).alias("h"),
    )
    grp = hashes.groupBy("h").agg(F.count(F.lit(1)).alias("_n"))
    exact = hashes.join(grp, "h").select(
        "doc_id", (F.col("_n") > 1).alias("ef")
    )
    jp = jaccard_pairs(sh, candidates, threshold, verified=verified)
    near = (
        jp.select(F.col("doc_a").alias("doc_id"))
        .unionAll(jp.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("_nf", F.lit(1))
    )
    flags = exact.join(near, "doc_id", "left").select(
        "ef", F.col("_nf").isNotNull().alias("nf")
    )
    b = lambda c: c.cast("long")  # noqa: E731
    return flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(b(F.col("ef"))).alias("n_exact"),
        F.sum(b(F.col("nf"))).alias("n_near"),
        F.sum(b(F.col("ef") & F.col("nf"))).alias("n_both"),
        F.sum(b(F.col("ef") & ~F.col("nf"))).alias("n_only_exact"),
        F.sum(b(~F.col("ef") & F.col("nf"))).alias("n_only_near"),
        F.sum(b(~F.col("ef") & ~F.col("nf"))).alias("n_neither"),
    ).select(
        "n_docs", "n_exact", "n_near", "n_both", "n_only_exact",
        "n_only_near", "n_neither",
        round4(
            (F.col("n_both") + F.col("n_neither")) / F.col("n_docs")
        ).alias("agreement"),
    )


def build_dedup_index(
    docs: DataFrame, n: int = NGRAM, bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
) -> DataFrame:
    """The persisted dedup index of a corpus: one (doc_id, kind, key) row
    per probe key — ``kind='h'`` with the md5 content hash, plus
    ``kind='b<band>'`` with each LSH band bucket
    (:func:`minhash_buckets_rowwise`, so the whole index is a rowwise
    projection: ZERO shuffle to build, ~5 rows x 33 bytes per doc).

    This is the batch half of the registry the streaming LSH job keeps
    (streaming/jobs.py:streaming_lsh_bucket_registry): persist this
    table once per snapshot and every later ingest probes it without
    ever rescanning old document BODIES — the index is ~1e-4 of corpus
    bytes at 100 TB.  NULL-text docs contribute no keys (nothing can
    match them; they are still classified by the prober's left join).

    Shape (r12): ONE projection + explode — the md5 key and every band
    bucket come out of a single pass over each document, where the
    previous h-UNION-bands form scanned and tokenized the corpus twice
    (the union-duplicated-subtree anti-pattern the plan audit counts).
    Short/NULL docs keep their h row via a lazily-evaluated CASE guard
    around the band array (ANSI element_at would otherwise throw on
    docs with fewer than ``n`` words).
    """
    band_structs = F.array(
        *[
            F.struct(F.lit(f"b{b}").alias("kind"), m.alias("key"))
            for b, m in enumerate(_rowwise_band_minima(n, bands, rows))
        ]
    )
    empty = F.array().cast("array<struct<kind:string,key:string>>")
    keys = F.concat(
        F.array(
            F.struct(F.lit("h").alias("kind"), F.md5("text").alias("key"))
        ),
        F.when(F.size("w") >= F.lit(n), band_structs).otherwise(empty),
    )
    return (
        docs.select("doc_id", "text", F.split("text", " ").alias("w"))
        .select("doc_id", F.explode(keys).alias("kk"))
        .select("doc_id", F.col("kk.kind"), F.col("kk.key"))
        .filter(F.col("key").isNotNull())
    )


def incremental_dedup(index: DataFrame, new_docs: DataFrame,
                      n: int = NGRAM, bands: int = BANDS,
                      rows: int = ROWS_PER_BAND) -> DataFrame:
    """Incremental-corpus dedup: classify every NEW-snapshot document
    against the persisted index of the existing corpus
    (:func:`build_dedup_index`) — the 100 TB ingest workflow where the
    old corpus is never rescanned: only its index columns (content
    hashes + LSH band buckets) participate.

    Status per new doc:
    - ``exact_dup``  — its md5 matches an old doc's content hash;
    - ``near_dup``   — no exact match, but >= 1 LSH band bucket collides
                       with an old doc (the same candidate rule as
                       :func:`lsh_candidate_pairs`);
    - ``new``        — no probe key matches (including NULL-text docs,
                       which have no keys).

    ``matched_old_id`` = the smallest matching old doc_id (exact match
    preferred over near).  Columns: doc_id, status, matched_old_id.

    Plan: the new side builds the SAME (kind, key) probe rows rowwise,
    then ONE equi-join on (kind, key) against the index covers exact and
    near in a single pass — shuffle volume is bounded by probe-key
    multiplicity exactly like the LSH bucket join, never all-pairs, and
    the final classification is a doc_id-keyed partial agg + left join
    back to the snapshot universe.
    """
    probes = build_dedup_index(new_docs, n, bands, rows)
    hits = probes.join(
        index.select(
            F.col("doc_id").alias("old_id"), "kind", "key"
        ),
        ["kind", "key"],
    )
    agg = hits.groupBy("doc_id").agg(
        F.max((F.col("kind") == "h").cast("int")).alias("_exact"),
        F.min(F.when(F.col("kind") == "h", F.col("old_id"))).alias(
            "_exact_id"
        ),
        F.min(F.when(F.col("kind") != "h", F.col("old_id"))).alias(
            "_near_id"
        ),
    )
    return new_docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("_exact") == 1, F.lit("exact_dup"))
        .when(F.col("_near_id").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("new"))
        .alias("status"),
        F.when(F.col("_exact") == 1, F.col("_exact_id"))
        .otherwise(F.col("_near_id"))
        .alias("matched_old_id"),
    )


def derived_new_snapshot(docs: DataFrame) -> DataFrame:
    """The deterministic derived NEW snapshot both incremental-dedup
    driver rows classify (batch ``pipe_incremental_dedup``, streaming
    ``w10_stream_incremental_dedup`` — one snapshot, one oracle):
    doc_id%5==0 re-ingested verbatim under a new id (exact_dup), %5==1
    lightly edited (near_dup when LSH band minima survive), %5==2
    replaced by fresh md5-derived text (new)."""
    base = docs.select("doc_id", "text").filter(F.col("doc_id") % 5 < 3)
    return base.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.when(F.col("doc_id") % 5 == 0, F.col("text"))
        .when(F.col("doc_id") % 5 == 1, F.concat("text", F.lit(" extra")))
        .otherwise(F.concat(F.lit("fresh doc "), F.md5("text")))
        .alias("text"),
    )


BLOOM_BITS = 65536
BLOOM_HASHES = 4


def _bloom_positions(col: F.Column, k: int = BLOOM_HASHES,
                     m: int = BLOOM_BITS) -> F.Column:
    """Array of the ``k`` bloom bit positions for a text value: position j
    is the first 8 hex chars of md5("<j>:" || text) mod m — the engine's
    standard portable hex->int hash (DuckDB twin:
    ('0x' || substr(md5(...), 1, 8))::BIGINT % m)."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % m
            )
            for j in range(k)
        ]
    )


def bloom_prefilter(old_docs: DataFrame, new_docs: DataFrame,
                    k: int = BLOOM_HASHES, m: int = BLOOM_BITS) -> DataFrame:
    """Bloom-filter membership pre-screen for incremental ingest — the
    probabilistic fast path in front of :func:`incremental_dedup`'s exact
    probe: a new doc whose ``k`` bloom bits are NOT all set in the old
    corpus's filter is DEFINITELY new (no false negatives), so only the
    maybe-dup minority pays the exact index join.

    The filter is represented as the distinct SET-BIT relation (<= ``m``
    rows, i.e. <= 64k rows at the defaults — always broadcast-able, the
    whole point: at 100 TB the "filter" the probe join ships is KBs, not
    an index).  Membership = every probe bit present, checked as a
    broadcast semi-ish join + per-doc counting, never a bitmap UDF.

    Output per new doc: doc_id, maybe_dup, is_dup (exact md5 truth),
    false_positive (= maybe_dup AND NOT is_dup — the measurable FP rate
    that sizes m/k for a deployment).

    Plan: old side contributes ONLY bit positions and content hashes;
    probes are a rowwise k-array explode; ONE broadcast join on the bit
    id + one doc_id partial agg + one hash semi-join.  NULL-text docs
    have no probe bits and classify (maybe_dup=false, is_dup=false).
    """
    old_bits = (
        old_docs.filter(F.col("text").isNotNull())
        .select(F.explode(_bloom_positions(F.col("text"), k, m)).alias("bit"))
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    probes = (
        new_docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(_bloom_positions(F.col("text"), k, m))
            ).alias("bit"),
        )
    )
    checked = probes.join(F.broadcast(old_bits), "bit", "left").groupBy(
        "doc_id"
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.coalesce(F.col("_set"), F.lit(0))).alias("_hit"),
    )
    old_hashes = (
        old_docs.filter(F.col("text").isNotNull())
        .select(F.md5("text").alias("_h"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        new_docs.select("doc_id", F.md5("text").alias("_h"))
        .join(checked, "doc_id", "left")
        .join(old_hashes, "_h", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_n") == F.col("_hit"), F.lit(False)).alias(
                "maybe_dup"
            ),
            F.col("_dup").isNotNull().alias("is_dup"),
            (
                F.coalesce(F.col("_n") == F.col("_hit"), F.lit(False))
                & F.col("_dup").isNull()
            ).alias("false_positive"),
        )
    )


def containment_pairs(
    sh: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.0,
    verified: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT for LSH candidate pairs:
    C(A in B) = |A n B| / |A| and C(B in A) = |A n B| / |B| — the
    near-dup measure Jaccard misses when a small document is embedded in
    a much larger one (quote farms, aggregator pages): J(A,B) is tiny
    but C(A in B) ~ 1 (Broder 1997's containment, the companion measure
    to resemblance).

    Columns: doc_a, doc_b, containment_ab, containment_ba (round4);
    ``threshold`` filters on max(containment) when > 0.

    Scale: a projection of the shared :func:`verified_candidate_pairs`
    relation (pass it persisted via ``verified``) — the intersection
    runs ONLY on the LSH-bounded candidate set, no new quadratic
    surface.
    """
    if verified is None:
        verified = verified_candidate_pairs(sh, candidates)
    out = verified.select(
        "doc_a",
        "doc_b",
        round4(F.col("i") / F.col("n_a")).alias("containment_ab"),
        round4(F.col("i") / F.col("n_b")).alias("containment_ba"),
    )
    if threshold > 0:
        out = out.filter(
            F.greatest("containment_ab", "containment_ba") >= threshold
        )
    return out


def _rowwise_minima_cols(n: int = NGRAM, bands: int = BANDS,
                         rows: int = ROWS_PER_BAND) -> list[F.Column]:
    """The raw per-(band, row) minhash minima as rowwise columns
    (``m_<b>_<r>``) — the pre-bucket form of :func:`_rowwise_band_minima`,
    exposed for the estimator audit (same hash family, so the audit
    measures EXACTLY the signature the LSH path uses)."""
    grams = F.sequence(F.lit(1), F.size("w") - F.lit(n - 1))
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at("w", i + F.lit(j)) for j in range(n)]
    )
    return [
        F.array_min(
            F.transform(
                grams,
                lambda i: F.md5(F.concat(F.lit(f"{b}_{r}:"), shingle(i))),
            )
        ).alias(f"m_{b}_{r}")
        for b in range(bands)
        for r in range(rows)
    ]


def minhash_minima(
    docs: DataFrame,
    n: int = NGRAM,
    bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
) -> DataFrame:
    """Per-doc raw (band, row) minhash minima, wide (doc_id, m_<b>_<r>
    ...) — the signature table the estimator audit compares.  A pure
    rowwise projection (zero shuffle), but md5-heavy (bands*rows hashes
    per shingle position), so the registry materializes it once per
    corpus snapshot like shingles/candidates rather than re-deriving it
    per audit run."""
    d = docs.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= n
    )
    return d.select("doc_id", *_rowwise_minima_cols(n, bands, rows))


def minhash_estimate_audit(
    docs: DataFrame,
    sh: DataFrame,
    candidates: DataFrame,
    bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
    verified: DataFrame | None = None,
    mins: DataFrame | None = None,
) -> DataFrame:
    """Estimator-quality audit for the MinHash signature: for every LSH
    candidate pair, the CLASSIC minhash Jaccard estimate (fraction of
    the bands x rows per-(band,row) minima that agree — an unbiased
    estimator of J, Broder 1997) next to the exact shingle Jaccard, with
    the absolute error.  This is the dedup analog of the ANN recall rows:
    it measures how much the 8-hash signature can be trusted before a
    deployment tunes (bands, rows) — at 8 hashes the estimator is
    COARSE (granularity 1/8), which is exactly what the audit shows.

    Columns: doc_a, doc_b, est_jaccard (round4), jaccard (round4),
    abs_err (round4).

    Scale (100 TB): minima are rowwise projections (zero shuffle); the
    pair join ships 8 x 32-byte hashes per side for the already-bounded
    candidate set; exact Jaccard reuses the candidate-bounded verify
    join.  No new quadratic surface.
    """
    if mins is None:
        mins = minhash_minima(docs, NGRAM, bands, rows)
    names = [f"m_{b}_{r}" for b in range(bands) for r in range(rows)]
    a = mins.select(
        F.col("doc_id").alias("_a"),
        *[F.col(c).alias(f"a_{c}") for c in names],
    )
    b2 = mins.select(
        F.col("doc_id").alias("_b"),
        *[F.col(c).alias(f"b_{c}") for c in names],
    )
    agree = sum(
        (F.col(f"a_{c}") == F.col(f"b_{c}")).cast("int") for c in names
    )
    est = (
        candidates.select("doc_a", "doc_b")
        .join(a, F.col("_a") == F.col("doc_a"))
        .join(b2, F.col("_b") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            round4(agree.cast("double") / F.lit(len(names))).alias(
                "est_jaccard"
            ),
        )
    )
    exact = jaccard_pairs(sh, candidates, verified=verified)
    return est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        "jaccard",
        round4(F.abs(F.col("est_jaccard") - F.col("jaccard"))).alias(
            "abs_err"
        ),
    )


def canonical_map(pairs: DataFrame, quality: DataFrame) -> DataFrame:
    """Member -> keeper mapping for quality-aware survivorship: every
    clustered doc with its cluster's highest-quality member (doc_id
    tiebreak) — the join-able form of :func:`canonical_docs` that
    downstream tables remap through (see corpus.dedup_remap).

    The keeper is ONE unordered full-partition window max over
    struct(quality, -doc_id) — max quality, then min id — so the map
    needs no second join back onto the ranked members (one pass over
    the CC output).

    Columns: doc_id, component_id, kept_doc_id, quality (cluster
    members only; unclustered docs are absent and map to themselves
    at the remap site).  component_id and the member's quality ride
    along (r10) so the cluster REPORT
    (:func:`canonical_docs_from_map`) also serves from the
    materialized map instead of re-running the CC fixpoint.

    Scale (100 TB): the cluster fixpoint is the audited CC operator;
    the window partitions per component (cluster-sized, never global).
    """
    from pyspark.sql import Window

    cc = connected_components(pairs)
    members = cc.join(quality, "doc_id")
    w = Window.partitionBy("component_id")
    kd = F.max(
        F.struct(
            F.col("quality").alias("q"),
            (-F.col("doc_id")).alias("nid"),
        )
    ).over(w)
    return members.select(
        "doc_id",
        "component_id",
        (-kd.getField("nid")).cast("long").alias("kept_doc_id"),
        "quality",
    )


def canonical_docs_from_map(cmap: DataFrame) -> DataFrame:
    """:func:`canonical_docs`' cluster report served from the
    materialized survivorship map instead of a live CC fixpoint: one
    component-keyed partial agg over the members-only map relation —
    the keeper id is constant per component, the keeper's quality is
    the row where doc_id == kept_doc_id.  Output contract identical to
    canonical_docs (component_id, kept_doc_id, kept_quality,
    n_members, n_dropped), so the two share one oracle.

    Scale (100 TB): the map is dup-rate x corpus rows (cluster members
    only) and the agg is one hash shuffle on component_id — the
    expensive CC ran once at dedup time.
    """
    return (
        cmap.groupBy("component_id")
        .agg(
            F.min("kept_doc_id").alias("kept_doc_id"),
            F.min(
                F.when(
                    F.col("doc_id") == F.col("kept_doc_id"),
                    F.col("quality"),
                )
            ).alias("kept_quality"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "component_id",
            "kept_doc_id",
            "kept_quality",
            "n_members",
            (F.col("n_members") - 1).alias("n_dropped"),
        )
    )


def query_probe(
    index: DataFrame,
    corpus_shingles: DataFrame,
    query: DataFrame,
    n: int = NGRAM,
    bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
) -> DataFrame:
    """Query-by-document serving path: probe ONE document against the
    PERSISTED dedup index (:func:`build_dedup_index`) and exact-verify
    only the candidates — "find this doc's duplicates in the corpus"
    as an online lookup, the point-query twin of the batch
    :func:`incremental_dedup` classifier.

    Plan: the query's probe keys build rowwise (<= 1 + bands rows) and
    BROADCAST against the index — the corpus-sized side never shuffles;
    the Jaccard verify touches only the candidates' shingle rows (a
    doc_id semi-join against the materialized shingle table) against
    the broadcast query shingle set.  At 100 TB this is an index seek
    plus a handful of candidate reads, never a corpus scan.

    Output per candidate: doc_id, exact_hit (int), n_band_hits,
    jaccard (round4).
    """
    # The probe's intermediate relations are all CANDIDATE-bounded
    # (one doc's band hits / shingles) but each is consumed twice —
    # without truncation the consumers compounded to 12 pre-AQE parquet
    # scans (r11 plan audit).  Three KB-scale checkpoints collapse the
    # tree so the index seek and the candidate shingle read run once.
    qkeys = build_dedup_index(query, n, bands, rows)
    hits = (
        index.join(
            F.broadcast(qkeys.select("kind", "key").distinct()),
            ["kind", "key"],
        )
        .groupBy("doc_id")
        .agg(
            F.max((F.col("kind") == "h").cast("int")).alias("exact_hit"),
            F.sum((F.col("kind") != "h").cast("long")).alias("n_band_hits"),
        )
        .localCheckpoint(eager=False)
    )
    q_sh = (
        shingles_native(query, n)
        .select("sh")
        .distinct()
        .localCheckpoint(eager=False)
    )
    cand_sh = corpus_shingles.join(
        F.broadcast(hits.select("doc_id")), "doc_id", "semi"
    ).localCheckpoint(eager=False)
    sizes = cand_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("na"))
    inter = (
        cand_sh.join(F.broadcast(q_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    nq = q_sh.agg(F.count(F.lit(1)).alias("nq"))
    return (
        hits.join(sizes, "doc_id", "left")
        .join(inter, "doc_id", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            "doc_id",
            "exact_hit",
            "n_band_hits",
            round4(
                F.coalesce(F.col("i"), F.lit(0))
                / (
                    F.coalesce(F.col("na"), F.lit(0))
                    + F.col("nq")
                    - F.coalesce(F.col("i"), F.lit(0))
                )
            ).alias("jaccard"),
        )
    )


def source_overlap(
    docs: DataFrame,
    verified: DataFrame,
    threshold: float = 0.8,
) -> DataFrame:
    """Cross-source duplication panel: near-dup pairs (verified Jaccard
    >= ``threshold``) rolled up by canonical SOURCE pair — the
    corpus-card answer to "which feeds re-publish each other", which
    decides scraping priorities and per-source dedup budgets.

    One pass over the cached verified-pair relation
    (:func:`verified_candidate_pairs`, already materialized for the
    audit family), two doc_id-keyed source lookups, partial-agg to
    <= |sources|² rows.  ``same_source`` splits internal duplication
    from true cross-feed copying.

    Output: source_a, source_b (canonical order), same_source,
    n_pairs, avg_jaccard_micro (exact integer: per-pair Jaccard in
    micro-units, summed then integer-divided — no order-dependent
    float accumulation).
    """
    thr_micro = int(threshold * 1_000_000)
    j = verified.select(
        "doc_a",
        "doc_b",
        F.expr("(i * 1000000) div (n_a + n_b - i)").alias("j_micro"),
    ).filter(F.col("j_micro") >= thr_micro)
    src = docs.select("doc_id", "source")
    labeled = (
        j.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
    )
    return (
        labeled.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            (F.col("sa") == F.col("sb")).alias("same_source"),
            "j_micro",
        )
        .groupBy("source_a", "source_b", "same_source")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr("sum(j_micro) div count(1)").alias("avg_jaccard_micro"),
        )
    )


def dedup_mixture_shift(
    pairs: DataFrame | None,
    quality: DataFrame | None,
    docs: DataFrame,
    dropped: DataFrame | None = None,
) -> DataFrame:
    """What dedup DOES to the data mixture: per-language doc/token
    shares before vs after quality-aware near-dup survivorship — the
    audit that catches dedup silently reweighting the corpus
    (boilerplate-heavy sources lose disproportionately, so the
    post-dedup mixture is NOT the mixture you sampled; the mixture-
    weights step must run after dedup, and this row is the proof of
    how much it matters).

    Survivorship matches :func:`canonical_docs` exactly (same CC, same
    (quality desc, doc_id) keeper rule); docs outside any cluster are
    implicitly kept.  Shares are exact integer micro; shift_micro =
    share_after - share_before (negative = the language lost share).

    ``dropped`` is an optional precomputed (doc_id) relation of the
    survivorship losers (the registry feeds the materialized
    :func:`canonical_map` filtered to doc_id != kept_doc_id, so the CC
    fixpoint runs once per corpus snapshot, not once per audit).  The
    operator dedups it defensively — duplicate doc_ids would otherwise
    double-count in the *_before columns.  When omitted the operator
    derives it live from ``pairs`` + ``quality`` (both then required).

    Scale (r10 cost pass): the corpus is scanned and tokenized ONCE —
    the dropped flag attaches as an id-only left join and both mixture
    halves come out of a single conditional (lang) partial agg; the
    old shape's before/after/total subtrees each re-scanned and
    re-split the text column (up to 4 corpus scans).  The |langs|-row
    result is lazily checkpointed so the 1-row broadcast totals read
    it instead of re-deriving the corpus agg.

    Output: lang, docs_before, docs_after, tokens_before,
    tokens_after, share_before_micro, share_after_micro, shift_micro.
    """
    if dropped is None:
        if pairs is None or quality is None:
            raise ValueError(
                "dedup_mixture_shift: pass either a precomputed `dropped` "
                "relation or BOTH `pairs` and `quality` to derive it live"
            )
        from pyspark.sql import Window

        cc = connected_components(pairs)
        members = cc.join(quality, "doc_id")
        w = Window.partitionBy("component_id").orderBy(
            F.col("quality").desc(), F.col("doc_id")
        )
        dropped = (
            members.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") > 1)
            .select("doc_id")
        )
    # Enforce (not assume) the documented no-duplicates contract: the
    # dropped-flag attach is a plain left join, so a duplicated doc_id in
    # `dropped` would double-count that doc in docs_before/tokens_before.
    # Cost is bounded by dup-rate x corpus rows, dwarfed by the corpus agg.
    dropped = dropped.select("doc_id").distinct()
    dt = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    kept = F.col("_dropped").isNull()
    mix = (
        dt.join(
            dropped.select("doc_id", F.lit(1).alias("_dropped")),
            "doc_id",
            "left",
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs_before"),
            F.sum("n_tokens").alias("tokens_before"),
            F.count(F.when(kept, F.lit(1))).alias("docs_after"),
            F.coalesce(
                F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0)
            ).alias("tokens_after"),
        )
        .localCheckpoint(eager=False)
    )
    totals = mix.agg(
        F.sum("tokens_before").alias("total_b"),
        F.sum("tokens_after").alias("total_a"),
    )
    return (
        mix.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "docs_before",
            "docs_after",
            "tokens_before",
            "tokens_after",
            F.expr("(tokens_before * 1000000) div total_b").alias(
                "share_before_micro"
            ),
            F.expr("(tokens_after * 1000000) div total_a").alias(
                "share_after_micro"
            ),
        )
        .withColumn(
            "shift_micro",
            F.col("share_after_micro") - F.col("share_before_micro"),
        )
    )
