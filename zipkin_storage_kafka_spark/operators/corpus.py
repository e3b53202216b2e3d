"""Corpus-management operators: cross-modality alignment audits and
snapshot diffs — the data-quality bookkeeping a training-data pipeline
runs between ingest and training (which ids have every modality? what
changed since the last snapshot?).

Scale design (100 TB): both operators are single equi-joins on the id —
full outer with rowwise status projection — followed by a partial-agged
count.  No window, no explode, no driver collect; the join co-partitions
with every other id-keyed stage.  Content comparison is md5 (the engine's
standard portable content hash), so the diff never shuttles document
bodies through the shuffle — 32-byte hashes only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def alignment_audit(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Doc <-> embedding alignment: which doc_ids have an embedding row
    (vec_id) and which rows of either table are orphans.  Multimodal
    pipelines run this after every embedding job — silent id drift
    (a failed embedding shard, a re-keyed ingest) shows up here first.

    Output: one row per status in {aligned, doc_only, vec_only}:
    status, n, min_id, max_id.
    """
    d = docs.select(F.col("doc_id").alias("id")).withColumn(
        "_d", F.lit(1)
    )
    v = embeddings.select(F.col("vec_id").alias("id")).withColumn(
        "_v", F.lit(1)
    )
    joined = d.join(v, "id", "full_outer")
    status = (
        F.when(F.col("_d").isNotNull() & F.col("_v").isNotNull(), "aligned")
        .when(F.col("_d").isNotNull(), "doc_only")
        .otherwise("vec_only")
    )
    return (
        joined.select("id", status.alias("status"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
    )


def corpus_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot delta by content hash: classify every doc_id across two
    corpus snapshots as added / removed / changed / unchanged — the delta
    report an incremental ingest emits so downstream jobs (dedup index,
    embeddings) reprocess only what moved.

    Output: doc_id, status.  Only the md5 of the text crosses the join
    (32 bytes/doc), never the bodies.

    Row presence is tracked by explicit markers, not hash nullness: a
    doc PRESENT with NULL text has a NULL md5, and conflating that with
    an absent row would misreport it added/removed (the same
    absence-vs-NULL discipline as :func:`alignment_audit`).
    """
    o = old.select(
        "doc_id", F.md5("text").alias("_oh")
    ).withColumn("_in_old", F.lit(1))
    n = new.select(
        "doc_id", F.md5("text").alias("_nh")
    ).withColumn("_in_new", F.lit(1))
    joined = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(F.col("_oh").eqNullSafe(F.col("_nh")), "unchanged")
        .otherwise("changed")
    )
    return joined.select("doc_id", status.alias("status"))


def reembed_queue(diff: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Embedding work queue from a snapshot diff: the docs the embedding
    job must (re)process = added/changed docs from :func:`corpus_diff`
    PLUS surviving docs whose id has no vector row at all (a failed
    earlier shard) — the incremental-maintenance composition that keeps
    a 100 TB embedding table in sync without re-embedding the unchanged
    mass.

    Columns: doc_id, reason ('added' | 'changed' | 'missing_vector').
    Removed docs are excluded (their vectors get dropped by the
    alignment sweep, not re-queued).

    Plan: one distinct on the embedding ids (hash partial agg) + one
    doc_id left join over the diff output — both co-partition with every
    other id-keyed stage; no bodies move.
    """
    have = (
        embeddings.select(F.col("vec_id").alias("doc_id"))
        .distinct()
        .withColumn("_v", F.lit(1))
    )
    return (
        diff.filter(F.col("status") != "removed")
        .join(have, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                F.col("status").isin("added", "changed"), F.col("status")
            )
            .when(F.col("_v").isNull(), F.lit("missing_vector"))
            .alias("reason"),
        )
        .filter(F.col("reason").isNotNull())
    )


def dedup_remap(embeddings: DataFrame, cmap: DataFrame) -> DataFrame:
    """Propagate dedup survivorship into a downstream id-keyed table:
    each embedding row is pointed at its cluster's canonical doc (or
    itself when unclustered / already the keeper) — the rewrite step
    that keeps serving indexes and training manifests consistent with
    the dedup decision instead of referencing dropped documents.

    Columns: vec_id, canonical_doc_id, redirected.

    Scale (100 TB): one left equi-join on the id; the map side is the
    cluster-members-only relation (tiny next to the corpus — dup rate x
    corpus), so it broadcasts where stats allow and co-partitions with
    every other id-keyed stage otherwise.  Vectors never move.
    """
    m = cmap.select(
        F.col("doc_id").alias("vec_id"), F.col("kept_doc_id")
    )
    canonical = F.coalesce(F.col("kept_doc_id"), F.col("vec_id"))
    return (
        embeddings.select("vec_id")
        .join(m, "vec_id", "left")
        .select(
            "vec_id",
            canonical.alias("canonical_doc_id"),
            (canonical != F.col("vec_id")).alias("redirected"),
        )
    )


def profile_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Ingest-batch data-quality profile drift (the Deequ/profiling
    class): the same four column-profile metrics computed over the
    EXISTING corpus and the INCOMING snapshot, side by side with their
    delta — the gate a pipeline owner reads before merging a batch
    ("tonight's crawl is 40% shorter on average and 10% null — hold
    the merge").

    Metrics over the ``text`` column: n_rows, null_text_micro and
    avg_len_micro are exact BIGINT (micro-rates are integer division,
    so the row never hash-flips); n_distinct counts distinct md5
    digests rather than distinct texts, so it is probabilistically
    exact — a 128-bit hash's birthday bound puts a collision at ~2^-64
    odds even at corpus scale, negligible but not strict.

    Output: metric, base_value, new_value, delta — 4 rows.

    Scale (100 TB): one profile agg per corpus (a single partial agg
    to ONE row each; the exact count_distinct is the only expand — at
    sketch scale swap it for the HLL flavor the z_hll rows already
    serve), then a 4-row stack comparison.  The incoming batch is
    usually orders of magnitude smaller than the corpus, and the
    corpus-side profile is a once-per-snapshot materialization.
    r10: the distinct-text count runs over md5 digests from a narrow
    pre-projection (null flag, length, 32-char hash), so the Expand
    the mixed count_distinct forces duplicates 40-byte rows instead
    of full document bodies, and the distinct partial-agg's hash
    table keys on digests, never texts (the ~2^-64 birthday-bound
    collision odds above are the price).
    """

    def prof(df: DataFrame):
        narrow = df.select(
            F.col("text").isNull().cast("long").alias("_is_null"),
            F.coalesce(F.length("text"), F.lit(0))
            .cast("long")
            .alias("_len"),
            F.md5("text").alias("_h"),
        )
        return narrow.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_is_null").alias("nulls"),
            F.sum("_len").alias("len_sum"),
            F.countDistinct("_h").alias("n_distinct"),
        ).select(
            F.col("n"),
            F.expr("nulls * 1000000 div n").alias("null_micro"),
            F.expr(
                "CASE WHEN n - nulls > 0"
                " THEN len_sum * 1000000 div (n - nulls) ELSE 0 END"
            ).alias("avg_len_micro"),
            F.col("n_distinct"),
        )

    b = prof(old).select(
        F.lit(1).alias("_j"),
        F.col("n").alias("b_n"),
        F.col("null_micro").alias("b_null"),
        F.col("avg_len_micro").alias("b_len"),
        F.col("n_distinct").alias("b_dis"),
    )
    nw = prof(new).select(
        F.lit(1).alias("_j"),
        F.col("n").alias("n_n"),
        F.col("null_micro").alias("n_null"),
        F.col("avg_len_micro").alias("n_len"),
        F.col("n_distinct").alias("n_dis"),
    )
    joined = b.join(F.broadcast(nw), "_j")
    stacked = joined.select(
        F.expr(
            "stack(4,"
            " 'n_rows', b_n, n_n,"
            " 'null_text_micro', b_null, n_null,"
            " 'avg_len_micro', b_len, n_len,"
            " 'distinct_text', b_dis, n_dis"
            ") AS (metric, base_value, new_value)"
        )
    )
    return stacked.withColumn(
        "delta", F.col("new_value") - F.col("base_value")
    )
