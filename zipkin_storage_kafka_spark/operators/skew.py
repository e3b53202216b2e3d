"""Skew mitigation: two-phase salted aggregation.

AQE's skew handling covers joins (`spark.sql.adaptive.skewJoin.enabled`,
on in the session factory); a skewed GROUP BY key — one service producing
most spans, one user producing most events — still funnels every row of
that key through a single reduce partition.  Salting splits the hot key
across ``n_salts`` partial groups and re-combines:

    phase 1: groupBy(key, salt)  -> partial aggregates (hot key spread
             over n_salts partitions, each bounded)
    phase 2: groupBy(key)        -> combine partials (n_salts rows/key)

This only works for decomposable aggregates (sum/count/min/max — the
combine is the same function over partials).  The deterministic salt
(hash of a row-unique column, not rand()) keeps results reproducible and
oracle-checkable.

The reference never needed this — Kafka Streams shards by key and a hot
key just hotspots one task (no mitigation exists there); this is part of
the engine's 100 TB hardening.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_counts(
    df: DataFrame,
    key: str,
    count_col: str = "n",
    salt_src: str | Column | None = None,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Salted count-per-key: (key, n).  ``salt_src`` is any row-unique-ish
    column used to derive the deterministic salt (defaults to the key of a
    monotonically increasing id — pass a real column for reproducibility
    across runs; tests use the record id)."""
    if salt_src is None:
        salt_src = F.monotonically_increasing_id()
    elif isinstance(salt_src, str):
        salt_src = F.col(salt_src)
    salt = F.pmod(F.hash(salt_src), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(count_col))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_src: str | Column,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Hot-key equi-join salting: split the skewed LEFT side's hot keys
    across ``n_salts`` sub-keys and REPLICATE the (small-ish) right side
    once per salt, so no single reduce task owns a whole hot key.  The
    complement of AQE's skew-join (which only splits at runtime when
    statistics reveal the skew — salting is the static form you reach for
    when the hot key is known, e.g. the null-bucket or a mega-tenant).

    The salt is a deterministic hash of ``salt_src`` (a row-unique-ish
    LEFT column), never rand(): results are reproducible and the
    equivalence to the unsalted join is testable.  Right-side replication
    multiplies its shuffle volume by n_salts — use for right sides well
    under left/n_salts.

    Returns the joined frame with internal salt columns dropped;
    equivalence pinned in test_properties.py::test_salted_join_equivalence.
    """
    # Both salt paths must yield a NON-NULL value in [0, n_salts) for every
    # row: hash() can return Integer.MIN_VALUE (abs stays negative, so pmod
    # not abs-%), and a NULL salt_src must still salt (coalesce to '') — a
    # NULL or out-of-range salt would silently drop rows from the inner
    # join on _salt, breaking equivalence to the unsalted join.
    src = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    salt = F.expr(
        f"CAST(conv(substr(md5(coalesce(CAST({salt_src} AS STRING), '')),"
        f" 1, 8), 16, 10) AS BIGINT) % {n_salts}"
    ) if isinstance(salt_src, str) else (
        F.pmod(
            F.hash(F.coalesce(src.cast("string"), F.lit(""))), F.lit(n_salts)
        ).cast("bigint")
    )
    left2 = left.withColumn("_salt", salt)
    right2 = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)])),
    )
    joined = left2.join(right2, [on, "_salt"])
    return joined.drop("_salt")


def shuffle_key_skew(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Shuffle-key skew audit: for each candidate partitioning key,
    the distribution shape of rows-per-key — the panel that decides
    WHEN to reach for :func:`salted_counts` / :func:`salted_join` or
    AQE's skew thresholds.  The diagnosis half of this module's cure.

    Per key column (one output row each): distinct key count, total
    rows, the hottest key's row count, its share of the table
    (``top1_share_micro``), its ratio to the mean key size
    (``skew_vs_mean_micro``, 1e6 = perfectly uniform), and how many
    keys exceed 10x the mean (``hot_keys_10x`` — the keys AQE's
    skew-join splitter or a salt map would target).

    All exact integer math (counts and ``div`` ratios).  Scale: one
    hash-shuffle groupBy per key column produces the |keys|-row count
    relation; the stats row is a partial agg of THAT (never the
    corpus), and the hot-key recount joins the broadcast 1-row stats
    back to the count relation.  NULL keys are excluded (they are the
    null-bucket problem, audited separately by the join-salting path).
    """
    out = None
    for key in key_cols:
        counts = (
            df.filter(F.col(key).isNotNull())
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        stats = counts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
            F.max("cnt").alias("max_rows"),
        )
        hot = (
            counts.crossJoin(F.broadcast(stats))
            .filter(F.col("cnt") * F.col("n_keys") > F.lit(10) * F.col("total_rows"))
            .agg(F.count(F.lit(1)).alias("hot_keys_10x"))
        )
        row = stats.crossJoin(F.broadcast(hot)).select(
            F.lit(key).alias("key_name"),
            "n_keys",
            "total_rows",
            "max_rows",
            F.expr("(max_rows * 1000000) div total_rows").alias(
                "top1_share_micro"
            ),
            F.expr("(max_rows * n_keys * 1000000) div total_rows").alias(
                "skew_vs_mean_micro"
            ),
            "hot_keys_10x",
        )
        out = row if out is None else out.unionByName(row)
    return out
