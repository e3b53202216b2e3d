"""Regression: queries must work on a SparkSession the repo did not build.

The round-1 correctness harness built its own bare SparkSession (no
``session.get_spark``), and every events.parquet read threw
PARQUET_TYPE_ILLEGAL because ``spark.sql.legacy.parquet.nanosAsLong`` was
only set by the session factory.  ``load_table`` now sets the load-bearing
confs defensively; these tests pin that by *mis-setting* the confs on a
sibling session and asserting the read still works.
"""

from __future__ import annotations

import pytest

from zipkin_storage_kafka_spark.sources.tables import load_table


@pytest.fixture()
def hostile_session(spark):
    """A session whose load-bearing confs are deliberately wrong."""
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    return s


def test_load_events_on_misconfigured_session(hostile_session, sf_dir):
    df = load_table(hostile_session, sf_dir, "events")
    # Driver testdata has shipped ts as TIMESTAMP(NANOS) (surfaces as
    # bigint nanos under the legacy conf) and as timestamp[us] (surfaces
    # as timestamp_ntz); to_epoch_micros handles both, load_table must
    # read both.
    assert dict(df.dtypes)["ts"] in ("bigint", "timestamp_ntz", "timestamp")
    assert df.limit(1).count() == 1
    assert hostile_session.conf.get("spark.sql.session.timeZone") == "UTC"


def test_registry_query_on_misconfigured_session(hostile_session, sf_dir):
    from zipkin_storage_kafka_spark.plans import registry

    # q_service_names exercises the spans derivation (the exact path every
    # failed round-1 row died on).  Cache key includes the session, so this
    # builds fresh on the hostile session.
    df = registry.zipkin_queries()["s7_service_names"](hostile_session, sf_dir)
    assert df.count() > 0


def test_each_family_on_misconfigured_session(hostile_session, sf_dir):
    """One query per registry family (zipkin / pipeline / analytics /
    multimodal) runs on the hostile session — the env-dependence class of
    bug must be impossible for ANY family, not just the spans path."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in (
        "a2_trace_summaries",      # zipkin (materialized spans path)
        "dedup_minhash_lsh",       # pipeline (materialized shingle path)
        "text_mixture_weights",    # pipeline (documents direct)
        "h6_revenue_forecast",     # analytics (lineitem + date math)
        "ev_cohort_retention",     # analytics (events timestamp math)
        "mm_resize_meta",          # multimodal (binary + mapInPandas)
        "emb_kmeans_step",         # embeddings
        "z_critical_path",         # round-3 iterative (pointer doubling)
        "h9_product_profit",       # round-3 derived partsupp + year()
        "text_bpe_train",          # round-3 iterative vocab state
    ):
        assert qs[name](hostile_session, sf_dir).count() > 0, name


def test_entry_on_misconfigured_session(hostile_session):
    import __spark_entry__ as entrymod

    assert entrymod.entry(hostile_session).count() > 0
