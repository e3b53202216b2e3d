"""Connected-components semantics on hand-built graphs (the cluster
resolution step after near-dup pair generation)."""

from __future__ import annotations

from zipkin_storage_kafka_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_chain_and_isolated_pair(spark):
    # chain 1-2-3-4 needs multiple propagation sweeps; 10-11 is isolated
    pairs = _pairs(spark, [(2, 1), (2, 3), (3, 4), (10, 11)])
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cluster_report(spark):
    pairs = _pairs(spark, [(5, 9), (9, 7), (20, 21)])
    rows = {r["component_id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows[5]["n_docs"] == 3 and rows[5]["member_ids"] == "5,7,9"
    assert rows[20]["n_docs"] == 2 and rows[20]["member_ids"] == "20,21"


def test_triangle_converges_first_sweep(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (1, 3)])
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(pairs, max_iters=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}
