"""Round-8 fixtures: the pair-budgeted SemDeDup audit, the
span-overhang containment panel, zone-map pruning, power-iteration
PCA, and the table-checksum integrity fingerprint."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_span_overhang_fixture(spark):
    """Hand-computed containment: child b outlives parent a by 5us,
    child c is contained; per-edge counters are exact integers."""
    from zipkin_storage_kafka_spark.operators.dependency_links import (
        span_overhang,
    )

    rows = [
        # trace t1: a(10..30) -> b(20..35): overhang 5
        ("t1", "a", None, 10, 20, "svc_p"),
        ("t1", "b", "a", 20, 15, "svc_c"),
        # trace t2: a(0..100) -> c(10..50): contained
        ("t2", "a", None, 0, 100, "svc_p"),
        ("t2", "c", "a", 10, 40, "svc_c"),
        # NULL duration child counts as zero-length (coalesce)
        ("t3", "a", None, 0, 10, "svc_p"),
        ("t3", "d", "a", 5, None, "svc_c"),
    ]
    df = spark.createDataFrame(
        rows,
        "trace_id string, id string, parent_id string, timestamp long,"
        " duration long, local_service string",
    )
    out = {
        (r["parent"], r["child"]): r for r in span_overhang(df).collect()
    }
    r = out[("svc_p", "svc_c")]
    assert r["n_calls"] == 3
    assert r["n_overhangs"] == 1
    assert r["max_overhang_us"] == 5
    assert r["overhang_rate_micro"] == 1_000_000 // 3


def test_span_overhang_all_contained_clamps_to_zero(spark):
    """max_overhang_us is clamped at 0 when every child is contained
    (greatest(max(neg), 0)), so the panel never reports negative
    overhang."""
    from zipkin_storage_kafka_spark.operators.dependency_links import (
        span_overhang,
    )

    rows = [
        ("t1", "a", None, 0, 100, "p"),
        ("t1", "b", "a", 10, 10, "c"),
    ]
    df = spark.createDataFrame(
        rows,
        "trace_id string, id string, parent_id string, timestamp long,"
        " duration long, local_service string",
    )
    r = span_overhang(df).collect()[0]
    assert (r["n_overhangs"], r["max_overhang_us"]) == (0, 0)


def test_zone_map_prune_matches_python(spark, sf_dir):
    """Both layouts' shard counts / scanned rows / matches equal a plain
    python recompute over the raw parquet."""
    import duckdb

    from zipkin_storage_kafka_spark.operators.analytics import (
        ZONE_MAP_HI_US,
        ZONE_MAP_LO_US,
        ZONE_MAP_SHARD_US,
        zone_map_prune,
    )

    rows = duckdb.sql(
        f"SELECT l_orderkey, epoch_us(l_shipdate) AS sd"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    from collections import defaultdict

    for layout, shard_of in (
        ("hash", lambda k, s: k % 32),
        ("date", lambda k, s: s // ZONE_MAP_SHARD_US),
    ):
        shards = defaultdict(lambda: [0, 0, None, None])
        for k, s in rows:
            st = shards[shard_of(k, s)]
            st[0] += 1
            st[1] += 1 if ZONE_MAP_LO_US <= s < ZONE_MAP_HI_US else 0
            st[2] = s if st[2] is None else min(st[2], s)
            st[3] = s if st[3] is None else max(st[3], s)
        pruned = {
            sh
            for sh, st in shards.items()
            if st[3] < ZONE_MAP_LO_US or st[2] >= ZONE_MAP_HI_US
        }
        got = {
            r["layout"]: r for r in zone_map_prune(spark, sf_dir).collect()
        }[layout]
        assert got["n_shards"] == len(shards)
        assert got["shards_scanned"] == len(shards) - len(pruned)
        assert got["rows_total"] == len(rows)
        assert got["rows_scanned"] == sum(
            st[0] for sh, st in shards.items() if sh not in pruned
        )
        assert got["rows_matched"] == sum(st[1] for st in shards.values())


def test_zone_map_prune_single_fact_scan(spark, sf_dir):
    """The two layouts stack inside ONE lineitem scan — the plan must
    contain exactly one parquet scan of the fact."""
    from zipkin_storage_kafka_spark.operators.analytics import zone_map_prune

    plan = (
        zone_map_prune(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1


def test_pca_power_recovers_dominant_direction(spark):
    """On an embedded rank-1 signal (+noise-free), 3 sweeps recover the
    planted direction up to sign and round4, and lambda_hat approximates
    the planted variance."""
    from zipkin_storage_kafka_spark.operators.similarity import pca_power

    d = 8
    direction = [1.0 if i == 2 else 0.0 for i in range(d)]
    rows = []
    for s in range(-5, 6):  # symmetric scalars -> zero mean, pure PC
        rows.append((s + 5, [s * direction[i] for i in range(d)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["i"]: r for r in pca_power(df).collect()}
    comps = [out[i + 1]["pc"] for i in range(d)]
    # dominant component is +-1 on axis 2, ~0 elsewhere
    assert abs(abs(comps[2]) - 1.0) < 1e-3
    for i in range(d):
        if i != 2:
            assert abs(comps[i]) < 1e-3
    # planted variance: E[s^2] = mean of s^2 over -5..5 = 10
    lam = out[1]["lambda_hat"]
    assert abs(lam - 10.0) < 0.05


def test_table_checksums_matches_python(spark, sf_dir):
    """The (n_rows, key_checksum) pair for every table equals a plain
    python md5 recompute — the cross-engine contract the operator
    exists to provide."""
    import hashlib

    import duckdb

    from zipkin_storage_kafka_spark.operators.analytics import (
        CHECKSUM_MOD,
        table_checksums,
    )

    got = {r["tbl"]: r for r in table_checksums(spark, sf_dir).collect()}
    assert len(got) == 10
    for tbl, key_sql in (
        ("region", "CAST(r_regionkey AS VARCHAR)"),
        ("lineitem", "l_orderkey || ':' || l_linenumber"),
        ("documents", "CAST(doc_id AS VARCHAR)"),
    ):
        keys = [
            r[0]
            for r in duckdb.sql(
                f"SELECT {key_sql} FROM '{sf_dir}/{tbl}.parquet'"
            ).fetchall()
        ]
        chk = sum(
            int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % CHECKSUM_MOD
            for k in keys
        )
        assert got[tbl]["n_rows"] == len(keys)
        assert got[tbl]["key_checksum"] == chk


def test_semantic_fold_audit_subset_of_full_run(spark):
    """When the audited cells are smaller than the member cap (every
    test/driver scale), the budgeted audit row's keep decisions equal
    the FULL fold run restricted to the audited cells (cell-locality —
    whole-cell sampling loses coverage, never fidelity)."""
    from zipkin_storage_kafka_spark.operators.similarity import (
        ivf_assignments,
        ivf_centroids,
        semantic_audit_members,
        semantic_dedup,
    )

    rows = []
    for v in range(40):
        base = [math.sin(0.1 * v + 0.3 * i) for i in range(8)]
        rows.append((v, base, v % 3))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    centroids = ivf_centroids(emb)
    assign = ivf_assignments(emb, centroids)
    full = {
        r["vec_id"]: (r["cell"], r["keep"])
        for r in semantic_dedup(emb, centroids=centroids, assign=assign).collect()
    }
    members = semantic_audit_members(assign, 120, member_cap=40)
    cells = {r["label"] for r in members.collect()}
    assert cells  # smallest cell always audited
    # member_cap=40 disables within-cell capping here, so the audit
    # universe is whole cells (the budget walk still restricts WHICH
    # cells) and fidelity vs the full run is exact
    audited = {
        r["vec_id"]: (r["cell"], r["keep"])
        for r in semantic_dedup(
            emb, centroids=centroids, assign=members
        ).collect()
    }
    assert audited == {
        v: ck for v, ck in full.items() if ck[0] in cells
    }


def test_multitouch_credit_conservation(spark, sf_dir):
    """Linear credit is conserved exactly: sum over the linear scheme =
    1e6 x the number of conversions with >= 1 touch in the lookback
    (integer remainder assigned to the most recent touch); the last
    scheme trivially conserves the same total."""
    from zipkin_storage_kafka_spark.operators.analytics import (
        multitouch_attribution,
    )

    rows = multitouch_attribution(spark, sf_dir).collect()
    by_scheme = {}
    for r in rows:
        by_scheme.setdefault(r["scheme"], 0)
        by_scheme[r["scheme"]] += r["credit_micro"]
    assert by_scheme["linear"] == by_scheme["last"]
    assert by_scheme["linear"] % 1_000_000 == 0
    n_last = sum(r["n_touches"] for r in rows if r["scheme"] == "last")
    assert by_scheme["last"] == n_last * 1_000_000


def test_multitouch_fixture(spark, tmp_path):
    """Hand-computed: purchase at day 10 with clicks at days 4, 9 ->
    k=2, most recent (day 9, lag 1) gets 500000, day-4 click (lag 6)
    gets 500000; a click 8 days before is outside the 7-day lookback."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zipkin_storage_kafka_spark.operators.analytics import (
        multitouch_attribution,
    )

    day = 86_400_000_000
    evs = [
        # (event_id, ts_us, user_id, event_type)
        (1, 2 * day, 7, "click"),    # 8 days before: excluded
        (2, 4 * day, 7, "click"),    # lag 6
        (3, 9 * day, 7, "click"),    # lag 1, most recent
        (4, 10 * day, 7, "purchase"),
        (5, 3 * day, 8, "view"),     # other user, no purchase
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([e[0] for e in evs], pa.int64()),
            "ts": pa.array(
                [e[1] for e in evs], pa.timestamp("us")
            ),
            "user_id": pa.array([e[2] for e in evs], pa.int64()),
            "event_type": pa.array([e[3] for e in evs]),
            "value": pa.array([1.0] * len(evs)),
            "props": pa.array(['{"k":"1"}'] * len(evs)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = {
        (r["scheme"], r["lag_days"]): r
        for r in multitouch_attribution(spark, str(tmp_path)).collect()
    }
    assert out[("linear", 1)]["credit_micro"] == 500_000
    assert out[("linear", 6)]["credit_micro"] == 500_000
    assert out[("last", 1)]["credit_micro"] == 1_000_000
    assert ("linear", 8) not in out
    assert len(out) == 3


def test_ivf_nlist_recall_cost_monotone(spark, sf_dir):
    """Coarser quantizers (smaller nlist) probe MORE rows per query —
    probed_rows must be non-increasing in nlist, recall in [0,1], and
    nlist=|labels| must reproduce the plain single-probe IVF cell."""
    from zipkin_storage_kafka_spark.operators.similarity import (
        IVF_NLISTS,
        ivf_nlist_recall,
    )
    from zipkin_storage_kafka_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = ivf_nlist_recall(emb, 1, 10).collect()
    assert [r["nlist"] for r in rows] == sorted(IVF_NLISTS)
    probed = [r["probed_rows"] for r in rows]
    assert probed == sorted(probed, reverse=True)
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_hits"] <= r["k"]
        # a probe can't return more hits than it scanned
        assert r["n_hits"] <= r["probed_rows"]


def test_compaction_plan_conserves_and_groups(spark, sf_dir):
    """Compaction groups conserve files/docs/bytes exactly, group bytes
    land near the target (every group except possibly the last spans
    >= target once it has 2+ files... the invariant actually pinned:
    group_start = cum_start div target means group_bytes <= target +
    max_file_bytes), and needs_merge marks exactly the multi-file
    groups."""
    from zipkin_storage_kafka_spark.operators.text_analysis import (
        COMPACT_INGEST_BYTES,
        SHARD_TARGET_BYTES,
        compaction_plan,
        shard_plan,
    )
    from zipkin_storage_kafka_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    files = shard_plan(docs, COMPACT_INGEST_BYTES).collect()
    groups = compaction_plan(docs).collect()
    assert sum(g["n_files"] for g in groups) == len(files)
    assert sum(g["n_docs"] for g in groups) == sum(f["n_docs"] for f in files)
    assert sum(g["group_bytes"] for g in groups) == sum(
        f["shard_bytes"] for f in files
    )
    max_file = max(f["shard_bytes"] for f in files)
    for g in groups:
        assert g["needs_merge"] == (g["n_files"] > 1)
        assert g["group_bytes"] <= SHARD_TARGET_BYTES + max_file
    # python recompute of the group assignment
    from collections import defaultdict

    expect = defaultdict(lambda: [0, 0, 0])
    cum = 0
    for f in sorted(files, key=lambda f: f["shard_id"]):
        gid = cum // SHARD_TARGET_BYTES
        expect[gid][0] += 1
        expect[gid][1] += f["n_docs"]
        expect[gid][2] += f["shard_bytes"]
        cum += f["shard_bytes"]
    got = {g["group_id"]: [g["n_files"], g["n_docs"], g["group_bytes"]] for g in groups}
    assert got == dict(expect)


def test_pca_explained_consistent_with_power(spark):
    """explained_micro = floor(lambda_hat * 1e6 / total_var) on the
    planted rank-1 corpus, where PC1 carries ALL the variance
    (explained ~ 1.0)."""
    from zipkin_storage_kafka_spark.operators.similarity import (
        pca_explained,
    )

    d = 8
    rows = []
    for s in range(-5, 6):
        rows.append((s + 5, [float(s) if i == 2 else 0.0 for i in range(d)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = pca_explained(df).collect()[0]
    assert abs(r["total_var"] - 10.0) < 0.01
    assert 990_000 <= r["explained_micro"] <= 1_000_100


def test_discount_elasticity_matches_numpy_fixture(spark, tmp_path):
    """Hand-plantable OLS: brand A has a perfect +2 qty per discount
    cent (slope 200 per full unit, corr 1.0); brand B is flat (dropped
    by the variance guard when discount never varies)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zipkin_storage_kafka_spark.operators.analytics import (
        discount_elasticity,
    )

    li_rows = [
        # brand A: qty = 2 * cents + 1
        (1, 0.01, 3.0), (1, 0.02, 5.0), (1, 0.04, 9.0),
        # brand B: discount constant -> zero x-variance -> dropped
        (2, 0.05, 7.0), (2, 0.05, 11.0),
    ]
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in li_rows], pa.int64()),
                "l_discount": pa.array([r[1] for r in li_rows]),
                "l_quantity": pa.array([r[2] for r in li_rows]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_brand": pa.array(["Brand#A", "Brand#B"]),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    rows = {
        r["brand"]: r
        for r in discount_elasticity(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"Brand#A"}
    a = rows["Brand#A"]
    assert a["n_lines"] == 3
    assert abs(a["slope_round4"] - 200.0) < 1e-9
    assert abs(a["corr_round4"] - 1.0) < 1e-9


def test_weighted_median_matches_python(spark, sf_dir):
    """Exact lower weighted median per nation equals a plain python
    recompute over the raw parquet."""
    import duckdb

    from zipkin_storage_kafka_spark.operators.analytics import (
        weighted_median_price,
    )

    rows = duckdb.sql(
        f"""
        SELECT n.n_name,
               CAST(round(l_extendedprice * 100) AS BIGINT),
               CAST(round(l_quantity) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' li
        JOIN '{sf_dir}/supplier.parquet' s ON s.s_suppkey = li.l_suppkey
        JOIN '{sf_dir}/nation.parquet' n ON n.n_nationkey = s.s_nationkey
        """
    ).fetchall()
    from collections import defaultdict

    cells = defaultdict(lambda: defaultdict(int))
    for nat, p, q in rows:
        cells[nat][p] += q
    expect = {}
    for nat, ws in cells.items():
        total = sum(ws.values())
        cum = 0
        for p in sorted(ws):
            cum += ws[p]
            if 2 * cum >= total:
                expect[nat] = (total, p)
                break
    got = {
        r["nation"]: (r["total_qty"], r["median_price_cents"])
        for r in weighted_median_price(spark, sf_dir).collect()
    }
    assert got == expect


def test_promo_lift_did_identity(spark, sf_dir):
    """The DiD equals the difference of per-group deltas recomputed from
    the row's own cells (an internal-consistency identity that fails if
    any of the four integer means is computed over the wrong cell)."""
    from zipkin_storage_kafka_spark.operators.analytics import (
        promo_lift_did,
    )

    r = promo_lift_did(spark, sf_dir).collect()[0]
    assert r["did_micro"] == (
        r["promo_after_micro"] - r["promo_before_micro"]
    ) - (r["other_after_micro"] - r["other_before_micro"])
    assert min(
        r["n_promo_before"], r["n_promo_after"],
        r["n_other_before"], r["n_other_after"],
    ) > 0


def test_mad_anomalies_matches_python(spark, sf_dir):
    """Median, MAD, and Hampel flag counts per service equal a plain
    python recompute over the derived spans."""
    from zipkin_storage_kafka_spark.operators.indexes import (
        MAD_K_MICRO,
        mad_anomalies,
    )
    from zipkin_storage_kafka_spark.sources.spans import spans_from_events

    rows = [
        (r["local_service"], r["duration"])
        for r in spans_from_events(spark, sf_dir)
        .select("local_service", "duration")
        .collect()
        if r["local_service"] is not None and r["duration"] is not None
    ]
    from collections import defaultdict

    by_svc = defaultdict(list)
    for s, d in rows:
        by_svc[s].append(d)

    def lower_median(vals):
        vals = sorted(vals)
        total = len(vals)
        cum = 0
        # weighted median with unit weights == value at 2*rank >= n
        for i, v in enumerate(vals, 1):
            if 2 * i >= total:
                return v

    got = {r["local_service"]: r for r in mad_anomalies(
        spans_from_events(spark, sf_dir)).collect()}
    assert set(got) == set(by_svc)
    for s, ds in by_svc.items():
        med = lower_median(ds)
        mad = lower_median([abs(d - med) for d in ds])
        n_anom = sum(1 for d in ds if abs(d - med) * 1_000_000 > MAD_K_MICRO * mad)
        r = got[s]
        assert (r["n_spans"], r["median_duration"], r["mad"], r["n_anomalies"]) == (
            len(ds), med, mad, n_anom
        )


def test_next_basket_rules_fixture(spark, tmp_path):
    """Planted sequence: customer 1 orders brand X then brand Y twice
    (one X->Y transition, one Y->Y), customer 2 orders brand Z twice
    (one Z->Z); the X->Y rule gets n_seq_pairs=1 with lift above
    independence (1*3e6 // (1*2) = 1.5e6)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zipkin_storage_kafka_spark.operators.analytics import (
        next_basket_rules,
    )

    day = 86_400_000_000
    orders = [(1, 1, 1 * day), (2, 1, 2 * day), (3, 1, 3 * day),
              (4, 2, 1 * day), (5, 2, 2 * day)]
    pq.write_table(pa.table({
        "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
        "o_orderdate": pa.array([o[2] for o in orders], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    # cust1: X -> Y -> Y (pairs: (1,2): X->Y ; (2,3): Y->Y)
    # cust2: Z -> Z      (pair (4,5): Z->Z)
    li = [(1, 10), (2, 20), (3, 20), (4, 30), (5, 30)]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_partkey": pa.array([r[1] for r in li], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([10, 20, 30], pa.int64()),
        "p_brand": pa.array(["X", "Y", "Z"]),
    }), str(tmp_path / "part.parquet"))
    rows = {(r["brand_a"], r["brand_b"]): r
            for r in next_basket_rules(spark, str(tmp_path)).collect()}
    assert set(rows) == {("X", "Y"), ("Y", "Y"), ("Z", "Z")}
    xy = rows[("X", "Y")]
    # T=3 pairs; n_a(X)=1, n_b(Y)=2, n_seq=1 -> lift = 1*3*1e6 // 2
    assert (xy["n_seq_pairs"], xy["n_a"], xy["n_b"]) == (1, 1, 2)
    assert xy["lift_micro"] == 1_500_000


def test_incremental_links_equal_full_merge(spark, sf_dir):
    """Per-batch counter merge equals merge_links exactly for ANY batch
    count (counter addition is associative; batches are trace-atomic)."""
    from zipkin_storage_kafka_spark.operators.dependency_links import (
        incremental_links_merge,
        merge_links,
    )
    from zipkin_storage_kafka_spark.sources.spans import links_table

    links = links_table(spark, sf_dir)
    full = {
        (r["parent"], r["child"]): (r["call_count"], r["error_count"])
        for r in merge_links(links).collect()
    }
    for n in (1, 3, 7):
        inc = {
            (r["parent"], r["child"]): (r["call_count"], r["error_count"])
            for r in incremental_links_merge(links, n).collect()
        }
        assert inc == full, n
