"""Dependency linking: traces -> service dependency edges (the one join).

Reference: ``spansToDependencyLinks`` invokes zipkin2's DependencyLinker per
closed trace (SpanAggregationTopology.java:115-121); 1-minute windowed
counters accumulate per link key (DependencyStorageTopology.java:70-105);
query time merges buckets per (parent, child)
(KafkaStorageHttpService.java:80-87).

Spark-first design (SURVEY section 2.3 J1): an equi self-join on
``(trace_id, child.parent_id = parent.id)``.  Both sides are large, so
broadcast does not apply; Catalyst plans a sort-merge join and the two scans
share the shuffle key (trace_id is in the join key), so at 100 TB this is
one co-partitioned shuffle.  AQE's skew-join handles pathological giant
traces.  No Python in the loop — whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.functions.portable import round4
from zipkin_storage_kafka_spark.functions.zipkin import link_key


def dependency_links(spans: DataFrame) -> DataFrame:
    """Per-trace link rows BEFORE counter aggregation.

    DependencyLinker semantics re-expressed on the span tree:
    - an edge exists per (parent span -> child span) pair within a trace;
    - parent service = parent span's local service, child service = child
      span's local service (CLIENT->SERVER RPC pair collapses to one edge
      because the shared server span carries the same services);
    - a call with a child-side error tag counts toward error_count
      (DependencyLinker "error" tag rule — public zipkin2 semantics).

    Output: trace_id, parent, child, is_error, timestamp (child span micros).
    """
    child = spans.alias("c")
    parent = spans.alias("p")
    joined = child.join(
        parent,
        (F.col("c.trace_id") == F.col("p.trace_id"))
        & (F.col("c.parent_id") == F.col("p.id")),
        "inner",
    )
    return joined.select(
        F.col("c.trace_id").alias("trace_id"),
        F.col("p.local_service").alias("parent"),
        F.col("c.local_service").alias("child"),
        F.col("c.is_error").alias("is_error"),
        F.col("c.timestamp").alias("timestamp"),
    )


def merge_links(links: DataFrame) -> DataFrame:
    """Query-time merge: one row per (parent, child) with summed counters
    (reference DependencyLinker.merge at KafkaStorageHttpService.java:86)."""
    return (
        links.groupBy("parent", "child")
        .agg(
            F.count(F.lit(1)).alias("call_count"),
            F.sum(F.col("is_error").cast("long")).alias("error_count"),
        )
        .withColumn("link_key", link_key())
    )


def incremental_links_merge(links: DataFrame, n_batches: int = 4) -> DataFrame:
    """Incremental dependency-counter maintenance, proven equal to the
    full recompute: link rows split into TRACE-ATOMIC ingest batches
    (md5(trace_id) mod n — a trace never straddles batches, mirroring
    the reference's session-windowed ingest where links are derived per
    completed trace, KafkaSpanConsumer -> DependencyStorageTopology),
    each batch partial-aggregates to its own (parent, child) counter
    table, and query time merges the per-batch counters with a
    second-level sum.  Because counter addition is associative and
    batches are trace-atomic, the result is EXACTLY merge_links of all
    history — the property this row keeps under the oracle gate (same
    oracle as j1_a8).

    At 100 TB this is the shape that makes dependency serving O(KB per
    batch) instead of O(history): each ingest batch persists its own
    counter table once; history is never re-linked (the reference's
    Kafka Streams topology maintains exactly this invariant record by
    record; a batch engine recovers it per ingest batch).

    Columns: parent, child, call_count, error_count, link_key.
    """
    batched = links.withColumn(
        "_b",
        F.expr(
            # conv() returns STRING — cast explicitly so the batch id is a
            # BIGINT under ANSI mode too (no implicit string->double hop).
            f"pmod(cast(conv(substring(md5(trace_id), 1, 8), 16, 10)"
            f" as bigint), {int(n_batches)})"
        ),
    )
    per_batch = batched.groupBy("_b", "parent", "child").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col("is_error").cast("long")).alias("e"),
    )
    return (
        per_batch.groupBy("parent", "child")
        .agg(
            F.sum("c").alias("call_count"),
            F.sum("e").alias("error_count"),
        )
        .withColumn("link_key", link_key())
    )


def windowed_link_counters(links: DataFrame, window: str = "1 minute") -> DataFrame:
    """1-minute tumbling-window counters — the ``zipkin-dependencies`` store
    (reference DependencyStorageTopology.java:56-66, bucket = 1 min).

    Output: window_start_ms (epoch millis), parent, child, call_count,
    error_count.  Batch form of the streaming tumbling-window agg; the
    window becomes a partition column for the sink table, so range queries
    prune on it.
    """
    ts = F.timestamp_micros(F.col("timestamp"))
    return (
        links.groupBy(F.window(ts, window).alias("w"), "parent", "child")
        .agg(
            F.count(F.lit(1)).alias("call_count"),
            F.sum(F.col("is_error").cast("long")).alias("error_count"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "parent",
            "child",
            "call_count",
            "error_count",
        )
    )


def dependency_links_tree(spans: DataFrame) -> DataFrame:
    """Per-trace link rows under full zipkin2 DependencyLinker tree
    semantics (the library the reference delegates to at
    SpanAggregationTopology.java:115-121; fixture pinned by
    SpanAggregationTopologyTest.java:75-105, where the SERVER span has NO
    parent id and the link must still be svc_a -> svc_b):

    - **adoption**: spans with a missing parent that are not the trace root
      attach under the root (SpanNode.Builder behavior) — the root is the
      first parentless span in (timestamp, id) order;
    - **callee-side RPC links**: each SERVER span links
      (parent = its remote service, else the parent span's local service)
      -> (child = its local service); a root SERVER with neither yields no
      link;
    - **messaging links**: CONSUMER links remote(broker) -> local, PRODUCER
      links local -> remote(broker); messaging never walks the tree — a
      missing broker name yields no link;
    - **caller-leaf links**: a CLIENT span with a remote service and no
      children links local -> remote (a client WITH children defers to
      them: the child server span creates the RPC link, so the pair counts
      once);
    - **shared spans** (when the input carries a ``shared`` column — the
      zipkin V2 convention where the server half of an RPC reuses the
      client's span id with shared=true): a shared span's tree parent is
      the NON-shared span with the same id, so the RPC still links
      client.local -> server.local exactly once;
    - error attribution: the span that creates the link carries the error
      flag (zipkin's "error" tag rule).

    The simpler chain-model operator :func:`dependency_links` remains the
    materialized-links source for the event-derived testdata (every span
    there has a service and a lag-parent, where the two agree on SERVER
    edges).  This operator is the API-fidelity path for arbitrary zipkin
    traces.

    Plan shape: three passes over ``spans``, all exchanging on trace_id
    (root ranking window, parent-span lookup join, has-children left-anti
    join) — one co-partitioned shuffle key throughout, no Python.
    """
    # Inputs without a shared column (the event-derived testdata) get a
    # constant false — Catalyst folds every shared branch away.
    if "shared" in spans.columns:
        spans = spans.withColumn(
            "_shared", F.coalesce(F.col("shared"), F.lit(False))
        )
    else:
        spans = spans.withColumn("_shared", F.lit(False))

    # Root per trace as a single window pass (parentless non-shared spans
    # sort first, then (timestamp, id)) instead of a filter+rank+join: the
    # adoption subtree feeds THREE downstream consumers, so a join here
    # would triple the spans-vs-roots shuffle work in one plan.
    w = Window.partitionBy("trace_id").orderBy(
        F.col("parent_id").isNotNull(), "_shared", "timestamp", "id"
    )
    adopted = spans.withColumn("_root_id", F.first("id").over(w)).withColumn(
        "_parent_eff",
        # shared span -> its tree parent is the same-id non-shared span
        F.when(F.col("_shared"), F.col("id"))
        .when(
            F.col("parent_id").isNull() & (F.col("id") != F.col("_root_id")),
            F.col("_root_id"),
        )
        .otherwise(F.col("parent_id")),
    )

    parent_side = adopted.select(
        F.col("trace_id").alias("p_trace_id"),
        F.col("id").alias("p_id"),
        F.col("_shared").alias("p_shared"),
        F.col("local_service").alias("p_local"),
    )
    joined = adopted.filter(F.col("kind").isin("SERVER", "CONSUMER")).join(
        parent_side,
        (F.col("trace_id") == F.col("p_trace_id"))
        & (F.col("_parent_eff") == F.col("p_id"))
        # a shared span's parent is the NON-shared copy of its id
        & (~F.col("_shared") | ~F.col("p_shared")),
        "left",
    )
    # If the parent id names a shared RPC pair, a downstream child matched
    # BOTH copies — keep the server (shared) one, which is where zipkin's
    # traversal hangs remote children.  One row per callee span.
    wdup = Window.partitionBy("trace_id", "id", "_shared").orderBy(
        F.col("p_shared").desc_nulls_last()
    )
    callee = (
        joined.withColumn("_pk", F.row_number().over(wdup))
        .filter(F.col("_pk") == 1)
        .select(
            "trace_id",
            F.when(F.col("kind") == "CONSUMER", F.col("remote_service"))
            .otherwise(F.coalesce(F.col("remote_service"), F.col("p_local")))
            .alias("parent"),
            F.col("local_service").alias("child"),
            "is_error",
            "timestamp",
        )
    )

    child_ids = adopted.select(
        F.col("trace_id").alias("c_trace_id"),
        F.col("_parent_eff").alias("c_parent"),
    )
    callers = adopted.filter(
        F.col("kind").isin("CLIENT", "PRODUCER")
        & F.col("remote_service").isNotNull()
    )
    producer_links = callers.filter(F.col("kind") == "PRODUCER")
    client_leaves = callers.filter(F.col("kind") == "CLIENT").join(
        child_ids,
        (F.col("trace_id") == F.col("c_trace_id"))
        & (F.col("id") == F.col("c_parent")),
        "left_anti",
    )
    caller_links = producer_links.unionByName(client_leaves).select(
        "trace_id",
        F.col("local_service").alias("parent"),
        F.col("remote_service").alias("child"),
        "is_error",
        "timestamp",
    )

    return (
        callee.unionByName(caller_links)
        .filter(F.col("parent").isNotNull() & F.col("child").isNotNull())
    )


def service_pagerank(
    links: DataFrame,
    iterations: int = 3,
    damping_micro: int = 850_000,
    scale: int = 1_000_000,
    power: str = "driver",
) -> DataFrame:
    """Call-count-weighted PageRank over the service dependency graph — the
    service-criticality ranking downstream consumers build on the
    reference's dependency links (the graph zipkin-dependencies renders).

    Fixed ``iterations`` power-method rounds in integer MICRO-points: every
    step is bigint multiply / integer-divide / sum, so results are exact
    under any aggregation order and the unrolled-CTE oracle reproduces them
    bit-for-bit (a float formulation would drift with partial-sum order).
    Dangling-node mass is dropped (simplified PageRank) — deterministic and
    documented rather than renormalized.

    Scale: the SERVICE graph is tiny relative to span volume (thousands of
    nodes for millions of spans) — the corpus-sized work is the link
    aggregation feeding this operator, which stays distributed.

    ``power`` picks where the fixed-iteration loop runs (identical
    integer output, test-pinned):

    - ``"driver"`` (default, r14): ONE bounded collect of the
      |service-pairs| edge list, the three power rounds as plain Python
      integer arithmetic (the same bigint multiply / floor-divide / sum,
      order-independent), ranks re-attached as a broadcast local
      relation.  Replaces ~3 scheduled jobs per round with zero — the
      service-catalog-bounded collect class SCALE.md allows.
    - ``"distributed"``: each round is one broadcast join + one
      partial-agg shuffle on the child key; the shape to switch to if
      the graph ever outgrows the driver.

    Columns: service, rank_micro.
    """
    # Lineage truncation: without the checkpoints every round's plan
    # re-embeds the full upstream links derivation (nodes x3, edges x3 for
    # 3 rounds) and Catalyst re-optimizes a growing tree — measured 4.1 s
    # for a 7-node graph at sf0.1, all planning overhead.
    edges = links.select(
        "parent", "child", "call_count"
    ).localCheckpoint(eager=False)
    if power == "driver":
        spark = links.sparkSession
        erows = edges.collect()  # |service-pairs|-catalog-bounded
        svcs = sorted(
            {r["parent"] for r in erows} | {r["child"] for r in erows}
        )
        n = len(svcs)
        if n == 0:
            return spark.createDataFrame(
                [], "service string, rank_micro long"
            )
        oc: dict[str, int] = {}
        for row in erows:
            oc[row["parent"]] = oc.get(row["parent"], 0) + row["call_count"]
        rank = {s: scale // n for s in svcs}
        base = (scale - damping_micro) // n
        for _ in range(iterations):
            inc = dict.fromkeys(svcs, 0)
            for row in erows:
                inc[row["child"]] += (
                    rank[row["parent"]] * row["call_count"]
                ) // oc[row["parent"]]
            rank = {
                s: base + (damping_micro * inc[s]) // scale for s in svcs
            }
        ranks_df = spark.createDataFrame(
            sorted(rank.items()), "service string, rank_micro long"
        )
        return ranks_df
    nodes = (
        edges.select(F.col("parent").alias("service"))
        .union(edges.select(F.col("child").alias("service")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    outc = edges.groupBy("parent").agg(F.sum("call_count").alias("oc"))
    e = edges.join(F.broadcast(outc), "parent").localCheckpoint(eager=False)
    r = nodes.crossJoin(F.broadcast(n_df)).select(
        "service", F.expr(f"{scale} div n").cast("long").alias("rank_micro")
    )
    for _ in range(iterations):
        ranks = r.select(
            F.col("service").alias("_p"), F.col("rank_micro").alias("_r")
        )
        contrib = e.join(
            F.broadcast(ranks), F.col("parent") == F.col("_p")
        ).select(
            F.col("child").alias("service"),
            F.expr("(_r * call_count) div oc").alias("c"),
        )
        inc = contrib.groupBy("service").agg(F.sum("c").alias("m"))
        r = (
            nodes.join(inc, "service", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "service",
                (
                    F.expr(f"({scale} - {damping_micro}) div n")
                    + F.expr(f"({damping_micro} * coalesce(m, 0)) div {scale}")
                )
                .cast("long")
                .alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return r


def merge_counter_windows(
    existing: DataFrame, delta: DataFrame
) -> DataFrame:
    """Incremental maintenance of the windowed-counter store: fold a new
    batch's counters into the existing store by re-aggregating the union
    on the store key — counters are a commutative monoid, so
    merge(counters(A), counters(B)) == counters(A ∪ B) for ANY split of
    the input (the reference maintains the same store incrementally per
    Kafka record, DependencyStorageTopology.java:70-105; this is the
    batch-refresh form: process only the new day's links, never rescan
    history).

    At 100 TB the delta only touches recent windows, so with the store
    partitioned by window_start_ms the merge rewrites just those
    partitions (dynamic partition overwrite), leaving the archive
    untouched.  Equivalence pinned in
    test_reference_fixtures.py::test_incremental_counter_merge.
    """
    return (
        existing.unionByName(delta)
        .groupBy("window_start_ms", "parent", "child")
        .agg(
            F.sum("call_count").alias("call_count"),
            F.sum("error_count").alias("error_count"),
        )
    )


def link_latency_gaps(spans: DataFrame) -> DataFrame:
    """Parent->child handoff gap per dependency edge: for every linked
    span pair (child.parent_id == parent.id within a trace), the delay
    between the parent's start and the child's start, rolled up per
    (parent service, child service) — the queueing/fan-out latency
    panel that sits next to the call/error counters (J1 counts edges;
    this measures the time ON them).

    Columns: parent, child, n_calls, avg_gap_ms (round4), max_gap_ms.

    Scale (100 TB): the same trace-keyed self-join every link operator
    shares (co-partitions with the J1 shuffle), then a partial agg to
    service-pair cardinality; gap sums are exact int64 micros, divided
    once at the end so the round4 is engine-portable.
    """
    c = spans.filter(F.col("parent_id").isNotNull()).select(
        "trace_id",
        "parent_id",
        F.col("timestamp").alias("c_ts"),
        F.col("local_service").alias("child"),
    )
    p = spans.select(
        F.col("trace_id").alias("_t"),
        F.col("id").alias("_id"),
        F.col("timestamp").alias("p_ts"),
        F.col("local_service").alias("parent"),
    )
    joined = c.join(
        p,
        (F.col("trace_id") == F.col("_t"))
        & (F.col("parent_id") == F.col("_id")),
    )
    gap = F.col("c_ts") - F.col("p_ts")
    return joined.groupBy("parent", "child").agg(
        F.count(F.lit(1)).alias("n_calls"),
        round4(
            F.sum(gap) / F.count(F.lit(1)) / F.lit(1000.0)
        ).alias("avg_gap_ms"),
        (F.max(gap) / F.lit(1000.0)).alias("max_gap_ms"),
    )


def service_hits(
    links: DataFrame,
    iterations: int = 3,
    scale: int = 1_000_000,
    loop: str = "driver",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over the UNWEIGHTED
    service adjacency — the dual-score complement of the call-weighted
    PageRank: a high-HUB service fans out to many important callees
    (orchestrators, gateways), a high-AUTHORITY service is called by
    many important callers (shared backends); PageRank's single score
    conflates the two roles.

    Integer micro-point iteration like :func:`service_pagerank`: each
    half-step is a sum of int64 micros over in/out edges followed by a
    SUM-normalization in exact integer div (the classical L2 normalize
    is float and order-sensitive; L1 keeps every round engine-exact
    under any aggregation order).  Fixed ``iterations`` rounds, no
    convergence test — the unrolled-CTE oracle replays them
    bit-for-bit.

    Columns: service, hub_micro, auth_micro.

    Scale (100 TB): the service graph is |services|-bounded (the span
    corpus only enters through the links derivation); the corpus-sized
    work is the distinct partial-agg feeding it.

    ``loop`` picks where the iteration runs (identical output,
    test-pinned — the r14 service_kcore/pagerank precedent):

    - ``"driver"`` (default, r15): ONE bounded collect of the distinct
      service adjacency (the reference's dependency-aggregate domain —
      KB at any volume), then the 6 half-steps are plain integer
      Python (the same int64 micro sums + integer-div L1 normalize)
      and the scores re-attach as a local relation.  Replaces ~6
      scheduled join+agg+checkpoint jobs (measured 2.8 s idle at
      sf0.1 for a 7-node graph) with one collect.
    - ``"distributed"``: the original per-half-step broadcast join +
      partial agg with per-step lineage truncation — the shape to
      switch to if a graph ever outgrows the driver.
    """
    if loop not in ("driver", "distributed"):
        raise ValueError(
            f"service_hits: unknown loop {loop!r} "
            "(expected 'driver' or 'distributed')"
        )
    edges = links.select("parent", "child").distinct().localCheckpoint(
        eager=False
    )
    if loop == "driver":
        spark = links.sparkSession
        edge_rows = [
            (r["parent"], r["child"]) for r in edges.collect()
        ]  # |services|-catalog-bounded
        if not edge_rows:
            return spark.createDataFrame(
                [], "service string, hub_micro long, auth_micro long"
            )
        nodes_py = sorted(
            {p for p, _ in edge_rows} | {c for _, c in edge_rows}
        )
        hub = {n: int(scale) for n in nodes_py}
        auth = {n: 0 for n in nodes_py}
        for _ in range(iterations):
            araw = {}
            for p, c in edge_rows:
                araw[c] = araw.get(c, 0) + hub[p]
            s = sum(araw.values())
            auth = {n: (araw.get(n, 0) * scale) // s for n in nodes_py}
            hraw = {}
            for p, c in edge_rows:
                hraw[p] = hraw.get(p, 0) + auth[c]
            s2 = sum(hraw.values())
            hub = {n: (hraw.get(n, 0) * scale) // s2 for n in nodes_py}
        return spark.createDataFrame(
            [(n, hub[n], auth[n]) for n in nodes_py],
            "service string, hub_micro long, auth_micro long",
        )
    nodes = (
        edges.select(F.col("parent").alias("service"))
        .union(edges.select(F.col("child").alias("service")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    h = nodes.select("service", F.lit(scale).cast("long").alias("hub"))
    a = None
    for _ in range(iterations):
        hubs = h.select(F.col("service").alias("_p"), F.col("hub").alias("_h"))
        araw = (
            edges.join(F.broadcast(hubs), F.col("parent") == F.col("_p"))
            .groupBy(F.col("child").alias("service"))
            .agg(F.sum("_h").alias("ar"))
        )
        asum = araw.agg(F.sum("ar").alias("s"))
        # Lineage truncation per half-step (the service_pagerank lesson,
        # amplified: the hub<->auth mutual recursion DOUBLES the plan
        # tree each round and the final h-join-a re-embeds both chains —
        # measured 8.5 s of pure planning for a 7-node graph without
        # these checkpoints, 1.3 s with).
        a = (
            nodes.join(araw, "service", "left")
            .crossJoin(F.broadcast(asum))
            .select(
                "service",
                F.expr(f"coalesce(ar, 0) * {scale} div s").alias("auth"),
            )
            .localCheckpoint(eager=False)
        )
        auths = a.select(
            F.col("service").alias("_c"), F.col("auth").alias("_a")
        )
        hraw = (
            edges.join(F.broadcast(auths), F.col("child") == F.col("_c"))
            .groupBy(F.col("parent").alias("service"))
            .agg(F.sum("_a").alias("hr"))
        )
        hsum = hraw.agg(F.sum("hr").alias("s2"))
        h = (
            nodes.join(hraw, "service", "left")
            .crossJoin(F.broadcast(hsum))
            .select(
                "service",
                F.expr(f"coalesce(hr, 0) * {scale} div s2").alias("hub"),
            )
            .localCheckpoint(eager=False)
        )
    return h.join(a, "service").select(
        "service",
        F.col("hub").alias("hub_micro"),
        F.col("auth").alias("auth_micro"),
    )


def span_overhang(spans: DataFrame) -> DataFrame:
    """Parent/child containment audit per dependency edge: for every
    linked span pair, whether the child span ENDS after its parent ends
    (``child.timestamp + child.duration > parent.timestamp +
    parent.duration``) and by how much — the signal Zipkin's
    clock-skew corrector keys on (a child that outlives its RPC parent
    is either async fire-and-forget or a clock-skewed reporter;
    zipkin2 ``CorrectForClockSkew`` treats one-way/async spans
    specially for exactly this reason).  ``link_latency_gaps`` measures
    the handoff delay at the START of the edge; this measures
    containment violations at the END.

    Columns: parent, child, n_calls, n_overhangs, max_overhang_us,
    overhang_rate_micro — all exact int64 (rate = n_overhangs * 1e6
    div n_calls), so the row is engine-stable with no float rounding.

    Scale (100 TB): the same trace-keyed parent/child self-join every
    link operator shares (co-partitions with the J1 shuffle), then a
    partial agg to service-pair cardinality.

    Reference parity: the edge derivation matches
    KafkaSpanStore.java's J1 linker input; the containment rule is the
    zipkin2 CorrectForClockSkew.java child-bounds check re-expressed
    as a batch panel.
    """
    c = spans.filter(F.col("parent_id").isNotNull()).select(
        "trace_id",
        "parent_id",
        (F.col("timestamp") + F.coalesce(F.col("duration"), F.lit(0))).alias(
            "c_end"
        ),
        F.col("local_service").alias("child"),
    )
    p = spans.select(
        F.col("trace_id").alias("_t"),
        F.col("id").alias("_id"),
        (F.col("timestamp") + F.coalesce(F.col("duration"), F.lit(0))).alias(
            "p_end"
        ),
        F.col("local_service").alias("parent"),
    )
    joined = c.join(
        p,
        (F.col("trace_id") == F.col("_t"))
        & (F.col("parent_id") == F.col("_id")),
    )
    over = F.col("c_end") - F.col("p_end")
    return (
        joined.groupBy("parent", "child")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum((over > 0).cast("long")).alias("n_overhangs"),
            F.greatest(F.max(over), F.lit(0)).alias("max_overhang_us"),
        )
        .withColumn(
            "overhang_rate_micro",
            F.expr("n_overhangs * 1000000 div n_calls"),
        )
    )


def link_window_diff(links: DataFrame, split_us: int) -> DataFrame:
    """Dependency-graph diff across a time split (deploy-regression
    check): per (parent, child) edge, call/error counters BEFORE vs
    AFTER ``split_us`` and a status — 'added' (new edge), 'removed'
    (edge gone), 'changed' (call volume OR error count moved — for a
    deploy-regression panel an error shift at steady volume is the
    primary signal; ADVICE r06), 'steady'.  The graph-level question an
    operator asks after a rollout that the single-window A8 merge can't
    answer.

    Columns: parent, child, calls_before, calls_after, errors_before,
    errors_after, status.

    Scale (100 TB): ONE conditional aggregation over the link store —
    the split is a FILTER inside the same (parent, child) partial agg
    the A8 merge runs, not a self-join of two window scans; with the
    store date-partitioned, both windows prune to their partitions.
    """
    before = F.col("timestamp") < F.lit(int(split_us))
    agg = links.groupBy("parent", "child").agg(
        F.count(F.when(before, 1)).alias("calls_before"),
        F.count(F.when(~before, 1)).alias("calls_after"),
        F.sum(F.when(before & F.col("is_error"), 1).otherwise(0)).alias(
            "errors_before"
        ),
        F.sum(F.when(~before & F.col("is_error"), 1).otherwise(0)).alias(
            "errors_after"
        ),
    )
    return agg.select(
        "parent",
        "child",
        "calls_before",
        "calls_after",
        "errors_before",
        "errors_after",
        F.when(F.col("calls_before") == 0, "added")
        .when(F.col("calls_after") == 0, "removed")
        .when(
            (F.col("calls_before") != F.col("calls_after"))
            | (F.col("errors_before") != F.col("errors_after")),
            "changed",
        )
        .otherwise("steady")
        .alias("status"),
    )


def service_triangles(links: DataFrame) -> DataFrame:
    """Per-service triangle participation over the undirected service
    graph — the classic distributed graph-mining kernel (Suri & Vassilvitskii
    2011) beside :func:`service_pagerank`, answering "which services sit in
    tightly-coupled cliques" for architecture review panels.

    Direction and multiplicity are dropped first: edges become DISTINCT
    canonical (a < b) pairs, so the triangle join runs on the SERVICE
    GRAPH (|services|-bounded, thousands of rows at 100 TB), never on the
    span- or link-level relation.  The only corpus-sized work is the
    distinct partial-agg over the materialized links table.  Each triangle
    x < y < z materializes exactly once (both join keys preserve the
    ordering), then explodes to credit its three corners.  Services with
    no triangle keep a zero row so the panel is total.

    Output: service, triangles (bigint).
    """
    e = (
        links.select(
            F.least("parent", "child").alias("a"),
            F.greatest("parent", "child").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e2.a") == F.col("e1.b"))
        .join(
            e.alias("e3"),
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    per = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("service"))
        .groupBy("service")
        .agg(F.count("*").alias("triangles"))
    )
    nodes = (
        links.select(F.col("parent").alias("service"))
        .union(links.select(F.col("child").alias("service")))
        .distinct()
    )
    return nodes.join(per, "service", "left").select(
        "service",
        F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias(
            "triangles"
        ),
    )


def service_kcore(
    links: DataFrame,
    ks: tuple[int, ...] = (2, 3),
    rounds: int = 8,
    peel: str = "driver",
) -> DataFrame:
    """k-core decomposition of the HEAVY-TRAFFIC BACKBONE of the service
    graph: each service's CORE LEVEL — the largest k in ``ks`` whose
    k-core contains it on the backbone (1 = in the backbone but below
    every k, 0 = no backbone edge).  The standard graph-degeneracy peel
    (Seidman 1983; distributed formulation as in Montresor et al. 2013)
    completing the PageRank / triangle panel: PageRank ranks influence,
    triangles count local cliques, coreness finds the densely-coupled
    NUCLEUS of the architecture.

    The backbone keeps undirected pairs whose call volume is ABOVE THE
    MEAN pair volume — compared as the exact integer cross-product
    ``calls * n_pairs > total_calls`` (no float division), because a
    service mesh's raw co-call graph is near-complete and peeling it is
    vacuous; the volume filter is what exposes the load-bearing core.

    Peeling is iterative: drop nodes with degree < k, re-derive degrees
    on the induced subgraph, repeat to fixpoint; the loop ASSERTS
    convergence within ``rounds`` sweeps either way (raising beats
    silently serving a non-fixpoint answer; the oracle unrolls the same
    fixed sweep count, so parity is exact or loud).

    ``peel`` picks where the fixpoint runs (identical output,
    test-pinned):

    - ``"driver"`` (default, r14): ONE bounded collect of the backbone
      edge set — |services|-catalog-bounded (the service graph is the
      reference's dependency-aggregate domain, KB-scale at any data
      volume; the corpus-sized work is the pair-count partial agg,
      which stays distributed) — then the peel loop is plain Python
      sets and the per-service levels re-attach as a broadcast local
      relation.  Replaces ~4 scheduled jobs per sweep (degree agg, two
      semi-joins, convergence count) with zero.
    - ``"distributed"``: each sweep is one k-row aggregate + two
      semi-joins on the |services|-bounded relation, lineage-truncated
      per round — the shape to switch to if a graph ever outgrows the
      driver (e.g. k-core over raw trace pairs rather than the service
      backbone).

    Output: service, core_level (int) — every linked service appears.
    """
    ue = (
        links.select(
            F.least("parent", "child").alias("a"),
            F.greatest("parent", "child").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("calls"))
    )
    tot = ue.agg(
        F.sum("calls").alias("t"), F.count(F.lit(1)).alias("n")
    )
    e = (
        ue.crossJoin(F.broadcast(tot))
        .where(F.col("calls") * F.col("n") > F.col("t"))
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    nodes = (
        links.select(F.col("parent").alias("service"))
        .union(links.select(F.col("child").alias("service")))
        .distinct()
    )
    if peel == "driver":
        spark = links.sparkSession
        edge_rows = e.collect()  # |services|-catalog-bounded backbone
        cur: set[tuple[str, str]] = {(r["a"], r["b"]) for r in edge_rows}
        level: dict[str, int] = {}
        for a, b in cur:
            level[a] = 1
            level[b] = 1
        for k in ks:
            peeled = set(cur)
            for _ in range(rounds):
                deg: dict[str, int] = {}
                for a, b in peeled:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
                keep = {n for n, d in deg.items() if d >= k}
                nxt = {
                    (a, b) for a, b in peeled if a in keep and b in keep
                }
                if nxt == peeled:
                    break
                peeled = nxt
            else:
                raise RuntimeError(
                    f"k-core peel (k={k}) did not converge in "
                    f"{rounds} rounds"
                )
            for a, b in peeled:
                level[a] = k
                level[b] = k
        levels = spark.createDataFrame(
            sorted(level.items()), "service string, _lvl int"
        )
        return nodes.join(F.broadcast(levels), "service", "left").select(
            "service",
            F.coalesce("_lvl", F.lit(0)).cast("int").alias("core_level"),
        )
    backbone_nodes = (
        e.select(F.col("a").alias("service"))
        .union(e.select(F.col("b").alias("service")))
        .distinct()
        .select("service", F.lit(1).alias("_bb"))
    )
    out = nodes.join(F.broadcast(backbone_nodes), "service", "left").select(
        "service",
        F.when(F.col("_bb").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("core_level"),
    )
    for k in ks:
        cur = e
        prev_cnt = cur.count()
        for _ in range(rounds):
            deg = (
                cur.select(F.col("a").alias("node"))
                .unionAll(cur.select(F.col("b").alias("node")))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("deg"))
                .filter(F.col("deg") >= k)
                .select("node")
            )
            cur = (
                cur.join(deg.withColumnRenamed("node", "a"), "a", "semi")
                .join(deg.withColumnRenamed("node", "b"), "b", "semi")
                .select("a", "b")
                .localCheckpoint(eager=False)
            )
            cnt = cur.count()
            if cnt == prev_cnt:
                break
            prev_cnt = cnt
        else:
            raise RuntimeError(
                f"k-core peel (k={k}) did not converge in {rounds} rounds"
            )
        surv = (
            cur.select(F.col("a").alias("service"))
            .union(cur.select(F.col("b").alias("service")))
            .distinct()
            .select("service", F.lit(1).alias("_in"))
        )
        out = (
            out.join(F.broadcast(surv), "service", "left")
            .select(
                "service",
                F.when(F.col("_in").isNotNull(), F.lit(k))
                .otherwise(F.col("core_level"))
                .alias("core_level"),
            )
        )
    return out


def service_reachability(links: DataFrame, rounds: int = 12) -> DataFrame:
    """Transitive closure of the DIRECTED service graph: for every
    service, how many downstream services its calls can reach — the
    blast-radius panel ("if this degrades, what is in the cone") that
    PageRank's influence score and k-core's density score both assume
    but neither answers.

    Distributed BFS by frontier join: the closure accumulates (src,
    dst) pairs; each sweep extends every pair one hop and set-unions
    (distinct) into the closure, with per-round lineage truncation and
    a fixpoint check on the exact pair count — cycles terminate
    naturally because the union is a set.  Everything runs on the
    DISTINCT |services|-bounded edge relation (closure size is at most
    |services|², thousands-squared at 100 TB — still k-row); the only
    corpus-sized work is the distinct partial-agg feeding it.
    Convergence within ``rounds`` sweeps is ASSERTED (diameter bound;
    raising beats silently serving a partial closure — the DuckDB
    oracle's recursive CTE always runs to fixpoint).

    Output: service, n_reachable (bigint; 0 for pure sinks).
    """
    e = (
        links.select(F.col("parent").alias("src"), F.col("child").alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    closure = e
    prev = closure.count()
    for _ in range(rounds):
        step = (
            closure.alias("r")
            .join(
                e.alias("x"), F.col("r.dst") == F.col("x.src")
            )
            .select(F.col("r.src").alias("src"), F.col("x.dst").alias("dst"))
        )
        closure = (
            closure.unionByName(step).distinct().localCheckpoint(eager=False)
        )
        cnt = closure.count()
        if cnt == prev:
            break
        prev = cnt
    else:
        raise RuntimeError(
            f"reachability closure did not converge in {rounds} sweeps"
        )
    nodes = (
        links.select(F.col("parent").alias("service"))
        .union(links.select(F.col("child").alias("service")))
        .distinct()
    )
    per = closure.groupBy(F.col("src").alias("service")).agg(
        F.count(F.lit(1)).alias("n_reachable")
    )
    return nodes.join(F.broadcast(per), "service", "left").select(
        "service",
        F.coalesce("n_reachable", F.lit(0).cast("long")).alias("n_reachable"),
    )


def path_redundancy(links: DataFrame, max_hops: int = 3) -> DataFrame:
    """Path-multiplicity panel for the service graph: for every
    (src, dst) pair, how many DISTINCT simple paths of length 1..3
    connect them — the redundancy view the binary reachability
    closure flattens away (one path = a fragile dependency; several =
    the mesh absorbs a hop failure).  Only ``max_hops``: longer paths
    matter less operationally and keep the oracle a closed form.

    Exact integer path counts by relational composition on the
    DISTINCT |services|-bounded edge relation (adjacency "matrix
    powers" as k-row self-joins — the corpus never re-enters):
    paths2 excludes revisiting src or dst (simple paths), paths3
    excludes any repeated node.  direct/via2/via3 are reported
    separately so the panel shows WHERE the redundancy lives.

    Output: src, dst, direct (0/1), via2, via3, total_paths.
    """
    e = (
        links.select(F.col("parent").alias("src"), F.col("child").alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    p1 = e.select("src", "dst", F.lit(1).alias("direct"))
    p2 = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .where(F.col("a.src") != F.col("b.dst"))
        .groupBy(
            F.col("a.src").alias("src"), F.col("b.dst").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("via2"))
    )
    p3 = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .join(e.alias("c"), F.col("b.dst") == F.col("c.src"))
        .where(
            (F.col("a.src") != F.col("b.dst"))
            & (F.col("a.src") != F.col("c.dst"))
            & (F.col("a.dst") != F.col("c.dst"))
        )
        .groupBy(
            F.col("a.src").alias("src"), F.col("c.dst").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("via3"))
    )
    return (
        p1.join(p2, ["src", "dst"], "full")
        .join(p3, ["src", "dst"], "full")
        .select(
            "src",
            "dst",
            F.coalesce("direct", F.lit(0)).alias("direct"),
            F.coalesce("via2", F.lit(0)).alias("via2"),
            F.coalesce("via3", F.lit(0)).alias("via3"),
        )
        .withColumn(
            "total_paths",
            F.col("direct") + F.col("via2") + F.col("via3"),
        )
        .where(F.col("src") != F.col("dst"))
    )
