"""Custom stateful streaming operator: the trace-storage UPSERT (A3).

Reference: TraceStorageTopology.java:96-126 — a Processor that, per
incoming span batch, fetches the stored trace for the traceId (backwardFetch
over the last day), appends the new spans, and puts the result back.  This
is the path that, unlike the session-window aggregation, accepts LATE spans
forever (W5 split) and therefore cannot be an append-mode window agg.

Spark mapping: ``applyInPandasWithState`` — explicit keyed state holding
the accumulated span ids/count per trace, emitting the updated trace row on
every batch that touches it (update semantics, like the store's put).  The
state TTL mirrors the store retention (1 d hard-coded in the reference) via
processing-time timeouts.

Scale notes: state is partitioned by trace_id across executors (the exact
analog of the reference's per-partition RocksDB stores); Arrow batches keep
the Python boundary amortized; state size per key is bounded by span count
per trace, evicted by timeout.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

UPSERT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), False),
        T.StructField("span_ids", T.ArrayType(T.StringType())),
        T.StructField("span_count", T.LongType()),
        T.StructField("trace_timestamp", T.LongType()),
        T.StructField("last_updated_batch_count", T.LongType()),
    ]
)

UPSERT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("span_ids", T.ArrayType(T.StringType())),
        T.StructField("trace_timestamp", T.LongType()),
        T.StructField("batches", T.LongType()),
    ]
)

RETENTION_MS = 86_400_000  # 1 d, TraceStorageTopology.java:88


def _make_upsert(ttl: bool):
    def _upsert(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (trace_id,) = key
        if state.hasTimedOut:
            # retention eviction (the store's segment expiry)
            state.remove()
            return
        if state.exists:
            span_ids, trace_ts, batches = state.get
            span_ids = list(span_ids)
        else:
            span_ids, trace_ts, batches = [], None, 0
        new_ids = []
        new_min_ts = None
        for pdf in pdfs:
            new_ids.extend(pdf["id"].tolist())
            batch_min = int(pdf["timestamp"].min())
            new_min_ts = (
                batch_min if new_min_ts is None else min(new_min_ts, batch_min)
            )
        # dedup like Trace.merge: same span id re-delivered -> single entry
        merged = list(dict.fromkeys(span_ids + new_ids))
        trace_ts = (
            new_min_ts
            if trace_ts is None
            else min(trace_ts, new_min_ts if new_min_ts is not None else trace_ts)
        )
        batches += 1
        state.update((merged, trace_ts, batches))
        if ttl:
            state.setTimeoutDuration(RETENTION_MS)
        yield pd.DataFrame(
            {
                "trace_id": [trace_id],
                "span_ids": [merged],
                "span_count": [len(merged)],
                "trace_timestamp": [trace_ts],
                "last_updated_batch_count": [batches],
            }
        )

    return _upsert


def trace_upsert_stream(spans: DataFrame, ttl: bool = True) -> DataFrame:
    """Keyed upsert of spans into per-trace state; emits the updated trace
    row whenever new fragments arrive — including fragments that would be
    'late' for the session-window aggregation.

    ``ttl=True`` arms the 1-day processing-time eviction (store retention).
    Disable for bounded test runs: with a pending timeout the query never
    reaches the terminated state under availableNow (it keeps scheduling
    state-cleanup batches).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl
        else GroupStateTimeout.NoTimeout
    )
    return spans.groupBy("trace_id").applyInPandasWithState(
        _make_upsert(ttl),
        outputStructType=UPSERT_OUTPUT_SCHEMA,
        stateStructType=UPSERT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
