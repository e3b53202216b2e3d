"""Focused diagnosis of the in-bench Arrow-row premium (r14).

One session, same warmup as bench.py, then:
  phase A: time the premium band rows (fresh session)
  phase B: run N mixed JVM-heavy queries (session aging)
  phase C: re-time the band rows

If C >> A the premium accumulates with session age (worker churn,
memory pressure, codegen cache); if A is already slow the premium is
structural to the warmup/session shape.

Usage: python tools/premium_probe.py [SF_DIR] [n_fillers]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BAND = [
    "mm_bmp_resize",
    "mm_wav_roundtrip",
    "f5_proto_roundtrip",
    "mm_audio_fingerprint",
    "text_fingerprint",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_fill = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    import __spark_entry__ as entrymod
    from zipkin_storage_kafka_spark.session import get_spark

    spark = get_spark(app_name="premium_probe")
    qs = entrymod.queries()

    # identical warmup path to bench.py (tables + materialized layer +
    # chained python worker-pool prewarm)
    from zipkin_storage_kafka_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()

    def _prewarm(batches):
        from zipkin_storage_kafka_spark.functions import proto  # noqa: F401
        from zipkin_storage_kafka_spark.operators import (  # noqa: F401
            multimodal,
        )

        yield from batches

    spark.range(64).repartition(32).mapInPandas(
        _prewarm, "id long"
    ).mapInPandas(_prewarm, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    def run(name: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    a = {q: run(q) for q in BAND}
    print("phase A (fresh):", {q: round(v, 2) for q, v in a.items()}, flush=True)

    fillers = [
        n
        for n in qs
        if n.startswith(("h", "z_", "ev_", "w_", "o", "s", "p4", "j1", "a"))
    ][:n_fill]
    t0 = time.perf_counter()
    for n in fillers:
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(
        f"phase B: {len(fillers)} fillers in {time.perf_counter()-t0:.1f}s",
        flush=True,
    )

    c = {q: run(q) for q in BAND}
    print("phase C (aged): ", {q: round(v, 2) for q, v in c.items()}, flush=True)


if __name__ == "__main__":
    main()
