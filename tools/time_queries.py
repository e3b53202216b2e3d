"""Time a handful of registry queries against a warm session — the
per-change measurement loop bench.py is too heavy for (it warms the
whole materialized layer and times all 275 rows).

Usage: python tools/time_queries.py SF_DIR q1 [q2 ...]
Prints one line per query: min-of-3 wall seconds, like bench.py's
min-of-2 but with one more repeat since single-query runs are noisier.
"""

import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entrymod
    from zipkin_storage_kafka_spark.session import get_spark

    spark = get_spark(app_name="time_queries")
    qs = entrymod.queries()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode(
                "overwrite"
            ).save()
    for name in names:
        fn = qs[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}\t{best:.3f}s")


if __name__ == "__main__":
    main()
