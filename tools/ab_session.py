"""Same-session interleaved A/B timer (the only protocol that survives
this VM's bursty steal — BENCH_NOTES_r10-r14).

Usage: python tools/ab_session.py SF_DIR MODULE_A_EXPR MODULE_B_EXPR [reps]

Each EXPR is a Python expression evaluated with `spark`, `sf_dir`, and
the repo packages importable; it must yield a DataFrame.  The two
variants are timed interleaved (A,B,A,B,...) with the noop sink,
min-of-reps reported for each, so an ambient burst hits both sides
alike.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1]
    expr_a, expr_b = sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from zipkin_storage_kafka_spark.session import get_spark

    spark = get_spark(app_name="ab_session")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode(
                "overwrite"
            ).save()
    env = {"spark": spark, "sf_dir": sf_dir}
    times: dict[str, list[float]] = {"A": [], "B": []}
    for rep in range(reps):
        for tag, expr in (("A", expr_a), ("B", expr_b)):
            t0 = time.perf_counter()
            df = eval(expr, env)  # noqa: S307 - local measurement tool
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"rep{rep} {tag}: {dt:.3f}s", flush=True)
    for tag in ("A", "B"):
        ts = sorted(times[tag])
        print(
            f"{tag}: min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 2) for t in times[tag]]}"
        )


if __name__ == "__main__":
    main()
