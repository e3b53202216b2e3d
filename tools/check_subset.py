"""Oracle-check a named subset of registry queries at a given SF.

Usage: python tools/check_subset.py SF_DIR q1 [q2 ...]

Same comparison path as tools/local_correctness.py (compare_frames vs
the DuckDB oracle), restricted to the rows a change actually touched —
the fast inner loop for proving equivalence before a full replay.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle import compare_frames, duckdb_conn  # noqa: E402
from zipkin_storage_kafka_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="check_subset")
    con = duckdb_conn(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = 0
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            if name not in oracles:
                print(f"{name}: ran, {df.count()} rows (no oracle)")
                continue
            spark_pd = df.toPandas()
            oracle_pd = con.execute(oracles[name]).df()
            compare_frames(spark_pd, oracle_pd, name=name)
            print(f"{name}: OK ({len(spark_pd)} rows)")
        except Exception as exc:
            failed += 1
            print(f"{name}: FAIL {type(exc).__name__}: {exc}"[:300])
            traceback.print_exc()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
