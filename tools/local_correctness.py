"""Local replica of the driver's full correctness gate (VERDICT r08
next-round #7): run EVERY registered query and its DuckDB oracle at
sf0.01 and write a driver-shaped JSON record, so a lost driver artifact
(the r07 incident) never again leaves a round unreconstructable.

Usage:  python tools/local_correctness.py [out.json] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle import compare_frames, duckdb_conn  # noqa: E402
from zipkin_storage_kafka_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_local_r09.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="local-correctness")
    con = duckdb_conn(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    t0 = time.time()
    for i, (name, fn) in enumerate(queries.items()):
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                # rows-only queries: record ran-without-error explicitly
                rec.update(spark_rows=df.count(), rows_match=True)
            else:
                spark_pd = df.toPandas()
                oracle_pd = con.execute(oracles[name]).df()
                rec["spark_rows"] = len(spark_pd)
                rec["oracle_rows"] = len(oracle_pd)
                # one collection serves the counts AND the value check
                # (ADVICE r09: compare() used to re-collect both sides)
                compare_frames(spark_pd, oracle_pd, name=name)
                rec.update(rows_match=True, schema_match=True, hash_match=True)
        except Exception as exc:  # record, keep going — this is an audit
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
            traceback.print_exc()
        results[name] = rec
        if (i + 1) % 25 == 0 or rec["err"]:
            n_green = sum(
                1 for r in results.values() if r["hash_match"] or
                (r["rows_match"] and r["err"] is None and r["oracle_rows"] is None)
            )
            print(
                f"[{i + 1}/{len(queries)}] {name}: "
                f"{'ERR ' + rec['err'] if rec['err'] else 'ok'} "
                f"({n_green} green, {time.time() - t0:.0f}s)",
                flush=True,
            )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    n_err = sum(1 for r in results.values() if r["err"])
    print(
        f"DONE {len(results)} queries, {n_err} errors, "
        f"{time.time() - t0:.0f}s -> {out_path}",
        flush=True,
    )
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
