"""Capture `.explain("formatted")` for named registry queries.

Usage: python tools/explain_capture.py OUT_DIR SUFFIX SF_DIR q1 [q2 ...]
Writes OUT_DIR/<query>_<SUFFIX>.txt for each query (the round's plan
evidence files: plans/r14/<q>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entrymod
    from zipkin_storage_kafka_spark.session import get_spark

    spark = get_spark(app_name="explain_capture")
    os.makedirs(out_dir, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{path}: {plan.count('Exchange')} Exchange, "
              f"{plan.count('EvalPython')} EvalPython, "
              f"{plan.count('SortMergeJoin')} SMJ, "
              f"{plan.count('BroadcastHashJoin')} BHJ")


if __name__ == "__main__":
    main()
