"""Per-query job/stage/task profile in a warm session.

Usage: python tools/profile_query.py SF_DIR q1 [q2 ...]

Runs each query twice (pass 1 absorbs codegen/planning), then reports
for the SECOND run: #jobs, #stages, #tasks, and wall seconds — the
scheduling-shape numbers the sf0.1 bench is dominated by (BENCH_NOTES
r10-r14: per-stage round trips are the local floor).
"""

from __future__ import annotations

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

    spark = get_spark(app_name="profile_query")
    sc = spark.sparkContext
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode(
                "overwrite"
            ).save()
    qs = entrymod.queries()
    tracker = sc.statusTracker()
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        group = f"profile-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None or si.numTasks == 0:
                    continue
                n_stages += 1
                n_tasks += si.numTasks
        print(
            f"{name}\tjobs={len(job_ids)}\tstages={n_stages}\t"
            f"tasks={n_tasks}\twall={wall:.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
