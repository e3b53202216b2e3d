"""In-bench Arrow serving-premium knob sweep (VERDICT r13 next-round #3).

SCALE.md r13 established that Arrow-stage rows (and some pure-JVM rows)
pay a ~1 s/row premium INSIDE the full 275-query bench session that they
do not pay idle — session pressure, not data.  This tool varies one knob
at a time across full bench sessions at sf1 and reports the premium band
rows plus the session total, so the knob's effect is measured in exactly
the environment where the premium exists.

Each experiment is one unmodified ``bench.py`` run (same warm + min-of-2
protocol) with the knob injected via SPARK_GRAFT_EXTRA_CONF
(session.py env passthrough, r14).

Usage: python tools/premium_sweep.py [out.json] [experiment ...]
(no experiment names = run all; names let a session resume the sweep
without re-running legs a prior round already settled)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.path.join(REPO, ".bench", "sf1")

# The premium band (SCALE.md r13) + one pure-JVM control row that showed
# the same in-bench multiplier, to separate Arrow-specific effects from
# generic session pressure.
BAND = [
    "dedup_semantic_diverse",
    "w_item_neighbors",
    "mm_audio_fingerprint",
    "f5_proto_roundtrip",
    "w_next_basket_rules",  # pure-JVM control
]

EXPERIMENTS = {
    "baseline": "",
    "arrow_batch_2k": (
        "spark.sql.execution.arrow.maxRecordsPerBatch=2048"
    ),
    "arrow_batch_64k": (
        "spark.sql.execution.arrow.maxRecordsPerBatch=65536"
    ),
    "no_worker_reuse": "spark.python.worker.reuse=false",
    "low_storage_fraction": (
        "spark.memory.storageFraction=0.2;spark.memory.fraction=0.5"
    ),
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PREMIUM_SWEEP.json"
    selected = sys.argv[2:] or list(EXPERIMENTS)
    unknown = [n for n in selected if n not in EXPERIMENTS]
    if unknown:
        raise SystemExit(f"unknown experiments: {unknown}")
    results = {}
    for name, conf in ((n, EXPERIMENTS[n]) for n in selected):
        env = dict(
            os.environ, SPARK_GRAFT_SF_DIR=SF_DIR, SPARK_GRAFT_EXTRA_CONF=conf
        )
        print(f"{name}: {conf or '(defaults)'} ...", flush=True)
        t0 = time.time()
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO,
            env=env,
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        d = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
        results[name] = {
            "conf": conf,
            "total": d["value"],
            "wall": round(time.time() - t0, 1),
            "band": {q: d["queries"][q] for q in BAND},
        }
        print(
            f"  total {d['value']:.1f}s band "
            + " ".join(f"{q}={d['queries'][q]:.2f}" for q in BAND),
            flush=True,
        )
    with open(os.path.join(REPO, out_path), "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {out_path}", flush=True)


if __name__ == "__main__":
    main()
