"""Anti-pattern sweep over EVERY registered query's physical plan.

Machine-checks the claims the per-operator docstrings make by hand:
no cartesian products, no Expand blowups (mixed count_distinct), no
unpartitioned windows, no single-partition exchanges except 1-row
scalar reductions, bounded Union fan-out.  Writes one JSON artifact
(default PLAN_AUDIT.json) with per-query operator counts plus an
`offenders` section; exits nonzero if a HARD rule fires so the sweep
can gate a round.

Hard rules (plan must not contain):
- CartesianProduct anywhere.
- A Window whose partition spec is empty (single-partition sort).

Soft counters (reported, judged manually — legitimate uses exist):
- Expand (expected only where a single grouping-sets/rollup row is the
  design, e.g. pivot audits; mixed count_distinct Expands were
  eliminated in r10).
- BroadcastNestedLoopJoin (legitimate against <=1-row/KB relations —
  the scalar-bounds pattern; anything else is a flag).
- Exchange SinglePartition (legitimate for 1-row scalar aggregations).
- Union branches (legitimate for fixed small stacks, e.g. per-table
  checksums; corpus-subtree unions were eliminated in r10/r11).

Usage: python tools/plan_audit.py [out.json] [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from zipkin_storage_kafka_spark.session import get_spark  # noqa: E402


def _spec_args(plan: str, start: int) -> list[str]:
    """Balanced-paren scan of a windowspecdefinition(...) argument list
    starting at the char after the opening paren; returns the TOP-LEVEL
    comma-separated args.  A plain [^)]* regex truncates at the first
    nested ')' (e.g. 'coalesce(a, b) ASC'), silently misclassifying a
    single-partition window as partitioned — a false negative on the
    gating rule (ADVICE r11 #2).  Single-quoted literal spans are
    skipped wholesale so a paren or comma INSIDE a string literal
    (e.g. substring(x, '(', 1)) can't unbalance the scan or split an
    arg (ADVICE r12 #3); Spark plan text escapes an embedded quote by
    doubling it (''), which this scan reads as close-then-reopen —
    the net effect (stay inside the literal) is identical.

    Ending the scan with ``in_str`` still True means an unpaired quote
    swallowed the rest of the plan — the returned args would be silently
    truncated, a fail-open path on the unpartitioned-window gating rule
    (ADVICE r13).  That state raises instead; the caller records it as a
    hard parse failure."""
    args, buf, depth, in_str = [], [], 0, False
    for ch in plan[start:]:
        if in_str:
            if ch == "'":
                in_str = False
            buf.append(ch)
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            args.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    if in_str:
        raise ValueError(
            "unterminated string literal in windowspecdefinition args "
            f"(scan start {start}): {plan[start:start + 80]!r}..."
        )
    if buf:
        args.append("".join(buf).strip())
    return args


def audit_plan(plan: str) -> dict:
    counts = {
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "expand": len(re.findall(r"^\s*\(\d+\) Expand", plan, re.M)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "single_partition_exchange": len(
            re.findall(r"Arguments: SinglePartition", plan)
        ),
        "union": len(re.findall(r"^\s*\(\d+\) Union", plan, re.M)),
        "scans": len(re.findall(r"^\s*\(\d+\) Scan parquet", plan, re.M)),
        "exchanges": len(re.findall(r"^\s*\(\d+\) Exchange", plan, re.M)),
        "sorts": len(re.findall(r"^\s*\(\d+\) Sort\b", plan, re.M)),
    }
    # Window partition spec: the bracket-group count of the Arguments
    # line is AMBIGUOUS ("unpartitioned + ordered" and "partitioned, no
    # order" both print two groups — verified empirically), so parse the
    # windowspecdefinition argument list itself: the spec's args are
    # partitionCols..., orderCols (each "col ASC|DESC ..."), then the
    # frame.  No partition key <=> the first arg is either the frame or
    # an ordered column.
    unpartitioned = 0
    parse_failures = 0
    for m in re.finditer(r"windowspecdefinition\(", plan):
        try:
            args = _spec_args(plan, m.end())
        except ValueError:
            # Fail CLOSED: a spec we cannot parse counts as a hard
            # finding (window_parse_failure), never as "partitioned".
            parse_failures += 1
            continue
        first = args[0] if args else ""
        # ASC/DESC only marks an ORDER column when it terminates the
        # top-level arg (an ordering spec is "expr ASC NULLS FIRST" /
        # "expr DESC NULLS LAST"); a nested mention inside a partition
        # expression must not count.
        if first.startswith("specifiedwindowframe") or re.search(
            r"\b(ASC|DESC)(\s+NULLS\s+(FIRST|LAST))?$", first
        ):
            unpartitioned += 1
    counts["unpartitioned_window"] = unpartitioned
    counts["window_parse_failure"] = parse_failures
    return counts


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLAN_AUDIT.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    for i, (name, fn) in enumerate(entrymod.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
            results[name] = audit_plan(plan)
        except Exception as exc:  # streaming rows can't explain batch
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        if (i + 1) % 50 == 0:
            print(f"[{i + 1}] {time.time() - t0:.0f}s", flush=True)
    hard = {
        k: v
        for k, v in results.items()
        if v["cartesian"]
        or v["unpartitioned_window"]
        or v["window_parse_failure"]
    }
    soft = {
        "expand": {k: v["expand"] for k, v in results.items() if v["expand"]},
        "bnlj": {k: v["bnlj"] for k, v in results.items() if v["bnlj"]},
        "single_partition_exchange": {
            k: v["single_partition_exchange"]
            for k, v in results.items()
            if v["single_partition_exchange"]
        },
        "union": {k: v["union"] for k, v in results.items() if v["union"]},
        "many_scans": {
            k: v["scans"] for k, v in results.items() if v["scans"] >= 5
        },
    }
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "hard_violations": hard,
        "soft": soft,
        "errors": errors,
        "per_query": results,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(
        f"DONE {len(results)} plans, hard={len(hard)}, "
        f"errors={len(errors)}, {time.time() - t0:.0f}s -> {out_path}",
        flush=True,
    )
    for k in hard:
        print("HARD:", k, hard[k])
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())
