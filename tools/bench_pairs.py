"""Mechanical multi-pair bench gate (VERDICT r13 next-round #2).

One two-scale pair is noise-dominated on this VM: four same-day pairs in
r13 spanned 1.36-1.61x on near-identical trees, so any single pair's
ratio carries a ~±0.12 editorial band.  This tool replaces the editorial
step with a mechanical protocol:

- run ``n_pairs`` full bench sessions per scale, alternating scales
  (sf0.1, sf1, sf0.1, sf1, ...) so ambient drift hits both sides alike;
- per-row, per-scale: take the MEDIAN across pairs — a single in-session
  burst (the documented 2-6x ambient swing) cannot move a median of 3;
- headline = sum-of-medians(sf1) / sum-of-medians(sf0.1), with the band
  reported as the min..max of the individual pair ratios;
- burst log: every (row, scale, pair) observation > 2x the row's
  cross-pair min is recorded, so the substitution the median performs
  is visible, not silent.

Each underlying bench run is the unmodified ``bench.py`` session (full
warm materialized layer + min-of-2 per row), so per-row numbers remain
comparable with every prior round's BENCH_DETAIL files.

Usage: python tools/bench_pairs.py [n_pairs] [out.json]
Writes the full observation set + summary to out.json (default
BENCH_PAIRS.json) and prints the headline line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(REPO, ".bench", "sf1"),
}
BURST_FACTOR = 2.0


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    t0 = time.time()
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    detail["wall_with_warmup"] = round(time.time() - t0, 1)
    return detail


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_PAIRS.json"
    runs: dict[str, list[dict]] = {s: [] for s in SCALES}
    for i in range(n_pairs):
        for scale, sf_dir in SCALES.items():
            print(f"pair {i + 1}/{n_pairs} {scale} ...", flush=True)
            d = run_bench(sf_dir)
            runs[scale].append(d)
            print(
                f"  total {d['value']:.1f}s"
                f" (wall {d['wall_with_warmup']:.0f}s)",
                flush=True,
            )

    rows = sorted(runs["sf0.1"][0]["queries"])
    medians = {
        scale: {
            q: round(
                statistics.median(r["queries"][q] for r in runs[scale]), 4
            )
            for q in rows
        }
        for scale in SCALES
    }
    pair_totals = {
        scale: [r["value"] for r in runs[scale]] for scale in SCALES
    }
    pair_ratios = [
        round(b / a, 4)
        for a, b in zip(pair_totals["sf0.1"], pair_totals["sf1"])
    ]
    sum_of_medians = {
        scale: round(sum(medians[scale].values()), 2) for scale in SCALES
    }
    headline_ratio = round(
        sum_of_medians["sf1"] / sum_of_medians["sf0.1"], 3
    )

    bursts = []
    for scale in SCALES:
        for q in rows:
            obs = [r["queries"][q] for r in runs[scale]]
            lo = min(obs)
            for i, v in enumerate(obs):
                if lo > 0 and v > BURST_FACTOR * lo:
                    bursts.append(
                        {
                            "query": q,
                            "scale": scale,
                            "pair": i + 1,
                            "seconds": v,
                            "min_seconds": lo,
                        }
                    )

    out = {
        "protocol": (
            f"{n_pairs} alternating two-scale pairs; per-row median; "
            "headline = sum-of-medians ratio; band = min..max pair ratio"
        ),
        "n_pairs": n_pairs,
        "headline_ratio_10x": headline_ratio,
        "pair_ratios": pair_ratios,
        "ratio_band": [min(pair_ratios), max(pair_ratios)],
        "sum_of_medians": sum_of_medians,
        "pair_totals": pair_totals,
        "bursts_over_2x_min": bursts,
        "medians": medians,
        "runs": {
            scale: [
                {"value": r["value"], "queries": r["queries"]}
                for r in runs[scale]
            ]
            for scale in SCALES
        },
    }
    with open(os.path.join(REPO, out_path), "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"HEADLINE {sum_of_medians['sf0.1']} s sf0.1 -> "
        f"{sum_of_medians['sf1']} s sf1 = {headline_ratio}x at 10x data "
        f"(pair band {min(pair_ratios)}-{max(pair_ratios)}, "
        f"{len(bursts)} burst obs median-suppressed) -> {out_path}",
        flush=True,
    )


if __name__ == "__main__":
    main()
