"""Reproducible three-decade scale sweep for SCALE.md's measured tables.

Runs the named registry queries at sf0.01, sf0.1, and the synthetic
sf1-equivalent (built by ``tools/make_scale_dataset.py``), warm-up plus
best-of-3, each execution driven to completion through the no-op sink —
exactly bench.py's discipline, so rows are comparable across rounds.

Usage:
    python tools/make_scale_dataset.py            # once, builds /tmp/scale_sf1
    python tools/run_scale_sweep.py q1 q2 ...     # sweep those queries
    python tools/run_scale_sweep.py --reps 5 q1   # more best-of rounds

Prints one ``<sf> <query> <best_sec>`` line per cell (markdown-table
ready) and a JSON summary line at the end. Run on an otherwise idle
machine — concurrent Spark jobs skew the numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SFS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/scale_sf1"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from connect_server_spark import registry
    from connect_server_spark.session import get_spark

    spark = get_spark(app_name="scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    missing = [n for n in args.queries if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    results: dict[str, dict[str, float]] = {n: {} for n in args.queries}
    for label, sf in SFS:
        if not os.path.isdir(sf):
            print(f"# {label}: {sf} missing — run make_scale_dataset.py",
                  file=sys.stderr)
            continue
        for name in args.queries:
            qs[name](spark, sf).write.mode("overwrite").format("noop").save()
            best = float("inf")
            for _ in range(max(args.reps, 1)):
                t0 = time.perf_counter()
                qs[name](spark, sf).write.mode(
                    "overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            results[name][label] = round(best, 2)
            print(f"{label} {name} {best:.2f}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
