"""Interleaved A/B of dedup_incremental_minhash_indexed between two
trees (r8 verdict "what's wrong" #1: the row moved 1.28 → 2.22 s at
sf0.1 with a tight spread; container drift is monotonic within a
session window, so only INTERLEAVED arms separate code from machine).

Each arm is a fresh subprocess (own JVM): warm-up pass (pays the /tmp
index-cache build on first touch), then N timed reps through the no-op
sink — bench.py's discipline. Arms alternate A,B,A,B,… so machine
drift hits both equally.

Usage: python tools/ab_minhash_indexed.py /root/repo /tmp/r7tree --rounds 3
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
tree = sys.argv[1]
sys.path.insert(0, tree)
from connect_server_spark.session import get_spark
from connect_server_spark import registry

spark = get_spark(app_name="ab_minhash")
spark.sparkContext.setLogLevel("ERROR")
q = registry.all_queries()["dedup_incremental_minhash_indexed"]
sf = "/root/testdata/sf0.1"
q(spark, sf).write.format("noop").mode("overwrite").save()  # warm-up
times = []
for _ in range(3):
    t0 = time.perf_counter()
    q(spark, sf).write.format("noop").mode("overwrite").save()
    times.append(round(time.perf_counter() - t0, 3))
print("AB_RESULT " + json.dumps({"tree": tree, "times": times}))
spark.stop()
"""


def run_arm(tree: str) -> list[float]:
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, tree],
        capture_output=True, text=True, timeout=900,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])["times"]
    raise RuntimeError(
        f"arm {tree} failed\n{proc.stdout[-1000:]}\n{proc.stderr[-1000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tree_a")
    ap.add_argument("tree_b")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    results = {args.tree_a: [], args.tree_b: []}
    for r in range(args.rounds):
        for tree in (args.tree_a, args.tree_b):
            times = run_arm(tree)
            results[tree].extend(times)
            print(f"round {r} {tree}: {times}", flush=True)
    summary = {
        t: {"min": min(v), "med": sorted(v)[len(v) // 2], "all": v}
        for t, v in results.items()
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
