"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion with the no-op sink (full plan runs,
nothing is collected to the driver) — the honest analog of writing results
out on a cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from connect_server_spark import registry
from connect_server_spark.session import get_spark

# Headline set: grows as phases land. Keep it representative, not exhaustive —
# one per operator family that matters at scale.
HEADLINE = [
    "scan_status_read_path",
    "scan_ops_matrix",
    "scan_null_semantics",
    "scan_user_scoped",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="connect_server_spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("WARN")

    queries = registry.all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm-up: JVM/codegen/parquet-footer caches, not measured.
    queries[names[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
