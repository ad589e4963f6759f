"""Measure checkpoint_mode overhead (local vs reliable) for the long
composites — SCALE.md §"Reliable stage boundaries" rows.

Interleaves the two arms per repetition (container timing drift is
MONOTONIC within a session window, so sequential arms would measure the
drift, not the knob) and reports best-of-reps per mode plus the
checkpoint-directory footprint observed right after each reliable run
(the cleaner GCs file-sets when their RDDs are collected, so the
post-run size is the job's working footprint, a lower bound on peak).

Usage:
    python tools/measure_reliable_overhead.py --sf /tmp/scale_sf1 \
        training_release dedup_neardup_minhash dedup_semantic

Run on an otherwise idle machine.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from connect_server_spark import registry
    from connect_server_spark.execution import (
        CHECKPOINT_MODE_KEY,
        set_checkpoint_mode,
    )
    from connect_server_spark.session import get_spark

    spark = get_spark(app_name="reliable_overhead")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    base_root = tempfile.mkdtemp(prefix="reliable_overhead_ckpt_")
    run_seq = [0]

    def run_once(name: str, mode: str) -> tuple[float, int]:
        # fresh checkpoint dir per RUN: the cleaner GCs file-sets only
        # when their RDDs are collected, so a shared dir accretes across
        # runs and the footprint reading would be cumulative, not
        # per-job
        run_seq[0] += 1
        ckpt_root = os.path.join(base_root, f"run{run_seq[0]:04d}")
        set_checkpoint_mode(spark, mode, checkpoint_dir=ckpt_root)
        t0 = time.perf_counter()
        df = qs[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        foot = _dir_bytes(ckpt_root) if mode == "reliable" else 0
        spark.conf.set(CHECKPOINT_MODE_KEY, "local")
        return dt, foot

    out = {}
    for name in args.queries:
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        run_once(name, "local")  # shared warm-up (JVM, page cache, /tmp fixtures)
        best = {"local": float("inf"), "reliable": float("inf")}
        foot = 0
        for _ in range(args.reps):
            for mode in ("local", "reliable"):  # interleaved arms
                dt, fb = run_once(name, mode)
                best[mode] = min(best[mode], dt)
                foot = max(foot, fb)
        row = {
            "local_s": round(best["local"], 2),
            "reliable_s": round(best["reliable"], 2),
            "overhead": round(best["reliable"] / best["local"], 2),
            "ckpt_footprint_mb": round(foot / 1e6, 1),
        }
        out[name] = row
        print(name, json.dumps(row))
    print(json.dumps({"sf_dir": args.sf, "results": out}))
    shutil.rmtree(base_root, ignore_errors=True)


if __name__ == "__main__":
    main()
