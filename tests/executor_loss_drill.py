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
