"""Interleaved fresh-JVM tree A/B for the optimization rounds.

The container's effective speed swings >2x between (and within)
sessions, so raw cross-session seconds are not comparable. This runner
alternates minibench sessions between two checked-out trees
(A B A B ...), several rounds each, and reports per-query best-of-round
per arm plus the per-round pairs, so a code change is adjudicated by
many same-neighborhood pairs rather than two distant sessions.

    python tools/ab_trees.py TREE_A TREE_B "q1,q2,..." [rounds] [sf_dir]

TREE_A / TREE_B are repo roots (e.g. a `git worktree add` of the
pre-change commit, and this working tree). Exit 0 always; read the
table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_minibench(tree: str, sf_dir: str, queries: str, reps: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_REPS"] = str(reps)
    env.pop("SPARK_GRAFT_MASTER", None)
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "tools", "minibench.py"), sf_dir, queries],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    last = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not last:
        raise RuntimeError(
            f"minibench in {tree} produced no JSON\n--- stdout\n{out.stdout[-2000:]}"
            f"\n--- stderr\n{out.stderr[-2000:]}"
        )
    return json.loads(last[-1])


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    queries = sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sf_dir = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    results: dict[str, dict[str, list[float]]] = {}
    cals: dict[str, list[float]] = {"A": [], "B": []}
    for r in range(rounds):
        for arm, tree in (("A", tree_a), ("B", tree_b)):
            res = run_minibench(tree, sf_dir, queries, reps)
            for key in ("calibration", "calibration_sec"):
                if key in res:
                    cals[arm].append(res[key])
                    break
            rows = res.get("queries", res)
            for q, row in rows.items():
                if not isinstance(row, dict) or "min" not in row:
                    continue
                results.setdefault(q, {"A": [], "B": []})[arm].append(row["min"])
            print(
                f"round {r} arm {arm}: "
                + json.dumps(
                    {
                        q: row["min"]
                        for q, row in rows.items()
                        if isinstance(row, dict) and "min" in row
                    }
                ),
                flush=True,
            )

    print("\n=== best-of-rounds (min over per-session mins) ===")
    summary = {}
    for q, arms in sorted(results.items()):
        a, b = min(arms["A"]), min(arms["B"])
        summary[q] = {
            "A_min": round(a, 4),
            "B_min": round(b, 4),
            "B_over_A": round(b / a, 3) if a else None,
            "A_rounds": [round(x, 3) for x in arms["A"]],
            "B_rounds": [round(x, 3) for x in arms["B"]],
        }
        print(f"{q}: A={a:.3f} B={b:.3f} B/A={b/a:.3f}")
    print(json.dumps({"summary": summary, "calibrations": cals}))


if __name__ == "__main__":
    main()
