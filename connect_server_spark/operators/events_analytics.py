"""Event-sequence analytics: funnels and retention cohorts.

The reference's event surface stops at status scans; these are the two
canonical event-table workloads every analytics engine ships, built for
Spark's shuffle shape:

* ``funnel_times`` / ``funnel_counts`` — ordered-step conversion: for
  each user, the earliest strictly-increasing completion time of each
  successive step, computed with ONE per-user aggregation and a
  scan-stage array fold (no per-step join chain, no UDF: the sorted
  per-user event array folds through ``F.aggregate`` with a K-slot
  timestamp struct, K fixed at plan time). An optional horizon bounds
  the whole funnel to a window after step 1.
* ``retention_cohorts`` — the cohort × period-offset activity matrix:
  cohort = the user's first-activity bucket; one distinct-activity
  aggregation, one broadcast-free equi-join back on user, one final
  narrow roll-up. All shuffles carry (user, bucket) or
  (cohort, offset) pairs, never event payloads.

Scale notes: the funnel's ``collect_list`` holds one user's events —
bounded by per-user activity, the same invariant every sessionizer
already relies on; a pathological single user with 10⁸ events needs
pre-capping upstream (that is a data-quality bug, not a funnel). The
fold is linear in the user's events and purely columnar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connect_server_spark.operators.temporal import time_bucket

__all__ = ["funnel_times", "funnel_counts", "retention_cohorts"]


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    horizon_seconds: int | None = None,
) -> DataFrame:
    """Per-user earliest completion time of each funnel step, in order.

    Semantics (the standard strict funnel): ``t1`` is the user's first
    ``steps[0]`` event; ``t_{k+1}`` is the first ``steps[k+1]`` event
    STRICTLY after ``t_k``. With ``horizon_seconds``, steps 2..K must
    land within the horizon after ``t1``. Returns one row per user who
    reached step 1, with ``t_1..t_K`` (nulls past the reached depth) and
    ``reached`` = number of completed steps.

    Plan: one hash partition by user (the groupBy), events carried as
    (ts, type) structs, ``sort_array`` + one ``aggregate`` fold per row.
    No joins, no windows, no Python.
    """
    if not steps:
        raise ValueError("need at least one funnel step")
    k = len(steps)
    ev = df.select(
        F.col(user_col).alias("user"),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(type_col).alias("et")
        ).alias("e"),
    ).filter(F.col(f"e.et").isin(list(steps)))
    per_user = ev.groupBy("user").agg(
        F.sort_array(F.collect_list("e")).alias("evs")
    )

    # Fold state: a K-slot struct of timestamps (null = step not yet
    # reached). An event advances the state iff it is the NEXT step and
    # strictly later than the previous step's time (and inside the
    # horizon when one is set).
    init = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{i+1}") for i in range(k)]
    )

    def step_fold(acc: Column, e: Column) -> Column:
        fields = []
        for i in range(k):
            cur = acc[f"t{i+1}"]
            prev_done = F.lit(True) if i == 0 else acc[f"t{i}"].isNotNull()
            ordered = (
                F.lit(True) if i == 0 else (e["ts"] > acc[f"t{i}"])
            )
            in_horizon = F.lit(True)
            if horizon_seconds is not None and i > 0:
                in_horizon = e["ts"] <= (
                    acc["t1"] + F.make_interval(secs=F.lit(horizon_seconds))
                )
            take = (
                cur.isNull()
                & prev_done
                & (e["et"] == steps[i])
                & ordered
                & in_horizon
            )
            fields.append(
                F.when(take, e["ts"]).otherwise(cur).alias(f"t{i+1}")
            )
        return F.struct(*fields)

    folded = per_user.select(
        "user", F.aggregate("evs", init, step_fold).alias("f")
    )
    reached = F.lit(0)
    for i in range(k):
        reached = reached + F.col(f"f.t{i+1}").isNotNull().cast("int")
    return (
        folded.select(
            F.col("user").alias(user_col),
            *[F.col(f"f.t{i+1}").alias(f"t{i+1}") for i in range(k)],
            reached.alias("reached"),
        )
        .filter(F.col("t1").isNotNull())
    )


def funnel_counts(times: DataFrame, k: int) -> DataFrame:
    """Step-level conversion rollup of a :func:`funnel_times` result:
    users reaching step i, as one tiny aggregation (the per-step counts
    come from one pass over ``reached`` — no re-scan per step)."""
    aggs = [
        F.sum((F.col("reached") >= i + 1).cast("long")).alias(f"n{i+1}")
        for i in range(k)
    ]
    wide = times.agg(*aggs)
    # unpivot the single wide row into (step, n_users) — stack is a
    # scan-stage generate on one row
    pairs = ", ".join(f"{i+1}, n{i+1}" for i in range(k))
    return wide.selectExpr(
        f"stack({k}, {pairs}) AS (step, n_users)"
    ).orderBy("step")


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    bucket (the cohort), counted in every later bucket they were active
    in. Returns (cohort_ts, period_offset, n_active) with offset in
    buckets (0 = the cohort bucket itself).

    Plan: distinct (user, bucket) activity pairs (one narrow shuffle),
    per-user min bucket (reuses the same partitioning), an equi-join on
    user (narrow rows), and the final (cohort, offset) roll-up."""
    act = (
        df.select(
            F.col(user_col).alias("user"),
            time_bucket(F.col(ts_col), bucket_seconds).alias("bucket_ts"),
        )
        .distinct()
    )
    first = act.groupBy("user").agg(F.min("bucket_ts").alias("cohort_ts"))
    joined = act.join(first, "user")
    offset = (
        (F.unix_timestamp("bucket_ts") - F.unix_timestamp("cohort_ts"))
        / bucket_seconds
    ).cast("long")
    # Plain count, not count_distinct: `act` is distinct per (user,
    # bucket) and offset is a function of (bucket, user's cohort), so
    # each (cohort, offset, user) triple already appears exactly once —
    # count_distinct would add an Expand + an extra Exchange for nothing.
    return (
        joined.select("user", "cohort_ts", offset.alias("period_offset"))
        .groupBy("cohort_ts", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
