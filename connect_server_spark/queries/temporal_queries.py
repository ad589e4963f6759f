"""Driver queries for the temporal operator family (as-of join,
bucketized interval join, hypertable rollup cascade) over the events
table.

All three register rows-only (the driver's 50-query oracle window is
fully allocated); their oracle-grade gates are the DuckDB-mirror tests
in ``tests/test_temporal.py`` — DuckDB runs a native ``ASOF JOIN``, a
plain inequality join, and per-level ``time_bucket`` recomputation on
the same parquet, and the mirrors assert exact row equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.operators.temporal import (
    asof_join,
    interval_join,
    rollup_cascade,
)
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the latest purchase by the same user at-or-before
    the click (24 h tolerance) — the attribution query every event
    pipeline runs, expressed as the single-shuffle union + last-value
    window as-of join."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    # One right row per (user, ts): dedupe simultaneous purchases to the
    # max event_id so the as-of tie-break is deterministic and the
    # DuckDB mirror is unambiguous.
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("purchase_id"),
            F.max_by("value", "event_id").alias("purchase_value"),
        )
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        direction="backward",
        tolerance=F.expr("INTERVAL 24 HOURS"),
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.col("ts_matched").alias("purchase_ts"),
        F.col("purchase_id_matched").alias("purchase_id"),
        F.col("purchase_value_matched").alias("purchase_value"),
    )


# Promoted into the gated-50 window in r10 (third rotation, displacing
# the frozen submission_parse): DuckDB's native ASOF LEFT JOIN checks
# the single-shuffle union+window as-of against an INDEPENDENT
# implementation of the same semantics (inclusive backward match, 24 h
# tolerance) — exactly what the external gate is for. The mirror ran
# green in tests/test_temporal.py since r6.
register(
    "events_asof_join",
    events_asof_join,
    sql="""
    WITH clicks AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, max(event_id) AS purchase_id,
             max_by(value, event_id) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.user_id, c.event_id, c.ts, c.value,
           CASE WHEN c.ts - p.ts <= INTERVAL 24 HOURS
                THEN p.ts END AS purchase_ts,
           CASE WHEN c.ts - p.ts <= INTERVAL 24 HOURS
                THEN p.purchase_id END AS purchase_id,
           CASE WHEN c.ts - p.ts <= INTERVAL 24 HOURS
                THEN p.purchase_value END AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)


def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user point-in-interval join: every 40th event opens a
    [ts, ts + 1..7 h) interval; all of that user's events landing inside
    it match. Bucketized (1 h buckets) so the plan is an equi-join on
    (user, bucket) — never an inequality cross-join."""
    ev = load_table(spark, "events", sf_dir)
    points = ev.select("user_id", "event_id", "ts", "event_type")
    intervals = ev.filter(F.col("event_id") % 40 == 0).select(
        "user_id",
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start_ts"),
        (
            F.col("ts")
            + F.make_interval(hours=(F.col("event_id") % 7 + 1).cast("int"))
        ).alias("end_ts"),
    )
    out = interval_join(
        points,
        intervals,
        on="user_id",
        point_ts="ts",
        start_col="start_ts",
        end_col="end_ts",
        bucket_seconds=3600,
    )
    return out.select(
        "user_id", "event_id", "ts", "event_type",
        "interval_id", "start_ts", "end_ts",
    )


# Promoted in r10 (displacing the frozen submission_rollup): the
# bucketized equi-join form vs DuckDB's direct inequality join — the
# external gate proves the bucket trick changes the PLAN, never the
# rows. Mirror green in tests/test_temporal.py since r6.
register(
    "events_interval_join",
    events_interval_join,
    sql="""
    WITH intervals AS (
      SELECT user_id, event_id AS interval_id, ts AS start_ts,
             ts + to_hours(CAST(event_id % 7 + 1 AS BIGINT)) AS end_ts
      FROM events WHERE event_id % 40 = 0
    )
    SELECT e.user_id, e.event_id, e.ts, e.event_type,
           i.interval_id, i.start_ts, i.end_ts
    FROM events e JOIN intervals i
      ON e.user_id = i.user_id
     AND i.start_ts <= e.ts AND e.ts < i.end_ts
    """,
)


# The cascade's nested widths: 1 min → 1 h → 1 d. Coarser levels read the
# finer level's partials, never the raw events.
CASCADE_WIDTHS = [60, 3600, 86400]


def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate of event values per type at
    minute/hour/day resolution — one raw scan, each coarser level
    re-aggregated from the finer level's mergeable partials.

    Oracle-gated since the r11 rotation. Gate-stable output: the raw
    double ``sum_v``/``avg_v`` partials depend on merge order in the
    last ulp, so the query finalizes to the repo's integer-cents
    convention — ``sum_cents = round(sum_v·100)`` is exact (the events
    ``value`` column lives on the 0.01 grid; accumulated fp error is
    ~1e-5 cents, far below the 0.5 rounding radius) and
    ``avg_microcents`` is integer division of exact integers, identical
    in any engine. ``min_v``/``max_v`` pass through raw (each is an
    actual input value, merge-order-free)."""
    ev = load_table(spark, "events", sf_dir)
    # partials directly (no finalize_partials: its float avg_v would be
    # discarded — the gate-stable average is derived from sum_cents)
    return (
        rollup_cascade(ev, "ts", "value", ["event_type"], CASCADE_WIDTHS)
        .select(
            "event_type",
            "bucket_ts",
            "bucket_seconds",
            "n",
            F.round(F.col("sum_v") * 100).cast("long").alias("sum_cents"),
            "min_v",
            "max_v",
        )
        .withColumn("avg_microcents", F.expr("(sum_cents * 10000) div n"))
    )


EVENTS_ROLLUP_CASCADE_ORACLE_SQL = """
    WITH lv AS (SELECT unnest([60, 3600, 86400]) AS w)
    SELECT event_type,
           CAST(to_timestamp(floor(epoch(ts) / w) * w) AS TIMESTAMP)
             AS bucket_ts,
           CAST(w AS BIGINT) AS bucket_seconds,
           count(value) AS n,
           CAST(round(sum(value) * 100) AS BIGINT) AS sum_cents,
           min(value) AS min_v, max(value) AS max_v,
           (CAST(round(sum(value) * 100) AS BIGINT) * 10000)
             // count(value) AS avg_microcents
    FROM events, lv GROUP BY 1, 2, 3
"""

register(
    "events_rollup_cascade",
    events_rollup_cascade,
    sql=EVENTS_ROLLUP_CASCADE_ORACLE_SQL,
)


def events_rollup_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry anomaly scan over the hourly rollup level: each
    (event_type, hour) bucket's cent total flagged against its trailing
    24 hours. The window input is the rollup's partial rows (one per
    bucket), never raw events.

    Oracle-gated since the r12 rotation. Gate-stable by the
    integer-moments restatement (``rollup_anomalies_exact``): the float
    z-score mirror needed rounding slack near the 1e-6 grid, so the
    gated form carries the exact BIGINT moments and the |z| > 3 flag as
    ``dev² > 9·denom`` — bit-identical in any engine. The float-z
    operator (``rollup_zscores``) stays for human telemetry and keeps
    its tolerance-checked mirror in ``tests/test_temporal.py``."""
    from connect_server_spark.operators.temporal import (
        bucket_partials,
        rollup_anomalies_exact,
    )

    ev = load_table(spark, "events", sf_dir)
    hourly = bucket_partials(ev, "ts", "value", ["event_type"], 3600)
    return rollup_anomalies_exact(
        hourly, ["event_type"], trailing=24, min_history=6, thresh_sq=9
    )


EVENTS_ROLLUP_ANOMALIES_ORACLE_SQL = """
    WITH hourly AS (
      SELECT event_type,
             CAST(to_timestamp(floor(epoch(ts) / 3600) * 3600) AS TIMESTAMP)
               AS bucket_ts,
             CAST(round(sum(value) * 100) AS BIGINT) AS sum_cents
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, bucket_ts, sum_cents,
             CAST(count(sum_cents) OVER tw AS BIGINT) AS n_history,
             CAST(sum(sum_cents) OVER tw AS BIGINT) AS trailing_sum_cents,
             CAST(sum(sum_cents * sum_cents) OVER tw AS BIGINT)
               AS trailing_sumsq_cents2
      FROM hourly
      WINDOW tw AS (PARTITION BY event_type ORDER BY bucket_ts
                    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket_ts, sum_cents, n_history,
           trailing_sum_cents, trailing_sumsq_cents2,
           CASE WHEN n_history >= 6
                THEN sum_cents * n_history - trailing_sum_cents END
             AS dev_cents,
           CASE WHEN n_history >= 6
                THEN n_history * trailing_sumsq_cents2
                     - trailing_sum_cents * trailing_sum_cents END
             AS denom_cents2,
           CASE WHEN n_history >= 6
                 AND n_history * trailing_sumsq_cents2
                     - trailing_sum_cents * trailing_sum_cents > 0
                THEN CAST(
                  (sum_cents * n_history - trailing_sum_cents)
                  * (sum_cents * n_history - trailing_sum_cents)
                  > 9 * (n_history * trailing_sumsq_cents2
                         - trailing_sum_cents * trailing_sum_cents)
                  AS INTEGER) END
             AS is_anomaly
    FROM scored
"""

register(
    "events_rollup_anomalies",
    events_rollup_anomalies,
    sql=EVENTS_ROLLUP_ANOMALIES_ORACLE_SQL,
)


def events_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-session detection: per user, which of their intervals
    (every 40th event opens one, as in events_interval_join) overlap an
    interval opened by every 25th event — the session-overlap shape,
    dedup-free by the home-bucket trick."""
    from connect_server_spark.operators.temporal import overlap_join

    ev = load_table(spark, "events", sf_dir)

    def intervals(mod: int, hours_mod: int) -> DataFrame:
        return ev.filter(F.col("event_id") % mod == 0).select(
            "user_id",
            F.col("event_id").alias("interval_id"),
            F.col("ts").alias("start_ts"),
            (
                F.col("ts")
                + F.make_interval(
                    hours=(F.col("event_id") % hours_mod + 1).cast("int")
                )
            ).alias("end_ts"),
        )

    a = intervals(40, 7)
    b = intervals(25, 5).withColumnRenamed("interval_id", "other_id")
    out = overlap_join(a, b, on="user_id", bucket_seconds=3600)
    return out.select(
        "user_id", "interval_id", "start_ts", "end_ts",
        "other_id", F.col("start_ts_r").alias("other_start_ts"),
        F.col("end_ts_r").alias("other_end_ts"),
    )


# Promoted in r10 (displacing the frozen endpoint_http_host): the
# home-bucket dedup-free overlap join vs DuckDB's direct
# greatest/least inequality join. Mirror green in
# tests/test_temporal.py since r7.
register(
    "events_overlap_join",
    events_overlap_join,
    sql="""
    WITH a AS (
      SELECT user_id, event_id AS interval_id, ts AS start_ts,
             ts + to_hours(CAST(event_id % 7 + 1 AS BIGINT)) AS end_ts
      FROM events WHERE event_id % 40 = 0
    ), b AS (
      SELECT user_id, event_id AS other_id, ts AS start_ts,
             ts + to_hours(CAST(event_id % 5 + 1 AS BIGINT)) AS end_ts
      FROM events WHERE event_id % 25 = 0
    )
    SELECT a.user_id, a.interval_id, a.start_ts, a.end_ts,
           b.other_id, b.start_ts AS other_start_ts,
           b.end_ts AS other_end_ts
    FROM a JOIN b ON a.user_id = b.user_id
     AND greatest(a.start_ts, b.start_ts) < least(a.end_ts, b.end_ts)
    """,
)
