"""Driver queries for event-sequence analytics (funnel, retention).

Rows-only by gate capacity; the oracle-grade DuckDB mirrors (per-step
correlated-min funnel, cohort matrix) run in
``tests/test_events_analytics.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from connect_server_spark.operators.events_analytics import (
    funnel_times,
    retention_cohorts,
)
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table

FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_HORIZON_S = 7 * 86400

COHORT_BUCKET_S = 7 * 86400


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase strict funnel per user, 7-day horizon:
    earliest strictly-increasing completion times + reached depth."""
    ev = load_table(spark, "events", sf_dir)
    return funnel_times(
        ev, "user_id", "ts", "event_type", FUNNEL_STEPS,
        horizon_seconds=FUNNEL_HORIZON_S,
    )


# Oracle: correlated-min per step (equivalent to the array fold — each
# step's qualification is monotone in ts, so first-qualifying ==
# min-qualifying). Promoted into the gated-50 window in r9 in place of
# a long-stable trivial gate (r8 verdict ask #4); the pytest mirror in
# tests/test_events_analytics.py imports this SAME string so the two
# can never drift.
EVENTS_FUNNEL_ORACLE_SQL = f"""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + to_seconds({FUNNEL_HORIZON_S})
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + to_seconds({FUNNEL_HORIZON_S})
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
           1 + (s2.t2 IS NOT NULL)::INT + (s3.t3 IS NOT NULL)::INT
             AS reached
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """

register("events_funnel", events_funnel, sql=EVENTS_FUNNEL_ORACLE_SQL)


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over the events table."""
    ev = load_table(spark, "events", sf_dir)
    return retention_cohorts(
        ev, "user_id", "ts", bucket_seconds=COHORT_BUCKET_S
    )


# Oracle: distinct (user, week-bucket) activity → first bucket per user
# is the cohort → per (cohort, offset) distinct-user counts. Promoted
# into the gated-50 window in r9 (r8 verdict ask #4); shared with the
# pytest mirror.
EVENTS_RETENTION_ORACLE_SQL = f"""
    WITH act AS (
      SELECT DISTINCT user_id,
        CAST(to_timestamp(floor(epoch(ts) / {COHORT_BUCKET_S})
             * {COHORT_BUCKET_S}) AS TIMESTAMP) AS b
      FROM events
    ),
    first AS (
      SELECT user_id, min(b) AS c FROM act GROUP BY user_id
    )
    SELECT c AS cohort_ts,
           CAST((epoch(b) - epoch(c)) / {COHORT_BUCKET_S} AS BIGINT)
             AS period_offset,
           count(DISTINCT user_id) AS n_active
    FROM act JOIN first USING (user_id)
    GROUP BY 1, 2
    """

register("events_retention", events_retention, sql=EVENTS_RETENTION_ORACLE_SQL)


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-join skew report over the events table: top-20 users by
    event count with their exact share — the diagnostic that decides
    whether a user-keyed join needs ``storage.salted_join`` / a raised
    AQE skew threshold before it runs at 100 TB. Narrow (key, count)
    aggregation + TakeOrdered; no global sort, no data rows shuffled."""
    from connect_server_spark.storage import heavy_hitters

    ev = load_table(spark, "events", sf_dir)
    return heavy_hitters(ev, "user_id", k=20)


# Promoted in r10 (displacing the frozen uri_normalize): exact
# count/share top-20 with deterministic tie-break — full SQL oracle,
# green as a pytest mirror since r6.
register(
    "events_heavy_hitters",
    events_heavy_hitters,
    sql="""
    WITH c AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    )
    SELECT user_id, n,
           round(n / (SELECT sum(n) FROM c), 6) AS share
    FROM c ORDER BY n DESC, user_id ASC LIMIT 20
    """,
)


def events_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user telemetry per event_type from an HLL SKETCH LEDGER
    (``operators/sketches.py``): the events table arrives as four
    simulated ingest batches, each persisting a KB-sized partial sketch
    row per group (replay-idempotent ``batch=<id>`` overwrite, the BM25
    termstats discipline); the answer unions ledger rows — O(batches ×
    groups), never a re-scan of history. lg_k=12 → ~1.6% RSE; accuracy,
    merge-order invariance, replay convergence and compaction
    equivalence are pinned in ``tests/test_sketches.py``. Rows-only:
    DuckDB's approx_count_distinct is a different estimator, so the
    pytest oracle compares against EXACT distincts with the sketch's
    error bound instead."""
    from pyspark.sql import functions as F

    from connect_server_spark.operators.sketches import (
        distinct_estimates,
        write_sketch_partial,
    )
    from connect_server_spark.queries._fixtures import (
        fixture_ready,
        guarded_fixture_root,
    )
    from connect_server_spark.tables import dataset_cache_key

    key = dataset_cache_key(sf_dir, "events")
    root = (
        guarded_fixture_root(
            spark,
            "SPARK_GRAFT_SKETCH_FIXTURE_DIR",
            "/tmp/connect_server_spark_sketch_ledger_v1",
        )
        + f"/{key}"
    )
    ev = load_table(spark, "events", sf_dir)
    # completion = the LAST batch's _SUCCESS, not the root dir (Spark
    # creates root at batch 0 — a crash mid-build must rebuild, not
    # serve a quarter of the events as "the corpus")
    if not fixture_ready(spark, f"{root}/batch=3/_SUCCESS"):
        for b in range(4):
            write_sketch_partial(
                ev.filter(F.col("event_id") % 4 == b),
                root,
                b,
                "user_id",
                by=["event_type"],
            )
    return (
        distinct_estimates(spark, root, by=["event_type"])
        .orderBy("event_type")
    )


register("events_distinct_sketch", events_distinct_sketch, defer=True)
