"""Driver queries for the windowed-aggregation surface over ``events``
(batch semantics oracle-gated; the streaming path is exercised by
``tests/test_streaming.py`` with readStream + watermark)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.registry import register
from connect_server_spark.streaming.windows import (
    session_counts,
    sliding_value_sums,
    tumbling_counts,
)
from connect_server_spark.tables import load_events


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_events(spark, sf_dir))


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_value_sums(load_events(spark, sf_dir))


def events_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1h counts per event_type) and sliding (1h window / 30min
    slide value sums) arms tagged and unioned into one gated result.
    Column contract: ``grp`` carries the tumbling arm's event_type (null
    for sliding); ``measure`` is the count / cents-sum respectively. Both
    arms are single windowed hash aggregates over the projected events
    scan — the same plans Structured Streaming runs incrementally
    (``tests/test_streaming.py``)."""
    tumbling = events_tumbling_hourly(spark, sf_dir).select(
        F.lit("tumbling").alias("kind"),
        "window_start",
        F.col("event_type").alias("grp"),
        F.col("n_events").alias("measure"),
    )
    sliding = events_sliding_windows(spark, sf_dir).select(
        F.lit("sliding").alias("kind"),
        "window_start",
        F.lit(None).cast("string").alias("grp"),
        F.col("value_cents").alias("measure"),
    )
    return tumbling.unionAll(sliding)


register(
    "events_time_windows",
    events_time_windows,
    sql="""
    SELECT 'tumbling' AS kind,
           time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
           event_type AS grp,
           count(*) AS measure
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS kind, window_start,
           CAST(NULL AS VARCHAR) AS grp,
           CAST(sum(cents) AS BIGINT) AS measure
    FROM (
      WITH b AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS bucket,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
      )
      SELECT bucket AS window_start, cents FROM b
      UNION ALL
      SELECT bucket - INTERVAL 30 MINUTE AS window_start, cents FROM b
    )
    GROUP BY 1, 2, 3
    """,
)


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_counts(load_events(spark, sf_dir))


register(
    "events_session_windows",
    events_session_windows,
    sql="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
             lag(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY user_id ORDER BY ts) AS prev_t
      FROM events
    ),
    marked AS (
      SELECT user_id, t,
             CASE WHEN prev_t IS NULL
                       OR t - prev_t > INTERVAL 5 MINUTE THEN 1 ELSE 0 END
               AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, t,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT min(t) AS session_start, user_id, count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
