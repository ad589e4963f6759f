"""Driver queries for the windowed-aggregation surface over ``events``
(batch semantics oracle-gated; the streaming path is exercised by
``tests/test_streaming.py`` with readStream + watermark)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from connect_server_spark.registry import register
from connect_server_spark.streaming.windows import (
    session_counts,
    sliding_value_sums,
    tumbling_counts,
)
from connect_server_spark.tables import load_events


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_events(spark, sf_dir))


register(
    "events_tumbling_hourly",
    events_tumbling_hourly,
    sql="""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_value_sums(load_events(spark, sf_dir))


register(
    "events_sliding_windows",
    events_sliding_windows,
    sql="""
    WITH b AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS bucket,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events
    ),
    assigned AS (
      SELECT bucket AS window_start, cents FROM b
      UNION ALL
      SELECT bucket - INTERVAL 30 MINUTE AS window_start, cents FROM b
    )
    SELECT window_start, sum(cents) AS value_cents
    FROM assigned
    GROUP BY 1
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
