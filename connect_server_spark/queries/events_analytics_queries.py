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


register("events_funnel", events_funnel, defer=True)


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over the events table."""
    ev = load_table(spark, "events", sf_dir)
    return retention_cohorts(
        ev, "user_id", "ts", bucket_seconds=COHORT_BUCKET_S
    )


register("events_retention", events_retention, defer=True)


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-join skew report over the events table: top-20 users by
    event count with their exact share — the diagnostic that decides
    whether a user-keyed join needs ``storage.salted_join`` / a raised
    AQE skew threshold before it runs at 100 TB. Narrow (key, count)
    aggregation + TakeOrdered; no global sort, no data rows shuffled."""
    from connect_server_spark.storage import heavy_hitters

    ev = load_table(spark, "events", sf_dir)
    return heavy_hitters(ev, "user_id", k=20)


register("events_heavy_hitters", events_heavy_hitters, defer=True)
