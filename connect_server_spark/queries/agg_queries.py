"""Driver queries for the grouping-sets aggregation surface.

SURVEY §2.4: the reference has no grouping-set queries, but the Spark
engine gets ``rollup``/``cube`` free from Catalyst (one Expand + one
hash aggregate — map-side combined, no extra shuffle versus a plain
groupBy), so the surface is exposed and oracle-gated here.

Value sums use ``floor(value*100)`` integer cents: ``floor`` over the
identical IEEE product is bit-deterministic in both engines, where a
rounded double sum could drift one ulp across aggregation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.registry import register
from connect_server_spark.tables import load_table


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (event_type, cohort): per-pair, per-type, and grand
    totals with grouping indicators."""
    e = load_table(spark, "events", sf_dir)
    base = e.select(
        "event_type",
        (F.col("user_id") % 10).alias("cohort"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        base.rollup("event_type", "cohort")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("cohort").cast("int").alias("g_cohort"),
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            "event_type", "cohort", "g_type", "g_cohort", "n", "sum_cents",
        )
    )


register(
    "events_rollup",
    events_rollup,
    sql="""
    SELECT event_type,
           user_id % 10 AS cohort,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           CAST(GROUPING(user_id % 10) AS INT) AS g_cohort,
           count(*) AS n,
           sum(CAST(floor(value * 100) AS BIGINT)) AS sum_cents
    FROM events
    GROUP BY ROLLUP (event_type, user_id % 10)
    """,
)


def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, cohort): all four grouping sets."""
    e = load_table(spark, "events", sf_dir)
    base = e.select(
        "event_type",
        (F.col("user_id") % 10).alias("cohort"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        base.cube("event_type", "cohort")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("cohort").cast("int").alias("g_cohort"),
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            "event_type", "cohort", "g_type", "g_cohort", "n", "sum_cents",
        )
    )


register(
    "events_cube",
    events_cube,
    sql="""
    SELECT event_type,
           user_id % 10 AS cohort,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           CAST(GROUPING(user_id % 10) AS INT) AS g_cohort,
           count(*) AS n,
           sum(CAST(floor(value * 100) AS BIGINT)) AS sum_cents
    FROM events
    GROUP BY CUBE (event_type, user_id % 10)
    """,
)
