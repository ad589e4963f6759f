"""Event-sequence analytics (funnel, retention): behavioral unit tests
plus the oracle-grade DuckDB mirrors for the rows-only driver queries."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_server_spark.operators.events_analytics import (
    funnel_counts,
    funnel_times,
    retention_cohorts,
)
from connect_server_spark.queries.events_analytics_queries import (
    COHORT_BUCKET_S,
    FUNNEL_HORIZON_S,
    events_funnel,
    events_retention,
)


def _t(s):
    return dt.datetime.fromisoformat(s)


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, ts=_t(ts), event_type=et) for (u, ts, et) in rows]
    )


# --------------------------------------------------------------- funnel


def test_funnel_strict_ordering(spark):
    """Steps must advance strictly in time: an out-of-order purchase
    (before the click) does not complete the funnel."""
    ev = _ev(spark, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "click"),
        (1, "2024-01-01 12:00:00", "purchase"),   # in order: reached 3
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 09:00:00", "purchase"),   # before view: ignored
        (2, "2024-01-01 11:00:00", "click"),      # reached 2
        (3, "2024-01-01 10:00:00", "click"),      # never viewed: excluded
    ])
    out = {r.user_id: r.reached for r in funnel_times(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert out == {1: 3, 2: 2}


def test_funnel_takes_earliest_qualifying_times(spark):
    ev = _ev(spark, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 09:00:00", "view"),       # earlier view wins
        (1, "2024-01-01 09:30:00", "click"),      # after t1, before 10:00
        (1, "2024-01-01 11:00:00", "click"),
    ])
    [r] = funnel_times(
        ev, "user_id", "ts", "event_type", ["view", "click"]
    ).collect()
    assert r.t1 == _t("2024-01-01 09:00:00")
    assert r.t2 == _t("2024-01-01 09:30:00")


def test_funnel_equal_timestamp_is_not_strictly_after(spark):
    ev = _ev(spark, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:00:00", "click"),      # ts == t1: rejected
        (1, "2024-01-01 10:00:01", "click"),
    ])
    [r] = funnel_times(
        ev, "user_id", "ts", "event_type", ["view", "click"]
    ).collect()
    assert r.t2 == _t("2024-01-01 10:00:01")


def test_funnel_horizon_cuts_late_steps(spark):
    ev = _ev(spark, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:30:00", "click"),      # inside 1 h horizon
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 11:30:00", "click"),      # outside
    ])
    out = {r.user_id: r.reached for r in funnel_times(
        ev, "user_id", "ts", "event_type", ["view", "click"],
        horizon_seconds=3600,
    ).collect()}
    assert out == {1: 2, 2: 1}


def test_funnel_counts_rollup(spark):
    ev = _ev(spark, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "click"),
        (2, "2024-01-01 10:00:00", "view"),
    ])
    times = funnel_times(ev, "user_id", "ts", "event_type",
                         ["view", "click", "purchase"])
    got = [(r.step, r.n_users) for r in funnel_counts(times, 3).collect()]
    assert got == [(1, 2), (2, 1), (3, 0)]


def test_funnel_plan_single_user_shuffle_no_join(spark, sf_dir):
    plan = (
        events_funnel(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    n_ex = sum(1 for l in plan.splitlines()
               if "Exchange" in l and "ReusedExchange" not in l)
    assert n_ex == 1


def test_events_funnel_matches_duckdb_mirror(spark, sf_dir):
    """Correlated-min per step — since r9 this SQL is ALSO the driver's
    gated oracle (imported from events_analytics_queries so the two can
    never drift); the test keeps the sf0.001 fast check."""
    from connect_server_spark.queries.events_analytics_queries import (
        EVENTS_FUNNEL_ORACLE_SQL,
    )

    got = sorted(map(tuple, events_funnel(spark, sf_dir).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(map(tuple, con.execute(EVENTS_FUNNEL_ORACLE_SQL).fetchall()))
    assert len(got) > 0
    assert got == want


# ------------------------------------------------------------ retention


def test_retention_basic_matrix(spark):
    wk = 7 * 86400
    ev = _ev(spark, [
        (1, "2024-01-01 10:00:00", "view"),   # cohort week W
        (1, "2024-01-09 10:00:00", "view"),   # W+1
        (2, "2024-01-02 10:00:00", "view"),   # same cohort week
        (3, "2024-01-09 10:00:00", "view"),   # cohort W+1
    ])
    got = {
        (r.cohort_ts, r.period_offset): r.n_active
        for r in retention_cohorts(ev, "user_id", "ts", wk).collect()
    }
    cohorts = sorted({c for c, _ in got})
    assert len(cohorts) == 2
    w0, w1 = cohorts
    assert got[(w0, 0)] == 2       # users 1,2
    assert got[(w0, 1)] == 1       # user 1 returns
    assert got[(w1, 0)] == 1       # user 3
    # offset 0 is always >= any later offset for a cohort
    assert got[(w0, 0)] >= got[(w0, 1)]


def test_retention_multiple_events_count_once(spark):
    ev = _ev(spark, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "click"),
        (1, "2024-01-01 12:00:00", "view"),
    ])
    rows = retention_cohorts(ev, "user_id", "ts", 7 * 86400).collect()
    assert [(r.period_offset, r.n_active) for r in rows] == [(0, 1)]


def test_events_retention_matches_duckdb_mirror(spark, sf_dir):
    """Since r9 the same SQL is the driver's gated oracle (imported
    from events_analytics_queries)."""
    from connect_server_spark.queries.events_analytics_queries import (
        EVENTS_RETENTION_ORACLE_SQL,
    )

    got = sorted(map(tuple, events_retention(spark, sf_dir).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(EVENTS_RETENTION_ORACLE_SQL).fetchall())
    )
    assert len(got) > 0
    assert got == want


def test_events_heavy_hitters_matches_duckdb_mirror(spark, sf_dir):
    """Exact count/share top-k with deterministic tie-break — full SQL
    oracle."""
    from connect_server_spark.queries.events_analytics_queries import (
        events_heavy_hitters,
    )

    got = [tuple(r) for r in events_heavy_hitters(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute("""
        WITH c AS (
          SELECT user_id, count(*) AS n FROM events GROUP BY user_id
        )
        SELECT user_id, n,
               round(n / (SELECT sum(n) FROM c), 6) AS share
        FROM c ORDER BY n DESC, user_id ASC LIMIT 20
        """).fetchall()
    ]
    assert got == want and 0 < len(got) <= 20
