"""Temporal operator family: as-of join, bucketized interval join,
hypertable rollup cascade.

The three driver queries register rows-only (the 50-slot oracle window
is fully allocated), so their oracle-grade gates live HERE: DuckDB runs
a native ``ASOF JOIN``, a plain inequality join, and per-level
``time_bucket`` recomputation on the same parquet, and the mirrors
assert exact row equality.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_server_spark.operators.temporal import (
    asof_join,
    bucket_partials,
    finalize_partials,
    interval_join,
    merge_partials,
    rollup_cascade,
)
from connect_server_spark.queries.temporal_queries import (
    CASCADE_WIDTHS,
    events_asof_join,
    events_interval_join,
    events_rollup_cascade,
)
from connect_server_spark.tables import load_table


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


# ---------------------------------------------------------------- as-of


def test_asof_join_matches_duckdb_asof(spark, sf_dir):
    """The driver query vs DuckDB's native ASOF LEFT JOIN (inclusive
    backward match) with the same 24 h tolerance."""
    got = sorted(map(tuple, events_asof_join(spark, sf_dir).collect()))
    want = sorted(map(tuple, _con(sf_dir).execute("""
        WITH clicks AS (
          SELECT user_id, ts, event_id, value FROM events
          WHERE event_type = 'click'
        ), purchases AS (
          SELECT user_id, ts, max(event_id) AS purchase_id,
                 max_by(value, event_id) AS purchase_value
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        )
        SELECT c.user_id, c.event_id, c.ts, c.value,
               CASE WHEN c.ts - p.ts <= INTERVAL 24 HOURS THEN p.ts END,
               CASE WHEN c.ts - p.ts <= INTERVAL 24 HOURS
                    THEN p.purchase_id END,
               CASE WHEN c.ts - p.ts <= INTERVAL 24 HOURS
                    THEN p.purchase_value END
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """).fetchall()))
    assert len(got) > 0
    assert got == want


def _t(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes_trades(spark):
    """The canonical finance as-of fixture: trades match the latest
    quote at-or-before them."""
    trades = spark.createDataFrame(
        [
            Row(sym="A", ts=_t("2024-01-01 10:00:00"), qty=5),
            Row(sym="A", ts=_t("2024-01-01 10:00:03"), qty=7),
            Row(sym="B", ts=_t("2024-01-01 09:59:59"), qty=1),
            Row(sym="C", ts=_t("2024-01-01 12:00:00"), qty=9),
        ]
    )
    quotes = spark.createDataFrame(
        [
            Row(sym="A", ts=_t("2024-01-01 10:00:00"), px=1.0),
            Row(sym="A", ts=_t("2024-01-01 10:00:02"), px=2.0),
            Row(sym="A", ts=_t("2024-01-01 10:00:04"), px=3.0),
            Row(sym="B", ts=_t("2024-01-01 10:00:00"), px=4.0),
        ]
    )
    return trades, quotes


def test_asof_backward_inclusive_and_missing(quotes_trades):
    trades, quotes = quotes_trades
    out = {
        (r.sym, r.ts): (r.ts_matched, r.px_matched)
        for r in asof_join(trades, quotes, on="sym").collect()
    }
    # equal-ts quote matches (inclusive)
    assert out[("A", _t("2024-01-01 10:00:00"))] == (
        _t("2024-01-01 10:00:00"), 1.0)
    # latest at-or-before, not just any earlier
    assert out[("A", _t("2024-01-01 10:00:03"))] == (
        _t("2024-01-01 10:00:02"), 2.0)
    # right row strictly after the left ts does not match backward
    assert out[("B", _t("2024-01-01 09:59:59"))] == (None, None)
    # key with no right rows at all survives with nulls
    assert out[("C", _t("2024-01-01 12:00:00"))] == (None, None)


def test_asof_forward_direction(quotes_trades):
    trades, quotes = quotes_trades
    out = {
        (r.sym, r.ts): (r.ts_matched, r.px_matched)
        for r in asof_join(
            trades, quotes, on="sym", direction="forward"
        ).collect()
    }
    assert out[("A", _t("2024-01-01 10:00:00"))] == (
        _t("2024-01-01 10:00:00"), 1.0)  # inclusive forward too
    assert out[("A", _t("2024-01-01 10:00:03"))] == (
        _t("2024-01-01 10:00:04"), 3.0)
    assert out[("B", _t("2024-01-01 09:59:59"))] == (
        _t("2024-01-01 10:00:00"), 4.0)
    assert out[("C", _t("2024-01-01 12:00:00"))] == (None, None)


def test_asof_tolerance_nulls_far_matches(quotes_trades):
    trades, quotes = quotes_trades
    out = {
        (r.sym, r.ts): r.px_matched
        for r in asof_join(
            trades, quotes, on="sym",
            tolerance=F.expr("INTERVAL 1 SECOND"),
        ).collect()
    }
    assert out[("A", _t("2024-01-01 10:00:03"))] == 2.0  # 1 s gap: kept
    assert out[("A", _t("2024-01-01 10:00:00"))] == 1.0  # 0 s gap: kept
    assert out[("B", _t("2024-01-01 09:59:59"))] is None


def test_asof_carries_genuinely_null_right_fields(spark):
    """The right payload travels as a struct: a NULL field on the
    matched right row must come through as NULL, not be skipped past to
    an older non-null value by ``last(ignorenulls)``."""
    left = spark.createDataFrame([Row(k=1, ts=_t("2024-01-01 10:00:05"))])
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_t("2024-01-01 10:00:00"), v="old"),
            Row(k=1, ts=_t("2024-01-01 10:00:04"), v=None),
        ],
        "k int, ts timestamp, v string",
    )
    [r] = asof_join(left, right, on="k").collect()
    assert r.ts_matched == _t("2024-01-01 10:00:04")
    assert r.v_matched is None


def test_asof_plan_single_window_shuffle(quotes_trades):
    """Scale contract: the as-of core is ONE hash partition by key (the
    window over the union) — no join node, no per-key explosion."""
    trades, quotes = quotes_trades
    plan = (
        asof_join(trades, quotes, on="sym")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    n_exchange = sum(
        1 for l in plan.splitlines()
        if "Exchange" in l and "ReusedExchange" not in l
    )
    assert n_exchange == 1


# ------------------------------------------------------------- interval


def test_interval_join_matches_duckdb(spark, sf_dir):
    got = sorted(map(tuple, events_interval_join(spark, sf_dir).collect()))
    want = sorted(map(tuple, _con(sf_dir).execute("""
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
    """).fetchall()))
    assert len(got) > 0
    assert got == want


def test_interval_join_bucket_width_invariance(spark, sf_dir):
    """Correctness is independent of the bucket width — width only moves
    cost between the explode and the post-filter."""
    ev = load_table(spark, "events", sf_dir)
    points = ev.select("user_id", "event_id", "ts")
    intervals = ev.filter(F.col("event_id") % 40 == 0).select(
        "user_id",
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 3 HOURS")).alias("end_ts"),
    )
    results = []
    for width in (600, 3600, 7200):
        out = interval_join(
            points, intervals, on="user_id",
            bucket_seconds=width,
        )
        results.append(sorted(map(tuple, out.collect())))
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0


def test_interval_join_half_open_bounds(spark):
    points = spark.createDataFrame(
        [
            Row(ts=_t("2024-01-01 10:00:00"), pid=1),  # == start: in
            Row(ts=_t("2024-01-01 11:00:00"), pid=2),  # == end: out
            Row(ts=_t("2024-01-01 10:59:59"), pid=3),  # just inside
        ]
    )
    intervals = spark.createDataFrame(
        [Row(iid=10,
             start_ts=_t("2024-01-01 10:00:00"),
             end_ts=_t("2024-01-01 11:00:00"))]
    )
    got = sorted(
        r.pid for r in interval_join(points, intervals, on=None).collect()
    )
    assert got == [1, 3]


def test_interval_join_left_keeps_uncovered_points(spark):
    points = spark.createDataFrame(
        [Row(ts=_t("2024-01-01 10:30:00"), pid=1),
         Row(ts=_t("2024-01-05 00:00:00"), pid=2)]
    )
    intervals = spark.createDataFrame(
        [Row(iid=10,
             start_ts=_t("2024-01-01 10:00:00"),
             end_ts=_t("2024-01-01 11:00:00"))]
    )
    rows = {r.pid: r.iid
            for r in interval_join(points, intervals, on=None,
                                   how="left").collect()}
    assert rows == {1: 10, 2: None}


def test_interval_join_keyless_is_still_equi_join(spark):
    """Even with no key, the bucket column keeps the join an equi-join —
    no BroadcastNestedLoopJoin / CartesianProduct fallback."""
    points = spark.createDataFrame(
        [Row(ts=_t("2024-01-01 10:30:00"), pid=1)]
    )
    intervals = spark.createDataFrame(
        [Row(iid=10,
             start_ts=_t("2024-01-01 10:00:00"),
             end_ts=_t("2024-01-01 11:00:00"))]
    )
    plan = (
        interval_join(points, intervals, on=None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_multi_bucket_span_no_duplicates(spark):
    """An interval spanning many buckets matches each contained point
    exactly once (each pair meets in the point's single bucket)."""
    points = spark.createDataFrame(
        [Row(ts=_t("2024-01-01 %02d:30:00" % h), pid=h) for h in range(24)]
    )
    intervals = spark.createDataFrame(
        [Row(iid=1,
             start_ts=_t("2024-01-01 02:00:00"),
             end_ts=_t("2024-01-01 20:00:00"))]
    )
    got = sorted(
        r.pid for r in interval_join(
            points, intervals, on=None, bucket_seconds=3600
        ).collect()
    )
    assert got == list(range(2, 20))


# --------------------------------------------------------------- rollup


def test_rollup_cascade_matches_duckdb(spark, sf_dir):
    """Every level of the cascade vs direct time_bucket recomputation in
    DuckDB — EXACT compare via the promoted oracle (r11 rotation): the
    query finalizes to integer cents/microcents precisely so no rounding
    slack is needed here or in the driver's value hash."""
    from connect_server_spark.queries.temporal_queries import (
        EVENTS_ROLLUP_CASCADE_ORACLE_SQL,
    )

    got = sorted(
        map(tuple, events_rollup_cascade(spark, sf_dir).collect()), key=repr
    )
    want = sorted(
        map(
            tuple,
            _con(sf_dir).execute(EVENTS_ROLLUP_CASCADE_ORACLE_SQL).fetchall(),
        ),
        key=repr,
    )
    assert len(got) > 0
    assert got == want


def test_rollup_cascade_lossless_vs_direct(spark, sf_dir):
    """Cascading through finer partials equals aggregating raw events
    directly at every width — the mergeability contract."""
    ev = load_table(spark, "events", sf_dir)
    cascade = rollup_cascade(ev, "ts", "value", ["event_type"],
                             CASCADE_WIDTHS)
    for width in CASCADE_WIDTHS[1:]:
        via_cascade = sorted(map(tuple, cascade.filter(
            F.col("bucket_seconds") == width
        ).select("event_type", "bucket_ts", "n", "min_v", "max_v")
            .collect()))
        direct = sorted(map(tuple, bucket_partials(
            ev, "ts", "value", ["event_type"], width
        ).select("event_type", "bucket_ts", "n", "min_v", "max_v")
            .collect()))
        assert via_cascade == direct


def test_merge_partials_incremental_refresh(spark, sf_dir):
    """merge(partials(batch1) ∪ partials(batch2)) == partials(all) —
    the late-data refresh path never recomputes history."""
    ev = load_table(spark, "events", sf_dir)
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)
    merged = merge_partials(
        bucket_partials(b1, "ts", "value", ["event_type"], 3600).unionByName(
            bucket_partials(b2, "ts", "value", ["event_type"], 3600)
        ),
        ["event_type"],
    )
    full = bucket_partials(ev, "ts", "value", ["event_type"], 3600)

    def norm(df):
        cols = ["event_type", "bucket_ts", "bucket_seconds",
                "n", "sum_v", "min_v", "max_v"]
        return sorted(
            (t, b, w, n, round(s, 6), mn, mx)
            for (t, b, w, n, s, mn, mx) in map(tuple, df.select(*cols).collect())
        )

    assert norm(merged) == norm(full)


def test_finalize_adds_avg(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    out = finalize_partials(
        bucket_partials(ev, "ts", "value", ["event_type"], 86400)
    ).collect()
    for r in out:
        assert r.avg_v == pytest.approx(r.sum_v / r.n)


def test_cascade_rejects_non_nesting_widths(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    with pytest.raises(ValueError, match="must nest"):
        rollup_cascade(ev, "ts", "value", [], [60, 90])
    with pytest.raises(ValueError, match="at least one"):
        rollup_cascade(ev, "ts", "value", [], [])


# ------------------------------------------------------------- anomalies


def test_rollup_zscores_matches_duckdb_mirror(spark, sf_dir):
    """The trailing-window z-score vs DuckDB's window functions on the
    same hourly partials (population stddev, explicit in both).

    Drives ``rollup_zscores`` directly since r12: the registered
    ``events_rollup_anomalies`` query now serves the gate-stable
    integer-moments variant (driver-gated), while the float-z operator
    keeps this tolerance-checked mirror."""
    from connect_server_spark.operators.temporal import (
        bucket_partials,
        rollup_zscores,
    )
    from connect_server_spark.tables import load_table

    def events_rollup_anomalies(spark, sf_dir):
        ev = load_table(spark, "events", sf_dir)
        hourly = bucket_partials(ev, "ts", "value", ["event_type"], 3600)
        return rollup_zscores(
            hourly, ["event_type"], trailing=24, min_history=6
        )

    def norm(rows):
        return sorted(
            (t, b, w, a, n,
             None if m is None else round(m, 5),
             None if s is None else round(s, 5),
             None if z is None else round(z, 4))
            for (t, b, w, a, n, m, s, z) in rows
        )

    got = norm(map(tuple, events_rollup_anomalies(spark, sf_dir).collect()))
    want = norm(map(tuple, _con(sf_dir).execute("""
        WITH hourly AS (
          SELECT event_type,
                 CAST(to_timestamp(floor(epoch(ts) / 3600) * 3600)
                   AS TIMESTAMP) AS bucket_ts,
                 CAST(3600 AS BIGINT) AS bucket_seconds,
                 sum(value) / count(value) AS avg_v
          FROM events GROUP BY 1, 2, 3
        ),
        win AS (
          SELECT *,
            avg(avg_v) OVER w AS t_mean,
            avg(avg_v * avg_v) OVER w AS t_ex2,
            count(avg_v) OVER w AS t_n
          FROM hourly
          WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, bucket_ts, bucket_seconds,
               round(avg_v, 6) AS avg_v,
               t_n AS n_history,
               round(t_mean, 6) AS trailing_mean,
               round(sqrt(greatest(t_ex2 - t_mean * t_mean, 0)), 6)
                 AS trailing_std,
               round(CASE WHEN t_n >= 6
                            AND sqrt(greatest(t_ex2 - t_mean*t_mean, 0)) > 0
                     THEN (avg_v - t_mean)
                          / sqrt(greatest(t_ex2 - t_mean*t_mean, 0)) END, 6)
                 AS zscore
        FROM win
    """).fetchall()))
    assert len(got) > 0
    assert got == want


def test_rollup_zscores_flags_planted_spike(spark):
    """A planted 100× spike after a steady baseline must z-score far
    above the steady buckets; early buckets (< min_history) stay null."""
    import datetime as ddt

    from connect_server_spark.operators.temporal import (
        bucket_partials,
        rollup_zscores,
    )

    rows = []
    for h in range(30):
        v = 1000.0 if h == 29 else 10.0 + (h % 3)  # mild wiggle, then spike
        rows.append((ddt.datetime(2024, 1, 1, h % 24, 30)
                     + ddt.timedelta(days=h // 24), "k", v))
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    hourly = bucket_partials(df, "ts", "v", ["k"], 3600)
    out = {r.bucket_ts: r for r in
           rollup_zscores(hourly, ["k"], trailing=24,
                          min_history=6).collect()}
    ordered = [out[k] for k in sorted(out)]
    for r in ordered[:6]:       # not enough history yet
        assert r.zscore is None
    spike = ordered[-1]
    steady = [r for r in ordered[6:-1] if r.zscore is not None]
    assert spike.zscore is not None
    assert spike.zscore > 10
    assert all(abs(r.zscore) < 3 for r in steady)


def test_rollup_anomalies_exact_agrees_with_float_zscores(spark, sf_dir):
    """The gate-stable integer-moments flag must agree with the float
    operator's |z| > 3 verdict on every real bucket (same hourly level,
    same trailing window) — the restatement is algebra, not a new
    definition. Both NULL classes (min_history, constant window) must
    coincide too."""
    from connect_server_spark.operators.temporal import (
        bucket_partials,
        rollup_anomalies_exact,
        rollup_zscores,
    )
    from connect_server_spark.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    hourly = bucket_partials(ev, "ts", "value", ["event_type"], 3600)
    # the float operator scores avg_v; feed it the cents TOTAL as the
    # value so both score the same metric (n folds out of z anyway
    # only when n is constant, which it is not here)
    totals = hourly.selectExpr(
        "event_type",
        "bucket_ts",
        "bucket_seconds",
        "CAST(1 AS BIGINT) AS n",
        "CAST(round(sum_v * 100) AS DOUBLE) AS sum_v",
    )
    zrows = {
        (r.event_type, r.bucket_ts): r.zscore
        for r in rollup_zscores(
            totals, ["event_type"], trailing=24, min_history=6
        ).collect()
    }
    exact = rollup_anomalies_exact(
        hourly, ["event_type"], trailing=24, min_history=6, thresh_sq=9
    ).collect()
    assert len(exact) == len(zrows) > 0
    disagreements = []
    for r in exact:
        z = zrows[(r.event_type, r.bucket_ts)]
        if r.is_anomaly is None:
            # float z is null for the same reasons (history / σ=0)
            if z is not None:
                disagreements.append((r, z, "null-class"))
        # |z| within 1e-6 of the 3.0 boundary could legitimately split
        # between the rounded float and the exact integer test
        elif z is not None and abs(abs(z) - 3.0) > 1e-6:
            if bool(r.is_anomaly) != (abs(z) > 3.0):
                disagreements.append((r, z, "flag"))
    assert not disagreements, disagreements[:3]


def test_rollup_anomalies_exact_flags_planted_spike(spark):
    """Planted 100× spike: flagged 1 by the exact-integer test; steady
    buckets flagged 0; early buckets (< min_history) NULL."""
    import datetime as ddt

    from connect_server_spark.operators.temporal import (
        bucket_partials,
        rollup_anomalies_exact,
    )

    rows = []
    for h in range(30):
        v = 1000.0 if h == 29 else 10.0 + (h % 3)
        rows.append((ddt.datetime(2024, 1, 1, h % 24, 30)
                     + ddt.timedelta(days=h // 24), "k", v))
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    hourly = bucket_partials(df, "ts", "v", ["k"], 3600)
    out = {r.bucket_ts: r for r in
           rollup_anomalies_exact(hourly, ["k"], trailing=24,
                                  min_history=6).collect()}
    ordered = [out[k] for k in sorted(out)]
    for r in ordered[:6]:
        assert r.is_anomaly is None
    assert ordered[-1].is_anomaly == 1
    assert all(r.is_anomaly == 0 for r in ordered[6:-1]
               if r.is_anomaly is not None)
    # integer moments are exact: sum_cents is the planted grid value
    assert ordered[-1].sum_cents == 100000


# -------------------------------------------------------------- overlap


def test_events_overlap_join_matches_duckdb(spark, sf_dir):
    from connect_server_spark.queries.temporal_queries import (
        events_overlap_join,
    )

    got = sorted(map(tuple, events_overlap_join(spark, sf_dir).collect()))
    want = sorted(map(tuple, _con(sf_dir).execute("""
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
    """).fetchall()))
    assert len(got) > 0
    assert got == want
    assert len(got) == len(set(got))  # dedup-free by the home bucket


def test_overlap_join_long_span_counted_once(spark):
    """A pair overlapping across MANY shared buckets still emits one row
    (the home bucket is unique), and half-open touching intervals do not
    overlap."""
    from connect_server_spark.operators.temporal import overlap_join

    a = spark.createDataFrame([Row(
        aid=1, start_ts=_t("2024-01-01 00:00:00"),
        end_ts=_t("2024-01-02 00:00:00"))])
    b = spark.createDataFrame([
        Row(bid=10, start_ts=_t("2024-01-01 05:00:00"),
            end_ts=_t("2024-01-01 20:00:00")),     # 15 shared hour-buckets
        Row(bid=11, start_ts=_t("2024-01-02 00:00:00"),
            end_ts=_t("2024-01-02 01:00:00")),     # touches end: no overlap
    ])
    got = [(r.aid, r.bid) for r in overlap_join(
        a, b, on=None, bucket_seconds=3600
    ).collect()]
    assert got == [(1, 10)]


def test_asof_nearest_direction(quotes_trades):
    """nearest picks the closer of backward/forward, ties backward —
    pandas merge_asof semantics; recomputed against merge_asof itself."""
    import pandas as pd

    trades, quotes = quotes_trades
    out = {
        (r.sym, r.ts): (r.ts_matched, r.px_matched)
        for r in asof_join(
            trades, quotes, on="sym", direction="nearest"
        ).collect()
    }
    tp = trades.toPandas().sort_values(["ts", "sym"]).reset_index(drop=True)
    qp = quotes.toPandas().sort_values(["ts", "sym"]).reset_index(drop=True)
    ref = pd.merge_asof(tp, qp, on="ts", by="sym", direction="nearest",
                        suffixes=("", "_q"))
    for _, row in ref.iterrows():
        got_ts, got_px = out[(row.sym, row.ts.to_pydatetime())]
        want_px = None if pd.isna(row.px) else row.px
        assert got_px == want_px, (row.sym, row.ts)
    # the specific interesting case: B's only quote is 1 s in the future
    assert out[("B", _t("2024-01-01 09:59:59"))] == (
        _t("2024-01-01 10:00:00"), 4.0)


def test_asof_nearest_tolerance_and_single_exchange(quotes_trades):
    trades, quotes = quotes_trades
    out = {
        (r.sym, r.ts): r.px_matched
        for r in asof_join(
            trades, quotes, on="sym", direction="nearest",
            tolerance=F.expr("INTERVAL 1 SECOND"),
        ).collect()
    }
    # C has no quotes at all; A@10:00:03 nearest within 1 s is 10:00:02
    # (backward) / 10:00:04 (forward) — tie, backward wins
    assert out[("A", _t("2024-01-01 10:00:03"))] == 2.0
    assert out[("C", _t("2024-01-01 12:00:00"))] is None

    plan = (
        asof_join(trades, quotes, on="sym", direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    n_ex = sum(1 for l in plan.splitlines()
               if "Exchange" in l and "ReusedExchange" not in l)
    assert n_ex == 1  # both carries share one hash partitioning


# ------------------------------------------------- review regressions


def test_interval_join_left_null_point_column_not_duplicated(spark):
    """A matched point carrying a NULL column must not ALSO appear as an
    unmatched row (the anti-join is null-safe)."""
    points = spark.createDataFrame(
        [Row(ts=_t("2024-01-01 10:30:00"), pid=1, note=None),
         Row(ts=_t("2024-01-05 00:00:00"), pid=2, note=None)],
        "ts timestamp, pid int, note string",
    )
    intervals = spark.createDataFrame(
        [Row(iid=10,
             start_ts=_t("2024-01-01 10:00:00"),
             end_ts=_t("2024-01-01 11:00:00"))]
    )
    rows = interval_join(points, intervals, on=None, how="left").collect()
    assert len(rows) == 2
    got = {r.pid: r.iid for r in rows}
    assert got == {1: 10, 2: None}


def test_interval_join_subsecond_endpoints(spark):
    """Sub-second interval ends must not truncate a bucket down: the
    interval [12:59:59.8, 13:00:00.1) covers bucket 13, so a point at
    13:00:00.05 matches."""
    points = spark.createDataFrame(
        [Row(ts=_t("2024-01-01 13:00:00.050000"), pid=1)]
    )
    intervals = spark.createDataFrame(
        [Row(iid=1,
             start_ts=_t("2024-01-01 12:59:59.800000"),
             end_ts=_t("2024-01-01 13:00:00.100000"))]
    )
    got = [r.pid for r in interval_join(
        points, intervals, on=None, bucket_seconds=3600
    ).collect()]
    assert got == [1]


def test_interval_join_colliding_column_names_suffixed(spark):
    points = spark.createDataFrame(
        [Row(ts=_t("2024-01-01 10:30:00"), pid=1)]
    )
    intervals = spark.createDataFrame(
        [Row(ts=_t("2024-01-01 00:00:00"),  # collides with point_ts
             start_ts=_t("2024-01-01 10:00:00"),
             end_ts=_t("2024-01-01 11:00:00"))]
    )
    out = interval_join(points, intervals, on=None)
    assert set(out.columns) == {"ts", "pid", "ts_r", "start_ts", "end_ts"}
    assert out.count() == 1


def test_overlap_join_subsecond_endpoints(spark):
    """Sub-second precision in overlap_join's home-bucket math: a pair
    whose later start sits in a bucket the truncated ranges would miss
    is still emitted exactly once."""
    from connect_server_spark.operators.temporal import overlap_join

    a = spark.createDataFrame([Row(
        aid=1, start_ts=_t("2024-01-01 12:59:59.900000"),
        end_ts=_t("2024-01-01 13:00:00.200000"))])
    b = spark.createDataFrame([Row(
        bid=2, start_ts=_t("2024-01-01 13:00:00.050000"),
        end_ts=_t("2024-01-01 13:00:00.150000"))])
    got = [(r.aid, r.bid) for r in overlap_join(
        a, b, on=None, bucket_seconds=3600).collect()]
    assert got == [(1, 2)]


def test_asof_null_keys_never_match(spark):
    """NULL-keyed left rows come back unmatched (SQL/DuckDB ASOF
    equality semantics) — never matched to NULL-keyed right rows."""
    left = spark.createDataFrame(
        [Row(k=None, ts=_t("2024-01-01 10:00:05"), q=1),
         Row(k="a", ts=_t("2024-01-01 10:00:05"), q=2)],
        "k string, ts timestamp, q int",
    )
    right = spark.createDataFrame(
        [Row(k=None, ts=_t("2024-01-01 10:00:00"), px=9.0),
         Row(k="a", ts=_t("2024-01-01 10:00:00"), px=1.0)],
        "k string, ts timestamp, px double",
    )
    out = {r.q: (r.k, r.px_matched) for r in
           asof_join(left, right, on="k").collect()}
    assert out[1] == (None, None)   # null key: kept, unmatched
    assert out[2] == ("a", 1.0)
