"""HLL distinct-count sketch ledger (`operators/sketches.py`):
accuracy vs exact, replay idempotence, merge-order invariance, and
estimate-preserving compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from connect_server_spark.operators.sketches import (
    compact_sketch_ledger,
    distinct_estimates,
    distinct_sketch,
    read_sketch_ledger,
    sketch_estimates,
    write_sketch_partial,
)


def _events(spark, n=20000, users=1500):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.xxhash64("id") % users).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias(
            "event_type"
        ),
    )


def test_sketch_estimates_match_exact_within_error(spark):
    ev = _events(spark)
    est = {
        r.event_type: r.distinct_est
        for r in sketch_estimates(
            distinct_sketch(ev, "user_id", by=["event_type"]),
            by=["event_type"],
        ).collect()
    }
    exact = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, d in exact.items():
        assert abs(est[t] - d) / d < 0.05, (t, est[t], d)


def test_ledger_partials_union_to_whole_and_replay_converges(
    spark, tmp_path
):
    """Partials written per batch answer identically to one sketch of
    the whole table (HLL merge is lossless register-max), and a
    replayed batch overwrites its own directory — the ledger converges
    under at-least-once delivery instead of double-counting."""
    ev = _events(spark)
    root = str(tmp_path / "ledger")
    for b in range(4):
        write_sketch_partial(
            ev.filter(F.col("event_id") % 4 == b),
            root,
            b,
            "user_id",
            by=["event_type"],
        )
    whole = {
        r.event_type: (r.distinct_est, r.n_rows)
        for r in sketch_estimates(
            distinct_sketch(ev, "user_id", by=["event_type"]),
            by=["event_type"],
        ).collect()
    }
    led = {
        r.event_type: (r.distinct_est, r.n_rows)
        for r in distinct_estimates(spark, root, by=["event_type"]).collect()
    }
    assert led == whole

    # replay batch 2 (at-least-once): identical answer, same row count
    write_sketch_partial(
        ev.filter(F.col("event_id") % 4 == 2),
        root,
        2,
        "user_id",
        by=["event_type"],
    )
    assert {
        r.event_type: (r.distinct_est, r.n_rows)
        for r in distinct_estimates(spark, root, by=["event_type"]).collect()
    } == whole


def test_compaction_preserves_estimates_and_bounds_ledger(spark, tmp_path):
    """Absorbing all-but-newest partials into one row per group keeps
    every estimate identical (merge associativity) while the ledger
    shrinks to groups × (1 merged + keep_latest) rows; the newest batch
    can still replay afterwards."""
    ev = _events(spark)
    root = str(tmp_path / "ledger")
    for b in range(5):
        write_sketch_partial(
            ev.filter(F.col("event_id") % 5 == b),
            root,
            b,
            "user_id",
            by=["event_type"],
        )
    before = {
        r.event_type: (r.distinct_est, r.n_rows)
        for r in distinct_estimates(spark, root, by=["event_type"]).collect()
    }
    absorbed = compact_sketch_ledger(spark, root, by=["event_type"])
    assert absorbed == 4
    after_rows = read_sketch_ledger(spark, root)
    assert after_rows.count() == 3 * 2  # 3 groups × (merged + newest)
    assert {
        r.event_type: (r.distinct_est, r.n_rows)
        for r in distinct_estimates(spark, root, by=["event_type"]).collect()
    } == before
    # monotone-id contract: the newest batch replays into the compacted
    # ledger and the answer is unchanged
    write_sketch_partial(
        ev.filter(F.col("event_id") % 5 == 4),
        root,
        4,
        "user_id",
        by=["event_type"],
    )
    assert {
        r.event_type: (r.distinct_est, r.n_rows)
        for r in distinct_estimates(spark, root, by=["event_type"]).collect()
    } == before
    # a second compaction on an already-bounded ledger absorbs the rest
    assert compact_sketch_ledger(spark, root, by=["event_type"]) == 1


def test_events_distinct_sketch_query_matches_exact(spark, sf_dir):
    from connect_server_spark.queries.events_analytics_queries import (
        events_distinct_sketch,
    )
    from connect_server_spark.tables import load_table

    got = events_distinct_sketch(spark, sf_dir).collect()
    ev = load_table(spark, "events", sf_dir)
    exact = {
        r.event_type: (r.d, r.n)
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert len(got) == len(exact) > 0
    for r in got:
        d, n = exact[r.event_type]
        assert r.n_rows == n
        assert abs(r.distinct_est - d) / d < 0.05
    # deterministic across invocations (cached ledger + deterministic
    # sketches)
    again = events_distinct_sketch(spark, sf_dir).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]
