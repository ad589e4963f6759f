"""Unit tests for the versioned-read operators, porting the reference's
numeric-aware ordering traps (``aws/tests/test_dynamo_manager.py:7-44``)."""

from pyspark.sql import functions as F

from connect_server_spark.operators.versioning import (
    existence_probe,
    latest_per_key,
    latest_version_join,
)


def _status(spark, rows):
    return spark.createDataFrame(rows, ["source_id", "version", "payload"])


def test_latest_per_key_numeric_trap(spark):
    # 1.13 beats 1.2 (int-aware), 2.0 beats 1.13 (major wins)
    df = _status(
        spark,
        [
            ("a", "1.1", 1), ("a", "1.2", 2), ("a", "1.13", 3),
            ("b", "1.13", 4), ("b", "2.0", 5),
            ("c", "1.0", 6),
        ],
    )
    out = {
        r.source_id: r.version
        for r in latest_per_key(
            df, "source_id", "version", ["payload"], ["payload"]
        ).collect()
    }
    assert out == {"a": "1.13", "b": "2.0", "c": "1.0"}


def test_latest_per_key_tiebreaker_deterministic(spark):
    df = _status(spark, [("a", "1.1", 9), ("a", "1.1", 7)])
    [row] = latest_per_key(df, "source_id", "version", ["payload"], ["payload"]).collect()
    assert row.payload == 9


def test_latest_version_join_new_key_null(spark):
    subs = spark.createDataFrame([("a",), ("zzz",)], ["source_id"])
    df = _status(spark, [("a", "1.2", 1), ("a", "1.13", 2)])
    out = {
        r.source_id: (r.version, r.payload)
        for r in latest_version_join(
            subs, df, "source_id", "version", ["payload"], ["payload"]
        ).collect()
    }
    assert out["a"] == ("1.13", 2)
    assert out["zzz"] == (None, None)


def test_existence_probe_classes(spark):
    df = _status(spark, [("one", "1.0", 1), ("two", "1.0", 2), ("two", "1.1", 3)])
    out = {r.source_id: (r.n_existing, r.classification) for r in existence_probe(df, "source_id").collect()}
    assert out == {"one": (1, "bump"), "two": (2, "error")}


def test_latest_per_key_is_partial_agg(spark):
    # max_by must plan as HashAggregate with a partial pass (map-side
    # combine), never a Window sort — the scale contract of this operator.
    df = _status(spark, [("a", "1.1", 1)])
    plan = latest_per_key(
        df, "source_id", "version", ["payload"], ["payload"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan or "HashAggregate" in plan


def test_status_as_of_cutoff_pushed_to_scan(spark, sf_dir):
    """The temporal cutoff must reach the parquet reader (PushedFilters),
    so an as-of read prunes history before any row surfaces."""
    from connect_server_spark.queries.version_queries import status_as_of

    plan = status_as_of(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:200]
    assert "o_orderdate" in pushed
