"""Tests for the write-path sinks: idempotent append (S8) and
replace-by-subject search ingest (S9)."""

from connect_server_spark.sinks import (
    idempotent_append,
    read_search_index,
    search_ingest,
)


def test_idempotent_append(spark, tmp_path):
    path = str(tmp_path / "status")
    first = spark.createDataFrame(
        [("a", "1.0", 1), ("b", "1.0", 2)], ["source_id", "version", "payload"]
    )
    assert idempotent_append(spark, first, path, ["source_id", "version"]) == 2

    again = spark.createDataFrame(
        [("a", "1.0", 99), ("a", "1.1", 3), ("c", "1.0", 4)],
        ["source_id", "version", "payload"],
    )
    # ('a','1.0') already present -> only two fresh rows appended
    assert idempotent_append(spark, again, path, ["source_id", "version"]) == 2

    rows = {(r.source_id, r.version): r.payload for r in spark.read.parquet(path).collect()}
    assert rows == {("a", "1.0"): 1, ("b", "1.0"): 2, ("a", "1.1"): 3, ("c", "1.0"): 4}


def test_search_ingest_replaces_by_subject(spark, tmp_path):
    path = str(tmp_path / "index")
    v1 = spark.createDataFrame(
        [("s1-1.0", "first"), ("s2-1.0", "other")], ["subject", "body"]
    )
    search_ingest(v1, path, "subject", n_buckets=4)

    v2 = spark.createDataFrame([("s1-1.0", "updated")], ["subject", "body"])
    search_ingest(v2, path, "subject", n_buckets=4)

    rows = {r.subject: r.body for r in read_search_index(spark, path).collect()}
    # s1 replaced, s2 untouched even if it shares a hash bucket
    assert rows == {"s1-1.0": "updated", "s2-1.0": "other"}
