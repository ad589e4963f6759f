"""Tests for the write-path sinks: idempotent append (S8) and
replace-by-subject search ingest (S9)."""

import pytest
from pyspark.errors.exceptions.base import AnalysisException

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


def test_search_ingest_raises_on_unreadable_existing_index(spark, tmp_path):
    """A read failure of an EXISTING index must RAISE, not be treated as
    'first write' — overwriting would drop every surviving subject in the
    touched buckets.

    Empty directory → AnalysisException (UNABLE_TO_INFER_SCHEMA), the
    exact class the first-write branch catches: it must still re-raise
    because the condition is not PATH_NOT_FOUND."""
    d = tmp_path / "index"
    d.mkdir()  # exists, but unreadable as a parquet table
    batch = spark.createDataFrame([("s1-1.0", "x")], ["subject", "body"])
    with pytest.raises(AnalysisException):
        search_ingest(batch, str(d), "subject", n_buckets=4)


def test_search_ingest_does_not_clobber_corrupt_index(spark, tmp_path):
    """Corrupt parquet footer → the executor-side SparkException also
    propagates, and the broken-but-existing data is left untouched for a
    human to recover rather than silently replaced by the batch."""
    d = tmp_path / "index"
    d.mkdir()
    (d / "part-00000.parquet").write_text("this is not parquet")
    batch = spark.createDataFrame([("s1-1.0", "x")], ["subject", "body"])
    with pytest.raises(Exception):
        search_ingest(batch, str(d), "subject", n_buckets=4)
    assert (d / "part-00000.parquet").read_text() == "this is not parquet"


def test_feedstock_roundtrip_into_search_ingest(spark, tmp_path):
    """§3.2 ingest leg end-to-end: validator feedstock (A7) → JSONL
    feedstock artifact → search index keyed by (dataset, scroll_id)
    subject — the validate→feedstock→SearchIngest chain of the flow
    (automate/mdf_flow_def.json SearchIngest pulls the feedstock)."""
    from pyspark.sql import functions as F

    from connect_server_spark.operators.validator import feedstock
    from connect_server_spark.sinks import read_feedstock, write_feedstock

    datasets = spark.createDataFrame([("ds1",), ("ds2",)], ["source_id"])
    records = spark.createDataFrame(
        [("ds1", 10), ("ds1", 30), ("ds1", 20), ("ds2", 5)],
        ["source_id", "rec_id"],
    )
    fs = feedstock(datasets, records, "source_id", "rec_id")
    fpath = str(tmp_path / "feedstock")
    write_feedstock(fs, fpath)
    back = read_feedstock(spark, fpath)
    # scroll ids survive the JSONL roundtrip: header 0 + contiguous 1..N
    got = {
        (r.source_id, r.scroll_id): (r.resource_type, r.record_ref)
        for r in back.collect()
    }
    assert got[("ds1", 0)] == ("dataset", None)
    assert got[("ds1", 1)] == ("record", 10)
    assert got[("ds1", 2)] == ("record", 20)
    assert got[("ds1", 3)] == ("record", 30)
    assert got[("ds2", 1)] == ("record", 5)

    # and the feedstock lands in the search index by composite subject
    ipath = str(tmp_path / "index")
    subj = back.withColumn(
        "subject",
        F.concat_ws("/", "source_id", F.col("scroll_id").cast("string")),
    )
    search_ingest(subj, ipath, "subject", n_buckets=4)
    rows = read_search_index(spark, ipath)
    assert rows.count() == 6  # 2 dataset headers + 4 records
    assert rows.filter(F.col("resource_type") == "dataset").count() == 2


def test_idempotent_append_raises_on_unreadable_existing_table(spark, tmp_path):
    d = tmp_path / "status"
    d.mkdir()  # exists but not a readable table → must raise, not duplicate
    incoming = spark.createDataFrame(
        [("a", "1.0", 1)], ["source_id", "version", "payload"]
    )
    with pytest.raises(AnalysisException):
        idempotent_append(spark, incoming, str(d), ["source_id", "version"])
