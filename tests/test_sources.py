"""Unit tests for the format readers (S1/S14 reader surface)."""

import hashlib

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from connect_server_spark.sources import (
    read_binary_dir,
    read_csv_table,
    read_json_submissions,
)

SUB_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("n", LongType()),
    ]
)


def test_read_json_submissions_corrupt_channel(spark, tmp_path):
    p = tmp_path / "subs.jsonl"
    p.write_text('{"title": "ok", "n": 1}\n{not valid json\n')
    out = sorted(
        read_json_submissions(spark, str(p), SUB_SCHEMA).collect(),
        key=lambda r: (r.success is False, r.title or ""),
    )
    good, bad = out[0], out[1]
    assert (good.title, good.n, good.success, good.error) == ("ok", 1, True, None)
    assert bad.success is False and bad.error == "submission is not valid JSON"


def test_read_csv_table_explicit_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("title,n\nalpha,10\nbeta,20\n")
    rows = {r.title: r.n for r in read_csv_table(spark, str(p), SUB_SCHEMA).collect()}
    assert rows == {"alpha": 10, "beta": 20}


def test_read_binary_dir_contract(spark, tmp_path):
    d = tmp_path / "grp"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x01\x02\x03")
    [r] = read_binary_dir(spark, str(tmp_path), glob="*.bin").collect()
    assert r.group_dir.endswith("/grp")
    assert bytes(r.payload) == b"\x01\x02\x03"
    assert r.meta.n_bytes == 3
    assert r.meta.digest == hashlib.md5(b"\x01\x02\x03").hexdigest()
