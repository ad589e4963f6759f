"""Unit tests for validator operators, porting reference goldens
(``tests/test_validator.py:90-348``)."""

from pyspark.sql import functions as F

from connect_server_spark.operators.validator import (
    dataset_total_size,
    derive_elements,
    distinct_submitters,
    feedstock,
    file_sizes_sum,
)


def test_total_size_goldens(spark):
    # reference goldens: 0 for no files, 500 when lengths sum to 500
    rows = [
        (1, [{"length": 200}, {"length": 300}]),
        (1, []),
        (2, [{"length": None}]),
    ]
    df = spark.createDataFrame(
        rows, "ds long, files array<struct<length:long>>"
    )
    out = {r.ds: r.total_size for r in dataset_total_size(df, "ds", "files").collect()}
    assert out == {1: 500, 2: 0}


def test_derive_elements_golden(spark):
    # FFO2 -> [F, O] (tests/test_validator.py:265-267)
    rows = [("FFO2",), ("C6H12O6",), ("NaCl",)]
    df = spark.createDataFrame(rows, ["comp"]).select(
        "comp", derive_elements(F.col("comp")).alias("els")
    )
    out = {r.comp: r.els for r in df.collect()}
    assert out["FFO2"] == ["F", "O"]
    assert out["C6H12O6"] == ["C", "H", "O"]
    assert out["NaCl"] == ["Cl", "Na"]


def test_feedstock_scroll_ids_contiguous(spark):
    ds = spark.createDataFrame([(10,)], ["ds"])
    recs = spark.createDataFrame([(10, 3), (10, 1), (10, 2)], ["ds", "ord"])
    out = sorted(
        (r.scroll_id, r.resource_type, r.record_ref)
        for r in feedstock(ds, recs, "ds", "ord").collect()
    )
    assert out == [
        (0, "dataset", None),
        (1, "record", 1),
        (2, "record", 2),
        (3, "record", 3),
    ]


def test_distinct_submitters_sorted(spark):
    df = spark.createDataFrame(
        [("a", "u2"), ("a", "u1"), ("a", "u2"), ("b", "u9")], ["sid", "sub"]
    )
    out = {r.sid: (r.submitters_csv, r.n_submitters)
           for r in distinct_submitters(df, "sid", "sub").collect()}
    assert out == {"a": ("u1,u2", 2), "b": ("u9", 1)}
