"""Filter-compiler unit tests — semantics per reference
``aws/dynamo_manager.py:127-286`` and goldens ``tests/test_utils.py:121-178``."""

import pytest
from pyspark.sql import functions as F

from connect_server_spark.plans import (
    FilterCompileError,
    scan_table,
    try_scan_table,
    user_scoped_filters,
)
from connect_server_spark.tables import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, "orders", sf_dir).cache()


def test_projection_list(orders):
    out = scan_table(orders, fields=["o_orderkey", "o_totalprice"])
    assert out.columns == ["o_orderkey", "o_totalprice"]


def test_projection_comma_string(orders):
    out = scan_table(orders, fields="o_orderkey,o_custkey")
    assert out.columns == ["o_orderkey", "o_custkey"]


def test_projection_none_returns_all(orders):
    assert scan_table(orders).columns == orders.columns


def test_eq_and_gt(orders):
    out = scan_table(
        orders, filters=[("o_orderstatus", "==", "O"), ("o_totalprice", ">", 100000.0)]
    )
    rows = out.select("o_orderstatus", "o_totalprice").distinct().collect()
    assert all(r.o_orderstatus == "O" and r.o_totalprice > 100000.0 for r in rows)


def test_single_tuple_promoted_to_list(orders):
    a = scan_table(orders, filters=("o_orderstatus", "==", "F")).count()
    b = scan_table(orders, filters=[("o_orderstatus", "==", "F")]).count()
    assert a == b > 0


def test_begins_with_and_contains(orders):
    out = scan_table(orders, filters=[("o_orderpriority", "^", "1")])
    assert out.filter(~F.col("o_orderpriority").startswith("1")).count() == 0
    out2 = scan_table(orders, filters=[("o_orderpriority", "*", "URGENT")])
    assert out2.count() > 0


def test_between_inclusive(orders):
    lo, hi = 1000.0, 2000.0
    out = scan_table(orders, filters=[("o_totalprice", "[]", [lo, hi])])
    bad = out.filter((F.col("o_totalprice") < lo) | (F.col("o_totalprice") > hi))
    assert bad.count() == 0


def test_in_list(orders):
    out = scan_table(orders, filters=[("o_orderstatus", "in", ["O", "F"])])
    assert out.select("o_orderstatus").distinct().count() <= 2


def test_none_semantics_null_handling(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", "x")], ["k", "maybe"]
    )
    assert scan_table(df, filters=[("maybe", "==", None)]).count() == 1
    assert scan_table(df, filters=[("maybe", "!=", None)]).count() == 1


def test_contains_on_array_column(spark):
    df = spark.createDataFrame([(1, ["public"]), (2, ["private"])], ["k", "acl"])
    out = scan_table(df, filters=[("acl", "*", "public")])
    assert [r.k for r in out.collect()] == [1]


def test_invalid_operator_errors(orders):
    with pytest.raises(FilterCompileError, match="Invalid filter operator"):
        scan_table(orders, filters=[("o_orderkey", "~", 1)])
    res = try_scan_table(orders, filters=[("o_orderkey", "~", 1)])
    assert res["success"] is False and "Invalid filter operator" in res["error"]


def test_invalid_between_values(orders):
    with pytest.raises(FilterCompileError, match="between"):
        scan_table(orders, filters=[("o_totalprice", "[]", 5)])
    with pytest.raises(FilterCompileError, match="between"):
        scan_table(orders, filters=[("o_totalprice", "[]", [1, 2, 3])])


def test_invalid_in_values(orders):
    with pytest.raises(FilterCompileError, match="'in' operator"):
        scan_table(orders, filters=[("o_orderstatus", "in", "O")])


def test_invalid_fields_type(orders):
    with pytest.raises(FilterCompileError, match="Invalid fields type"):
        scan_table(orders, fields=42)


def test_invalid_filters_type(orders):
    with pytest.raises(FilterCompileError, match="Invalid filters type"):
        scan_table(orders, filters="o_orderkey == 1")


def test_user_scoped_filters():
    out = user_scoped_filters([("code", "^", "S")], "user-1")
    assert out[0] == ("user_id", "==", "user-1")
    assert out[1] == ("code", "^", "S")
    assert user_scoped_filters(None, "u")[0] == ("user_id", "==", "u")


def test_filter_pushdown_reaches_parquet_scan(orders, spark, sf_dir):
    """The compiled predicate must reach the parquet reader (PushedFilters)."""
    from connect_server_spark.tables import load_table

    fresh = load_table(spark, "orders", sf_dir)  # uncached: real scan plan
    out = scan_table(
        fresh,
        fields=["o_orderkey"],
        filters=[("o_orderstatus", "==", "O"), ("o_totalprice", ">", 100000.0)],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "o_orderstatus" in plan and "o_totalprice" in plan
