"""Unit tests for transfer-manifest operators (S10/S11/F5/F13)."""

from pyspark.sql import functions as F

from connect_server_spark.operators.transfer import (
    loop_unroll,
    single_endpoint_check,
    unify_origin,
)


def test_unify_origin_prefers_origin_params(spark):
    df = spark.createDataFrame(
        [("ep1", None, "/a", None), (None, "ep2", None, "/b")],
        ["oid", "did", "opath", "dpath"],
    )
    out = df.select(
        unify_origin(F.col("oid"), F.col("did"), F.col("opath"), F.col("dpath")).alias("u")
    ).select("u.origin_id", "u.origin_path").collect()
    assert [(r.origin_id, r.origin_path) for r in out] == [("ep1", "/a"), ("ep2", "/b")]


def test_single_endpoint_check_flags_mixed(spark):
    df = spark.createDataFrame(
        [(1, "ep1"), (1, "ep1"), (2, "ep1"), (2, "ep2")], ["ds", "ep"]
    )
    out = {r.ds: (r.n_endpoints, r.endpoints_ok)
           for r in single_endpoint_check(df, "ds", "ep").collect()}
    assert out[1] == (1, True)
    assert out[2] == (2, False)


def test_loop_unroll_head_tail_done(spark):
    """The transfer_loop_flow_def recursion (lst[0] / lst[1:] / lst==lst[0:0])
    unrolled set-oriented: every iteration is a row."""
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["x"])], ["ds", "dests"]
    )
    rows = sorted(
        (r.ds, r.iteration, r.current, r.remaining_csv, r.loop_done)
        for r in loop_unroll(df, "ds", "dests").collect()
    )
    assert rows == [
        (1, 0, "a", "b,c", False),
        (1, 1, "b", "c", False),
        (1, 2, "c", "", True),
        (2, 0, "x", "", True),
    ]
