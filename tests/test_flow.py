"""Unit tests for the flow-DAG executor: Choice/Catch/hibernate routing,
status-code progression, lifecycle states, P15 classifier."""

from pyspark.sql import functions as F

from connect_server_spark.pipeline.flow import (
    FlowStage,
    curation_failure_classifier,
    run_flow,
)


def _flow(spark, rows):
    df = spark.createDataFrame(
        rows, "id long, meta_only boolean, xfail boolean, decision string, cancelled boolean"
    )
    stages = [
        FlowStage("start", step="sub_start"),
        FlowStage("transfer", step="data_transfer",
                  choice=~F.col("meta_only"), fail=F.col("xfail"),
                  result={"ok": ~F.col("xfail")}),
        FlowStage("curate", step="curation",
                  fail=F.col("decision") == "reject",
                  hibernate=F.col("decision") == "pending"),
        FlowStage("ingest", step="ingest_search"),
    ]
    out = run_flow(df, stages, cancelled_col="cancelled")
    return {r.id: r for r in out.collect()}


def test_happy_path_code_and_state(spark):
    r = _flow(spark, [(1, False, False, "accept", False)])[1]
    assert r.status_code == "SzzSzSSzzzzz"
    assert r.flow_state == "active"
    assert r.transfer_result.ran is True


def test_choice_skips_stage(spark):
    r = _flow(spark, [(1, True, False, "accept", False)])[1]
    assert r.status_code == "SzzzzSSzzzzz"  # transfer char untouched
    assert r.transfer_result.ran is False


def test_catch_routes_to_failed_and_halts(spark):
    r = _flow(spark, [(1, False, True, "accept", False)])[1]
    assert r.status_code == "SzzFzzzzzzzz"  # curation/ingest never ran
    assert r.flow_state == "failed"


def test_curation_reject_fails(spark):
    r = _flow(spark, [(1, False, False, "reject", False)])[1]
    assert r.status_code == "SzzSzFzzzzzz"
    assert r.flow_state == "failed"


def test_curation_pending_hibernates(spark):
    r = _flow(spark, [(1, False, False, "pending", False)])[1]
    assert r.status_code == "SzzSzHzzzzzz"
    assert r.flow_state == "hibernating"


def test_cancelled_runs_nothing(spark):
    r = _flow(spark, [(1, False, False, "accept", True)])[1]
    assert r.status_code == "z" * 12
    assert r.flow_state == "cancelled"


def test_classifier(spark):
    df = spark.createDataFrame(
        [("SSSSSSSSSSSS",), ("SzzFzzzzzzzz",), ("SzzSzHzzzzzz",), ("z" * 12,),
         ("SSSP" + "z" * 8,)],
        ["code"],
    )
    out = dict(
        df.select("code", curation_failure_classifier(F.col("code")).alias("f")).collect()
    )
    assert out["SSSSSSSSSSSS"] is False
    assert out["SzzFzzzzzzzz"] is True       # failure char
    assert out["SzzSzHzzzzzz"] is True       # hibernate counts as failure char
    assert out["z" * 12] is False            # nothing started
    assert out["SSSP" + "z" * 8] is True     # in-progress tail not a success char
