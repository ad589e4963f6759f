"""Deploy-suite analog (SURVEY §5c): the reference's six canned
end-to-end submissions (``tests/run_deploy_suite.py:40-169``,
``tests/deploy_suite_files/*``) run through the full engine path —
submit pipeline → flow DAG → status-code classifier — with the
reference's "fail"-keyword inversion: a submission whose source_id
contains ``fail`` passes its test iff the run fails.
"""

from pyspark.sql import functions as F

from connect_server_spark.pipeline.flow import (
    FlowStage,
    curation_failure_classifier,
    run_flow,
)
from connect_server_spark.pipeline.submit import submit_pipeline

_ORG_SCHEMA = (
    "canonical_name string, aliases array<string>, acl array<string>, "
    "curation boolean, parent_organizations array<string>"
)
_SUB_SCHEMA = (
    "source_id string, title string, org_ref string, update boolean, "
    "identities array<string>, user_groups array<string>, "
    "required_group string, metadata_value double, "
    "update_metadata_only boolean, transfer_fail boolean, "
    "decision string, mint_doi boolean, n_destinations int"
)

# The six deploy-suite submissions. curated-org scenarios reference the
# curating org; "fail" in the source_id inverts the expectation.
_SUITE = [
    #  source_id            org        umo    xfail  decision  doi  ndest
    ("base",                "mdf",     False, False, "accept", False, 1),
    ("base_fail",           "mdf",     False, True,  "accept", False, 1),
    ("curation",            "curated", False, False, "accept", False, 1),
    ("curation_fail",       "curated", False, False, "reject", False, 1),
    ("passthrough",         "mdf",     True,  False, "accept", False, 1),
    ("integration",         "curated", False, False, "accept", True,  3),
]


def _suite_df(spark):
    rows = [
        (sid, f"The {sid} Dataset", org, False, ["u1"], ["gA"], "gA", 1.5,
         umo, xfail, decision, doi, ndest)
        for sid, org, umo, xfail, decision, doi, ndest in _SUITE
    ]
    return spark.createDataFrame(rows, _SUB_SCHEMA)


def _orgs(spark):
    return spark.createDataFrame(
        [
            ("mdf", ["materials data facility"], ["g1"], False, []),
            ("curated", [], ["g2"], True, []),
        ],
        _ORG_SCHEMA,
    )


def test_deploy_suite_end_to_end(spark):
    subs = _suite_df(spark)
    status = spark.createDataFrame(
        [], "source_id string, version string, owner string, seq long"
    )
    submitted = submit_pipeline(subs, _orgs(spark), status, "seq")
    accepted = submitted.filter(F.col("success"))
    assert accepted.count() == len(_SUITE)  # all six are valid submissions

    dest_fail = F.exists(
        F.sequence(F.lit(1), F.col("n_destinations")),
        lambda j: F.lit(False),  # backup destinations healthy in the suite
    )
    stages = [
        FlowStage("sub_start", step="sub_start"),
        FlowStage(
            "user_transfer",
            step="data_transfer",
            choice=~F.col("update_metadata_only"),
            fail=F.col("transfer_fail"),
        ),
        FlowStage(
            "curate",
            step="curation",
            choice=F.col("curation"),
            fail=F.col("decision") == "reject",
            hibernate=F.col("decision") == "pending",
        ),
        FlowStage("ingest_search", step="ingest_search"),
        FlowStage(
            "ingest_backup", step="ingest_backup", fail=dest_fail
        ),
        FlowStage(
            "ingest_publish", step="ingest_publish", choice=F.col("mint_doi")
        ),
        FlowStage("ingest_cleanup", step="ingest_cleanup"),
    ]
    finished = run_flow(accepted, stages)

    verdicts = finished.select(
        "source_id",
        "status_code",
        curation_failure_classifier(F.col("status_code")).alias("run_failed"),
        F.col("source_id").contains("fail").alias("expect_failure"),
    ).withColumn(
        "test_passed", F.col("run_failed") == F.col("expect_failure")
    )
    rows = {r.source_id: r for r in verdicts.collect()}

    assert rows["base"].status_code[0] == "S"
    assert not rows["base"].run_failed
    assert rows["base_fail"].run_failed          # transfer failed
    assert rows["curation"].status_code[5] == "S"
    assert rows["curation_fail"].run_failed      # curation rejected
    # passthrough: transfer step skipped entirely (stays 'z')
    assert rows["passthrough"].status_code[3] == "z"
    assert not rows["passthrough"].run_failed
    # integration: DOI publish step progressed
    assert rows["integration"].status_code[8] == "S"
    assert not rows["integration"].run_failed

    # every deploy-suite test passes, exactly like the reference's rollup
    assert all(r.test_passed for r in rows.values())

    # A8 rollup shape
    rollup = {
        r.test_passed: r.n
        for r in verdicts.groupBy("test_passed").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert rollup == {True: len(_SUITE)}
