"""Driver query for the flow-DAG executor (SURVEY §3.2 / §2: P14, P15,
S11, T3, T5) with a DuckDB oracle twin that replays the same state
machine as explicit per-position CASE logic.

Fixture mapping (customer): metadata-only, transfer-failure, curation
need + human decision, DOI flag, multi-destination fan-out with per-
destination failures, and cancellation are all deterministic functions of
``c_custkey``/``c_nationkey``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.pipeline.flow import (
    FlowStage,
    curation_failure_classifier,
    run_flow,
)
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table


def flow_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    k = F.col("c_custkey")
    subs = c.select(
        k.alias("c_custkey"),
        (k % 6 == 0).alias("metadata_only"),
        (k % 19 == 0).alias("transfer_fail"),
        (F.col("c_nationkey") % 3 == 0).alias("curation_needed"),
        F.when(k % 5 == 3, F.lit("reject"))
        .when(k % 5 == 4, F.lit("pending"))
        .otherwise(F.lit("accept"))
        .alias("decision"),
        (k % 3 == 0).alias("mint_doi"),
        (k % 3 + 1).cast("int").alias("n_destinations"),
        (k % 29 == 0).alias("cancelled"),
        (k % 7 == 2).alias("citrine"),
        (k % 7 == 3).alias("mrr"),
        (k % 4 == 1).alias("is_update"),
    )
    # S11: the multi-destination transfer loop, set-oriented — a
    # destination j in 1..n fails when (custkey + j) % 23 == 0.
    dest_fail = F.exists(
        F.sequence(F.lit(1), F.col("n_destinations")),
        lambda j: (F.col("c_custkey") + j) % 23 == 0,
    )
    stages = [
        FlowStage("sub_start", step="sub_start"),
        # cancel the prior version's flow on updates (STATUS_STEPS[1])
        FlowStage("old_cancel", step="old_cancel", choice=F.col("is_update")),
        FlowStage(
            "download", step="data_download", choice=~F.col("metadata_only")
        ),
        FlowStage(
            "user_transfer",
            step="data_transfer",
            choice=~F.col("metadata_only"),
            fail=F.col("transfer_fail"),
            result={"recursive": F.lit(True)},
        ),
        FlowStage(
            "extract", step="extracting", choice=~F.col("metadata_only")
        ),
        FlowStage(
            "curate",
            step="curation",
            choice=F.col("curation_needed"),
            fail=F.col("decision") == "reject",
            hibernate=F.col("decision") == "pending",
            result={"decision": F.col("decision")},
        ),
        # MintDOI + AddDoiToSearchRecord (automate/minimus_mdf_flow.py:316-355):
        # the minted DOI is written back into the record as
        # $.dataset_mdata.dc.identifier = {identifierType: 'DOI',
        # identifier: <doi>} — modeled as the stage's ResultPath payload.
        # The DOI itself is deterministic from the key (the fixture's
        # stand-in for the DataCite mint call).
        FlowStage(
            "mint_doi",
            step="ingest_publish",
            choice=F.col("mint_doi"),
            result={
                "identifierType": F.lit("DOI"),
                "identifier": F.concat(
                    F.lit("10.00000/mdf."), F.col("c_custkey").cast("string")
                ),
            },
        ),
        FlowStage("search_ingest", step="ingest_search"),
        FlowStage(
            "backup_transfer",
            step="ingest_backup",
            choice=~F.col("metadata_only"),
            fail=dest_fail,
        ),
        # legacy optional publishes (automate/mdf_flow_def.json:152,169)
        FlowStage("citrine_publish", step="ingest_citrine", choice=F.col("citrine")),
        FlowStage("mrr_publish", step="ingest_mrr", choice=F.col("mrr")),
        FlowStage("cleanup", step="ingest_cleanup"),
    ]
    out = run_flow(subs, stages, cancelled_col="cancelled")
    ran_doi = F.col("mint_doi_result.ran")
    return out.select(
        "c_custkey",
        "status_code",
        "flow_state",
        curation_failure_classifier(F.col("status_code")).alias("is_failure"),
        # AddDoiToSearchRecord: dc.identifier only exists on rows where the
        # mint stage actually ran (flow still active AND mint_doi chosen)
        F.when(ran_doi, F.col("mint_doi_result.identifier")).alias(
            "dc_identifier"
        ),
        F.when(ran_doi, F.col("mint_doi_result.identifierType")).alias(
            "dc_identifier_type"
        ),
    )


register(
    "flow_execute",
    flow_execute,
    sql="""
    WITH flags AS (
      SELECT
        c_custkey,
        c_custkey % 6 = 0 AS metadata_only,
        c_custkey % 19 = 0 AS transfer_fail,
        c_nationkey % 3 = 0 AS curation_needed,
        CASE WHEN c_custkey % 5 = 3 THEN 'reject'
             WHEN c_custkey % 5 = 4 THEN 'pending'
             ELSE 'accept' END AS decision,
        c_custkey % 3 = 0 AS mint_doi,
        CAST(c_custkey % 3 + 1 AS INT) AS n_destinations,
        c_custkey % 29 = 0 AS cancelled,
        c_custkey % 7 = 2 AS citrine,
        c_custkey % 7 = 3 AS mrr,
        c_custkey % 4 = 1 AS is_update
      FROM customer
    ),
    derived AS (
      SELECT *,
        len(list_filter(range(1, n_destinations + 1),
                        j -> (c_custkey + j) % 23 = 0)) > 0 AS dest_fail,
        NOT cancelled AS a0
      FROM flags
    ),
    states AS (
      SELECT *,
        a0 AND NOT (NOT metadata_only AND transfer_fail) AS a_transfer,
        a0 AND NOT (NOT metadata_only AND transfer_fail)
           AND NOT (curation_needed AND decision IN ('reject', 'pending'))
           AS a_curation
      FROM derived
    ),
    coded AS (
      SELECT *,
        a_curation AND NOT (NOT metadata_only AND dest_fail) AS a_backup,
        concat(
          CASE WHEN a0 THEN 'S' ELSE 'z' END,
          CASE WHEN a0 AND is_update THEN 'S' ELSE 'z' END,
          CASE WHEN a0 AND NOT metadata_only THEN 'S' ELSE 'z' END,
          CASE WHEN NOT a0 OR metadata_only THEN 'z'
               WHEN transfer_fail THEN 'F' ELSE 'S' END,
          CASE WHEN a_transfer AND NOT metadata_only THEN 'S' ELSE 'z' END,
          CASE WHEN a_transfer AND curation_needed THEN
            (CASE decision WHEN 'reject' THEN 'F'
                           WHEN 'pending' THEN 'H' ELSE 'S' END)
          ELSE 'z' END,
          CASE WHEN a_curation THEN 'S' ELSE 'z' END,
          CASE WHEN a_curation AND NOT metadata_only THEN
            (CASE WHEN dest_fail THEN 'F' ELSE 'S' END)
          ELSE 'z' END,
          CASE WHEN a_curation AND mint_doi THEN 'S' ELSE 'z' END,
          CASE WHEN a_backup AND citrine THEN 'S' ELSE 'z' END,
          CASE WHEN a_backup AND mrr THEN 'S' ELSE 'z' END,
          CASE WHEN a_backup THEN 'S' ELSE 'z' END
        ) AS status_code
      FROM states
    )
    SELECT
      c_custkey,
      status_code,
      CASE
        WHEN cancelled THEN 'cancelled'
        WHEN NOT metadata_only AND transfer_fail THEN 'failed'
        WHEN curation_needed AND decision = 'reject' THEN 'failed'
        WHEN curation_needed AND decision = 'pending' THEN 'hibernating'
        WHEN NOT metadata_only AND dest_fail THEN 'failed'
        ELSE 'active'
      END AS flow_state,
      regexp_matches(status_code, '[FRHX]')
        OR (len(regexp_replace(status_code, 'z+$', '')) > 0
            AND right(regexp_replace(status_code, 'z+$', ''), 1)
                NOT IN ('S', 'M', 'L'))
        AS is_failure,
      CASE WHEN a_curation AND mint_doi
           THEN '10.00000/mdf.' || CAST(c_custkey AS VARCHAR) END
        AS dc_identifier,
      CASE WHEN a_curation AND mint_doi THEN 'DOI' END
        AS dc_identifier_type
    FROM coded
    """,
)


def status_poll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: the deploy-suite polling loop (``tests/run_deploy_suite.py:84-130``)
    set-oriented — per submission, the latest observed status event decides
    completion or requeue. One ``max_by`` pass over the whole event log
    replaces the reference's per-submission poll-and-sleep loop: on a
    cluster this is a single map-side-combinable aggregation, and the
    requeue set is the next poll round's input."""
    events = load_table(spark, "events", sf_dir)
    latest = events.groupBy("user_id").agg(
        F.max_by(
            F.struct(F.col("event_type"), F.col("event_id")),
            F.struct(F.col("ts"), F.col("event_id")),
        ).alias("_last"),
    )
    terminal = F.col("_last.event_type").isin("purchase", "signup")
    return latest.select(
        F.col("user_id").alias("submission_id"),
        F.col("_last.event_type").alias("last_status"),
        F.col("_last.event_id").alias("last_event_id"),
        terminal.alias("is_terminal"),
        (~terminal).alias("requeue"),
    )


# Demoted from the gated-50 window in r9 to make room for the newer
# LLM-pipeline families (r8 verdict ask #4): semantics frozen since r3
# and pinned by the preserved-oracle mirror in tests/test_entry_oracle.py.
STATUS_POLL_ORACLE_SQL = """
    WITH ranked AS (
      SELECT user_id, event_type, event_id,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id AS submission_id,
           event_type AS last_status,
           event_id AS last_event_id,
           event_type IN ('purchase', 'signup') AS is_terminal,
           event_type NOT IN ('purchase', 'signup') AS requeue
    FROM ranked WHERE rn = 1
"""

register("status_poll", status_poll, defer=True)
