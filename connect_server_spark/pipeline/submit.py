"""The submit pipeline: the reference's ``POST /submit`` stage chain
(``aws/submit.py:68-378``, SURVEY §3.1) as one DataFrame transformation.

Stages (guards emit ``(success, error)`` columns instead of HTTP codes;
the first failing guard wins, matching the reference's early-exit order
``aws/submit.py:68-167``):

1. P12 group gate — submitting identity must hold the required group
   (``aws/submit.py:68-76``, ``arrays_overlap``).
2. S2  NaN/Inf guard — no non-finite numbers anywhere in the document
   (``aws/submit.py:102-113``).
3. S3  schema slice — required fields present (title non-empty).
4. J1  org resolution with unknown/duplicate errors
   (``aws/submit.py:117-135``).
5. J2/A1 latest-status join + P13 ownership — update flag consistency
   and identity-ownership checks (``aws/submit.py:186-266``).
6. A2  version assignment — ``1.0`` for new, minor+1 for updates.
7. Enrichment — versioned_source_id, curation flag from the org
   (``aws/submit.py:268-278``).

Everything is expression-level: one broadcast join (orgs), one agg+join
(latest status), zero Python UDFs, zero collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connect_server_spark.functions.source_ids import increment_record_version
from connect_server_spark.operators.org import resolve_org
from connect_server_spark.operators.versioning import latest_version_join
from connect_server_spark.pipeline.schema_check import constraint_columns

__all__ = ["submit_pipeline", "ERRORS"]

ERRORS = {
    "group": "not in required group",
    "nan": "non-finite value in submission",
    "title": "missing title",
    "org_unknown": "unknown organization",
    "org_dup": "duplicate organization match",
    "update_missing": "update of nonexistent source",
    "exists": "source exists and update not set",
    "owner": "not the owner",
}


def submit_pipeline(
    submissions: DataFrame,
    orgs: DataFrame,
    status: DataFrame,
    status_tiebreaker: str,
    doc_col: str | None = None,
) -> DataFrame:
    """Run the submit stage chain.

    ``submissions`` columns: ``source_id``, ``title``, ``org_ref``,
    ``update`` (bool), ``identities`` (array<string>), ``user_groups``
    (array<string>), ``required_group``, ``metadata_value`` (double —
    stand-in for the numeric leaves of the document). Optional:
    ``test`` (bool — test submissions get a ``-test``-suffixed source_id
    and their own version lineage, ``aws/submit.py:198-204``) and
    ``update_metadata_only`` (bool pass-through consumed by the flow's
    Check-Metadata-Only choice, ``aws/submit.py:183``).

    ``orgs``: registry with ``canonical_name``/``aliases``/``curation``.
    ``status``: existing status rows with ``source_id``/``version``/
    ``owner`` and a unique ``status_tiebreaker`` column.

    Output: input keys + ``success``/``error`` + assigned ``version`` /
    ``versioned_source_id`` + ``previous_versions_csv`` (the reference's
    ``previous_versions`` accumulation, ``aws/submit.py:215-216``) + org
    ``canonical_name``/``curation``.
    """
    if "test" not in submissions.columns:
        submissions = submissions.withColumn("test", F.lit(False))
    if "update_metadata_only" not in submissions.columns:
        submissions = submissions.withColumn(
            "update_metadata_only", F.lit(False)
        )
    # Lossless raw retention: the reference stores the submitted document
    # verbatim in the status record (``aws/submit.py:299-312``,
    # ``original_submission``) so failed flows can be replayed. The raw
    # doc column wins when present; otherwise the input columns are
    # re-serialized — either way the status row carries the full story.
    raw = (
        F.col(doc_col)
        if doc_col is not None
        else F.to_json(F.struct(*submissions.columns))
    )
    submissions = submissions.withColumn("original_submission", raw)
    if doc_col is not None:
        # S3 in depth: the JSON-Schema constraint stage
        # (``schema_check.py``) runs on the raw document before any
        # relational stage, matching the reference's early
        # ``validate_submission_schema`` exit (``aws/submit.py:164-167``).
        submissions = submissions.withColumn(
            "_schema_error", constraint_columns(F.col(doc_col))["schema_error"]
        )
    else:
        submissions = submissions.withColumn(
            "_schema_error", F.lit(None).cast("string")
        )
    submissions = submissions.withColumn(
        "effective_source_id",
        F.when(
            F.col("test"), F.concat(F.col("source_id"), F.lit("-test"))
        ).otherwise(F.col("source_id")),
    )
    resolved = resolve_org(submissions, orgs, "org_ref", ["curation"])
    joined = latest_version_join(
        resolved.withColumnRenamed("effective_source_id", "_esid"),
        status.withColumnRenamed("source_id", "_esid"),
        key="_esid",
        version="version",
        payload=["owner"],
        tiebreakers=[status_tiebreaker],
        history_col="_prev_versions",
    ).withColumnRenamed("_esid", "effective_source_id")

    group_ok = F.arrays_overlap("user_groups", F.array("required_group"))
    finite = ~(
        F.isnan("metadata_value")
        | F.col("metadata_value").isin(float("inf"), float("-inf"))
    )
    has_title = F.col("title").isNotNull() & (F.trim("title") != "")
    existing = F.col("version").isNotNull()
    owner_ok = F.arrays_overlap("identities", F.array("owner"))

    error = (
        F.when(~group_ok, F.lit(ERRORS["group"]))
        .when(~finite, F.lit(ERRORS["nan"]))
        .when(~has_title, F.lit(ERRORS["title"]))
        .when(F.col("_schema_error").isNotNull(), F.col("_schema_error"))
        .when(~F.col("org_found"), F.lit(ERRORS["org_unknown"]))
        .when(F.col("org_error") == ERRORS["org_dup"], F.lit(ERRORS["org_dup"]))
        .when(F.col("update") & ~existing, F.lit(ERRORS["update_missing"]))
        .when(~F.col("update") & existing, F.lit(ERRORS["exists"]))
        .when(F.col("update") & existing & ~owner_ok, F.lit(ERRORS["owner"]))
    )

    new_version = F.when(
        F.col("update"), increment_record_version(F.col("version"))
    ).otherwise(F.lit("1.0"))

    return (
        joined.withColumn("error", error)
        .withColumn("success", F.col("error").isNull())
        .withColumn(
            "assigned_version", F.when(F.col("success"), new_version)
        )
        .withColumn(
            "versioned_source_id",
            F.when(
                F.col("success"),
                F.concat(
                    F.col("effective_source_id"),
                    F.lit("-"),
                    F.col("assigned_version"),
                ),
            ),
        )
        .withColumn(
            "previous_versions_csv",
            F.when(
                F.col("success"),
                F.array_join(
                    F.coalesce(
                        F.col("_prev_versions"), F.array().cast("array<string>")
                    ),
                    ",",
                ),
            ),
        )
        .drop("_prev_versions", "_schema_error")
    )
