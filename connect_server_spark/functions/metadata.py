"""Metadata-enrichment column expressions for the submit pipeline.

Re-expresses the scalar rewrites in ``aws/submit.py:139-312`` (resourceType
default, tags→subjects, ingest_date) and the status-record formatting in
``aws/submissions.py:10-52`` (status-code letter map, user message) plus
``aws/automate_manager.py:130`` (creators join) as pure Catalyst
expressions. All deterministic; timestamps are injectable so hash-matching
tests stay stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "STATUS_CODE_LETTERS",
    "creators_join",
    "default_resource_type",
    "ingest_date",
    "status_code_letter",
    "status_message",
    "tags_to_subjects",
]

# Flow status → one-letter code (aws/submissions.py:10-15).
STATUS_CODE_LETTERS = {
    "SUCCEEDED": "S",
    "ACTIVE": "P",
    "FAILED": "F",
    "UNKNOWN": "U",
}

_ISO_ZULU = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def status_code_letter(status: Column) -> Column:
    """Flow status string → letter; unknown statuses → ``U`` (the reference
    constructs only the four mapped statuses)."""
    out = F.lit("U")
    for name, letter in STATUS_CODE_LETTERS.items():
        out = F.when(status == name, F.lit(letter)).otherwise(out)
    return out


def status_message(
    test: Column, source_id: Column, title: Column, submitter: Column, submission_time: Column
) -> Column:
    """The user-facing message header (``aws/submissions.py:18-23``)."""
    return F.format_string(
        "Status of %ssubmission %s (%s)\nSubmitted by %s at %s\n\n",
        F.when(test, F.lit("TEST ")).otherwise(F.lit("")),
        source_id,
        title,
        submitter,
        submission_time,
    )


def default_resource_type(resource_type: Column) -> Column:
    """Absent resourceType → ``{Dataset, Dataset}`` (``aws/submit.py:139-150``)."""
    return F.coalesce(
        resource_type,
        F.struct(
            F.lit("Dataset").alias("resourceTypeGeneral"),
            F.lit("Dataset").alias("resourceType"),
        ),
    )


def tags_to_subjects(tags: Column, existing_subjects: Column | None = None) -> Column:
    """``tags`` → appended ``dc.subjects[] = [{subject: tag}]``
    (``aws/submit.py:152-162``). Null tags contribute nothing; existing
    subjects are kept in order, new tags appended."""
    new_subjects = F.transform(
        F.coalesce(tags, F.array().cast("array<string>")),
        lambda t: F.struct(t.alias("subject")),
    )
    if existing_subjects is None:
        return new_subjects
    existing = F.coalesce(
        existing_subjects, F.array().cast("array<struct<subject:string>>")
    )
    return F.concat(existing, new_subjects)


def ingest_date(at: Column | None = None) -> Column:
    """UTC ISO-8601 Zulu stamp (``aws/submit.py:278``). Pass a timestamp
    column for deterministic output; default is ``current_timestamp()``."""
    ts = at if at is not None else F.current_timestamp()
    return F.date_format(ts, _ISO_ZULU)


def creators_join(creators: Column) -> Column:
    """``", ".join(creatorName for creator in creators)``
    (``aws/automate_manager.py:130``)."""
    return F.array_join(F.transform(creators, lambda c: c["creatorName"]), ", ")
