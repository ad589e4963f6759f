"""S3 — the JSON-Schema constraint-check stage, in depth.

The reference validates every submission against
``connect_submission.json`` with ``$ref`` resolution before any other
stage runs (``/root/reference/aws/submit.py:20-38``) and reports the
FIRST violation as ``"Invalid submission: <error>"``. The schema files
themselves are not in the reference repo; the effective constraints are
reconstructed from the fixtures the reference's own test suite feeds
through the validator (``/root/reference/tests/test_validator.py:6-348``:
``good_dataset1/2`` pass, ``bad_dataset`` / ``bad_record`` fail on
unknown top-level keys and missing required ``dc``/``mdf`` members).

Spark-first design: ONE ``parse_json`` per document into a VARIANT,
then every rule is a pure JVM expression over it — ``schema_of_variant``
for type checks (a quoted ``"2018"`` vs bare ``2018`` distinction that
``get_json_object`` erases), ``json_object_keys`` for the
``additionalProperties: false`` sweep, ``json_array_length`` for
min-items. No Python boundary, no shuffle: the whole stage rides the
scan projection, so at 100 TB it costs one pass and the repeated
``parse_json`` sub-expressions collapse via codegen subexpression
elimination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "SUBMISSION_TOP_KEYS",
    "DATASET_RULES",
    "constraint_columns",
    "check_submission",
]

# Top-level members of a connect submission: the metadata blocks kept in
# the document plus the configuration fields ``aws/submit.py:169-184``
# pops before schema validation ever sees them.
SUBMISSION_TOP_KEYS = (
    "dc",
    "mdf",
    "mrr",
    "custom",
    "services",
    "data",
    "tags",
    "index",
    "data_sources",
    "data_destinations",
    "dataset_acl",
    "extraction_config",
    "no_extract",
    "test",
    "update",
    "update_metadata_only",
)


def _rules(doc: Column) -> list[tuple[str, Column]]:
    """(rule_name, ok_expr) in schema order; every expr is total (never
    null) so the first-failure fold below is deterministic."""
    v = F.parse_json(doc)

    def vget(path: str) -> Column:
        return F.try_variant_get(v, path, "variant")

    def vtype(path: str) -> Column:
        return F.schema_of_variant(vget(path))

    def present(path: str) -> Column:
        return vget(path).isNotNull()

    def arr_len(path: str) -> Column:
        return F.coalesce(
            F.json_array_length(F.get_json_object(doc, path)), F.lit(0)
        )

    unknown_keys = F.array_except(
        F.json_object_keys(doc),
        F.array(*[F.lit(k) for k in SUBMISSION_TOP_KEYS]),
    )
    title = F.get_json_object(doc, "$.dc.titles[0].title")
    source_name = F.get_json_object(doc, "$.mdf.source_name")
    return [
        ("additional_properties", F.size(unknown_keys) == 0),
        ("dc_required", present("$.dc")),
        ("mdf_required", present("$.mdf")),
        ("title_required", title.isNotNull() & (F.trim(title) != "")),
        ("creators_min_items", arr_len("$.dc.creators") >= 1),
        (
            "creator_name_required",
            F.get_json_object(doc, "$.dc.creators[0].creatorName").isNotNull(),
        ),
        (
            "publication_year_type",
            F.coalesce(vtype("$.dc.publicationYear") == "STRING", F.lit(False)),
        ),
        ("publisher_required", present("$.dc.publisher")),
        (
            "resource_type_required",
            present("$.dc.resourceType.resourceTypeGeneral"),
        ),
        (
            "source_name_format",
            F.coalesce(source_name.rlike("^[a-z0-9_-]+$"), F.lit(False)),
        ),
        ("acl_min_items", arr_len("$.mdf.acl") >= 1),
        (
            "version_type",
            ~present("$.mdf.version")
            | F.coalesce(vtype("$.mdf.version") == "BIGINT", F.lit(False)),
        ),
    ]


# Rule names in schema order (kept in sync with ``_rules``; pinned by
# ``tests/test_submit_pipeline.py``).
DATASET_RULES = [
    "additional_properties",
    "dc_required",
    "mdf_required",
    "title_required",
    "creators_min_items",
    "creator_name_required",
    "publication_year_type",
    "publisher_required",
    "resource_type_required",
    "source_name_format",
    "acl_min_items",
    "version_type",
]


def constraint_columns(doc: Column) -> dict[str, Column]:
    """The stage's output columns for one document column."""
    rules = _rules(doc)
    violations = F.filter(
        F.array(
            *[F.when(~ok, F.lit(name)) for name, ok in rules]
        ),
        lambda x: x.isNotNull(),
    )
    first = F.get(violations, 0)  # null-safe at index 0 under ANSI mode
    return {
        "violations_csv": F.array_join(violations, ","),
        "n_violations": F.size(violations),
        "schema_valid": F.size(violations) == 0,
        "schema_error": F.when(
            first.isNotNull(), F.concat(F.lit("Invalid submission: "), first)
        ),
    }


def check_submission(df: DataFrame, doc_col: str) -> DataFrame:
    """Append the constraint-stage columns (``violations_csv``,
    ``n_violations``, ``schema_valid``, ``schema_error``) to ``df``."""
    cols = constraint_columns(F.col(doc_col))
    out = df
    for name, col in cols.items():
        out = out.withColumn(name, col)
    return out
