"""Metadata-extractor framework (SURVEY §2: S14, F15, F16, F17).

The reference's legacy processor package maps raw files to structured
records per format (golden outputs ``tests/test_extractors.py:20-405``).
Re-expressed Spark-first:

* **Mapping extractors** (JSON/XML dot-path maps, F15) and **filename
  extractors** (regex maps, F16) are pure column expressions — they run
  in the scan stage.
* **Structured deserialization** (F17) uses ``from_json`` with explicit
  schemas — never ``eval`` (the reference's ``aws/submit.py:44-54`` used
  string-eval; the safe equivalent is part of the contract).
* **Binary formats** (CIF/TDB/images) go through an Arrow-batched
  ``mapInPandas`` plumbing whose decode step is a clearly-marked stub —
  the domain libraries aren't available here, but the schema, batch
  shape, and grouping are real (see ``operators/multimodal.py``).

Extraction over file *groups* (the reference groups by directory,
``aws/automate_manager.py:132``) is ``groupBy(dirname)`` + the per-format
extractor applied to each member, merged per group.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "json_extractor",
    "filename_extractor",
    "parse_json_column",
]


def parse_json_column(col: Column, schema: str | StructType) -> Column:
    """F17: schema-checked JSON deserialization (``from_json``; malformed
    input yields null fields, never arbitrary evaluation)."""
    return F.from_json(col, schema)


def json_extractor(
    df: DataFrame,
    json_col: str,
    schema: str | StructType,
    mapping: Mapping[str, str],
    na_values: tuple = (),
) -> DataFrame:
    """F15: dot-path mapping extractor over a JSON string column.

    ``mapping`` maps output column → dot path inside the parsed document
    (``tests/test_extractors.py:171-255``: ``{out: in_dot_path}`` with
    ``na_values`` dropped to null). Adds one output column per entry."""
    parsed = parse_json_column(F.col(json_col), schema)

    def resolve(path: str) -> Column:
        out: Column = parsed
        for part in path.split("."):
            out = out[part]
        return out

    out = df
    for out_col, path in mapping.items():
        val = resolve(path)
        for na in na_values:
            # compare on the string rendering: na_values apply across field
            # types, and ANSI mode forbids lossy cross-type casts
            val = F.when(
                val.cast("string") == F.lit(str(na)), F.lit(None)
            ).otherwise(val)
        out = out.withColumn(out_col, val)
    return out


def filename_extractor(
    df: DataFrame, filename_col: str, mapping: Mapping[str, str]
) -> DataFrame:
    """F16: regex mapping over filenames; a non-matching pattern yields
    null (the reference omits the field,
    ``tests/test_extractors.py:355-401``)."""
    out = df
    for out_col, pattern in mapping.items():
        extracted = F.regexp_extract(F.col(filename_col), pattern, 1)
        out = out.withColumn(
            out_col, F.when(extracted != "", extracted)
        )
    return out
