"""Format readers for the extractor surface (SURVEY §2: S1, S14).

The reference's processor package fans each file format into a reader
(JSON/CSV/XML/CIF/...; ``tests/test_extractors.py:20-405``). Spark-first,
a reader is ``spark.read`` with an *explicit* schema and a corrupt-record
channel — schema inference is a full extra pass over the data at 100 TB
and silently widens types, so it is never used here.

Binary formats ride the ``binaryFile`` source into the multimodal
contract (``operators/multimodal.py``): payload bytes + typed metadata,
decode stubbed, plumbing real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = [
    "read_json_submissions",
    "read_csv_table",
    "read_binary_dir",
]

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_channel(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_json_submissions(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """S1: JSON-lines submissions with the reject path as data, not an
    exception — malformed lines land in ``_corrupt_record`` and surface
    as ``(success=false, error)`` rows, mirroring the reference's 400
    response (``aws/submit.py:78-100``)."""
    df = (
        spark.read.schema(_with_corrupt_channel(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    ok = F.col(CORRUPT_COL).isNull()
    return df.select(
        *[F.col(f.name) for f in schema.fields],
        ok.alias("success"),
        F.when(~ok, F.lit("submission is not valid JSON")).alias("error"),
    )


def read_csv_table(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """S14 (CSV): explicit-schema CSV with the same corrupt-record
    channel. No ``inferSchema`` — at scale that is a second full read."""
    return (
        spark.read.schema(_with_corrupt_channel(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """S14 (binary formats): ``binaryFile`` rows re-shaped to the
    multimodal contract — (path, payload, meta{mime, n_bytes, digest}).
    The grouping key for per-directory extraction
    (``aws/automate_manager.py:132``) is the parent directory."""
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true"
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.col("path"),
        F.regexp_extract(F.col("path"), r"^(.*)/[^/]+$", 1).alias("group_dir"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.col("length").cast("int").alias("n_bytes"),
            F.md5(F.col("content")).alias("digest"),
        ).alias("meta"),
    )
