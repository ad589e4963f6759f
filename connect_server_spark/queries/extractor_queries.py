"""Driver queries for the extractor framework (S14/F15/F16/F17) and the
multimodal binary plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.operators.extractors import (
    filename_extractor,
    json_extractor,
)
from connect_server_spark.operators.multimodal import (
    attach_binary,
    extract_binary_features,
)
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table


def extract_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15/F17: schema-checked from_json over events.props with a dot-path
    mapping; na_values drop 0 to null."""
    events = load_table(spark, "events", sf_dir)
    return json_extractor(
        events.select("event_id", "props"),
        "props",
        "k int",
        {"k_value": "k"},
        na_values=(0,),
    ).select("event_id", "k_value")


register(
    "extract_json_props",
    extract_json_props,
    sql="""
    SELECT event_id,
           CASE WHEN CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) = 0
                THEN NULL
                ELSE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)
           END AS k_value
    FROM events
    """,
)


def extract_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: regex mapping over synthesized data-file names; non-matching
    fields are null (docs from src9x get an extensionless name)."""
    docs = load_table(spark, "documents", sf_dir)
    fname = F.concat(
        F.lit("data/"),
        F.col("source"),
        F.lit("/doc_"),
        F.col("doc_id").cast("string"),
        F.lit("_"),
        F.col("lang"),
        F.when(F.col("doc_id") % 9 == 0, F.lit("")).otherwise(F.lit(".txt")),
    )
    named = docs.select("doc_id", fname.alias("filename"))
    return filename_extractor(
        named,
        "filename",
        {
            "src_dir": r"^data/([^/]+)/",
            "doc_lang": r"_([a-z]{2})(?:\.|$)",
            "extension": r"\.([a-z]+)$",
        },
    )


register(
    "extract_filename",
    extract_filename,
    sql="""
    WITH named AS (
      SELECT doc_id,
             concat('data/', source, '/doc_', CAST(doc_id AS VARCHAR), '_',
                    lang,
                    CASE WHEN doc_id % 9 = 0 THEN '' ELSE '.txt' END)
               AS filename
      FROM documents
    )
    SELECT doc_id, filename,
      nullif(regexp_extract(filename, '^data/([^/]+)/', 1), '') AS src_dir,
      nullif(regexp_extract(filename, '_([a-z]{2})(\\.|$)', 1), '') AS doc_lang,
      nullif(regexp_extract(filename, '\\.([a-z]+)$', 1), '') AS extension
    FROM named
    """,
)


def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column contract: payload bytes + typed metadata (mime,
    length, digest), gateable because the digest is plain md5."""
    docs = load_table(spark, "documents", sf_dir)
    carried = attach_binary(docs, "doc_id", "text", mime="text/plain")
    return carried.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.digest").alias("digest"),
    )


register(
    "multimodal_manifest",
    multimodal_manifest,
    sql="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (rows-only: pandas-side floats are not oracle-portable)."""
    docs = load_table(spark, "documents", sf_dir)
    return extract_binary_features(attach_binary(docs, "doc_id", "text"))


register("multimodal_features", multimodal_features)
