"""Driver query for the published quality-gate family (Gopher rules +
C4 line cleaning) over ``documents``.

Registers rows-only (the 50-slot oracle window is fully allocated); the
oracle-grade DuckDB mirror lives in ``tests/test_quality.py`` and
recomputes every metric, verdict, and the cleaned text length in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.operators.quality import (
    c4_clean_lines,
    c4_doc_flags,
    gopher_flags,
    gopher_pass,
)
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table


def quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule metrics + verdicts and the C4 cleaning outcome for
    every document — one scan-stage projection, zero shuffles."""
    docs = load_table(spark, "documents", sf_dir)
    t = F.col("text")
    g = gopher_flags(t)
    c4 = c4_doc_flags(t)
    return docs.select(
        "doc_id",
        g.alias("_g"),
        c4.alias("_c"),
        F.length(c4_clean_lines(t)).alias("c4_clean_len"),
    ).select(
        "doc_id",
        F.col("_g.n_words").alias("n_words"),
        F.col("_g.mean_word_len").alias("mean_word_len"),
        F.col("_g.symbol_word_ratio").alias("symbol_word_ratio"),
        F.col("_g.bullet_line_share").alias("bullet_line_share"),
        F.col("_g.ellipsis_line_share").alias("ellipsis_line_share"),
        F.col("_g.alpha_word_share").alias("alpha_word_share"),
        F.col("_g.stopword_hits").alias("stopword_hits"),
        F.col("_g.dup_line_ratio").alias("dup_line_ratio"),
        F.col("_g.top_2gram_share").alias("top_2gram_share"),
        gopher_pass(F.col("_g")).alias("gopher_ok"),
        F.col("_c.has_lorem_ipsum").alias("has_lorem_ipsum"),
        F.col("_c.has_brace").alias("has_brace"),
        "c4_clean_len",
    )


register("quality_gates", quality_gates, defer=True)


def corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-to-release drift report over the documents table: PSI of
    the ``n_chars`` distribution between the even-id half ("previous
    release") and the odd-id half ("candidate release"), decile buckets
    from the previous release. A healthy split reports total PSI ≈ 0 —
    the monitoring baseline; the planted-shift oracle lives in
    ``tests/test_quality.py``. One GK-sketch pass for edges + two
    narrow (bucket, count) aggregations; the only join is
    bucket-count-sized."""
    from connect_server_spark.operators.quality import metric_drift

    docs = load_table(spark, "documents", sf_dir)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    return metric_drift(old, new, "n_chars", n_buckets=10)


register("corpus_drift", corpus_drift, defer=True)
