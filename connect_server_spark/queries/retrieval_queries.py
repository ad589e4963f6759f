"""Driver query for lexical retrieval (BM25 top-k). Rows-only by gate
capacity; the exact-score DuckDB mirror runs in
``tests/test_retrieval.py``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from connect_server_spark.operators.retrieval import bm25_topk
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table

BM25_QUERY = "spark merge window"
BM25_K = 25


def corpus_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-25 over the documents table for a fixed query —
    the 'find the pages about X' primitive of a curation pipeline."""
    docs = load_table(spark, "documents", sf_dir)
    return bm25_topk(docs, "doc_id", "text", BM25_QUERY, k=BM25_K)


register("corpus_bm25", corpus_bm25, defer=True)
