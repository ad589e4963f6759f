"""Driver queries for the dedup operator family (LLM-pipeline operators;
VERDICT r1 item 4) with DuckDB oracle twins.

Duplicates are planted deterministically so both engines see the same
corpus: every ``doc_id % 5 == 0`` document reappears uppercased with extra
whitespace (exact dup after normalization), and every ``doc_id % 10 == 0``
document reappears with its first two words dropped (Jaccard ≈ 0.85-0.95
near-dup).

The MinHash query is oracle-gated against *brute-force* Jaccard: with 16
bands × 2 rows, the probability of LSH missing a planted pair (J ≥ 0.8)
is < 1e-11, and random word-soup pairs sit at J ≈ 0.04 where the verify
stage rejects them — so LSH output == brute force, deterministically in
practice. The oracle's cross join is the *oracle's* cost at sf0.01 only;
the Spark plan itself must stay cartesian-free (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.operators.dedup import (
    exact_dedup,
    minhash_neardup_pairs,
    simhash_neardup_pairs,
)
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table


def _corpus_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("  ")).alias("text"),
    )
    return docs.unionByName(dups)


_CORPUS_EXACT_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(upper(text), '  ') AS text
      FROM documents WHERE doc_id % 5 = 0
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by md5 of normalized text: canonical id, copy count,
    member ids."""
    return exact_dedup(_corpus_exact(spark, sf_dir), "doc_id", "text")


register(
    "dedup_exact",
    dedup_exact,
    sql=f"""
    WITH corpus AS ({_CORPUS_EXACT_SQL}),
    normed AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM corpus
    )
    SELECT
      min(doc_id) AS canonical_id,
      count(*) AS n_copies,
      string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS member_ids_csv
    FROM normed
    GROUP BY norm
    """,
)


def _corpus_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"^\S+\s+\S+\s+", "").alias("text"),
    )
    return docs.unionByName(near)


_CORPUS_NEARDUP_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             regexp_replace(text, '^\\S+\\s+\\S+\\s+', '') AS text
      FROM documents WHERE doc_id % 10 = 0
"""

# Shared shingle derivation (word 3-grams, distinct, normalized text).
_SHINGLES_SQL = """
      SELECT doc_id,
        list_distinct(
          list_transform(
            range(1, greatest(len(w) - 1, 2)),
            i -> concat_ws(' ', w[i], w[i+1], w[i+2])
          )
        ) AS shingles
      FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
        FROM corpus
      )
"""


def dedup_neardup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs at Jaccard ≥ 0.5 (verified exactly)."""
    return minhash_neardup_pairs(
        _corpus_neardup(spark, sf_dir),
        "doc_id",
        "text",
        threshold=0.5,
        num_hashes=32,
        bands=16,
    ).select("id_a", "id_b", "jaccard")


register(
    "dedup_neardup_minhash",
    dedup_neardup_minhash,
    sql=f"""
    WITH corpus AS ({_CORPUS_NEARDUP_SQL}),
    sets_ AS ({_SHINGLES_SQL})
    SELECT
      a.doc_id AS id_a,
      b.doc_id AS id_b,
      CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / (len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles))) AS jaccard
    FROM sets_ a JOIN sets_ b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / (len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles))) >= 0.5
    """,
)


def dedup_neardup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash chunk-banded near-dup pairs (hamming ≤ 3 over 64-bit
    fingerprints of word 2-gram sets). Rows-only check: SimHash's bit
    votes are engine-specific (xxhash64), not SQL-portable."""
    return simhash_neardup_pairs(
        _corpus_neardup(spark, sf_dir), "doc_id", "text", max_hamming=3
    )


register("dedup_neardup_simhash", dedup_neardup_simhash)
