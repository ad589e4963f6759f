"""Driver query for lexical retrieval (BM25 top-k). Rows-only by gate
capacity; the exact-score DuckDB mirror runs in
``tests/test_retrieval.py``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from connect_server_spark.operators.retrieval import bm25_topk
from connect_server_spark.queries._fixtures import (
    cache_root,
    fixture_ready,
)
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table

BM25_QUERY = "spark merge window"
BM25_K = 25


def corpus_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-25 over the documents table for a fixed query —
    the 'find the pages about X' primitive of a curation pipeline."""
    docs = load_table(spark, "documents", sf_dir)
    return bm25_topk(docs, "doc_id", "text", BM25_QUERY, k=BM25_K)


_BM25_TERMS_SQL = ", ".join(
    f"'{t}'" for t in sorted({t for t in BM25_QUERY.lower().split() if t})
)

# Promoted in r10 (displacing the frozen source_id_split): score-for-
# score Okapi BM25 recomputation in SQL — same two-stage 1e-6 rounding
# (idf first, then the summed score), k1=1.2 / b=0.75 constants
# inlined. Exact-equality pytest mirror green since r6.
register(
    "corpus_bm25",
    corpus_bm25,
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(
        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    tc AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term <> '' GROUP BY 1, 2
    ),
    dl AS (
      SELECT d.doc_id, coalesce(t.dl, 0) AS dl
      FROM documents d
      LEFT JOIN (SELECT doc_id, sum(tf) AS dl FROM tc GROUP BY doc_id) t
        USING (doc_id)
    ),
    stats AS (
      SELECT (SELECT count(*) FROM dl) AS n,
             (SELECT avg(dl) FROM dl) AS avgdl
    ),
    idf AS (
      SELECT term,
             round(ln(1.0 + ((SELECT n FROM stats) - count(*) + 0.5)
                      / (count(*) + 0.5)), 6) AS idf
      FROM tc WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY term
    )
    SELECT tc.doc_id,
           round(sum(idf.idf * (tc.tf * 2.2)
               / (tc.tf + 1.2 * (1 - 0.75
                   + 0.75 * dl.dl / (SELECT avgdl FROM stats)))), 6)
             AS bm25
    FROM tc
    JOIN idf USING (term)
    JOIN dl USING (doc_id)
    WHERE tc.term IN ({_BM25_TERMS_SQL})
    GROUP BY tc.doc_id
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT {BM25_K}
    """,
)


HYBRID_K = 20
HYBRID_PROBE_VEC_ID = 7


def corpus_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the BM25 lexical list fused with an embedding
    cosine list (probe = vector #7, the 'more like this document'
    shape) by reciprocal-rank fusion. doc_id and vec_id share the id
    space in the synthetic tables, standing in for a corpus whose rows
    carry both text and an embedding."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from connect_server_spark.operators.retrieval import rrf_fuse
    from connect_server_spark.operators.similarity import cosine_topk

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)

    lex = bm25_topk(docs, "doc_id", "text", BM25_QUERY, k=50)
    lex_ranked = lex.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        ),
    ).select("doc_id", "rank")

    probe = emb.filter(F.col("vec_id") == HYBRID_PROBE_VEC_ID).select(
        F.lit(0).alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    sem = cosine_topk(probe, emb, k=50).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex_ranked, sem], "doc_id", k=HYBRID_K)


# Promoted in the r11 rotation (second tranche): both building blocks
# were already externally gated — the Okapi BM25 CTE is corpus_bm25's
# oracle verbatim (two-stage 1e-6 rounding, k1=1.2/b=0.75 inlined) and
# the cosine list is similarity_topk_exact's — composed with the RRF
# fold (1/(60+rank), absent lists contribute zero, round-6, ties by
# id) recomputed in SQL.
CORPUS_HYBRID_RETRIEVAL_ORACLE_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(
        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    tc AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term <> '' GROUP BY 1, 2
    ),
    dl AS (
      SELECT d.doc_id, coalesce(t.dl, 0) AS dl
      FROM documents d
      LEFT JOIN (SELECT doc_id, sum(tf) AS dl FROM tc GROUP BY doc_id) t
        USING (doc_id)
    ),
    stats AS (
      SELECT (SELECT count(*) FROM dl) AS n,
             (SELECT avg(dl) FROM dl) AS avgdl
    ),
    idf AS (
      SELECT term,
             round(ln(1.0 + ((SELECT n FROM stats) - count(*) + 0.5)
                      / (count(*) + 0.5)), 6) AS idf
      FROM tc WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY term
    ),
    lex AS (
      SELECT tc.doc_id,
             round(sum(idf.idf * (tc.tf * 2.2)
                 / (tc.tf + 1.2 * (1 - 0.75
                     + 0.75 * dl.dl / (SELECT avgdl FROM stats)))), 6)
               AS bm25
      FROM tc JOIN idf USING (term) JOIN dl USING (doc_id)
      WHERE tc.term IN ({_BM25_TERMS_SQL})
      GROUP BY tc.doc_id
      ORDER BY bm25 DESC, doc_id ASC LIMIT 50
    ),
    lex_ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
      FROM lex
    ),
    probe AS (
      SELECT embedding AS pv FROM embeddings
      WHERE vec_id = {HYBRID_PROBE_VEC_ID}
    ),
    sem_scored AS (
      SELECT e.vec_id AS doc_id,
        round(
          list_sum(list_transform(range(1, len(p.pv) + 1),
            i -> CAST(p.pv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(
                p.pv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(
                e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
          6) AS cosine
      FROM embeddings e CROSS JOIN probe p
    ),
    sem_ranked AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
        FROM sem_scored
      ) WHERE rank <= 50
    ),
    fused AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             round(coalesce(1.0 / (60 + l.rank), 0)
                   + coalesce(1.0 / (60 + s.rank), 0), 6) AS rrf_score
      FROM lex_ranked l FULL OUTER JOIN sem_ranked s USING (doc_id)
    )
    SELECT doc_id, rrf_score FROM fused
    ORDER BY rrf_score DESC, doc_id ASC LIMIT {HYBRID_K}
"""

register(
    "corpus_hybrid_retrieval",
    corpus_hybrid_retrieval,
    sql=CORPUS_HYBRID_RETRIEVAL_ORACLE_SQL,
)


KEYWORDS_M = 5


def corpus_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF keywords for a deterministic slice of the corpus
    (doc_id % 20 == 0 keeps the result gate-sized while the corpus
    statistics still aggregate over EVERY document — idf must come from
    the full collection or the scores are meaningless)."""
    from pyspark.sql import functions as F

    from connect_server_spark.operators.retrieval import doc_keywords

    docs = load_table(spark, "documents", sf_dir)
    kw = doc_keywords(docs, "doc_id", "text", m=KEYWORDS_M)
    return kw.filter(F.col("doc_id") % 20 == 0)


# Promoted in r10 (displacing the frozen extract_filename): full
# score-for-score TF-IDF recomputation in SQL — raw ln(N/df) idf,
# 1e-6 rounding before ranking, (score desc, term asc) tie-break.
# Mirror green in tests/test_retrieval.py since r6.
register(
    "corpus_doc_keywords",
    corpus_doc_keywords,
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(
        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ),
    tc AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term <> '' GROUP BY 1, 2
    ),
    idf AS (
      SELECT term,
             ln((SELECT count(*) FROM documents) * 1.0 / count(*)) AS idf
      FROM tc GROUP BY term
    ),
    ranked AS (
      SELECT tc.doc_id, tc.term,
             round(tc.tf * idf.idf, 6) AS tfidf,
             row_number() OVER (
               PARTITION BY tc.doc_id
               ORDER BY round(tc.tf * idf.idf, 6) DESC, tc.term ASC
             ) AS kw_rank
      FROM tc JOIN idf USING (term)
      WHERE round(tc.tf * idf.idf, 6) > 0
    )
    SELECT doc_id, kw_rank, term, tfidf FROM ranked
    WHERE kw_rank <= {KEYWORDS_M} AND doc_id % 20 = 0
    """,
)


def corpus_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval SERVING fast path: the same fixed query as
    ``corpus_bm25`` against a pre-built persisted BM25 index (built once
    per scale factor, cached under /tmp; bench's warm-up pass pays the
    build). Per query only the query terms' index rows are read — the
    corpus is never re-tokenized. Rows-only; score-identity to the
    in-memory path is pinned in ``tests/test_retrieval.py``."""
    import os

    from connect_server_spark.operators.retrieval import (
        bm25_topk_indexed,
        write_bm25_index,
    )
    from connect_server_spark.tables import dataset_cache_key

    key = dataset_cache_key(sf_dir, "documents")
    index_path = (
        f"{cache_root(spark, 'connect_server_spark_bm25_index_v3')}/{key}"
    )
    if not fixture_ready(spark, f"{index_path}/meta/batch=0/_SUCCESS"):
        docs = load_table(spark, "documents", sf_dir)
        write_bm25_index(docs, "doc_id", "text", index_path)
    return bm25_topk_indexed(spark, index_path, BM25_QUERY, k=BM25_K)


register("corpus_bm25_indexed", corpus_bm25_indexed, defer=True)
