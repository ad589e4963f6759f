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
from connect_server_spark.tables import load_table, spread_scan


def quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule metrics + verdicts and the C4 cleaning outcome for
    every document — one scan-stage projection. The metric expressions
    are CPU-dense per row, so the one-split local scan is round-robin
    spread first (r12, guide §2.5; measured 1.8× at sf0.1 — the
    Exchange is a no-op at production split counts)."""
    docs = spread_scan(load_table(spark, "documents", sf_dir))
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


# Oracle: every Gopher metric, the composite verdict, the C4 doc flags
# and the cleaned-text length recomputed in DuckDB SQL. Promoted into
# the gated-50 window in r9 (r8 verdict ask #4); the pytest mirror in
# tests/test_quality.py imports this same string so the two can never
# drift.
QUALITY_GATES_ORACLE_SQL = r"""
    WITH toks AS (
      SELECT doc_id, text,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w,
             list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                         x -> len(x) > 0) AS ls
      FROM documents
    ),
    grams AS (
      SELECT doc_id, concat_ws(' ', w[i], w[i + 1]) AS g
      FROM toks, unnest(range(1, len(w))) AS u(i)
      WHERE len(w) >= 2
    ),
    gcnt AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
    gtop AS (
      SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top2
      FROM gcnt GROUP BY doc_id
    ),
    m AS (
      SELECT t.doc_id,
        len(w) AS n_words,
        round(list_sum(list_transform(w, x -> CAST(len(x) AS DOUBLE)))
              / greatest(len(w), 1), 6) AS mean_word_len,
        round(CAST(len(text) - len(replace(text, '#', ''))
                   + len(regexp_extract_all(text, '\.\.\.|…', 0)) AS DOUBLE)
              / greatest(len(w), 1), 6) AS symbol_word_ratio,
        round(CAST(len(list_filter(ls, x -> starts_with(x, '- ')
                                        OR starts_with(x, '* ')
                                        OR starts_with(x, '•'))) AS DOUBLE)
              / greatest(len(ls), 1), 6) AS bullet_line_share,
        round(CAST(len(list_filter(ls, x -> ends_with(x, '...')
                                        OR ends_with(x, '…'))) AS DOUBLE)
              / greatest(len(ls), 1), 6) AS ellipsis_line_share,
        round(CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
              / greatest(len(w), 1), 6) AS alpha_word_share,
        len(list_intersect(list_distinct(w),
            ['the','be','to','of','and','that','have','with'])) AS stopword_hits,
        round(CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
              / greatest(len(ls), 1), 6) AS dup_line_ratio,
        coalesce(g.top2, 0.0) AS top_2gram_share,
        contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
        (contains(lower(text), '{') OR contains(lower(text), '}')) AS has_brace,
        coalesce(len(array_to_string(
          list_filter(ls, x ->
            (ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?')
             OR ends_with(x, '"') OR ends_with(x, ''''))
            AND len(string_split_regex(x, '\s+')) >= 5
            AND NOT contains(lower(x), 'javascript')),
          chr(10))), 0) AS c4_clean_len
      FROM toks t LEFT JOIN gtop g ON t.doc_id = g.doc_id
    )
    SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
           bullet_line_share, ellipsis_line_share, alpha_word_share,
           stopword_hits, dup_line_ratio, top_2gram_share,
           (n_words BETWEEN 50 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND symbol_word_ratio <= 0.1
             AND bullet_line_share <= 0.9
             AND ellipsis_line_share <= 0.3
             AND alpha_word_share >= 0.8
             AND stopword_hits >= 2
             AND dup_line_ratio <= 0.3
             AND top_2gram_share <= 0.2 AS gopher_ok,
           has_lorem_ipsum, has_brace, c4_clean_len
    FROM m
"""

register("quality_gates", quality_gates, sql=QUALITY_GATES_ORACLE_SQL)


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
