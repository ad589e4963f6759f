"""Sketch-aggregate telemetry: error bounds vs exact computation."""

from pyspark.sql import functions as F

from connect_server_spark.queries.agg_queries import corpus_stats


def test_corpus_stats_sketches_within_error_bounds(spark, sf_dir):
    got = {r.source: r for r in corpus_stats(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        r.source: r
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("text").alias("nd"),
            F.expr("percentile(n_chars, 0.5)").alias("p50"),
            F.expr("percentile(n_chars, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for src, e in exact.items():
        g = got[src]
        assert g.n_docs == e.n  # counts are exact
        # rsd=0.02 sketch; floor of 3 absorbs small-group (~25 distinct)
        # bias where relative bounds are meaningless
        assert abs(g.approx_distinct_texts - e.nd) <= max(0.1 * e.nd, 3), src
        # percentile_approx returns an actual data point near the quantile
        assert g.p50_chars <= g.p95_chars, src
        assert abs(g.p50_chars - e.p50) <= 0.2 * max(e.p50, 1), src
        assert abs(g.p95_chars - e.p95) <= 0.2 * max(e.p95, 1), src


def test_corpus_stats_plan_is_expand_free(spark, sf_dir):
    """Sketches merge map-side — the plan must never contain the
    count-distinct Expand rewrite. (The Exchange ceiling itself is
    pinned by SHUFFLE_BUDGET in test_plan_audit.py.)"""
    plan = (
        corpus_stats(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan


def test_corpus_datacard_matches_duckdb_mirror(spark, sf_dir):
    """The release data card recomputed per-source in DuckDB SQL —
    volume, English share, mean quality, Gopher pass rate, and exact
    duplicate rate, value-for-value. Reuses the language-score SQL
    fragments the gated text_analysis oracle is built from."""
    import duckdb

    from connect_server_spark.queries.agg_queries import corpus_datacard
    from connect_server_spark.queries.text_queries import (
        _LANG_CASE,
        _SCORES,
        _sql_list,
    )
    from connect_server_spark.operators.text import STOPWORDS

    got = sorted(map(tuple, corpus_datacard(spark, sf_dir).collect()))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(rf"""
    WITH toks AS (
      SELECT source, text,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w,
             list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                         x -> len(x) > 0) AS ls,
             row_number() OVER () AS rid
      FROM documents
    ),
    grams AS (
      SELECT rid, concat_ws(' ', w[i], w[i + 1]) AS g
      FROM toks, unnest(range(1, len(w))) AS u(i)
      WHERE len(w) >= 2
    ),
    gcnt AS (SELECT rid, g, count(*) AS c FROM grams GROUP BY 1, 2),
    gtop AS (
      SELECT rid, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top2
      FROM gcnt GROUP BY rid
    ),
    m AS (
      SELECT t.source, t.text,
        len(w) AS n_words,
        {_SCORES['en']} AS s_en,
        {_SCORES['es']} AS s_es,
        {_SCORES['de']} AS s_de,
        round(CAST(len(list_filter(w, x -> list_contains({_sql_list(STOPWORDS['en'])}, x))) AS DOUBLE)
              / greatest(len(w), 1), 6) AS swr,
        round(list_sum(list_transform(w, x -> CAST(len(x) AS DOUBLE)))
              / greatest(len(w), 1), 6) AS mwl,
        round(CAST(len(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
              / greatest(len(text), 1), 6) AS pr,
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
        coalesce(g.top2, 0.0) AS top_2gram_share
      FROM toks t LEFT JOIN gtop g ON t.rid = g.rid
    ),
    per_doc AS (
      SELECT source,
        n_words,
        CASE WHEN ({_LANG_CASE}) = 'en' THEN 1.0 ELSE 0.0 END AS is_en,
        CAST(round(swr * 1e6, 0) AS BIGINT) * 4
          + CAST(round(least(mwl / 8.0, 1.0) * 1e6, 0) AS BIGINT) * 3
          + CAST(round((1.0 - least(pr * 4.0, 1.0)) * 1e6, 0) AS BIGINT) * 3
          AS quality_e7,
        CASE WHEN (n_words BETWEEN 50 AND 100000)
             AND (mwl BETWEEN 3.0 AND 10.0)
             AND symbol_word_ratio <= 0.1
             AND bullet_line_share <= 0.9
             AND ellipsis_line_share <= 0.3
             AND alpha_word_share >= 0.8
             AND stopword_hits >= 2
             AND dup_line_ratio <= 0.3
             AND top_2gram_share <= 0.2
             THEN 1.0 ELSE 0.0 END AS gopher_ok,
        md5(text) AS digest
      FROM m
    )
    SELECT source,
           count(*) AS n_docs,
           sum(n_words) AS n_tokens,
           round(avg(n_words), 6) AS avg_tokens,
           round(avg(is_en), 6) AS en_share,
           round(avg(CAST(quality_e7 AS DOUBLE)), 6) AS avg_quality_e7,
           round(avg(gopher_ok), 6) AS gopher_pass_rate,
           count(DISTINCT digest) AS n_distinct_texts,
           round(1.0 - CAST(count(DISTINCT digest) AS DOUBLE) / count(*), 6)
             AS dup_rate
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """).fetchall()))
    assert len(got) > 0
    assert got == want
